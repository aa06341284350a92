"""demeter_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch reimplementation of the query/data-processing capabilities of
``useyardstick/demeter`` (reference at /root/reference, read-only), re-expressed
as ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- tiled rasters are rows of an Arrow table (one row per (dataset, depth, tile)),
  never monolithic in-memory mosaics (reference: demeter/raster/__init__.py:11-34);
- vector geometries are WKB binary columns decoded per batch with a pure-numpy
  geometry kernel (no shapely in this environment);
- the SSURGO relational plan (demeter/vector/usda/ssurgo.py:20-108) becomes
  groupby/map_groups + broadcast hash joins;
- point-in-polygon, kNN and raster sampling are actor-pool ``map_batches``
  stages with the index built once per actor;
- the spatial shuffle is an explicit cell-prefix ``groupby`` with salting.

Layout:
    functions/  pure numpy/python kernels (geo, hashing, codec, text, depth)
    sources/    table readers + deterministic synthetic fixture generators
    stages/     map_batches stages & actor pools (pip, knn, sample, merge, ...)
    pipelines/  end-to-end pipelines (flagship spatial join, soiljoin, ndvi,
                relational oracle queries)
    state/      lineage records + resumable partitioned sinks

Nothing in this package calls ``ray.init`` — sessions are owned by callers
(bench.py, the test fixture, the driver).
"""

__version__ = "0.1.0"
