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

# Typed empty-result shim: Dataset.to_pandas() on an all-empty dataset
# rebuilds the frame from the statically-inferred plan schema instead of
# returning a column-less one (see stages/schema_infer.py for why).
from demeter_ray.stages.schema_infer import (
    explain_plan,  # noqa: F401  (public: plan tree w/ inferred schemas)
    install_typed_empty_to_pandas,
)

install_typed_empty_to_pandas()


def ship_code_to_workers() -> None:
    """Register every demeter_ray module for cloudpickle pickle-by-value so
    Ray workers never need the package on their own sys.path.  Call this
    when the package is importable only via a driver-side sys.path entry
    (the driver contract in __ray_entry__.py does this automatically)."""
    import importlib
    import sys

    for name in (
        "demeter_ray.functions.codec", "demeter_ray.functions.depth",
        "demeter_ray.functions.avi", "demeter_ray.functions.bmp",
        "demeter_ray.functions.geo", "demeter_ray.functions.gif",
        "demeter_ray.functions.hashing",
        "demeter_ray.functions.jpeg", "demeter_ray.functions.png",
        "demeter_ray.functions.scenes", "demeter_ray.functions.shp",
        "demeter_ray.functions.terrain",
        "demeter_ray.functions.text", "demeter_ray.functions.tiff",
        "demeter_ray.functions.warp", "demeter_ray.functions.wav",
        "demeter_ray.sources.fixtures",
        "demeter_ray.sources.tables", "demeter_ray.sources.ziptiles",
        "demeter_ray.stages.audio", "demeter_ray.stages.cells",
        "demeter_ray.stages.components",
        "demeter_ray.stages.dedup", "demeter_ray.stages.depthagg",
        "demeter_ray.stages.hydro", "demeter_ray.stages.images",
        "demeter_ray.stages.knn", "demeter_ray.stages.mask",
        "demeter_ray.stages.merge", "demeter_ray.stages.ndvi",
        "demeter_ray.stages.pip", "demeter_ray.stages.pools",
        "demeter_ray.stages.pyramid",
        "demeter_ray.stages.sample", "demeter_ray.stages.schema_infer",
        "demeter_ray.stages.simsearch", "demeter_ray.stages.sketches",
        "demeter_ray.stages.spatial",
        "demeter_ray.state.lineage",
        "demeter_ray.pipelines.flagship", "demeter_ray.pipelines.relational",
        "demeter_ray.pipelines.oracle_audio",
        "demeter_ray.pipelines.oracle_extra", "demeter_ray.pipelines.oracle_spatial",
        "demeter_ray.pipelines.oracle_text", "demeter_ray.pipelines.oracle_tpch",
        "demeter_ray.pipelines.oracle_window",
        "demeter_ray.pipelines.point_data",
        "demeter_ray.pipelines.soiljoin",
    ):
        importlib.import_module(name)
    try:
        from ray import cloudpickle

        for mod_name, mod in list(sys.modules.items()):
            if mod_name.startswith("demeter_ray"):
                cloudpickle.register_pickle_by_value(mod)
    except Exception:
        pass
