"""Additional driver-visible queries: the fixture-based geospatial pipelines
(rows-only — their inputs are the deterministic fixture tables, not the
driver's SQL views; their correctness gates live in the pytest goldens) plus
an IVF-ANN query verified against the brute-force oracle shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from demeter_ray.pipelines.relational import register
from demeter_ray.sources.tables import read_table


@register("fetch_point_data", None)
def fetch_point_data_q(sf_dir: str):
    """The reference's flagship multi-source point enrichment
    (api.py:13-102) over the deterministic fixtures (rows-only; golden
    conformance in tests/test_point_data.py)."""
    from demeter_ray.pipelines import point_data
    from demeter_ray.sources import fixtures as fx

    return point_data.fetch_point_data(fx.generate("tiny"))


@register("primary_soil_components", None)
def primary_soil_components_q(sf_dir: str):
    """Full SSURGO plan over fixture dims (ssurgo.py:111-179 semantics;
    golden conformance in tests/test_soiljoin.py)."""
    from demeter_ray.pipelines.soiljoin import primary_soil_components
    from demeter_ray.sources import fixtures as fx

    return primary_soil_components(fx.generate("tiny"), 0, 100)


@register("ndvi_zone_statistics", None)
def ndvi_zone_statistics_q(sf_dir: str):
    """Sentinel-2-style NDVI statistics per zone (ndvi.py:126-313 semantics;
    golden conformance in tests/test_ndvi.py).  Drops raster payload bytes
    for the driver's row check."""
    import ray.data

    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.ndvi import ndvi_statistics

    fd = fx.generate("tiny")
    out = ndvi_statistics(ray.data.read_parquet(f"{fd}/scene_tiles.parquet"))
    return out.drop(columns=["pixels"])


# the fixture catchment field is pure modular arithmetic
# (fixtures.catchment_value), so the full remap+histogram pipeline is
# SQL-recomputable: code = (tidx*7 + (r+c)//32) % 11 + 1 per 64x64 tile,
# VAT id = 1e13 + code*17 + tidx, code 11 deliberately unmapped (dropped)
_CATCHMENT_HIST_SQL = """
WITH px AS (
  SELECT (t.tx * 5 + t.ty) AS tidx,
         ((t.tx * 5 + t.ty) * 7 + (r.r + c.c) // 32) % 11 + 1 AS code
  FROM (SELECT a.a AS tx, b.b AS ty
        FROM generate_series(0, 4) a(a), generate_series(0, 4) b(b)) t,
       generate_series(0, 63) r(r), generate_series(0, 63) c(c)
)
SELECT CAST(10000000000000 + code * 17 + tidx AS BIGINT) AS catchment_id,
       COUNT(*) AS n_pixels
FROM px WHERE code <> 11
GROUP BY catchment_id ORDER BY catchment_id
"""


@register("catchment_histogram", _CATCHMENT_HIST_SQL)
def catchment_histogram_q(sf_dir: str):
    """Hydrography pixel-count histogram per global catchment id
    (usgs/hydrography.py:211-323 semantics): remap every cat tile through
    its VAT, count pixels per global id.  The oracle recomputes the whole
    remap+histogram from the deterministic field formula in pure SQL."""
    import pyarrow.parquet as pq
    import ray.data

    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.hydro import catchment_histogram_from_pixels

    fd = fx.generate("tiny")
    tiles = ray.data.read_parquet(f"{fd}/raster_tiles.parquet")
    vat = pq.read_table(f"{fd}/catchment_vat.parquet")
    return catchment_histogram_from_pixels(tiles, vat)


@register("carbon_stock_summary", None)
def carbon_stock_summary_q(sf_dir: str):
    """POLARIS-style depth-weighted carbon stock over the fixture raster
    table: per-depth-range summary rows (polaris.py:160-324 semantics)."""
    import pyarrow.parquet as pq

    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.depthagg import estimate_carbon_stock

    tiles = pq.read_table(f"{fx.generate('tiny')}/raster_tiles.parquet")
    rows = []
    for start, end in ((0, 30), (0, 100), (30, 100)):
        mean, std, _ = estimate_carbon_stock(tiles, start, end)
        rows.append(
            {
                "top_cm": start,
                "bottom_cm": end,
                "valid_px": int((~np.ma.getmaskarray(mean)).sum()),
                "stock_mean": round(float(np.ma.mean(mean)), 6),
                "stock_stddev_mean": round(float(np.ma.mean(std)), 6),
            }
        )
    return pd.DataFrame(rows)


@register("simhash_neardup_docs", None)
def simhash_neardup_docs_q(sf_dir: str):
    """SimHash chunk-bucketed near-dup pairs with exact Hamming verify."""
    from demeter_ray.stages.dedup import simhash_neardup

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_neardup(ds, max_hamming=6)


@register("ivf_ann_topk", None)
def ivf_ann_topk_q(sf_dir: str):
    """IVF-bucketed approximate nearest neighbors for 4 query vectors with
    recall annotated against the exact brute force (the scale path of
    knn_embeddings_top5)."""
    import ray.data

    from demeter_ray.stages.simsearch import brute_force_topk, build_ivf_index, ivf_topk

    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = ds.limit(4).to_pandas()
    queries = np.array(head["embedding"].tolist(), dtype=np.float64)
    indexed = build_ivf_index(ds, n_lists=8)
    approx = ivf_topk(indexed, indexed.ivf_centroids, queries, k=5, nprobe=4)
    exact = brute_force_topk(ds, queries, k=5)
    recall = []
    for qi in range(len(queries)):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        recall.append(len(e & a) / max(1, len(e)))
    out = approx.copy()
    out["recall_at_5"] = out["query_idx"].map(dict(enumerate(np.round(recall, 3))))
    return out.drop(columns=["sim"])


@register("image_transform_features", None)
def image_transform_features_q(sf_dir: str):
    """Decode -> bilinear resize -> center-crop -> feature-extraction actor
    pool over derived images (payload-axis preprocessing; rows-only —
    goldens in tests/test_image_stages.py)."""
    import pyarrow as pa

    from demeter_ray.functions import codec
    from demeter_ray.stages.images import transform_images

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        px4 = codec.generate_pixels_batch(ids, 32, 32)
        return pa.table(
            {
                "image_id": pa.array([f"img{int(i):012d}" for i in ids]),
                "bytes": pa.array(codec.encode_batch(px4, "png"), pa.binary()),
            }
        )

    ds = ds.map_batches(to_images, batch_format="pyarrow", batch_size=512)
    out = transform_images(ds, concurrency=(1, 4)).to_pandas()
    feats = np.array(out["features"].tolist())
    out["feat_mean"] = np.round(feats.mean(axis=1), 6)
    return out[["image_id", "feat_mean"]]


@register("image_embedding_neardup", None)
def image_embedding_neardup_q(sf_dir: str):
    """Image-feature near-dup: transform stage -> feature vectors -> cosine
    pairs ~ 1.0.  The planted i%100==99 duplicates land at exactly 1.0;
    the synthetic generator's gradients are cyclic shifts, so histogram
    features also collide across distinct images — the extra pairs are a
    property of the deterministic corpus, not the operator."""
    import pyarrow as pa

    from demeter_ray.functions import codec
    from demeter_ray.stages.images import transform_images

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def to_images(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.where(ids % 100 == 99, ids - 1, ids)  # planted exact dups
        px4 = codec.generate_pixels_batch(src, 32, 32)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bytes": pa.array(codec.encode_batch(px4, "png"), pa.binary()),
            }
        )

    ds = ds.map_batches(to_images, batch_format="pyarrow", batch_size=512)
    feats_df = transform_images(ds, concurrency=(1, 4)).to_pandas()
    ids = feats_df["vec_id"].to_numpy(dtype=np.int64)
    E = np.array(feats_df["features"].tolist(), dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    S = En @ En.T
    iu = np.triu_indices(len(ids), 1)
    hit = S[iu] >= 0.999999
    a, b = ids[iu[0][hit]], ids[iu[1][hit]]
    out = pd.DataFrame({"a_id": np.minimum(a, b), "b_id": np.maximum(a, b)})
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


@register("approx_distinct_users", None)
def approx_distinct_users_q(sf_dir: str):
    """HyperLogLog approximate distinct count (mergeable-sketch aggregation:
    one tiny sketch row per batch shuffles, never the values) beside the
    exact count and the relative error — rows-only; the error bound is
    pytest-pinned in tests/test_sketches.py."""
    from demeter_ray.stages.sketches import approx_distinct, approx_distinct_tokens

    users = read_table(sf_dir, "events", columns=["user_id"])
    exact = users.to_pandas()["user_id"].nunique()
    est = approx_distinct(users, "user_id", p=12)
    docs = read_table(sf_dir, "documents", columns=["text"])
    vocab_est = approx_distinct_tokens(docs, p=12)
    return pd.DataFrame(
        {
            "metric": ["distinct_users", "distinct_tokens"],
            "estimate": [round(est, 1), round(vocab_est, 1)],
            "exact": [exact, -1],
            "rel_error": [round(abs(est - exact) / exact, 4), -1.0],
        }
    )


@register("reproject_merge_zones", None)
def reproject_merge_zones_q(sf_dir: str):
    """Mixed-CRS mosaic: the fixture's EPSG:32613 elevation tile and the
    EPSG:4326 elevation tiles reproject onto one EPSG:4326 grid
    (average resampling) and merge with the mean method —
    reprojection.py:143-238 semantics distributed per-tile.  Output is one
    row per 32-row stripe of the mosaic (rows-only; the warp math is
    golden-tested in tests/test_warp.py)."""
    import pyarrow.parquet as pq

    from demeter_ray.functions import geo
    from demeter_ray.sources import fixtures as fx
    from demeter_ray.stages.merge import reproject_and_merge_tiles
    from demeter_ray.stages.sample import load_tiles

    fd = fx.generate("tiny")
    tbl = pq.read_table(f"{fd}/raster_tiles.parquet")
    tiles = load_tiles(tbl, "elevation", with_crs=True) + load_tiles(
        tbl, "elevation_utm", with_crs=True
    )
    merged, transform, _nodata, crs = reproject_and_merge_tiles(
        tiles, "EPSG:4326", "average", merge_method="mean"
    )
    rows = []
    for r0 in range(0, merged.shape[0], 32):
        stripe = merged[r0 : r0 + 32]
        rows.append(
            {
                "stripe": r0 // 32,
                "n_valid": int((~np.ma.getmaskarray(stripe)).sum()),
                "mean_value": round(float(stripe.mean()), 4),
            }
        )
    return pd.DataFrame(rows)
