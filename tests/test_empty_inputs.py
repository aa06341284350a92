"""Legal empty input must flow through TYPED, never crash.

Ray drops a dataset's schema when every block is empty (map UDFs are
never invoked on zero-row blocks), so without recovery every keyed sink
KeyErrors on an empty-but-legal input — a filter that matched nothing,
an empty partition of a 100-TB run, a fixture table that hasn't been
populated yet.  stages/schema_infer.py recovers schemas by statically
walking the logical plan (evaluating map UDFs on zero-row typed batches
driver-side); these tests pin that behavior end-to-end.

The full registry sweep (all 125 queries against an all-empty sf dir)
runs out-of-band via the builder probe; here a representative slice of
each plan family keeps suite time bounded.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data as rd


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """An sf dir with every table present but zero rows (schema kept)."""
    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("sf_empty")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet").slice(0, 0),
                       str(d / f"{t}.parquet"))
    return str(d)


# one representative per plan family: two-stage window sort, driver
# combine, broadcast join, native hash join, native full outer, as-of,
# exact quantiles, image decode, LSH funnel, dedup, ANN, gated group sum
REPRESENTATIVE = [
    ("sessionize_events", ["user_id", "n_events", "n_sessions"]),
    ("q1_pricing_summary", None),
    ("join_customer_nation_region", None),
    ("hash_join_orders_customers",
     ["o_orderkey", "o_totalprice", "c_name", "c_mktsegment"]),
    ("full_outer_month_activity", ["month", "n_orders", "n_ships"]),
    ("asof_join_purchase_view", ["event_id", "user_id", "asof_b_event_id"]),
    ("quantiles_quantity_by_flag", None),
    ("image_decode_stats", ["doc_id", "mean_pixel"]),
    ("minhash_lsh_neardup_docs", None),
    ("exact_dedup_docs", None),
    ("knn_embeddings_top5", ["rank", "vec_id"]),
    ("top_bigrams_corpus", ["bigram", "n"]),
    ("running_sum_per_user", None),
    ("sorted_unique_segments_per_nation", ["n_name", "segments"]),
]


@pytest.fixture(scope="module")
def registry(ray_session):
    import demeter_ray.pipelines.oracle_extra  # noqa: F401
    import demeter_ray.pipelines.oracle_spatial  # noqa: F401
    import demeter_ray.pipelines.oracle_text  # noqa: F401
    import demeter_ray.pipelines.oracle_tpch  # noqa: F401
    import demeter_ray.pipelines.oracle_window  # noqa: F401
    from demeter_ray.pipelines.relational import QUERIES

    return QUERIES


@pytest.mark.parametrize("name,cols", REPRESENTATIVE,
                         ids=[n for n, _ in REPRESENTATIVE])
def test_query_survives_empty_input(empty_sf_dir, registry, name, cols):
    fn = registry[name][0]
    out = fn(empty_sf_dir)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert isinstance(out, pd.DataFrame)
    if cols is not None:
        assert list(out.columns) == cols, f"{name}: {list(out.columns)}"


def test_infer_schema_static_families(empty_sf_dir, ray_session):
    from demeter_ray.stages.schema_infer import infer_schema_static

    ds = rd.read_parquet(f"{empty_sf_dir}/nation.parquet")
    sch = infer_schema_static(ds)
    assert sch is not None and "n_nationkey" in sch.names

    # passthrough + projection + UDF evaluation
    chain = (
        ds.sort("n_nationkey")
        .select_columns(["n_nationkey", "n_name"])
        .map_batches(
            lambda t: pa.table({"k": t["n_nationkey"],
                                "nm": pa.compute.utf8_lower(t["n_name"])}),
            batch_format="pyarrow",
        )
    )
    sch = infer_schema_static(chain)
    assert sch is not None
    assert sch.names == ["k", "nm"]
    # key type follows the source parquet type exactly
    src_type = pq.read_schema(f"{empty_sf_dir}/nation.parquet").field(
        "n_nationkey").type
    assert sch.field("k").type == src_type
    assert sch.field("nm").type == pa.string()

    # heterogeneous union merges columns
    a = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    b = rd.from_arrow(pa.table({"x": pa.array([], pa.int64()),
                                "y": pa.array([], pa.float64())}))
    sch = infer_schema_static(a.union(b))
    assert sch is not None and set(sch.names) == {"x", "y"}

    # materialize keeps the pre-materialize schema reachable (lazy thunk)
    srt = ds.sort("n_nationkey").materialize()
    sch = infer_schema_static(srt)
    assert sch is not None and "n_name" in sch.names

    # unknowable (per-row map) stays None, never a wrong schema
    assert infer_schema_static(ds.map(lambda r: r)) is None


def test_typed_to_pandas_shim(empty_sf_dir, ray_session):
    # all-empty mapped dataset: to_pandas keeps the UDF's output schema
    ds = rd.read_parquet(f"{empty_sf_dir}/events.parquet")
    mapped = ds.map_batches(
        lambda t: pa.table({"user_id": t["user_id"],
                            "v2": pa.compute.multiply(t["value"], 2.0)}),
        batch_format="pyarrow",
    )
    df = mapped.to_pandas()
    assert list(df.columns) == ["user_id", "v2"]
    assert len(df) == 0

    # non-empty datasets are untouched by the shim
    t = pa.table({"a": pa.array([1, 2], pa.int64())})
    df2 = rd.from_arrow(t).to_pandas()
    assert df2["a"].tolist() == [1, 2]


def test_dataset_from_typed_df_empty_keeps_schema(ray_session):
    from demeter_ray.stages.schema_infer import dataset_from_typed_df

    df = pd.DataFrame({"token": pd.Series(dtype="object"),
                       "df": pd.Series(dtype="int64")})
    ds = dataset_from_typed_df(df)
    out = ds.map_batches(lambda b: b, batch_format="pandas").to_pandas()
    assert list(out.columns) == ["token", "df"]

    # non-empty passes through as pandas blocks
    df3 = pd.DataFrame({"token": ["a"], "df": [1]})
    assert dataset_from_typed_df(df3).to_pandas()["df"].tolist() == [1]


def test_codec_batch_kernels_total_on_empty():
    from demeter_ray.functions import codec

    px = codec.generate_pixels_batch(np.array([], dtype=np.int64), 16, 16)
    assert px.shape == (0, 16, 16, 3)
    assert codec.encode_batch(px, "png") == []
    assert codec.decode_batch([], 16, 16).shape == (0, 16, 16, 3)
    assert codec.phash64_batch(px).shape == (0,)


def test_inferred_schema_matches_actual_on_nonempty(ray_session):
    """The worst walker failure mode is a WRONG schema (None is always
    safe).  For every chain family, the statically-inferred schema of the
    NON-empty pipeline must equal the schema Ray actually produces."""
    from demeter_ray.stages.schema_infer import infer_schema_static

    sf = "/root/testdata/sf0.001"
    nation = rd.read_parquet(f"{sf}/nation.parquet")
    cust = rd.read_parquet(f"{sf}/customer.parquet")

    chains = {
        "read": nation,
        "sort_limit": nation.sort("n_nationkey").limit(5),
        "project": nation.select_columns(["n_name", "n_regionkey"]),
        "rename": nation.rename_columns({"n_name": "name"}),
        "filter_expr": nation.filter(expr="n_regionkey == 1"),
        "map_arrow": nation.map_batches(
            lambda t: pa.table({"k2": pa.compute.multiply(t["n_nationkey"], 2)}),
            batch_format="pyarrow"),
        "map_pandas": nation.map_batches(
            lambda b: b.assign(flag=b["n_regionkey"] > 1),
            batch_format="pandas"),
        "union": nation.select_columns(["n_nationkey"]).union(
            nation.select_columns(["n_nationkey"])),
        "agg": nation.groupby("n_regionkey").count(),
        "join": cust.join(nation, join_type="inner", num_partitions=2,
                          on=("c_nationkey",), right_on=("n_nationkey",)),
        "chained": (cust.select_columns(["c_custkey", "c_acctbal"])
                    .filter(expr="c_acctbal > 0")
                    .map_batches(lambda t: t.rename_columns(
                        ["custkey", "bal"]), batch_format="pyarrow")
                    .sort("custkey")),
    }
    for name, ds in chains.items():
        inferred = infer_schema_static(ds)
        if inferred is None:
            continue  # None is the safe answer; wrongness is what we pin
        actual_tbl = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
        assert list(inferred.names) == list(actual_tbl.column_names), (
            f"{name}: inferred {inferred.names} vs actual "
            f"{list(actual_tbl.column_names)}")
        for f in inferred:
            at = actual_tbl.schema.field(f.name).type
            # pandas round-trip may re-type strings/timestamps; compare
            # the type families that matter for typed-empty frames
            same_family = (
                f.type == at
                or (pa.types.is_integer(f.type) and pa.types.is_integer(at))
                or (pa.types.is_floating(f.type) and pa.types.is_floating(at))
                or (pa.types.is_string(f.type) and pa.types.is_string(at))
            )
            assert same_family, f"{name}.{f.name}: inferred {f.type} vs {at}"

    # aggregate output types must match Ray's real output exactly (Sum
    # widens int32 -> int64); a guessed type would poison typed frames
    agg = nation.groupby("n_regionkey").sum("n_nationkey")
    inferred = infer_schema_static(agg)
    assert inferred is not None
    actual = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    for f in inferred:
        assert f.type == actual.schema.field(f.name).type, (
            f"agg {f.name}: {f.type} vs {actual.schema.field(f.name).type}")


def test_explain_plan_renders_schemas(ray_session):
    from demeter_ray import explain_plan

    sf = "/root/testdata/sf0.001"
    ds = (rd.read_parquet(f"{sf}/nation.parquet")
          .select_columns(["n_nationkey", "n_name"])
          .sort("n_nationkey"))
    text = explain_plan(ds)
    lines = text.splitlines()
    assert len(lines) == 3  # Sort <- Project <- Read
    assert "n_name:string" in lines[0]
    assert "[?]" not in text
    # per-row map: schema shows as unknown, tree still renders
    assert "[?]" in explain_plan(ds.map(lambda r: r)).splitlines()[0]
