"""Oracle-checked relational queries over the driver's TPC-H-ish tables.

Every entry here re-expresses one operator family from SURVEY.md §2 as an
idiomatic Ray Data pipeline AND carries an ANSI/DuckDB SQL string computing
the identical result (same column names, same rounding) — the driver runs
both at sf=0.01 and compares row-count + schema + order-insensitive
value-hash (CORRECTNESS_r{N}.json).

Conventions for exact parity:
- every aggregate/computed column is explicitly aliased, identically in both;
- float aggregates are rounded (ROUND(x, k) / numpy round) on both sides;
- deterministic tie-breaks everywhere a top-k / dedup picks a row;
- arithmetic on derived columns uses the same literal expression order so
  IEEE doubles agree bit-for-bit.

Registry: ``QUERIES[name] -> (callable(sf_dir) -> result, sql | None)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from demeter_ray.sources.tables import read_table
from demeter_ray.stages.schema_infer import (  # noqa: F401 (re-exports)
    collect_df,
    dataset_from_typed_df,
    infer_schema_static,
)

QUERIES: dict = {}


def duck_round(x, k: int):
    """Emulate DuckDB's ROUND on DOUBLE (half away from zero) so rounded
    aggregates hash-match the oracle even on exact .5 ties — numpy/pandas
    round is half-to-even and diverges there."""
    p = 10.0 ** k
    arr = np.asarray(x, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * p + 0.5) / p


def bcast(ref, fn):
    """Broadcast-lookup as a PLAIN task function: the payload is ray.put once
    and ray.get per task (zero-copy plasma read).  Stateless tasks start
    instantly — an autoscaling actor pool adds seconds of ramp-up per stage,
    which dominates small sequential phases."""
    import ray as _ray

    def wrapper(batch):
        return fn(batch, _ray.get(ref))

    return wrapper


# broadcast key sets above this size route through the partitioned
# Dataset.join instead: a frozenset of orderkeys at 100 TB is itself huge,
# and every task would page it.  Below the cap the broadcast filter wins by
# skipping the shuffle entirely (BASELINE.md ledger).
BROADCAST_KEY_CAP = 2_000_000


def gated_semi_join(ds, key_col: str, keys_ds, keys_col: str, anti: bool = False,
                    cap: int = BROADCAST_KEY_CAP, num_partitions: int = 8):
    """Semi/anti join of ``ds`` against a distinct key set, SIZE-GATED:

    - small key side (<= ``cap`` distinct keys): broadcast ``frozenset`` +
      vectorized membership filter per batch — no shuffle;
    - large key side: both sides hash-partition through the real
      ``Dataset.join`` (semi = inner join on deduped keys; anti = left outer
      + null-marker filter), so no unbounded driver/worker materialization.
    """
    import ray as _ray

    distinct = keys_ds.map_batches(
        lambda t, c=keys_col: pa.table({c: pc.unique(t[c])}), batch_format="pyarrow"
    ).materialize()
    # per-batch unique rows still overcount across batches; the gate only
    # needs an upper bound, which this is
    if distinct.count() <= cap:
        kdf = distinct.to_pandas()
        keyset = (frozenset(kdf[keys_col].tolist())
                  if keys_col in kdf.columns else frozenset())
        ref = _ray.put(keyset)

        def filt(batch: pd.DataFrame, keys) -> pd.DataFrame:
            m = batch[key_col].isin(keys)
            return batch[~m] if anti else batch[m]

        mapped = ds.map_batches(bcast(ref, filt), batch_format="pandas")
        return _with_schema_anchor(mapped, ds, lambda eb: eb)
    # shuffle path: global dedup of the key side via the native vectorized
    # groupby-count (one row per key; the count column doubles as the
    # null-marker for anti), then partitioned join
    marker = f"__{keys_col}_present"
    keys_unique = (
        distinct.groupby(keys_col)
        .count()
        .map_batches(
            lambda t: t.rename_columns([keys_col, marker]), batch_format="pyarrow"
        )
    )
    joined = ds.join(
        keys_unique,
        join_type="left_outer" if anti else "inner",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=(keys_col,),
    )
    if anti:
        joined = joined.map_batches(
            lambda t: t.filter(pc.is_null(t[marker])), batch_format="pyarrow"
        )
    drop = [c for c in (marker, keys_col) if c != key_col]
    out = joined.map_batches(
        lambda t, d=tuple(drop): t.drop_columns([c for c in d if c in t.column_names]),
        batch_format="pyarrow",
    )
    return _with_schema_anchor(out, ds, lambda eb: eb)


def _arrow_schema_of(ds):
    # static plan walk first: no execution, works on empty intermediates
    sch = infer_schema_static(ds)
    if sch is not None:
        return sch
    try:
        sch = ds.schema(fetch_if_missing=True)
        if sch is None:
            return None
        return pa.schema(list(zip(sch.names, sch.types)))
    except Exception:
        return None


def _with_schema_anchor(mapped_ds, src_ds, out_of_empty, extra_ds=()):
    """Union a TYPED zero-row block onto ``mapped_ds`` so its schema stays
    discoverable when the data side is empty (Ray drops the schema of
    datasets whose every block is skipped).  ``out_of_empty`` maps a typed
    empty batch of ``src_ds`` to a typed empty OUTPUT batch; if the source
    schema is unknowable the dataset is returned unchanged.  The extra
    block is empty — downstream operators see identical rows.  Column types
    on the anchor come from ``src_ds`` (and any ``extra_ds``, e.g. a join's
    dim side) so object-dtype pandas columns don't degrade to Arrow null.

    STATIC walks only, each source walked once: this runs at
    join-construction time on non-empty hot paths, so it must never fall
    back to ``schema(fetch_if_missing=True)`` (which would execute the
    upstream plan just to build the anchor)."""
    import ray.data as rd

    src_sch = infer_schema_static(src_ds)
    if src_sch is None:
        return mapped_ds
    eb = src_sch.empty_table().to_pandas()
    try:
        anchor = out_of_empty(eb)
    except Exception:
        return mapped_ds
    hints: dict[str, pa.DataType] = dict(zip(src_sch.names, src_sch.types))
    for d in extra_ds:
        sch = infer_schema_static(d)
        if sch is not None:
            hints.update(zip(sch.names, sch.types))
    # Arrow block, not pandas: Ray's pandas size estimator np.vectorize()-es
    # object columns and warns on zero-row input.  Empty object columns
    # infer as Arrow null — restore the real type from the source schemas
    # (string fallback) so the union's schema matches the data blocks.
    tbl = pa.Table.from_pandas(anchor.iloc[0:0], preserve_index=False)
    fields = [
        pa.field(f.name, hints.get(f.name, pa.string()))
        if pa.types.is_null(f.type) else f
        for f in tbl.schema
    ]
    return mapped_ds.union(rd.from_arrow(tbl.cast(pa.schema(fields))))


def gated_lookup_join(ds, key_col: str, dim_ds, dim_key: str, dim_cols: list[str],
                      how: str = "inner", cap: int = BROADCAST_KEY_CAP,
                      num_partitions: int = 8):
    """Lookup (dimension-attach) join, SIZE-GATED — the generic form of the
    broadcast dim joins (J2/J4/J6, ssurgo.py:33-41):

    - small dim (<= ``cap`` rows): the dim ships once via ``ray.put`` as a
      pandas index and every batch merges against it locally — no shuffle;
    - large dim: both sides hash-partition through the real
      ``Dataset.join`` (``num_partitions`` buckets), so neither side ever
      materializes on one node.

    ``dim_cols`` are appended to ``ds``'s columns; names must not collide.
    ``how`` is "inner" or "left" (left keeps unmatched rows with nulls)."""
    import ray as _ray

    dim_ds = dim_ds.materialize()  # the gate's count() must not re-run the dim
    if dim_ds.count() <= cap:
        dimdf = dim_ds.to_pandas()
        if dimdf.shape[1] == 0:
            # empty dim lost its schema (Ray drops it at zero rows):
            # synthesize from the dataset schema, else bare key+cols
            synth = typed_empty_batch(dim_ds, "pandas")
            dimdf = (synth if synth is not None
                     else pd.DataFrame({c: [] for c in [dim_key] + dim_cols}))
        dimdf = dimdf.set_index(dim_key)[dim_cols]

        def attach(batch: pd.DataFrame, dim_tbl) -> pd.DataFrame:
            return batch.merge(dim_tbl, left_on=key_col, right_index=True, how=how)

        mapped = ds.map_batches(bcast(_ray.put(dimdf), attach), batch_format="pandas")
        return _with_schema_anchor(mapped, ds, lambda eb: attach(eb, dimdf),
                                   extra_ds=(dim_ds,))
    joined = ds.join(
        dim_ds.select_columns([dim_key] + dim_cols),
        join_type="inner" if how == "inner" else "left_outer",
        num_partitions=num_partitions,
        on=(key_col,),
        right_on=(dim_key,),
    )
    if dim_key != key_col:
        joined = joined.map_batches(
            lambda t, d=dim_key: t.drop_columns([d]) if d in t.column_names else t,
            batch_format="pyarrow",
        )
    dim_eb = typed_empty_batch(dim_ds, "pandas")

    def out_of_empty(eb):
        j = eb.merge(dim_eb[[dim_key] + dim_cols], left_on=key_col,
                     right_on=dim_key, how=how)
        return j.drop(columns=[dim_key]) if dim_key != key_col else j

    return (joined if dim_eb is None
            else _with_schema_anchor(joined, ds, out_of_empty,
                                     extra_ds=(dim_ds,)))


def bloom_semi_join(ds, key_col: str, keys_ds, keys_col: str,
                    n_bits_log2: int = 23, k: int = 4, exact: bool = True,
                    cap: int = BROADCAST_KEY_CAP):
    """Semi-join with a BLOOM-FILTER broadcast prefilter — the scale path
    for key sets too large to broadcast exactly but whose bitmap is tiny:
    2^23 bits = 1 MiB regardless of key count (a 2M-key frozenset is
    ~100x larger and pages every task).

    Build: per-BLOCK packed bitmaps (``np.packbits``) OR-combine on the
    driver — driver traffic is O(blocks x 2^n_bits_log2/8 bytes),
    independent of key count.  Probe: k double-hashed positions per row,
    fully vectorized.  False positives are possible (fpr ~ (1-e^{-kn/m})^k),
    NEVER false negatives, so with ``exact=True`` (default) the survivors
    run through the exact ``gated_semi_join`` and the result is identical to
    the plain semi-join — the bloom only shrinks what reaches the shuffle."""
    import ray as _ray

    from demeter_ray.functions.hashing import mix64_batch

    keys_ds = keys_ds.materialize()  # consumed twice: bloom build + exact verify
    m = 1 << n_bits_log2
    mask = np.uint64(m - 1)

    def _positions(vals: np.ndarray):
        h1 = mix64_batch(vals, seed=1)
        h2 = mix64_batch(vals, seed=2) | np.uint64(1)  # odd -> full cycle
        return [(h1 + np.uint64(i) * h2) & mask for i in range(k)]

    def build_partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(m, dtype=bool)
        vals = t[keys_col].to_numpy(zero_copy_only=False).astype(np.int64)
        for pos in _positions(vals):
            bits[pos] = True
        return pa.table({"bits": pa.array(
            [np.packbits(bits, bitorder="little").tobytes()], pa.binary())})

    parts = keys_ds.select_columns([keys_col]).map_batches(
        build_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    packed = np.zeros(m // 8, dtype=np.uint8)
    for blob in parts["bits"]:
        packed |= np.frombuffer(blob, dtype=np.uint8)
    ref = _ray.put(packed)

    def prefilter(t: pa.Table, bits: np.ndarray) -> pa.Table:
        vals = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        member = np.ones(len(vals), dtype=bool)
        for pos in _positions(vals):
            byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
            member &= ((byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1) > 0
        return t.filter(pa.array(member))

    survivors = ds.map_batches(
        lambda t: prefilter(t, _ray.get(ref)), batch_format="pyarrow"
    )
    if not exact:
        return survivors
    return gated_semi_join(survivors, key_col, keys_ds, keys_col, cap=cap)


def typed_empty_batch(ds, batch_format="pandas"):
    """A ZERO-ROW batch carrying ``ds``'s schema, or None when the schema is
    unknowable (an empty intermediate dataset).  Ray's executor never invokes
    map_batches fns on zero-row input and ``to_pandas()`` then returns a
    COLUMN-LESS frame — running the partial fn once on this batch recovers
    the output schema, so legal empty inputs (a filter that matched nothing)
    flow through combines instead of KeyError-ing downstream.

    Schema discovery is a STATIC walk of the logical plan first
    (stages/schema_infer.py — no execution, covers mapped/filtered/joined
    intermediates), with ``schema(fetch_if_missing=True)`` as the fallback
    for source reads the walker can't handle (_arrow_schema_of does both;
    only call this AFTER an execution came back empty — the fetch fallback
    would otherwise execute the plan)."""
    arrow = _arrow_schema_of(ds)
    if arrow is None:
        return None
    tbl = arrow.empty_table()
    return tbl if batch_format == "pyarrow" else tbl.to_pandas()


def _synth_partial_df(ds, partial_fn, batch_format):
    """Run ``partial_fn`` once on a typed empty batch of ``ds`` to recover
    the partial-output schema.  When even the input schema is unknowable
    (empty intermediate dataset), fall back to a bare empty batch — the
    pyarrow partials in this repo all branch on ``num_rows == 0`` before
    touching columns, so they still emit their output schema.  None if the
    fn cannot run on empty input at all."""
    eb = typed_empty_batch(ds, batch_format)
    if eb is None:
        eb = pa.table({}) if batch_format == "pyarrow" else pd.DataFrame()
    try:
        out = partial_fn(eb)
    except Exception:
        return None
    out = out.to_pandas() if isinstance(out, pa.Table) else out
    return out.iloc[0:0]


def partial_combine(ds, partial_fn, batch_format="pandas", **mb_kwargs):
    """Two-level aggregation with a DRIVER-side combine: per-batch partials
    (one row per key per batch) collect to the driver, where pandas finishes
    the reduction.  For small-cardinality keys this replaces Ray's hash
    shuffle — measured at a 6-20s fixed cost per groupby on this build —
    with one streaming execution + a millisecond combine.  High-cardinality
    groupings (sessionize, exact dedup on content keys) keep the real
    ``groupby`` shuffle.  Empty input yields a typed empty partial frame
    (see typed_empty_batch), not a column-less one.
    """
    df = ds.map_batches(partial_fn, batch_format=batch_format,
                        **mb_kwargs).to_pandas()
    if df.shape[1] == 0:
        synth = _synth_partial_df(ds, partial_fn, batch_format)
        if synth is not None:
            return synth
    return df


# partial rows above this count route through Ray's hash shuffle instead of
# the driver combine; below it the driver combine wins by the shuffle's
# measured 6-20s fixed cost (BASELINE.md ledger).  Keys like (user_id, hour)
# grow linearly with data, so the cap is what keeps partial_combine's
# small-cardinality precondition honest at scale.
DRIVER_COMBINE_CAP = 200_000


# bucket count for the above-cap combine shuffle: the shuffle key is
# hash(group key) % N_COMBINE_BUCKETS, so Ray moves ~32 groups regardless of
# key cardinality.  Ray's native per-key groupby().aggregate() measured 103 s
# on 581k partial rows / 147k keys where the bucketed map_groups combine
# (identical output) took 6.9 s — the per-key shuffle is the cost, not the
# data.  Same design as the dedup funnels' pkey shuffle (stages/dedup.py).
N_COMBINE_BUCKETS = 32


def _n_combine_buckets() -> int:
    """Bucket count bounds the combine's parallelism: floor of 32 (this
    box), scaled to the cluster's CPU budget when larger so a 256-node
    cluster's combine isn't capped at 32 tasks.  Combine work per bucket is
    one vectorized groupby over ~rows/buckets — tiny next to the scan."""
    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(N_COMBINE_BUCKETS, cpus)


def _bucketed_group_combine(parts, keys, sums, per_col):
    """Distributed exact combine of partial rows: low-cardinality bucket
    shuffle + one vectorized pandas groupby per bucket.  Each group key lands
    in exactly one bucket, so downstream per-block operations (local top-k,
    filters) see fully combined rows.  Returns a Dataset."""

    nb = _n_combine_buckets()

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        # hash_pandas_object: deterministic per-row uint64 over the key
        # columns (no per-process randomization), any key dtype
        h = pd.util.hash_pandas_object(b[keys], index=False).to_numpy(np.uint64)
        b = b.copy()
        b["_pkey"] = (h % np.uint64(nb)).astype(np.int64)
        return b

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False).agg(
            {c: per_col[c] for c in sums})

    return (
        parts.map_batches(bucket, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(combine, batch_format="pandas")
    )


def partial_shuffle_combine(ds, partial_fn, keys, sums, batch_format="pyarrow",
                            driver_cap: int = DRIVER_COMBINE_CAP, agg="sum",
                            mb_kwargs: dict | None = None):
    """Two-level aggregation whose combine side is SIZE-GATED: per-batch
    partial rows either collect to the driver (small, under ``driver_cap``)
    or reduce through the bucketed distributed combine (hash(key) %
    N_COMBINE_BUCKETS shuffle + vectorized per-bucket groupby) so the driver
    only ever receives the final one-row-per-key result.  Use for keys
    whose cardinality scales with the data (windows, sessions).  ``agg``
    must be a reduction where combining partials with the same function is
    exact (sum, min, max) — one name for every column, or a
    ``{column: name}`` dict for mixed reductions."""
    parts = ds.map_batches(partial_fn, batch_format=batch_format,
                           **(mb_kwargs or {})).materialize()
    per_col = agg if isinstance(agg, dict) else {c: agg for c in sums}
    if parts.count() <= driver_cap:
        df = parts.to_pandas()
        if df.shape[1] == 0:
            df = _synth_partial_df(ds, partial_fn, batch_format)
            if df is None:
                raise ValueError(
                    "partial_shuffle_combine: empty input with unknowable "
                    "schema — cannot synthesize partial columns "
                    f"(keys={keys})")
        return df.groupby(keys, as_index=False).agg(per_col)
    return _bucketed_group_combine(parts, keys, sums, per_col).to_pandas()


def gated_group_sum_ds(ds, partial_fn, keys, sums,
                        driver_cap: int = None, agg="sum"):
    """Like ``partial_shuffle_combine`` but stays a Dataset above the gate:
    the driver never holds the per-key rows when key cardinality scales
    with data — downstream stages keep reducing distributively.  ``agg``
    follows partial_shuffle_combine: one name for every column or a
    ``{column: name}`` dict; each must be exact under re-combination
    (sum, min, max)."""
    import ray.data as rd

    cap = DRIVER_COMBINE_CAP if driver_cap is None else driver_cap
    per_col = agg if isinstance(agg, dict) else {c: agg for c in sums}
    parts = ds.map_batches(partial_fn, batch_format="pandas").materialize()
    if parts.count() <= cap:
        df = parts.to_pandas()
        if df.shape[1] == 0:
            df = _synth_partial_df(ds, partial_fn, "pandas")
            if df is None:
                raise ValueError(
                    "gated_group_sum_ds: empty input with unknowable schema "
                    f"— cannot synthesize partial columns (keys={keys})")
        df = df.groupby(keys, as_index=False).agg(
            {c: per_col[c] for c in sums})
        return dataset_from_typed_df(df)
    return _bucketed_group_combine(parts, keys, sums, per_col)


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn

    return deco


# --------------------------------------------------------------------------
# A. Grouped aggregation with partial pre-aggregation (SURVEY.md A3-A6, M11)
# --------------------------------------------------------------------------

_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2) AS sum_qty,
  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  ROUND(AVG(l_quantity), 4) AS avg_qty,
  ROUND(AVG(l_discount), 4) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: the canonical wide aggregation.  Partial per-batch
    aggregation inside map_batches (one row per key per batch) shrinks the
    shuffle to kilobytes before the groupby (ray_guide 'Aggregation at
    scale'; reference analog: per-horizon aggregation ssurgo.py:231-257)."""
    ds = read_table(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_disc=("l_discount", "sum"),
            n=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (
        partial_combine(ds, partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .sum()
        .rename(columns={"n": "count_order"})
    )
    out["avg_qty"] = duck_round(out["sum_qty"] / out["count_order"], 4)
    out["avg_disc"] = duck_round(out["sum_disc"] / out["count_order"], 4)
    out["sum_qty"] = duck_round(out["sum_qty"], 2)
    out["sum_base_price"] = duck_round(out["sum_base_price"], 2)
    out["sum_disc_price"] = duck_round(out["sum_disc_price"], 2)
    out = out.drop(columns=["sum_disc"])
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


_HIST_SQL = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("event_type_histogram", _HIST_SQL)
def event_type_histogram(sf_dir: str):
    """Histogram aggregate (reference analog: pixel-count histogram per
    catchment, usgs/hydrography.py:211-259)."""
    ds = read_table(sf_dir, "events", columns=["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("event_type", as_index=False).agg(
            n=("value", "size"), total_value=("value", "sum")
        )

    out = (
        partial_combine(ds, partial)
        .groupby("event_type", as_index=False)
        .sum()
    )
    out["total_value"] = duck_round(out["total_value"], 2)
    return out.sort_values("event_type").reset_index(drop=True)


_WAVG_SQL = """
SELECT
  l_returnflag,
  ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("weighted_avg_price", _WAVG_SQL)
def weighted_avg_price(sf_dir: str):
    """Weighted average — the scalar core of the depth-weighted soil
    aggregation (ssurgo.py:270-301, demeter/utils.py:84-86)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["pq"] = df["l_extendedprice"] * df["l_quantity"]
        g = df.groupby("l_returnflag", as_index=False).agg(
            pq=("pq", "sum"), q=("l_quantity", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (
        partial_combine(ds, partial, batch_format="pyarrow")
        .groupby("l_returnflag", as_index=False)
        .sum()
    )
    out["wavg_price"] = duck_round(out["pq"] / out["q"], 4)
    return out[["l_returnflag", "wavg_price"]].sort_values("l_returnflag").reset_index(drop=True)


# --------------------------------------------------------------------------
# B. Joins (SURVEY.md J2-J7)
# --------------------------------------------------------------------------

_JOIN_CNR_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
"""


@register("join_customer_nation_region", _JOIN_CNR_SQL)
def join_customer_nation_region(sf_dir: str):
    """Broadcast hash join chain: small dims shipped once via ray.put, lookup
    per batch (reference analog: mapunit attr join J2, ssurgo.py:33-41)."""
    import ray as _ray

    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    ref = _ray.put(dim.set_index("n_nationkey")[["n_name", "r_name"]])

    def lookup(batch: pd.DataFrame, dim_tbl) -> pd.DataFrame:
        j = batch.merge(dim_tbl, left_on="c_nationkey", right_index=True, how="inner")
        return j[["c_custkey", "c_name", "n_name", "r_name"]]

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"])
    return ds.map_batches(bcast(ref, lookup), batch_format="pandas")


_TOPK_TIES_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk
  FROM orders
) WHERE rk = 1
"""


@register("grouped_top1_with_ties", _TOPK_TIES_SQL)
def grouped_top1_with_ties(sf_dir: str):
    """TOP 1 WITH TIES per group — the primary-component selection semantics
    (ssurgo.py:42-58; SURVEY.md §7.5 'hard parts': keep ALL rows tying on
    the max).

    Plan: per-batch partial max -> tiny groupby Max -> broadcast the
    (group -> max) map -> filter rows equal to their group max.  Shuffles
    one row per (group, batch) instead of the whole table, and avoids
    per-group pandas calls (map_groups over 15k groups is ~20x slower)."""
    import ray as _ray

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def partial_max(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_custkey", as_index=False)["o_totalprice"].max()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    maxes = (
        partial_combine(ds, partial_max, batch_format="pyarrow")
        .groupby("o_custkey", as_index=False)["o_totalprice"]
        .max()
    )
    ref = _ray.put(dict(zip(maxes["o_custkey"].tolist(), maxes["o_totalprice"].tolist())))

    def keep_ties(batch: pd.DataFrame, maxmap) -> pd.DataFrame:
        return batch[batch["o_totalprice"] == batch["o_custkey"].map(maxmap)]

    return ds.map_batches(bcast(ref, keep_ties), batch_format="pandas")


_TOPK_SQL = """
SELECT n_name, c_custkey, c_acctbal
FROM (
  SELECT n.n_name, c.c_custkey, c.c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rn
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
) WHERE rn <= 2
"""


@register("grouped_top2_per_nation", _TOPK_SQL)
def grouped_top2_per_nation(sf_dir: str):
    """Grouped top-k (k>1) with a deterministic tiebreak (acctbal DESC,
    custkey ASC)."""
    import ray as _ray

    nation = read_table(sf_dir, "nation").to_pandas()
    ref = _ray.put(nation.set_index("n_nationkey")["n_name"])

    def add_nation(batch: pd.DataFrame, names) -> pd.DataFrame:
        batch["n_name"] = batch["c_nationkey"].map(names)
        # INNER-join semantics: a customer with no matching nation drops
        # (the oracle joins, it does not left-join)
        return batch.loc[batch["n_name"].notna(),
                         ["n_name", "c_custkey", "c_acctbal"]]

    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal", "c_nationkey"])
    ds = ds.map_batches(bcast(ref, add_nation), batch_format="pandas")

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).head(2)

    out = ds.groupby("n_name").map_groups(top2, batch_format="pandas").to_pandas()
    if out.shape[1] == 0:  # all-empty input: map_groups never ran
        out = pd.DataFrame({"n_name": pd.Series(dtype="object"),
                            "c_custkey": pd.Series(dtype="int64"),
                            "c_acctbal": pd.Series(dtype="float64")})
    return out


_INTERVAL_SQL = """
SELECT b.band_lo, COUNT(*) AS n_orders, ROUND(SUM(o.o_totalprice), 2) AS sum_price
FROM orders o
JOIN (VALUES (0.0, 100000.0), (50000.0, 200000.0), (150000.0, 400000.0), (300000.0, 600000.0))
  AS b(band_lo, band_hi)
  ON o.o_totalprice >= b.band_lo AND o.o_totalprice < b.band_hi
GROUP BY b.band_lo
ORDER BY b.band_lo
"""

_BANDS = [(0.0, 100000.0), (50000.0, 200000.0), (150000.0, 400000.0), (300000.0, 600000.0)]


@register("interval_join_price_bands", _INTERVAL_SQL)
def interval_join_price_bands(sf_dir: str):
    """Overlapping-interval join (NOT bucketing — bands overlap, a row can
    land in two).  The horizons depth-range predicate (ssurgo.py:70-96,
    'hzdepb_r > top AND hzdept_r < bottom') over a broadcast band table."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])

    def expand(batch: pa.Table) -> pa.Table:
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        lows, ns, sums = [], [], []
        for lo, hi in _BANDS:
            m = (price >= lo) & (price < hi)
            lows.append(lo)
            ns.append(int(m.sum()))
            sums.append(float(price[m].sum()))
        return pa.table(
            {
                "band_lo": pa.array(lows, pa.float64()),
                "n_orders": pa.array(ns, pa.int64()),
                "sum_price": pa.array(sums, pa.float64()),
            }
        )

    out = (
        partial_combine(ds, expand, batch_format="pyarrow")
        .groupby("band_lo", as_index=False)
        .sum()
    )
    out = out[out["n_orders"] > 0]
    out["sum_price"] = duck_round(out["sum_price"], 2)
    return out.sort_values("band_lo").reset_index(drop=True)


_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


@register("semi_join_customers_with_f_orders", _SEMI_SQL)
def semi_join_customers(sf_dir: str):
    """Semi-join, size-gated: broadcast key set under BROADCAST_KEY_CAP,
    partitioned ``Dataset.join`` above it (ray_guide 'Semi / anti join')."""
    f_orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])
    return gated_semi_join(ds, "c_custkey", f_orders, "o_custkey")


_ANTI_SQL = """
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("anti_join_customers_without_orders", _ANTI_SQL)
def anti_join_customers(sf_dir: str):
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    out = gated_semi_join(ds, "c_custkey", orders, "o_custkey", anti=True).to_pandas()
    if out.empty:  # preserve schema even when the anti-join is empty
        out = pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                            "c_name": pd.Series(dtype="object")})
    return out[["c_custkey", "c_name"]]


_Q3_SQL = """
SELECT l.l_orderkey, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""


@register("q3_top10_building_revenue", _Q3_SQL)
def q3_top10(sf_dir: str):
    """Multi-join + aggregate + top-k: both join sides reduced via
    SIZE-GATED semi-joins (broadcast under BROADCAST_KEY_CAP, partitioned
    ``Dataset.join`` above) before the final aggregation."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    orders_f = gated_semi_join(orders, "o_custkey", cust, "c_custkey").map_batches(
        lambda t: t.select(["o_orderkey"]), batch_format="pyarrow"
    )
    lineitem = read_table(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    li = gated_semi_join(lineitem, "l_orderkey", orders_f, "o_orderkey")

    def rev_partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.copy()
        b["revenue"] = b["l_extendedprice"] * (1 - b["l_discount"])
        return b.groupby("l_orderkey", as_index=False)["revenue"].sum()

    out = partial_shuffle_combine(li, rev_partial, ["l_orderkey"], ["revenue"],
                                  batch_format="pandas")
    out["revenue"] = duck_round(out["revenue"], 2)
    out = out.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


# --------------------------------------------------------------------------
# C. Sorts / limits / distinct / string agg (SURVEY.md O1-O5, A5, §2.7)
# --------------------------------------------------------------------------

_SORTLIMIT_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
"""


@register("sort_limit_top100_lineitems", _SORTLIMIT_SQL)
def sort_limit_top100(sf_dir: str):
    """Distributed top-k: per-batch local top-100 (cheap) then a global
    resolve — no full sort of the table."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_extendedprice"])

    def local_top(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
        ).head(100)

    out = ds.map_batches(local_top, batch_format="pandas").to_pandas()
    out = out.sort_values(
        ["l_extendedprice", "l_orderkey", "l_linenumber"], ascending=[False, True, True]
    ).head(100)
    return out.reset_index(drop=True)


_DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"


@register("distinct_mktsegments", _DISTINCT_SQL)
def distinct_mktsegments(sf_dir: str):
    """Exact distinct via per-batch unique + small dedup (§2.7)."""
    ds = read_table(sf_dir, "customer", columns=["c_mktsegment"])
    out = (
        ds.map_batches(
            lambda t: pa.table({"c_mktsegment": pc.unique(t["c_mktsegment"])}),
            batch_format="pyarrow",
        )
        .to_pandas()["c_mktsegment"]
        .drop_duplicates()
        .sort_values()
    )
    return pd.DataFrame({"c_mktsegment": out.to_numpy()})


_STRAGG_SQL = """
SELECT n.n_name,
       (SELECT STRING_AGG(seg, ', ' ORDER BY seg)
        FROM (SELECT DISTINCT c2.c_mktsegment AS seg
              FROM customer c2 WHERE c2.c_nationkey = n.n_nationkey) t
       ) AS segments
FROM nation n
WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey)
ORDER BY n.n_name
"""


@register("sorted_unique_segments_per_nation", _STRAGG_SQL)
def sorted_unique_segments(sf_dir: str):
    """Sorted-unique string concat per group — fragment-kinds aggregation
    semantics (', '.join(sorted(unique)), ssurgo.py:261-267,304-305)."""
    import ray as _ray

    nation = read_table(sf_dir, "nation").to_pandas()
    ref = _ray.put(nation.set_index("n_nationkey")["n_name"])

    def add_nation(batch: pd.DataFrame, names) -> pd.DataFrame:
        batch["n_name"] = batch["c_nationkey"].map(names)
        # inner semantics: unmatched customers drop (SQL EXISTS + join)
        return batch.loc[batch["n_name"].notna(), ["n_name", "c_mktsegment"]]

    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])
    ds = ds.map_batches(bcast(ref, add_nation), batch_format="pandas")

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        segs = ", ".join(sorted(g["c_mktsegment"].unique()))
        return pd.DataFrame({"n_name": [g["n_name"].iloc[0]], "segments": [segs]})

    out = ds.groupby("n_name").map_groups(agg, batch_format="pandas").to_pandas()
    if out.shape[1] == 0:  # all-empty input: map_groups never ran
        out = pd.DataFrame({"n_name": pd.Series(dtype="object"),
                            "segments": pd.Series(dtype="object")})
    return out.sort_values("n_name").reset_index(drop=True)


# --------------------------------------------------------------------------
# D. Windows / sessions over the events stream (SURVEY.md §2.9 mapping)
# --------------------------------------------------------------------------

_WINDOW_SQL = """
SELECT user_id,
       epoch_us(ts) // 3600000000 AS hour_bucket,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY user_id, hour_bucket
ORDER BY user_id, hour_bucket
"""


@register("tumbling_window_events", _WINDOW_SQL)
def tumbling_window_events(sf_dir: str):
    """Tumbling 1h windows as groupby (key, floor(ts/size)) — the batch
    expression of a streaming window (ray_guide 'Streaming-shaped')."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def bucket(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64())
        hours = pc.floor(pc.divide(us, 3600000000)).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "hour_bucket": hours,
                "value": batch["value"],
            }
        )

    def partial(b: pa.Table) -> pa.Table:
        df = bucket(b).to_pandas()
        g = df.groupby(["user_id", "hour_bucket"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = partial_shuffle_combine(
        ds, partial, ["user_id", "hour_bucket"], ["n_events", "sum_value"]
    )
    out["sum_value"] = duck_round(out["sum_value"], 2)
    return out.sort_values(["user_id", "hour_bucket"]).reset_index(drop=True)


_SESSION_SQL = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000 THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, COUNT(*) AS n_events, CAST(1 + SUM(new_session) AS BIGINT) AS n_sessions
FROM gaps GROUP BY user_id ORDER BY user_id
"""


def _combine_session_partials(parts: pd.DataFrame) -> pd.DataFrame:
    """Merge per-batch session partials (user_id, n_events, n_gaps,
    first_us, last_us) — rows must be globally (user, time) sorted.  A
    session break between two adjacent partials of the same user counts
    once, via the cross-partial gap."""
    uid = parts["user_id"].to_numpy()
    first_us = parts["first_us"].to_numpy()
    last_us = parts["last_us"].to_numpy()
    same = uid[1:] == uid[:-1]
    boundary_gap = (first_us[1:] - last_us[:-1]) > 1_800_000_000
    extra = np.r_[False, same & boundary_gap].astype(np.int64)
    df = pd.DataFrame(
        {
            "user_id": uid,
            "n_events": parts["n_events"].to_numpy(),
            "gaps": parts["n_gaps"].to_numpy() + extra,
        }
    )
    out = df.groupby("user_id", as_index=False).sum()
    out["n_sessions"] = 1 + out.pop("gaps")
    return out


@register("sessionize_events", _SESSION_SQL)
def sessionize_events(sf_dir: str):
    """Session windows (gap > 30 min) per user: one range-partitioned
    ``Dataset.sort`` on (user, ts, event_id), then VECTORIZED per-batch
    segment partials (events, within-batch gaps, first/last timestamps) and
    a tiny ordered combine — no per-group Python callable (the repo ledger
    measured map_groups ~20x slower than two-stage plans).  Partial row
    count is O(users + batches), not O(events)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"]).sort(
        ["user_id", "ts", "event_id"]
    )

    def block_partial(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "n_events": pa.array([], pa.int64()),
                 "n_gaps": pa.array([], pa.int64()),
                 "first_us": pa.array([], pa.int64()),
                 "last_us": pa.array([], pa.int64())}
            )
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], n]
        cum = np.r_[0, np.cumsum(np.diff(us) > 1_800_000_000)]
        n_gaps = cum[ends - 1] - cum[starts]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "n_gaps": pa.array(n_gaps, pa.int64()),
                "first_us": pa.array(us[starts], pa.int64()),
                "last_us": pa.array(us[ends - 1], pa.int64()),
            }
        )

    parts = ds.map_batches(block_partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["user_id", "first_us", "last_us"]).reset_index(drop=True)
    out = _combine_session_partials(parts)
    return out[["user_id", "n_events", "n_sessions"]].sort_values("user_id").reset_index(drop=True)


# --------------------------------------------------------------------------
# E. Remaining star-schema tables + window/JSON operators
# --------------------------------------------------------------------------

_PART_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       ROUND(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) * 1.0
             / COUNT(*) / 100, 4) AS avg_price,
       MAX(p_size) AS max_size
FROM part GROUP BY p_brand ORDER BY p_brand
"""


@register("part_brand_stats", _PART_SQL)
def part_brand_stats(sf_dir: str):
    ds = read_table(sf_dir, "part", columns=["p_brand", "p_retailprice", "p_size"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # exact integer cents: 2-decimal prices can sum to binary-exact
        # ROUND half-ties where float association flips the rounding
        b = b.assign(cents=np.rint(b["p_retailprice"].to_numpy() * 100).astype(np.int64))
        return b.groupby("p_brand", as_index=False).agg(
            n_parts=("p_size", "size"), cents=("cents", "sum"),
            max_size=("p_size", "max"),
        )

    out = partial_combine(ds, partial).groupby("p_brand", as_index=False).agg(
        n_parts=("n_parts", "sum"), cents=("cents", "sum"),
        max_size=("max_size", "max"),
    )
    out["avg_price"] = duck_round(out["cents"] * 1.0 / out["n_parts"] / 100, 4)
    out = out.drop(columns=["cents"])
    return out.sort_values("p_brand").reset_index(drop=True)


_SUPPLIER_SQL = """
SELECT s.s_suppkey, s.s_name, n.n_name, ROUND(s.s_acctbal, 2) AS acctbal
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
ORDER BY s.s_suppkey
"""


@register("supplier_nation_join", _SUPPLIER_SQL)
def supplier_nation_join(sf_dir: str):
    import ray as _ray

    nation = read_table(sf_dir, "nation").to_pandas()
    ref = _ray.put(nation.set_index("n_nationkey")["n_name"])

    def lookup(b: pd.DataFrame, names) -> pd.DataFrame:
        b["n_name"] = b["s_nationkey"].map(names)
        b["acctbal"] = duck_round(b["s_acctbal"], 2)
        # inner semantics: suppliers with no matching nation drop
        return b.loc[b["n_name"].notna(),
                     ["s_suppkey", "s_name", "n_name", "acctbal"]]

    ds = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    out = ds.map_batches(bcast(ref, lookup), batch_format="pandas").to_pandas()
    return out.sort_values("s_suppkey").reset_index(drop=True)


_RUNNING_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events
"""


@register("running_sum_per_user", _RUNNING_SQL)
def running_sum_per_user(sf_dir: str):
    """Cumulative window function: per-user ordered running sum, fully
    VECTORIZED (the sessionize two-stage pattern): one range-partitioned
    ``Dataset.sort`` on (user, ts, event_id), per-block integer-cent segment
    partials, a driver-side exclusive base offset per (user, block segment),
    then a second vectorized pass over the SAME materialized blocks
    (``batch_size=None`` = one batch per block, so segmentation is
    identical) adding each segment's base.  No per-group Python at any user
    cardinality; partial rows are O(users + blocks), not O(events).  Cents
    keep the cross-block combine exact (values are 2-decimal; float
    association would otherwise differ from the oracle's sequential sum)."""
    import ray as _ray

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    sorted_ds = ds.sort(["user_id", "ts", "event_id"]).materialize()

    def _segments(batch: pa.Table):
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        cents = np.rint(
            batch["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        return uid, us, eid, cents, starts, ends

    def seg_partial(batch: pa.Table) -> pa.Table:
        empty = {
            "user_id": pa.array([], pa.int64()),
            "first_ts": pa.array([], pa.int64()),
            "first_eid": pa.array([], pa.int64()),
            "seg_cents": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0:
            return pa.table(empty)
        uid, us, eid, cents, starts, ends = _segments(batch)
        cum = np.cumsum(cents)
        seg = cum[ends - 1] - cum[starts] + cents[starts]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "first_ts": pa.array(us[starts], pa.int64()),
                "first_eid": pa.array(eid[starts], pa.int64()),
                "seg_cents": pa.array(seg, pa.int64()),
            }
        )

    parts = (
        sorted_ds.map_batches(seg_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["user_id", "first_ts", "first_eid"])
        .reset_index(drop=True)
    )
    base = (
        parts.groupby("user_id")["seg_cents"].cumsum() - parts["seg_cents"]
    ).to_numpy()
    offsets = {
        (int(u), int(t), int(e)): int(b)
        for u, t, e, b in zip(
            parts["user_id"], parts["first_ts"], parts["first_eid"], base
        )
    }
    ref = _ray.put(offsets)

    def apply_base(batch: pa.Table, off) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "running_value": pa.array([], pa.float64())}
            )
        uid, us, eid, cents, starts, ends = _segments(batch)
        run = np.cumsum(cents)
        seg_id = np.cumsum(np.r_[0, (uid[1:] != uid[:-1]).astype(np.int64)])
        within = run - (run[starts] - cents[starts])[seg_id]
        bases = np.array(
            [off[(int(uid[s]), int(us[s]), int(eid[s]))] for s in starts],
            dtype=np.int64,
        )  # KeyError here = block segmentation drifted between passes: fail loud
        total = within + bases[seg_id]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "running_value": pa.array(
                    duck_round(total / 100.0, 2), pa.float64()
                ),
            }
        )

    return sorted_ds.map_batches(
        bcast(ref, apply_base), batch_format="pyarrow", batch_size=None
    )


_JSON_SQL = """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
       COUNT(*) AS n,
       ROUND(AVG(value), 4) AS avg_value
FROM events GROUP BY k_bucket ORDER BY k_bucket
"""


@register("props_json_histogram", _JSON_SQL)
def props_json_histogram(sf_dir: str):
    """Semi-structured parse: extract props.k per event (vectorized pandas
    str extract — the M13 parser pattern), bucket, aggregate."""
    ds = read_table(sf_dir, "events", columns=["props", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # anchored on the "k" key (sign included) so any props layout —
        # other numeric fields first, negative k — matches json_extract
        k = b["props"].str.extract(r'"k"\s*:\s*(-?\d+)')[0].astype("int64")
        b = b.assign(k_bucket=k // 10)
        return b.groupby("k_bucket", as_index=False).agg(
            n=("value", "size"), value_sum=("value", "sum")
        )

    out = partial_combine(ds, partial).groupby("k_bucket", as_index=False).agg(
        n=("n", "sum"), value_sum=("value_sum", "sum")
    )
    out["avg_value"] = duck_round(out["value_sum"] / out["n"], 4)
    out = out.drop(columns=["value_sum"])
    return out.sort_values("k_bucket").reset_index(drop=True)


_HASHJOIN_SQL = """
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderstatus = 'O'
"""


@register("hash_join_orders_customers", _HASHJOIN_SQL)
def hash_join_orders_customers(sf_dir: str):
    """Two-sided hash-partitioned join via the REAL ``Dataset.join`` (both
    sides shuffle on the key) — the non-broadcast join operator for when
    neither side fits a broadcast (ray_guide 'Both sides large').  The
    broadcast variants stay the right choice for dim tables; this one
    demonstrates the partitioned path."""
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    ).filter(expr="o_orderstatus == 'O'").drop_columns(["o_orderstatus"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"])
    # empty sides are safe: the DemeterJoinAggregation subclass (installed
    # at import; schema_infer._install_join_empty_partition_fix) types
    # column-less partition sides before the acero join
    joined = orders.join(cust, join_type="inner", num_partitions=8,
                         on=("o_custkey",), right_on=("c_custkey",))
    return joined.select_columns(["o_orderkey", "o_totalprice", "c_name", "c_mktsegment"])


_SORT_SQL = """
SELECT n_name, n_regionkey FROM nation ORDER BY n_regionkey DESC, n_name ASC
"""


@register("sorted_nations", _SORT_SQL)
def sorted_nations(sf_dir: str):
    """The real distributed ``Dataset.sort`` operator (O3 output-order
    requirement; big inputs use the same range-partitioned sort)."""
    ds = read_table(sf_dir, "nation", columns=["n_name", "n_regionkey"])
    return ds.sort(["n_regionkey", "n_name"], descending=[True, False])


_SLIDING_SQL = """
SELECT user_id,
       (epoch_us(ts) // 3600000000) - off.o AS window_start_hour,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS sum_value
FROM events, (VALUES (0), (1)) AS off(o)
GROUP BY user_id, window_start_hour
ORDER BY user_id, window_start_hour
"""


@register("sliding_window_events", _SLIDING_SQL)
def sliding_window_events(sf_dir: str):
    """Sliding 2h windows stepping 1h: each event contributes to the two
    windows covering it — per-batch explode to (window_start, event) rows,
    partial aggregation, driver combine (the sliding-window batch shape;
    tumbling is the off=0 slice)."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        hours = (df["ts"].astype("int64") // 3600000000).astype("int64")
        frames = []
        for off in (0, 1):
            frames.append(pd.DataFrame({
                "user_id": df["user_id"],
                "window_start_hour": hours - off,
                "value": df["value"],
            }))
        both = pd.concat(frames, ignore_index=True)
        g = both.groupby(["user_id", "window_start_hour"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = partial_shuffle_combine(
        ds, partial, ["user_id", "window_start_hour"], ["n_events", "sum_value"]
    )
    out["sum_value"] = duck_round(out["sum_value"], 2)
    return out.sort_values(["user_id", "window_start_hour"]).reset_index(drop=True)


def asof_join_grouped(a_ds, b_ds, key: str, ts_col: str, b_cols: list[str],
                      suffix: str = "asof_", direction: str = "backward"):
    """As-of join: for every left row, the right row with the LARGEST
    ``ts_col`` <= the left row's (``direction="backward"``, the default) or
    the SMALLEST ``ts_col`` >= it (``"forward"``), within the same ``key``
    partition — the point-in-time lookup streaming engines call ASOF JOIN.
    Both sides shuffle once on the key; within each partition the match is
    one vectorized forward-fill over the merged sort (forward direction =
    the same merge on negated timestamps).

    Right-side rows must be unique per (key, ts) — pre-aggregate ties
    before calling (the oracle's determinism requirement too)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    import ray.data  # noqa: F401

    a_tag = a_ds.map_batches(
        lambda t: t.append_column("__side", pa.array(np.zeros(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )
    b_tag = b_ds.map_batches(
        lambda t: t.append_column("__side", pa.array(np.ones(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    )
    both = a_tag.union(b_tag)

    _b_sch = _arrow_schema_of(b_ds)
    _b_types = (dict(zip(_b_sch.names, _b_sch.types)) if _b_sch is not None
                else {})

    def _b_type(t: pa.Table, c: str):
        # a GLOBALLY empty b side ships no blocks, so its columns never
        # reach the partition table — type all-miss columns from b's
        # static schema instead of KeyError-ing
        return (t.schema.field(c).type if c in t.column_names
                else _b_types.get(c, pa.float64()))

    def merge_partition(t: pa.Table) -> pa.Table:
        """Vectorized MULTI-key as-of merge over one hash partition: sort
        the partition by (key, ts, b-before-a), forward-fill the last
        right-row position with key-segment resets — one numpy pass for
        every key in the partition, no per-key Python.  Pure-Arrow column
        takes keep right-side types exact with misses as real nulls (a
        float64 carrier would silently lose precision above 2^53)."""
        drop = ["__side"] + [c for c in b_cols if c in t.column_names]
        if "__pkey" in t.column_names:
            drop.append("__pkey")
        side = t["__side"].to_numpy(zero_copy_only=False)
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        if direction == "forward":  # forward = backward over negated time
            ts = -ts.astype(np.int64)
        keys = t[key].to_numpy(zero_copy_only=False)
        n = len(side)
        if n == 0:
            out = t.drop_columns(drop)
            for c in b_cols:  # keep the output schema on empty partitions
                out = out.append_column(suffix + c, pa.nulls(0, type=_b_type(t, c)))
            return out
        # b rows sort before a rows at equal ts (inclusive as-of match)
        order = np.lexsort((1 - side, ts, keys))
        k_s, side_s = keys[order], side[order]
        is_b = side_s == 1
        pos = np.arange(n)
        last_b = np.maximum.accumulate(np.where(is_b, pos, -1))
        new_key = np.r_[True, k_s[1:] != k_s[:-1]]
        seg_starts = np.flatnonzero(new_key)
        seg_id = np.cumsum(new_key.astype(np.int64)) - 1
        hit = last_b >= seg_starts[seg_id]
        a_pos = np.flatnonzero(~is_b)
        orig_a = order[a_pos]
        a_tbl = t.drop_columns(drop).take(pa.array(orig_a, pa.int64()))
        if not is_b.any():
            for c in b_cols:
                a_tbl = a_tbl.append_column(
                    suffix + c, pa.nulls(len(orig_a), type=_b_type(t, c))
                )
            return a_tbl
        orig_b = order[np.clip(last_b[a_pos], 0, None)]
        hit_a = hit[a_pos]
        for c in b_cols:
            col = t[c].take(pa.array(orig_b, pa.int64())).combine_chunks()
            col = pc.if_else(pa.array(hit_a), col, pa.nulls(len(hit_a), type=col.type))
            a_tbl = a_tbl.append_column(suffix + c, col)
        return a_tbl

    s = _arrow_schema_of(a_ds)
    key_type = dict(zip(s.names, s.types))[key]
    # typed zero-row anchor: map_groups never runs on all-empty input, so
    # without it the output would lose the a-side + asof_* schema
    if _b_sch is not None and all(c in _b_sch.names for c in b_cols):
        anchor_fields = list(s) + [
            pa.field(suffix + c, _b_types[c]) for c in b_cols]
        anchor = ray.data.from_arrow(pa.schema(anchor_fields).empty_table())
        _union_anchor = lambda d: d.union(anchor)  # noqa: E731
    else:  # schema unknowable: skip anchoring rather than mis-shape a union
        _union_anchor = lambda d: d  # noqa: E731

    if pa.types.is_integer(key_type):
        # hash-partition on the key: each partition task merges MANY keys in
        # one vectorized pass — O(partitions) Python calls, not O(keys)
        nparts = 64

        def add_pkey(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column("__pkey", pa.array(k % nparts, pa.int64()))

        return _union_anchor(
            both.map_batches(add_pkey, batch_format="pyarrow")
            .groupby("__pkey")
            .map_groups(merge_partition, batch_format="pyarrow")
        )
    # non-integer keys: per-key groups (same vectorized merge body — a
    # single-key partition is just the degenerate case)
    return _union_anchor(both.groupby(key).map_groups(
        merge_partition, batch_format="pyarrow"))


_ASOF_SQL = """
WITH b AS (
  SELECT user_id, ts, MAX(event_id) AS b_event_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
a AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT a.event_id, a.user_id,
       CAST(COALESCE(b.b_event_id, -1) AS BIGINT) AS asof_b_event_id
FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts
ORDER BY a.event_id
"""


_ASOF_FWD_SQL = """
WITH b AS (
  SELECT user_id, ts, MAX(event_id) AS b_event_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
a AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
SELECT a.event_id, a.user_id,
       CAST(COALESCE(b.b_event_id, -1) AS BIGINT) AS asof_b_event_id
FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts <= b.ts
ORDER BY a.event_id
"""


@register("asof_forward_view_purchase", _ASOF_FWD_SQL)
def asof_forward_view_purchase(sf_dir: str):
    """FORWARD as-of: each view event joined to the same user's NEXT
    purchase at or after it (direction='forward' = the backward merge over
    negated timestamps)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    a = ds.filter(expr="event_type == 'view'").drop_columns(["event_type"])
    b_raw = ds.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])

    def b_partial(t: pd.DataFrame) -> pd.DataFrame:
        return t.groupby(["user_id", "ts"], as_index=False).agg(
            b_event_id=("event_id", "max")
        )

    b_df = partial_shuffle_combine(
        b_raw, b_partial, ["user_id", "ts"], ["b_event_id"],
        batch_format="pandas", agg="max",
    )
    b_ds = ray.data.from_arrow(
        pa.Table.from_pandas(b_df, preserve_index=False).replace_schema_metadata(None)
    )
    out = asof_join_grouped(
        a, b_ds, key="user_id", ts_col="ts", b_cols=["b_event_id"],
        direction="forward",
    ).to_pandas()
    out["asof_b_event_id"] = out.pop("asof_b_event_id").fillna(-1).astype(np.int64)
    return out.sort_values("event_id").reset_index(drop=True)[
        ["event_id", "user_id", "asof_b_event_id"]
    ]


@register("asof_join_purchase_view", _ASOF_SQL)
def asof_join_purchase_view(sf_dir: str):
    """Each purchase event joined to the same user's latest view event at or
    before it (ASOF LEFT JOIN) — ties on (user, ts) pre-aggregated to the
    max event_id so both sides are deterministic."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    a = ds.filter(expr="event_type == 'purchase'").drop_columns(["event_type"])
    b_raw = ds.filter(expr="event_type == 'view'").drop_columns(["event_type"])

    def b_partial(t: pd.DataFrame) -> pd.DataFrame:
        g = t.groupby(["user_id", "ts"], as_index=False).agg(b_event_id=("event_id", "max"))
        return g

    b_df = partial_shuffle_combine(
        b_raw, b_partial, ["user_id", "ts"], ["b_event_id"],
        batch_format="pandas", agg="max",
    )
    b = ray.data.from_arrow(
        pa.Table.from_pandas(b_df, preserve_index=False).replace_schema_metadata(None)
    )
    out = asof_join_grouped(a, b, "user_id", "ts", ["b_event_id"]).to_pandas()
    # misses -> -1 (both sides) so the column stays plain int64 for hashing
    out["asof_b_event_id"] = (
        out["asof_b_event_id"].fillna(-1).astype(np.int64)
    )
    return out[["event_id", "user_id", "asof_b_event_id"]].sort_values(
        "event_id"
    ).reset_index(drop=True)
