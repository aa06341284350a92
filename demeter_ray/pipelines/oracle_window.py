"""Window functions, grouping sets, pivots, range joins and deterministic
sampling — the relational tail of SURVEY.md §2.6/§2.9 plus training-data
operators (hash sampling, text normalization), every one with a DuckDB
oracle.

Design notes (scale-first, same house rules as relational.py):

- Ordered window functions (rank / dense_rank / row_number / lag) use the
  sessionize shape — ONE range-partitioned ``Dataset.sort``, vectorized
  per-block partials, a tiny O(blocks x groups) driver combine for the
  cross-block carry, then a second vectorized pass over the SAME
  materialized sorted blocks (batch_size=None keeps block segmentation
  identical).  No per-group Python at any group cardinality.
- ROLLUP pre-aggregates at the finest level through the size-gated
  partial_shuffle_combine; super-aggregate levels are derived from the
  (small, key-cardinality-bounded) leaf table on the driver.
- The distance-range join broadcasts the small side (ray.put once) and
  emits per-batch partials; only min/max/count cross the shuffle, so the
  comparison stays float-exact.
- Hash sampling recomputes functions/hashing.stable_hash64 in SQL (sha256),
  making "deterministic 10% sample" driver-checkable end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from demeter_ray.pipelines.oracle_spatial import (
    LAT_EXPR,
    LON_EXPR,
    ORACLE_CENTROIDS,
    derive_lat,
    derive_lon,
)
from demeter_ray.pipelines.oracle_text import sha256_hash64_sql
from demeter_ray.pipelines.relational import (
    duck_round,
    partial_combine,
    partial_shuffle_combine,
    register,
)
from demeter_ray.sources.tables import read_table

# ------------------------------------------------------------------ ranks

_RANK_SQL = """
SELECT c_nationkey, c_custkey,
       ROW_NUMBER() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC, c_custkey) AS rn,
       RANK()       OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_nationkey
                          ORDER BY c_acctbal DESC) AS drnk
FROM customer
ORDER BY c_nationkey, rn
"""


def ranked_window(ds, part_col: str, val_col: str, key_col: str) -> pd.DataFrame:
    """row_number / rank / dense_rank per ``part_col`` ordered by
    (``val_col`` DESC, ``key_col``).

    One global ``Dataset.sort``, vectorized block partials (per (block,
    partition): row count, distinct-value count, boundary values), an
    ordered driver combine carrying (rows-before, distinct-before, last
    value, last value's run start) across blocks, then a second vectorized
    pass over the SAME materialized blocks adding the carried bases.  Carry
    state is O(blocks x partitions) — scale-safe at any row cardinality."""
    import ray as _ray

    sorted_ds = ds.sort(
        [part_col, val_col, key_col], descending=[False, True, False]
    ).materialize()

    def _segments(batch: pa.Table):
        nat = batch[part_col].to_numpy(zero_copy_only=False)
        bal = batch[val_col].to_numpy(zero_copy_only=False)
        key = batch[key_col].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]])
        ends = np.r_[starts[1:], len(nat)]
        return nat, bal, key, starts, ends

    def seg_partial(batch: pa.Table) -> pa.Table:
        empty = {
            "part": pa.array([], pa.int64()),
            "first_bal": pa.array([], pa.float64()),
            "first_key": pa.array([], pa.int64()),
            "last_bal": pa.array([], pa.float64()),
            "n_rows": pa.array([], pa.int64()),
            "n_distinct": pa.array([], pa.int64()),
            "last_run_len": pa.array([], pa.int64()),
        }
        if batch.num_rows == 0:
            return pa.table(empty)
        nat, bal, key, starts, ends = _segments(batch)
        new_val = np.r_[True, (bal[1:] != bal[:-1]) | (nat[1:] != nat[:-1])]
        cum_new = np.cumsum(new_val)
        n_distinct = cum_new[ends - 1] - cum_new[starts] + 1
        # length of the trailing equal-value run in each segment (for the
        # cross-block rank carry)
        run_start = np.maximum.accumulate(np.where(new_val, np.arange(len(nat)), 0))
        last_run_len = (ends - 1) - run_start[ends - 1] + 1
        return pa.table(
            {
                "part": pa.array(nat[starts], pa.int64()),
                "first_bal": pa.array(bal[starts], pa.float64()),
                "first_key": pa.array(key[starts], pa.int64()),
                "last_bal": pa.array(bal[ends - 1], pa.float64()),
                "n_rows": pa.array(ends - starts, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "last_run_len": pa.array(last_run_len, pa.int64()),
            }
        )

    parts = partial_combine(sorted_ds, seg_partial, "pyarrow",
                            batch_size=None)
    # order partials the same way the global sort ordered rows
    parts = parts.sort_values(
        ["part", "first_bal", "first_key"], ascending=[True, False, True]
    ).reset_index(drop=True)

    # ordered carry per (block segment): rows/distinct before it, plus the
    # previous segment's boundary value and that value's run-start row
    offsets: dict[tuple[int, int], tuple[int, int, float, int]] = {}
    rows_before = distinct_before = 0
    prev_part = None
    prev_last_bal = np.nan
    prev_run_before = 0  # rows before the trailing run of prev segment
    for row in parts.itertuples(index=False):
        if row.part != prev_part:
            rows_before = distinct_before = 0
            prev_last_bal = np.nan
            prev_run_before = 0
        offsets[(int(row.part), int(row.first_key))] = (
            rows_before,
            distinct_before,
            prev_last_bal,
            prev_run_before,
        )
        boundary_merge = (
            prev_part == row.part and row.first_bal == prev_last_bal
        )
        seg_distinct = int(row.n_distinct) - (1 if boundary_merge else 0)
        if not (boundary_merge and int(row.n_distinct) == 1):
            # a run ends inside this segment; otherwise the whole segment
            # continues the previous run and the carried start stands
            prev_run_before = rows_before + int(row.n_rows) - int(row.last_run_len)
        rows_before += int(row.n_rows)
        distinct_before += seg_distinct
        prev_part = row.part
        prev_last_bal = row.last_bal
    ref = _ray.put(offsets)

    def apply_ranks(batch: pa.Table, off) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {part_col: pa.array([], pa.int64()),
                 key_col: pa.array([], pa.int64()),
                 "rn": pa.array([], pa.int64()),
                 "rnk": pa.array([], pa.int64()),
                 "drnk": pa.array([], pa.int64())}
            )
        nat, bal, key, starts, ends = _segments(batch)
        n = len(nat)
        seg_id = np.cumsum(np.r_[0, (nat[1:] != nat[:-1]).astype(np.int64)])
        pos = np.arange(n)
        within_rn = pos - starts[seg_id] + 1
        new_val = np.r_[True, (bal[1:] != bal[:-1]) | (nat[1:] != nat[:-1])]
        cum_new = np.cumsum(new_val)
        within_dense = cum_new - (cum_new[starts[seg_id]] - 1)
        run_start = np.maximum.accumulate(np.where(new_val, pos, 0))
        rn = np.empty(n, dtype=np.int64)
        rnk = np.empty(n, dtype=np.int64)
        drnk = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            rows_before, distinct_before, prev_bal, prev_run_before = off[
                (int(nat[s]), int(key[s]))
            ]
            merge = bal[s] == prev_bal
            rn[s:e] = within_rn[s:e] + rows_before
            drnk[s:e] = within_dense[s:e] + distinct_before - (1 if merge else 0)
            # rank = row number of the value-run's first row; runs starting
            # inside this block anchor locally, the boundary-continuation
            # run anchors at the carried run start
            local_anchor = run_start[s:e] - s + 1 + rows_before
            if merge:
                in_boundary_run = run_start[s:e] == s
                rnk[s:e] = np.where(in_boundary_run, prev_run_before + 1, local_anchor)
            else:
                rnk[s:e] = local_anchor
        return pa.table(
            {
                part_col: pa.array(nat, pa.int64()),
                key_col: pa.array(key, pa.int64()),
                "rn": pa.array(rn, pa.int64()),
                "rnk": pa.array(rnk, pa.int64()),
                "drnk": pa.array(drnk, pa.int64()),
            }
        )

    out = partial_combine(sorted_ds, lambda b: apply_ranks(b, _ray.get(ref)),
                          "pyarrow", batch_size=None)
    return out.sort_values([part_col, "rn"]).reset_index(drop=True)


@register("rank_customers_by_balance", _RANK_SQL)
def rank_customers_by_balance(sf_dir: str):
    """row_number / rank / dense_rank per nation ordered by balance desc —
    the distributed ranked_window over the customer table."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    return ranked_window(ds, "c_nationkey", "c_acctbal", "c_custkey")


# ------------------------------------------------------------------- lag

_LAG_SQL = """
SELECT event_id, user_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS delta_us
FROM events
ORDER BY user_id, ts, event_id
"""


def lag_delta_window(ds, part_col: str, ts_col: str, id_col: str) -> pd.DataFrame:
    """LAG window function: per-partition delta between consecutive ordered
    timestamps.  Sessionize shape: one sort, per-block vectorized diffs, the
    cross-block boundary delta carried via an O(blocks x partitions) driver
    map, second pass over the same materialized blocks."""
    import ray as _ray

    sorted_ds = ds.sort([part_col, ts_col, id_col]).materialize()

    def _cols(batch: pa.Table):
        uid = batch[part_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        us = ts.to_numpy(zero_copy_only=False)
        eid = batch[id_col].to_numpy(zero_copy_only=False)
        return uid, us, eid

    def seg_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"part": pa.array([], pa.int64()),
                 "first_ts": pa.array([], pa.int64()),
                 "first_eid": pa.array([], pa.int64()),
                 "last_ts": pa.array([], pa.int64())}
            )
        uid, us, eid = _cols(batch)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        return pa.table(
            {
                "part": pa.array(uid[starts], pa.int64()),
                "first_ts": pa.array(us[starts], pa.int64()),
                "first_eid": pa.array(eid[starts], pa.int64()),
                "last_ts": pa.array(us[ends - 1], pa.int64()),
            }
        )

    parts = (
        partial_combine(sorted_ds, seg_partial, "pyarrow", batch_size=None)
        .sort_values(["part", "first_ts", "first_eid"])
        .reset_index(drop=True)
    )
    prev_last = parts.groupby("part")["last_ts"].shift(1)
    carry = {
        (int(u), int(t), int(e)): (None if pd.isna(p) else int(p))
        for u, t, e, p in zip(
            parts["part"], parts["first_ts"], parts["first_eid"], prev_last
        )
    }
    ref = _ray.put(carry)

    def apply_lag(batch: pa.Table, off) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 part_col: pa.array([], pa.int64()),
                 "delta_us": pa.array([], pa.float64())}
            )
        uid, us, eid = _cols(batch)
        n = len(uid)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        # float64 carrier: NaN marks LAG's NULL on the first row per
        # partition, matching how the oracle's BIGINT-with-NULL lands in
        # pandas
        delta = np.empty(n, dtype=np.float64)
        delta[1:] = us[1:] - us[:-1]
        for s in starts:
            prev = off[(int(uid[s]), int(us[s]), int(eid[s]))]
            delta[s] = np.nan if prev is None else us[s] - prev
        return pa.table(
            {
                id_col: pa.array(eid, pa.int64()),
                part_col: pa.array(uid, pa.int64()),
                "delta_us": pa.array(delta, pa.float64()),
            }
        )

    return partial_combine(sorted_ds,
                           lambda b: apply_lag(b, _ray.get(ref)),
                           "pyarrow", batch_size=None)


@register("lag_delta_events", _LAG_SQL)
def lag_delta_events(sf_dir: str):
    """LAG window function: per-user time delta between consecutive events
    — the distributed lag_delta_window over the events table."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return lag_delta_window(ds, "user_id", "ts", "event_id")


# ------------------------------------------------- rolling window frame

_ROLLING_SQL = """
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
         AS roll_avg
FROM events ORDER BY user_id, ts, event_id
"""


@register("rolling_avg_events", _ROLLING_SQL)
def rolling_avg_events(sf_dir: str):
    """Rolling window frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW):
    sessionize shape — one sort, per-block vectorized rolling means, the
    2-row cross-block overlap carried via an O(blocks x users) driver map.
    The 3-term sum always adds in window order, so the float result is
    bit-identical to the oracle's."""
    import ray as _ray

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    sorted_ds = ds.sort(["user_id", "ts", "event_id"]).materialize()

    def seg_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"user_id": pa.array([], pa.int64()),
                 "first_ts": pa.array([], pa.int64()),
                 "first_eid": pa.array([], pa.int64()),
                 "tail1": pa.array([], pa.float64()),
                 "tail2": pa.array([], pa.float64()),
                 "seg_len": pa.array([], pa.int64())}
            )
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        # last two values of each segment (NaN-padded), in order
        # (second-to-last, last)
        tail1 = np.where(ends - starts >= 2, val[np.maximum(ends - 2, 0)], np.nan)
        tail2 = val[ends - 1]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "first_ts": pa.array(us[starts], pa.int64()),
                "first_eid": pa.array(eid[starts], pa.int64()),
                "tail1": pa.array(tail1, pa.float64()),
                "tail2": pa.array(tail2, pa.float64()),
                "seg_len": pa.array(ends - starts, pa.int64()),
            }
        )

    parts = (
        partial_combine(sorted_ds, seg_partial, "pyarrow", batch_size=None)
        .sort_values(["user_id", "first_ts", "first_eid"])
        .reset_index(drop=True)
    )
    # carry: for each block-starting segment, the previous 1-2 values of the
    # same user (window order).  Segments shorter than 2 pass through the
    # carried values from the block before them.
    carry: dict[tuple[int, int, int], tuple[float, float]] = {}
    prev_user = None
    p1 = p2 = np.nan  # (second-to-last, last) seen so far for prev_user
    for row in parts.itertuples(index=False):
        if row.user_id != prev_user:
            p1 = p2 = np.nan
        carry[(int(row.user_id), int(row.first_ts), int(row.first_eid))] = (p1, p2)
        if row.seg_len >= 2:
            p1, p2 = float(row.tail1), float(row.tail2)
        elif row.seg_len == 1:
            p1, p2 = p2, float(row.tail2)
        prev_user = row.user_id
    ref = _ray.put(carry)

    def apply_roll(batch: pa.Table, off) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "roll_avg": pa.array([], pa.float64())}
            )
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        val = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(uid)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], n]
        seg_id = np.cumsum(np.r_[0, (uid[1:] != uid[:-1]).astype(np.int64)])
        pos = np.arange(n) - starts[seg_id]  # 0-based position in segment
        # lag arrays with the carried boundary values patched in
        lag1 = np.empty(n)
        lag2 = np.empty(n)
        lag1[1:] = val[:-1]
        lag2[2:] = val[:-2]
        for s in starts:
            c1, c2 = off[(int(uid[s]), int(us[s]), int(eid[s]))]
            lag1[s] = c2
            lag2[s] = c1
            if s + 1 < n and seg_id[s + 1] == seg_id[s]:
                lag2[s + 1] = c2
        # window-order sum (lag2 + lag1) + val; availability of each
        # preceding slot == its lag value is not NaN
        a1 = ~np.isnan(lag1)
        a2 = ~np.isnan(lag2)
        total = np.where(a2, np.nan_to_num(lag2) + np.nan_to_num(lag1) + val,
                         np.where(a1, np.nan_to_num(lag1) + val, val))
        cnt = 1 + a1.astype(np.int64) + a2.astype(np.int64)
        roll = total / cnt
        # duck_round resolved at module import (never import demeter_ray at
        # call time inside worker-executed bodies — pickle-by-value cannot
        # cover call-time imports; caught by the /verify foreign-cwd drive)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "roll_avg": pa.array(duck_round(roll, 4), pa.float64()),
            }
        )

    return partial_combine(sorted_ds,
                           lambda b: apply_roll(b, _ray.get(ref)),
                           "pyarrow", batch_size=None)


# ---------------------------------------------------------------- rollup

_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("rollup_flag_status", _ROLLUP_SQL)
def rollup_flag_status(sf_dir: str):
    """GROUP BY ROLLUP: leaf level through the size-gated shuffle combine,
    super-aggregate levels derived from the (key-bounded) leaf table —
    one pass over the data for all grouping sets."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"), n_rows=("l_quantity", "size")
        )
        return g

    leaf = partial_shuffle_combine(
        ds, partial, ["l_returnflag", "l_linestatus"], ["sum_qty", "n_rows"],
        batch_format="pandas",
    )
    leaf["sum_qty"] = leaf["sum_qty"].astype(np.int64)
    lvl1 = leaf.groupby("l_returnflag", as_index=False)[["sum_qty", "n_rows"]].sum()
    lvl1["l_linestatus"] = None
    lvl0 = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None],
         "sum_qty": [leaf["sum_qty"].sum()], "n_rows": [leaf["n_rows"].sum()]}
    )
    out = pd.concat([lvl0, lvl1, leaf], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]
    ]
    out["sum_qty"] = out["sum_qty"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first"
    ).reset_index(drop=True)


# ----------------------------------------------------------------- pivot

_PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events GROUP BY user_id ORDER BY user_id
"""

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register("pivot_event_types", _PIVOT_SQL)
def pivot_event_types(sf_dir: str):
    """Pivot (conditional aggregation): per-batch vectorized crosstab
    partials, summed through the size-gated shuffle combine — the wide
    counts shuffle as one row per (user, batch), never raw events."""
    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in _EVENT_TYPES]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.crosstab(b["user_id"], b["event_type"])
        d = d.reindex(columns=list(_EVENT_TYPES), fill_value=0)
        d.columns = cols
        return d.reset_index()

    out = partial_shuffle_combine(ds, partial, ["user_id"], cols, batch_format="pandas")
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


# ------------------------------------------------- distance-range join

def _range_join_sql() -> str:
    values = ", ".join(f"({i}, {x}, {y})" for i, x, y in ORACLE_CENTROIDS)
    lon = LON_EXPR.format(k="event_id")
    lat = LAT_EXPR.format(k="event_id")
    return f"""
WITH pts AS (
  SELECT event_id, {lon} AS lon, {lat} AS lat FROM events
),
c(id, cx, cy) AS (VALUES {values}),
hits AS (
  SELECT c.id, sqrt((p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy)) AS d
  FROM pts p JOIN c ON (p.lon - c.cx) * (p.lon - c.cx) + (p.lat - c.cy) * (p.lat - c.cy) <= 0.01
)
SELECT id AS centroid_id, COUNT(*) AS n_within,
       MIN(d) AS min_dist, MAX(d) AS max_dist
FROM hits GROUP BY id ORDER BY centroid_id
"""


@register("range_join_events_centroids", _range_join_sql())
def range_join_events_centroids(sf_dir: str):
    """Distance-range join (spatial band join): every event within radius
    0.1 deg of each centroid, aggregated per centroid.  Broadcast small side
    (ray.put once), per-batch vectorized distance matrix, min/max/count
    partials through the shuffle — the raw pairs never leave the batch task.
    Float-exact: min/max are order-free and sqrt/multiply are IEEE-identical
    to the SQL expressions."""
    import ray as _ray

    ids = np.array([c[0] for c in ORACLE_CENTROIDS], dtype=np.int64)
    cx = np.array([c[1] for c in ORACLE_CENTROIDS])
    cy = np.array([c[2] for c in ORACLE_CENTROIDS])
    ref = _ray.put((ids, cx, cy))

    ds = read_table(sf_dir, "events", columns=["event_id"])

    def partial(batch: pa.Table) -> pa.Table:
        k = batch["event_id"].to_numpy(zero_copy_only=False)
        iids, ix, iy = _ray.get(ref)
        lon, lat = derive_lon(k), derive_lat(k)
        dx = lon[:, None] - ix[None, :]
        dy = lat[:, None] - iy[None, :]
        d2 = dx * dx + dy * dy
        within = d2 <= 0.01
        out_id, out_n, out_min, out_max = [], [], [], []
        for j in range(len(iids)):
            m = within[:, j]
            if not m.any():
                continue
            d = np.sqrt(d2[m, j])
            out_id.append(iids[j])
            out_n.append(int(m.sum()))
            out_min.append(float(d.min()))
            out_max.append(float(d.max()))
        return pa.table(
            {
                "centroid_id": pa.array(out_id, pa.int64()),
                "n_within": pa.array(out_n, pa.int64()),
                "min_dist": pa.array(out_min, pa.float64()),
                "max_dist": pa.array(out_max, pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("centroid_id", as_index=False).agg(
        n_within=("n_within", "sum"), min_dist=("min_dist", "min"),
        max_dist=("max_dist", "max"),
    )
    return out.sort_values("centroid_id").reset_index(drop=True)


# ------------------------------------------------------------ set ops

_SETOPS_SQL = """
SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY o_custkey
"""


@register("except_urgent_not_finished", _SETOPS_SQL)
def except_urgent_not_finished(sf_dir: str):
    """Set difference (EXCEPT): customers with an urgent order minus
    customers with any finished order — the size-gated anti-join over two
    filtered scans of the same table."""
    from demeter_ray.pipelines.relational import gated_semi_join

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderpriority", "o_orderstatus"])
    urgent = ds.filter(expr="o_orderpriority == '1-URGENT'").select_columns(["o_custkey"])
    finished = ds.filter(expr="o_orderstatus == 'F'").select_columns(["o_custkey"])
    out = gated_semi_join(urgent, "o_custkey", finished, "o_custkey", anti=True)
    res = out.to_pandas().drop_duplicates()
    if res.empty:  # empty Dataset -> schemaless frame; pin the contract
        res = pd.DataFrame({"o_custkey": pd.Series(dtype="int64")})
    return res.sort_values("o_custkey").reset_index(drop=True)


_INTERSECT_SQL = """
SELECT l_partkey FROM lineitem WHERE l_quantity >= 45
INTERSECT
SELECT l_partkey FROM lineitem WHERE l_discount = 0
ORDER BY l_partkey
"""


@register("intersect_bulk_nodiscount_parts", _INTERSECT_SQL)
def intersect_bulk_nodiscount_parts(sf_dir: str):
    """Set intersection (INTERSECT): parts shipped in bulk that also shipped
    undiscounted — the size-gated semi-join."""
    from demeter_ray.pipelines.relational import gated_semi_join

    ds = read_table(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_discount"])
    bulk = ds.filter(expr="l_quantity >= 45").select_columns(["l_partkey"])
    nodisc = ds.filter(expr="l_discount == 0").select_columns(["l_partkey"])
    out = gated_semi_join(bulk, "l_partkey", nodisc, "l_partkey")
    res = out.to_pandas().drop_duplicates()
    return res.sort_values("l_partkey").reset_index(drop=True)


# ------------------------------------------------- text normalization

_NORMALIZE_SQL = """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'),
                           ' +', ' ', 'g')) AS norm_text,
       len(string_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]+', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS n_tokens
FROM documents ORDER BY doc_id
"""


@register("normalize_docs", _NORMALIZE_SQL)
def normalize_docs(sf_dir: str):
    """Text normalization for training corpora: lowercase, strip
    non-alphanumerics, collapse whitespace, trim — vectorized pandas .str
    ops per batch, byte-identical to the SQL regexp chain (ASCII corpus)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        norm = (
            b["text"].str.lower()
            .str.replace(r"[^a-z0-9 ]+", " ", regex=True)
            .str.replace(r" +", " ", regex=True)
            .str.strip()
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "norm_text": norm,
                "n_tokens": norm.str.split(" ").str.len().astype(np.int64),
            }
        )

    out = ds.map_batches(fn, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------- sorted exact quantiles

_SORTED_QUANTILES_SQL = """
SELECT round(QUANTILE_CONT(l_extendedprice, 0.5), 4)  AS q50,
       round(QUANTILE_CONT(l_extendedprice, 0.9), 4)  AS q90,
       round(QUANTILE_CONT(l_extendedprice, 0.99), 4) AS q99
FROM lineitem
"""


@register("sorted_quantiles_price", _SORTED_QUANTILES_SQL)
def sorted_quantiles_price(sf_dir: str):
    """Exact quantiles over a CONTINUOUS domain (where the count-histogram
    sketch of quantiles_quantity_by_flag would blow up): one distributed
    sort + per-block counts + a targeted fetch of the <= 2k order
    statistics — stages/sketches.sorted_quantiles."""
    from demeter_ray.stages.sketches import sorted_quantiles

    ds = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    return sorted_quantiles(ds, "l_extendedprice", [0.5, 0.9, 0.99])


_GROUPED_QUANT_SQL = """
SELECT l_returnflag,
       round(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS q50,
       round(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS q90
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("grouped_quantiles_price_by_flag", _GROUPED_QUANT_SQL)
def grouped_quantiles_price_by_flag(sf_dir: str):
    """Per-group exact quantiles over a CONTINUOUS domain — the grouped
    generalization of sorted_quantiles_price (stages/sketches.
    grouped_sorted_quantiles): sort on (key, value), O(blocks + groups)
    count partials, targeted per-group order-statistic fetch."""
    from demeter_ray.stages.sketches import grouped_sorted_quantiles

    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    # the engine core keys on int64; map the 3-value flag through a dense
    # integer code and back (the general string-key path would hash-encode)
    flags = {"A": 0, "N": 1, "R": 2}
    inv = {v: k for k, v in flags.items()}

    def code(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": b["l_returnflag"].map(flags).astype(np.int64),
                "v": b["l_extendedprice"].astype(np.float64),
            }
        )

    coded = ds.map_batches(code, batch_format="pandas")
    out = grouped_sorted_quantiles(coded, "k", "v", [0.5, 0.9])
    out["l_returnflag"] = out.pop("k").map(inv)
    return out[["l_returnflag", "q50", "q90"]].sort_values(
        "l_returnflag"
    ).reset_index(drop=True)


# ----------------------------------------------------------------- ntile

_NTILE_SQL = """
SELECT c_nationkey, c_custkey,
       NTILE(4) OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC, c_custkey) AS tile
FROM customer ORDER BY c_nationkey, c_custkey
"""


@register("ntile_customers_by_balance", _NTILE_SQL)
def ntile_customers_by_balance(sf_dir: str):
    """NTILE(4) per nation: derived arithmetically from the distributed
    ranked_window's row_number plus per-partition counts — SQL's rule gives
    the first ``cnt % 4`` tiles one extra row, so tile is pure integer math
    of (rn-1, cnt) with no extra pass over the data."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    ranked = ranked_window(ds, "c_nationkey", "c_acctbal", "c_custkey")
    cnt = ranked.groupby("c_nationkey")["rn"].transform("max").to_numpy()
    rn0 = ranked["rn"].to_numpy() - 1
    base, extra = cnt // 4, cnt % 4
    big = (base + 1) * extra  # rows covered by the extra-sized leading tiles
    tile = np.where(
        rn0 < big,
        rn0 // np.maximum(base + 1, 1),
        np.where(base > 0, extra + (rn0 - big) // np.maximum(base, 1), extra),
    ) + 1
    out = pd.DataFrame(
        {
            "c_nationkey": ranked["c_nationkey"],
            "c_custkey": ranked["c_custkey"],
            "tile": tile.astype(np.int64),
        }
    )
    return out.sort_values(["c_nationkey", "c_custkey"]).reset_index(drop=True)


# -------------------------------------------------------- heavy hitters

_HEAVY_SQL = """
SELECT user_id, n FROM (
  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
) ORDER BY n DESC, user_id LIMIT 10
"""


@register("heavy_hitters_users", _HEAVY_SQL)
def heavy_hitters_users(sf_dir: str):
    """Top-k frequent keys (exact heavy hitters): per-batch count partials
    through the size-gated shuffle combine, then the deterministic
    (count DESC, key ASC) top-10 over the key-bounded count table — the
    exact baseline a Misra-Gries sketch would approximate at open-domain
    scale."""
    ds = read_table(sf_dir, "events", columns=["user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("user_id", as_index=False).size().rename(columns={"size": "n"})

    counts = partial_shuffle_combine(ds, partial, ["user_id"], ["n"], batch_format="pandas")
    counts["n"] = counts["n"].astype(np.int64)
    out = counts.sort_values(["n", "user_id"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


# ------------------------------------------------------------------ mode

_MODE_SQL = """
SELECT l_returnflag, l_quantity AS mode_qty, cnt AS n_rows FROM (
  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY COUNT(*) DESC, l_quantity) AS rn
  FROM lineitem GROUP BY l_returnflag, l_quantity
) WHERE rn = 1 ORDER BY l_returnflag
"""


@register("mode_quantity_by_flag", _MODE_SQL)
def mode_quantity_by_flag(sf_dir: str):
    """Per-group MODE (most frequent value, smallest-value tiebreak):
    partial (flag, qty, count) rows through the size-gated shuffle combine,
    then the deterministic argmax over the key-bounded count table."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["l_returnflag", "l_quantity"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    counts = partial_shuffle_combine(
        ds, partial, ["l_returnflag", "l_quantity"], ["cnt"], batch_format="pandas"
    )
    counts = counts.sort_values(
        ["l_returnflag", "cnt", "l_quantity"], ascending=[True, False, True]
    )
    out = counts.groupby("l_returnflag", as_index=False).first()
    out = out.rename(columns={"l_quantity": "mode_qty", "cnt": "n_rows"})
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out[["l_returnflag", "mode_qty", "n_rows"]].sort_values(
        "l_returnflag"
    ).reset_index(drop=True)


# ------------------------------------------------------------------ cube

_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@register("cube_flag_status", _CUBE_SQL)
def cube_flag_status(sf_dir: str):
    """GROUP BY CUBE: all four grouping sets derived from ONE pass — the
    finest level through the size-gated shuffle combine, the three
    super-aggregate levels rolled up from the key-bounded leaf table."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"), n_rows=("l_quantity", "size")
        )

    leaf = partial_shuffle_combine(
        ds, partial, ["l_returnflag", "l_linestatus"], ["sum_qty", "n_rows"],
        batch_format="pandas",
    )
    leaf["sum_qty"] = leaf["sum_qty"].astype(np.int64)
    by_flag = leaf.groupby("l_returnflag", as_index=False)[["sum_qty", "n_rows"]].sum()
    by_flag["l_linestatus"] = None
    by_status = leaf.groupby("l_linestatus", as_index=False)[["sum_qty", "n_rows"]].sum()
    by_status["l_returnflag"] = None
    total = pd.DataFrame(
        {"l_returnflag": [None], "l_linestatus": [None],
         "sum_qty": [leaf["sum_qty"].sum()], "n_rows": [leaf["n_rows"].sum()]}
    )
    out = pd.concat([total, by_flag, by_status, leaf], ignore_index=True)[
        ["l_returnflag", "l_linestatus", "sum_qty", "n_rows"]
    ]
    out["sum_qty"] = out["sum_qty"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return out.sort_values(
        ["l_returnflag", "l_linestatus"], na_position="first"
    ).reset_index(drop=True)


# ------------------------------------------------------ full outer join

_FULL_OUTER_SQL = """
WITH om AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
sm AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month, COUNT(*) AS n_ships
  FROM lineitem GROUP BY 1
)
SELECT coalesce(om.month, sm.month) AS month,
       om.n_orders::DOUBLE AS n_orders, sm.n_ships::DOUBLE AS n_ships
FROM om FULL OUTER JOIN sm ON om.month = sm.month ORDER BY month
"""


@register("full_outer_month_activity", _FULL_OUTER_SQL)
def full_outer_month_activity(sf_dir: str):
    """FULL OUTER JOIN: order months vs ship months (shipping trails orders
    by up to 3 months, so both one-sided cases are exercised).  Each side
    pre-aggregates through the size-gated shuffle combine; the month-level
    join runs through the real two-sided ``Dataset.join`` full_outer."""
    import pyarrow.compute as pc
    import ray.data

    orders = read_table(sf_dir, "orders", columns=["o_orderdate"])
    ships = read_table(sf_dir, "lineitem", columns=["l_shipdate"])

    def month_partial(col: str, out: str):
        def fn(b: pa.Table) -> pa.Table:
            m = pc.strftime(b[col], format="%Y-%m")
            t = pa.table({"month": m})
            g = t.group_by("month").aggregate([("month", "count")])
            return g.rename_columns(["month", out])

        return fn

    om = partial_shuffle_combine(
        orders, month_partial("o_orderdate", "n_orders"), ["month"], ["n_orders"]
    )
    sm = partial_shuffle_combine(
        ships, month_partial("l_shipdate", "n_ships"), ["month"], ["n_ships"]
    )
    def _arrow_ds(df):
        tbl = pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)
        if len(df) == 0:  # empty object columns degrade to null; keep string
            tbl = tbl.cast(pa.schema(
                [pa.field(f.name, pa.string()) if pa.types.is_null(f.type) else f
                 for f in tbl.schema]))
        return ray.data.from_arrow(tbl)

    if len(om) == 0 or len(sm) == 0:
        # Ray's hash-shuffle join cannot finalize all-empty partitions
        # (Arrow acero sees a column-less side); both frames are already
        # driver-side, so the empty case merges locally
        joined = om.merge(sm, on="month", how="outer")
    else:
        joined = _arrow_ds(om).join(
            _arrow_ds(sm),
            join_type="full_outer",
            num_partitions=4,
            on=("month",),
        ).to_pandas()
    out = joined.sort_values("month").reset_index(drop=True)
    out["n_orders"] = out["n_orders"].astype(np.float64)
    out["n_ships"] = out["n_ships"].astype(np.float64)
    return out[["month", "n_orders", "n_ships"]]


# ------------------------------------------------------------- unpivot

_UNPIVOT_SQL = """
SELECT user_id, event_type, COUNT(*) AS n
FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type
"""


@register("unpivot_event_counts", _UNPIVOT_SQL)
def unpivot_event_counts(sf_dir: str):
    """UNPIVOT (wide -> long melt): the pivoted per-user count columns melt
    back to (user_id, event_type, n) rows, dropping structural zeros —
    round-tripping the pivot operator's output shape."""
    wide = pivot_event_types(sf_dir)
    long = wide.melt(
        id_vars=["user_id"], var_name="event_type", value_name="n"
    )
    long["event_type"] = long["event_type"].str.removeprefix("n_")
    long = long[long["n"] > 0].copy()
    long["n"] = long["n"].astype(np.int64)
    return long.sort_values(["user_id", "event_type"]).reset_index(drop=True)


# ---------------------------------------- image perceptual-hash dedup

_PHASH_SQL = """
WITH px AS (
  SELECT d.doc_id, x.x, y.y, c.c,
         ((d.doc_id * 97 + x.x * 31 + y.y * 17 + c.c * 11) % 256) AS v
  FROM documents d,
       generate_series(0, 15) AS x(x),
       generate_series(0, 15) AS y(y),
       generate_series(0, 2) AS c(c)
),
lum AS (
  SELECT doc_id, x, y,
         SUM(CASE c WHEN 0 THEN 299 * v WHEN 1 THEN 587 * v ELSE 114 * v END) AS l
  FROM px GROUP BY doc_id, x, y
),
blk AS (
  SELECT doc_id, x // 2 AS bx, y // 2 AS by, SUM(l) AS s
  FROM lum GROUP BY doc_id, x // 2, y // 2
),
bits AS (
  SELECT a.doc_id, (a.by * 7 + a.bx) AS pos,
         CASE WHEN b.s > a.s THEN 1 ELSE 0 END AS bit
  FROM blk a JOIN blk b ON a.doc_id = b.doc_id AND b.by = a.by AND b.bx = a.bx + 1
  WHERE a.bx < 7
),
ph AS (
  SELECT doc_id, SUM(bit * (1::BIGINT << pos::INT))::BIGINT AS dhash
  FROM bits GROUP BY doc_id
)
SELECT dhash, COUNT(*) AS n_images, MIN(doc_id) AS min_doc
FROM ph GROUP BY dhash HAVING COUNT(*) >= 2 ORDER BY dhash
"""


@register("image_phash_dedup", _PHASH_SQL)
def image_phash_dedup(sf_dir: str):
    """Image near-dup detection by perceptual hash: encode -> decode the
    binary image column (real codec round trip), integer-exact dHash per
    image (codec.dhash56_batch), then hash-partitioned groupby — duplicate
    groups (n >= 2) with their canonical (min) doc.  The generator plants
    true duplicates (doc_id and doc_id+256 render identical pixels), so the
    groups are real.  The oracle recomputes pixels -> luma -> block sums ->
    bits -> hash entirely in SQL.  Scale shape: per-batch partial
    (hash, count, min) rows shuffle, never pixels."""
    from demeter_ray.functions import codec

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = codec.encode_batch(codec.generate_pixels_batch(ids, 16, 16), "png")
        px = codec.decode_batch(blobs, 16, 16)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dhash": pa.array(codec.dhash56_batch(px), pa.int64()),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow", batch_size=512)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("dhash", as_index=False).agg(
            n_images=("doc_id", "size"), min_doc=("doc_id", "min")
        )
        return g

    out = partial_shuffle_combine(
        hashed, partial, ["dhash"], ["n_images", "min_doc"],
        batch_format="pandas", agg={"n_images": "sum", "min_doc": "min"},
    )
    out = out[out["n_images"] >= 2]
    out["n_images"] = out["n_images"].astype(np.int64)
    out["min_doc"] = out["min_doc"].astype(np.int64)
    return out.sort_values("dhash").reset_index(drop=True)


# image near-dup by dHash hamming radius: pairs sharing >=1 exact 14-bit
# chunk (the Charikar bucketing the engine shuffles on) AND hamming <= 3 —
# both conditions recomputed in SQL from the dHash CTE, so the oracle
# reproduces the engine's recall shape exactly (same argument as
# simhash_neardup_docs).
_PHASH_PAIRS_SQL = _PHASH_SQL[: _PHASH_SQL.index("SELECT dhash, COUNT(*)")] + """
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       bit_count(xor(a.dhash, b.dhash))::BIGINT AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
  AND (((a.dhash >> 0)  & 16383) = ((b.dhash >> 0)  & 16383)
    OR ((a.dhash >> 14) & 16383) = ((b.dhash >> 14) & 16383)
    OR ((a.dhash >> 28) & 16383) = ((b.dhash >> 28) & 16383)
    OR ((a.dhash >> 42) & 16383) = ((b.dhash >> 42) & 16383))
ORDER BY a_id, b_id
"""


@register("image_dhash_neardup", _PHASH_PAIRS_SQL)
def image_dhash_neardup(sf_dir: str):
    """Image near-dup pairs within dHash Hamming <= 3: decode + integer
    dHash per image, then the distributed SimHash chunk funnel over 14-bit
    chunks (any pair within Hamming <= 3 of a 4-chunk 56-bit code shares an
    exact chunk — Charikar guarantee) with in-bucket vectorized Hamming
    verify inside the shuffle partition."""
    from demeter_ray.functions import codec
    from demeter_ray.stages.dedup import _hamming_chunk_neardup

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def hash_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = codec.encode_batch(codec.generate_pixels_batch(ids, 16, 16), "png")
        px = codec.decode_batch(blobs, 16, 16)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "code": pa.array(codec.dhash56_batch(px), pa.int64()),
            }
        )

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow", batch_size=512)
    return _hamming_chunk_neardup(
        hashed, id_col="doc_id", code_col="code", n_chunks=4, chunk_bits=14,
        max_hamming=3,
    )


# -------------------------------------------- string-similarity join

_EDIT_SQL = """
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       levenshtein(substr(a.text, 1, 16), substr(b.text, 1, 16))::BIGINT AS dist
FROM documents a JOIN documents b ON a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, 16), substr(b.text, 1, 16)) <= 4
ORDER BY a_id, b_id
"""


@register("edit_distance_pairs", _EDIT_SQL)
def edit_distance_pairs(sf_dir: str):
    """String-similarity join: doc pairs whose 16-char prefixes are within
    Levenshtein distance 4.  Engine: broadcast the (id, prefix) side
    (ray.put once; at corpus scale the candidate generation becomes a
    length+q-gram bucket shuffle like the MinHash funnel), per-batch
    length-difference prefilter, then a DP vectorized ACROSS pairs (the
    16x16 cell grid iterates, the pair axis is numpy) — no per-pair Python
    loop."""
    import ray as _ray

    K, L = 4, 16
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prefixes(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = [t[:L] for t in batch["text"].to_pylist()]
        mat = np.zeros((len(ids), L), dtype=np.uint8)
        lens = np.empty(len(ids), dtype=np.int64)
        for i, t in enumerate(texts):
            b = t.encode()
            lens[i] = len(b)
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "prefix": pa.array(list(mat), pa.list_(pa.uint8(), L)),
                "plen": pa.array(lens, pa.int64()),
            }
        )

    pref = ds.map_batches(prefixes, batch_format="pyarrow").to_pandas()
    if len(pref) == 0:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                             "b_id": pd.Series(dtype="int64"),
                             "dist": pd.Series(dtype="int64")})
    order = np.argsort(pref["doc_id"].to_numpy())
    ids_all = pref["doc_id"].to_numpy()[order]
    M_all = np.stack(pref["prefix"].to_numpy()[order]).astype(np.uint8)
    len_all = pref["plen"].to_numpy()[order]
    ref = _ray.put((ids_all, M_all, len_all))

    def lev_pairs(batch: pa.Table) -> pa.Table:
        iids, Mf, lf = _ray.get(ref)
        t = prefixes(batch)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(iids, ids)
        Mb, lb = Mf[idx], lf[idx]
        # candidate pairs: i < j and |len diff| <= K
        cand = (ids[:, None] < iids[None, :]) & (
            np.abs(lb[:, None] - lf[None, :]) <= K
        )
        r, c = np.nonzero(cand)
        if len(r) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        A, B = Mb[r].astype(np.int16), Mf[c].astype(np.int16)
        la, lbn = lb[r], lf[c]
        P = len(r)
        # Levenshtein DP: 16x16 cell grid sequential, pair axis vectorized
        dp = np.tile(np.arange(L + 1, dtype=np.int32), (P, 1))
        for i in range(1, L + 1):
            prev_diag = dp[:, 0].copy()
            dp[:, 0] = i
            for j in range(1, L + 1):
                cur = dp[:, j].copy()
                sub = prev_diag + (A[:, i - 1] != B[:, j - 1])
                dp[:, j] = np.minimum(np.minimum(dp[:, j] + 1, dp[:, j - 1] + 1), sub)
                prev_diag = cur
            # rows beyond a pair's actual lengths are computed but never
            # read: the result indexes at (la, lb)
        # final distances live at dp[la][lb] of the full-grid DP; recompute
        # per-pair by re-running? No — index the last full row only works
        # for full-length strings, so gather the (la, lb) cell via a second
        # DP carry is avoided by padding: all prefixes here are length L
        # unless the doc is shorter than 16 chars (none in this corpus —
        # enforced below, fail loud)
        if (la != L).any() or (lbn != L).any():
            raise ValueError("edit_distance_pairs: prefix shorter than 16 "
                             "chars — the padded DP would be wrong")
        dist = dp[:, L]
        good = dist <= K
        return pa.table(
            {
                "a_id": pa.array(ids[r[good]], pa.int64()),
                "b_id": pa.array(iids[c[good]], pa.int64()),
                "dist": pa.array(dist[good].astype(np.int64), pa.int64()),
            }
        )

    out = ds.map_batches(lev_pairs, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# --------------------------------------- decorrelated scalar subquery

# the "price > 1.5 * customer average" predicate runs in INTEGER CENTS on
# both sides (2*n*price_cents > 3*sum_cents): a float average's summation
# order could flip a borderline compare between engine and oracle
_ABOVE_AVG_SQL = """
WITH c AS (
  SELECT o_custkey,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS s_cents,
         COUNT(*) AS n
  FROM orders GROUP BY o_custkey
)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o JOIN c ON o.o_custkey = c.o_custkey
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * 2 * c.n > 3 * c.s_cents
ORDER BY o.o_orderkey
"""


@register("orders_above_customer_avg", _ABOVE_AVG_SQL)
def orders_above_customer_avg(sf_dir: str):
    """Correlated scalar subquery, decorrelated: per-customer (sum, count)
    cents partials through the size-gated combine, broadcast as a dict, then
    a vectorized integer-cents filter pass — one scan for the aggregate, one
    for the filter, no join shuffle, no float in the predicate."""
    import ray as _ray

    ds = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b.assign(cents=np.rint(b["o_totalprice"].to_numpy() * 100).astype(np.int64))
        return d.groupby("o_custkey", as_index=False).agg(
            s_cents=("cents", "sum"), n=("cents", "size")
        )

    agg = partial_shuffle_combine(ds, partial, ["o_custkey"], ["s_cents", "n"],
                                  batch_format="pandas")
    # sorted-key arrays broadcast once; lookup is a vectorized searchsorted
    korder = np.argsort(agg["o_custkey"].to_numpy())
    keys = agg["o_custkey"].to_numpy()[korder]
    s_arr = agg["s_cents"].to_numpy()[korder].astype(np.int64)
    n_arr = agg["n"].to_numpy()[korder].astype(np.int64)
    ref = _ray.put((keys, s_arr, n_arr))

    def filt(batch: pd.DataFrame) -> pd.DataFrame:
        k, s, n = _ray.get(ref)
        cents = np.rint(batch["o_totalprice"].to_numpy() * 100).astype(np.int64)
        idx = np.searchsorted(k, batch["o_custkey"].to_numpy())
        keep = cents * 2 * n[idx] > 3 * s[idx]
        return batch[keep]

    out = ds.map_batches(filt, batch_format="pandas").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


# ---------------------------- image embedding cosine near-dup (integer)

# cosine >= 0.99999 tested EXACTLY in integer arithmetic:
# dot > 0 AND 10^10 * dot^2 >= 99999^2 * |a|^2 * |b|^2  (HUGEINT in SQL,
# Python ints engine-side) — no float ever enters the decision.
_BLOCKMEAN_SQL = """
WITH px AS (
  SELECT d.doc_id, x.x, y.y,
         ((d.doc_id * 97 + x.x * 31 + y.y * 17) % 256
          + (d.doc_id * 97 + x.x * 31 + y.y * 17 + 11) % 256
          + (d.doc_id * 97 + x.x * 31 + y.y * 17 + 22) % 256) AS g
  FROM documents d,
       generate_series(0, 15) AS x(x),
       generate_series(0, 15) AS y(y)
),
blk AS (
  SELECT doc_id, (y // 4) * 4 + (x // 4) AS j, SUM(g) // 16 AS s
  FROM px GROUP BY doc_id, (y // 4) * 4 + (x // 4)
),
n2 AS (SELECT doc_id, SUM(s * s) AS nn FROM blk GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, SUM(a.s * b.s) AS dot
  FROM blk a JOIN blk b ON a.j = b.j AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d.a_id, d.b_id, d.dot::BIGINT AS dot
FROM dots d JOIN n2 xa ON xa.doc_id = d.a_id JOIN n2 yb ON yb.doc_id = d.b_id
WHERE d.dot > 0
  AND 10000000000::HUGEINT * d.dot * d.dot >= 9999800001::HUGEINT * xa.nn * yb.nn
ORDER BY a_id, b_id
"""


@register("image_blockmean_neardup", _BLOCKMEAN_SQL)
def image_blockmean_neardup(sf_dir: str):
    """Embedding-cosine near-dup over IMAGE content with an exact integer
    oracle: decode -> 4x4 grid of floored grayscale block means (a 16-dim
    integer embedding), broadcast the full embedding matrix (the exact
    O(N^2) validator shape of embedding_neardup_pairs; the LSH funnel is the
    scale path), per-batch int64 matmul, and the cosine threshold decided in
    EXACT rational arithmetic — a float prefilter narrows candidates, Python
    ints confirm, so no IEEE boundary can flip a pair."""
    from demeter_ray.functions import codec

    NUM, DEN = 99999 * 99999, 10**10
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def vec_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        blobs = codec.encode_batch(codec.generate_pixels_batch(ids, 16, 16), "png")
        px = codec.decode_batch(blobs, 16, 16).astype(np.int64)
        gray = px.sum(axis=3)
        V = (gray.reshape(-1, 4, 4, 4, 4).sum(axis=(2, 4)) // 16).reshape(-1, 16)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "vec": pa.array(list(V), pa.list_(pa.int64(), 16)),
            }
        )

    import ray as _ray

    vecs = ds.map_batches(vec_batch, batch_format="pyarrow", batch_size=512).to_pandas()
    if len(vecs) == 0:
        return pd.DataFrame({"a_id": pd.Series(dtype="int64"),
                             "b_id": pd.Series(dtype="int64"),
                             "dot": pd.Series(dtype="int64")})
    order = np.argsort(vecs["doc_id"].to_numpy())
    ids_all = vecs["doc_id"].to_numpy()[order]
    V_all = np.stack(vecs["vec"].to_numpy()[order]).astype(np.int64)
    n2_all = (V_all * V_all).sum(axis=1)
    ref = _ray.put((ids_all, V_all, n2_all))

    def pairs_fn(batch: pa.Table) -> pa.Table:
        iids, Vf, nf = _ray.get(ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(iids, ids)
        Vb, nb = Vf[idx], nf[idx]
        D = Vb @ Vf.T
        # float prefilter with margin, then exact integer confirmation
        approx = (DEN * (D.astype(np.float64) ** 2)
                  >= (NUM - 1e4) * np.outer(nb, nf).astype(np.float64))
        cand = approx & (D > 0) & (ids[:, None] < iids[None, :])
        r, c = np.nonzero(cand)
        keep_a, keep_b, keep_d = [], [], []
        for i, j in zip(r, c):
            d = int(D[i, j])
            if DEN * d * d >= NUM * int(nb[i]) * int(nf[j]):
                keep_a.append(int(ids[i]))
                keep_b.append(int(iids[j]))
                keep_d.append(d)
        return pa.table(
            {
                "a_id": pa.array(keep_a, pa.int64()),
                "b_id": pa.array(keep_b, pa.int64()),
                "dot": pa.array(keep_d, pa.int64()),
            }
        )

    out = ds.map_batches(pairs_fn, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a_id", "b_id"]).reset_index(drop=True)


# ------------------------------------------- deterministic hash sampling

def _hash_sample_sql() -> str:
    h = sha256_hash64_sql(
        "CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)"
    )
    return f"""
WITH keyed AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         ({h} % 100)::BIGINT AS bucket
  FROM lineitem
)
SELECT COUNT(*) AS n_sampled,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
       MIN(l_orderkey) AS min_okey, MAX(l_orderkey) AS max_okey
FROM keyed WHERE bucket < 10
"""


@register("hash_sample_lineitems", _hash_sample_sql())
def hash_sample_lineitems(sf_dir: str):
    """Deterministic hash sampling (10% Bernoulli by content key) — the
    reproducible train/eval subsetting primitive.  stable_hash64 of the
    row key mod 100 < 10; the oracle recomputes the identical sha256
    arithmetic in SQL, so the sample membership itself is driver-checked."""
    from demeter_ray.functions.hashing import stable_hash64

    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = (
            b["l_orderkey"].astype(str) + "_" + b["l_linenumber"].astype(str)
        ).to_numpy()
        buckets = np.fromiter(
            (stable_hash64(k) % 100 for k in keys), dtype=np.int64, count=len(keys)
        )
        m = buckets < 10
        if not m.any():
            return pd.DataFrame(
                {"n_sampled": [0], "sum_qty": [0], "min_okey": [np.iinfo(np.int64).max],
                 "max_okey": [np.iinfo(np.int64).min]}
            )
        ok = b["l_orderkey"].to_numpy()[m]
        return pd.DataFrame(
            {
                "n_sampled": [int(m.sum())],
                "sum_qty": [int(np.rint(b["l_quantity"].to_numpy()[m].sum()))],
                "min_okey": [int(ok.min())],
                "max_okey": [int(ok.max())],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0 or int(parts["n_sampled"].sum()) == 0:
        # SQL semantics on an empty sample: COUNT 0, SUM/MIN/MAX NULL
        # (sentinel-coded extremes must not leak when nothing sampled)
        # float64 NaN, not nullable Int64: DuckDB's .df() delivers NULL
        # BIGINT aggregates as float64 NaN, and the driver compares dtypes
        return pd.DataFrame(
            {"n_sampled": pd.array([0], dtype="int64"),
             "sum_qty": [np.nan], "min_okey": [np.nan], "max_okey": [np.nan]}
        )
    return pd.DataFrame(
        {
            "n_sampled": [int(parts["n_sampled"].sum())],
            "sum_qty": [int(parts["sum_qty"].sum())],
            "min_okey": [int(parts["min_okey"].min())],
            "max_okey": [int(parts["max_okey"].max())],
        }
    )


# ------------------------------------------------------- HAVING / gap fill

_HAVING_SQL = """
SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
FROM lineitem
GROUP BY l_orderkey
HAVING SUM(l_quantity) > 150
ORDER BY l_orderkey
"""


@register("having_large_orders", _HAVING_SQL)
def having_large_orders(sf_dir: str):
    """GROUP BY ... HAVING (TPC-H Q18 core): the aggregate filter runs
    vectorized AFTER the size-gated combine — at scale only one row per
    order reaches the predicate, never the lineitem rows."""
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("l_orderkey", as_index=False)["l_quantity"].sum()

    agg = partial_shuffle_combine(ds, partial, ["l_orderkey"], ["l_quantity"],
                                  batch_format="pandas")
    agg = agg[agg["l_quantity"] > 150]
    out = pd.DataFrame({
        "l_orderkey": agg["l_orderkey"],
        "total_qty": duck_round(agg["l_quantity"], 2),
    })
    return out.sort_values("l_orderkey").reset_index(drop=True)


_GAPFILL_SQL = """
WITH span AS (
  SELECT user_id, MIN(epoch_us(ts) // 3600000000) AS h0,
                  MAX(epoch_us(ts) // 3600000000) AS h1
  FROM events GROUP BY user_id),
hours AS (
  SELECT s.user_id, s.h0 + g.x AS hour
  FROM span s, LATERAL (SELECT UNNEST(generate_series(0, CAST(s.h1 - s.h0 AS BIGINT)))) AS g(x)),
agg AS (
  SELECT user_id, epoch_us(ts) // 3600000000 AS hour, COUNT(*) AS n
  FROM events GROUP BY user_id, hour)
SELECT h.user_id, h.hour, COALESCE(a.n, 0) AS n_events
FROM hours h LEFT JOIN agg a ON a.user_id = h.user_id AND a.hour = h.hour
ORDER BY h.user_id, h.hour
"""

# epoch hours through 2100 stay under 2^21; the composite join key packs
# (user_id << 21) | hour into one int64 with a loud guard below
_HOUR_BITS = 21


@register("gap_fill_user_hours", _GAPFILL_SQL)
def gap_fill_user_hours(sf_dir: str):
    """Time-series resample / gap fill: every hour in each user's observed
    span appears exactly once, zero-filled where no events landed.

    Plan: per-user (min, max) hour via the gated combine; the hour rows
    GENERATE distributed (span rows fan out via vectorized repeat/arange in
    map_batches — the generated side never sits on the driver); the
    per-(user, hour) counts attach through the size-gated lookup join on a
    packed (user << 21 | hour) key; missing hours fill 0 vectorized."""
    import ray as _ray
    import ray.data as rd

    from demeter_ray.pipelines.relational import gated_lookup_join

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def span_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = (b["ts"].astype("int64") // 3_600_000_000).astype("int64")
        g = b.assign(h0=h, h1=h).groupby("user_id", as_index=False).agg(
            h0=("h0", "min"), h1=("h1", "max"))
        return g

    span = partial_shuffle_combine(
        ds, span_partial, ["user_id"], ["h0", "h1"], batch_format="pandas",
        agg={"h0": "min", "h1": "max"},
    )
    if (span["h1"] >= (1 << _HOUR_BITS)).any():
        raise ValueError("gap_fill_user_hours: epoch hour exceeds the "
                         f"{_HOUR_BITS}-bit pack range")

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        h = (b["ts"].astype("int64") // 3_600_000_000).astype("int64")
        key = (b["user_id"].to_numpy(dtype=np.int64) << _HOUR_BITS) | h.to_numpy()
        return pd.DataFrame({"key": key, "n": 1}).groupby(
            "key", as_index=False)["n"].sum()

    counts = partial_shuffle_combine(ds, count_partial, ["key"], ["n"],
                                     batch_format="pandas")

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        lens = (b["h1"] - b["h0"] + 1).to_numpy(dtype=np.int64)
        uid = np.repeat(b["user_id"].to_numpy(dtype=np.int64), lens)
        # per-row arange: global arange minus each segment's start offset
        offs = np.repeat(np.cumsum(lens) - lens, lens)
        hour = np.repeat(b["h0"].to_numpy(dtype=np.int64), lens) + (
            np.arange(lens.sum(), dtype=np.int64) - offs)
        return pd.DataFrame({"user_id": uid, "hour": hour,
                             "key": (uid << _HOUR_BITS) | hour})

    # split the span across blocks so the fan-out parallelizes without a
    # repartition barrier (ledger: Repartition measured ~17s of stall)
    chunks = [c for c in np.array_split(span, 8) if len(c)]
    hours = rd.from_pandas(chunks).map_batches(expand, batch_format="pandas")
    joined = gated_lookup_join(
        hours, "key", rd.from_pandas(counts), "key", ["n"], how="left")

    def zero_fill(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].astype("int64"),
            "hour": b["hour"].astype("int64"),
            "n_events": b["n"].fillna(0).astype("int64"),
        })

    # returned as a streaming Dataset — the gap-filled table scales with
    # (users x span) and must never materialize whole on the driver; the
    # driver's compare is order-insensitive so no final sort is needed
    return joined.map_batches(zero_fill, batch_format="pandas")


_FIRSTLAST_SQL = """
SELECT event_id, user_id,
       FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_val,
       LAST_VALUE(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS last_val
FROM events
"""


@register("first_last_value_events", _FIRSTLAST_SQL)
def first_last_value_events(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE over an unbounded frame — NO global sort
    needed: per-batch argmin/argmax-by-(ts, event_id) partials (one row per
    user per batch), a driver pick of the global extremes, then one
    broadcast pass attaching the two scalars per user."""
    import ray as _ray

    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def extreme_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.assign(us=b["ts"].astype("int64")).sort_values(
            ["user_id", "us", "event_id"], kind="mergesort")
        g = s.groupby("user_id", as_index=False)
        first = g.first()[["user_id", "us", "event_id", "value"]].rename(
            columns={"us": "f_us", "event_id": "f_eid", "value": "f_val"})
        last = g.last()[["us", "event_id", "value"]].rename(
            columns={"us": "l_us", "event_id": "l_eid", "value": "l_val"})
        return pd.concat([first, last], axis=1)

    parts = ds.map_batches(extreme_partial, batch_format="pandas").to_pandas()
    firsts = parts.sort_values(["user_id", "f_us", "f_eid"],
                               kind="mergesort").groupby("user_id").first()
    lasts = parts.sort_values(["user_id", "l_us", "l_eid"],
                              kind="mergesort").groupby("user_id").last()
    # user_id-indexed Series pair: the attach below is a vectorized index
    # join (Series.map with a Series arg), no per-row Python
    ref = _ray.put((firsts["f_val"].astype("float64"),
                    lasts["l_val"].astype("float64")))

    def attach(b: pd.DataFrame, m) -> pd.DataFrame:
        fs, ls = m
        return pd.DataFrame({"event_id": b["event_id"], "user_id": b["user_id"],
                             "first_val": b["user_id"].map(fs).to_numpy(),
                             "last_val": b["user_id"].map(ls).to_numpy()})

    from demeter_ray.pipelines.relational import bcast

    return ds.map_batches(bcast(ref, attach), batch_format="pandas")


# ------------------------------------------------ ordered-event funnel

_FUNNEL_SQL = """
SELECT user_id FROM events
GROUP BY user_id
HAVING MIN(CASE WHEN event_type = 'view' THEN ts END)
     < MAX(CASE WHEN event_type = 'purchase' THEN ts END)
ORDER BY user_id
"""


@register("funnel_view_then_purchase", _FUNNEL_SQL)
def funnel_view_then_purchase(sf_dir: str):
    """Ordered-sequence funnel (did a 'view' precede a 'purchase'?) without
    any per-user ordering work: EXISTS(view.ts < purchase.ts) is exactly
    MIN(view ts) < MAX(purchase ts), so the whole funnel reduces to two
    sentinel-coded int64 extremes that combine associatively through the
    size-gated shuffle — no sort, no session reconstruction, no per-user
    Python at any cardinality."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    HI, LO = np.iinfo(np.int64).max, np.iinfo(np.int64).min

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ts = b["ts"].astype("int64")
        mv = ts.where(b["event_type"] == "view", HI)
        mp = ts.where(b["event_type"] == "purchase", LO)
        g = pd.DataFrame({"user_id": b["user_id"], "min_view": mv, "max_pur": mp})
        return g.groupby("user_id", as_index=False).agg(
            min_view=("min_view", "min"), max_pur=("max_pur", "max"))

    from demeter_ray.pipelines.relational import gated_group_sum_ds

    agg = gated_group_sum_ds(
        ds, partial, ["user_id"], ["min_view", "max_pur"],
        agg={"min_view": "min", "max_pur": "max"},
    )
    # the conversion filter runs distributively, so the driver pull is
    # bounded by CONVERTED users, not all users
    out = agg.map_batches(
        lambda b: b.loc[b["min_view"] < b["max_pur"], ["user_id"]],
        batch_format="pandas",
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


# ------------------------------------------ grouped correlation (moments)

_CORR_SQL = """
SELECT l_returnflag,
       ROUND(CORR(l_extendedprice, l_quantity), 6) AS price_qty_corr,
       ROUND(COVAR_POP(l_extendedprice, l_quantity), 4) AS price_qty_covar
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("corr_price_quantity_by_flag", _CORR_SQL)
def corr_price_quantity_by_flag(sf_dir: str):
    """Grouped Pearson correlation + population covariance from MERGEABLE
    MOMENTS: per-batch (n, sum_x, sum_y, sum_xy, sum_x2, sum_y2) partials —
    six floats per (group, batch) — combine associatively, so the statistic
    never shuffles raw rows (the same sketch shape as the HLL/quantile
    operators).  Rounding absorbs the naive-vs-stable accumulation ulps vs
    DuckDB's one-pass algorithm."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_extendedprice"].to_numpy(np.float64)
        y = b["l_quantity"].to_numpy(np.float64)
        g = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "n": 1.0, "sx": x, "sy": y, "sxy": x * y, "sx2": x * x, "sy2": y * y,
        })
        return g.groupby("l_returnflag", as_index=False).sum()

    m = partial_combine(ds, partial).groupby("l_returnflag", as_index=False).sum()
    n, sx, sy = m["n"], m["sx"], m["sy"]
    cov = m["sxy"] / n - (sx / n) * (sy / n)
    vx = m["sx2"] / n - (sx / n) ** 2
    vy = m["sy2"] / n - (sy / n) ** 2
    corr = cov / np.sqrt(vx * vy)
    out = pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        "price_qty_corr": duck_round(corr, 6),
        "price_qty_covar": duck_round(cov, 4),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


# ----------------------------------------- percent_rank / cume_dist

_PCTRANK_SQL = """
SELECT c_nationkey, c_custkey,
       ROUND(PERCENT_RANK() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey), 6)
         AS pct_rank,
       ROUND(CUME_DIST() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey), 6)
         AS cume_dist
FROM customer ORDER BY c_nationkey, c_custkey
"""


@register("percent_rank_customers", _PCTRANK_SQL)
def percent_rank_customers(sf_dir: str):
    """PERCENT_RANK and CUME_DIST per partition, derived arithmetically from
    the distributed ranked_window: pct = (rank-1)/(cnt-1); with a fully
    deterministic ORDER BY (tie-broken by key) every frame is a distinct
    peer group, so CUME_DIST's peer-count equals row_number — both are pure
    integer ratios of columns the ranked pass already carries, no extra data
    pass."""
    ds = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    ranked = ranked_window(ds, "c_nationkey", "c_acctbal", "c_custkey")
    cnt = ranked.groupby("c_nationkey")["rn"].transform("max").to_numpy(np.float64)
    rnk = ranked["rnk"].to_numpy(np.float64)
    rn = ranked["rn"].to_numpy(np.float64)
    pct = np.where(cnt > 1, (rnk - 1.0) / (cnt - 1.0), 0.0)
    out = pd.DataFrame({
        "c_nationkey": ranked["c_nationkey"],
        "c_custkey": ranked["c_custkey"],
        "pct_rank": duck_round(pct, 6),
        "cume_dist": duck_round(rn / cnt, 6),
    })
    return out.sort_values(["c_nationkey", "c_custkey"]).reset_index(drop=True)


# ----------------------------------------- first-seen (user acquisition)

_FIRSTSEEN_SQL = """
SELECT CAST(ts AS DATE) AS first_day, COUNT(*) AS new_users
FROM (SELECT user_id, MIN(ts) AS ts FROM events GROUP BY user_id)
GROUP BY first_day
ORDER BY first_day
"""


@register("user_first_seen_histogram", _FIRSTSEEN_SQL)
def user_first_seen_histogram(sf_dir: str):
    """New-users-per-day acquisition curve: per-user MIN(ts) through the
    size-gated combine (stays distributed at any user cardinality), then a
    date histogram whose partials are one row per (day, block) — the classic
    two-level rollup where the second key is tiny."""
    from demeter_ray.pipelines.relational import gated_group_sum_ds

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def min_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(first_us=b["ts"].astype("int64")).groupby(
            "user_id", as_index=False)["first_us"].min()
        return g

    first = gated_group_sum_ds(ds, min_partial, ["user_id"], ["first_us"],
                               agg="min")

    def day_partial(b: pd.DataFrame) -> pd.DataFrame:
        day = pd.to_datetime(b["first_us"], unit="us").dt.normalize()
        return pd.DataFrame({"first_day": day}).groupby(
            "first_day", as_index=False).agg(new_users=("first_day", "size"))

    out = partial_combine(first, day_partial)
    out = out.groupby("first_day", as_index=False)["new_users"].sum()
    # keep datetime64 (midnight-normalized) — DuckDB's DATE arrives as
    # datetime64 through .df(), and the driver compares dtypes
    out["new_users"] = out["new_users"].astype("int64")
    return out.sort_values("first_day").reset_index(drop=True)


# -------------------------------------- exact COUNT(DISTINCT) per group

_UNIQ_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS uniq_users
FROM events GROUP BY event_type ORDER BY event_type
"""


@register("distinct_users_per_event_type", _UNIQ_USERS_SQL)
def distinct_users_per_event_type(sf_dir: str):
    """Exact COUNT(DISTINCT) per group — the canonical two-level dedup:
    per-batch (group, value) pair dedup, size-gated distributed pair
    combine (each distinct pair survives exactly once at any cardinality),
    then a per-batch count partial whose rows are bounded by group
    cardinality.  No value set ever collects on one node."""
    from demeter_ray.pipelines.relational import gated_group_sum_ds

    ds = read_table(sf_dir, "events", columns=["event_type", "user_id"])

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        p = b.drop_duplicates()
        return p.assign(c=np.int64(1))

    pairs = gated_group_sum_ds(ds, pair_partial, ["event_type", "user_id"],
                               ["c"], agg="min")

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("event_type", as_index=False).agg(
            uniq_users=("user_id", "size"))

    out = partial_combine(pairs, count_partial)
    out = out.groupby("event_type", as_index=False)["uniq_users"].sum()
    out["uniq_users"] = out["uniq_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# ------------------------------------------- LEAD: event transitions

_TRANSITION_SQL = """
SELECT event_type, next_type, COUNT(*) AS n
FROM (SELECT event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
ORDER BY event_type, next_type
"""


@register("event_transition_counts", _TRANSITION_SQL)
def event_transition_counts(sf_dir: str):
    """Markov transition matrix over per-user event sequences (LEAD window
    + count).  One range-partitioned sort; within-block consecutive pairs
    are counted vectorized; each block also emits its first/last row so the
    O(blocks) boundary transitions are stitched on the driver — the lag
    carry trick, but carrying categories instead of timestamps."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    sorted_ds = ds.sort(["user_id", "ts", "event_id"]).materialize()

    def pair_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        typ = batch["event_type"].to_numpy(zero_copy_only=False)
        same = uid[1:] == uid[:-1]
        df = pd.DataFrame({"event_type": typ[:-1][same],
                           "next_type": typ[1:][same]})
        g = df.groupby(["event_type", "next_type"], as_index=False).agg(
            n=("event_type", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = partial_shuffle_combine(
        sorted_ds, pair_partial, ["event_type", "next_type"], ["n"])

    def boundary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"first_user": pa.array([], pa.int64()),
                             "first_ts": pa.array([], pa.int64()),
                             "first_eid": pa.array([], pa.int64()),
                             "first_type": pa.array([], pa.string()),
                             "last_user": pa.array([], pa.int64()),
                             "last_type": pa.array([], pa.string())})
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        typ = batch["event_type"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"first_user": pa.array([uid[0]], pa.int64()),
                         "first_ts": pa.array([ts[0]], pa.int64()),
                         "first_eid": pa.array([eid[0]], pa.int64()),
                         "first_type": pa.array([typ[0]], pa.string()),
                         "last_user": pa.array([uid[-1]], pa.int64()),
                         "last_type": pa.array([typ[-1]], pa.string())})

    bnd = (partial_combine(sorted_ds, boundary, "pyarrow", batch_size=None)
           .sort_values(["first_user", "first_ts", "first_eid"])
           .reset_index(drop=True))
    prev_last_user = bnd["last_user"].shift(1)
    prev_last_type = bnd["last_type"].shift(1)
    join = prev_last_user == bnd["first_user"]
    extra = pd.DataFrame({"event_type": prev_last_type[join],
                          "next_type": bnd["first_type"][join]})
    if len(extra):
        extra = extra.groupby(["event_type", "next_type"], as_index=False).agg(
            n=("event_type", "size"))
        counts = (pd.concat([counts, extra], ignore_index=True)
                  .groupby(["event_type", "next_type"], as_index=False)["n"]
                  .sum())
    counts["n"] = counts["n"].astype("int64")
    return counts.sort_values(["event_type", "next_type"]).reset_index(drop=True)


# --------------------------------------- per-user event-type entropy

_ENTROPY_SQL = """
SELECT user_id,
       ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 6) AS type_entropy
FROM (SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type)
GROUP BY user_id ORDER BY user_id
"""


@register("user_event_entropy", _ENTROPY_SQL)
def user_event_entropy(sf_dir: str):
    """Shannon entropy of each user's event-type distribution — a behavioral
    diversity score.  Two gated combines, both vectorized: exact (user, type)
    counts, then per-user sums of c and c*ln(c); entropy = ln(S) − Σc·ln(c)/S
    needs only those two mergeable sums, so nothing per-user ever holds the
    type set."""
    from demeter_ray.pipelines.relational import gated_group_sum_ds

    ds = read_table(sf_dir, "events", columns=["user_id", "event_type"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["user_id", "event_type"], as_index=False).agg(
            c=("user_id", "size"))
        return g

    counts = gated_group_sum_ds(ds, count_partial, ["user_id", "event_type"],
                                ["c"], agg="sum")

    def moment_partial(b: pd.DataFrame) -> pd.DataFrame:
        c = b["c"].to_numpy(np.float64)
        return pd.DataFrame({"user_id": b["user_id"],
                             "s": c, "clnc": c * np.log(c)}).groupby(
            "user_id", as_index=False).sum()

    m = partial_shuffle_combine(counts, moment_partial, ["user_id"],
                                ["s", "clnc"], batch_format="pandas")
    ent = np.log(m["s"].to_numpy(np.float64)) - m["clnc"].to_numpy(
        np.float64) / m["s"].to_numpy(np.float64)
    out = pd.DataFrame({"user_id": m["user_id"].astype("int64"),
                        "type_entropy": duck_round(ent, 6)})
    return out.sort_values("user_id").reset_index(drop=True)


# ----------------------------------------------- cohort retention grid

_RETENTION_SQL = """
WITH f AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
           FROM events GROUP BY user_id),
     a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS act_day FROM events)
SELECT f.cohort_day, DATEDIFF('day', f.cohort_day, a.act_day) AS day_offset,
       COUNT(*) AS active_users
FROM a JOIN f USING (user_id)
GROUP BY f.cohort_day, day_offset
ORDER BY f.cohort_day, day_offset
"""


@register("cohort_retention_grid", _RETENTION_SQL)
def cohort_retention_grid(sf_dir: str):
    """Cohort retention: users grouped by first-seen day, counted once per
    later active day.  Three mergeable passes — per-user MIN(ts) (gated
    combine), distinct (user, day) pairs (gated dedup), a size-gated lookup
    join attaching each user's cohort day — then a tiny (cohorts × offsets)
    count.  Every stage stays distributed at full user cardinality."""
    from demeter_ray.pipelines.relational import (
        gated_group_sum_ds,
        gated_lookup_join,
    )

    US_PER_DAY = 86_400_000_000

    ds = read_table(sf_dir, "events", columns=["user_id", "ts"])

    def first_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(first_us=b["ts"].astype("int64")).groupby(
            "user_id", as_index=False)["first_us"].min()

    first = gated_group_sum_ds(ds, first_partial, ["user_id"], ["first_us"],
                               agg="min")
    first = first.map_batches(
        lambda b: b.assign(
            cohort_us=(b["first_us"] // US_PER_DAY) * US_PER_DAY
        )[["user_id", "cohort_us"]],
        batch_format="pandas")

    def day_pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": b["user_id"],
            "act_us": (b["ts"].astype("int64") // US_PER_DAY) * US_PER_DAY,
        }).drop_duplicates()
        return d.assign(c=np.int64(1))

    pairs = gated_group_sum_ds(ds, day_pair_partial, ["user_id", "act_us"],
                               ["c"], agg="min")

    joined = gated_lookup_join(pairs, "user_id", first, "user_id",
                               ["cohort_us"])

    def grid_partial(b: pd.DataFrame) -> pd.DataFrame:
        off = (b["act_us"] - b["cohort_us"]) // US_PER_DAY
        return pd.DataFrame({"cohort_us": b["cohort_us"],
                             "day_offset": off.astype("int64")}).groupby(
            ["cohort_us", "day_offset"], as_index=False).agg(
            active_users=("cohort_us", "size"))

    out = partial_combine(joined, grid_partial)
    out = out.groupby(["cohort_us", "day_offset"], as_index=False)[
        "active_users"].sum()
    out["cohort_day"] = pd.to_datetime(out.pop("cohort_us"), unit="us")
    out["active_users"] = out["active_users"].astype("int64")
    out = out[["cohort_day", "day_offset", "active_users"]]
    return out.sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)


# ------------------------------------------------ top-k bigram counts

_BIGRAM_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
SELECT bigram, COUNT(*) AS n FROM (
  SELECT tk[i] || ' ' || tk[i + 1] AS bigram
  FROM toks, UNNEST(range(1, len(tk))) AS u(i)
)
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25
"""


@register("top_bigrams_corpus", _BIGRAM_SQL)
def top_bigrams_corpus(sf_dir: str):
    """Corpus-wide top-25 bigram counts — the n-gram statistics classic.
    Per-batch bigram count partials, size-gated distributed combine (each
    bigram fully reduced in exactly one bucket), then per-block LOCAL top-25
    (valid because blocks hold disjoint fully-combined keys) so only
    blocks x 25 rows ever reach the driver at any vocabulary size."""
    from demeter_ray.pipelines.relational import gated_group_sum_ds

    ds = read_table(sf_dir, "documents", columns=["text"])

    def bigram_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.split(" ")
        grams = toks.map(
            lambda t: [t[i] + " " + t[i + 1] for i in range(len(t) - 1)])
        counts = grams.explode().dropna().value_counts()
        return pd.DataFrame({"bigram": counts.index.to_numpy(),
                             "n": counts.to_numpy(np.int64)})

    combined = gated_group_sum_ds(ds, bigram_partial, ["bigram"], ["n"],
                                  agg="sum")

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "bigram"],
                             ascending=[False, True]).head(25)

    out = partial_combine(combined, local_topk)
    out["n"] = out["n"].astype("int64")
    return (out.sort_values(["n", "bigram"], ascending=[False, True])
            .head(25).reset_index(drop=True))


# ------------------------------------- deterministic per-group sample

_GROUP_SAMPLE_SQL = f"""
SELECT c_nationkey, c_custkey FROM (
  SELECT c_nationkey, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY {sha256_hash64_sql("c_custkey::VARCHAR")},
                                     c_custkey) AS rn
  FROM customer)
WHERE rn <= 3 ORDER BY c_nationkey, c_custkey
"""


@register("group_sample_customers", _GROUP_SAMPLE_SQL)
def group_sample_customers(sf_dir: str):
    """Deterministic 3-per-group sample: order within each group by a stable
    content hash (uniform, seedless, reproducible across runs/cluster sizes)
    and keep the first 3.  Mergeable top-k — per-batch local top-3 per group,
    then top-3-of-top-3s on the (groups x blocks x 3)-bounded partials — so
    no global sort and no per-group window pass."""
    from demeter_ray.functions.hashing import stable_hash64

    ds = read_table(sf_dir, "customer", columns=["c_nationkey", "c_custkey"])

    def local_top3(b: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter((stable_hash64(str(k)) for k in b["c_custkey"]),
                        dtype=np.uint64, count=len(b))
        return (b.assign(_h=h)
                .sort_values(["_h", "c_custkey"])
                .groupby("c_nationkey", as_index=False).head(3))

    parts = partial_combine(ds, local_top3)
    out = (parts.sort_values(["_h", "c_custkey"])
           .groupby("c_nationkey", as_index=False).head(3)
           .drop(columns="_h"))
    out = out.astype({"c_nationkey": "int64", "c_custkey": "int64"})
    return out.sort_values(["c_nationkey", "c_custkey"]).reset_index(drop=True)


# ---------------------------------- trailing time-interval window count

_TRAILING_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                            AND CURRENT ROW) AS cnt_1h
FROM events ORDER BY user_id, ts, event_id
"""

_HOUR_US = 3_600_000_000


def interval_agg_window(ds, part_col: str, ts_col: str, id_col: str,
                        window_us: int, val_col: str | None = None
                        ) -> pd.DataFrame:
    """COUNT(*) (``val_col=None``) or SUM(val_col) over a trailing
    time-RANGE frame (peers at the current timestamp included, per SQL
    RANGE semantics).  One range-partitioned sort; per-block results are
    two searchsorted calls (+ one cumsum for SUM) per partition segment;
    cross-block context is bounded by construction — a block exports only
    its last partition's trailing ``window_us`` of rows (rows needing
    older context cannot exist under the sort order), and equal-timestamp
    peer runs crossing block edges carry one scalar backward."""
    import ray as _ray

    sorted_ds = ds.sort([part_col, ts_col, id_col]).materialize()
    out_col = "cnt_1h" if val_col is None else "sum_1h"

    def _cols(batch: pa.Table):
        uid = batch[part_col].to_numpy(zero_copy_only=False)
        ts = batch[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.int64())
        us = ts.to_numpy(zero_copy_only=False)
        eid = batch[id_col].to_numpy(zero_copy_only=False)
        vals = (batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
                if val_col is not None else None)
        return uid, us, eid, vals

    def boundary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "first_user": pa.array([], pa.int64()),
                "first_ts": pa.array([], pa.int64()),
                "first_eid": pa.array([], pa.int64()),
                "last_user": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "n_lead_peers": pa.array([], pa.int64()),
                "lead_peer_sum": pa.array([], pa.float64()),
                "export": pa.array([], pa.list_(pa.int64())),
                "export_val": pa.array([], pa.list_(pa.float64())),
            })
        uid, us, eid, vals = _cols(batch)
        lead = int(np.argmax(~((uid == uid[0]) & (us == us[0])))) or (
            len(uid) if (uid[-1] == uid[0] and us[-1] == us[0]) else 1)
        lead_sum = float(vals[:lead].sum()) if vals is not None else 0.0
        tail_seg = (uid == uid[-1]) & (us >= us[-1] - window_us)
        # trailing run of the last partition only (mask is contiguous there)
        cut = len(us) - int(np.argmin(tail_seg[::-1]) or len(us))
        exp = us[cut:]
        exp_val = (vals[cut:] if vals is not None
                   else np.zeros(len(exp), np.float64))
        return pa.table({
            "first_user": pa.array([uid[0]], pa.int64()),
            "first_ts": pa.array([us[0]], pa.int64()),
            "first_eid": pa.array([eid[0]], pa.int64()),
            "last_user": pa.array([uid[-1]], pa.int64()),
            "last_ts": pa.array([us[-1]], pa.int64()),
            "n_rows": pa.array([len(uid)], pa.int64()),
            "n_lead_peers": pa.array([lead], pa.int64()),
            "lead_peer_sum": pa.array([lead_sum], pa.float64()),
            "export": pa.array([exp.tolist()], pa.list_(pa.int64())),
            "export_val": pa.array([exp_val.tolist()], pa.list_(pa.float64())),
        })

    bnd = (partial_combine(sorted_ds, boundary, "pyarrow", batch_size=None)
           .sort_values(["first_user", "first_ts", "first_eid"])
           .reset_index(drop=True))

    nb = len(bnd)
    ctx: dict[tuple, tuple] = {}
    fwd: dict[tuple, tuple] = {}
    carry_ts = np.array([], dtype=np.int64)
    carry_val = np.array([], dtype=np.float64)
    for i in range(nb):
        key = (int(bnd["first_user"][i]), int(bnd["first_ts"][i]),
               int(bnd["first_eid"][i]))
        if i > 0 and int(bnd["last_user"][i - 1]) == int(bnd["first_user"][i]):
            # chain older context only through single-user blocks: ctx[i-1]
            # belongs to block i-1's FIRST user, the export to its LAST
            single = int(bnd["first_user"][i - 1]) == int(bnd["last_user"][i - 1])
            base_ts = carry_ts if single else np.array([], dtype=np.int64)
            base_val = carry_val if single else np.array([], dtype=np.float64)
            prev_ts = np.concatenate(
                [base_ts, np.asarray(bnd["export"][i - 1], dtype=np.int64)])
            prev_val = np.concatenate(
                [base_val, np.asarray(bnd["export_val"][i - 1], dtype=np.float64)])
            keep = prev_ts >= int(bnd["first_ts"][i]) - window_us
            ctx[key] = (prev_ts[keep], prev_val[keep])
        else:
            ctx[key] = (np.array([], dtype=np.int64),
                        np.array([], dtype=np.float64))
        carry_ts, carry_val = ctx[key]
    acc_n, acc_s = 0, 0.0
    for i in range(nb - 1, -1, -1):
        key = (int(bnd["first_user"][i]), int(bnd["first_ts"][i]),
               int(bnd["first_eid"][i]))
        if (i + 1 < nb
                and int(bnd["last_user"][i]) == int(bnd["first_user"][i + 1])
                and int(bnd["last_ts"][i]) == int(bnd["first_ts"][i + 1])):
            nxt = int(bnd["n_lead_peers"][i + 1])
            whole = nxt == int(bnd["n_rows"][i + 1])
            acc_n = nxt + (acc_n if whole else 0)
            acc_s = float(bnd["lead_peer_sum"][i + 1]) + (acc_s if whole else 0.0)
        else:
            acc_n, acc_s = 0, 0.0
        fwd[key] = (acc_n, acc_s)

    ref = _ray.put((ctx, fwd))

    def apply_agg(batch: pa.Table, carries) -> pa.Table:
        res_type = pa.int64() if val_col is None else pa.float64()
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             part_col: pa.array([], pa.int64()),
                             out_col: pa.array([], res_type)})
        ctx_m, fwd_m = carries
        uid, us, eid, vals = _cols(batch)
        n = len(uid)
        key = (int(uid[0]), int(us[0]), int(eid[0]))
        out = np.empty(n, dtype=np.int64 if val_col is None else np.float64)
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], n]
        for s, e in zip(starts, ends):
            seg = us[s:e]
            r = np.searchsorted(seg, seg, side="right")
            l = np.searchsorted(seg, seg - window_us, side="left")
            if val_col is None:
                out[s:e] = r - l
            else:
                pre_sum = np.r_[0.0, np.cumsum(vals[s:e])]
                out[s:e] = pre_sum[r] - pre_sum[l]
        pre_ts, pre_val = ctx_m[key]
        if len(pre_ts):
            e0 = ends[0]
            idx = np.searchsorted(pre_ts, us[:e0] - window_us, side="left")
            if val_col is None:
                out[:e0] += len(pre_ts) - idx
            else:
                cum = np.r_[0.0, np.cumsum(pre_val)]
                out[:e0] += cum[-1] - cum[idx]
        peers_n, peers_s = fwd_m[key]
        if peers_n:
            tail = (uid == uid[-1]) & (us == us[-1])
            out[tail] += peers_n if val_col is None else peers_s
        return pa.table({id_col: pa.array(eid, pa.int64()),
                         part_col: pa.array(uid, pa.int64()),
                         out_col: pa.array(out, res_type)})

    return partial_combine(sorted_ds,
                           lambda b: apply_agg(b, _ray.get(ref)),
                           "pyarrow", batch_size=None)


def interval_count_window(ds, part_col: str, ts_col: str, id_col: str,
                          window_us: int) -> pd.DataFrame:
    """Trailing time-RANGE COUNT(*) — see interval_agg_window."""
    return interval_agg_window(ds, part_col, ts_col, id_col, window_us)


@register("trailing_hour_counts", _TRAILING_SQL)
def trailing_hour_counts(sf_dir: str):
    """Per-event trailing-1-hour activity count per user — the RANGE
    INTERVAL window frame (velocity / rate-limit feature)."""
    ds = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return interval_count_window(ds, "user_id", "ts", "event_id", _HOUR_US)


# ------------------------------------------------------ share of total

_SHARE_SQL = """
SELECT n.n_name,
       ROUND(SUM(o.o_totalprice), 2) AS revenue,
       ROUND(SUM(o.o_totalprice) * 100.0 /
             (SELECT SUM(o_totalprice) FROM orders), 4) AS pct_of_total
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""


@register("revenue_share_by_nation", _SHARE_SQL)
def revenue_share_by_nation(sf_dir: str):
    """Share-of-total report: grouped revenue normalized by the global sum.
    The customer->nation dim attaches via the size-gated lookup join; one
    partial-combine produces both the per-nation sums and (by summation of
    the same partials) the denominator — no second pass over the fact
    table."""
    from demeter_ray.pipelines.relational import gated_lookup_join

    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])

    cust_nat = gated_lookup_join(cust, "c_nationkey", nation, "n_nationkey",
                                 ["n_name"])
    with_nat = gated_lookup_join(orders, "o_custkey", cust_nat, "c_custkey",
                                 ["n_name"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("n_name", as_index=False).agg(
            revenue=("o_totalprice", "sum"))

    parts = partial_combine(with_nat, partial)
    out = parts.groupby("n_name", as_index=False)["revenue"].sum()
    total = out["revenue"].sum()
    out["pct_of_total"] = duck_round(
        out["revenue"].to_numpy(np.float64) * 100.0 / total, 4)
    out["revenue"] = duck_round(out["revenue"].to_numpy(np.float64), 2)
    return out.sort_values("n_name").reset_index(drop=True)


_TRAILING_SUM_SQL = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                              RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                                    AND CURRENT ROW), 4) AS sum_1h
FROM events ORDER BY user_id, ts, event_id
"""


@register("trailing_hour_value_sum", _TRAILING_SUM_SQL)
def trailing_hour_value_sum(sf_dir: str):
    """Per-event trailing-1-hour value sum per user — the SUM form of the
    RANGE INTERVAL frame (spend-velocity feature), via interval_agg_window's
    segment prefix sums."""
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])
    out = interval_agg_window(ds, "user_id", "ts", "event_id", _HOUR_US,
                              val_col="value")
    out["sum_1h"] = duck_round(out["sum_1h"].to_numpy(np.float64), 4)
    return out


# ------------------------------------------- per-group standardization

_ZSCORE_SQL = """
SELECT event_id,
       ROUND((value - AVG(value) OVER (PARTITION BY event_type))
             / STDDEV_SAMP(value) OVER (PARTITION BY event_type), 6)
         AS zscore
FROM events ORDER BY event_id
"""


@register("zscore_events_by_type", _ZSCORE_SQL)
def zscore_events_by_type(sf_dir: str):
    """Per-group z-score standardization (feature normalization): one
    partial-moments pass (n, sum, sum-of-squares per group), tiny driver
    combine, then a broadcast vectorized transform — two streaming passes,
    no window machinery."""
    import ray as _ray

    ds = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"]).materialize()

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(v2=b["value"] * b["value"]).groupby(
            "event_type", as_index=False).agg(
            n=("value", "size"), s=("value", "sum"), s2=("v2", "sum"))
        return g

    m = partial_combine(ds, moments)
    m = m.groupby("event_type", as_index=False).sum()
    n = m["n"].to_numpy(np.float64)
    mean = m["s"].to_numpy(np.float64) / n
    var = (m["s2"].to_numpy(np.float64) - n * mean * mean) / (n - 1.0)
    stats = pd.DataFrame({"event_type": m["event_type"],
                          "mu": mean, "sd": np.sqrt(var)}).set_index("event_type")
    ref = _ray.put(stats)

    def standardize(b: pd.DataFrame, st) -> pd.DataFrame:
        j = b.merge(st, left_on="event_type", right_index=True, how="left")
        z = ((j["value"].to_numpy(np.float64) - j["mu"].to_numpy(np.float64))
             / j["sd"].to_numpy(np.float64))
        return pd.DataFrame({"event_id": j["event_id"].astype("int64"),
                             "zscore": duck_round(z, 6)})

    from demeter_ray.pipelines.relational import bcast

    out = ds.map_batches(bcast(ref, standardize),
                         batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


# ------------------------------------------- ordered STRING_AGG per group

_LISTAGG_SQL = """
SELECT c_nationkey,
       STRING_AGG(c_name, ',' ORDER BY c_custkey) AS names
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
"""


@register("listagg_customers_by_nation", _LISTAGG_SQL)
def listagg_customers_by_nation(sf_dir: str):
    """Ordered STRING_AGG (LISTAGG): one range-partitioned sort, per-block
    segment concatenation (vectorized ','.join per contiguous group run),
    then an O(blocks x groups) driver stitch in first-key order — the
    sessionize shape applied to string reduction."""
    ds = read_table(sf_dir, "customer",
                    columns=["c_nationkey", "c_custkey", "c_name"])
    sorted_ds = ds.sort(["c_nationkey", "c_custkey"]).materialize()

    def seg_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"c_nationkey": pa.array([], pa.int64()),
                             "first_key": pa.array([], pa.int64()),
                             "part": pa.array([], pa.string())})
        nat = batch["c_nationkey"].to_numpy(zero_copy_only=False)
        key = batch["c_custkey"].to_numpy(zero_copy_only=False)
        names = batch["c_name"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, nat[1:] != nat[:-1]])
        ends = np.r_[starts[1:], len(nat)]
        return pa.table({
            "c_nationkey": pa.array(nat[starts], pa.int64()),
            "first_key": pa.array(key[starts], pa.int64()),
            "part": pa.array([",".join(names[s:e]) for s, e in
                              zip(starts, ends)], pa.string()),
        })

    parts = (partial_combine(sorted_ds, seg_partial, "pyarrow",
                             batch_size=None)
             .sort_values(["c_nationkey", "first_key"]))
    out = parts.groupby("c_nationkey", as_index=False).agg(
        names=("part", ",".join))
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    return out.sort_values("c_nationkey").reset_index(drop=True)


# --------------------------------------- per-dimension embedding statistics

_EMBDIM_SQL = """
SELECT i AS dim, ROUND(AVG(v), 6) AS mean_v, ROUND(STDDEV_SAMP(v), 6) AS std_v
FROM (SELECT UNNEST(embedding) AS v,
             UNNEST(range(1, len(embedding) + 1)) AS i
      FROM embeddings)
GROUP BY i ORDER BY i
"""


@register("embedding_dim_stats", _EMBDIM_SQL)
def embedding_dim_stats(sf_dir: str):
    """Column-wise mean/stddev over a list<float> embedding column — the
    feature-drift monitor for vector corpora.  Each batch contributes one
    (dim,)-shaped partial of n / sum / sum-of-squares (np.stack + axis-0
    reductions); the driver combine is dim-bounded regardless of corpus
    size."""
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def moments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "s2": pa.array([], pa.float64())})
        m = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        return pa.table({
            "dim": pa.array(np.arange(1, m.shape[1] + 1), pa.int64()),
            "n": pa.array(np.full(m.shape[1], m.shape[0]), pa.int64()),
            "s": pa.array(m.sum(axis=0), pa.float64()),
            "s2": pa.array((m * m).sum(axis=0), pa.float64()),
        })

    parts = partial_combine(ds, moments, batch_format="pyarrow")
    g = parts.groupby("dim", as_index=False).sum()
    n = g["n"].to_numpy(np.float64)
    mean = g["s"].to_numpy(np.float64) / n
    with np.errstate(divide="ignore", invalid="ignore"):
        var = (g["s2"].to_numpy(np.float64) - n * mean * mean) / (n - 1.0)
    var = np.where(n < 2, np.nan, var)  # STDDEV_SAMP of one sample: NULL
    return pd.DataFrame({
        "dim": g["dim"].astype("int64"),
        "mean_v": duck_round(mean, 6),
        "std_v": duck_round(np.sqrt(var), 6),
    }).sort_values("dim").reset_index(drop=True)


# ------------------------------------------- grouped linear regression

_REGR_SQL = """
SELECT l_returnflag,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS price_qty_slope,
       ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4)
         AS price_qty_intercept,
       ROUND(REGR_R2(l_extendedprice, l_quantity), 6) AS price_qty_r2
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("regr_price_on_quantity_by_flag", _REGR_SQL)
def regr_price_on_quantity_by_flag(sf_dir: str):
    """Grouped ordinary-least-squares fit (slope / intercept / R²) from the
    same six mergeable moments as the correlation operator — regression over
    any corpus size shuffles six floats per (group, batch), never rows."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = b["l_extendedprice"].to_numpy(np.float64)
        x = b["l_quantity"].to_numpy(np.float64)
        g = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "n": 1.0, "sx": x, "sy": y, "sxy": x * y, "sx2": x * x, "sy2": y * y,
        })
        return g.groupby("l_returnflag", as_index=False).sum()

    m = partial_combine(ds, partial).groupby("l_returnflag", as_index=False).sum()
    n = m["n"].to_numpy(np.float64)
    mx = m["sx"].to_numpy(np.float64) / n
    my = m["sy"].to_numpy(np.float64) / n
    cov = m["sxy"].to_numpy(np.float64) / n - mx * my
    vx = m["sx2"].to_numpy(np.float64) / n - mx * mx
    vy = m["sy2"].to_numpy(np.float64) / n - my * my
    slope = cov / vx
    out = pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        "price_qty_slope": duck_round(slope, 4),
        "price_qty_intercept": duck_round(my - slope * mx, 4),
        "price_qty_r2": duck_round(cov * cov / (vx * vy), 6),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


# --------------------------- grouped skewness / excess kurtosis (moments)

_SKEW_SQL = """
WITH m AS (
  SELECT l_returnflag, COUNT(*)::DOUBLE AS n,
         SUM(l_quantity) AS s1,
         SUM(l_quantity*l_quantity) AS s2,
         SUM(l_quantity*l_quantity*l_quantity) AS s3,
         SUM(l_quantity*l_quantity*l_quantity*l_quantity) AS s4
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
  ROUND((s3/n - 3.0*(s1/n)*(s2/n) + 2.0*(s1/n)*(s1/n)*(s1/n))
        / POW(s2/n - (s1/n)*(s1/n), 1.5), 6) AS qty_skew,
  ROUND((s4/n - 4.0*(s1/n)*(s3/n) + 6.0*(s1/n)*(s1/n)*(s2/n)
         - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n))
        / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0, 6)
    AS qty_kurtosis
FROM m ORDER BY l_returnflag
"""


@register("skew_kurtosis_by_flag", _SKEW_SQL)
def skew_kurtosis_by_flag(sf_dir: str):
    """Grouped population skewness + excess kurtosis from MERGEABLE RAW
    MOMENTS (n, sum x, x^2, x^3, x^4) — five numbers per (group, batch)
    combine associatively, so the statistic never shuffles raw rows (the
    corr/OLS sketch shape).  l_quantity is integer-valued, so every raw sum
    is integer-exact in float64 below 2^53 and both sides' central-moment
    expressions are written with IDENTICAL operation order — bit-equal
    before the ROUND(6) that guards the one libm op (pow 1.5)."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy(np.float64)
        g = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "n": 1.0, "s1": x, "s2": x * x, "s3": x * x * x, "s4": x * x * x * x,
        })
        return g.groupby("l_returnflag", as_index=False).sum()

    m = partial_combine(ds, partial).groupby("l_returnflag", as_index=False).sum()
    n = m["n"].to_numpy(np.float64)
    s1 = m["s1"].to_numpy(np.float64)
    s2 = m["s2"].to_numpy(np.float64)
    s3 = m["s3"].to_numpy(np.float64)
    s4 = m["s4"].to_numpy(np.float64)
    mean = s1 / n
    m2 = s2 / n - mean * mean
    skew = (s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean) / np.power(m2, 1.5)
    kurt = (s4 / n - 4.0 * mean * (s3 / n) + 6.0 * mean * mean * (s2 / n)
            - 3.0 * mean * mean * mean * mean) / (m2 * m2) - 3.0
    out = pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        "qty_skew": duck_round(skew, 6),
        "qty_kurtosis": duck_round(kurt, 6),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


# ------------------- grouped geometric / harmonic means (log-sum moments)

_GEOMEAN_SQL = """
SELECT l_returnflag,
       ROUND(EXP(SUM(LN(l_extendedprice)) / COUNT(*)), 4) AS price_geomean,
       ROUND(COUNT(*) / SUM(1.0 / l_extendedprice), 6) AS price_harmean
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("geo_harmonic_means_by_flag", _GEOMEAN_SQL)
def geo_harmonic_means_by_flag(sf_dir: str):
    """Grouped geometric + harmonic means from mergeable log/reciprocal
    sums (n, sum ln x, sum 1/x — three numbers per (group, batch), the
    corr/skew sketch family).  Rounding absorbs summation-order and libm
    ln/exp ulps; prices are strictly positive so both transforms are
    total."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_extendedprice"].to_numpy(np.float64)
        g = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "n": 1.0, "sln": np.log(x), "sinv": 1.0 / x,
        })
        return g.groupby("l_returnflag", as_index=False).sum()

    m = partial_combine(ds, partial).groupby("l_returnflag", as_index=False).sum()
    out = pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        "price_geomean": duck_round(np.exp(m["sln"].to_numpy(np.float64)
                                           / m["n"].to_numpy(np.float64)), 4),
        "price_harmean": duck_round(m["n"].to_numpy(np.float64)
                                    / m["sinv"].to_numpy(np.float64), 6),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


# ------------- frequency-weighted mean / variance (weighted moments)

_WVAR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         SUM(l_quantity) AS w,
         SUM(l_quantity * l_extendedprice) AS wx,
         SUM(l_quantity * l_extendedprice * l_extendedprice) AS wx2
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND(wx / w, 6) AS wmean_price,
       ROUND(wx2 / w - (wx / w) * (wx / w), 1) AS wvar_price
FROM m ORDER BY l_returnflag
"""


@register("weighted_variance_price", _WVAR_SQL)
def weighted_variance_price(sf_dir: str):
    """Frequency-weighted mean and population variance (quantity-weighted
    price moments): three mergeable sums per (group, batch) — the
    corr/skew sketch family with weights.  The x^2 sums leave the float64
    integer-exact range (~3.6e16 at sf0.1), so the variance rounds at 1
    decimal — summation-order error is ~1e-4 relative there."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        w = b["l_quantity"].to_numpy(np.float64)
        x = b["l_extendedprice"].to_numpy(np.float64)
        g = pd.DataFrame({"l_returnflag": b["l_returnflag"],
                          "w": w, "wx": w * x, "wx2": w * x * x})
        return g.groupby("l_returnflag", as_index=False).sum()

    m = partial_combine(ds, partial).groupby("l_returnflag", as_index=False).sum()
    w = m["w"].to_numpy(np.float64)
    wx = m["wx"].to_numpy(np.float64)
    wx2 = m["wx2"].to_numpy(np.float64)
    out = pd.DataFrame({
        "l_returnflag": m["l_returnflag"],
        "wmean_price": duck_round(wx / w, 6),
        "wvar_price": duck_round(wx2 / w - (wx / w) * (wx / w), 1),
    })
    return out.sort_values("l_returnflag").reset_index(drop=True)


# ------------- market-basket pair co-occurrence (affinity analysis)

_BASKET_K = 20

_BASKET_SQL = f"""
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM lp a JOIN lp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
c AS (SELECT p1, p2, COUNT(*) AS n_orders FROM p GROUP BY p1, p2),
r AS (
  SELECT p1, p2, n_orders,
         ROW_NUMBER() OVER (ORDER BY n_orders DESC, p1, p2) AS rn
  FROM c
)
SELECT p1, p2, n_orders FROM r WHERE rn <= {_BASKET_K}
ORDER BY n_orders DESC, p1, p2
"""


@register("basket_part_pairs", _BASKET_SQL)
def basket_part_pairs(sf_dir: str):
    """Market-basket pair co-occurrence (affinity analysis / frequent
    itemset mining's pair stage): distinct parts per order pair-expand,
    count across orders, top-{_BASKET_K} by support.  Distributed shape:
    one sort on (order, part); each block pair-expands its COMPLETE
    orders vectorized (shifted-array trick, per-order width is tiny) and
    ships only the rows of its two EDGE orders — O(blocks x order-width)
    — to the driver, whose pair counts union back into the stream as one
    extra partial batch; the (p1,p2) reduction packs the pair into ONE
    int64 (the multi-key groupby rule) and runs the size-gated group-sum;
    top-k finishes as per-block partial top-k + a driver merge.
    All-integer."""
    import ray.data as rd

    from demeter_ray.pipelines.relational import (
        dataset_from_typed_df, gated_group_sum_ds, partial_combine)

    K = _BASKET_K
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    sorted_ds = ds.sort(["l_orderkey", "l_partkey"]).materialize()

    def expand_pairs(ok: np.ndarray, pk: np.ndarray) -> np.ndarray:
        """Packed (p1 << 32 | p2) pairs of consecutive-deduped sorted rows."""
        if len(ok) == 0:
            return np.empty(0, dtype=np.int64)
        keep = np.r_[True, (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
        ok, pk = ok[keep], pk[keep]
        out = []
        d = 1
        while True:
            same = ok[:-d] == ok[d:] if d < len(ok) else np.zeros(0, bool)
            if not same.any():
                break
            out.append((pk[:-d][same] << 32) | pk[d:][same])
            d += 1
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    def interior_pairs(t: pa.Table) -> pa.Table:
        empty = {"packed": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
        if t.num_rows == 0:
            return pa.table(empty)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        edge = (ok == ok[0]) | (ok == ok[-1])
        packed = expand_pairs(ok[~edge], pk[~edge])
        vals, cnts = np.unique(packed, return_counts=True)
        return pa.table({"packed": pa.array(vals, pa.int64()),
                         "n": pa.array(cnts.astype(np.int64), pa.int64())})

    def edge_rows_fn(t: pa.Table) -> pa.Table:
        empty = {"b_ok": pa.array([], pa.int64()),
                 "b_pk": pa.array([], pa.int64())}
        if t.num_rows == 0:
            return pa.table(empty)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        edge = (ok == ok[0]) | (ok == ok[-1])
        return pa.table({"b_ok": pa.array(ok[edge], pa.int64()),
                         "b_pk": pa.array(pk[edge], pa.int64())})

    # interior pair partials STAY a Dataset (pair cardinality scales with
    # data — never driver-collected); only the O(blocks x order-width)
    # edge rows come to the driver for the boundary stitch
    interior = sorted_ds.map_batches(interior_pairs, batch_format="pyarrow",
                                     batch_size=None)
    e = (partial_combine(sorted_ds, edge_rows_fn, "pyarrow", batch_size=None)
         .drop_duplicates().sort_values(["b_ok", "b_pk"])
         .reset_index(drop=True))
    epacked = expand_pairs(e["b_ok"].to_numpy(np.int64),
                           e["b_pk"].to_numpy(np.int64))
    ev, ec = np.unique(epacked, return_counts=True)
    extra = pd.DataFrame({"packed": ev, "n": ec.astype(np.int64)})

    pooled = interior.union(dataset_from_typed_df(extra))
    counts = gated_group_sum_ds(pooled, lambda b: b, ["packed"], ["n"])

    def topk_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", "packed"],
                             ascending=[False, True]).head(K)

    cand = partial_combine(counts, topk_partial)
    cand = cand.sort_values(["n", "packed"],
                            ascending=[False, True]).head(K)
    packed = cand["packed"].to_numpy(np.int64)
    return pd.DataFrame({
        "p1": packed >> 32,
        "p2": packed & 0xFFFFFFFF,
        "n_orders": cand["n"].to_numpy(np.int64),
    }).reset_index(drop=True)
