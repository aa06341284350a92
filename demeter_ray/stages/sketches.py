"""Mergeable sketches: HyperLogLog distinct counting (the 'emit one
serialized sketch per batch and merge them in a tiny second stage' pattern
from the Ray Data aggregation-at-scale playbook — sketches shuffle, rows
don't).

Pure-numpy HLL (Flajolet et al. 2007 with the standard small-range
correction): register array of size 2^p; per-batch partial sketches merge by
elementwise max.  Exactness is NOT the point — the test pins the estimate
within the theoretical error bound (~1.04/sqrt(2^p)) against the exact
distinct count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from demeter_ray.functions.hashing import TokenHasher


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_add(registers: np.ndarray, hashes: np.ndarray, p: int) -> None:
    """Fold uint64 hashes into the register array in place (vectorized)."""
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # rank = leading zeros of the remaining bits + 1 (cap at 64 - p + 1)
    lz = np.full(len(hashes), 64 - p, dtype=np.int64)
    cur = rest.copy()
    found = np.zeros(len(hashes), dtype=bool)
    for bit in range(64 - p):
        top = (cur >> np.uint64(63)) & np.uint64(1)
        newly = (~found) & (top == 1)
        lz[newly] = bit
        found |= newly
        cur = cur << np.uint64(1)
    rank = (lz + 1).astype(np.int64)
    np.maximum.at(registers, idx, rank)


def hll_estimate(registers: np.ndarray) -> float:
    m = len(registers)
    est = _alpha(m) * m * m / np.sum(2.0 ** (-registers.astype(np.float64)))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros > 0:  # small-range correction
        est = m * np.log(m / zeros)
    return float(est)


class HLLSketchActor:
    """Per-batch partial sketch over a column's values (token hashing cached
    per actor).  Emits ONE row per batch: the serialized register array."""

    def __init__(self, column: str, p: int = 12):
        self.column = column
        self.p = p
        self.hasher = TokenHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [str(v) for v in batch[self.column].to_pylist()]
        regs = np.zeros(1 << self.p, dtype=np.int64)
        hashes = self.hasher.hash_tokens(vals).astype(np.uint64) << np.uint64(1)
        hll_add(regs, hashes, self.p)
        return pa.table({"registers": pa.array([regs.tolist()],
                                               pa.list_(pa.int64(), 1 << self.p))})


def approx_distinct(ds: ray.data.Dataset, column: str, p: int = 12) -> float:
    """Distributed approximate distinct count: per-batch sketches (one tiny
    row each) -> elementwise-max merge on the driver -> estimate."""
    # plain task pool: sketch state is per-batch, actor ramp-up buys nothing
    parts = ds.map_batches(
        HLLSketchActor(column, p), batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    merged = np.zeros(1 << p, dtype=np.int64)
    for regs in parts["registers"]:
        merged = np.maximum(merged, np.asarray(regs, dtype=np.int64))
    return hll_estimate(merged)


def approx_distinct_tokens(ds_docs: ray.data.Dataset, p: int = 12) -> float:
    """Distinct-token estimate over a text corpus (vocabulary size)."""

    class TokenSketch:
        def __init__(self):
            self.hasher = TokenHasher()

        def __call__(self, batch: pa.Table) -> pa.Table:
            regs = np.zeros(1 << p, dtype=np.int64)
            for text in batch["text"].to_pylist():
                toks = list(set(text.split()))
                if toks:
                    hashes = self.hasher.hash_tokens(toks).astype(np.uint64) << np.uint64(1)
                    hll_add(regs, hashes, p)
            return pa.table({"registers": pa.array([regs.tolist()],
                                                   pa.list_(pa.int64(), 1 << p))})

    parts = ds_docs.map_batches(
        TokenSketch(), batch_format="pyarrow", batch_size=4096
    ).to_pandas()
    merged = np.zeros(1 << p, dtype=np.int64)
    for regs in parts["registers"]:
        merged = np.maximum(merged, np.asarray(regs, dtype=np.int64))
    return hll_estimate(merged)


def sorted_quantiles(ds, val: str, qs, round_to: int = 4):
    """EXACT quantiles for CONTINUOUS / unbounded value domains (the
    count-histogram sketch below assumes a bounded domain): one
    range-partitioned ``Dataset.sort`` on the value, per-block row counts
    (O(blocks) to the driver), then a second targeted pass that fetches only
    the <= 2*len(qs) globally-indexed order statistics each block owns.
    QUANTILE_CONT interpolation h=(n-1)q — no full materialization at any
    point; the network moves the sort plus a handful of scalars."""
    import ray as _ray

    from demeter_ray.pipelines.relational import duck_round

    sorted_ds = ds.select_columns([val]).sort(val).materialize()
    parts = sorted_ds.map_batches(
        lambda t: pa.table(
            {"n": pa.array([t.num_rows], pa.int64()),
             "first_v": pa.array(
                 [t[val][0].as_py() if t.num_rows else None], pa.float64()),
             "last_v": pa.array(
                 [t[val][-1].as_py() if t.num_rows else None], pa.float64())}
        ),
        batch_format="pyarrow",
        batch_size=None,
    ).to_pandas()
    parts = parts[parts["n"] > 0]
    # block order must follow the global sort: order partials by first value
    parts = parts.sort_values(
        ["first_v", "last_v"], kind="mergesort"
    ).reset_index(drop=True)
    n = int(parts["n"].sum())
    if n == 0:
        return pd.DataFrame({f"q{int(q * 100)}": [np.nan] for q in qs})
    targets = sorted(
        {int(np.floor((n - 1) * q)) for q in qs}
        | {min(int(np.floor((n - 1) * q)) + 1, n - 1) for q in qs}
    )
    ref = _ray.put((np.array(targets, dtype=np.int64),))
    block_starts = np.r_[0, np.cumsum(parts["n"].to_numpy())[:-1]]
    start_by_ident = {
        (float(f), float(l), int(c)): int(s)
        for f, l, c, s in zip(
            parts["first_v"], parts["last_v"], parts["n"], block_starts
        )
    }
    if len(start_by_ident) != len(parts):
        raise ValueError(
            "sorted_quantiles: block identity (first, last, count) collided "
            "— the value distribution is too degenerate for the targeted "
            "fetch; use grouped_exact_quantiles (bounded-domain histogram)"
        )
    sref = _ray.put(start_by_ident)

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        (tgts,) = _ray.get(ref)
        starts = _ray.get(sref)
        v0 = float(t[val][0].as_py())
        v1 = float(t[val][-1].as_py())
        start = starts[(v0, v1, t.num_rows)]
        local = tgts[(tgts >= start) & (tgts < start + t.num_rows)] - start
        vals = t[val].take(pa.array(local, pa.int64()))
        return pa.table({"idx": pa.array(local + start, pa.int64()),
                         "v": vals.combine_chunks().cast(pa.float64())})

    got = sorted_ds.map_batches(pick, batch_format="pyarrow", batch_size=None).to_pandas()
    vmap = dict(zip(got["idx"], got["v"]))
    row = {}
    for q in qs:
        h = (n - 1) * q
        lo = vmap[int(np.floor(h))]
        hi = vmap[min(int(np.floor(h)) + 1, n - 1)]
        row[f"q{int(q * 100)}"] = float(lo + (h - np.floor(h)) * (hi - lo))
    out = pd.DataFrame([row])
    for q in qs:
        out[f"q{int(q * 100)}"] = duck_round(out[f"q{int(q * 100)}"], round_to)
    return out


def grouped_sorted_quantiles(ds, key: str, val: str, qs, round_to: int = 4):
    """EXACT per-group quantiles for CONTINUOUS domains: one sort on
    (key, val), per-(block, key-segment) count partials (O(blocks + groups)
    driver rows), per-group targets located in the cumulative layout, then a
    targeted second pass fetching only the <= 2*len(qs) order statistics
    each group needs.  The grouped generalization of sorted_quantiles; the
    count-histogram sketch (grouped_exact_quantiles) remains the
    bounded-domain path."""
    import ray as _ray

    from demeter_ray.pipelines.relational import duck_round

    sorted_ds = ds.select_columns([key, val]).sort([key, val]).materialize()

    def seg_partial(t: pa.Table) -> pa.Table:
        empty = {
            "b_fk": pa.array([], pa.int64()), "b_fv": pa.array([], pa.float64()),
            "b_lk": pa.array([], pa.int64()), "b_lv": pa.array([], pa.float64()),
            "b_n": pa.array([], pa.int64()), "seg_idx": pa.array([], pa.int64()),
            "seg_key": pa.array([], pa.int64()), "seg_n": pa.array([], pa.int64()),
        }
        if t.num_rows == 0:
            return pa.table(empty)
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        m = len(starts)
        return pa.table(
            {
                "b_fk": pa.array(np.full(m, k[0]), pa.int64()),
                "b_fv": pa.array(np.full(m, float(v[0])), pa.float64()),
                "b_lk": pa.array(np.full(m, k[-1]), pa.int64()),
                "b_lv": pa.array(np.full(m, float(v[-1])), pa.float64()),
                "b_n": pa.array(np.full(m, len(k)), pa.int64()),
                "seg_idx": pa.array(np.arange(m), pa.int64()),
                "seg_key": pa.array(k[starts], pa.int64()),
                "seg_n": pa.array(ends - starts, pa.int64()),
            }
        )

    parts = sorted_ds.map_batches(
        seg_partial, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {key: pd.Series(dtype="int64"),
             **{f"q{int(q * 100)}": pd.Series(dtype="float64") for q in qs}}
        )
    ident_cols = ["b_fk", "b_fv", "b_lk", "b_lv", "b_n"]
    grouped: dict[tuple, list[tuple[int, int, int]]] = {}
    for row in parts.itertuples(index=False):
        ident = (int(row.b_fk), float(row.b_fv), int(row.b_lk),
                 float(row.b_lv), int(row.b_n))
        grouped.setdefault(ident, []).append(
            (int(row.seg_idx), int(row.seg_key), int(row.seg_n))
        )
    # global block order = content order of the sorted dataset; two distinct
    # blocks sharing an identity tuple would fold together here — their
    # seg_idx values collide, which we refuse loudly
    idents = sorted(grouped)
    for ident in idents:
        sidx = [s for s, _, _ in grouped[ident]]
        if len(sidx) != len(set(sidx)):
            raise ValueError("grouped_sorted_quantiles: block identity collision")
    # walk blocks in global order, assigning each segment its offset within
    # its key and accumulating per-key totals
    key_tot: dict[int, int] = {}
    seg_off: dict[tuple, list[tuple[int, int]]] = {}
    for ident in idents:
        offs = []
        for _, kk, sn in sorted(grouped[ident]):
            off = key_tot.get(kk, 0)
            offs.append((kk, off))
            key_tot[kk] = off + sn
        seg_off[ident] = offs
    # per-key target global-in-key indices
    targets: dict[int, set] = {}
    for kk, n in key_tot.items():
        t = set()
        for q in qs:
            h = (n - 1) * q
            t.add(int(np.floor(h)))
            t.add(min(int(np.floor(h)) + 1, n - 1))
        targets[kk] = t
    ref = _ray.put((seg_off, {k2: np.array(sorted(v2), dtype=np.int64)
                              for k2, v2 in targets.items()}))

    def pick(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64()),
                             "v": pa.array([], pa.float64())})
        so, tg = _ray.get(ref)
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        ident = (int(k[0]), float(v[0]), int(k[-1]), float(v[-1]), len(k))
        offs = so[ident]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        ends = np.r_[starts[1:], len(k)]
        out_k, out_i, out_v = [], [], []
        for (kk, off), s, e in zip(offs, starts, ends):
            want = tg[kk]
            local = want[(want >= off) & (want < off + (e - s))] - off
            for li in local:
                out_k.append(kk)
                out_i.append(int(li) + off)
                out_v.append(float(v[s + li]))
        return pa.table({"k": pa.array(out_k, pa.int64()),
                         "i": pa.array(out_i, pa.int64()),
                         "v": pa.array(out_v, pa.float64())})

    got = sorted_ds.map_batches(pick, batch_format="pyarrow", batch_size=None).to_pandas()
    vmap = {(int(r.k), int(r.i)): float(r.v) for r in got.itertuples(index=False)}
    rows = []
    for kk in sorted(key_tot):
        n = key_tot[kk]
        row = {key: kk}
        for q in qs:
            h = (n - 1) * q
            lo = vmap[(kk, int(np.floor(h)))]
            hi = vmap[(kk, min(int(np.floor(h)) + 1, n - 1))]
            row[f"q{int(q * 100)}"] = float(lo + (h - np.floor(h)) * (hi - lo))
        rows.append(row)
    out = pd.DataFrame(rows)
    for q in qs:
        out[f"q{int(q * 100)}"] = duck_round(out[f"q{int(q * 100)}"], round_to)
    return out.sort_values(key).reset_index(drop=True)


def grouped_exact_quantiles(ds, key: str, val: str, qs, round_to: int = 4):
    """EXACT distributed quantiles for low-cardinality value domains: the
    sketch is a per-(key, value) count histogram — mergeable by summation,
    tiny relative to the data (domain-bounded, not row-bounded) — and the
    quantile resolves from cumulative counts with the standard linear
    interpolation (h = (n-1) q), matching SQL QUANTILE_CONT bit-for-bit.
    Values never shuffle; only (key, value, count) rows do."""
    import pandas as pd

    from demeter_ray.pipelines.relational import duck_round, partial_shuffle_combine

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby([key, val], as_index=False).agg(n=(val, "size"))
        return g

    hist = partial_shuffle_combine(ds, partial, [key, val], ["n"], batch_format="pandas")
    if len(hist) == 0:
        return pd.DataFrame(
            {key: hist[key] if key in hist.columns else pd.Series(dtype="int64"),
             **{f"q{int(q * 100)}": pd.Series(dtype="float64") for q in qs}}
        )
    out_rows = []
    for k, g in hist.groupby(key):
        g = g.sort_values(val)
        values = g[val].to_numpy(dtype=np.float64)
        counts = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        row = {key: k}
        for q in qs:
            h = (n - 1) * q
            lo_i = int(np.searchsorted(cum, np.floor(h) + 1, side="left"))
            hi_i = int(np.searchsorted(cum, np.floor(h) + 2, side="left"))
            lo_v = values[min(lo_i, len(values) - 1)]
            hi_v = values[min(hi_i, len(values) - 1)]
            row[f"q{int(q * 100)}"] = float(lo_v + (h - np.floor(h)) * (hi_v - lo_v))
        out_rows.append(row)
    out = pd.DataFrame(out_rows)
    for q in qs:
        out[f"q{int(q * 100)}"] = duck_round(out[f"q{int(q * 100)}"], round_to)
    return out.sort_values(key).reset_index(drop=True)


def profile_numeric_columns(ds, cols, ndv_cap: int = 1_000_000):
    """Table statistics collection: one streaming pass computes per column
    (n non-null, n_null, min, max) plus EXACT distinct counts, size-gated:

    - per-batch partials carry each column's batch-local unique values
      (bounded by the batch's row count, usually far less);
    - the driver unions the uniques while their running count stays under
      ``ndv_cap``; a column that overflows the cap falls back to the
      distributed ``groupby(col).count()`` shuffle (one row per distinct
      value, never materialized on the driver beyond its count).

    Returns a pandas DataFrame (col, n, n_null, vmin, vmax, ndv) — always
    O(len(cols)) rows.  The reference profiles columns ad hoc via pandas
    describe-style introspection; this is the distributed equivalent.
    """
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = b[c]
            nn = v.notna()
            uniq = v.dropna().unique()
            rows.append({
                "col": c,
                "n": int(nn.sum()),
                "n_null": int((~nn).sum()),
                "vmin": float(v.min()) if nn.any() else np.nan,
                "vmax": float(v.max()) if nn.any() else np.nan,
                # a batch already past the cap ships a sentinel, not values
                "uniq": None if len(uniq) > ndv_cap else uniq.tolist(),
            })
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = []
    for c in cols:
        p = parts[parts["col"] == c]
        seen: set = set()
        overflow = False
        for u in p["uniq"]:
            if u is None:
                overflow = True
                break
            seen.update(u)
            if len(seen) > ndv_cap:
                overflow = True
                break
        if overflow:
            import pyarrow as pa
            import pyarrow.compute as pc

            nonnull = ds.select_columns([c]).map_batches(
                lambda t, col=c: t.filter(pc.is_valid(t[col])),
                batch_format="pyarrow",
            )
            ndv = int(nonnull.groupby(c).count().count())
        else:
            ndv = len(seen)
        have_vals = len(p) > 0 and p["vmin"].notna().any()
        out.append({
            "col": c,
            "n": int(p["n"].sum()),
            "n_null": int(p["n_null"].sum()),
            "vmin": float(np.nanmin(p["vmin"].to_numpy())) if have_vals else np.nan,
            "vmax": float(np.nanmax(p["vmax"].to_numpy())) if have_vals else np.nan,
            "ndv": ndv,
        })
    return pd.DataFrame(out)
