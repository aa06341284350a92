"""Multi-way-join TPC-H-shaped queries — the "complete relational engine"
demonstrations: 3-6 table join pipelines composed entirely from the size-gated
primitives (gated_semi_join / gated_lookup_join / partial_shuffle_combine), so
every plan here is the shape that survives 100 TB: dims broadcast once via
``ray.put`` under BROADCAST_KEY_CAP and hash-partition through the real
``Dataset.join`` above it; fact-side aggregations pre-reduce per batch before
any shuffle; the driver only ever holds key-bounded combines.

Reference analog: the SSURGO relational plan is exactly this class of
multi-join + grouped-aggregate SQL (/root/reference/demeter/vector/usda/
ssurgo.py:20-108) — these queries exercise the same operators over the
driver's TPC-H-ish tables with DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from demeter_ray.pipelines.relational import (
    bcast,
    duck_round,
    gated_lookup_join,
    gated_semi_join,
    partial_combine,
    partial_shuffle_combine,
    register,
)
from demeter_ray.sources.tables import read_table

# ---------------------------------------------------------------------------
# Q6: pure filter + global aggregate (predicate pushdown demonstration)
# ---------------------------------------------------------------------------

_Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04 AND l_quantity < 24
"""


@register("q6_revenue_forecast", _Q6_SQL)
def q6_revenue_forecast(sf_dir: str):
    """TPC-H Q6 shape: highly selective scan + single global sum.  Columns
    pruned at the read; per-batch vectorized mask + scalar partial, one
    float per batch to the driver."""
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            (b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
            & (b["l_discount"] >= 0.02) & (b["l_discount"] <= 0.04)
            & (b["l_quantity"] < 24)
        )
        s = float((b.loc[m, "l_extendedprice"] * b.loc[m, "l_discount"]).sum())
        return pd.DataFrame({"revenue": [s]})

    total = partial_combine(ds, partial)["revenue"].sum()
    return pd.DataFrame({"revenue": duck_round([total], 2)})


# ---------------------------------------------------------------------------
# Q14: fact ⋈ dim with conditional aggregation
# ---------------------------------------------------------------------------

_Q14_SQL = """
SELECT ROUND(
  100.0 * SUM(CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
        / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01' AND l.l_shipdate < TIMESTAMP '1997-06-01'
"""


@register("q14_promo_revenue", _Q14_SQL)
def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: date-pruned fact scan, size-gated part-dim lookup,
    conditional sums combined on the driver (two floats per batch)."""
    lo, hi = pd.Timestamp("1997-03-01"), pd.Timestamp("1997-06-01")
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)],
        batch_format="pandas",
    )
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_type"])
    joined = gated_lookup_join(li, "l_partkey", part, "p_partkey", ["p_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = b["l_extendedprice"] * (1 - b["l_discount"])
        promo = rev.where(b["p_type"] == "PROMO", 0.0)
        return pd.DataFrame({"promo": [float(promo.sum())], "total": [float(rev.sum())]})

    parts = partial_combine(joined, partial)
    pct = 100.0 * parts["promo"].sum() / parts["total"].sum()
    return pd.DataFrame({"promo_pct": duck_round([pct], 4)})


# ---------------------------------------------------------------------------
# Q5: six-table join with a cross-side equality (local supplier revenue)
# ---------------------------------------------------------------------------

_Q5_SQL = """
SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name
"""


@register("q5_local_supplier_revenue", _Q5_SQL)
def q5_local_supplier_revenue(sf_dir: str):
    """TPC-H Q5 shape: the widest join in the suite.  Plan: nation/region
    resolve to a literal key set on the driver (25 rows); customers in the
    region become a gated dim; date-pruned orders attach c_nationkey (gated
    lookup); lineitem attaches that via its orderkey (the dim side here
    SCALES with data — the gate routes it through ``Dataset.join`` above
    BROADCAST_KEY_CAP); the supplier dim attaches s_nationkey; the
    cross-side equality c_nationkey == s_nationkey filters vectorized; the
    final rollup is <= 25 keys -> driver combine."""
    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    asia = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"]
    nkeys = set(asia["n_nationkey"].tolist())
    nname = asia.set_index("n_nationkey")["n_name"]

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda b, ks=frozenset(nkeys): b[b["c_nationkey"].isin(ks)],
        batch_format="pandas",
    )
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)][
            ["o_orderkey", "o_custkey"]],
        batch_format="pandas",
    )
    ord_nat = gated_lookup_join(orders, "o_custkey", cust, "c_custkey", ["c_nationkey"])

    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li_nat = gated_lookup_join(li, "l_orderkey", ord_nat, "o_orderkey", ["c_nationkey"])

    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    li_both = gated_lookup_join(li_nat, "l_suppkey", supp, "s_suppkey", ["s_nationkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["c_nationkey"] == b["s_nationkey"]]
        rev = b["l_extendedprice"] * (1 - b["l_discount"])
        g = b.assign(revenue=rev).groupby("s_nationkey", as_index=False)["revenue"].sum()
        return g

    out = partial_combine(li_both, partial)
    if out.empty:
        return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                             "revenue": pd.Series(dtype="float64")})
    out = out.groupby("s_nationkey", as_index=False)["revenue"].sum()
    out["n_name"] = out["s_nationkey"].map(nname)
    out["revenue"] = duck_round(out["revenue"], 2)
    out = out[["n_name", "revenue"]].sort_values(
        ["revenue", "n_name"], ascending=[False, True])
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q10: join + high-cardinality rollup + top-k with late dim attach
# ---------------------------------------------------------------------------

_Q10_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("q10_returned_item_losses", _Q10_SQL)
def q10_returned_item_losses(sf_dir: str):
    """TPC-H Q10 shape: the top-k-after-rollup pattern.  Names attach LATE:
    the revenue rollup runs on bare custkeys (gated combine), the top-20 is
    picked first, and only 20 keys ever look up c_name/n_name — at scale
    the name columns never enter the shuffle."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-07-01")
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)][
            ["o_orderkey", "o_custkey"]],
        batch_format="pandas",
    )
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: b[b["l_returnflag"] == "R"][
            ["l_orderkey", "l_extendedprice", "l_discount"]],
        batch_format="pandas",
    )
    li_cust = gated_lookup_join(li, "l_orderkey", orders, "o_orderkey", ["o_custkey"])

    def rev_partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = b["l_extendedprice"] * (1 - b["l_discount"])
        return b.assign(revenue=rev).groupby("o_custkey", as_index=False)["revenue"].sum()

    agg = partial_shuffle_combine(li_cust, rev_partial, ["o_custkey"], ["revenue"],
                                  batch_format="pandas")
    agg["revenue"] = duck_round(agg["revenue"], 2)
    top = agg.sort_values(["revenue", "o_custkey"], ascending=[False, True]).head(20)

    keys = pa.array(top["o_custkey"].tolist(), pa.int64())
    cust = read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_nationkey"]
    ).map_batches(
        # pyarrow filter: empty string-column pandas blocks trip Ray's
        # block-size estimator into a noisy per-block warning
        lambda t, ks=keys: t.filter(pc.is_in(t["c_custkey"], value_set=ks)),
        batch_format="pyarrow",
    ).to_pandas()
    nation = read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    cust = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out = out[["c_custkey", "c_name", "n_name", "revenue"]].sort_values(
        ["revenue", "c_custkey"], ascending=[False, True])
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q4: correlated EXISTS rewritten as per-key max + compare
# ---------------------------------------------------------------------------

_Q4_SQL = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01' AND o.o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("q4_order_priority_check", _Q4_SQL)
def q4_order_priority_check(sf_dir: str):
    """TPC-H Q4 shape: correlated EXISTS decorrelated into an aggregate —
    EXISTS(l.shipdate > o.orderdate) == (MAX(l.shipdate) per order >
    o.orderdate).  Lineitem is first pruned by a gated semi-join on the
    date-windowed orders, then per-order max-shipdate partials reduce
    through the gated combine; the compare is one vectorized pass."""
    import ray.data as rd

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-07-01")
    orders = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b[(b["o_orderdate"] >= lo) & (b["o_orderdate"] < hi)],
        batch_format="pandas",
    ).materialize()

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    li = gated_semi_join(li, "l_orderkey", orders, "o_orderkey")

    def max_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(max_ship=b["l_shipdate"].astype("int64")).groupby(
            "l_orderkey", as_index=False)["max_ship"].max()
        return g

    maxship = partial_shuffle_combine(
        li, max_partial, ["l_orderkey"], ["max_ship"], batch_format="pandas",
        agg="max",
    )
    max_ds = rd.from_pandas(maxship)
    joined = gated_lookup_join(orders, "o_orderkey", max_ds, "l_orderkey", ["max_ship"])

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["max_ship"] > b["o_orderdate"].astype("int64")]
        return b.groupby("o_orderpriority", as_index=False).agg(
            order_count=("o_orderpriority", "size"))

    out = partial_combine(joined, count_partial)
    out = out.groupby("o_orderpriority", as_index=False)["order_count"].sum()
    return out.sort_values("o_orderpriority").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q19: disjunctive multi-attribute join predicate
# ---------------------------------------------------------------------------

_Q19_SQL = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 15)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 25)
   OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 35)
"""

_Q19_BRANCHES = [
    ("Brand#13", 1, 15, 1, 15),
    ("Brand#23", 1, 25, 10, 25),
    ("Brand#5", 1, 35, 20, 35),
]


@register("q19_disjunctive_predicate", _Q19_SQL)
def q19_disjunctive_predicate(sf_dir: str):
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides.  The
    part dim pre-filters to rows satisfying ANY branch's part-side
    conjunct (shrinking the gated lookup), the per-row disjunction is one
    vectorized mask over the joined batch."""
    part = read_table(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    brands = pa.array([b for b, *_ in _Q19_BRANCHES], pa.string())
    part = part.map_batches(
        lambda t, bs=brands: t.filter(pc.is_in(t["p_brand"], value_set=bs)),
        batch_format="pyarrow",
    )
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    joined = gated_lookup_join(li, "l_partkey", part, "p_partkey",
                               ["p_brand", "p_size"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = np.zeros(len(b), dtype=bool)
        for brand, slo, shi, qlo, qhi in _Q19_BRANCHES:
            m |= (
                (b["p_brand"] == brand).to_numpy()
                & (b["p_size"] >= slo).to_numpy() & (b["p_size"] <= shi).to_numpy()
                & (b["l_quantity"] >= qlo).to_numpy() & (b["l_quantity"] <= qhi).to_numpy()
            )
        rev = (b.loc[m, "l_extendedprice"] * (1 - b.loc[m, "l_discount"])).sum()
        return pd.DataFrame({"revenue": [float(rev)]})

    total = partial_combine(joined, partial)["revenue"].sum()
    return pd.DataFrame({"revenue": duck_round([total], 2)})


# ---------------------------------------------------------------------------
# Q7-analog: bidirectional nation-pair trade volume
# ---------------------------------------------------------------------------

_Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
GROUP BY sn.n_name, cn.n_name
ORDER BY supp_nation, cust_nation
"""


@register("q7_nation_trade", _Q7_SQL)
def q7_nation_trade(sf_dir: str):
    """TPC-H Q7 shape: two-nation bilateral trade (pair picked from the synthetic nation roster).  Both nation filters
    push DOWN into the dim scans (customers/suppliers outside the pair
    never join); the grouped rollup is at most 2 rows."""
    nation = read_table(sf_dir, "nation").to_pandas()
    pair = nation[nation["n_name"].isin(["NATION_3", "NATION_7"])]
    nname = pair.set_index("n_nationkey")["n_name"]
    nkeys = frozenset(pair["n_nationkey"].tolist())

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda b, ks=nkeys: b[b["c_nationkey"].isin(ks)], batch_format="pandas"
    )
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda b, ks=nkeys: b[b["s_nationkey"].isin(ks)], batch_format="pandas"
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    ord_nat = gated_lookup_join(orders, "o_custkey", cust, "c_custkey", ["c_nationkey"])

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: b[(b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)][
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]],
        batch_format="pandas",
    )
    li_c = gated_lookup_join(li, "l_orderkey", ord_nat, "o_orderkey", ["c_nationkey"])
    li_cs = gated_lookup_join(li_c, "l_suppkey", supp, "s_suppkey", ["s_nationkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["c_nationkey"] != b["s_nationkey"]]
        rev = b["l_extendedprice"] * (1 - b["l_discount"])
        return b.assign(revenue=rev).groupby(
            ["s_nationkey", "c_nationkey"], as_index=False)["revenue"].sum()

    out = partial_combine(li_cs, partial)
    if out.empty:
        return pd.DataFrame({"supp_nation": pd.Series(dtype="object"),
                             "cust_nation": pd.Series(dtype="object"),
                             "revenue": pd.Series(dtype="float64")})
    out = out.groupby(["s_nationkey", "c_nationkey"], as_index=False)["revenue"].sum()
    out["supp_nation"] = out["s_nationkey"].map(nname)
    out["cust_nation"] = out["c_nationkey"].map(nname)
    out["revenue"] = duck_round(out["revenue"], 2)
    out = out[["supp_nation", "cust_nation", "revenue"]].sort_values(
        ["supp_nation", "cust_nation"])
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi-join (scale path for large key sets)
# ---------------------------------------------------------------------------

_BLOOM_SQL = """
SELECT l.l_orderkey, l.l_linenumber, ROUND(l.l_quantity, 2) AS quantity
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '1-URGENT')
ORDER BY l.l_orderkey, l.l_linenumber
"""


@register("bloom_semi_join_urgent_lineitems", _BLOOM_SQL)
def bloom_semi_join_urgent_lineitems(sf_dir: str):
    """Semi-join through the bloom prefilter: the urgent-order key set
    broadcasts as a 1 MiB bitmap (constant size at any key cardinality),
    false positives are removed by the exact gated verify, so the output is
    identical to the plain semi-join at ~1/100th the broadcast bytes."""
    from demeter_ray.pipelines.relational import bloom_semi_join

    urgent = read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_orderkey"]),
        batch_format="pyarrow",
    )
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity"])
    out = bloom_semi_join(li, "l_orderkey", urgent, "o_orderkey").to_pandas()
    out = pd.DataFrame({
        "l_orderkey": out["l_orderkey"],
        "l_linenumber": out["l_linenumber"],
        "quantity": duck_round(out["l_quantity"], 2),
    })
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
