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
    gated_group_sum_ds,
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
    AND the date-range predicate pruned at the read (pyarrow dataset
    expression -> row-group statistics pruning); the vectorized residual
    mask stays as the correctness boundary; one float per batch to the
    driver."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    ds = read_table(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(pads.field("l_shipdate") >= lo.to_datetime64())
        & (pads.field("l_shipdate") < hi.to_datetime64()),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (
            (b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
            & (b["l_discount"] >= 0.02) & (b["l_discount"] <= 0.04)
            & (b["l_quantity"] < 24)
        )
        s = float((b.loc[m, "l_extendedprice"] * b.loc[m, "l_discount"]).sum())
        return pd.DataFrame({"revenue": [s], "n": [int(m.sum())]})

    parts = partial_combine(ds, partial)
    if int(parts["n"].sum()) == 0:
        # SQL SUM over zero qualifying rows is NULL, not 0.0
        return pd.DataFrame({"revenue": [np.nan]})
    total = parts["revenue"].sum()
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
        return pd.DataFrame({"revenue": [float(rev)], "n": [int(m.sum())]})

    parts = partial_combine(joined, partial)
    if int(parts["n"].sum()) == 0:
        return pd.DataFrame({"revenue": [np.nan]})  # SQL SUM of nothing: NULL
    total = parts["revenue"].sum()
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


# ---------------------------------------------------------------------------
# Q13: left-join count distribution (zero-preserving two-level grouping)
# ---------------------------------------------------------------------------

_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""



@register("q13_customer_order_distribution", _Q13_SQL)
def q13_customer_order_distribution(sf_dir: str):
    """TPC-H Q13 shape: zero-preserving left-join count + distribution of
    the counts.  Per-customer order counts reduce through the size-gated
    combine and STAY distributed; the second grouping (count -> number of
    customers) is tiny-cardinality, so per-batch value_counts partials
    combine on the driver.  Customers with no orders never join — their
    bucket is (total customers - customers seen), two metadata counts."""
    orders = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["o_orderpriority"], "1-URGENT")))
        .select(["o_custkey"]),
        batch_format="pyarrow",
    )

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("o_custkey", as_index=False).agg(
            c_count=("o_custkey", "size"))

    per_cust = gated_group_sum_ds(orders, count_partial, ["o_custkey"], ["c_count"])
    # LEFT JOIN is from the CUSTOMER side: orders naming a customer absent
    # from the customer table must not contribute a count row.  Semi-join
    # the per-customer counts (one row per customer, far smaller than
    # orders) against the customer keys.
    per_cust = gated_semi_join(
        per_cust, "o_custkey",
        read_table(sf_dir, "customer", columns=["c_custkey"]), "c_custkey")

    def dist_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("c_count", as_index=False).agg(
            custdist=("c_count", "size"))

    dist = partial_combine(per_cust, dist_partial)
    dist = dist.groupby("c_count", as_index=False)["custdist"].sum()
    n_total = read_table(sf_dir, "customer", columns=["c_custkey"]).count()
    n_zero = n_total - int(dist["custdist"].sum())
    if n_zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"c_count": [0], "custdist": [n_zero]})],
            ignore_index=True,
        )
    dist = dist.astype({"c_count": "int64", "custdist": "int64"})
    return dist.sort_values(["custdist", "c_count"],
                            ascending=[False, False]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q18: HAVING-gated semi-join over a high-cardinality rollup
# ---------------------------------------------------------------------------

_Q18_SQL = """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice, 2) AS totalprice,
       ROUND(s.sum_qty, 2) AS sum_qty
FROM orders o
JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250) s ON s.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q18_large_volume_customers", _Q18_SQL)
def q18_large_volume_customers(sf_dir: str):
    """TPC-H Q18 shape: per-order quantity rollup -> HAVING filter ->
    top-100, ALL distributed: the rollup stays a Dataset above the combine
    gate, the HAVING filter runs as a Dataset op, qualifying orders attach
    their order columns through the size-gated lookup join (hash-partitioned
    above the cap — the qualifying set scales with data, so the driver never
    holds it), and per-block local top-100s bound what the driver merges.
    Only the <=100 winners ever look up customer names."""
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("l_orderkey", as_index=False).agg(
            sum_qty=("l_quantity", "sum"))

    per_order = gated_group_sum_ds(li, qty_partial, ["l_orderkey"], ["sum_qty"])
    big = per_order.map_batches(
        lambda t: t.filter(pc.greater(t["sum_qty"], 250.0)),
        batch_format="pyarrow",
    )
    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    joined = gated_lookup_join(orders, "o_orderkey", big, "l_orderkey",
                               ["sum_qty"], how="inner")

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True]).head(100)

    top = joined.map_batches(local_top, batch_format="pandas").to_pandas()
    if top.empty:
        return pd.DataFrame({
            "c_name": pd.Series(dtype="object"),
            "o_orderkey": pd.Series(dtype="int64"),
            "o_orderdate": pd.Series(dtype="datetime64[us]"),
            "totalprice": pd.Series(dtype="float64"),
            "sum_qty": pd.Series(dtype="float64"),
        })
    top = top.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(100)
    ckeys = pa.array(sorted(set(top["o_custkey"].tolist())), pa.int64())
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"]).map_batches(
        lambda t, ks=ckeys: t.filter(pc.is_in(t["c_custkey"], value_set=ks)),
        batch_format="pyarrow",
    ).to_pandas()
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["totalprice"] = duck_round(out["o_totalprice"], 2)
    out["sum_qty"] = duck_round(out["sum_qty"], 2)
    out = out[["c_name", "o_orderkey", "o_orderdate", "totalprice", "sum_qty"]]
    out = out.sort_values(["totalprice", "o_orderkey"],
                          ascending=[False, True]).head(100)
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q17: correlated per-key scalar average as a broadcast threshold
# ---------------------------------------------------------------------------

_Q17_SQL = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


@register("q17_small_quantity_revenue", _Q17_SQL)
def q17_small_quantity_revenue(sf_dir: str):
    """TPC-H Q17 shape: correlated per-part AVG decorrelated into one
    grouped (sum, count) pass over the brand-pruned lineitems, broadcast as
    a threshold lookup, then a second vectorized filtered-sum pass.  The
    average is computed from an INTEGER quantity sum so the float threshold
    is identical regardless of batch/combine order (sum-of-doubles ulps
    can't flip the boundary compare)."""
    import ray as _ray

    part_keys = read_table(sf_dir, "part", columns=["p_partkey", "p_brand"]).map_batches(
        lambda t: t.filter(pc.equal(t["p_brand"], "Brand#23")).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    li = read_table(sf_dir, "lineitem",
                    columns=["l_partkey", "l_quantity", "l_extendedprice"])
    li = gated_semi_join(li, "l_partkey", part_keys, "p_partkey").materialize()

    def avg_partial(b: pd.DataFrame) -> pd.DataFrame:
        q100 = np.rint(b["l_quantity"].to_numpy() * 100).astype(np.int64)
        g = b.assign(q100=q100).groupby("l_partkey", as_index=False).agg(
            q100=("q100", "sum"), cnt=("q100", "size"))
        return g

    stats = partial_shuffle_combine(li, avg_partial, ["l_partkey"],
                                    ["q100", "cnt"], batch_format="pandas")
    # threshold = 0.2 * avg(qty) = q100_sum / (500 * cnt), exact in double
    thresh = {int(k): (q / 100.0 / c) * 0.2
              for k, q, c in zip(stats["l_partkey"], stats["q100"], stats["cnt"])}
    ref = _ray.put(thresh)

    def filtered_sum(b: pd.DataFrame) -> pd.DataFrame:
        th = _ray.get(ref)
        lim = b["l_partkey"].map(th)
        m = b["l_quantity"] < lim
        return pd.DataFrame({"s": [float(b.loc[m, "l_extendedprice"].sum())],
                             "n": [int(m.sum())]})

    parts = partial_combine(li, filtered_sum)
    if int(parts["n"].sum()) == 0:
        return pd.DataFrame({"avg_yearly": [np.nan]})  # SUM of nothing: NULL
    total = parts["s"].sum()
    return pd.DataFrame({"avg_yearly": duck_round([total / 7.0], 2)})


# ---------------------------------------------------------------------------
# Q8: market share — widest join in the suite (7 tables, year buckets)
# ---------------------------------------------------------------------------

_Q8_SQL = """
SELECT year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_6' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (SELECT EXTRACT(year FROM o.o_orderdate) AS year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation cn ON cn.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = cn.n_regionkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation sn ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY') t
GROUP BY year
ORDER BY year
"""


@register("q8_market_share", _Q8_SQL)
def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape: seven-table market-share query.  Dims resolve on the
    driver (nation/region are 25/5 rows); customers prune to the region and
    become a semi-join key set; orders carry the year; part prunes by type
    BEFORE the fact join; the (year, supplier-nation) rollup is <= years x
    25 rows -> driver combine; the share division is the last driver step."""
    nation = read_table(sf_dir, "nation").to_pandas()
    region = read_table(sf_dir, "region").to_pandas()
    amer = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    amer = amer[amer["r_name"] == "AMERICA"]
    nkeys = frozenset(amer["n_nationkey"].tolist())

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda b, ks=nkeys: b[b["c_nationkey"].isin(ks)][["c_custkey"]],
        batch_format="pandas",
    )
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = gated_semi_join(orders, "o_custkey", cust, "c_custkey")
    orders = orders.map_batches(
        lambda b: pd.DataFrame({"o_orderkey": b["o_orderkey"],
                                "year": b["o_orderdate"].dt.year.astype("int64")}),
        batch_format="pandas",
    )

    part_keys = read_table(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda t: t.filter(pc.equal(t["p_type"], "ECONOMY")).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    li = read_table(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    li = gated_semi_join(li, "l_partkey", part_keys, "p_partkey")
    li = gated_lookup_join(li, "l_orderkey", orders, "o_orderkey", ["year"])
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    li = gated_lookup_join(li, "l_suppkey", supp, "s_suppkey", ["s_nationkey"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vol = b["l_extendedprice"] * (1 - b["l_discount"])
        return b.assign(volume=vol).groupby(
            ["year", "s_nationkey"], as_index=False)["volume"].sum()

    out = partial_combine(li, partial)
    if out.empty:
        return pd.DataFrame({"year": pd.Series(dtype="int64"),
                             "mkt_share": pd.Series(dtype="float64")})
    out = out.groupby(["year", "s_nationkey"], as_index=False)["volume"].sum()
    target_key = int(nation.loc[nation["n_name"] == "NATION_6", "n_nationkey"].iloc[0])
    by_year = out.groupby("year")["volume"].sum()
    target = out[out["s_nationkey"] == target_key].set_index("year")["volume"]
    share = (target.reindex(by_year.index, fill_value=0.0) / by_year).reset_index()
    share.columns = ["year", "mkt_share"]
    share["mkt_share"] = duck_round(share["mkt_share"], 4)
    return share.sort_values("year").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q22: anti join + exact-rational global scalar gate + substring grouping
# ---------------------------------------------------------------------------

_Q22_SQL = """
WITH avg_bal AS (SELECT AVG(c_acctbal) AS a, COUNT(*) AS n
                 FROM customer WHERE c_acctbal > 0.0)
SELECT SUBSTRING(c.c_name, 18, 1) AS name_digit,
       COUNT(*) AS numcust,
       ROUND(SUM(c.c_acctbal), 2) AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY name_digit
ORDER BY name_digit
"""


@register("q22_idle_customer_balance", _Q22_SQL)
def q22_idle_customer_balance(sf_dir: str):
    """TPC-H Q22 shape: global scalar subquery + anti join + substring
    grouping.  The positive-balance average combines from integer-cent
    (sum, count) partials and the 'above average' gate is decided in exact
    rational arithmetic (cents * n > sum_cents * 100 as Python ints), so no
    float-order ulp can flip a boundary row vs the oracle.  The urgent-order
    key set prunes via the size-gated anti join; the digit rollup is <= 10
    keys -> driver combine."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])

    def bal_partial(b: pd.DataFrame) -> pd.DataFrame:
        pos = b.loc[b["c_acctbal"] > 0.0, "c_acctbal"]
        cents = np.rint(pos.to_numpy() * 100).astype(np.int64)
        return pd.DataFrame({"sum_cents": [int(cents.sum())], "n": [len(cents)]})

    bal = partial_combine(cust, bal_partial)
    sum_cents, n_pos = int(bal["sum_cents"].sum()), int(bal["n"].sum())

    urgent = read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT")).select(
            ["o_custkey"]),
        batch_format="pyarrow",
    )
    idle = gated_semi_join(cust, "c_custkey", urgent, "o_custkey", anti=True)

    def digit_partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(b["c_acctbal"].to_numpy() * 100).astype(np.int64)
        # exact rational compare: acctbal > sum/(100*n) <=> cents*n > sum_cents
        keep = (cents.astype(object) * n_pos) > sum_cents
        k = b[np.asarray(keep, dtype=bool)]
        if k.empty:
            return pd.DataFrame({"name_digit": pd.Series(dtype="object"),
                                 "numcust": pd.Series(dtype="int64"),
                                 "cents": pd.Series(dtype="int64")})
        kc = np.rint(k["c_acctbal"].to_numpy() * 100).astype(np.int64)
        return k.assign(
            name_digit=k["c_name"].str.slice(17, 18), cents=kc
        ).groupby("name_digit", as_index=False).agg(
            numcust=("name_digit", "size"), cents=("cents", "sum"))

    out = partial_combine(idle, digit_partial)
    if out.empty:
        return pd.DataFrame({"name_digit": pd.Series(dtype="object"),
                             "numcust": pd.Series(dtype="int64"),
                             "totacctbal": pd.Series(dtype="float64")})
    out = out.groupby("name_digit", as_index=False).agg(
        numcust=("numcust", "sum"), cents=("cents", "sum"))
    out["totacctbal"] = duck_round(out["cents"] / 100.0, 2)
    out["numcust"] = out["numcust"].astype("int64")
    return out[["name_digit", "numcust", "totacctbal"]].sort_values(
        "name_digit").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Q21-analog: correlated per-group max + multi-supplier EXISTS
# ---------------------------------------------------------------------------

_Q21_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
WHERE l1.l_shipdate = (SELECT MAX(l2.l_shipdate) FROM lineitem l2
                       WHERE l2.l_orderkey = l1.l_orderkey)
  AND EXISTS (SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


@register("q21_latest_shipper_suppliers", _Q21_SQL)
def q21_latest_shipper_suppliers(sf_dir: str):
    """TPC-H Q21 shape: two correlated subqueries decorrelated into one
    per-order profile — (max shipdate, count of distinct suppliers) — built
    from slim partials: per-batch (order, max_ship) maxes plus per-batch
    deduped (order, supplier) pairs whose exact distinct count comes from a
    second-level dedup-then-count combine.  The profile attaches back via
    the size-gated lookup join and both predicates become one vectorized
    int64 mask; only the <=10-row name attach touches strings."""
    import numpy as _np

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    # ONE scan builds the whole per-order profile: per-batch
    # (order, supplier) -> max shipdate partials, bucketed on
    # hash(orderkey) % 32 so every row of an order lands in one bucket,
    # where one vectorized pass finishes BOTH reductions (order max and
    # exact distinct-supplier count from the deduped pairs)
    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.assign(max_ship=b["l_shipdate"].astype("int64")).groupby(
            ["l_orderkey", "l_suppkey"], as_index=False)["max_ship"].max()
        return g

    parts = li.map_batches(pair_partial, batch_format="pandas")

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b["l_orderkey"], index=False)
        b = b.copy()
        b["_pkey"] = (h.to_numpy(_np.uint64) % _np.uint64(32)).astype(_np.int64)
        return b

    def profile(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby(["l_orderkey", "l_suppkey"], as_index=False)["max_ship"].max()
        return t.groupby("l_orderkey", as_index=False).agg(
            max_ship=("max_ship", "max"), nsupp=("l_suppkey", "size"))

    order_profile = (
        parts.map_batches(bucket, batch_format="pandas")
        .groupby("_pkey").map_groups(profile, batch_format="pandas")
    )

    li2 = gated_lookup_join(li, "l_orderkey", order_profile, "l_orderkey",
                            ["max_ship", "nsupp"])

    def wait_partial(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["l_shipdate"].astype("int64") == b["max_ship"]) & (b["nsupp"] > 1)
        k = b.loc[m]
        return k.groupby("l_suppkey", as_index=False).agg(
            numwait=("l_suppkey", "size"))

    waits = gated_group_sum_ds(li2, wait_partial, ["l_suppkey"], ["numwait"])
    # exact distributed top-10 with a boundary-tie-safe threshold: per-block
    # top-10 counts pick the global 10th-highest, then ONLY rows at or above
    # it leave the cluster (ties included), so the name-ordered final sort is
    # exact and the driver pull is bounded by the threshold's multiplicity
    tops = waits.map_batches(
        lambda b: b.sort_values("numwait", ascending=False).head(10),
        batch_format="pandas",
    ).to_pandas()
    if tops.empty:
        return pd.DataFrame({"s_name": pd.Series(dtype="object"),
                             "numwait": pd.Series(dtype="int64")})
    kth = int(tops["numwait"].sort_values(ascending=False).head(10).iloc[-1])
    cand = waits.map_batches(
        lambda t, k=kth: t.filter(pc.greater_equal(t["numwait"], k)),
        batch_format="pyarrow",
    ).to_pandas()
    skeys = pa.array(sorted(set(cand["l_suppkey"].tolist())), pa.int64())
    supp = read_table(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).map_batches(
        lambda t, ks=skeys: t.filter(pc.is_in(t["s_suppkey"], value_set=ks)),
        batch_format="pyarrow",
    ).to_pandas()
    out = cand.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    out = out.groupby("s_name", as_index=False)["numwait"].sum()
    out["numwait"] = out["numwait"].astype("int64")
    return out.sort_values(["numwait", "s_name"],
                           ascending=[False, True]).head(10).reset_index(drop=True)
