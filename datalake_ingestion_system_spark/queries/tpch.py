"""Adapted TPC-H decision-support suite over the test-lake star schema.

The reference delegates ALL ad-hoc relational querying to Athena/Presto
(reference README.md:34,:51) — TPC-H is the canonical workload for exactly
that delegated surface, so this module supplies the classic query *shapes*
natively (SURVEY §2.6).  The driver's schema is TPC-H-ish but trimmed (no
partsupp; fewer columns), so each query keeps its distinctive operator
structure — exists/in subqueries, two-role dimension joins, conditional
aggregate ratios, max-of-aggregate subqueries, correlated scalar aggregates,
disjunctive DNF predicates, double aggregation — adapted to the available
columns.

Scale notes (100 TB stance): every query is declarative DataFrame code —
Catalyst broadcasts the dimension sides (region/nation always; customer/
supplier/part under the AQE threshold at small SF, shuffle-hash/SMJ beyond),
pushes every filter into the parquet scan, and prunes unread columns.  No
collects, no UDFs, no driver loops anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..session import tune

QUERIES = {}
ORACLE_SQL = {}


def _q(name):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)
        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        wrapped.__wrapped__ = fn  # lets tools fingerprint the real body
        QUERIES[name] = wrapped
        return wrapped
    return deco


# ---------------------------------------------------------------------------
# Q4 — order priority checking: EXISTS semi-join with date-range filter
# ---------------------------------------------------------------------------

@_q("q04_order_priority")
def q04_order_priority(spark, sf_dir):
    """Priority histogram of orders that have at least one late-shipping
    lineitem (EXISTS → left-semi join; TPC-H Q4 shape).

    The orders date filter is parquet-pushed; the semi join shuffles only
    the two key columns after pruning.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1998-07-01")))
    l = load(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey) \
            .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)) \
            .select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_SQL["q04_order_priority"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1998-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q7 — volume shipping: one dimension joined in two roles (n1 supplier-side,
# n2 customer-side) with a symmetric pair predicate
# ---------------------------------------------------------------------------

@_q("q07_volume_shipping")
def q07_volume_shipping(spark, sf_dir):
    """Bilateral trade volume between two nations by ship year (TPC-H Q7
    shape: nation joined twice under different roles)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
              .alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_SQL["q07_volume_shipping"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8 — market share: conditional-sum ratio inside a grouped aggregate
# ---------------------------------------------------------------------------

@_q("q08_market_share")
def q08_market_share(spark, sf_dir):
    """NATION_3's share of ASIA order volume per year (TPC-H Q8 shape:
    CASE-guarded numerator over a common denominator)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n_c = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n_s = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_c), c.c_nationkey == n_c.c_nk)
        .join(F.broadcast(n_s), s.s_nationkey == n_s.s_nk)
        .join(F.broadcast(r), n_c.c_rk == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
            / F.sum(vol), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


ORACLE_SQL["q08_market_share"] = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN region    ON n1.n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit: 4-way fact-dimension join + LIKE filter
# ---------------------------------------------------------------------------

@_q("q09_profit_by_nation")
def q09_profit_by_nation(spark, sf_dir):
    """Profit on 'widget' parts by supplier nation and year (TPC-H Q9 shape,
    sans partsupp — profit is discounted revenue)."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
              .alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


ORACLE_SQL["q09_profit_by_nation"] = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: revenue lost to returns, top 20 customers
# ---------------------------------------------------------------------------

@_q("q10_returned_items")
def q10_returned_items(spark, sf_dir):
    """Top-20 customers by revenue on returned items in one quarter (TPC-H
    Q10 shape).  Planned as TakeOrderedAndProject — no global sort."""
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01")))
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
              .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_SQL["q10_returned_items"] = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-10-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: outer join + double aggregation
# ---------------------------------------------------------------------------

@_q("q13_customer_distribution")
def q13_customer_distribution(spark, sf_dir):
    """Histogram of orders-per-customer including zero-order customers
    (TPC-H Q13 shape: left outer join, then aggregate of an aggregate)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORACLE_SQL["q13_customer_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 — promotion effect: conditional-sum percentage, single output row
# ---------------------------------------------------------------------------

@_q("q14_promo_revenue")
def q14_promo_revenue(spark, sf_dir):
    """PROMO parts' share of one month's revenue (TPC-H Q14 shape)."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01")))
    p = load(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
            * 100.0 / F.sum(vol), 4).alias("promo_revenue_pct"))
    )


ORACLE_SQL["q14_promo_revenue"] = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier: aggregate view + max-of-aggregate scalar subquery
# ---------------------------------------------------------------------------

@_q("q15_top_supplier")
def q15_top_supplier(spark, sf_dir):
    """Supplier(s) with the maximum quarterly revenue (TPC-H Q15 shape:
    revenue view reused as both input and scalar-subquery source).

    The tiny aggregated view is joined against its own max — Catalyst
    broadcasts the 1-row max side.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01")))
    s = load(spark, sf_dir, "supplier")
    revenue = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
              .alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(max_rev),
                     revenue.total_revenue == max_rev.mx)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_SQL["q15_top_supplier"] = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated scalar aggregate per group
# ---------------------------------------------------------------------------

@_q("q17_small_quantity_revenue")
def q17_small_quantity_revenue(spark, sf_dir):
    """Average yearly revenue lost if small-quantity orders for one brand
    were dropped (TPC-H Q17 shape: per-part correlated avg).

    The correlated scalar subquery decorrelates to an aggregate + re-join on
    l_partkey — expressed directly as that plan here.
    """
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    part_lines = l.join(p, l.l_partkey == p.p_partkey)
    avg_qty = (part_lines.groupBy(F.col("l_partkey").alias("ak"))
               .agg((F.avg("l_quantity") * 0.8).alias("qty_cut")))
    return (
        part_lines.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


ORACLE_SQL["q17_small_quantity_revenue"] = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.8 * avg(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: IN-subquery over a grouped HAVING
# ---------------------------------------------------------------------------

@_q("q18_large_orders")
def q18_large_orders(spark, sf_dir):
    """Customers with orders totalling > 300 units (TPC-H Q18 shape:
    IN (SELECT … GROUP BY … HAVING) → semi join on the aggregated set)."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (l.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("tot_qty"))
           .filter(F.col("tot_qty") > 300))
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_orderdate"), "o_totalprice",
                F.round(F.col("tot_qty"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE_SQL["q18_large_orders"] = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(t.tot_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS tot_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) t
  ON o_orderkey = t.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunctive-normal-form predicate pushdown
# ---------------------------------------------------------------------------

@_q("q19_disjunctive_filter")
def q19_disjunctive_filter(spark, sf_dir):
    """Revenue under an OR-of-ANDs (brand × size × quantity band) predicate
    (TPC-H Q19 shape).  Catalyst pushes the common p-side conjuncts into the
    part scan and plans one join, not three."""
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(p, l.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 11)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity").between(10, 20)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity").between(20, 30)))
    )
    return j.filter(band).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
         .alias("revenue"),
        F.count("*").alias("n_rows"))


ORACLE_SQL["q19_disjunctive_filter"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: anti join + scalar-avg subquery filter
# ---------------------------------------------------------------------------

@_q("q22_global_sales_opportunity")
def q22_global_sales_opportunity(spark, sf_dir):
    """Well-funded customers with no recent orders, grouped by nation band
    (TPC-H Q22 shape: NOT EXISTS anti join + scalar average threshold)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01"))
    in_band = c.filter(F.col("c_nationkey") < 10)
    avg_bal = (in_band.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("ab")))
    return (
        in_band.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(o, in_band.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
        .orderBy("cntry")
    )


ORACLE_SQL["q22_global_sales_opportunity"] = """
SELECT c_nationkey AS cntry, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_nationkey < 10
  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0.0 AND c_nationkey < 10)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q12 — shipping-mode priority classes: join + CASE-sum histogram
# (trimmed schema has no l_shipmode/l_receiptdate: l_linestatus serves as the
#  mode-like group key and the lateness test is ship-lag vs order date —
#  the distinctive shape, a two-way conditional count per class, is intact)
# ---------------------------------------------------------------------------

@_q("q12_shipmode_priority")
def q12_shipmode_priority(spark, sf_dir):
    """Late-shipment histogram by line status with urgent/non-urgent CASE
    counts (TPC-H Q12 shape).  Fact-fact equi-join on the order key; both
    date filters parquet-pushed before the shuffle."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01")))
    o = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(urgent, 1).otherwise(0)).cast("long")
              .alias("high_line_count"),
             F.sum(F.when(~urgent, 1).otherwise(0)).cast("long")
              .alias("low_line_count"))
        .orderBy("l_linestatus")
    )


ORACLE_SQL["q12_shipmode_priority"] = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS + NOT EXISTS over the SAME
# fact table in two correlated roles (the one join shape absent elsewhere in
# the suite).  Lateness is ship-lag > 90 days (no l_receiptdate in the
# trimmed schema); multi-supplier orders via the exists/not-exists pair.
# ---------------------------------------------------------------------------

@_q("q21_suppliers_kept_waiting")
def q21_suppliers_kept_waiting(spark, sf_dir):
    """Top suppliers who were the ONLY late supplier on a multi-supplier
    order (TPC-H Q21 shape: EXISTS + NOT EXISTS against the same table).

    Planned as the classic aggregate rewrite instead of literal semi/anti
    joins: EXISTS(another supplier) == distinct suppliers on the order
    > 1, and NOT EXISTS(another LATE supplier) == distinct late suppliers
    == 1 (the line itself is late, so its supplier IS that one).  Two
    orderkey-keyed partial aggregates replace two residual-inequality
    joins and one whole lineitem pass — the shape that survives a 100x
    scale-up."""
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    late_lines = (l.join(o, l.l_orderkey == o.o_orderkey)
                  .filter(late)
                  .select("l_orderkey", "l_suppkey"))
    n_supp = (l.groupBy(F.col("l_orderkey").alias("a_ok"))
              .agg(F.countDistinct("l_suppkey").alias("n_supp")))
    n_late = (late_lines.groupBy(F.col("l_orderkey").alias("b_ok"))
              .agg(F.countDistinct("l_suppkey").alias("n_late")))
    l1 = (late_lines
          .join(n_supp, late_lines.l_orderkey == n_supp.a_ok)
          .join(n_late, late_lines.l_orderkey == n_late.b_ok)
          .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
          .select("l_orderkey", "l_suppkey"))
    return (
        l1.join(s, l1.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


ORACLE_SQL["q21_suppliers_kept_waiting"] = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND n_nationkey < 13
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND o3.o_orderstatus = 'F'
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier: correlated min-subquery matched back per part
# ---------------------------------------------------------------------------

@_q("q02_min_cost_supplier")
def q02_min_cost_supplier(spark, sf_dir):
    """For each selected part, the EUROPE supplier(s) offering the minimum
    unit cost (TPC-H Q2 shape: the correlated aggregate subquery — min per
    part over region suppliers — matched back by equality).  The lake has
    no ``partsupp``, so the supply relation is derived: the minimum unit
    price each supplier ever shipped a part at, in INTEGER fixed-point
    (1e-4 dollars: ``cents * 100 DIV qty``) — a round(x, 4) here diverged
    at sf0.001 on an exact decimal half (26.24125: Spark HALF_UP vs
    DuckDB binary rounding), and the equality match amplifies any
    last-place difference into missing/extra rows.

    Scale: the supply agg is one keyed shuffle of lineitem; supplier/
    nation/region and the per-part min (card. = selected parts) broadcast.
    """
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 25) & (F.col("p_type") == "STANDARD"))
    # part filter applied BEFORE the supply aggregation: the broadcast join
    # prunes lineitem to the selected parts' rows first, so the groupBy
    # aggregates ~|selected parts| x suppliers groups instead of the full
    # (part, supplier) matrix — same result (non-selected parts' supply
    # rows would be discarded by the part join anyway), ~12x less agg input
    supply = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .select("l_partkey", "l_suppkey",
                F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
                .alias("cents"),
                F.floor(F.col("l_quantity") + 0.5).cast("long").alias("qty"))
        .filter(F.col("qty") > 0)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.expr("cents * 100 DIV qty")).alias("supply_cost_fp"))
    )
    eu_supply = (
        supply
        .join(F.broadcast(s), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(p), supply.l_partkey == p.p_partkey)
    )
    best = (
        eu_supply.groupBy(F.col("l_partkey").alias("bk"))
        .agg(F.min("supply_cost_fp").alias("best_cost"))
    )
    return (
        eu_supply.join(F.broadcast(best),
                       (eu_supply.l_partkey == best.bk)
                       & (eu_supply.supply_cost_fp == best.best_cost))
        .select(F.round("s_acctbal", 2).alias("s_acctbal"), "s_name",
                "n_name", "p_partkey", "p_name", "supply_cost_fp")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


ORACLE_SQL["q02_min_cost_supplier"] = """
WITH supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 100
             // CAST(floor(l_quantity + 0.5) AS BIGINT)) AS supply_cost_fp
  FROM lineitem
  WHERE CAST(floor(l_quantity + 0.5) AS BIGINT) > 0
  GROUP BY 1, 2
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name,
       supply_cost_fp
FROM part, supply, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size BETWEEN 10 AND 25 AND p_type = 'STANDARD'
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND supply_cost_fp = (
    SELECT min(ps2.supply_cost_fp)
    FROM supply ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p_partkey AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q11 — important stock: group agg vs scalar-subquery fraction of the total
# ---------------------------------------------------------------------------

@_q("q11_important_stock")
def q11_important_stock(spark, sf_dir):
    """Parts representing more than 0.1% of one nation's total shipped
    value (TPC-H Q11 shape: HAVING sum > fraction * scalar-subquery total).

    Money is summed in integer cents so the threshold comparison is exact
    on both engines — no float-reassociation boundary flips.  At 100 TB the
    cents total still fits a LONG (~9.2e18 = $92 quadrillion); the partial
    agg shuffles only (partkey, cents), and the 1-row total broadcasts.
    """
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    by_part = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = by_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        by_part.join(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("ps_partkey",
                F.round(F.col("value_cents") / 100.0, 2).alias("stock_value"))
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


ORACLE_SQL["q11_important_stock"] = """
WITH v AS (
  SELECT l_partkey AS ps_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_7'
  GROUP BY 1
)
SELECT ps_partkey, round(value_cents / 100.0, 2) AS stock_value
FROM v
WHERE value_cents * 1000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM v)
ORDER BY stock_value DESC, ps_partkey
"""


# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship: NOT-IN exclusion + count distinct
# ---------------------------------------------------------------------------

@_q("q16_parts_supplier_cnt")
def q16_parts_supplier_cnt(spark, sf_dir):
    """How many suppliers can furnish each (brand, type, size) bucket,
    excluding blacklisted suppliers (TPC-H Q16 shape: NOT IN anti-membership
    subquery + multi-attribute COUNT DISTINCT).  The complaint filter is
    adapted to negative account balance (the lake has no ``s_comment``).

    Scale: the distinct (part, supplier) pair set is one shuffle; the
    blacklist and part dimension broadcast; the NOT IN is a broadcast
    left-anti join (safe here — the subquery key is non-null by schema).
    """
    pairs = (load(spark, sf_dir, "lineitem")
             .select("l_partkey", "l_suppkey").distinct())
    bad = (load(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49))
    return (
        pairs.join(F.broadcast(bad),
                   pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


ORACLE_SQL["q16_parts_supplier_cnt"] = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested IN + correlated aggregate threshold
# ---------------------------------------------------------------------------

@_q("q20_potential_promotion")
def q20_potential_promotion(spark, sf_dir):
    """ASIA suppliers who dominated 1997 shipments of some 'small %' part —
    shipped more than 20% of that part's 1997 volume (TPC-H Q20 shape:
    suppkey IN (... partkey IN (name-filtered parts) AND qty > fraction *
    correlated per-part aggregate)).

    Quantities are integral; sums are cast to LONG after rounding so the
    5x-threshold compare is exact integer math on both engines.  Scale: one
    keyed agg over the name-filtered lineitem slice (filter parquet-pushed
    via the broadcast part join), per-part totals broadcast back.
    """
    l97 = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01")))
    parts = (load(spark, sf_dir, "part")
             .filter(F.col("p_name").like("small%")).select("p_partkey"))
    qty = (
        l97.join(F.broadcast(parts), l97.l_partkey == parts.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("qty"))
    )
    tot = (qty.groupBy(F.col("l_partkey").alias("tk"))
           .agg(F.sum("qty").alias("part_total")))
    dominant = (
        qty.join(F.broadcast(tot), qty.l_partkey == tot.tk)
        .filter(F.col("qty") * 5 > F.col("part_total"))
        .select("l_suppkey").distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


ORACLE_SQL["q20_potential_promotion"] = """
SELECT s_name, n_name
FROM supplier, nation, region
WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT q.l_suppkey FROM
      (SELECT l_partkey, l_suppkey,
              CAST(round(sum(l_quantity)) AS BIGINT) AS qty
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_partkey IN (SELECT p_partkey FROM part
                           WHERE p_name LIKE 'small%')
       GROUP BY 1, 2) q
    WHERE q.qty * 5 > (
       SELECT CAST(round(sum(l2.l_quantity)) AS BIGINT) FROM lineitem l2
       WHERE l2.l_partkey = q.l_partkey
         AND l2.l_shipdate >= TIMESTAMP '1997-01-01'
         AND l2.l_shipdate < TIMESTAMP '1998-01-01'))
ORDER BY s_name
"""
