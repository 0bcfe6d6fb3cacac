"""Headline analytics queries (TPC-H-style) over the fixture star schema.

These are the bench workload and the flagship ``entry()`` query (SURVEY.md
section 7 step 1). Pure DataFrame API; aggregation goes through exact decimal
sums (see queries/__init__.py) so the distributed result hash-matches the
sequential DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import (
    _exact_sum,
    davg,
    dsum,
    o_davg,
    o_dsum,
    register,
    spread_scan,
    table_bytes,
    tbl,
)

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {o_dsum('l_quantity')} AS sum_qty,
       {o_dsum('l_extendedprice')} AS sum_base_price,
       {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {o_davg('l_quantity')} AS avg_qty,
       {o_davg('l_extendedprice')} AS avg_price,
       {o_davg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("tpch_q1_pricing", oracle=_Q1_ORACLE)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: scan -> filter -> hash-agg -> sort.

    Scale notes: single shuffle on the 6-value (l_returnflag, l_linestatus)
    key; Catalyst plans partial + final HashAggregate (map-side combine), so
    the shuffle moves 6 rows per input partition regardless of input size.
    Filter and 7-column projection push into the parquet scan.
    """
    # spread_scan: the 19-function exact-sum partial aggregate is the
    # query's dominant cost and runs in the scan stage; the fixture's
    # single-row-group layout caps that stage at one core (guide 2.5).
    # Keyed on l_shipdate - already in the read schema, so the scan stays
    # 7 columns wide - and the pushed filter still reaches the scan below
    # the exchange. Measured: 1.72 -> 1.46 s warm floor (sf0.1, local[32]).
    li = spread_scan(spark, sf_dir, "lineitem", "l_shipdate")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q3_ORACLE = f"""
SELECT l_orderkey,
       {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("tpch_q3_shipping", oracle=_Q3_ORACLE)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: selective dim filter -> joins -> agg -> top-k.

    Scale notes: customer (filtered on segment) is broadcast against orders;
    orders->lineitem is the large join (AQE may still broadcast at small SF).
    Top-k via orderBy().limit() plans TakeOrderedAndProject - no global sort.
    Ties broken by l_orderkey for a total order.
    """
    cust = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = tbl(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey", "revenue", F.col("o_orderdate").cast("string").alias("o_orderdate")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q5_ORACLE = f"""
SELECT n_name, {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@register("tpch_q5_local_supplier", oracle=_Q5_ORACLE)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local supplier volume: star join over all six relational tables.

    Scale notes: region/nation/supplier/customer are dimension tables ->
    explicit broadcast; only orders->lineitem shuffles. Mirrors the classic
    star-join plan a 1000-executor cluster wants.
    """
    region = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = tbl(spark, sf_dir, "nation")
    supplier = tbl(spark, sf_dir, "supplier")
    customer = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem")

    dim = (
        supplier.join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            supplier.s_nationkey == nation.n_nationkey,
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(dim),
            (li.l_suppkey == dim.s_suppkey) & (customer.c_nationkey == dim.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_Q6_ORACLE = f"""
SELECT {o_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""


@register("tpch_q6_forecast", oracle=_Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecasting revenue change: pure scan-filter-agg.

    Scale notes: every predicate pushes into the parquet scan (min/max row-
    group skipping does the heavy lifting at 100 TB); the aggregate is a
    single global decimal sum - one row per partition shuffles.
    """
    li = tbl(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


#: q4's probe-dedup fact-size gate (see tpch_q4 docstring for the measured
#: crossover). Env-overridable (SPARK_GRAFT_Q4_PROBE_BYTES) so the forced-on
#: oracle sweep can hash-verify the over-gate pre-dedup plan at fixture
#: scale (tools/sweep.py --force-gates; SCALE.md r6).
_Q4_PROBE_DEDUP_BYTES = int(
    os.environ.get("SPARK_GRAFT_Q4_PROBE_BYTES", 128 * 1024 * 1024)
)

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("tpch_q4_priority", oracle=_Q4_ORACLE)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: EXISTS on returned lines -
    the fixture has no l_commitdate/l_receiptdate).

    Scale notes: EXISTS compiles to a left-semi join - lineitem never
    duplicates orders rows, and only l_orderkey survives the scan. Above a
    fact-size gate the probe side is pre-deduped to distinct order keys
    BEFORE the semi join: a semi join alone shuffles every matching
    lineitem row, while the distinct's partial hash aggregate combines
    map-side, so the shuffle carries one key per (map partition, order)
    instead of one per returned line. Measured both ways on one host
    (r5 A/B, alternating passes): at the 100x fixture the dedup wins 30%
    (5.87 s vs 8.33 s, and 23.5 s at 1000x), but at sf0.1 its two extra
    tiny jobs COST 25% (0.54 s vs 0.43 s) - the fixed cost dominates until
    the duplicate volume crossing the wire outweighs it. The gate is the
    probe table's compressed size (the statistic a catalog exposes without
    running a job), thresholded where the measured crossover lies.
    """
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    returned = (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    if table_bytes(sf_dir, "lineitem") >= _Q4_PROBE_DEDUP_BYTES:
        returned = returned.distinct()
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q7_ORACLE = f"""
SELECT supp_nation, cust_nation, l_year, {o_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
      OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("tpch_q7_volume_shipping", oracle=_Q7_ORACLE)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping between two nations.

    Scale notes: both nation lookups broadcast; the disjunctive nation-pair
    predicate applies after the broadcast joins, pre-aggregation. lineitem-
    orders is the only big shuffle.
    """
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    supp = tbl(spark, sf_dir, "supplier")
    n1 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY")
    ) | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q9_ORACLE = f"""
SELECT nation, o_year, {o_dsum('amount')} AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%green%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("tpch_q9_profit", oracle=_Q9_ORACLE)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: no partsupp table in the
    fixture, so amount omits supplycost).

    Scale notes: the part filter (LIKE '%green%') broadcasts as a reduced
    build side; supplier/nation broadcast; lineitem-orders shuffles once.
    """
    part = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%green%"))
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    orders = tbl(spark, sf_dir, "orders")
    nation = tbl(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name, {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       c_acctbal, n_name
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("tpch_q10_returned", oracle=_Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by lost revenue.

    Scale notes: returnflag + date filters push to scans; customer/nation
    broadcast; TakeOrderedAndProject for the top-k (no global sort).
    """
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = tbl(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("tpch_q13_custdist", oracle=_Q13_ORACLE)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: left outer join with an
    ON-clause filter, then a two-level aggregation.

    Scale notes: count(o_orderkey) skips nulls from the outer join by SQL
    semantics; second agg groups on the tiny c_count domain.
    """
    cust = tbl(spark, sf_dir, "customer")
    orders = tbl(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q14_ORACLE = f"""
SELECT round(100.00 * {o_dsum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             / {o_dsum('l_extendedprice * (1 - l_discount)')}, 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'
"""


@register("tpch_q14_promo", oracle=_Q14_ORACLE)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional aggregation over a broadcast
    part join (one month of lineitem)."""
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = tbl(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * _exact_sum(promo, 6).cast("double")
                / _exact_sum(rev, 6).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


_Q15_ORACLE = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {o_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@register("tpch_q15_top_supplier", oracle=_Q15_ORACLE)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: CTE-style revenue aggregate reused twice
    (once for the max scalar, once for the join).

    Scale notes: the revenue aggregate is tiny (one row per supplier) - the
    scalar-max comparison is a broadcast of a 1-row subquery, and the
    supplier join broadcasts the aggregate side.
    """
    li = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
        # Two consumers (max scalar + supplier join): checkpoint so the
        # lineitem scan+aggregate runs once (verified: without the barrier
        # the pruned max-subtree blocks ReusedExchange and the corpus is
        # scanned twice).
        .localCheckpoint(eager=False)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mr"))
    supp = tbl(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(revenue), supp.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q17_ORACLE = f"""
SELECT round({o_dsum('l_extendedprice')} / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


@register("tpch_q17_small_qty", oracle=_Q17_ORACLE)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: correlated scalar subquery
    (per-part average quantity) expressed as an aggregate + re-join.

    Scale notes: the per-part average is a map-side-combinable aggregate on
    the same key as the join; Catalyst de-correlates the subquery the same
    way. Brand filter broadcasts part.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(
                _exact_sum(F.col("l_extendedprice"), 6).cast("double") / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


_Q18_ORACLE = f"""
SELECT c_name, c_custkey, o_orderkey, cast(o_orderdate as varchar) AS o_orderdate,
       o_totalprice, {o_dsum('l_quantity')} AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@register("tpch_q18_large_volume", oracle=_Q18_ORACLE)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: IN-subquery over a grouped HAVING,
    then join + re-aggregate + top-k.

    Scale notes: the HAVING aggregate reuses lineitem's l_orderkey
    partitioning; the IN becomes a left-semi join on the already-shuffled
    key, so no extra wide shuffle.
    """
    # spread_scan: lineitem feeds BOTH the HAVING aggregate and the fact
    # side of the semi/equi join chain; the single-row-group layout runs
    # both passes on one core. Keyed on l_orderkey, the hash repartition
    # additionally satisfies the groupBy(l_orderkey) distribution, so the
    # HAVING aggregate plans as a single (no re-shuffle) HashAggregate.
    # Measured: 1.48 -> 1.06 s warm floor (sf0.1, local[32], min-of-4).
    li = spread_scan(spark, sf_dir, "lineitem", "l_orderkey")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    orders = tbl(spark, sf_dir, "orders")
    cust = tbl(spark, sf_dir, "customer")
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_Q19_ORACLE = f"""
SELECT {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


@register("tpch_q19_discounted", oracle=_Q19_ORACLE)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (adapted: no container/shipmode columns):
    disjunction of brand/size/quantity bands over a broadcast part join.

    Scale notes: the disjunctive predicate can't push below the join, but
    part is a broadcast build side so lineitem streams through one stage.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part")
    band = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


_Q22_ORACLE = f"""
SELECT n_name, count(*) AS numcust, {o_dsum('c_acctbal')} AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT {o_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
ORDER BY n_name
"""


@register("tpch_q22_global_sales", oracle=_Q22_ORACLE)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity (adapted: nation instead of phone
    prefix): scalar-average subquery + NOT EXISTS anti join.

    Scale notes: the scalar average broadcasts as a 1-row build side; NOT
    EXISTS is a left-anti join on c_custkey - no row duplication anywhere.
    """
    cust = tbl(spark, sf_dir, "customer")
    nation = tbl(spark, sf_dir, "nation")
    # spread_scan: parallelizes the anti-join build side's decode over the
    # single-row-group fixture layout (no-op on a chunked corpus).
    # Measured: 0.76 -> 0.66 s warm floor (sf0.1, local[32], min-of-4).
    orders = spread_scan(spark, sf_dir, "orders", "o_custkey")
    # The threshold routes through the decimal exact sum (davg/o_davg):
    # a plain double avg is partial-merge-order dependent, so a boundary
    # customer could land on different sides of the cutoff per engine/
    # partitioning - q11 already does this for its threshold.
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal", "ab")
    )
    return (
        cust.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("n_name")
    )


_Q2_ORACLE = """
WITH costs AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  GROUP BY p_partkey, s_suppkey, s_name, s_acctbal, n_name
),
best AS (SELECT p_partkey AS bp, min(unit_cost) AS best_cost FROM costs GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
FROM costs JOIN best ON p_partkey = bp AND unit_cost = best_cost
"""


@register("tpch_q2_min_cost", oracle=_Q2_ORACLE)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (adapted: no partsupp table, so the
    part-supplier relation and its "cost" come from lineitem - min observed
    unit price per part/supplier pair).

    Shape preserved: the correlated min-per-part subquery, expressed as a
    window min (one extra shuffle-free pass over the tiny grouped result
    instead of a rejoin). Scale notes: part(filtered)/supplier/nation/region
    all broadcast; lineitem shuffles once for the pair-level groupBy; the
    per-part min is a window over that already-small aggregate.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part_f = tbl(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation")
    region = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    costs = (
        li.join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p_partkey")
    return (
        costs.withColumn("best_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            "unit_cost",
        )
    )


_Q8_ORACLE = f"""
WITH v AS (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN part ON p_partkey = l_partkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
SELECT o_year,
       round({o_dsum("case when supp_nation = 'NATION_3' then volume else 0 end")}
             / {o_dsum('volume')}, 6) AS mkt_share
FROM v GROUP BY o_year ORDER BY o_year
"""


@register("tpch_q8_market_share", oracle=_Q8_ORACLE)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_3's share of ECONOMY-part
    revenue sold into the ASIA market, per year.

    Scale notes: one fact shuffle (lineitem-orders); customer, both nation
    roles, region, supplier, and part are broadcast dims. The share is a
    conditional-sum / total-sum ratio computed in the same aggregate - no
    second pass, no join of two aggregates. Decimal-routed sums keep the
    ratio bit-identical to the sequential oracle.
    """
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31 00:00:00")
    )
    cust = tbl(spark, sf_dir, "customer")
    nation_c = tbl(spark, sf_dir, "nation").alias("cn")
    nation_s = tbl(spark, sf_dir, "nation").alias("sn")
    region = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = tbl(spark, sf_dir, "supplier")
    part_f = tbl(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    brazil_vol = F.when(F.col("sn.n_name") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation_c), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(region), F.col("cn.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation_s), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .join(F.broadcast(part_f), li.l_partkey == part_f.p_partkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                _exact_sum(brazil_vol, 6).cast("double")
                / _exact_sum(volume, 6).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q11_ORACLE = f"""
WITH pv AS (
  SELECT l_partkey AS p_partkey,
         {o_dsum('l_extendedprice * (1 - l_discount)')} AS part_value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_13'
  GROUP BY l_partkey
)
SELECT p_partkey, part_value FROM pv
WHERE part_value > (
  SELECT cast(sum(cast(part_value as decimal(25,6))) as double) * 0.001 FROM pv
)
"""


@register("tpch_q11_important_stock", oracle=_Q11_ORACLE)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (adapted: no partsupp, so per-part value is
    NATION_13-supplier revenue from lineitem instead of supplycost*availqty).

    Shape preserved: HAVING-vs-scalar-subquery over the same aggregate. The
    per-part aggregate is computed ONCE and reused for both the threshold
    (a 1-row re-aggregate, broadcast) and the filter - at 100 TB you pay one
    fact shuffle, not two.
    """
    li = tbl(spark, sf_dir, "lineitem")
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_13")
    pv = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "part_value"))
        .localCheckpoint(eager=False)  # reused by threshold + filter
    )
    # Decimal-route the threshold sum too: part_value is an exact multiple of
    # 1e-6, so the re-cast is lossless and the order-varying double sum can't
    # put boundary parts on different sides of 'thr' than the oracle.
    threshold = pv.agg(
        (F.sum(F.col("part_value").cast("decimal(25,6)")).cast("double") * 0.001).alias("thr")
    )
    return (
        pv.join(F.broadcast(threshold), F.col("part_value") > F.col("thr"))
        .select("p_partkey", "part_value")
    )


_Q12_ORACLE = """
SELECT l_returnflag,
       cast(sum(case when o_orderpriority IN ('1-URGENT', '2-HIGH') then 1 else 0 end) as bigint) AS high_line_count,
       cast(sum(case when o_orderpriority NOT IN ('1-URGENT', '2-HIGH') then 1 else 0 end) as bigint) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_returnflag ORDER BY l_returnflag
"""


@register("tpch_q12_shipmode", oracle=_Q12_ORACLE)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping modes (adapted: no shipmode/commit/receipt columns -
    "late" is shipped >90 days after order date, grouped by returnflag).

    Shape preserved: join + conditional-count aggregation. Scale notes: one
    shuffle join on the order key (both sides large), then a 3-group agg;
    the date-arithmetic predicate is codegen, applied at the join output.
    """
    li = tbl(spark, sf_dir, "lineitem")
    orders = tbl(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.expr("l_shipdate > o_orderdate + INTERVAL 90 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@register("tpch_q16_supplier_cnt", oracle=_Q16_ORACLE)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (adapted: part-supplier pairs
    from lineitem; the comment-LIKE supplier exclusion becomes a negative-
    balance exclusion).

    Shape preserved: NOT IN subquery + count(DISTINCT) + multi-key groupBy.
    Scale notes: the distinct pair projection dedups lineitem down to the
    relationship table before any join; part and the (tiny) exclusion list
    broadcast; one shuffle for the distinct, one for the count-distinct agg.
    """
    li = tbl(spark, sf_dir, "lineitem")
    part = tbl(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    excluded = tbl(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(F.broadcast(excluded), pairs.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q20_ORACLE = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         cast(sum(cast(l_quantity as decimal(25,6))) as double) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey AS tp,
         cast(sum(cast(l_quantity as decimal(25,6))) as double) * 0.5 AS half_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_partkey
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE n_name = 'NATION_24'
  AND s_suppkey IN (
    SELECT l_suppkey FROM shipped
    JOIN tot ON tp = l_partkey
    JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE '%bolt' AND qty > half_qty
  )
"""


@register("tpch_q20_excess_stock", oracle=_Q20_ORACLE)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (adapted: no partsupp/availqty -
    a supplier has "excess stock" in a part when it shipped more than half
    that part's 1997 volume).

    Shape preserved: nested semi-join chain (suppliers <- qualifying pairs
    <- per-part aggregate subquery). Scale notes: both aggregates come from
    the same filtered scan; the pair-level and part-level rollups are one
    shuffle each on the same key (partkey prefix), the part filter
    broadcasts, and the final supplier membership is a left-semi join.
    """
    li97 = tbl(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    # Per-pair decimal sums are exact and associative, so the per-part total
    # re-aggregates the (small) pair rollup instead of rescanning the corpus:
    # one lineitem scan feeds both levels (checkpointed for its 2 consumers).
    shipped0 = (
        li97.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(25,6)")).alias("qty_dec"))
        .localCheckpoint(eager=False)
    )
    shipped = shipped0.select(
        "l_partkey", "l_suppkey", F.col("qty_dec").cast("double").alias("qty")
    )
    tot = shipped0.groupBy(F.col("l_partkey").alias("tp")).agg(
        (F.sum("qty_dec").cast("double") * 0.5).alias("half_qty")
    )
    part_f = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt"))
    qualifying = (
        shipped.join(tot, shipped.l_partkey == tot.tp)
        .join(F.broadcast(part_f), shipped.l_partkey == part_f.p_partkey)
        .filter(F.col("qty") > F.col("half_qty"))
        .select("l_suppkey")
    )
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_24")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


_Q21_ORACLE = """
SELECT s_name, cast(count(*) as bigint) AS numwait
FROM lineitem l1
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_18'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name
"""


@register("tpch_q21_waiting", oracle=_Q21_ORACLE)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (adapted: "late" is
    shipped >60 days after order date; the fixture has no commit/receipt
    dates).

    The EXISTS / NOT EXISTS correlated self-joins are algebraized away:
    both subqueries only ask set questions about the row's own order -
    "does another supplier appear on this order?" (|suppliers| >= 2) and
    "am I the only LATE supplier on it?" (|late suppliers| == 1, the base
    row itself being late). So instead of re-joining the fact table against
    itself twice (three lineitem scans, three orderkey shuffles - measured
    33x time at 100x data), lineitem joins orders once and ONE per-order
    aggregate computes everything the filter and the count need (r15,
    VERDICT r14 item 5; replaces the r-earlier window form):

    The set questions need no sets - min/max answer them exactly:

    - "another supplier exists" <=> min(l_suppkey) != max(l_suppkey),
    - "exactly one late supplier" <=> the late-supplier min is non-null
      (at least one late row) AND equals the late-supplier max (no
      second distinct late supplier) - min/max ignore the nulls the
      ``when(late, ...)`` guard produces for on-time rows,
    - that single late supplier IS max(when(late, l_suppkey)),
    - every late row of a qualifying order belongs to that supplier, so
      the original per-row count regroups to sum(count(when(late, 1)))
      by s_name.

    vs the window form this partial-aggregates map-side with FIXED-WIDTH
    long buffers (plain codegen HashAggregate): the orderkey exchange
    ships one 5-long row per order instead of every joined lineitem row,
    and the per-partition sort the window needed is gone (guide section
    2.3 "aggregate before you shuffle", section 1.2 step 1) - at scale
    the sort of the full joined fact stream was the liability. A
    collect_set formulation of the same rewrite was REJECTED by A/B:
    ObjectHashAggregate's per-group set objects on a near-unique key
    cost more than the window it replaced (floors: window 0.875-0.896,
    collect_set agg 1.062, this form 0.867 - sf0.1, local[32],
    interleaved same-session ABBA A/Bs, min-of-6 warm, identical 40
    rows, oracle hash green at sf0.01 AND sf0.1). Supplier/nation still
    broadcast after the filter has cut the rows; one fact scan, one
    fact shuffle, no row duplication.
    """
    li = tbl(spark, sf_dir, "lineitem")
    orders_f = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = tbl(spark, sf_dir, "supplier")
    nation = tbl(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_18")

    late = F.expr("l_shipdate > o_orderdate + INTERVAL 60 DAYS")
    late_sk = F.when(late, F.col("l_suppkey"))
    per_order = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders_f.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("min_supp"),
            F.max("l_suppkey").alias("max_supp"),
            F.min(late_sk).alias("min_late"),
            F.max(late_sk).alias("max_late"),
            F.count(late_sk).alias("n_late_rows"),
        )
        .filter(
            (F.col("min_supp") != F.col("max_supp"))
            & F.col("min_late").isNotNull()
            & (F.col("min_late") == F.col("max_late"))
        )
    )
    return (
        per_order.join(F.broadcast(supp), F.col("max_late") == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").cast("bigint").alias("numwait"))
    )


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``entry()`` flagship query (driver smoke check)."""
    return tpch_q1(spark, sf_dir)
