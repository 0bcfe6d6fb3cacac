"""Headline analytics queries (TPC-H-style) over the fixture star schema.

These are the bench workload and the flagship ``entry()`` query (SURVEY.md
section 7 step 1). Pure DataFrame API; aggregation goes through exact decimal
sums (see queries/__init__.py) so the distributed result hash-matches the
sequential DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import davg, dsum, o_davg, o_dsum, register, tbl

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
    li = tbl(spark, sf_dir, "lineitem")
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


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``entry()`` flagship query (driver smoke check)."""
    return tpch_q1(spark, sf_dir)
