"""Projections / filters / predicates / sorts (SURVEY.md section 2-B).

Hive side: WHERE with 3-valued logic, BETWEEN/IN/LIKE/RLIKE, DISTINCT, CASE,
ORDER BY+LIMIT top-k, SORT BY / DISTRIBUTE BY / CLUSTER BY. All map to
Catalyst-native operators; predicates and projections push into the parquet
scan (verified via explain: PushedFilters). Unique keys (l_orderkey,
l_linenumber) are carried so comparisons have total row identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import register, tbl


@register(
    "project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity * 2 + 1 AS qty_expr,
           upper(l_returnflag) AS flag_u
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT with arithmetic + aliases; IEEE ops only (no rounding needed)."""
    return (
        tbl(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") <= 2)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            (F.col("l_quantity") * 2 + 1).alias("qty_expr"),
            F.upper("l_returnflag").alias("flag_u"),
        )
    )


@register(
    "filter_basic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE (l_quantity > 45 AND l_discount <= 0.02) OR NOT (l_returnflag <> 'R')
    """,
)
def filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE with AND/OR/NOT and comparison operators."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_quantity") > 45) & (F.col("l_discount") <= 0.02))
        | ~(F.col("l_returnflag") != "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@register(
    "filter_between",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 150000
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").between(100000, 150000))
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "filter_in",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )


@register(
    "filter_like",
    oracle="SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%an%'",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%an%"))
        .select("p_partkey", "p_name")
    )


@register(
    "filter_rlike",
    oracle=r"""
    SELECT p_partkey, p_type FROM part
    WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)')
    """,
)
def filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLIKE/REGEXP. Spark rlike is unanchored search, like regexp_matches."""
    return (
        tbl(spark, sf_dir, "part")
        .filter(F.col("p_type").rlike("^(PROMO|ECONOMY)"))
        .select("p_partkey", "p_type")
    )


@register(
    "filter_null_3vl",
    oracle="""
    SELECT l_orderkey, l_linenumber, nullif(l_discount, 0.0) AS disc_or_null,
           (nullif(l_discount, 0.0) > 0.05) AS gt_flag
    FROM lineitem
    WHERE nullif(l_discount, 0.0) IS NULL OR nullif(l_discount, 0.0) > 0.08
    """,
)
def filter_null_3vl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL + 3-valued logic over synthesized NULLs."""
    li = tbl(spark, sf_dir, "lineitem")
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.filter(disc.isNull() | (disc > 0.08)).select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_or_null"),
        (disc > 0.05).alias("gt_flag"),
    )


@register(
    "select_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "case_when_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_band
    FROM lineitem
    """,
)
def case_when_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
        .alias("qty_band"),
    )


@register(
    "order_by_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject (per-partition top-k + merge,
    no global sort) - the right plan at 100 TB. Tie-broken for totality."""
    return (
        tbl(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "sort_by_partition",
    oracle="SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem",
)
def sort_by_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive SORT BY: order within each partition only. The driver compare is
    order-insensitive, so the content equals a plain projection - the
    partition-local ordering itself is asserted by plan tests instead."""
    return (
        tbl(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_suppkey")
        .sortWithinPartitions("l_suppkey", "l_orderkey")
    )


@register(
    "distribute_cluster_by",
    oracle="SELECT l_orderkey, l_linenumber, l_suppkey FROM lineitem",
)
def distribute_cluster_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive CLUSTER BY = DISTRIBUTE BY + SORT BY: hash repartition then
    in-partition sort; the building block for co-located writes."""
    return (
        tbl(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_suppkey")
        .repartition(8, F.col("l_suppkey"))
        .sortWithinPartitions("l_suppkey", "l_orderkey")
    )


@register(
    "order_by_nulls_placement",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null
    FROM orders
    ORDER BY nullif(o_orderstatus, 'O') DESC NULLS LAST, o_orderkey
    LIMIT 50
    """,
)
def order_by_nulls_placement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL placement in ORDER BY (NULLS FIRST/LAST): engines
    disagree on the default (Hive/Spark put NULLs first ascending, DuckDB
    last), so portable ordered output MUST pin placement explicitly - this
    query pins DESC NULLS LAST with a total key tie-break, making the
    LIMIT deterministic on both engines.
    """
    o = tbl(spark, sf_dir, "orders")
    status_or_null = F.nullif("o_orderstatus", F.lit("O"))
    return (
        o.select("o_orderkey", status_or_null.alias("status_or_null"))
        .orderBy(
            F.col("status_or_null").desc_nulls_last(), F.col("o_orderkey").asc()
        )
        .limit(50)
    )
