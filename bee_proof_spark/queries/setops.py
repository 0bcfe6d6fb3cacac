"""Set operations (SURVEY.md section 2-B): UNION ALL (Hive 0.13),
UNION DISTINCT (1.2), INTERSECT/EXCEPT (2.3 -> emr-5 pin)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import register, tbl


def _cust_nations(spark, sf_dir):
    return tbl(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )


def _supp_nations(spark, sf_dir):
    return tbl(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )


@register(
    "union_all",
    oracle="""
    SELECT nationkey, count(*) AS cnt FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates; aggregated so multiplicity is checked."""
    u = _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir))
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).union(_supp_nations(spark, sf_dir)).distinct()


@register(
    "intersect_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cust_nations(spark, sf_dir).intersect(_supp_nations(spark, sf_dir))


@register(
    "except_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with finished orders but no pending ones (nonempty at every
    fixture SF). subtract == SQL EXCEPT [DISTINCT]: drops every left row
    present in right (exceptAll().distinct() would wrongly keep multiplicity
    survivors)."""
    o = tbl(spark, sf_dir, "orders")
    f_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p_side = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return f_side.subtract(p_side)


@register(
    "intersect_all",
    oracle="""
    SELECT nationkey, count(*) AS cnt FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics, min multiplicity per side - Spark 2.4+);
    aggregated so the multiplicity itself is hash-checked."""
    i = _cust_nations(spark, sf_dir).intersectAll(_supp_nations(spark, sf_dir))
    return i.groupBy("nationkey").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "except_all",
    oracle="""
    SELECT o_custkey, count(*) AS cnt FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    ) GROUP BY o_custkey
    """,
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference: left multiplicity minus right
    multiplicity); aggregated so surviving counts are hash-checked."""
    o = tbl(spark, sf_dir, "orders")
    f_side = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p_side = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return (
        f_side.exceptAll(p_side)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
