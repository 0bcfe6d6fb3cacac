"""Lateral view / table-generating functions (SURVEY.md section 2-B):
explode, posexplode, LATERAL VIEW OUTER, inline/stack.

Scale posture: explode is a narrow transformation (no shuffle); row fan-out
multiplies downstream partition sizes, so exploding queries aggregate or
filter before any shuffle boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import register, tbl


@register(
    "explode_array",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 100
    """,
)
def explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode(split(text)) == explode() over the word array."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))


@register(
    "posexplode_array",
    oracle="""
    SELECT l_orderkey, 0 AS pos, l_quantity AS val FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, 1 AS pos, l_discount AS val FROM lineitem WHERE l_linenumber = 1
    """,
)
def posexplode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: element + 0-based position (oracle: positional UNION ALL)."""
    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        F.posexplode(F.array("l_quantity", "l_discount")).alias("pos", "val"),
    )


@register(
    "lateral_view_outer",
    oracle="""
    SELECT n_nationkey,
           unnest(coalesce(CASE WHEN n_regionkey = 0 THEN NULL
                                ELSE [n_regionkey, n_regionkey * 10] END,
                           [NULL])) AS rk
    FROM nation
    """,
)
def lateral_view_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW OUTER: rows with empty/NULL arrays are kept with NULL
    (explode_outer; DuckDB emulation: coalesce(arr, [NULL]))."""
    n = tbl(spark, sf_dir, "nation")
    arr = F.when(
        F.col("n_regionkey") != 0,
        F.array(F.col("n_regionkey"), F.col("n_regionkey") * 10),
    )  # NULL array when regionkey = 0
    return n.select("n_nationkey", F.explode_outer(arr).alias("rk"))


@register(
    "inline_stack",
    oracle="""
    SELECT r_regionkey, t.tag, t.num
    FROM region CROSS JOIN (VALUES ('x', 1), ('y', 2)) t(tag, num)
    """,
)
def inline_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array(struct(...))) / stack(n, ...) via Hive LATERAL VIEW syntax
    (runs unchanged in Spark SQL)."""
    tbl(spark, sf_dir, "region").createOrReplaceTempView("region")
    return spark.sql(
        """
        SELECT r_regionkey, t.tag, t.num
        FROM region
        LATERAL VIEW inline(array(struct('x', 1), struct('y', 2))) t AS tag, num
        """
    )
