"""UDF / UDAF / UDTF surface (SURVEY.md section 2-B): the Spark-native
replacement for Hive's CREATE FUNCTION + GenericUDF/UDAF/UDTF classes.

Performance posture: pandas_udf / applyInPandas move data via Arrow batches
(the fast Python path); the row-at-a-time udf_python_scalar exists to cover
the capability and is deliberately NOT used anywhere else.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from bee_proof_spark.queries import register, tbl


@register(
    "udf_python_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_band
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (capability only - the slow path)."""

    @F.udf(returnType=StringType())
    def qty_band(q: float) -> str:
        return "low" if q < 10 else ("mid" if q < 30 else "high")

    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select("l_orderkey", "l_linenumber", qty_band("l_quantity").alias("qty_band"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF over Arrow batches (IEEE ops -> exact oracle)."""

    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    li = tbl(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net_price("l_extendedprice", "l_discount").alias("net_price"),
    )


@register(
    "udaf_pandas_agg",
    oracle="""
    SELECT l_returnflag,
           cast(sum(cast(l_quantity as decimal(25,6))) as double) AS total_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_pandas_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate as a GROUPED_AGG pandas UDF. Quantities are whole
    numbers (exact in double), so pandas' sum matches the decimal oracle."""

    @F.pandas_udf("double")
    def total_qty(q: pd.Series) -> float:
        return float(q.sum())

    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(total_qty("l_quantity").alias("total_qty"))


@register(
    "udtf_group_apply",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 2
    """,
)
def udtf_group_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group table function via applyInPandas (UDTF equivalent): emit the
    top-2 priced rows per return flag. Oracle = window top-k."""

    def top2(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True],
        ).head(2)
        return out[["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"]]

    li = tbl(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        top2,
        schema="l_returnflag string, l_orderkey bigint, l_linenumber int, l_extendedprice double",
    )


@register(
    "udf_sql_register",
    oracle="""
    SELECT c_custkey, c_acctbal * 2 AS doubled FROM customer
    """,
)
def udf_sql_register(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.udf.register makes a Python fn SQL-visible (CREATE TEMPORARY
    FUNCTION parity), then it is called from SQL text."""
    spark.udf.register("bps_double", lambda x: x * 2, DoubleType())
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer_udf_src")
    return spark.sql(
        "SELECT c_custkey, bps_double(c_acctbal) AS doubled FROM customer_udf_src"
    )


_UDTF_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents WHERE doc_id < 30
)
SELECT doc_id, ws[i] AS word, cast(i - 1 as int) AS pos
FROM w, unnest(generate_series(1, len(ws))) t(i)
"""


@register("udtf_python_lateral", oracle=_UDTF_ORACLE)
def udtf_python_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF invoked as a LATERAL table function from SQL: one
    input row fans out to N output rows (the Hive UDTF/LATERAL VIEW lineage,
    now a first-class Python API).

    Capability-coverage note: a row-at-a-time Python UDTF is the SLOW path -
    every production use in this repo that can fan out JVM-side does
    (explode/sequence, see lateral.py and ext_chunk_documents); this id
    exists to cover the UDTF API surface, on a doc_id < 30 slice.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            # Single-space split (keeps empty tokens), mirroring the
            # oracle's string_split(text, ' ') - NOT any-whitespace .split().
            for i, w in enumerate(text.split(" ")):
                yield w, i

    spark.udtf.register("bps_split_words", SplitWords)
    tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 30).createOrReplaceTempView(
        "docs_udtf_src"
    )
    return spark.sql(
        "SELECT d.doc_id, s.word, s.pos "
        "FROM docs_udtf_src d, LATERAL bps_split_words(d.text) s"
    )
