"""Sampling + TRANSFORM (SURVEY.md section 2-B). Both rows-only: sampling is
engine-specific; TRANSFORM streams rows through an external process."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import register, tbl


@register("tablesample_rows")  # rows-only: sample membership is engine-specific
def tablesample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE (x PERCENT) / (n ROWS): seeded Bernoulli sample + LIMIT."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).limit(500)


@register(
    "transform_script",
    oracle="""
    SELECT cast(n_nationkey as varchar) AS nationkey_str, n_name AS name_str
    FROM nation
    """,
)
def transform_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT TRANSFORM(...) USING 'cmd' (Hive streaming; Spark 3+ supports it
    without Hive). Rows are piped tab-separated through /bin/cat - an identity
    transform, so the oracle is the stringified projection."""
    tbl(spark, sf_dir, "nation").createOrReplaceTempView("nation_t")
    return spark.sql(
        """
        SELECT TRANSFORM(n_nationkey, n_name)
        USING 'cat' AS (nationkey_str STRING, name_str STRING)
        FROM nation_t
        """
    )
