"""bee-proof-spark: a PySpark-native engine with the query and data-processing
capabilities of mangohealth/bee-proof.

The reference (see /root/reference, SURVEY.md) is a local Hive cluster simulator
and HiveQL verification harness; the query surface it validates is the Hive SQL
language (Hive 0.13.1 - 2.3.3). This package re-expresses that surface Spark-first:

- ``session``    : SparkSession profiles mirroring the reference's pinned
                   execution conf (SURVEY.md section 4.1).
- ``runner``     : the harness itself - manifest parsing, ${VAR} substitution,
                   statement splitting, sequential fail-fast execution, dry-run
                   (validate-only) mode, SET interception, output protocol.
- ``queries``    : the delegated HiveQL surface (SURVEY.md section 2-B) as
                   idiomatic DataFrame builders, each paired with a DuckDB
                   oracle SQL string.
- ``streaming``  : Structured Streaming extensions (north star).
- ``extensions`` : LLM-data-pipeline operators - dedup, similarity search,
                   text analysis, multimodal columns (north star).
"""

__version__ = "0.1.0"
