"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``bee_proof_spark.queries`` (SURVEY.md section 2
inventory); every id declared here passes the same comparison locally first
(tests/test_queries_oracle.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bee_proof_spark.queries import load_all  # noqa: E402

_REGISTRY = load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from bee_proof_spark.queries.tpch import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {qid: spec.builder for qid, spec in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query id; rows-only specs are omitted."""
    return {qid: spec.oracle for qid, spec in _REGISTRY.items() if spec.oracle is not None}
