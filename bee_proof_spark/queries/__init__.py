"""Query registry: the delegated HiveQL surface (SURVEY.md section 2-B/2-C) as
Spark-first DataFrame builders, each paired with a DuckDB oracle.

Every capability row in SURVEY.md section 2 declares a query id. A registered
``QuerySpec`` provides:

- ``builder(spark, sf_dir) -> DataFrame``  - idiomatic PySpark implementation
- ``oracle``                               - equivalent DuckDB SQL (None => rows-only check)

Determinism discipline (FIXTURES.md "Timezone / hashing"):

- Session timezone UTC; computed timestamps are cast to STRING in outputs.
- Double aggregates go through exact DECIMAL sums then cast back to double,
  so distributed (order-varying) summation cannot drift from the sequential
  oracle: ``cast(sum(cast(x as decimal(25,6))) as double)``.
- Transcendental results are rounded to 4dp on both sides.
- Collected lists are sorted; every computed column is aliased identically
  on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    id: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(qid: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``qid``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if qid in REGISTRY:
            raise ValueError(f"duplicate query id: {qid}")
        REGISTRY[qid] = QuerySpec(qid, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (TESTDATA.md: one parquet file per table).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark rejects
    by default (PARQUET_TYPE_ILLEGAL) while DuckDB truncates to micros. We
    read nanos as long (legacy conf) and convert ns -> us with integer
    division (a double division would lose precision above 2^53 ns).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for SQL-expressed builders."""
    for name in names:
        tbl(spark, sf_dir, name).createOrReplaceTempView(name)


def dsum(col: str | F.Column, alias: str, scale: int = 6) -> F.Column:
    """Exact distributed sum of a double column.

    Routes through DECIMAL so partial-aggregate ordering cannot change the
    result vs a sequential oracle; final cast back to double is exact on
    both engines. Oracle side mirror: ``cast(sum(cast(x as decimal(25,S))) as double)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double").alias(alias)


def davg(col: str | F.Column, alias: str, scale: int = 6) -> F.Column:
    """Exact-sum average: decimal sum / count, deterministic on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(25,{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def o_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB mirror of :func:`dsum` (without alias)."""
    return f"cast(sum(cast({expr} as decimal(25,{scale}))) as double)"


def o_davg(expr: str, scale: int = 6) -> str:
    """DuckDB mirror of :func:`davg` (without alias)."""
    return f"cast(sum(cast({expr} as decimal(25,{scale}))) as double) / count({expr})"


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so all specs are registered; return REGISTRY."""
    from bee_proof_spark.queries import (  # noqa: F401
        aggregates,
        extensions,
        filters,
        functions_scalar,
        joins,
        lateral,
        sampling,
        scans,
        setops,
        streaming_batch,
        subqueries,
        text_analysis,
        tpch,
        udf,
        windows,
    )

    return REGISTRY
