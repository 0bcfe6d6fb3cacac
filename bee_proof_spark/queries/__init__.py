"""Query registry: the delegated HiveQL surface (SURVEY.md section 2-B/2-C) as
Spark-first DataFrame builders, each paired with a DuckDB oracle.

Every capability row in SURVEY.md section 2 declares a query id. A registered
``QuerySpec`` provides:

- ``builder(spark, sf_dir) -> DataFrame``  - idiomatic PySpark implementation
- ``oracle``                               - equivalent DuckDB SQL (None => rows-only check)

Determinism discipline (FIXTURES.md "Timezone / hashing"):

- Session timezone UTC; computed timestamps are cast to STRING in outputs.
- Double aggregates go through exact scaled-integer sums (see
  :func:`_exact_sum`) then cast back to double, so distributed
  (order-varying) summation cannot drift from the sequential oracle, whose
  rendering stays ``cast(sum(cast(x as decimal(25,6))) as double)`` - the
  same exact number computed the slow way.
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
    Engine-built sessions pin the legacy conf at build (session.py) so the
    session-wide toggle is uniform from the first query; the set below
    covers FOREIGN sessions (the driver builds its own) and is why the
    LongType branch is conditional - a session that already read the
    schema differently keeps working.
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


def table_bytes(sf_dir: str, name: str) -> int:
    """Compressed on-disk size of one fixture table (file or directory).

    Plan-time size heuristics (pre-aggregation gates, memory-vs-disk
    staging cutovers) key off this: it is the same statistic a warehouse
    catalog exposes as table size, available without running a job.
    """
    import os

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        try:
            return os.path.getsize(path)
        except OSError:
            return 0
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def table_rows(sf_dir: str, name: str) -> int | None:
    """Row count of one fixture table from parquet FOOTERS only (no scan) -
    the statistic a warehouse catalog exposes as table row count. Returns
    ``None`` when any footer is unreadable: sizing decisions that key off
    this must not silently guess small (a too-small guess is how a
    selectivity knob reverts to its fixture default on a 100 TB corpus -
    the exact failure the caller exists to prevent); callers surface the
    unknown instead."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        paths = [path]
    else:
        paths = [
            os.path.join(root, f)
            for root, _, files in os.walk(path)
            for f in files
            if f.endswith(".parquet") or f.startswith("part-")
        ]
    if not paths:
        return None
    rows = 0
    for p in paths:
        try:
            rows += pq.ParquetFile(p).metadata.num_rows
        except Exception:
            return None
    return rows


#: (sf_dir, name) -> (row-group count, complete), cached per process
#: (fixture dirs are immutable per process, TESTDATA.md - same contract the
#: family cache relies on). count None = a footer was unreadable (treat as
#: unknown); complete False = the count stopped early at a caller's
#: ``stop_at`` and is a LOWER BOUND, not the table total.
_SPLITS_CACHE: dict[tuple[str, str], tuple[int | None, bool]] = {}


def scan_splits(sf_dir: str, name: str, stop_at: int | None = None) -> int | None:
    """Parquet row groups across the table's files, from footers only: the
    hard ceiling on scan-stage parallelism. A row group is parquet's
    smallest independently readable unit - byte-range splits below one row
    group assign the group to a single task and decode nothing in the
    others, so no Spark split setting can raise scan parallelism past this
    number. ``None`` when any footer is unreadable (callers must treat
    unknown conservatively, exactly like :func:`table_rows`).

    ``stop_at`` bounds the driver-side metadata pass (r14 verdict item 2):
    the spread gate only needs to know whether the count clears a
    threshold, so counting stops - mid-walk, before opening further
    footers - once it reaches ``stop_at`` and returns the partial count (a
    lower bound, which is >= the threshold, exactly what the gate needs).
    Without it a 100 TB table (~1e5 files) paid an O(files) footer pass per
    process for a boolean. Partial counts are cached as lower bounds and
    upgraded in place when a later caller needs more (a larger ``stop_at``
    or the exact total)."""
    import os

    import pyarrow.parquet as pq

    key = (sf_dir, name)
    if key in _SPLITS_CACHE:
        n, complete = _SPLITS_CACHE[key]
        if complete or n is None or (stop_at is not None and n >= stop_at):
            return n
    path = os.path.join(sf_dir, f"{name}.parquet")

    def parquet_files():
        if os.path.isfile(path):
            yield path
            return
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet") or f.startswith("part-"):
                    yield os.path.join(root, f)

    n: int | None = None
    complete = True
    for p in parquet_files():
        try:
            n = (n or 0) + pq.ParquetFile(p).metadata.num_row_groups
        except Exception:
            n = None
            break
        if stop_at is not None and n >= stop_at:
            complete = False  # lower bound: enough for the caller's gate
            break
    _SPLITS_CACHE[key] = (n, complete if n is not None else True)
    return n


def spread_scan(
    spark: SparkSession, sf_dir: str, name: str, key: str | None = None
) -> DataFrame:
    """Read one fixture table and rebalance it across the executor cores
    when - and only when - its LAYOUT cannot feed them (optimization guide
    section 2.5, "input skew: one huge unsplittable file ... repartition
    immediately after the read").

    Parquet cannot parallelize inside a row group, so a table whose files
    hold fewer row groups than the session has cores caps every downstream
    narrow stage (explode, expensive projections, broadcast-join probes,
    partial aggregation) at that parallelism. The fixture tables are
    single-row-group files: without this, stage 1 of a pipeline runs on
    ONE core regardless of SPARK_GRAFT_CPUS. The gate reads the layout,
    not the platform: a warehouse-scale table has thousands of row groups
    per core, so the same call is a plan no-op there and costs only a
    cached footer read. Callers apply it where stage-1 per-row work
    dominates (measured per call site, OPTIMIZATION_r14.md); for cheap
    stage-1 work the repartition shuffle costs more than it buys.

    ``key`` (a column the query already reads - never widen the scan)
    makes the rebalance a deterministic hash repartition: round-robin
    would pay the sort-before-repartition pass (SPARK-23207) and is only
    retry-safe because of it. Keyless falls back to round-robin.
    """
    df = tbl(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    threshold = max(cores // 2, 2)
    # stop_at bounds the footer pass: the gate only needs n >= threshold.
    splits = scan_splits(sf_dir, name, stop_at=threshold)
    if splits is None or splits >= threshold:
        return df
    return df.repartition(cores, key) if key else df.repartition(cores)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views for SQL-expressed builders."""
    for name in names:
        tbl(spark, sf_dir, name).createOrReplaceTempView(name)


def _exact_sum(c: F.Column, scale: int) -> F.Column:
    """Exact sum of ``round(x, scale)`` as a decimal Column, at long-sum speed.

    The naive exact sum, ``sum(cast(x as decimal(25,S)))``, forces Spark's
    slow aggregation path: the accumulator type decimal(35,S) exceeds the
    18-digit compact-long threshold, so every row pays a BigDecimal add +
    changePrecision + byte-array buffer write (measured: TPC-H Q1 over 60M
    rows spends ~85% of its CPU there - tools/gen_scale.py 100x probe).

    This computes the bit-identical result through two BIGINT sums:

    - ``d = cast(x as decimal(S+8, S))`` - the same HALF_UP rounding as the
      wide cast for the documented domain |x| < 10^8, but compact-long backed.
    - ``ticks = floor(double(d) * 10^S + 0.5)`` - the integer d*10^S. Exact
      because |d*10^S| < 10^14 with <= 2 double roundings (error < 1e-2 tick,
      and the true value IS an integer, so +0.5/floor recovers it).
    - ``hi = cast(d as bigint)`` (whole units, truncated toward zero) and
      ``lo = ticks - hi*10^S`` (signed fractional ticks) sum as plain longs
      in Tungsten's fixed-width codegen path.
    - recombined once per GROUP: ``sum(hi) + sum(lo)/10^S`` in decimal(38,S)
      arithmetic - exact (sum(lo) is an integer tick count; the division
      only rescales), and identical to what the wide-decimal sum yields.

    Overflow headroom (long sums wrap silently with ANSI off): sum(hi) is
    safe below 9.2e18 / max|x| rows per group (8e13 rows at money-scale
    1e5) and sum(lo) below 9.2e12 rows per group; beyond that use
    :func:`dsum_wide`. For |x| >= 10^8 the compact cast overflows to NULL
    while the wide cast wouldn't - that case is GUARDED: a per-group
    count(c) vs count(hi) mismatch raises at execution instead of silently
    dropping the overflowed rows (tests/test_exact_sum.py).
    """
    hi, lo, unit = _exact_parts(c, scale)
    # Domain guard: with ANSI off, the compact cast overflows to NULL for
    # |x| >= 10^8 (and +/-Inf), which would silently DROP those rows from
    # the sum. hi is NULL exactly when c is NULL, NaN, or out of domain;
    # NaN is excluded because BOTH the compact and the wide cast null it
    # out (engines agree, not a divergence). So a row with a real non-NaN
    # input but a NULL hi is PRECISELY an out-of-domain row: one violation
    # counter detects them all, and the CASE arm is lazy, so raise_error
    # fires only on actual violation. Cost: ONE long counter in the agg
    # buffer next to the two long sums (measured: the earlier two-count
    # formulation cost ~45% extra on a q1-shaped agg at sf0.1, this form
    # ~10%; detection is identical - viol==0 iff the two counts matched).
    cd = c.cast("double")
    viol = F.count(F.when(cd.isNotNull() & ~F.isnan(cd) & hi.isNull(), F.lit(1)))
    return F.when(viol == 0, _exact_combine(F.sum(hi), F.sum(lo), unit, scale)).otherwise(
        F.raise_error(
            F.lit(
                f"dsum: input outside the |x| < 10^8 exact-sum domain "
                f"(scale={scale}); use dsum_wide for wide values"
            )
        )
    )


def _exact_parts(c: F.Column, scale: int) -> tuple[F.Column, F.Column, int]:
    """Per-row decomposition of ``round(x, scale)`` into long (units, ticks)."""
    # scale > 6 would fall below Spark's minimum adjusted scale in the final
    # rescaling division and silently round; every engine call site uses <= 6.
    assert 0 < scale <= 6, f"exact-sum scale must be in (0, 6], got {scale}"
    unit = 10**scale
    d = c.cast(f"decimal({scale + 8},{scale})")
    ticks = F.floor(d.cast("double") * F.lit(float(unit)) + F.lit(0.5))
    hi = d.cast("bigint")
    lo = ticks - hi * F.lit(unit)
    return hi, lo, unit


def _exact_combine(sum_hi: F.Column, sum_lo: F.Column, unit: int, scale: int) -> F.Column:
    """Recombine summed (units, ticks) exactly in decimal(38,6) arithmetic.

    The cast scale is pinned at 6 (not ``scale``) on purpose: 6 is the
    exactness floor for every admissible ``scale`` - 10^scale ticks are
    representable at scale 6 whenever scale <= 6, and 6 is also Spark's
    minimum adjusted scale for the rescaling division, so a smaller cast
    scale buys nothing and a larger one breaks the division. The assert
    makes the coupling to _exact_parts' (0, 6] domain explicit here rather
    than relying on the caller's assert alone.
    """
    assert 0 < scale <= 6, f"exact-combine scale must be in (0, 6], got {scale}"
    return sum_hi.cast("decimal(38,6)") + sum_lo.cast("decimal(38,6)") / F.lit(unit)


def dsum(col: str | F.Column, alias: str, scale: int = 6) -> F.Column:
    """Exact distributed sum of a double column.

    Routes through scaled-integer arithmetic (see :func:`_exact_sum`) so
    partial-aggregate ordering cannot change the result vs a sequential
    oracle; final cast back to double is exact on both engines. Oracle side
    mirror: ``cast(sum(cast(x as decimal(25,S))) as double)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return _exact_sum(c, scale).cast("double").alias(alias)


def dsum_wide(col: str | F.Column, alias: str, scale: int = 6) -> F.Column:
    """Wide-decimal exact sum (the slow path :func:`dsum` replaced).

    Kept for values outside dsum's |x| < 10^8 domain and as the in-engine
    oracle for tests/test_exact_sum.py's equivalence property.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double").alias(alias)


def davg(col: str | F.Column, alias: str, scale: int = 6) -> F.Column:
    """Exact-sum average: decimal sum / count, deterministic on both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return (_exact_sum(c, scale).cast("double") / F.count(c)).alias(alias)


# NOTE: no windowed variant of the hi/lo split exists on purpose - a window
# emits one result per ROW, so the decimal(38,6) recombine would execute per
# row and cost more than the wide-decimal frame accumulator it replaces
# (measured at 100x on win_running_sum: 2.9 s split vs 2.4 s wide).


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
