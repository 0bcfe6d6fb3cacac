"""Equivalence proofs for the scaled-integer exact sum (queries._exact_sum).

dsum's hi/lo long-split must be BIT-IDENTICAL to the wide-decimal sum it
replaced (dsum_wide) for ANY double input - including negatives (TPC-H Q9
profit terms), values within an ulp of 6th-decimal rounding boundaries,
sub-tick magnitudes, NULLs, and NaN. That property gates the optimization.

Oracle (DuckDB) agreement is asserted separately on the money-grid domain
(values with <= 3 decimal places, like every fixture money/quantity column):
at exact-half 6dp boundaries the two ENGINES' double->decimal casts already
disagree in principle (Spark rounds the shortest-repr string, DuckDB the
binary value), independent of how the sum is then computed - the curated
oracles avoid that by construction, and so does this test's oracle leg.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401  (parity with query modules)
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from bee_proof_spark.queries import davg, dsum, dsum_wide, o_davg, o_dsum

SCHEMA = StructType(
    [StructField("g", StringType()), StructField("x", DoubleType())]
)


def _agg_both(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["g"]: r
        for r in df.groupBy("g")
        .agg(
            dsum("x", "fast"),
            dsum_wide("x", "wide"),
            davg("x", "avg"),
            (dsum_wide("x", "_ws").cast("double") / F.count("x")).alias("wide_avg"),
        )
        .collect()
    }


def _duck_agg(rows, agg_sql: str) -> dict:
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t (g VARCHAR, x DOUBLE)")
        if rows:
            con.executemany("INSERT INTO t VALUES (?, ?)", rows)
        return dict(
            con.execute(f"SELECT g, {agg_sql} FROM t GROUP BY g").fetchall()
        )
    finally:
        con.close()


# Any-double domain: money magnitudes, exact ticks, HALF_UP boundary ticks,
# products' binary noise, sub-tick values, NULLs.
_adversarial = st.one_of(
    st.floats(-2e5, 2e5, allow_nan=False, allow_infinity=False),
    st.integers(-2_000_000_000, 2_000_000_000).map(lambda t: t / 1e6),
    st.integers(-200, 200).map(lambda t: t + 5e-7),  # 6dp half-tick zone
    st.floats(-1e-6, 1e-6, allow_nan=False),
    st.just(None),
)

# Fixture-like domain: <= 3 decimal places, far from 6dp rounding boundaries.
_money_grid = st.one_of(
    st.integers(-200_000_000, 200_000_000).map(lambda t: t / 1e3),
    st.just(None),
)


@given(st.lists(st.tuples(st.sampled_from("abc"), _adversarial), max_size=60))
@settings(max_examples=30, deadline=None, derandomize=True)
def test_fast_sum_bit_identical_to_wide_decimal(spark, rows):
    for g, r in _agg_both(spark, rows).items():
        assert r["fast"] == r["wide"], (g, r["fast"], r["wide"])
        assert r["avg"] == r["wide_avg"], (g, r["avg"], r["wide_avg"])


@given(st.lists(st.tuples(st.sampled_from("ab"), _money_grid), max_size=40))
@settings(max_examples=20, deadline=None, derandomize=True)
def test_fast_sum_matches_duckdb_on_money_grid(spark, rows):
    got = _agg_both(spark, rows)
    oracle_sum = _duck_agg(rows, o_dsum("x"))
    oracle_avg = _duck_agg(rows, o_davg("x"))
    assert set(got) == set(oracle_sum)
    for g, r in got.items():
        assert r["fast"] == oracle_sum[g], (g, r["fast"], oracle_sum[g])
        assert r["avg"] == oracle_avg[g], (g, r["avg"], oracle_avg[g])


def test_fast_sum_skips_nan_like_wide(spark):
    got = _agg_both(
        spark, [("a", 1.25), ("a", float("nan")), ("a", None), ("a", -2.5)]
    )["a"]
    assert got["fast"] == got["wide"] == -1.25


def test_fast_sum_all_null_group_is_null(spark):
    got = _agg_both(spark, [("a", None), ("a", None)])["a"]
    assert got["fast"] is None and got["wide"] is None


def test_exact_sum_rejects_unsupported_scale():
    with pytest.raises(AssertionError):
        dsum("x", "s", scale=7)


def test_fast_sum_raises_on_out_of_domain_input(spark):
    """|x| >= 10^8 overflows the compact cast to NULL; the guard must fail
    LOUDLY instead of silently dropping the row from the sum (the wide cast
    would have kept it, so silence here is a wrong answer)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = (
        spark.createDataFrame([("a", 1.0), ("a", 2.5e8)], SCHEMA)
        .groupBy("g")
        .agg(dsum("x", "s"))
    )
    with pytest.raises(SparkRuntimeException, match="exact-sum domain"):
        df.collect()


def test_fast_sum_in_domain_not_tripped_by_guard(spark):
    """Values just inside the domain boundary pass the guard untouched."""
    got = _agg_both(spark, [("a", 99_999_999.999), ("a", -99_999_999.999)])["a"]
    assert got["fast"] == got["wide"] == 0.0


def test_fast_sum_plan_has_no_wide_decimal_accumulator(spark):
    """The point of the rewrite: no sum over a >18-digit decimal (which
    forces the BigDecimal/byte-buffer aggregation path) may appear."""
    df = (
        spark.createDataFrame([("a", 1.0)], SCHEMA)
        .groupBy("g")
        .agg(dsum("x", "s"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the wide path shows up as sum over decimal(25,6) with a decimal(35,6)
    # accumulator; neither may appear anywhere in the fast plan
    assert "decimal(25," not in plan and "decimal(35," not in plan, plan
