"""Window functions (SURVEY.md section 2-B; Hive 0.11+, all in the emr-3 pin).

Orderings are made total with unique tie-break keys (o_orderkey) so ranks and
frames are deterministic across engines. Running sums go through decimal for
exactness. Scale posture: one shuffle per distinct partitioning; all functions
over the same Window spec share a single sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bee_proof_spark.queries import register, tbl

#: partition by customer, order by (date, key) - total order within partition.
_W_ORDER = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"


def _orders(spark, sf_dir):
    return tbl(spark, sf_dir, "orders")


def _w():
    return Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")


@register(
    "win_row_number",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           row_number() OVER ({_W_ORDER}) AS rn
    FROM orders
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", F.row_number().over(_w()).alias("rn")
    )


@register(
    "win_rank_dense",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
           dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS drnk
    FROM orders
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "win_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return _orders(spark, sf_dir).select(
        "o_orderkey", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "win_percent_cume",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey), 4) AS pr,
           round(cume_dist() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey), 4) AS cd
    FROM orders
    """,
)
def win_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 4).alias("pr"),
        F.round(F.cume_dist().over(w), 4).alias("cd"),
    )


@register(
    "win_lead_lag",
    oracle=f"""
    SELECT o_orderkey,
           lead(o_totalprice, 1) OVER ({_W_ORDER}) AS next_price,
           lag(o_totalprice, 2, -1.0) OVER ({_W_ORDER}) AS prev2_price
    FROM orders
    """,
)
def win_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w()
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    )


@register(
    "win_first_last",
    oracle=f"""
    SELECT o_orderkey,
           first_value(o_orderkey) OVER ({_W_ORDER}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_ok,
           last_value(o_orderkey) OVER ({_W_ORDER}
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok
    FROM orders
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE with an explicit full frame (the frame-sensitivity
    trap: default frame ends at CURRENT ROW, making last_value = current)."""
    w = _w().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
    )


@register(
    "win_running_sum",
    oracle=f"""
    SELECT o_orderkey,
           cast(sum(cast(o_totalprice as decimal(25,6))) OVER ({_W_ORDER}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_total
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = _w().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Deliberately NOT the hi/lo long-split dsum uses: a window emits one
    # result PER ROW, so the decimal(38,6) recombine would run per row and
    # cost more than the wide-decimal frame accumulator it removes
    # (measured at 100x: 2.9 s split vs 2.4 s wide).
    return _orders(spark, sf_dir).select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "win_range_frame",
    oracle="""
    SELECT o_orderkey,
           count(*) OVER (ORDER BY o_totalprice
             RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    """,
)
def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering (value-based, not row-based).

    Scale shape - banded aggregation, NOT a global window: the direct
    ``Window.orderBy(price).rangeBetween(-5000, 0)`` has no PARTITION BY, so
    Spark sorts the ENTIRE table in one task - measured 225 s at 100x data
    vs 1.8 s at sf0.1 (122x time for 100x rows, and a dead stage at 1000x).
    Because the frame width is a constant 5000, a row's frame can only
    reach rows in its own price band of width 5000 or the one below:
    each row is shipped to its own band (as probe + build) and to the band
    above (build-only ghost), and every band counts its probes' frames
    in-core against a sorted build array (two binary searches per row,
    inclusive bounds exactly as RANGE ... PRECEDING AND CURRENT ROW).
    One shuffle on the band key, O(n log n/band) per band, parallelism =
    number of occupied bands - the count is exact, including order-value
    ties, and integer, so no float-divergence risk vs the oracle."""
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    band = F.floor(F.col("o_totalprice") / F.lit(5000.0)).cast("long")
    probe = o.select(
        "o_orderkey", "o_totalprice", band.alias("band"), F.lit(True).alias("is_probe")
    )
    ghost = o.select(
        "o_orderkey",
        "o_totalprice",
        (band + 1).alias("band"),
        F.lit(False).alias("is_probe"),
    )

    def count_frames(pdf):
        import numpy as np
        import pandas as pd

        prices = pdf["o_totalprice"].to_numpy(dtype="float64")
        build = np.sort(prices)
        probes = pdf[pdf["is_probe"]]
        p = probes["o_totalprice"].to_numpy(dtype="float64")
        hi = np.searchsorted(build, p, side="right")
        lo = np.searchsorted(build, p - 5000.0, side="left")
        return pd.DataFrame(
            {"o_orderkey": probes["o_orderkey"].to_numpy(), "n_in_band": hi - lo}
        )

    return (
        probe.unionByName(ghost)
        .groupBy("band")
        .applyInPandas(count_frames, "o_orderkey long, n_in_band long")
    )


@register(
    "win_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: Catalyst pushes the rn<=k filter into the window sort
    (WindowGroupLimit) so each partition keeps only k rows pre-shuffle."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _orders(spark, sf_dir)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "win_nth_value",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           nth_value(o_totalprice, 3) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_highest
    FROM orders
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a full-frame window: each order sees its customer's
    third-highest order value (NULL for customers with fewer than three) -
    the positional window accessor beyond first/last (win_first_last).
    """
    o = tbl(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 3).over(w).alias("third_highest"),
    )
