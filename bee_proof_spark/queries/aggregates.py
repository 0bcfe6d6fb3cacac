"""Aggregations (SURVEY.md section 2-B): GROUP BY, DISTINCT aggregates,
HAVING, statistics, collect, ROLLUP/CUBE/GROUPING SETS, approximate sketches.

Scale posture: every query here is partial+final HashAggregate (map-side
combine) on a low-cardinality key - shuffle volume is O(groups x partitions),
not O(rows). Statistics are computed from exact decimal power sums on BOTH
engines so distributed merge order cannot drift the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import davg, dsum, o_davg, o_dsum, register, tbl


@register(
    "agg_basic",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS cnt_all,
           count(nullif(l_discount, 0.0)) AS cnt_nonzero_disc,
           {o_dsum('l_quantity')} AS sum_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           {o_davg('l_quantity')} AS avg_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(*) vs count(col) null-skip, sum/min/max/avg."""
    li = tbl(spark, sf_dir, "lineitem")
    disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("cnt_all"),
        F.count(disc).alias("cnt_nonzero_disc"),
        dsum("l_quantity", "sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        davg("l_quantity", "avg_qty"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_suppkey) AS nd_supp
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("nd_supp"))
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS nd_supp,
           count(DISTINCT l_partkey) AS nd_part,
           cast(sum(DISTINCT cast(l_quantity as decimal(25,6))) as double) AS sum_d_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one query (Catalyst expands the plan)."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("nd_supp"),
        F.countDistinct("l_partkey").alias("nd_part"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_d_qty"),
    )


@register(
    "agg_having",
    oracle=f"""
    SELECT l_suppkey, {o_dsum('l_quantity')} AS sum_qty, count(*) AS cnt
    FROM lineitem GROUP BY l_suppkey
    HAVING {o_dsum('l_quantity')} > 1000 AND count(*) > 10
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(dsum("l_quantity", "sum_qty"), F.count(F.lit(1)).alias("cnt"))
        .filter((F.col("sum_qty") > 1000) & (F.col("cnt") > 10))
    )


# Exact power-sum statistics: identical formulas on identical exact inputs on
# both engines => bit-identical doubles. x and x^2 fit decimal(25,6)/(38,8).
_STATS_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         count(*) AS n,
         cast(sum(cast(l_quantity as decimal(25,6))) as double) AS s1,
         cast(sum(cast(l_quantity * l_quantity as decimal(25,6))) as double) AS s2,
         cast(sum(cast(l_extendedprice as decimal(25,6))) as double) AS p1,
         cast(sum(cast(l_quantity * l_extendedprice as decimal(25,6))) as double) AS qp
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       round(sqrt((s2 - s1 * s1 / n) / n), 4) AS stddev_pop_qty,
       round(sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS stddev_samp_qty,
       round((s2 - s1 * s1 / n) / n, 4) AS var_pop_qty,
       round((s2 - s1 * s1 / n) / (n - 1), 4) AS var_samp_qty,
       round((qp - s1 * p1 / n) / n, 4) AS covar_pop_qty_price
FROM s
"""


@register("agg_stats", oracle=_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance/covariance via exact decimal power sums (deterministic
    under any partitioning, unlike streaming moment merges)."""
    li = tbl(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(q, "s1"),
        dsum(q * q, "s2"),
        dsum(p, "p1"),
        dsum(q * p, "qp"),
    )
    n, s1, s2, p1, qp = (F.col(c) for c in ("n", "s1", "s2", "p1", "qp"))
    return agg.select(
        "l_returnflag",
        F.round(F.sqrt((s2 - s1 * s1 / n) / n), 4).alias("stddev_pop_qty"),
        F.round(F.sqrt((s2 - s1 * s1 / n) / (n - 1)), 4).alias("stddev_samp_qty"),
        F.round((s2 - s1 * s1 / n) / n, 4).alias("var_pop_qty"),
        F.round((s2 - s1 * s1 / n) / (n - 1), 4).alias("var_samp_qty"),
        F.round((qp - s1 * p1 / n) / n, 4).alias("covar_pop_qty_price"),
    )


@register(
    "agg_collect_sorted",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           array_to_string(list_sort(list(DISTINCT l_linenumber)), ',') AS linenos
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + sort_array (Hive 0.13 collect_set; order normalized).

    Final projection serializes the sorted lists to CSV strings: the driver's
    row-hash comparator cannot hash array cells (r1 CORRECTNESS err), and a
    joined string carries identical information for an order-normalized set.
    """
    li = tbl(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.array_join(
            F.sort_array(F.collect_set("l_linenumber")).cast("array<string>"), ","
        ).alias("linenos"),
    )


@register(
    "agg_global",
    oracle=f"""
    SELECT count(*) AS cnt, {o_dsum('l_extendedprice')} AS total_price,
           max(l_shipdate IS NULL) AS any_null_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate without GROUP BY (single global group). any_null_ship is
    max() over the null flags - booleans order false < true, so max is the
    ANY quantifier (min would be ALL, the inverted semantics a review
    caught mirrored in both engines)."""
    li = tbl(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_extendedprice", "total_price"),
        F.max(F.col("l_shipdate").isNull()).alias("any_null_ship"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.grouping("l_returnflag").alias("g_flag"),
        F.grouping("l_linestatus").alias("g_status"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with per-column grouping() (portable across the Hive
    grouping__id bit-order change - SURVEY.md section 2-B note)."""
    li = tbl(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS cnt,
               grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           true AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (Hive `percentile`, linear interpolation = DuckDB
    quantile_cont) plus percentile_approx checked against it.

    The sketch estimate itself is engine-specific (GK summaries, merge-order
    dependent), so the oracle-checkable form is an INVARIANT: the approximate
    p50 must land within its accuracy bound of the exact p50 (0.1% of the
    group's value range at accuracy=1000 - 2% of p50 is generous). Exact
    percentile collects a per-group value map - fine on grouped numeric data,
    while percentile_approx stays the 100 TB path.

    The three quantiles come from ONE array-form percentile, not three
    scalar aggregates: each scalar `percentile` builds and exchange-ships
    its own copy of the per-group value buffer, so the buffer cost (which
    dominates this operator) triples for no reason. Measured at sf0.1:
    3x scalar 2.27 s vs array-form 1.07 s for the identical three values;
    full operator 4.25 -> ~1.6 s.
    """
    li = tbl(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile(
            "l_extendedprice", F.array(F.lit(0.25), F.lit(0.50), F.lit(0.75))
        ).alias("e"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("a50"),
    )
    return agg.select(
        "l_returnflag",
        F.round(F.col("e")[0], 4).alias("p25"),
        F.round(F.col("e")[1], 4).alias("p50"),
        F.round(F.col("e")[2], 4).alias("p75"),
        (F.abs(F.col("a50") - F.col("e")[1]) <= 0.02 * F.col("e")[1]).alias(
            "approx_ok"
        ),
    )


@register(
    "agg_approx_cd",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part, true AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_cd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) checked as an invariant: the estimate
    must land within 15% of the exact distinct count (default rsd is 5%, so
    the bound has 3x slack). The HLL register merge is commutative, so the
    boolean is partition-order stable; the estimate value itself is
    engine-specific and never compared directly.
    """
    li = tbl(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("nd_part"),
        F.approx_count_distinct("l_partkey").alias("a_nd"),
    )
    return agg.select(
        "l_returnflag",
        "nd_part",
        (F.abs(F.col("a_nd") - F.col("nd_part")) <= 0.15 * F.col("nd_part")).alias(
            "approx_ok"
        ),
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT l_returnflag,
           cast(floor((l_extendedprice - 900.0) / 10500.0) as int) AS bucket,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram_numeric equivalent as a deterministic fixed-width histogram
    (bucket arithmetic is IEEE-exact, so this upgrades to a sql oracle)."""
    li = tbl(spark, sf_dir, "lineitem")
    bucket = F.floor((F.col("l_extendedprice") - 900.0) / 10500.0).cast("int")
    return li.groupBy("l_returnflag", bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "agg_skew_salted",
    oracle="""
    SELECT event_type, count(*) AS n_events,
           cast(sum(cast(value as decimal(25,6))) as double) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant aggregation by salting: a hot grouping key is split
    across 16 salt sub-keys (stage 1, uniform shuffle), then recombined
    (stage 2, one row per (key, salt) in flight).

    Scale notes: events.event_type has a 5-value domain - the textbook skewed
    shuffle. Salting bounds any single reducer's input at 1/16 of the hottest
    key; the stage-2 shuffle moves at most keys*16 rows. pmod (not %) keeps
    the salt in [0,16): signed % of a signed xxhash64 would spread over 31
    residues with bucket 0 double-weighted, quietly halving each bucket's
    stated share. Result is provably identical to the direct groupBy (the
    oracle checks it); decimal partial sums keep the recombine exact.
    """
    e = tbl(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    stage1 = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum(F.col("value").cast("decimal(25,6)")).alias("ps"),
    )
    return stage1.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"),
        F.sum("ps").cast("double").alias("sum_value"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_linestatus = 'F') AS status_f,
           count(*) FILTER (WHERE l_linestatus = 'O') AS status_o,
           cast(sum(cast(l_quantity as decimal(25,6))) FILTER (WHERE l_linestatus = 'F') as double) AS qty_f,
           cast(sum(cast(l_quantity as decimal(25,6))) FILTER (WHERE l_linestatus = 'O') as double) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): groupBy().pivot() with explicit pivot values.

    Scale notes: explicit pivot values skip the extra distinct-values job
    Spark otherwise runs; the pivot compiles to one hash aggregate with
    conditional aggregation columns (the CASE/FILTER form the oracle uses).
    """
    li = tbl(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(25,6)")).cast("double").alias("qty"),
        )
    )
    # PivotFirst's missing-cell default is NULL; a COUNT of an empty cell
    # must be 0 (the oracle's FILTER form already is). The fixture covers
    # all 6 (flag, status) combos, which would mask this - but spec-faithful
    # TPC-H data has structurally empty (R,O)/(A,O) cells. Sums stay NULL:
    # SUM over an empty set is NULL in both engines.
    return p.select(
        "l_returnflag",
        F.coalesce(F.col("F_n"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("status_o"),
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
    )


@register(
    "agg_listagg",
    oracle="""
    SELECT c_mktsegment,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer WHERE c_custkey < 100
    GROUP BY c_mktsegment
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG ... WITHIN GROUP (Spark 4.0): ordered string aggregation -
    the ANSI successor to collect_list + array_join (see agg_collect_sorted)
    with the ordering declared in the aggregate itself.
    """
    from bee_proof_spark.queries import register_views

    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_mktsegment,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer WHERE c_custkey < 100 GROUP BY c_mktsegment
        """
    )


_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderstatus,
         count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
         count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'urgent' AS priority, urgent AS n FROM wide
UNION ALL
SELECT o_orderstatus, 'low', low FROM wide
"""


@register("agg_unpivot", oracle=_UNPIVOT_ORACLE)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (Spark 3.4+): wide-to-long melt, the inverse of agg_pivot.
    The oracle expresses the same melt as a portable UNION ALL.

    Scale notes: unpivot is a per-row expand (stack) - no shuffle beyond
    the feeding aggregate; output rows = input rows x melted columns.
    """
    orders = tbl(spark, sf_dir, "orders")
    wide = orders.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("urgent"),
        F.count(F.when(F.col("o_orderpriority") == "5-LOW", 1)).alias("low"),
    )
    return wide.unpivot(
        ["o_orderstatus"], ["urgent", "low"], "priority", "n"
    )


_HLL_MERGE_ORACLE = """
SELECT cast(count(DISTINCT o_custkey) as bigint) AS exact_distinct,
       true AS within_5pct
FROM orders
"""


@register("agg_hll_sketch_merge", oracle=_HLL_MERGE_ORACLE)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Spark 3.5 datasketches): per-status customer
    sketches union into a global estimate WITHOUT re-touching the data -
    the re-aggregatable rollup primitive (daily sketches -> monthly rollup)
    that plain count(DISTINCT) cannot provide at 100 TB.

    Invariant oracle: the output carries the EXACT distinct count plus a
    within-5% flag for the merged estimate; the oracle asserts the exact
    value and that the estimate quality bound holds (the sketch estimate
    itself is implementation-specific, so it is checked, not emitted).
    """
    orders = tbl(spark, sf_dir, "orders")
    per_status = orders.groupBy("o_orderstatus").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    merged = per_status.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    exact = orders.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_distinct",
        (
            F.abs(F.col("est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("within_5pct"),
    )


@register(
    "agg_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           cast(grouping(l_returnflag) as int) AS g_flag,
           cast(grouping(l_linestatus) as int) AS g_status,
           cast(grouping(l_returnflag) * 2 + grouping(l_linestatus) as bigint) AS gid,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() / grouping_id() over ROLLUP: the functions that let a
    consumer tell a real NULL group from a subtotal row (Hive 0.13 surface;
    every BI rollup sheet depends on them). The oracle derives grouping_id
    from the per-column grouping bits (same bit order in both engines).
    """
    li = tbl(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
    ).select("l_returnflag", "l_linestatus", "g_flag", "g_status", "gid", "n")
