"""Sampling, sharding + TRANSFORM (SURVEY.md section 2-B/2-C).

``tablesample_rows`` is rows-only (Spark's seeded sampler membership is
engine-specific); every other op here uses deterministic md5-cutoff
membership and carries an exact oracle - the reproducible-sampling
discipline a training pipeline needs at scale."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import register, tbl


@register("tablesample_rows")  # rows-only: sample membership is engine-specific
def tablesample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE (x PERCENT) / (n ROWS): seeded Bernoulli sample + LIMIT.

    Membership depends on Spark's XORShift sampler, so this id is rows-only;
    :func:`sample_hash_bernoulli` is the oracle-checked twin covering the
    sampling capability with engine-independent membership.
    """
    li = tbl(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    ).limit(500)


_HASH_SAMPLE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substr(md5(l_orderkey || '-' || l_linenumber), 1, 2) <= '19'
"""


@register("sample_hash_bernoulli", oracle=_HASH_SAMPLE_ORACLE)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% Bernoulli sample: keep rows whose md5(key) prefix
    falls under a lexicographic cutoff ('00'..'19' = 26/256 = 10.16%).

    This is the sampling discipline a reproducible training pipeline wants at
    100 TB: membership is a pure function of the row key - stable across
    engines, partitionings, retries, and re-runs (Spark's seeded sampler is
    none of those: its XORShift stream is positional per partition). Plan
    shape: an embarrassingly parallel per-row filter on the scan, no shuffle,
    no RNG state; the md5 stays in whole-stage codegen.
    """
    li = tbl(spark, sf_dir, "lineitem")
    key_hash = F.md5(F.concat_ws("-", "l_orderkey", "l_linenumber"))
    return li.filter(F.substring(key_hash, 1, 2) <= "19").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


_STRAT_HASH_ORACLE = """
SELECT doc_id, lang, source
FROM documents
WHERE substr(md5(cast(doc_id as varchar)), 1, 2) <=
      CASE WHEN ord(lang) % 2 = 0 THEN '7f' ELSE '3f' END
"""


@register("sample_stratified_hash", oracle=_STRAT_HASH_ORACLE)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: per-stratum hash cutoffs (even-byte
    langs keep 128/256 = 50%, odd keep 64/256 = 25%) - the mixture-rebalancing
    primitive (oracle-checked twin of ``ext_sample_stratified``).

    Scale shape identical to sampleBy (per-row filter, no shuffle), but
    membership is engine- and run-independent: downstream epochs, ablations,
    and incremental rebuilds see the same sample. Cutoffs-per-stratum is a
    tiny CASE (broadcast map at scale); no RNG, no driver collect.
    """
    d = tbl(spark, sf_dir, "documents")
    cutoff = F.when(F.ascii("lang") % 2 == 0, "7f").otherwise("3f")
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= cutoff
    return d.filter(keep).select("doc_id", "lang", "source")


_MIXTURE_ORACLE = """
WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
m AS (SELECT min(n_lang) AS min_n FROM c),
f AS (SELECT lang, greatest((min_n * 256) // n_lang, 1) AS cutoff FROM c, m)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN f USING (lang)
WHERE substr(md5(cast(d.doc_id as varchar)), 1, 2) <= printf('%02x', cutoff - 1)
"""


@register("ext_domain_mixture", oracle=_MIXTURE_ORACLE)
def ext_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: downsample each language toward the rarest
    language's share (the domain-reweighting step of every pretraining data
    recipe - target mixture proportions, not whatever the crawl yielded).

    Two passes over the corpus: (1) per-stratum counts (a 5-row aggregate),
    (2) a per-row deterministic hash filter against the stratum's cutoff.
    Keep-fractions become integer cutoffs in [1, 256] computed with integer
    division - ``(min_n * 256) div n_lang`` - so both engines (and any two
    cluster runs) agree bit-for-bit; membership is md5-prefix vs cutoff,
    reproducible across engines/partitionings/retries like
    :func:`sample_hash_bernoulli`. The cutoff table is broadcast (one row
    per stratum); no shuffle touches the corpus itself. At 100 TB the count
    pass amortizes over a metastore/ANALYZE stats read or a sketch.
    """
    d = tbl(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    min_n = counts.agg(F.min("n_lang").alias("min_n"))
    cutoffs = counts.crossJoin(F.broadcast(min_n)).select(
        "lang",
        F.expr("greatest((min_n * 256) div n_lang, 1L)").alias("cutoff"),
    )
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) <= F.format_string(
        "%02x", (F.col("cutoff") - 1).cast("int")
    )
    return (
        d.join(F.broadcast(cutoffs), "lang")
        .filter(keep)
        .select("doc_id", "lang", "source")
    )


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


_SHARD_ORACLE = """
WITH h AS (
  SELECT doc_id, md5(cast(doc_id as varchar)) AS hx FROM documents
)
SELECT doc_id,
       cast((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) % 8 as int) AS shard_id,
       cast(row_number() OVER (
         PARTITION BY (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) % 8
         ORDER BY hx, doc_id
       ) as bigint) AS rank_in_shard
FROM h
"""


@register("ext_corpus_shuffle_shard", oracle=_SHARD_ORACLE)
def ext_corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle + shard assignment: the write-side of
    every pretraining data build (randomize example order, split into N
    shard files, reproducibly).

    shard_id = first md5 hex digit mod 8; rank_in_shard = row_number ordered
    by the full hash WITHIN the shard. Both are pure functions of the row
    key, so a rebuild (or another engine) produces the identical layout.
    Scale shape: no GLOBAL row_number (a single-partition sort bottleneck) -
    the window partitions by shard_id, so each shard sorts independently;
    at 100 TB that is one shuffle into N shard groups, each sorted in
    parallel, exactly the physical layout the shard writer needs.
    """
    d = tbl(spark, sf_dir, "documents")
    from pyspark.sql import Window

    h = d.select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("hx"))
    digit = (F.expr("instr('0123456789abcdef', substr(hx, 1, 1))") - 1) % 8
    w = Window.partitionBy("shard_id").orderBy("hx", "doc_id")
    return (
        h.withColumn("shard_id", digit.cast("int"))
        .withColumn("rank_in_shard", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard_id", "rank_in_shard")
    )
