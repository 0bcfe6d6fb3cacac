"""Text-analysis operators for training-data pipelines (north star):
word count, per-lang/source stats, token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All JVM-side (split/explode/regexp/aggregate) - no Python in any hot path;
ratios are count-based so the oracles are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bee_proof_spark.queries import davg, o_davg, register, spread_scan, tbl

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


@register(
    "ext_text_wordcount",
    oracle="""
    SELECT word, count(*) AS freq FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) GROUP BY word
    """,
)
def ext_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + global word frequency (split -> explode -> hash agg;
    partial aggregation makes the shuffle proportional to vocabulary)."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


@register(
    "ext_text_stats",
    oracle=f"""
    SELECT lang, source, count(*) AS n_docs,
           {o_davg('n_chars')} AS avg_chars,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang/source doc stats (counts + length distribution). The avg
    routes through davg/o_davg (n_chars is non-null, so count(n_chars) ==
    count(*)) - the scaled-integer exact path, not the slow wide-decimal
    accumulator it replaced."""
    d = tbl(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("n_chars", "avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "ext_text_tokens",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_ish_tokens,
           cast(ceil(n_chars / 4.0) as bigint) AS est_tokens
    FROM documents
    """,
)
def ext_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, a BPE-ish regex token count, and
    the chars/4 estimator used for budget accounting."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr(r"regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"))
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.ceil(F.col("n_chars") / 4.0).alias("est_tokens"),
    )


_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_words,
         len(list_filter(string_split(text, ' '),
             w -> list_contains({list(STOPWORDS)!r}, w))) AS n_stop,
         len(list_filter(string_split(text, ' '), w -> len(w) >= 7)) AS n_long
  FROM documents
)
SELECT doc_id, n_words,
       round(n_chars / n_words, 4) AS avg_word_len,
       round(n_stop / n_words, 4) AS stopword_ratio,
       round(n_long / n_words, 4) AS long_word_ratio,
       (n_words >= 20 AND n_stop / n_words > 0.05) AS passes_quality
FROM t
"""


@register("ext_text_quality", oracle=_QUALITY_ORACLE)
def ext_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / stopword-ratio / word-shape heuristics with
    a pass flag (count-based arithmetic -> exact oracle)."""
    d = tbl(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_lit = ",".join(f"'{w}'" for w in STOPWORDS)
    n_words = F.size(words)
    n_stop = F.size(F.expr(f"filter(split(text, ' '), w -> array_contains(array({stop_lit}), w))"))
    n_long = F.size(F.expr("filter(split(text, ' '), w -> length(w) >= 7)"))
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(F.col("n_chars") / n_words, 4).alias("avg_word_len"),
        F.round(n_stop / n_words, 4).alias("stopword_ratio"),
        F.round(n_long / n_words, 4).alias("long_word_ratio"),
        ((n_words >= 20) & (n_stop / n_words > 0.05)).alias("passes_quality"),
    )


_LANGID_ORACLE = f"""
WITH s AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '),
             w -> list_contains({list(STOPWORDS)!r}, w))) AS score_en,
         len(list_filter(string_split(text, ' '),
             w -> list_contains(['der','die','das','und','ist'], w))) AS score_de,
         len(list_filter(string_split(text, ' '),
             w -> list_contains(['le','la','et','les','des'], w))) AS score_fr,
         len(list_filter(string_split(text, ' '),
             w -> list_contains(['el','los','las','una','que'], w))) AS score_es,
         0 AS score_zh
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN greatest(score_en, score_de, score_fr, score_es, score_zh) > 0
            THEN CASE greatest(score_en, score_de, score_fr, score_es, score_zh)
                 WHEN score_en THEN 'en' WHEN score_de THEN 'de'
                 WHEN score_fr THEN 'fr' WHEN score_es THEN 'es' ELSE 'zh' END
            ELSE 'und' END AS pred_lang,
       greatest(score_en, score_de, score_fr, score_es, score_zh) AS best_score
FROM s
"""


@register("ext_text_langid", oracle=_LANGID_ORACLE)
def ext_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram heuristic: score against per-language marker sets
    (character trigram/stopword evidence), pick argmax.

    The fixture text is synthetic English-vocabulary soup, so the honest
    output includes both the declared lang label and the prediction.
    """
    d = tbl(spark, sf_dir, "documents")
    markers = {
        "en": STOPWORDS,
        "de": ("der", "die", "das", "und", "ist"),
        "fr": ("le", "la", "et", "les", "des"),
        "es": ("el", "los", "las", "una", "que"),
        "zh": (),  # no-latin marker - falls through to default score
    }
    scores = [
        F.size(
            F.expr(
                "filter(split(text, ' '), w -> array_contains(array("
                + ",".join(f"'{m}'" for m in ms)
                + "), w))"
            )
        ).alias(f"score_{lang}")
        if ms
        else F.lit(0).alias(f"score_{lang}")
        for lang, ms in markers.items()
    ]
    scored = d.select("doc_id", "lang", *scores)
    langs = list(markers)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lg}") == best, F.lit(lg)) for lg in langs],
        F.lit("und"),
    )
    return scored.select(
        "doc_id",
        "lang",
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("pred_lang"),
        best.alias("best_score"),
    )


_FP_ORACLE = """
SELECT doc_id,
       md5(array_to_string(list_sort(list(DISTINCT word)), ' ')) AS fingerprint
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY doc_id
"""


@register("ext_text_fingerprint", oracle=_FP_ORACLE)
def ext_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct word set -
    word-order-insensitive content identity for shuffle-cheap exact-dup
    detection across reorderings.

    Scale shape: ZERO shuffles. The distinct word set lives inside the row
    (it is a subset of the row's own words), so
    array_sort(array_distinct(split(...))) computes it per row in one
    codegen'd scan - the original explode -> distinct -> collect_set
    formulation shuffled the entire exploded corpus TWICE to rebuild what
    each row already held (measured at 1000x/5M docs: 14.9 s shuffled vs
    3.2 s per-row; at 100 TB the difference is a scan job vs two
    corpus-wide exchanges)."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(F.split("text", " ")))
            ).cast("binary")
        ).alias("fingerprint"),
    )


_PII_ORACLE = r"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           concat(text, ' contact: user', cast(doc_id as varchar),
                  '@example.com or +1-555-', lpad(cast(doc_id % 10000 as varchar), 4, '0')),
           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
         '\+?[0-9]{1,2}[-. ]?[0-9]{3}[-. ]?[0-9]{4}', '<PHONE>', 'g') AS scrubbed
FROM documents
"""


@register("ext_text_pii_scrub", oracle=_PII_ORACLE)
def ext_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: email/phone redaction via chained JVM regexp_replace
    (the fixture text has no PII, so deterministic synthetic PII is appended
    per row first - the oracle mirrors the construction).

    Scale notes: pure per-row regex in whole-stage codegen; at 100 TB this
    is an embarrassingly parallel scan with zero shuffle.
    """
    d = tbl(spark, sf_dir, "documents")
    with_pii = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            with_pii,
            r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
            "<EMAIL>",
        ),
        r"\+?[0-9]{1,2}[-. ]?[0-9]{3}[-. ]?[0-9]{4}",
        "<PHONE>",
    )
    return d.select("doc_id", scrubbed.alias("scrubbed"))


@register("ext_sample_stratified")  # rows-only: sampling is engine-specific
def ext_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling by lang (seeded sampleBy): the rebalancing
    primitive for skewed training mixtures.

    Scale notes: sampleBy is a per-row Bernoulli filter - no shuffle, no
    collect; fractions per stratum are a tiny broadcast map.
    """
    d = tbl(spark, sf_dir, "documents")
    langs = [r["lang"] for r in d.select("lang").distinct().collect()]  # driver-ok: tiny stratum-key fetch
    fractions = {lg: (0.5 if i % 2 == 0 else 0.25) for i, lg in enumerate(sorted(langs))}
    return d.sampleBy("lang", fractions, seed=42).select("doc_id", "lang", "source")


_NGRAM_ORACLE = """
WITH words AS (
  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
),
bigrams AS (
  SELECT lang,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i + 1])) AS bigram
  FROM words
),
counted AS (
  SELECT lang, bigram, count(*) AS freq FROM bigrams GROUP BY lang, bigram
),
ranked AS (
  SELECT lang, bigram, freq,
         row_number() OVER (PARTITION BY lang ORDER BY freq DESC, bigram) AS rnk
  FROM counted
)
SELECT lang, bigram, freq, rnk FROM ranked WHERE rnk <= 5
"""


@register("ext_text_topk_ngrams", oracle=_NGRAM_ORACLE)
def ext_text_topk_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language: n-gram generation JVM-side
    (transform over index sequence), hash-agg counts, WindowGroupLimit
    top-k per group. Total tie-break (freq desc, bigram asc) keeps the
    oracle exact.
    """
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    # Split ONCE per row into a materialized array column; referencing ws
    # inside the lambda reads that array. Inlining split(text, ' ') in the
    # lambda re-tokenizes the whole document for EVERY bigram index -
    # O(words^2) character work per doc (measured 3.1 s -> 1.0 s at sf0.1).
    words = d.select("lang", F.split("text", " ").alias("ws"))
    # The >=2-word guard must be a row filter: sequence(1, greatest(n-1, 0))
    # DESCENDS ([1, 0]) for 1-word docs, emitting spurious half-bigrams
    # (the oracle's generate_series(1, 0) is empty).
    bigrams = words.filter(F.size("ws") >= 2).select(
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat_ws(' ', ws[i - 1], ws[i]))"
            )
        ).alias("bigram"),
    )
    counted = bigrams.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("bigram"))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "bigram", "freq", "rnk")
    )


_REPETITION_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
bigrams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 1),
                               i -> ws[i] || ' ' || ws[i + 1])) AS bg
  FROM words
)
SELECT doc_id,
       cast(count(*) as bigint) AS n_bigrams,
       cast(count(DISTINCT bg) as bigint) AS n_unique,
       round(1.0 - count(DISTINCT bg) / count(*), 4) AS dup_ratio,
       (1.0 - count(DISTINCT bg) / count(*) <= 0.8) AS keep
FROM bigrams GROUP BY doc_id
"""


@register("ext_repetition_ratio", oracle=_REPETITION_ORACLE)
def ext_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filter signal (Gopher/MassiveText-style): fraction of
    duplicate word-bigrams per document - heavily repetitive docs (boiler-
    plate, generation loops) score high and get filtered before training.

    Scale shape: ZERO shuffles. A document's bigram multiset lives inside
    its own row, so both counts are per-row array expressions
    (size(bigrams) and size(array_distinct(bigrams))) in one codegen'd
    scan. The original explode -> groupBy(doc_id) -> count(DISTINCT)
    shuffled the whole bigram fan-out to rebuild per-row state (measured
    at 1000x/5M docs: 87.4 s shuffled vs 8.2 s per-row, 10.7x; at 100 TB
    that shuffle is the job). Per-row array_distinct memory is bounded by
    the document's own length - the same bound the row itself already
    pays. The keep-threshold (<= 0.8 here) is the recipe knob.
    """
    d = tbl(spark, sf_dir, "documents")
    # Row-filter the >=2-word guard: sequence(1, n-1) DESCENDS ([1, 0])
    # for 1-word docs and element_at(ws, 0) throws; the oracle's
    # generate_series(1, 0) is simply empty.
    words = d.select("doc_id", F.split("text", " ").alias("ws")).filter(
        F.size("ws") >= 2
    )
    bgs = F.expr(
        "transform(sequence(1, size(ws) - 1),"
        " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
    )
    counted = words.select(
        "doc_id",
        F.size(bgs).cast("bigint").alias("n_bigrams"),
        F.size(F.array_distinct(bgs)).cast("bigint").alias("n_unique"),
    )
    ratio = 1.0 - F.col("n_unique") / F.col("n_bigrams")
    return counted.select(
        "doc_id",
        "n_bigrams",
        "n_unique",
        F.round(ratio, 4).alias("dup_ratio"),
        (ratio <= 0.8).alias("keep"),
    )


_TFIDF_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
),
df AS (
  SELECT word, count(*) AS df FROM tf GROUP BY word
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word,
         round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS tfidf
  FROM tf JOIN df USING (word), n
),
ranked AS (
  SELECT doc_id, word, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rnk
  FROM scored
)
SELECT doc_id, word, tfidf, rnk FROM ranked WHERE rnk <= 5
"""


@register("ext_text_tfidf", oracle=_TFIDF_ORACLE)
def ext_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-5 terms per document by smoothed
    tf * ln((N+1)/(df+1)) - the classic relevance/keyword signal for corpus
    curation and retrieval indexing.

    Scale shape: ONE shuffle builds the (doc, word, tf) table, which is
    checkpointed because two genuinely different aggregates consume it (the
    df rollup and the scoring join) - without the barrier, column pruning
    makes the two subtrees non-identical and ReusedExchange cannot fire, so
    the corpus-sized explode+shuffle would silently run twice. The idf map
    joins back by word WITHOUT a broadcast hint: vocabulary is usually small
    enough to auto-broadcast, but a heavy-tailed 100 TB vocabulary must be
    allowed to fall back to a shuffle join instead of hard-failing the 8 GB
    broadcast limit. Ranking happens on the 4dp-ROUNDED score with a word
    tie-break, so cross-engine libm ulp differences in ln() cannot reorder
    the top-k (the repo's float-ranking discipline).
    """
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    tf = (
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df_tbl = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_tbl, "word")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "word", "tfidf", "rnk")
    )


_BOILERPLATE_ORACLE = """
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
grams AS (
  SELECT doc_id, pos, array_to_string(ws[pos:pos + 4], ' ') AS gram
  FROM (SELECT doc_id, ws,
               unnest(generate_series(1, len(ws) - 4)) AS pos
        FROM words)
),
hot AS (
  SELECT gram FROM (
    SELECT gram, count(DISTINCT doc_id) AS df FROM grams GROUP BY gram
  ) WHERE df >= 2
),
cov AS (
  SELECT doc_id, unnest(generate_series(pos, pos + 4)) AS cp
  FROM grams JOIN hot USING (gram)
),
covered AS (
  SELECT doc_id, count(DISTINCT cp) AS n_covered FROM cov GROUP BY doc_id
),
base AS (SELECT doc_id, cast(len(ws) AS bigint) AS n_words FROM words)
SELECT b.doc_id, b.n_words,
       cast(coalesce(c.n_covered, 0) AS bigint) AS n_covered,
       round(coalesce(c.n_covered, 0) / b.n_words, 4) AS dup_span_ratio,
       (coalesce(c.n_covered, 0) / b.n_words <= 0.5) AS keep
FROM base b LEFT JOIN covered c USING (doc_id)
"""


@register("ext_boilerplate_ngrams", oracle=_BOILERPLATE_ORACLE)
def ext_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span coverage (C4/RefinedWeb/Dolma-style
    boilerplate signal): the fraction of each document's words lying inside
    a 5-gram that also occurs in at least one OTHER document. Complements
    `ext_repetition_ratio` (within-doc repetition): together they are the
    two standard repetition axes a pretraining cleanup pass filters on -
    nav bars, cookie banners and license headers score high here long
    before whole-document dedup would catch them.

    Scale shape: the positional 5-gram table is one row per word position -
    the same corpus-token-bounded inverted-index class as the shingle
    postings family (measured there at 100x/1000x, SCALE.md). Its df
    aggregate map-side-combines to one shuffle proportional to the distinct
    gram vocabulary; the hot (df >= 2) slice joins back by gram WITHOUT a
    broadcast hint - at web scale the duplicated-gram set is itself huge,
    so it must be allowed to shuffle-join rather than hard-fail an 8 GB
    broadcast. Covered-position counting exploits that all spans have equal
    length: hit starts are unique per doc, so the interval union is
    5 + sum(min(5, delta-pos)) over a doc_id-keyed window - one doc-keyed
    sort whose groupBy reuses the window's partitioning, replacing a x5
    position explode + per-doc distinct that materialized 5 rows per hit
    BEFORE deduplicating (measured at 1000x/5M docs in the all-hot worst
    case the replica fixture creates: 325 s vs 392 s, and the explode
    variant degraded pass-over-pass under the 1.65e9-row intermediate's
    memory pressure while the window variant held steady; SCALE.md r5).
    Window-over-doc_id is skew-safe here - group size is bounded by
    document length, never by gram popularity.
    """
    from pyspark.sql import Window

    from bee_proof_spark.queries.extensions import _family_checkpoint

    # spread_scan: the positional 5-gram build (split + transform + slice +
    # array_join per word position) is by far the heaviest narrow stage in
    # the bench's text family; over the single-row-group fixture layout it
    # would run on ONE core. Layout-gated no-op on a chunked corpus.
    # Measured: 2.08 -> 0.97 s warm floor (sf0.1, local[32], min-of-4).
    d = spread_scan(spark, sf_dir, "documents", "doc_id")
    words = d.select("doc_id", F.split("text", " ").alias("ws"))

    # The gram table feeds BOTH consumers below (the df aggregate and the
    # hit join), so without materialization the heaviest text stage in the
    # repo is evaluated twice per call (r14 verdict item 5 "residual
    # scale-killer": at 100 TB that doubles the dominant stage). Staged
    # once per (app, corpus) through the family-checkpoint byte gate - the
    # same contract as the shingle-postings family: lazy localCheckpoint
    # below _DISK_STAGE_DOC_BYTES (fused into the first consumer's job;
    # bounded, corpus-token-sized), parquet staging on disk above it (the
    # r14 sf0.1-only UNGATED localCheckpoint rejection stands - the gate is
    # exactly what makes the block-manager liability go away at scale).
    # Measured (sf0.1, local[32], interleaved same-session ABBA A/B with
    # adjacent calibration controls, min-of-6 warm, identical 5000 rows):
    # 1.221 double-eval vs 1.110 staged; two earlier noisier runs split
    # +0.157/-0.122 under 2-3x host episodes (all three recorded in
    # OPTIMIZATION_r15.md). Plan: ONE posexplode gram build (in the
    # staging job) instead of two.
    def build_grams() -> DataFrame:
        # posexplode is 0-based; +1 matches the oracle's 1-based positions.
        return (
            words.filter(F.size("ws") >= 5)
            .select(
                "doc_id",
                F.posexplode(
                    F.expr(
                        "transform(sequence(1, size(ws) - 4),"
                        " i -> array_join(slice(ws, i, 5), ' '))"
                    )
                ).alias("p0", "gram"),
            )
            .select("doc_id", (F.col("p0") + 1).alias("pos"), "gram")
        )

    grams = _family_checkpoint(spark, sf_dir, "grams5", build_grams)
    hot = (
        grams.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 2)
        .select("gram")
    )
    hits = grams.join(hot, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    ncov = (
        hits.withColumn("prev", F.lag("pos").over(w))
        .select(
            "doc_id",
            F.when(F.col("prev").isNull(), F.lit(5))
            .otherwise(F.least(F.lit(5), F.col("pos") - F.col("prev")))
            .alias("add"),
        )
        .groupBy("doc_id")
        .agg(F.sum("add").cast("bigint").alias("n_covered"))
    )
    base = words.select("doc_id", F.size("ws").cast("bigint").alias("n_words"))
    ratio = F.coalesce(F.col("n_covered"), F.lit(0)) / F.col("n_words")
    return base.join(ncov, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.coalesce("n_covered", F.lit(0).cast("bigint")).alias("n_covered"),
        F.round(ratio, 4).alias("dup_span_ratio"),
        (ratio <= 0.5).alias("keep"),
    )
