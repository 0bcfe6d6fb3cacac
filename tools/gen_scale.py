"""Generate an Nx-scale fixture set under /tmp/sfbig{N} and re-time the
heavy operators against it (the SCALE.md "10x/100x scale probe" evidence).

Replication is semantics-preserving at scale:

- documents: N replicas per doc with REPLICA-SALTED vocabulary (every word
  suffixed `_<rep>`), so replicas share no shingles and the near-dup RATE
  stays constant - a naive copy would make every doc an N-way exact dup and
  quadratically inflate the pair graph, testing nothing real.
- lineitem/orders: order keys remapped `k*N+rep` so join fan-out per key is
  unchanged; customer/part/supplier dims stay as-is (Nx orders/customer is
  a realistic growth axis).
- embeddings: vec_id remapped, deterministic per-replica perturbation so
  vectors are distinct but the space keeps its cluster structure.
- events: user_id/event_id remapped so each replica user replays the
  original user's exact timeline - Nx users, Nx events, per-user session
  and lateness structure unchanged.

Usage:
    python tools/gen_scale.py [--reps N]   # generate + probe (default N=10)
    python tools/gen_scale.py --gen-only   # fixtures only
    python tools/gen_scale.py --probe-only # reuse existing /tmp/sfbig{N}
    python tools/gen_scale.py --emb-realistic  # /tmp/sfemb{10,100,1000}

``--emb-realistic`` writes the planted near-dup embedding decade ladder
(/tmp/sfemb10 = 20k, /tmp/sfemb100 = 200k, /tmp/sfemb1000 = 2M vectors):
isotropic-gaussian vectors (dim 64) with 1% PLANTED near-duplicates
(5% noise -> cosine ~0.999).
The replicated ladder cannot measure near-dup dedup at 1000x: its 1e-4
per-replica perturbation turns every source vector into a reps-strong
cosine clique, so the CORRECT >=0.4 output is itself quadratic (~55B
qualifying pairs at reps=1000) and any probe measures output cardinality,
not algorithm selectivity. A deduplicated web corpus is pair-sparse; the
planted fixture reproduces that (qualifying pairs ~= the 20k planted),
which is the regime the LSH route exists for (SCALE.md r6).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def _parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=10, help="replication factor (default 10)")
    p.add_argument("--gen-only", action="store_true", help="generate fixtures, skip probe")
    p.add_argument("--probe-only", action="store_true", help="probe existing fixtures")
    p.add_argument(
        "--emb-realistic", action="store_true",
        help="write the planted-near-dup decade ladder /tmp/sfemb{10,100,1000} and exit",
    )
    return p.parse_args()


def gen_emb_realistic(dst: str = "/tmp/sfemb1000", n: int = 2_000_000) -> None:
    """Pair-sparse 2M-vector near-dup fixture (module docstring): pure
    numpy/pyarrow, no Spark — one 500 MB file writes in seconds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dup = n // 100  # 1% planted near-dup rows
    rng = np.random.RandomState(77)
    base = rng.standard_normal((n, 64)).astype(np.float32)
    noise = rng.standard_normal((dup, 64)).astype(np.float32) * 0.05
    base[n - dup:] = base[:dup] + noise  # row n-dup+j ~ row j, cosine ~0.999
    labels = rng.randint(0, 100, size=n).astype(np.int32)
    os.makedirs(dst, exist_ok=True)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(base.reshape(-1)), 64
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(labels),
    })
    pq.write_table(t, f"{dst}/embeddings.parquet", row_group_size=200_000)
    print(f"wrote {t.num_rows} vectors -> {dst}", flush=True)


_ARGS = _parse_args()
REPS = _ARGS.reps
# 10x keeps the original path (the SCALE.md 10x table was measured there).
DST = "/tmp/sfbig" if REPS == 10 else f"/tmp/sfbig{REPS}"

#: Probes over the SCALED tables (lineitem, orders, documents, embeddings,
#: events - events replicas carry each source user's exact timeline on Nx
#: the users, so windowed/session/stateful shapes scale on the group axis).
PROBE_QUERIES = [
    "tpch_q1_pricing", "tpch_q3_shipping", "tpch_q9_profit",
    "tpch_q18_large_volume", "agg_basic", "agg_skew_salted",
    "win_topk_per_group", "win_running_sum", "union_distinct",
    "ext_dedup_exact", "ext_text_wordcount", "ext_text_tfidf",
    "ext_text_topk_ngrams", "ext_dedup_fuzzy", "ext_dedup_fuzzy_verified",
    "ext_dedup_cluster", "ext_decontaminate", "ext_knn_cosine",
    "ext_chunk_documents", "ext_pack_sequences",
    "stream_tumbling_batch", "stream_sliding_batch", "stream_session_batch",
    "stream_session_dynamic_gap", "stream_stream_join",
    "stream_foreach_batch_upsert",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    rep = spark.range(REPS).withColumnRenamed("id", "rep")

    def rd(name, parts=32):
        # The sf0.1 fixtures are single parquet files = single-task scans;
        # repartition BEFORE the crossJoin so the Nx explode runs on all
        # cores instead of one task emitting N x |table| rows serially
        # (measured at 1000x: the serial shape crawled at 1 core for 20+
        # minutes on lineitem alone). Pre-explode repartition also fixes the
        # output file count, so the shuffle moves sf0.1-sized input, never
        # the exploded output.
        return spark.read.parquet(f"{SRC}/{name}.parquet").repartition(parts)

    d = rd("documents").crossJoin(F.broadcast(rep)).select(
        (F.col("doc_id") * REPS + F.col("rep")).alias("doc_id"),
        F.array_join(
            F.expr("transform(split(text, ' '), w -> concat(w, '_', rep))"), " "
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    # No post-explode repartition anywhere: the pre-partitioned input gives
    # 32 parallel writers directly, where a repartition here would shuffle
    # the full exploded output (tens of GB at 1000x) for nothing.
    d.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    # 64 parts preserves the layout the SCALE.md 100x probe was measured at
    # (64-file lineitem; the other scaled tables were measured at 32).
    li = rd("lineitem", parts=64).crossJoin(F.broadcast(rep))
    li = li.withColumn("l_orderkey", F.col("l_orderkey") * REPS + F.col("rep")).drop("rep")
    li.write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")
    o = rd("orders").crossJoin(F.broadcast(rep))
    o = o.withColumn("o_orderkey", F.col("o_orderkey") * REPS + F.col("rep")).drop("rep")
    o.write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    e = rd("embeddings").crossJoin(F.broadcast(rep)).select(
        (F.col("vec_id") * REPS + F.col("rep")).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + cast(rep as float) * 1e-4 * cast(i % 7 as float))"
        ).alias("embedding"),
        "label",
    )
    e.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")

    for t in ("region", "nation", "customer", "supplier", "part"):
        # dims copy unscaled; single-file layout is fine at their size
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    # events scales on the user axis: user_id (and event_id, for
    # uniqueness) remap like order keys, so every replica user carries the
    # ORIGINAL user's exact timeline - sessions per user, gaps, and
    # watermark lateness structure are preserved while user cardinality and
    # total event volume grow Nx (the realistic growth axis for a
    # clickstream). ts values are carried through unchanged.
    from bee_proof_spark.queries import tbl

    ev = tbl(spark, SRC, "events")
    ev = ev.repartition(32).crossJoin(F.broadcast(rep)).select(
        (F.col("event_id") * REPS + F.col("rep")).alias("event_id"),
        "ts",
        (F.col("user_id") * REPS + F.col("rep")).alias("user_id"),
        "event_type", "value", "props",
    )
    ev.write.mode("overwrite").parquet(f"{DST}/events.parquet")


def probe(spark) -> None:
    from bee_proof_spark.queries import load_all
    from bee_proof_spark.session import auto_shuffle_partitions

    reg = load_all()
    # Corpus-sized shuffle parallelism per probed dir (shuffle.partitions is
    # runtime-settable): sf0.1 keeps 32, the 1000x fixture gets 256 - the
    # value the hand-tuned @shuffle=256 re-measurements already showed wins.
    nparts = {sf: auto_shuffle_partitions(sf) for sf in (SRC, DST)}
    print(f"shuffle partitions: sf0.1={nparts[SRC]} {REPS}x={nparts[DST]}", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(qid: str, sf: str) -> float:
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts[sf]))
        ts = []
        for _ in range(2):  # min of two: first pass warms caches/codegen
            t0 = time.perf_counter()
            noop(reg[qid].builder(spark, sf))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    noop(reg["tpch_q1_pricing"].builder(spark, SRC))  # JVM warmup
    print("%-26s %8s %8s %6s" % ("query", "sf0.1", f"{REPS}x", "ratio"), flush=True)
    for q in PROBE_QUERIES:
        a, b = timed(q, SRC), timed(q, DST)
        print("%-26s %8.2f %8.2f %6.1f" % (q, a, b, b / a), flush=True)


def main() -> None:
    if _ARGS.emb_realistic:
        for suffix, n in (("10", 20_000), ("100", 200_000), ("1000", 2_000_000)):
            gen_emb_realistic(f"/tmp/sfemb{suffix}", n)
        return
    # 32-way shuffles over the scaled set need a real heap (see SCALE.md);
    # scale it with the replication factor (measured: 16g carries 10x).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g" if REPS <= 10 else "48g")
    from bee_proof_spark.session import build_session

    spark = build_session(app_name="bee-proof-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not (_ARGS.probe_only and os.path.exists(f"{DST}/lineitem.parquet")):
        generate(spark)
    if not _ARGS.gen_only:
        probe(spark)


if __name__ == "__main__":
    main()
