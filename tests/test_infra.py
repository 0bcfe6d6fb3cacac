"""Verification-infrastructure contracts: the oracle harness and session
profile helpers must fail loudly, not mask defects (round-2 advice items)."""

from __future__ import annotations

import warnings

import duckdb
import pytest

from bee_proof_spark.queries import QuerySpec
from bee_proof_spark.session import build_session
from bee_proof_spark.testing import compare_to_oracle, duckdb_connect


def test_duckdb_connect_skips_absent_tables(tmp_path):
    """A partial fixture dir (edge-case tests write only documents.parquet)
    registers just the present tables, silently."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"doc_id": pa.array([1], pa.int64())}),
                   str(tmp_path / "documents.parquet"))
    con = duckdb_connect(str(tmp_path))
    assert con.execute("SELECT count(*) FROM documents").fetchone()[0] == 1
    with pytest.raises(duckdb.CatalogException):
        con.execute("SELECT * FROM lineitem")


def test_duckdb_connect_raises_on_corrupt_fixture(tmp_path):
    """A parquet file that EXISTS but cannot be read must raise the real I/O
    error, not silently skip into a later 'table does not exist'."""
    (tmp_path / "documents.parquet").write_bytes(b"not a parquet file")
    with pytest.raises(duckdb.Error):
        duckdb_connect(str(tmp_path))


def test_rows_only_specs_reject_complex_outputs(spark, sf_smoke):
    """The driver's row-hash cannot canonicalize array/map/struct cells, and
    rows-only (oracle=None) ids skip the oracle compare - so the complex-type
    gate must fire for them too, at pytest time, not first in the driver run."""
    from pyspark.sql import functions as F

    spec = QuerySpec(
        "rows_only_array_probe",
        lambda s, d: s.range(3).select(F.array("id").alias("a")),
        oracle=None,
    )
    ok, msg = compare_to_oracle(spark, spec, sf_smoke)
    assert not ok
    assert "complex-typed" in msg


def test_bench_queries_are_registered():
    """Every id bench.py times must exist in the registry — a rename that
    silently drops a query from the driver's per-round bench is a regression
    the JSON artifact would never surface."""
    import bench

    from bee_proof_spark.queries import load_all

    reg = load_all()
    missing = [q for q in bench.BENCH_QUERIES if q not in reg]
    assert not missing, f"bench queries not registered: {missing}"
    assert not set(bench.STABLE_QUERIES) & set(bench.TAIL_QUERIES)


def test_bench_calibration_workload_is_fixed(spark):
    """The calibration row is only a valid cross-round yardstick if the
    workload never changes: pin its exact shape (20M rows over 1000
    xxhash64-derived keys, every key present, counts summing to exactly
    20M) so an accidental edit shows up as a test failure, not as phantom
    'host drift'. Timing itself is NOT asserted - only the work."""
    from pyspark.sql import functions as F

    df = (
        spark.range(0, 20_000_000, 1, 32)
        .withColumn("k", F.pmod(F.xxhash64("id"), F.lit(1000)))
        .withColumn("v", F.sin(F.col("id").cast("double")))
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    top = df.agg(
        F.count(F.lit(1)).alias("groups"), F.sum("n").alias("rows")
    ).collect()[0]
    assert (top["groups"], top["rows"]) == (1000, 20_000_000)
    # and bench.calibration_pass runs the same shape through the noop sink
    import inspect

    import bench

    src = inspect.getsource(bench.calibration_pass)
    for token in ("20_000_000", "xxhash64", "1000", "sin"):
        assert token in src, token


def test_sweep_aged_dirs_protections(tmp_path):
    """The /tmp reclamation rules: age gate, exempt paths, keep predicate
    (live pids; complete snapshots within their grace window)."""
    import os
    import time

    from bee_proof_spark.tmputil import pid_dir_alive, sweep_aged_dirs

    old = time.time() - 7200  # 2h ago
    fresh_d = tmp_path / "fresh"
    fresh_d.mkdir()
    old_orphan = tmp_path / "orphan"
    old_orphan.mkdir()
    os.utime(old_orphan, (old, old))
    old_complete = tmp_path / "complete"
    old_complete.mkdir()
    (old_complete / "_SUCCESS").touch()
    os.utime(old_complete, (old, old))
    exempt_d = tmp_path / "mine"
    exempt_d.mkdir()
    os.utime(exempt_d, (old, old))

    sweep_aged_dirs(
        str(tmp_path),
        exempt=(str(exempt_d),),
        max_age_s=3600,
        keep=lambda p, age: age < 86400 and os.path.exists(os.path.join(p, "_SUCCESS")),
    )
    assert fresh_d.exists()          # under the age gate
    assert not old_orphan.exists()   # aged out, no protection
    assert old_complete.exists()     # complete snapshot inside grace window
    assert exempt_d.exists()         # exempt outright

    # pid-liveness: our own pid is alive; a pid from /proc/sys ranges that
    # cannot exist (pid_max is < 2^22 + 1 slack) is dead.
    alive = tmp_path / f"pid{os.getpid()}"
    alive.mkdir()
    os.utime(alive, (old, old))
    dead = tmp_path / "pid4194999"
    dead.mkdir()
    os.utime(dead, (old, old))
    sweep_aged_dirs(str(tmp_path), max_age_s=3600, keep=lambda p, a: pid_dir_alive(p))
    assert alive.exists()
    assert not dead.exists()


def test_family_cache_bounded(spark, sf_smoke):
    """The checkpoint cache must not pin unbounded block-manager memory:
    FIFO eviction caps it at _FAMILY_CACHE_MAX entries per process."""
    from bee_proof_spark.queries import extensions as ext

    for i in range(ext._FAMILY_CACHE_MAX + 3):
        ext._family_checkpoint(
            spark, sf_smoke, f"probe_{i}", lambda: spark.range(2)
        )
    assert len(ext._FAMILY_CACHE) <= ext._FAMILY_CACHE_MAX


def test_family_cache_materializes_once(spark, sf_smoke):
    """The near-dup family's shared intermediates (shingle postings, jaccard
    pairs) are checkpointed once per (app, corpus): repeat calls return the
    SAME checkpointed DataFrame, so ext_dedup_cluster's edge list reuses the
    pipeline instead of rebuilding it (r2 bench: 13.6 s -> ~3 s)."""
    from bee_proof_spark.queries.extensions import (
        jaccard_pairs,
        shared_shingle_postings,
    )

    p1 = shared_shingle_postings(spark, sf_smoke)
    p2 = shared_shingle_postings(spark, sf_smoke)
    assert p1 is p2
    j1 = jaccard_pairs(spark, sf_smoke)
    assert j1 is jaccard_pairs(spark, sf_smoke)
    # The checkpointed table is a materialized RDD scan, not a re-derivation
    # of the corpus parquet.
    assert "ExistingRDD" in j1._jdf.queryExecution().executedPlan().toString()


def test_build_session_warns_on_live_runtime_mutation(spark):
    """Reusing a live session while flipping its runtime conf must warn (the
    mutation is visible to every other caller of the shared session); keys
    the caller passed via extra_conf are applied silently."""
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        with pytest.warns(UserWarning, match="autoBroadcastJoinThreshold"):
            build_session(profile="parity")  # flips broadcast/AQE pins
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # no warning may escape
            build_session(
                profile="perf",
                extra_conf={
                    "spark.sql.autoBroadcastJoinThreshold": "10m",
                    "spark.sql.adaptive.skewJoin.enabled": "true",
                },
            )
    finally:
        build_session(
            profile="perf",
            extra_conf={"spark.sql.autoBroadcastJoinThreshold": before},
        )


def test_auto_shuffle_partitions_scales_with_corpus_bytes(tmp_path):
    """Corpus-sized shuffle parallelism: 32 floor for small/absent dirs,
    power-of-two growth at ~24 MB compressed input per partition, 1024 cap."""
    from bee_proof_spark.session import auto_shuffle_partitions

    assert auto_shuffle_partitions(None) == 32
    assert auto_shuffle_partitions(str(tmp_path / "missing")) == 32
    assert auto_shuffle_partitions(str(tmp_path)) == 32  # empty dir
    big = tmp_path / "t.parquet"
    big.write_bytes(b"\0" * (6 * 1024 * 1024))
    assert auto_shuffle_partitions(str(tmp_path)) == 32  # under the floor
    from bee_proof_spark.session import _partitions_for_bytes as pfb

    gib = 1024**3
    assert pfb(76 * 1024 * 1024) == 32  # the sf0.1 fixture's size class
    assert pfb(5 * gib) == 256  # the 1000x fixture's measured-best value
    assert pfb(10**15) == 1024  # capped
    for total in (0, gib, 37 * gib, 10**15):
        n = pfb(total)
        assert n & (n - 1) == 0 and 32 <= n <= 1024


def test_emb_lsh_planes_self_size(monkeypatch, tmp_path):
    """Hyperplane count self-sizes from the embeddings row count: the
    fixture-regime constant 8 wherever an oracle comparison runs
    (<= 4096 rows), ceil(log2(n/2)) above it (occupancy ~2 keeps candidate
    pairs linear in the corpus), capped at 24; env override wins; an
    unknown row count raises instead of guessing small (a P=8 guess on a
    2M-vector corpus is a measured disk bomb - SCALE.md r6)."""
    import pytest as _pytest

    import bee_proof_spark.queries.extensions as X

    monkeypatch.setattr(X, "_EMB_LSH_PLANES_ENV", None)
    f = X._emb_lsh_planes_for
    assert [f(n) for n in (500, 2000, 4096)] == [8, 8, 8]
    assert f(2_000_000) == 20 and f(10**9) == 24  # adaptive, then capped
    ps = [f(n) for n in (4097, 10**4, 10**5, 10**6, 10**7)]
    assert ps == sorted(ps)  # monotone in corpus size
    with _pytest.raises(RuntimeError):
        f(None)
    # unreadable footers -> table_rows None -> the raise above, never P=8
    from bee_proof_spark.queries import table_rows

    bad = tmp_path / "embeddings.parquet"
    bad.write_bytes(b"not parquet")
    assert table_rows(str(tmp_path), "embeddings") is None
    assert table_rows(str(tmp_path), "missing") is None
    monkeypatch.setattr(X, "_EMB_LSH_PLANES_ENV", "20")
    assert f(None) == 20  # env override needs no row count
    assert f(10**9) == 20


def test_family_disk_staging_matches_memory_path(spark, sf_smoke):
    """Above the corpus-size cutover the family stages go to parquet under
    the tmp tree instead of the block manager; the output must be identical
    row-for-row (this is what makes the 1000x floors comparable evidence)."""
    from bee_proof_spark.queries import extensions as ext

    def run():
        return sorted(
            map(tuple, ext.ext_dedup_ngram_jaccard(spark, sf_smoke).collect())
        )

    ext._FAMILY_CACHE.clear()
    mem = run()
    old = ext._DISK_STAGE_DOC_BYTES
    ext._DISK_STAGE_DOC_BYTES = 0  # force every stage onto the disk path
    try:
        ext._FAMILY_CACHE.clear()
        disk = run()
        # the read-back plan really is a parquet scan of the staged stage
        df = ext.shared_capped_postings(spark, sf_smoke)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "familystage" in plan
    finally:
        ext._DISK_STAGE_DOC_BYTES = old
        ext._FAMILY_CACHE.clear()
    assert mem == disk


def test_dynamic_conf_reads_env_at_call_time(monkeypatch):
    """Shuffle sizing and driver memory resolve when a session is REQUESTED,
    not at module import (review-caught r6: an env var set after import was
    ignored, so a 1000x corpus ran at the unset-env default of 32
    partitions)."""
    from bee_proof_spark.session import _dynamic_conf

    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "123")
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "3g")
    conf = _dynamic_conf()
    assert conf["spark.sql.shuffle.partitions"] == "123"
    assert conf["spark.driver.memory"] == "3g"
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE")
    assert _dynamic_conf()["spark.sql.shuffle.partitions"] != "123"


def test_fixture_quantity_is_integral():
    """tpch_q17's 0.2*avg(l_quantity) cutoff and tpch_q18's HAVING
    sum(l_quantity) > 150 are engine-order-independent ONLY because
    l_quantity is integral (integer-valued doubles sum exactly in IEEE at
    any reduction order, so Spark's partial merges and DuckDB's sequential
    fold produce the bit-identical threshold). Pin that fixture property
    across every generated scale so a regenerated fixture with fractional
    quantities can't silently reintroduce a last-ulp boundary flip."""
    import glob
    import os

    from tests.conftest import SF_ORACLE

    dirs = sorted(glob.glob("/root/testdata/sf*")) or [SF_ORACLE]
    checked = 0
    for d in dirs:
        p = os.path.join(d, "lineitem.parquet")
        if not os.path.exists(p):
            continue
        con = duckdb.connect()
        frac, mx = con.execute(
            f"SELECT count(*) FILTER (l_quantity <> floor(l_quantity)),"
            f" max(l_quantity) FROM read_parquet('{p}')"
        ).fetchone()
        con.close()
        assert frac == 0, f"{p}: {frac} non-integral l_quantity rows"
        assert mx <= 2**26, f"{p}: l_quantity {mx} too large for exact sums"
        checked += 1
    assert checked, "no lineitem fixture found to check"


def test_spread_scan_gates_on_layout(spark, tmp_path):
    """spread_scan rebalances ONLY when the parquet layout cannot feed the
    session's cores (single/few row groups); a properly chunked table must
    pass through with no added exchange - the gate reads the data layout,
    not the platform, so warehouse-scale tables are a plan no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bee_proof_spark.queries import scan_splits, spread_scan

    cores = spark.sparkContext.defaultParallelism
    rows = pa.table({"id": list(range(200)), "v": [float(i) for i in range(200)]})
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir()
    many.mkdir()
    pq.write_table(rows, one / "narrow.parquet")  # 1 row group
    pq.write_table(rows, many / "narrow.parquet", row_group_size=5)  # 40 groups

    assert scan_splits(str(one), "narrow") == 1
    assert scan_splits(str(many), "narrow") >= max(cores // 2, 2)

    spread = spread_scan(spark, str(one), "narrow", "id")
    plain = spread_scan(spark, str(many), "narrow", "id")
    # unsplittable layout: rebalanced across the cores
    assert spread.rdd.getNumPartitions() == cores
    assert "RoundRobinPartitioning" in spread._jdf.queryExecution().toString() or (
        "hashpartitioning" in spread._jdf.queryExecution().toString()
    )
    # chunked layout: identical plan to a bare read (no Exchange)
    assert "Exchange" not in plain._jdf.queryExecution().executedPlan().toString()
    # both read the same rows
    assert spread.count() == plain.count() == 200


def test_scan_splits_early_exit_bounds_footer_reads(tmp_path, monkeypatch):
    """scan_splits(stop_at=k) must stop opening parquet footers the moment
    the running count reaches k (r14 verdict item 2: at 100 TB the gate's
    O(files) metadata pass was pure driver waste - it only needs a
    threshold boolean), and the cached partial count must (a) serve later
    gate calls without re-reading and (b) upgrade to the full count when a
    caller asks for the exact total."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import bee_proof_spark.queries as Q

    table_dir = tmp_path / "wide.parquet"
    table_dir.mkdir()
    rows = pa.table({"id": list(range(10))})
    for i in range(20):  # 20 files x 1 row group each
        pq.write_table(rows, table_dir / f"part-{i:05d}.parquet")

    opened: list[str] = []
    real = pq.ParquetFile

    class CountingParquetFile(real):
        def __init__(self, p, *a, **kw):
            opened.append(str(p))
            super().__init__(p, *a, **kw)

    monkeypatch.setattr(pq, "ParquetFile", CountingParquetFile)
    Q._SPLITS_CACHE.pop((str(tmp_path), "wide"), None)

    got = Q.scan_splits(str(tmp_path), "wide", stop_at=4)
    assert got is not None and 4 <= got < 20  # lower bound, not the total
    assert len(opened) == 4  # exactly stop_at footers opened

    # cached lower bound serves an equal-or-smaller gate with ZERO reads
    opened.clear()
    assert Q.scan_splits(str(tmp_path), "wide", stop_at=4) >= 4
    assert Q.scan_splits(str(tmp_path), "wide", stop_at=2) >= 2
    assert opened == []

    # a caller needing the exact total upgrades the cache in place
    assert Q.scan_splits(str(tmp_path), "wide") == 20
    opened.clear()
    assert Q.scan_splits(str(tmp_path), "wide") == 20  # now fully cached
    assert Q.scan_splits(str(tmp_path), "wide", stop_at=100) == 20
    assert opened == []
