"""Structured Streaming jobs.

The reference is strictly batch (SURVEY.md §1.3), so streaming here covers the
engine-side surface a continuously-ingested document/event feed needs:
watermarked tumbling-window aggregation whose results are the exact streaming
twin of the batch q25 (tests assert equality via availableNow + memory sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def windowed_event_aggregation(stream: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type with a 1-hour watermark for
    late data; value sums are milli-quantized ints (exact, order-free)."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum(F.floor(F.col("value") * F.lit(1000.0)).cast("long"))
              .cast("long").alias("sum_value_milli"))
        .select(
            F.expr("CAST(unix_timestamp(w.start) DIV 3600 AS BIGINT)")
             .alias("hour_bucket"),
            "event_type", "n_events", "sum_value_milli")
    )


def run_events_stream_available_now(spark: SparkSession, events_dir: str,
                                    sink_table: str = "stream_agg") -> DataFrame:
    """Drain the events parquet as a bounded stream (availableNow) into an
    in-memory sink; returns the final aggregate table."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    agg = windowed_event_aggregation(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_table)


# ----------------------------------------------------------- late-data drop
# Append-mode watermarking is the one streaming semantic the complete-mode
# tumbling job above never exercises: with a watermark and outputMode=append,
# Spark drops rows whose window closed before the late-events watermark (the
# PREVIOUS batch's — see late_batch_id) and emits each window exactly once
# when the eviction watermark (the current batch's) passes its end.  The
# micro-batch sequence below is fully deterministic, so the emitted set has
# an exact SQL twin that replays the watermark progression batch by batch.
LATE_DELAY_MS = 45 * 60 * 1000          # withWatermark("ts", "45 minutes")
LATE_WIN_S = 7200                       # window("ts", "2 hours", "1 hour")
LATE_SLIDE_S = 3600
LATE_N_BATCHES = 4
LATE_BATCH_S = 8 * 86400                # 8-day ingestion buckets
LATE_EPOCH0_S = 1704067200              # 2024-01-01 (events table start)
LATE_STRAGGLER_MOD = 16                 # every 16th event arrives two batches late
_LATE_STAGE_MTIME0 = 1600000000         # fixed ascending mtimes pin file order


def late_batch_id() -> "F.Column":
    """Deterministic micro-batch id per event: time-ordered 8-day buckets,
    with every ``LATE_STRAGGLER_MOD``-th event held back TWO batches.  Two,
    not one: Spark's streaming aggregation filters late rows with the
    PREVIOUS batch's watermark and evicts with the current one (the
    two-watermark scheme of SPARK-42376, verified against query progress),
    so a one-batch straggler always lands while its window is still live in
    state — only a two-batch straggler is genuinely late-dropped."""
    tsec = F.unix_timestamp("ts")
    base = F.least(F.lit(LATE_N_BATCHES - 1),
                   F.floor((tsec - F.lit(LATE_EPOCH0_S)) / F.lit(LATE_BATCH_S)))
    return F.when(F.col("event_id") % LATE_STRAGGLER_MOD == 0,
                  F.least(F.lit(LATE_N_BATCHES - 1), base + 2)).otherwise(base)


def stage_late_batches(spark: SparkSession, sf_dir: str, stage_dir: str) -> str:
    """Materialize the events table as LATE_N_BATCHES single-file parquet
    batches with strictly ascending mtimes, so FileStreamSource (which
    orders by modification time) replays exactly batch 0..N-1 one file per
    trigger.  Idempotent via a _STAGED marker (underscore-prefixed files are
    invisible to the file source).

    This staging is TEST SCAFFOLDING for a deterministic replay: coalesce(1)
    pins one file per micro-batch so the oracle can model the watermark
    progression exactly.  A production ingest keeps its natural many-file
    batches (the operator under test — sliding_late_aggregation — is
    file-layout-agnostic; only the replay determinism needs single files)."""
    import glob
    import os
    import shutil

    marker = os.path.join(stage_dir, "_STAGED")
    if os.path.exists(marker):
        return stage_dir
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    os.makedirs(stage_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b = late_batch_id()
    for k in range(LATE_N_BATCHES):
        tmp = f"{stage_dir}.tmp{k}"
        ev.filter(b == k).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dst = os.path.join(stage_dir, f"batch-{k:05d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (_LATE_STAGE_MTIME0 + 10 * k,) * 2)
    open(marker, "w").close()
    return stage_dir


def sliding_late_aggregation(stream: DataFrame) -> DataFrame:
    """2h windows sliding hourly per event_type, 45-minute watermark; value
    sums milli-quantized (exact, order-free)."""
    return (
        stream.withWatermark("ts", "45 minutes")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.sum(F.floor(F.col("value") * F.lit(1000.0)).cast("long"))
              .cast("long").alias("sum_value_milli"))
        .select(F.col("w.start").cast("long").alias("win_start_s"),
                "event_type", "n_events", "sum_value_milli")
    )


def run_sliding_late_available_now(spark: SparkSession, stage_dir: str,
                                   sink_table: str = "stream_late") -> DataFrame:
    """Drain the staged batches one file per trigger in append mode: each
    emitted row is a window finalized by the watermark; windows still open at
    end-of-stream are withheld (append-mode semantics).

    The wall here is micro-batch ORCHESTRATION, not plan work: 5 trigger
    rounds, each committing every state-store partition to the checkpoint
    dir.  State partition count is pinned from spark.sql.shuffle.partitions
    at the first batch, so it is dropped to 4 for this query (plenty for
    the O(100) live window keys; partitioning never changes aggregate
    values) and restored after — 32 partitions spend ~8x the commit I/O
    for zero parallelism benefit at this state size."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage_dir)
        )
        q = (
            sliding_late_aggregation(stream)
            .writeStream.format("memory")
            .queryName(sink_table)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(sink_table)
