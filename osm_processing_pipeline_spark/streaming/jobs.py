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
