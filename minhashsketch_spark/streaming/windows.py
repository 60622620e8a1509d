"""Streaming windowed aggregation over an event stream.

Not in the reference (batch-only), but the §2.2 streaming surface of a
production crawl: event-time tumbling windows with a watermark for late
data. Testable synchronously in local mode with ``availableNow`` +
``processAllAvailable`` over parquet drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_event_counts(spark: SparkSession, input_path: str,
                          window: str = "10 minutes",
                          watermark: str = "30 minutes",
                          query_name: str = "windowed_events"):
    """Start a streaming query: tumbling-window counts + value sums per
    event_type, late data bounded by the watermark. Returns the query;
    results land in the in-memory table ``query_name`` (complete mode)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(input_path)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value") * 100).cast("bigint").alias("value_c"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
                "event_type", "n_events", "value_c")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def batch_windowed_event_counts(events: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Batch equivalent — same agg expressions as the stream (the streaming
    == batch equality is pytest-pinned; this is also the driver-surface
    entry, with window bounds as epoch seconds and money as bigint cents
    per the cross-engine contract)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value") * 100).cast("bigint").alias("value_c"))
        .select(F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
                "event_type", "n_events", "value_c")
    )
