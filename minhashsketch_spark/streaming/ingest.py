"""Incremental signature ingest via Structured Streaming.

The reference is batch-only (SURVEY.md §2.2), but a production crawl is
append-only: new WARC drops land continuously. This operator keeps the
``signatures`` stage incrementally up to date — ``readStream`` over the
documents table, the same vectorized signature UDF per micro-batch, and
``foreachBatch`` writing each batch into its own ``batch_id=`` partition
with *dynamic partition overwrite*. foreachBatch is at-least-once: a crash
after the write but before the checkpoint commit replays the batch on
restart — the replay overwrites exactly its own partition, so the table
stays exactly-once. Candidate generation/CC then run as periodic batch
jobs over the growing table — the standard lambda layout for dedup at
crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


def write_signature_batch(sigs: DataFrame, batch_id: int, output_path: str) -> None:
    """Idempotent micro-batch sink: dynamic overwrite of the batch's own
    ``batch_id=`` partition — replaying the same batch (at-least-once
    foreachBatch) rewrites identical data instead of appending duplicates."""
    (sigs.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id")
         .parquet(output_path))


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
        write_signature_batch(sigs, batch_id, output_path)

    writer = (
        stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
