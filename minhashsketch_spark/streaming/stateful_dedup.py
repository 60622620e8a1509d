"""Streaming exact-dedup via a custom stateful operator
(``applyInPandasWithState``): emit each document the FIRST time its content
fingerprint is seen across the whole stream, drop every later arrival.

This is the §2.2 "custom stateful operator" shape the built-in streaming
dedup cannot express at crawl scale: ``dropDuplicates`` on an unbounded
stream keeps per-key state forever too, but gives no control over what is
emitted or stored — here the state is one boolean per fingerprint and the
emitted row carries the keeper url, so downstream near-dup stages see each
content exactly once. State is keyed by md5(text) (128-bit, collision-safe
at 10^12 docs); Spark shuffles by key so each fingerprint's state lives on
exactly one executor, and the checkpoint makes restarts resume-correct
(replayed micro-batches find the fingerprint already marked seen).

Within one micro-batch, arrival order inside a group is not total across
engines, so the keeper among same-batch duplicates is made deterministic by
taking the minimum url.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .ingest import DOCS_SCHEMA

OUT_SCHEMA = "fingerprint string, url string, n_chars int"
STATE_SCHEMA = "seen boolean"


def _dedup_group(key: tuple, pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    """One fingerprint group per call: emit the deterministic keeper iff the
    fingerprint has never been seen (state survives across micro-batches)."""
    if state.exists:
        return  # already emitted in an earlier batch: drop all arrivals
    best_url, best_len = None, 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # vectorized keeper pick: boilerplate-heavy crawls make some
        # fingerprint groups huge, so no per-row Python loop here
        i = pdf["url"].values.argmin()
        url = pdf["url"].values[i]
        if best_url is None or url < best_url:
            best_url, best_len = url, len(pdf["text"].values[i] or "")
    state.update((True,))
    yield pd.DataFrame({"fingerprint": [key[0]], "url": [best_url],
                        "n_chars": [best_len]})


def streaming_exact_dedup(spark: SparkSession, input_path: str,
                          checkpoint_path: str, output_path: str,
                          available_now: bool = True):
    """Start (and with ``available_now`` drain) the stateful dedup stream:
    documents parquet drops -> first-seen (fingerprint, keeper url) table.
    Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(input_path)
    )
    keyed = (
        stream.select("url", "text", F.md5("text").alias("fingerprint"))
        .groupBy("fingerprint")
    )
    deduped = keyed.applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        deduped.writeStream.outputMode("append")
        .format("parquet").option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_first_seen(docs: DataFrame) -> DataFrame:
    """Batch oracle for the stream: one row per distinct fingerprint with
    the minimum-url keeper (what the stream must equal after draining)."""
    return (
        docs.select(F.md5("text").alias("fingerprint"), "url",
                    F.length("text").alias("n_chars"))
        .groupBy("fingerprint")
        .agg(F.min(F.struct("url", "n_chars")).alias("k"))
        .select("fingerprint", F.col("k.url").alias("url"),
                F.col("k.n_chars").alias("n_chars"))
    )
