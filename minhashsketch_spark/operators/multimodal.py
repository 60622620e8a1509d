"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (no image/audio libs in this container — each
decode function raises ``NotImplementedError`` unless ``fake=True``
produces a deterministic fake); the Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes bigint, feature array<float>"


def _decode_image(payload: bytes, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic stub")
    # deterministic fake: byte histogram as an 8x8 'image'
    h = np.bincount(np.frombuffer(payload, dtype=np.uint8) >> 2, minlength=64)
    return h.reshape(8, 8).astype(np.float32)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """binary payload -> fixed-width float feature vector, one
    ``mapInPandas`` pass (Arrow-batched, no per-row Python pickling).

    With a real decoder the inner loop would call PIL/ffmpeg per element —
    the partitioning/batching story is identical.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            nbytes = []
            for payload in pdf["payload"].values:
                buf = bytes(payload or b"")
                nbytes.append(len(buf))
                img = _decode_image(buf, fake)
                # 'feature': normalized flattened decode output
                v = img.reshape(-1)
                norm = float(np.linalg.norm(v)) or 1.0
                feats.append((v / norm).astype(np.float32))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "n_bytes": np.array(nbytes, dtype=np.int64),
                "feature": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Build a media table from the documents table's html bytes (or text)
    — exercises the binary-column path end to end on real testdata."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(8).alias("width"),
        F.lit(8).alias("height"),
        F.lit(0).alias("duration_ms"),
    )
