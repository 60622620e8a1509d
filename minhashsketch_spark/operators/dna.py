"""DNA parity path on Spark: the reference's exact semantics as a
DataFrame stage.

This is the direct Spark re-expression of the reference CLI
(``/root/reference/src/main.cu:154-309``): FASTA files -> per-document
``genSig`` signatures (SpookyHash k-mer sketches, O4+O5+O8-O13) ->
pairwise ``computeSim`` (O16) — except documents are *rows* and the two-doc
limit is gone. Sketches computed through ``mapInPandas`` are bit-for-bit
equal to the NumPy parity kernel (tests/test_dna_spark.py), which is
bit-for-bit equal to the reference compiled from its own sources
(tests/test_parity.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.rng import generate_hashes_b
from ..core.sketch import gen_sig


def fasta_documents(spark: SparkSession, paths: list[str]) -> DataFrame:
    """FASTA files -> (doc_id, sequence) with reference read semantics
    (skip line 1, concatenate non-empty lines — src/Utils.cu:20-26),
    expressed as a Spark scan + groupBy(file) + concat agg."""
    df = (
        spark.read.text(paths)
        .withColumn("file", F.input_file_name())
        .withColumn("rn", F.monotonically_increasing_id())
    )
    # first line per file = header; Spark reads lines in order within a file
    # split, so drop min-rn row per file and concat the rest in rn order
    from pyspark.sql.window import Window

    w = Window.partitionBy("file").orderBy("rn")
    return (
        df.withColumn("line_no", F.row_number().over(w))
        .filter((F.col("line_no") > 1) & (F.length("value") > 0))
        .groupBy("file")
        .agg(F.concat_ws("", F.collect_list("value")).alias("sequence"))
        .select(
            F.regexp_extract("file", r"([^/]+)\.fasta$", 1).alias("doc_id"),
            "sequence",
        )
    )


def dna_signatures(docs: DataFrame, k: int, m: int, t: int, seed: int,
                   id_col: str = "doc_id", seq_col: str = "sequence") -> DataFrame:
    """(doc_id, sig) where sig is the flattened t*m reference sketch."""
    hashes_b = generate_hashes_b(t, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [
                gen_sig(seq.encode(), k, m, t, hashes_b=hashes_b).reshape(-1).view(np.int64)
                for seq in pdf[seq_col].values
            ]
            yield pd.DataFrame({"doc_id": pdf[id_col].values, "sig": sigs})

    return docs.select(F.col(id_col), F.col(seq_col)).mapInPandas(
        gen, schema="doc_id string, sig array<bigint>")


def dna_similarity(signatures: DataFrame, t: int, m: int) -> DataFrame:
    """All-pairs reference estimator computeSim (src/Hash.cu:65-86) over the
    signature table — JVM-side for m == 1; exact m-list two-pointer in a
    vectorized UDF otherwise."""
    a = signatures.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = signatures.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    if m == 1:
        matches = F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0), lambda acc, v: acc + v)
        return pairs.withColumn("similarity", matches / F.lit(float(t))) \
                    .select("doc_a", "doc_b", "similarity")

    from ..core.sketch import compute_sim

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sims = [
                compute_sim(
                    np.asarray(sa, dtype=np.int64).view(np.uint64).reshape(t, m),
                    np.asarray(sb, dtype=np.int64).view(np.uint64).reshape(t, m),
                )
                for sa, sb in zip(pdf["sig_a"].values, pdf["sig_b"].values)
            ]
            yield pd.DataFrame({"doc_a": pdf["doc_a"].values,
                                "doc_b": pdf["doc_b"].values,
                                "similarity": sims})

    return pairs.mapInPandas(gen, schema="doc_a string, doc_b string, similarity double")
