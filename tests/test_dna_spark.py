"""SURVEY.md §5.2: Spark ≡ NumPy — signatures computed through mapInPandas
equal the local parity kernel bit-for-bit on the reference's own FASTA
files, and the Spark FASTA reader equals the reference reader."""

import numpy as np

from minhashsketch_spark.core import compute_sim, fasta_to_string, gen_sig, generate_hashes_b
from minhashsketch_spark.operators.dna import dna_signatures, dna_similarity, fasta_documents

CLIPS = [f"/root/reference/testing_files/sequence_clip{i}.fasta" for i in (1, 2, 3)]


def test_fasta_reader_parity(spark):
    df = fasta_documents(spark, CLIPS)
    got = {r["doc_id"]: r["sequence"] for r in df.collect()}
    for p in CLIPS:
        name = p.split("/")[-1].removesuffix(".fasta")
        _, want = fasta_to_string(p)
        assert got[name] == want  # byte-identical (src/Utils.cu:20-26)


def test_spark_dna_signatures_bit_for_bit(spark):
    k, m, t, seed = 5, 10, 10, 123
    docs = fasta_documents(spark, CLIPS)
    sdf = dna_signatures(docs, k, m, t, seed)
    got = {r["doc_id"]: np.array(r["sig"], dtype=np.int64).view(np.uint64).reshape(t, m)
           for r in sdf.collect()}
    bs = generate_hashes_b(t, seed)
    for p in CLIPS:
        name = p.split("/")[-1].removesuffix(".fasta")
        _, seq = fasta_to_string(p)
        want = gen_sig(seq.encode(), k, m, t, hashes_b=bs)
        assert np.array_equal(got[name], want)


def test_spark_dna_similarity_matches_reference_estimator(spark):
    k, m, t, seed = 5, 10, 10, 123
    docs = fasta_documents(spark, CLIPS)
    sims = dna_similarity(dna_signatures(docs, k, m, t, seed), t, m).collect()
    bs = generate_hashes_b(t, seed)
    sigs = {}
    for p in CLIPS:
        name = p.split("/")[-1].removesuffix(".fasta")
        _, seq = fasta_to_string(p)
        sigs[name] = gen_sig(seq.encode(), k, m, t, hashes_b=bs)
    assert len(sims) == 3  # C(3,2)
    for r in sims:
        want = compute_sim(sigs[r["doc_a"]], sigs[r["doc_b"]])
        assert r["similarity"] == want
