"""CLI regression: the reference-style dna mode and error ergonomics."""

import subprocess
import sys


def _run(*args):
    return subprocess.run([sys.executable, "-m", "minhashsketch_spark", *args],
                          capture_output=True, text=True, timeout=300)


def test_dna_cli_reference_output():
    r = _run("dna",
             "/root/reference/testing_files/sequence_clip1.fasta",
             "/root/reference/testing_files/sequence_clip2.fasta",
             "all", "-e", "--k=5", "--m=10", "--t=10", "--seed=123")
    assert r.returncode == 0
    # golden similarity from the reference's own compiled code
    assert "0.80000000" in r.stdout
    assert "minhash_parallel" in r.stdout
    assert "sig1:  size:10" in r.stdout


def test_dna_cli_k_too_large():
    r = _run("dna",
             "/root/reference/testing_files/sequence_clip1.fasta",
             "/root/reference/testing_files/sequence_clip2.fasta",
             "--k=5000", "--t=1")
    assert r.returncode == 1
    assert "k cannot be greater" in r.stdout  # src/main.cu:222 wording


def test_dna_cli_missing_file():
    r = _run("dna", "/nope.fasta", "/nope2.fasta", "--k=5")
    assert r.returncode == 1
    assert "error: input not found" in r.stderr
