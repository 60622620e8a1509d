"""FASTA reader with reference parity (``/root/reference/src/Utils.cu:20-26``):
line 1 is header/info; remaining non-empty lines are concatenated."""

from __future__ import annotations


def fasta_to_string(path: str) -> tuple[str, str]:
    """Returns (header, sequence)."""
    with open(path, "r") as f:
        lines = f.read().split("\n")
    header = lines[0] if lines else ""
    seq = "".join(s for s in lines[1:] if s)
    return header, seq
