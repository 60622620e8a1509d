"""Pipeline configuration.

Generalizes the reference's CLI parameters k/m/t/seed
(``/root/reference/src/main.cu:159-206``) to the webtext pipeline, plus the
LSH/clustering knobs the reference doesn't have (SURVEY.md §2.3).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict


@dataclass(frozen=True)
class PipelineConfig:
    # reference parameters (src/main.cu:159-166)
    k: int = 9            # shingle size (chars/bytes)
    m: int = 1            # sketch values per hash function
    t: int = 128          # number of hash functions
    seed: int = 123

    # LSH layout: bands * rows == t (with m == 1)
    bands: int = 32
    rows: int = 4

    # near-dup decision threshold on the reference estimator (matches /(t*m))
    threshold: float = 0.8

    # skew control: target docs per LSH sub-bucket — buckets above this are
    # SALTED into ceil(size/cap) sub-buckets (pair expansion bounded at
    # O(size*cap); nothing is dropped — chain links keep connectivity)
    bucket_cap: int = 512

    # connected-components iteration bound (expected O(log n))
    max_cc_iterations: int = 20

    # Arrow batch sizing for the signature UDF
    arrow_batch_rows: int = 1024

    def __post_init__(self):
        # bands partition the t hash functions for any m (each band covers
        # rows functions x m sketch values)
        if self.bands * self.rows != self.t:
            raise ValueError(f"bands*rows ({self.bands}*{self.rows}) must equal t ({self.t})")
        if self.k < 1 or self.m < 1 or self.t < 1:
            raise ValueError("k, m, t must be >= 1 (src/main.cu:190-206)")

    def config_hash(self) -> str:
        """Stable hash keying stage checkpoints for resumability."""
        payload = json.dumps(asdict(self), sort_keys=True)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    @classmethod
    def from_threshold(cls, k: int = 9, m: int = 1, t: int = 128,
                       threshold: float = 0.8, seed: int = 123,
                       min_recall: float = 0.99, **kwargs) -> "PipelineConfig":
        """Config with the (bands, rows) layout PLANNED from the S-curve
        instead of hand-picked: the largest rows-per-band (fewest false
        positives — candidate volume is the shuffle cost at 100 TB) whose
        recall at ``threshold`` still meets ``min_recall``. This is the
        production constructor; spelling bands/rows out by hand is for tests
        and parity fixtures. At the flagship t=128 / threshold=0.7 the plan
        is 32 bands x 4 rows."""
        bands, rows = plan_bands(t, threshold, min_recall)
        return cls(k=k, m=m, t=t, seed=seed, bands=bands, rows=rows,
                   threshold=threshold, **kwargs)


def plan_bands(t: int, threshold: float,
               min_recall: float = 0.99) -> tuple[int, int]:
    """Pick the (bands, rows) layout for ``t`` hash functions and a target
    Jaccard ``threshold`` (reference users choose k/m/t; the band layout is
    the engine's to plan).

    A pair at similarity s collides in >= 1 of b bands of r rows with
    probability 1 - (1 - s^r)^b (the standard S-curve, Leskovec/Rajaraman/
    Ullman MMDS ch.3). Among the divisor layouts b*r = t, pick the largest
    r (fewest false positives — candidate volume is the shuffle cost at
    100 TB) whose recall AT the threshold still meets ``min_recall``;
    always at least r=1 (recall 1-(1-s)^t, maximal)."""
    if not 0.0 < threshold < 1.0:
        raise ValueError("threshold must be in (0, 1)")
    best = (t, 1)  # b=t, r=1: highest-recall fallback
    for r in range(1, t + 1):
        if t % r:
            continue
        b = t // r
        recall = 1.0 - (1.0 - threshold ** r) ** b
        if recall >= min_recall and r > best[1]:
            best = (b, r)
    return best
