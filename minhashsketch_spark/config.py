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

    # skew control: max docs considered per LSH bucket (hot-bucket cap);
    # buckets larger than this are deterministically down-sampled
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
