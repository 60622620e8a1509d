"""Candidate verification: MinHash estimate (reference semantics) + exact
Jaccard.

* The **MinHash estimate** is the reference's estimator ``computeSim``
  (``/root/reference/src/Hash.cu:65-86``): per hash function, the match
  count between the two m-lists over t*m. With m == 1 this reduces to the
  fraction of equal signature components — computed entirely JVM-side with
  ``zip_with`` (equality only, so two's-complement storage is safe;
  SURVEY.md H1), keeping the hot path inside whole-stage codegen. Quirk Q2
  (UINT64_MAX padding matches itself) is preserved: two empty docs have
  all-UINT64_MAX signatures, which compare equal.
* **Exact Jaccard** (north_star: "exact Jaccard verification filters
  pairs") recomputes distinct shingle sets only for docs that appear in at
  least one candidate pair (a left-semi join — <<1% of the corpus at scale)
  and intersects them JVM-side via ``array_intersect`` (hash-set based,
  O(n)).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..core.shingles import distinct_shingles


# candidate-pair frames at or under this row count are broadcast into the
# attach joins (pairs are <<1% of the corpus by LSH design — the broadcast
# keeps the heavy signature/shingle frames UNSHUFFLED, guide §3.1/§8); above
# it the joins fall back to the shuffle plans (scale-safe default).  1M pair
# rows ~ 60 MB framed — comfortably within executor broadcast budgets.
BROADCAST_PAIR_LIMIT = 1_000_000
# under THIS count the b-side shuffle_hash hints are dropped too: with a
# tiny pair set every attach input is tiny, the planner's own stats produce
# the all-broadcast zero-Exchange plan, and a forced hash-join would ADD
# two exchanges of pure scheduling latency (measured ~+0.5-1 s/query at
# sf0.1). The hints only pay once the fat (pair x payload) intermediate is
# big enough that an estimate-driven plan would sort or mis-broadcast it.
DIRECT_JOIN_PAIR_LIMIT = 50_000


def est_prefilter_gate(cfg: PipelineConfig) -> float:
    """Safe est_sim pre-gate for exact verification: ``threshold - 6
    sigma`` where sigma is the t-sample binomial std of the estimator at
    p = threshold. A pair whose exact jaccard is >= threshold has
    P(est < gate) <= ~3e-7 (Hoeffding; ~1e-9 by the normal
    approximation), so filtering
    candidates below the gate BEFORE the shingle recompute + intersect
    cannot change any jaccard>=threshold or is_dup output (the gate is
    strictly below threshold). At the flagship t=128/thr=0.7 the gate is
    ~0.457 and kills the ~98% of LSH band collisions that are random
    shingle matches from a small vocabulary; at small t the margin widens
    automatically (t=16 -> gate ~0.01, i.e. no risky pruning)."""
    import math

    sigma = math.sqrt(cfg.threshold * (1.0 - cfg.threshold) / cfg.t)
    return max(0.0, cfg.threshold - 6.0 * sigma)


def minhash_estimate(pairs: DataFrame, signatures: DataFrame, cfg: PipelineConfig,
                     broadcast_pairs: bool = False,
                     hash_join_b_side: bool = False) -> DataFrame:
    """(url_a, url_b) + signatures -> + est_sim (reference estimator).

    m == 1 only: positional zip_with equality IS the two-pointer match
    count when each list has one element. For m > 1 use
    ``minhash_estimate_m`` (positional equality would undercount — see
    src/Hash.cu:65-78, the pointers advance independently).

    ``broadcast_pairs``: the pair set is known-small (counted by the
    caller) — broadcast it so the signature table is never shuffled for
    the a-side attach, and hash-join (no sort) the b-side."""
    if cfg.m != 1:
        raise ValueError("minhash_estimate is the m==1 fast path; "
                         "use minhash_estimate_m for m > 1")
    sig_a = signatures.select(F.col("url").alias("url_a"), F.col("sig").alias("sig_a"))
    sig_b = signatures.select(F.col("url").alias("url_b"), F.col("sig").alias("sig_b"))
    if broadcast_pairs:
        pairs = F.broadcast(pairs)
        if hash_join_b_side:
            sig_b = sig_b.hint("shuffle_hash")
    return (
        pairs.join(sig_a, "url_a").join(sig_b, "url_b")
        .withColumn(
            "matches",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                F.lit(0),
                lambda acc, v: acc + v,
            ),
        )
        # divide by the actual signature length, not cfg.t*cfg.m — immune to
        # a config/signature mismatch (they are asserted equal for m==1)
        .withColumn("est_sim", F.col("matches") / F.size("sig_a"))
        .drop("sig_a", "sig_b")
    )


def minhash_estimate_m(pairs: DataFrame, signatures: DataFrame,
                       cfg: PipelineConfig) -> DataFrame:
    """General-m reference estimator over candidate pairs: per function a
    two-pointer intersection of the two sorted bottom-m lists
    (``src/Hash.cu:65-86``, quirks Q2/Q6 preserved via core.compute_sim),
    summed over t, / (t*m). Pandas UDF over the (tiny) candidate pair set —
    candidates are <<1% of the corpus at scale, so Python here is off the
    hot path."""
    from ..core.sketch import compute_sim

    t, m = cfg.t, cfg.m
    sig_a = signatures.select(F.col("url").alias("url_a"), F.col("sig").alias("sig_a"))
    sig_b = signatures.select(F.col("url").alias("url_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(sig_a, "url_a").join(sig_b, "url_b")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            est = [
                compute_sim(
                    np.asarray(sa, dtype=np.int64).view(np.uint64).reshape(t, m),
                    np.asarray(sb, dtype=np.int64).view(np.uint64).reshape(t, m))
                for sa, sb in zip(pdf["sig_a"].values, pdf["sig_b"].values)
            ]
            yield pd.DataFrame({"url_a": pdf["url_a"].values,
                                "url_b": pdf["url_b"].values,
                                "est_sim": np.asarray(est, dtype=np.float64)})

    return joined.select("url_a", "url_b", "sig_a", "sig_b").mapInPandas(
        gen, schema="url_a string, url_b string, est_sim double")


def shingle_sets_for(docs: DataFrame, urls: DataFrame, cfg: PipelineConfig,
                     url_col: str = "url", text_col: str = "text",
                     broadcast_urls: bool = False) -> DataFrame:
    """Distinct shingle-hash sets, computed only for ``urls`` (semi join).

    ``broadcast_urls``: the url set is known-small — broadcast the semi-join
    build side so the corpus scan is never shuffled (guide §3.1)."""
    k = cfg.k
    url_set = urls.select(F.col("url").alias(url_col)).distinct()
    if broadcast_urls:
        url_set = F.broadcast(url_set)
    needed = docs.join(url_set, on=url_col, how="left_semi")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for text in pdf[text_col].values:
                xs = distinct_shingles((text or "").encode("utf-8", "surrogatepass"), k)
                outs.append(xs.view(np.int64))
            yield pd.DataFrame({"url": pdf[url_col].values, "shingles": outs})

    # no ensure_parallelism here: `needed` sits downstream of the semi-join
    # shuffle, so it already carries >= shuffle.partitions partitions (and
    # probing .rdd on an AQE join plan can execute its stages eagerly)
    return needed.select(F.col(url_col), F.col(text_col)).mapInPandas(
        gen, schema="url string, shingles array<bigint>")


def verified_pairs(pairs: DataFrame, signatures: DataFrame, docs: DataFrame,
                   cfg: PipelineConfig, url_col: str = "url",
                   text_col: str = "text",
                   checkpoint_sigs: bool = True,
                   with_containment: bool = False,
                   checkpoint_pairs: bool = True,
                   est_gate: float | None = None) -> DataFrame:
    """Full verification: est_sim (reference estimator) + exact jaccard.

    Output: (url_a, url_b, est_sim, jaccard, is_dup) where is_dup applies
    ``cfg.threshold`` to the *reference estimator* — the semantics the
    recall metric is defined against (BASELINE.md).

    ``with_containment`` adds (containment_a, containment_b) =
    |A∩B|/|A|, |A∩B|/|B| — the ASYMMETRIC overlap: a short quote embedded
    in a long page has low jaccard but containment_a ~ 1. Costs nothing
    extra (the intersection is already computed); note LSH candidate
    generation targets RESEMBLANCE, so low-jaccard/high-containment pairs
    outside the candidate set are the substring operator's job
    (operators.substring), not this one's.

    ``checkpoint_sigs=False`` when the signature frame is already
    materialized (parquet/bucketed-table-backed, or checkpointed by the
    caller): localCheckpoint'ing e.g. a full index's signatures here would
    copy the whole index into executor storage. Likewise
    ``checkpoint_pairs=False`` for a parquet-backed candidate table.

    Join strategy (guide §3.1/§8): the pair set is <<1% of the corpus by
    LSH design, and after the eager materialization its exact size is one
    cheap count away — when it is under ``BROADCAST_PAIR_LIMIT`` rows the
    pair spine is BROADCAST into every attach join, so the heavy frames
    (signatures, shingle sets) are never shuffled for the a-side attaches,
    and the b-side attaches hash-join without sorting the array payloads.
    Above the limit every join falls back to the previous shuffle plans.

    ``est_gate``: optional est_sim pre-filter applied BEFORE the exact
    verification (shingle recompute + intersect) — pairs below the gate
    are dropped from the OUTPUT entirely, so only pass a gate when every
    downstream consumer filters on ``jaccard >= threshold`` or ``is_dup``
    and the gate is a safe margin below threshold (use
    ``est_prefilter_gate(cfg)``; see its tail-bound argument). The gate is
    the single biggest verification win on small-vocabulary corpora: ~98%
    of LSH candidates are random band collisions whose exact jaccard is
    nowhere near threshold, and gating them skips their shingle recompute
    and array_intersect (measured 8.5 -> 3.4 s same-session at 50k docs /
    127k candidates). Callers that need sub-threshold rows (containment
    mining, estimator calibration) must leave it None.
    """
    # both stages consume ``signatures``/``sets_df`` twice (a-side, b-side);
    # EAGER localCheckpoint so the UDFs run exactly once — a lazy persist
    # lets the two join sides race to compute the same partitions. In the
    # full pipeline these arrive as parquet-checkpointed tables anyway.
    if checkpoint_sigs:
        signatures = signatures.localCheckpoint()
    if checkpoint_pairs:
        pairs = pairs.localCheckpoint()
    # the count is ~free: pairs is either just-materialized executor storage
    # or a parquet stage table whose count comes from footer metadata
    n_pairs = pairs.count()
    small = n_pairs <= BROADCAST_PAIR_LIMIT
    # tiny pair sets keep the planner's own zero-Exchange all-broadcast
    # plan: a forced hash join would only add exchanges (see gate comment)
    hash_b = small and n_pairs > DIRECT_JOIN_PAIR_LIMIT
    est = minhash_estimate(pairs, signatures, cfg, broadcast_pairs=small,
                           hash_join_b_side=hash_b)
    # a clamped/zero gate filters nothing — take the ungated plan instead
    # of paying an extra materialize+count for no pruning
    if est_gate is not None and est_gate > 0.0:
        est = est.filter(F.col("est_sim") >= F.lit(est_gate))
        if small:
            # EAGER: the gated estimate is the new (far smaller) pair
            # spine — materializing it runs the estimate job once and
            # makes the surviving-pair count exact for the attach-plan
            # gates below. Bounded: pre-gate pairs are already under
            # BROADCAST_PAIR_LIMIT here, so the checkpointed copy is too.
            est = est.localCheckpoint()
            n_pairs = est.count()
            small = n_pairs <= BROADCAST_PAIR_LIMIT
            hash_b = small and n_pairs > DIRECT_JOIN_PAIR_LIMIT
            spine = est
        else:
            # above the broadcast limit nothing pair-scale may enter
            # executor storage (localCheckpoint is non-reliable): keep the
            # gate as an inline filter before the attach joins (est is
            # consumed once, so no recompute) and derive the shingle urls
            # from the pair superset — extra shingle rows, same output
            spine = pairs
    else:
        spine = pairs
    all_urls = (spine.select(F.col("url_a").alias("url"))
                .unionByName(spine.select(F.col("url_b").alias("url"))).distinct())
    sets_df = shingle_sets_for(docs, all_urls, cfg, url_col, text_col,
                               broadcast_urls=small).localCheckpoint()
    sh_a = sets_df.select(F.col("url").alias("url_a"), F.col("shingles").alias("sh_a"))
    sh_b = sets_df.select(F.col("url").alias("url_b"), F.col("shingles").alias("sh_b"))
    if small:
        # est is pair-sized and light (urls + two doubles): broadcasting it
        # keeps sh_a unshuffled; past DIRECT_JOIN_PAIR_LIMIT the second
        # attach hash-joins so the fat (pair x shingle-array) intermediate
        # is shuffled once, never sorted
        est = F.broadcast(est)
        if hash_b:
            sh_b = sh_b.hint("shuffle_hash")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = (
        est.join(sh_a, "url_a").join(sh_b, "url_b")
        .withColumn("jaccard",
                    F.when(union > 0, inter.cast("double") / union.cast("double"))
                    .otherwise(F.lit(1.0)))
        .withColumn("is_dup", F.col("est_sim") >= F.lit(cfg.threshold))
    )
    cols = ["url_a", "url_b", "est_sim", "jaccard", "is_dup"]
    if with_containment:
        for side, col in (("a", "sh_a"), ("b", "sh_b")):
            out = out.withColumn(
                f"containment_{side}",
                F.when(F.size(col) > 0,
                       inter.cast("double") / F.size(col).cast("double"))
                .otherwise(F.lit(1.0)))
        cols += ["containment_a", "containment_b"]
    return out.select(*cols)
