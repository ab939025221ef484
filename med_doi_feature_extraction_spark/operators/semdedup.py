"""Semantic (embedding-space) deduplication — SemDeDup-style.

Text-hash dedup (exact / minhash / simhash, operators/dedup.py) only
catches lexical duplicates; paraphrases, translations, and templated
rewrites survive it. SemDeDup (Abbas et al., 2023, arXiv:2303.09540)
removes them by clustering embeddings with a coarse k-means and
deleting, within each cluster, all but one member of every group
whose pairwise cosine exceeds a threshold.

Spark-first shape — a pure composition of existing scale-audited
stages, no new kernels:

1. **cluster assignment** — the IVF coarse quantizer
   (similarity.train_ivf_centroids: ONE bounded sample job; seeded)
   + similarity.with_ivf_cell (vectorized Arrow kernel, centroids in
   the UDF closure). The cell id is the blocking key: pair candidates
   only ever meet inside a cell, so the all-pairs O(n²) becomes
   Σ O(cell²) with cells sized n/K.
2. **within-cell pairing** — dedup.candidate_pairs: ONE exchange on
   the cell id, capped bucket size, streamed (i<j) expansion (the
   same machinery the LSH tiers use; a hot cell degrades to a capped
   straggler, never an OOM).
3. **exact cosine verify** — similarity.cosine_col: JVM higher-order
   array functions inside whole-stage codegen, no Python.
4. **keep/remove decisions** — dedup.dedup_decisions: connected
   components by min-label propagation with pointer jumping, so a
   chain a~b~c collapses to ONE survivor (the min id), matching the
   transitive-group semantics of the paper rather than an
   order-dependent greedy sweep.

Recall contract: like every blocked near-dup tier here, recall is
bounded by the blocking — a dup pair split across two cells is not
seen. Raise K-means quality (more iters) or run the embedding LSH
tier (similarity.embedding_near_dup) alongside for multi-probe
recall; precision of what IS emitted is exact (step 3 verifies every
candidate with the true cosine).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import DEFAULT_MAX_BAND_BUCKET, candidate_pairs, dedup_decisions
from .similarity import cosine_col, with_ivf_cell

DEFAULT_THRESHOLD = 0.9


def semdedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
    max_cell: int | None = DEFAULT_MAX_BAND_BUCKET,
) -> DataFrame:
    """(id_a, id_b, cosine) for same-cell pairs with cosine >=
    threshold. The vectors ride the pair-member struct (``carry``) so
    the verify needs no join back to the corpus — one exchange total."""
    assigned = with_ivf_cell(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        centroids, "_v", out="_cell",
    )
    return semdedup_pairs_from_cells(
        assigned, "_id", "_v", "_cell", threshold, max_cell
    )


def semdedup_pairs_from_cells(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    threshold: float = DEFAULT_THRESHOLD,
    max_cell: int | None = DEFAULT_MAX_BAND_BUCKET,
) -> DataFrame:
    """Pairing + verify over a pre-materialized assignment table (the
    oracle seam, and at corpus scale the persisted index layout — at
    10^12 rows you materialize assignments partitioned by cell once
    and run MANY dedup/ANN passes against them)."""
    pairs = candidate_pairs(
        assigned.select(F.col(id_col).alias("id"), vec_col, cell_col),
        "id", [cell_col], max_bucket=max_cell, carry=[vec_col],
    )
    scored = pairs.select(
        "id_a", "id_b",
        cosine_col(F.col(f"{vec_col}_a"), F.col(f"{vec_col}_b")).alias("cosine"),
    )
    return scored.filter(F.col("cosine") >= threshold)


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
    max_cell: int | None = DEFAULT_MAX_BAND_BUCKET,
) -> DataFrame:
    """(doc_id, cluster_id, keep): transitive duplicate groups in
    embedding space, survivor = min id per component (deterministic,
    layout-independent)."""
    pairs = semdedup_pairs(df, id_col, vec_col, centroids, threshold, max_cell)
    return dedup_decisions(df, id_col, pairs.select("id_a", "id_b"))
