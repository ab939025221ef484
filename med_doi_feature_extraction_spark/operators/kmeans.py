"""Distributed Lloyd k-means over the FULL corpus + cluster-balanced
retention.

Why this exists next to ``similarity.train_ivf_centroids``: the IVF
build fits its quantizer on a bounded driver-side sample — the right
bootstrap for an ANN index, but cluster-aware *curation* (SemDeDup /
DataComp-style cluster caps, topic-balanced mixes) wants centroids fit
on every vector. Here each Lloyd iteration is pure dataflow:

- **assignment** — the k×dim centroid matrix enters the plan either as
  Column literals (``impl="sql"``: k dot-product folds inside
  whole-stage codegen, zero Python — the engine-portable path) or
  inside an Arrow-batched pandas UDF closure (``impl="udf"``: one BLAS
  matmul per batch — the big-k path). Parity between the two is
  pytest-pinned.
- **update** — ``posexplode`` → hash-agg on ``(cell, pos)`` computing
  the per-dimension mean (partial aggregation absorbs the dim-way
  fan-out map-side), then a bounded ≤ k×dim-row collect back to the
  driver. The driver never sees a corpus row — only the centroid
  matrix — mirroring the sanctioned bounded collects in
  ``graph.pagerank`` (1-row totals) and ``skew.detect_hot_keys``.

At 10^12 rows each iteration is one scan + one (cell,pos)-keyed
exchange of k×dim partial rows per task: the shuffle volume is
O(tasks·k·dim), independent of corpus size.

Engine-portable determinism (the DuckDB oracle RETRAINS the whole
model, like ``graph.pagerank`` / ``lm.train_unigram_lm``):

- fixed ``n_iter`` → static job graph an oracle can unroll as CTEs;
- explicit ``init_ids`` (cells numbered 0..k-1 in ascending-id order);
  without them, ``fit`` falls back to the same bounded ``limit(k)``
  partition-drain the IVF build uses (deterministic per layout only,
  so the oracle-checked path always passes ids);
- assignment = argmax over ``round(cosine, 6)``, ties → lowest cell
  id (floats cross engines only through the same 6-dp gate as
  ``operators/lm`` / ``operators/graph``);
- centroid update = per-dimension mean of the raw (double-cast)
  member vectors, rounded to 6 dp **by Spark's own F.round** before
  the collect, so the literals re-entering the next iteration are the
  exact doubles the oracle's ``round(avg(v), 6)`` produces;
- empty cells keep their previous centroid (LEFT-join coalesce in
  both engines).

Reference tie-in: the reference scores records in isolation
(``src/services/quality_service.py``); corpus-scale balance needs the
*distributional* signal — which clusters are over-represented — that
only a full-corpus fit provides.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "fit_kmeans",
    "assign_cells",
    "kmeans_assign",
    "cluster_balanced_sample",
]


def _cos_cols(vec: F.Column, centroids: np.ndarray) -> list[F.Column]:
    """round(cosine(vec, c_i), 6) for every centroid row, as pure
    Column algebra (whole-stage codegen; no Python on the hot path).

    cosine = dot/(‖x‖·‖c‖) with both norms floored at 1e-12 — the
    explicit form the DuckDB oracle can reproduce verbatim."""
    xd = vec.cast("array<double>")
    xnorm = F.greatest(
        F.sqrt(
            F.aggregate(
                F.transform(xd, lambda v: v * v),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ),
        F.lit(1e-12),
    )
    out = []
    for row in centroids:
        lit_c = F.array(*[F.lit(float(v)) for v in row])
        dot = F.aggregate(
            F.zip_with(xd, lit_c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        cnorm = max(math.sqrt(float(np.dot(row, row))), 1e-12)
        out.append(F.round(dot / (xnorm * F.lit(cnorm)), 6))
    return out


def _assign_sql(vec: F.Column, centroids: np.ndarray) -> F.Column:
    """argmax cell via array_min over (-rounded_cos, cell) structs:
    min of the negated similarity is the max similarity, and struct
    ordering breaks ties toward the LOWEST cell id."""
    sims = _cos_cols(vec, centroids)
    entries = [
        F.struct((-s).alias("nc"), F.lit(i).alias("cell"))
        for i, s in enumerate(sims)
    ]
    return F.array_min(F.array(*entries))["cell"]


def _assign_udf(centroids: np.ndarray):
    """Arrow-batched assignment for large k: one (batch × k) matmul.
    Same semantics as the sql impl: argmax of round(cos, 6), ties →
    lowest cell (np.argmax returns the first maximum)."""
    cent = np.ascontiguousarray(centroids, dtype=np.float64)
    cnorm = np.maximum(np.linalg.norm(cent, axis=1), 1e-12)

    @F.pandas_udf(T.IntegerType())
    def cell_of(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], index=vecs.index, dtype="int32")
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        xnorm = np.maximum(np.linalg.norm(mat, axis=1), 1e-12)
        sims = (mat @ cent.T) / xnorm[:, None] / cnorm[None, :]
        best = np.round(sims, 6).argmax(axis=1)
        return pd.Series(best.astype("int32"), index=vecs.index)

    return cell_of


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out: str = "cell",
    impl: str = "sql",
) -> DataFrame:
    """Attach the nearest-centroid cell id. Plan-time job-free (the
    centroids are already in hand — query planning launches nothing,
    same contract as ``similarity.with_ivf_cell``)."""
    if impl == "sql":
        col = _assign_sql(F.col(vec_col), centroids)
    elif impl == "udf":
        col = _assign_udf(centroids)(F.col(vec_col))
    else:
        raise ValueError(f"unknown impl {impl!r} (want 'sql' or 'udf')")
    return df.withColumn(out, col)


def fit_kmeans(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
    init_ids: list | None = None,
    impl: str = "sql",
) -> np.ndarray:
    """Full-corpus Lloyd fit → (k × dim) float64 centroid matrix.

    This is an index-BUILD step (explicit actions, like
    ``train_ivf_centroids``): ``n_iter`` bounded jobs, each collecting
    only the ≤ k×dim (cell, pos, mean) rows. Pass ``init_ids`` for the
    engine-portable deterministic seed; omitting them falls back to a
    bounded ``limit(k)`` partition-drain (layout-deterministic only).
    """
    if k < 1 or n_iter < 0:
        raise ValueError("k must be >= 1 and n_iter >= 0")
    base = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    if init_ids is not None:
        if len(set(init_ids)) != k:
            raise ValueError(
                f"init_ids must supply exactly k={k} distinct ids, "
                f"got {len(set(init_ids))}"
            )
        seed_rows = base.filter(F.col("_id").isin(list(init_ids))).collect()
        if len(seed_rows) != len(set(init_ids)):
            raise ValueError("init_ids must all exist (and be distinct)")
    else:
        seed_rows = base.limit(k).collect()
    seed_rows = sorted(seed_rows, key=lambda r: r["_id"])[:k]
    cent = np.stack(
        [np.asarray(r["_v"], dtype=np.float64) for r in seed_rows]
    )
    for _ in range(n_iter):
        assigned = assign_cells(base, cent, vec_col="_v", impl=impl)
        means = (
            assigned.select("cell", F.posexplode("_v").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("v"), 6).alias("mv"))
            .collect()  # bounded: <= k * dim rows
        )
        nxt = cent.copy()  # empty cells keep their previous centroid
        for r in means:
            nxt[r["cell"], r["pos"]] = r["mv"]
        cent = nxt
    return cent


def kmeans_assign(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_iter: int = 3,
    init_ids: list | None = None,
    impl: str = "sql",
) -> DataFrame:
    """fit + final assignment in one call → corpus plus ``cell``."""
    cent = fit_kmeans(
        corpus, vec_col, id_col, k=k, n_iter=n_iter,
        init_ids=init_ids, impl=impl,
    )
    return assign_cells(corpus, cent, vec_col=vec_col, impl=impl)


def cluster_balanced_sample(
    corpus: DataFrame,
    centroids: np.ndarray,
    cap: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "kbal",
    impl: str = "sql",
) -> DataFrame:
    """Cluster-balanced retention: at most ``cap`` rows per k-means
    cell, survivors chosen by the deterministic portable hash order
    (``sampling.group_cap``) so the kept set is layout- and
    append-order-independent. The DataComp/SemDeDup-style topic cap:
    over-represented clusters (boilerplate-heavy, template spam) are
    throttled while the tail keeps everything."""
    from med_doi_feature_extraction_spark.operators.sampling import group_cap

    assigned = assign_cells(corpus, centroids, vec_col=vec_col, impl=impl)
    return group_cap(assigned, "cell", id_col, cap=cap, salt=salt)
