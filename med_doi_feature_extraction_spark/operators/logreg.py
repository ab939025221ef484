"""In-engine logistic regression: the calibrated quality-gate model.

``classifier.train_nb`` gives a generative token-count gate; real
curation pipelines also need a DISCRIMINATIVE calibrated score over
arbitrary numeric quality signals (length, repetition fractions,
LM perplexity, compression ratio — the FineWeb/DCLM "classifier
filter" pattern with hand-picked features). This trains one with
fixed-iteration full-batch gradient descent, entirely as DataFrame
algebra — the model is a 1-ROW DataFrame, never a driver-side
object, so train + score compose into a single lazy plan.

Update rule (textbook batch GD on log-loss)::

    p_i  = sigmoid(w·x_i + b)
    g_j  = avg_i (p_i − y_i) · x_ij      (g_bias: x_ij = 1)
    w_j' = round(w_j − lr·g_j, 6)

Weights are ROUND-6 GATED after each iteration (the kmeans/lm
portable-gate idiom): both engines commit to the same 6-dp weight
vector each round, so float-sum ordering noise (~1e-13) cannot
compound across iterations and the DuckDB oracle can retrain the
identical model by unrolling the same iterations as CTEs.

Scale shape: each iteration = one broadcast of the 1-row weight
frame + one full-scan aggregate producing k+1 averages (map-side
partial aggregation; no shuffle wider than the k+1-column partial
rows). n_iter is fixed → static job graph. Features are caller-built
Columns, so anything scan-computable (no UDF) works.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sigmoid(z):  # noqa: ANN001 - Column in, Column out
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _z(feature_cols: Sequence[str]):  # noqa: ANN001
    z = F.col("_b")
    for c in feature_cols:
        z = z + F.col(f"_w_{c}") * F.col(c)
    return z


def train_logreg(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    n_iter: int = 3,
    lr: float = 1.0,
) -> DataFrame:
    """Train → 1-row weight DataFrame ``(_b, _w_<f1>, _w_<f2>, …)``.

    ``label_col`` must be 0/1 (numeric). Weights start at 0 (so the
    first iteration is deterministic regardless of layout) and are
    round-6 gated per iteration — see module docstring.
    """
    if not feature_cols:
        raise ValueError("need at least one feature column")
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    spark = df.sparkSession
    data = df.select(
        F.col(label_col).cast("double").alias("_y"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
    )
    w = spark.range(1).select(
        F.lit(0.0).alias("_b"),
        *[F.lit(0.0).alias(f"_w_{c}") for c in feature_cols],
    )
    for _ in range(n_iter):
        joined = data.crossJoin(F.broadcast(w))
        err = _sigmoid(_z(feature_cols)) - F.col("_y")
        grads = joined.agg(
            F.avg(err).alias("_g_b"),
            *[
                F.avg(err * F.col(c)).alias(f"_g_{c}")
                for c in feature_cols
            ],
        )
        w = (
            w.crossJoin(F.broadcast(grads))
            .select(
                F.round(
                    F.col("_b") - F.lit(lr) * F.col("_g_b"), 6
                ).alias("_b"),
                *[
                    F.round(
                        F.col(f"_w_{c}") - F.lit(lr) * F.col(f"_g_{c}"),
                        6,
                    ).alias(f"_w_{c}")
                    for c in feature_cols
                ],
            )
            .localCheckpoint(eager=False)
        )
    return w


def logreg_score(
    df: DataFrame,
    weights: DataFrame,
    feature_cols: Sequence[str],
    threshold: float = 0.5,
) -> DataFrame:
    """Attach ``score`` (round-6 sigmoid) and ``keep`` (score ≥
    threshold) to every row — one broadcast of the 1-row model, pure
    scan-stage Column algebra."""
    joined = df.crossJoin(F.broadcast(weights))
    score = _sigmoid(_z(feature_cols))
    out = joined.withColumn("score", F.round(score, 6)).withColumn(
        "keep", F.round(score, 6) >= F.lit(threshold)
    )
    drop = ["_b"] + [f"_w_{c}" for c in feature_cols]
    return out.drop(*drop)
