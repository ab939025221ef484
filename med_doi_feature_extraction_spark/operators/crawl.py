"""Recrawl scheduling: priority = authority × P(page changed since we
last saw it change).

The composition the churn/authority signals exist FOR: a crawler with
a fixed budget should refetch pages that are (a) worth having fresh
(link authority — ``graph.pagerank``) and (b) likely stale (content
churn — ``windows.change_rate_features``). The standard freshness
model (Cho & Garcia-Molina 2003) treats changes as Poisson with rate
λ; the probability a page changed in the ``age`` seconds since its
last observed change is ``1 − exp(−λ·age)``.

Everything is Column algebra over two slim per-entity tables (the
corpus-sized work already happened inside the churn/authority
operators); the join is AQE-broadcastable. ``as_of`` is an explicit
parameter — a deterministic plan has no clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_priority(
    churn: DataFrame,
    authority: DataFrame,
    as_of: str,
    entity: str = "node",
) -> DataFrame:
    """Join churn features (``change_rate_features`` output keyed by
    ``entity``) with authority scores (``pagerank`` output:
    ``node, rank``) → per-entity refetch priority.

    ``λ = change_rate / mean_gap_sec`` (changes per second — rate per
    observation × observations per second), ``age`` = seconds from the
    last OBSERVED CHANGE (never-changed pages fall back to... nothing:
    entities with undefined churn — singleton histories or zero
    changes — get NULL priority, explicitly; a scheduler funds those
    from an exploration budget, not from a made-up rate). Entities
    missing from the authority table get rank 0 → priority 0 (an
    unlinked page earns no freshness budget). Output priority is
    round-6 portable.
    """
    pr = authority.select(
        F.col("node").alias(entity), F.col("rank").alias("_pr")
    )
    j = churn.join(pr, entity, "left")
    lam = F.col("change_rate") / F.col("mean_gap_sec")
    from med_doi_feature_extraction_spark.operators.windows import (
        _epoch_seconds,
    )

    age = F.lit(as_of).cast("timestamp").cast("long") - _epoch_seconds(
        F.col("last_change_ts")
    )
    p_changed = F.lit(1.0) - F.exp(-lam * age)
    return j.select(
        F.col(entity),
        F.col("change_rate"),
        F.coalesce(F.col("_pr"), F.lit(0.0)).alias("authority"),
        F.round(
            F.coalesce(F.col("_pr"), F.lit(0.0)) * p_changed, 6
        ).alias("priority"),
    )
