"""Retrieval ranking evaluation: per-query MRR@k, recall@k, nDCG@k.

The similarity tier (cosine/LSH/IVF/sq/rerank top-k) needs its
quality measured the way retrieval systems are measured, at corpus
scale: a ranked-results table joined against a relevance-judgments
table, reduced per query. Pure relational algebra — one bounded join
and two per-query aggregations, no UDFs, no collects — so the
evaluation itself runs on the cluster next to the search it grades
(references: Järvelin & Kekäläinen 2002 for DCG; the standard
``(2^rel − 1) / log2(rank + 1)`` gain form).

Conventions: ``results`` carries (query, doc, rank) with rank 1-based
dense per query; ``qrels`` carries (query, doc, rel) integer grades
(0 = irrelevant, may simply be absent). Metrics per query:

- ``mrr``      — 1 / first rank whose doc has rel > 0, else 0.
- ``recall``   — retrieved-relevant / total-relevant (rel > 0),
  NULL when the query has no relevant docs (0/0 is undefined — a
  gate must distinguish "found nothing" from "nothing to find").
- ``ndcg``     — DCG@k over the ranked list divided by the ideal
  DCG@k from the query's own qrels (top-k grades, descending),
  NULL when IDCG = 0.

Queries present in ``qrels`` but absent from ``results`` still get a
row (mrr 0, recall 0, ndcg NULL-or-0 per IDCG) via the full spine —
an engine that silently drops empty result lists inflates its means.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """(query, n_retrieved, n_relevant, mrr, recall, ndcg) — one row
    per query in ``results ∪ qrels``, metrics rounded to 6 dp.

    Plan shape: results are pre-filtered to rank ≤ k at the scan, the
    results⋈qrels join is keyed (query, doc) — per-query fan-out is
    ≤ k so no skew — and both reductions key by query id. The ideal
    DCG runs over qrels alone (window per query, top-k grades); at
    web scale qrels are eval-set-sized, results are |Q|·k — neither
    is corpus-sized, which is the point of evaluating INSIDE the
    engine instead of collecting ranked lists to a driver."""
    res = results.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rank_col).alias("_r"),
    ).filter(F.col("_r") <= k)
    qr = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(rel_col).cast("int").alias("_rel"),
    )

    joined = res.join(qr, ["_q", "_d"], "left").withColumn(
        "_rel", F.coalesce("_rel", F.lit(0))
    )
    gain = (F.pow(F.lit(2.0), F.col("_rel")) - 1.0) / F.log2(
        F.col("_r").cast("double") + 1.0
    )
    per_res = joined.groupBy("_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.min(F.when(F.col("_rel") > 0, F.col("_r"))).alias("_first_rel"),
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0))
        .cast("long")
        .alias("_hits"),
        F.sum(gain).alias("_dcg"),
    )

    w = Window.partitionBy("_q").orderBy(
        F.col("_rel").desc(), F.col("_d").asc()
    )
    ideal = (
        qr.filter(F.col("_rel") > 0)
        .withColumn("_ir", F.row_number().over(w))
        .filter(F.col("_ir") <= k)
        .groupBy("_q")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("_rel")) - 1.0)
                / F.log2(F.col("_ir").cast("double") + 1.0)
            ).alias("_idcg")
        )
    )
    n_rel = qr.filter(F.col("_rel") > 0).groupBy("_q").agg(
        F.count(F.lit(1)).cast("long").alias("n_relevant")
    )

    spine = res.select("_q").union(qr.select("_q")).distinct()
    out = (
        spine.join(per_res, "_q", "left")
        .join(n_rel, "_q", "left")
        .join(ideal, "_q", "left")
    )
    return out.select(
        F.col("_q").alias(query_col),
        F.coalesce("n_retrieved", F.lit(0)).alias("n_retrieved"),
        F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
        F.round(
            F.coalesce(1.0 / F.col("_first_rel"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(
            F.when(
                F.col("n_relevant") > 0,
                F.coalesce(F.col("_hits"), F.lit(0)).cast("double")
                / F.col("n_relevant"),
            ),
            6,
        ).alias("recall"),
        F.round(
            F.when(
                F.col("_idcg") > 0,
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg"),
            ),
            6,
        ).alias("ndcg"),
    )


def rrf_fuse(
    results: Sequence[DataFrame],
    k: int = 60,
    topn: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of N
    retrieval systems' ranked lists → one hybrid ranking per query.

    Each input is ``(query_id, neighbor_id, rank)`` (rank 1-based, as
    every retrieval op here emits). ``rrf(d) = Σ_systems 1/(k +
    rank_s(d))`` — documents missing from a system's list simply
    contribute nothing, which is the whole point of RRF: no score
    calibration across systems (BM25 logits vs cosine vs quantized
    dots fuse without normalization). Scores round to 6 dp before the
    final ranking (ties → ascending neighbor_id) so the fused order is
    engine-exact.

    Shape: unionByName of the bounded per-query lists (each already
    ≤ top-k per system) → one hash-agg on (query_id, neighbor_id) →
    per-query rank window. Every stage is keyed by query id; input
    volume is |Q|·k·systems, independent of corpus size — fusion is a
    post-retrieval operator and never touches the corpus.
    """
    if not results:
        raise ValueError("need at least one result list")
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = ["query_id", "neighbor_id", "rank"]
    u = results[0].select(*cols)
    for r in results[1:]:
        u = u.unionByName(r.select(*cols))
    fused = (
        u.groupBy("query_id", "neighbor_id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))), 6
            ).alias("rrf")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf").desc(), F.col("neighbor_id").asc()
    )
    out = fused.withColumn("rank", F.row_number().over(w))
    if topn is not None:
        out = out.filter(F.col("rank") <= topn)
    return out.select("query_id", "neighbor_id", "rrf", "rank")
