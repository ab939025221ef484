"""Benchmark decontamination: flag corpus documents whose text
overlaps an evaluation/benchmark set by shared word n-grams.

The standard pre-training hygiene pass (the reference pipeline has no
analogue — this is a scale-native addition alongside dedup): a corpus
document is *contaminated* when it shares at least ``min_hits``
distinct n-grams with ANY benchmark document. Reported per doc:
distinct contaminated n-grams, total distinct n-grams, and the
contamination fraction, so the caller can threshold either count or
fraction.

Scale shape (10^12-doc corpus vs kB-MB benchmark suites):

- The benchmark n-gram set is the SMALL side — built once
  (explode + distinct) and **broadcast**, so the corpus side never
  shuffles: scan → generate grams (JVM higher-order funcs, no UDF)
  → explode → broadcast-hash semi-ish join → partial-aggregated
  groupBy(doc_id). The only exchange is the final per-doc count
  aggregation, which AQE sizes.
- When the benchmark side is too big to broadcast
  (``broadcast_bench=False``), both sides join on an 8-byte
  ``xxhash64`` of the gram instead of the gram string — same
  semantics (collisions ~2⁻⁶⁴ per pair), ~10-30× smaller shuffle
  payload than raw 13-gram strings.

N-gram construction is shared with the dedup tier (``dedup.
ngrams_col``): lowercase, whitespace-split, distinct n-grams —
SQL-reproducible, which is what makes the operator oracle-checkable
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.dedup import ngrams_col


def doc_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram) exploded distinct word n-grams per document."""
    return df.select(
        F.col(id_col), F.explode(ngrams_col(text_col, n)).alias("gram")
    )


def bench_ngram_set(bench: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct n-grams across the whole benchmark set — the small,
    broadcastable probe side."""
    return (
        bench.select(F.explode(ngrams_col(text_col, n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-corpus-doc contamination report against a benchmark set.

    Returns (``id_col``, total_ngrams, contaminated_ngrams,
    contamination_frac, contaminated) — one row per corpus document,
    including clean ones (left join; clean docs count 0). Distinct
    n-grams per doc, so a gram repeated inside one document counts
    once.

    ``broadcast_bench=True`` (default): benchmark gram set is
    broadcast — zero shuffle of the corpus gram stream before the
    per-doc aggregation. Set False for benchmark sets beyond the
    broadcast threshold: both sides pre-hash grams to ``xxhash64``
    and shuffle on the 8-byte key instead of the string.
    """
    bt = bench_text_col or text_col
    grams = doc_ngrams(corpus, id_col, text_col, n)
    probe = bench_ngram_set(bench, bt, n)
    if broadcast_bench:
        hits = grams.join(F.broadcast(probe), "gram")
    else:
        grams = grams.withColumn("gram", F.xxhash64("gram"))
        probe = probe.select(F.xxhash64("gram").alias("gram")).distinct()
        hits = grams.join(probe, "gram")
    per_doc_hits = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("contaminated_ngrams")
    )
    totals = corpus.select(
        F.col(id_col),
        F.size(ngrams_col(text_col, n)).alias("total_ngrams"),
    )
    out = totals.join(per_doc_hits, id_col, "left").select(
        id_col,
        "total_ngrams",
        F.coalesce("contaminated_ngrams", F.lit(0)).alias(
            "contaminated_ngrams"
        ),
    )
    frac = F.when(
        F.col("total_ngrams") > 0,
        F.round(
            F.col("contaminated_ngrams").cast("double")
            / F.col("total_ngrams").cast("double"),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("contamination_frac", frac).withColumn(
        "contaminated", F.col("contaminated_ngrams") >= F.lit(min_hits)
    )
