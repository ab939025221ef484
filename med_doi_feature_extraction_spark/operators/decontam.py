"""Benchmark decontamination: flag corpus documents whose text
overlaps an evaluation/benchmark set by shared word n-grams.

The standard pre-training hygiene pass (the reference pipeline has no
analogue — this is a scale-native addition alongside dedup): a corpus
document is *contaminated* when at least ``min_hits`` of its distinct
n-grams appear anywhere in the benchmark set (the union of all
benchmark documents' n-grams — not per-benchmark-doc overlap).
Reported per doc: distinct contaminated n-grams, total distinct
n-grams, and the contamination fraction, so the caller can threshold
either count or fraction.

Scale shape (10^12-doc corpus vs kB-MB benchmark suites): ONE pass
over the corpus — scan → generate distinct grams (JVM higher-order
funcs, no UDF) → ``explode_outer`` (gram-less docs keep a null-gram
row, so every doc survives to the report) → left join against the
**broadcast** benchmark gram set with a hit marker → ONE
groupBy(doc_id) counting grams and hits together. The corpus is
scanned once, its gram stream never shuffles, and the only exchange
is the final per-doc count aggregation, which AQE sizes.

When the benchmark side is too big to broadcast
(``broadcast_bench=False``), both sides join on an 8-byte
``xxhash64`` of the gram instead of the gram string — same semantics
(collisions ~2⁻⁶⁴ per pair), ~10-30× smaller shuffle payload than
raw 13-gram strings; the join becomes the one shuffle of the corpus
gram stream.

N-gram construction is shared with the dedup tier (``dedup.
ngrams_col``): lowercase, whitespace-split, distinct n-grams —
SQL-reproducible, which is what makes the operator oracle-checkable
end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.dedup import (
    ngrams_col,
    spread_scan,
)


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
    including clean and gram-less (empty/NULL text) ones. Distinct
    n-grams per doc, so a gram repeated inside one document counts
    once.

    ``broadcast_bench=True`` (default): benchmark gram set is
    broadcast — zero shuffle of the corpus gram stream before the
    per-doc aggregation. Set False for benchmark sets beyond the
    broadcast threshold: both sides pre-hash grams to ``xxhash64``
    and shuffle on the 8-byte key instead of the string.
    """
    bt = bench_text_col or text_col
    # explode_outer keeps a null-gram row for docs with no n-grams
    # (short or NULL text) — they must appear in the report with
    # total 0, not vanish or need a second corpus scan to recover.
    # spread_scan: gram generation is the CPU stage; a few-partition
    # scan (single local file) must fan out first (no-op at corpus
    # scale; measured 1.39→0.82 s at sf0.1 on 32 cores)
    grams = spread_scan(corpus.select(id_col, text_col)).select(
        F.col(id_col),
        F.explode_outer(ngrams_col(text_col, n)).alias("gram"),
    )
    probe = bench_ngram_set(bench, bt, n)
    if broadcast_bench:
        probe = F.broadcast(probe.withColumn("_hit", F.lit(1)))
        joined = grams.join(probe, "gram", "left")
    else:
        # xxhash64(NULL) returns the seed, not NULL — preserve the
        # null-gram marker rows explicitly or empty docs would count
        # one phantom gram
        grams = grams.withColumn(
            "gram",
            F.when(F.col("gram").isNotNull(), F.xxhash64("gram")),
        )
        probe = (
            probe.select(F.xxhash64("gram").alias("gram"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        joined = grams.join(probe, "gram", "left")
    out = joined.groupBy(id_col).agg(
        F.count("gram").alias("total_ngrams"),
        F.count("_hit").alias("contaminated_ngrams"),
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
