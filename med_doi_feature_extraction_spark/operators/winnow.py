"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
the MOSS algorithm).

Where this sits in the dedup tier: ``spans.py`` indexes EVERY k-gram
(exact span removal), ``dedup.minhash_*`` sketches whole-document
similarity. Winnowing is the middle ground — a SAMPLED k-gram index
with a positional guarantee: from each window of ``w`` consecutive
gram hashes keep the minimum, and any shared span of at least
``w + k − 1`` tokens is GUARANTEED to contribute at least one common
fingerprint, while the expected index density is only ``2/(w+1)`` of
the full gram table. That makes pairwise overlap detection ~(w+1)/2×
cheaper to index and shuffle than the full-gram approach at the same
detection threshold — the right tool for "which documents plagiarize
which" over a crawl, as opposed to "remove this exact span".

Execution shape, 100 TB lens:

- :func:`winnow_fingerprints` — everything per-document happens
  INSIDE one whole-stage-codegen projection: tokenize once, k-gram
  once (``dedup.ngrams_all_col`` — the tier's shared normalization),
  hash each gram, take windowed minima via higher-order array ops,
  ``array_distinct``, ONE explode. O(n·k) hashing + O(n·w) minima
  per row, no UDF, no shuffle until the fingerprint table exists.
- :func:`winnow_pairs` — hot-fingerprint cap FIRST (a fingerprint
  shared by > ``max_docs_per_fp`` documents is template noise, the
  same Zipf-head argument as ``dedup``'s hot-band cap; dropped
  fingerprints are counted, not silently ignored — they still
  contribute to per-doc totals), THEN the self-equi-join on the
  capped table. Pair expansion is bounded by cap²·n_fps, never
  corpus².

Cross-engine determinism: the gram hash is the portable
sha256-prefix integer (``conv(substr(sha2(g),1,8),16,10)`` ↔
DuckDB ``('0x' || substr(sha256(g),1,8))::BIGINT`` — the
sampling.py idiom), so the DuckDB oracle reproduces the EXACT
fingerprint sets, not a statistical twin. Production swap: replace
with ``xxhash64`` for ~10× cheaper hashing once cross-engine
checking is no longer needed — selection logic is hash-agnostic.
Tie handling: plain winnowing keeps the minimum VALUE per window and
the per-document set is deduplicated, so argmin position ties are
irrelevant by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.dedup import ngrams_all_col


def _gram_hash(g):
    """Portable 32-bit-range integer hash of a gram string."""
    return F.conv(F.substring(F.sha2(g, 256), 1, 8), 16, 10).cast(
        "long"
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Distinct winnowing fingerprints per document: one row per
    ``(id_col, fp)``. Guarantee: two documents sharing a verbatim
    normalized-token span of ≥ ``w + k − 1`` tokens share ≥ 1
    fingerprint; no match shorter than ``k`` tokens is ever
    detected. Documents with fewer than ``k`` tokens emit nothing.
    """
    if k < 1 or w < 1:
        raise ValueError("winnow needs k >= 1 and w >= 1")
    hashes = F.transform(
        ngrams_all_col(text_col, k), lambda g: _gram_hash(g)
    )
    staged = df.select(
        F.col(id_col), hashes.alias("_h")
    ).withColumn("_nw", F.size("_h") - F.lit(w - 1))
    mins = F.transform(
        F.sequence(F.lit(1), F.col("_nw")),
        lambda j: F.array_min(F.slice(F.col("_h"), j, w)),
    )
    fps = F.when(F.col("_nw") >= 1, F.array_distinct(mins)).otherwise(
        F.array().cast("array<long>")
    )
    return staged.select(
        F.col(id_col), F.explode(fps).alias("fp")
    )


def winnow_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_docs_per_fp: int = 256,
) -> DataFrame:
    """Pairwise fingerprint overlap: one row per unordered document
    pair sharing ≥ 1 NON-HOT fingerprint — ``(id_a, id_b,
    n_shared, n_fps_a, n_fps_b, jaccard_est, containment_est)``
    (6 dp). ``n_fps_*`` count ALL fingerprints of the document (hot
    ones included — totals describe the document, the cap only
    limits pair EXPANSION), so the estimates are conservative for
    template-heavy pairs. ``id_a < id_b``.
    """
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    totals = fps.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("_n_fps")
    )
    doc_freq = fps.groupBy("fp").agg(
        F.count(F.lit(1)).cast("long").alias("_df")
    )
    cold = fps.join(
        doc_freq.filter(F.col("_df") <= max_docs_per_fp), "fp"
    ).select(id_col, "fp")
    a = cold.select(
        F.col(id_col).alias("_ida"), F.col("fp")
    )
    b = cold.select(
        F.col(id_col).alias("_idb"), F.col("fp")
    )
    shared = (
        a.join(b, "fp")
        .filter(F.col("_ida") < F.col("_idb"))
        .groupBy("_ida", "_idb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    out = (
        shared.join(
            totals.select(
                F.col(id_col).alias("_ida"),
                F.col("_n_fps").alias("n_fps_a"),
            ),
            "_ida",
        )
        .join(
            totals.select(
                F.col(id_col).alias("_idb"),
                F.col("_n_fps").alias("n_fps_b"),
            ),
            "_idb",
        )
    )
    union = (
        F.col("n_fps_a") + F.col("n_fps_b") - F.col("n_shared")
    )
    jac = F.col("n_shared").cast("double") / union.cast("double")
    cont = F.col("n_shared").cast("double") / F.least(
        "n_fps_a", "n_fps_b"
    ).cast("double")
    return out.select(
        F.col("_ida").alias("id_a"),
        F.col("_idb").alias("id_b"),
        "n_shared",
        "n_fps_a",
        "n_fps_b",
        F.round(jac, 6).alias("jaccard_est"),
        F.round(cont, 6).alias("containment_est"),
    )


def oracle_winnow_pairs_sql(
    rel_sql: str,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
    max_docs_per_fp: int = 256,
) -> str:
    """DuckDB twin of :func:`winnow_pairs` — identical normalization,
    gram construction, portable hash, window minima and caps."""
    return rf"""
WITH toks AS (
  SELECT "{id_col}" AS id,
         string_split_regex(lower(trim("{text_col}")), '\s+') AS t
  FROM {rel_sql}
),
hashed AS (
  SELECT id,
         list_transform(
           list_transform(
             range(1, greatest(len(t) - {k - 1}, 0) + 1),
             i -> array_to_string(list_slice(t, i, i + {k - 1}), ' ')
           ),
           g -> CAST(('0x' || substr(sha256(g), 1, 8)) AS BIGINT)
         ) AS h
  FROM toks
),
fps AS (
  SELECT DISTINCT id, fp
  FROM (
    SELECT id,
           unnest(list_transform(
             range(1, greatest(len(h) - {w - 1}, 0) + 1),
             j -> list_min(list_slice(h, j, j + {w - 1}))
           )) AS fp
    FROM hashed
  )
),
totals AS (SELECT id, CAST(count(*) AS BIGINT) AS n_fps
           FROM fps GROUP BY id),
cold AS (
  SELECT id, fp FROM fps
  WHERE fp IN (SELECT fp FROM fps GROUP BY fp
               HAVING count(*) <= {max_docs_per_fp})
),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM cold a JOIN cold b ON a.fp = b.fp AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT s.id_a, s.id_b, s.n_shared,
       ta.n_fps AS n_fps_a, tb.n_fps AS n_fps_b,
       round((s.n_shared)::DOUBLE
             / (ta.n_fps + tb.n_fps - s.n_shared)::DOUBLE, 6)
         AS jaccard_est,
       round((s.n_shared)::DOUBLE
             / least(ta.n_fps, tb.n_fps)::DOUBLE, 6)
         AS containment_est
FROM shared s
JOIN totals ta ON ta.id = s.id_a
JOIN totals tb ON tb.id = s.id_b
"""
