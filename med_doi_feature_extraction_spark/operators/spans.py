"""Exact repeated-span deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499).

Whole-document dedup (exact/minhash) misses the dominant duplication
mode in web text: long VERBATIM spans (license boilerplate, quoted
articles, templated footers) embedded in otherwise-distinct
documents. The reference paper finds them with a corpus-wide suffix
array; that structure is inherently sequential, so the distributed
re-expression here is the standard k-gram-anchor form:

1. tokenize keeping positions (one posexplode);
2. hash every k-token window (``xxhash64`` on the gram string — the
   8-byte shuffle key, same precedent as paragraph/decontam grams;
   the oracle groups by the gram STRING, collision odds 2⁻⁶⁴);
3. two-level agg per gram hash → (n_docs it appears in, owner =
   min doc id) — the distinct-(gram, doc) partial agg collapses
   within-doc repeats map-side before the skewed gram key shuffles
   (hot boilerplate grams are exactly the Zipf head);
4. a gram occurrence is REMOVABLE iff it appears in ≥2 docs and this
   doc is not the owner (keep-first-copy policy, deterministic and
   layout-independent);
5. token coverage WITHOUT a k× explode: a token at position p is
   covered iff any gram starting in [p-k+1, p] is removable — ONE
   range-frame window max per doc, not k duplicated rows per token;
6. rebuild the surviving text per doc (bounded by document length,
   same contract as the paragraph-dedup rebuild).

Every step is Column algebra / keyed windows — no UDFs, no driver
collects. A span shorter than k tokens never matches (the paper's
threshold, typically 50 BPE tokens; default here is token k=8 so the
synthetic fixtures exercise it).

Semantics notes: matching is on RAW whitespace tokens (reconstruction
must be able to emit the original text; callers wanting
case-insensitive matching lowercase upstream). The owner document
keeps ALL its occurrences (including self-repeats — in-document
repetition is ``operators/repetition.py``'s job); non-owner documents
lose every token covered by a shared gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 8


def _raw_tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0
    )


def _grams_of(tokens: F.Column, k: int) -> F.Column:
    """All k-token gram strings (space-joined, document order) of a
    token array — JVM zip_with slices, linear in length."""
    width = F.greatest(F.size(tokens) - (k - 1), F.lit(0))
    grams = F.slice(tokens, 1, width)
    for i in range(1, k):
        grams = F.zip_with(
            grams, F.slice(tokens, i + 1, width),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    return grams


def repeated_gram_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """(gram_hash, n_docs, owner_id) for every k-gram appearing in at
    least 2 distinct documents."""
    grams = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(_grams_of(_raw_tokens(text_col), k)).alias("_g"),
    ).select("_doc", F.xxhash64("_g").alias("_gh"))
    per_doc = grams.groupBy("_gh", "_doc").agg(F.lit(1).alias("_one"))
    return (
        per_doc.groupBy("_gh")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("_doc").alias("owner_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(F.col("_gh").alias("gram_hash"), "n_docs", "owner_id")
    )


def dedup_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = DEFAULT_K
) -> DataFrame:
    """(id, clean_text, n_tokens, removed_tokens): cross-document
    repeated spans (≥ k tokens) removed from every non-owner doc."""
    toked = df.select(
        F.col(id_col).alias("_doc"), _raw_tokens(text_col).alias("_toks")
    )
    tokens = toked.select(
        "_doc", F.posexplode("_toks").alias("_pos", "_tok")
    )
    gram_flags = (
        toked.select(
            "_doc", F.posexplode(_grams_of(F.col("_toks"), k)).alias("_pos", "_g")
        )
        .select("_doc", "_pos", F.xxhash64("_g").alias("gram_hash"))
        .join(
            repeated_gram_stats(df, id_col, text_col, k), "gram_hash", "inner"
        )
        .select(
            "_doc", "_pos",
            (F.col("_doc") != F.col("owner_id")).cast("int").alias("_rm"),
        )
    )
    w = (
        Window.partitionBy("_doc")
        .orderBy("_pos")
        .rangeBetween(-(k - 1), 0)
    )
    covered = (
        tokens.join(gram_flags, ["_doc", "_pos"], "left")
        .withColumn("_cov", F.max("_rm").over(w))
        .filter(F.col("_cov").isNull() | (F.col("_cov") == 0))
    )
    rebuilt = covered.groupBy("_doc").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_tok")))
                ),
                lambda s: s["_tok"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("kept_tokens"),
    )
    # from the token ARRAY, not the exploded rows: an all-whitespace
    # doc has zero token rows but must still appear in the output
    totals = toked.select("_doc", F.size("_toks").alias("n_tokens"))
    return (
        totals.join(rebuilt, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("kept_tokens", F.lit(0))).alias(
                "removed_tokens"
            ),
        )
    )
