"""Positional phrase search over the tokenized corpus.

`corpus_stats.build_postings` answers "which documents contain this
token"; retrieval pipelines (decontamination against quoted eval
prompts, attribution of memorized spans, boolean+phrase corpus
probes) also need "which documents contain this exact PHRASE" —
token adjacency, not co-occurrence. The reference greps each record
in isolation; at 10^12 documents the phrase query must be an
index-shaped plan, not a rescan of every byte.

Execution shape, 100 TB lens (the classic positional-index join):

- ONE scan builds the (doc, pos, token) stream via ``posexplode`` of
  the whitespace tokenizer (`dedup.ngrams_all_col(·, 1)` — the same
  normalization every other token operator uses).
- A scan-stage ``isin`` filter keeps ONLY the phrase's tokens — the
  Zipf-sized stream collapses to the phrase terms' occurrence lists
  before anything shuffles (this is the "read the posting lists, not
  the corpus" shape; with a materialized positional index the scan
  is a pushed-down token-range read).
- The k-token phrase is a (k−1)-way self-equi-join on
  ``(doc, pos + i)`` — all joins share the ``(doc, pos)`` key space,
  so one exchange co-partitions every leg. Each leg is pre-filtered
  to ONE token's occurrences; no positional-array explode survives
  the join.
- Per-doc aggregation (match count, first position) is a final
  hash-agg on doc.

Duplicate phrase terms ("the the") are handled naturally — each leg
filters to its own term, the position arithmetic enforces adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEARCH_VERSION = "search/v1"


def _norm_phrase(phrase: str) -> list[str]:
    terms = [t for t in phrase.lower().strip().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    return terms


def token_positions(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(doc, pos, token) occurrence stream — one posexplode of the
    shared whitespace tokenizer. trim + ``\\s+`` means '' tokens only
    arise for the empty document (position 0), so dropping them never
    shifts a real token's position."""
    from med_doi_feature_extraction_spark.operators.dedup import (
        ngrams_all_col,
    )

    tok = F.posexplode(ngrams_all_col(text_col, 1))
    return df.select(
        F.col(id_col).alias("doc"), tok.alias("pos", "token")
    ).filter(F.length("token") > 0)


def phrase_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Documents containing ``phrase`` as consecutive whitespace
    tokens (case-insensitive, the corpus tokenizer's normalization):
    one row per matching doc — ``(doc, n_matches, first_pos)``.

    ``phrase`` is a plan literal (the query); overlapping matches
    each count (``"a a a"`` contains ``"a a"`` twice).
    """
    terms = _norm_phrase(phrase)
    occ = token_positions(df, id_col, text_col).filter(
        F.col("token").isin(terms)
    )
    legs = [
        occ.filter(F.col("token") == t).select(
            "doc", (F.col("pos") - F.lit(i)).alias("start")
        )
        for i, t in enumerate(terms)
    ]
    m = legs[0]
    for leg in legs[1:]:
        m = m.join(leg, ["doc", "start"])
    return m.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("start").cast("int").alias("first_pos"),
    )


def oracle_phrase_sql(
    rel_sql: str, id_col: str, text_col: str, phrase: str
) -> str:
    """DuckDB twin of :func:`phrase_search` — same tokenizer, same
    leg-per-term adjacency joins."""
    terms = _norm_phrase(phrase)
    esc = [t.replace("'", "''") for t in terms]
    legs = ",\n".join(
        f"""lg{i} AS (
  SELECT doc, pos - {i} AS start FROM occ WHERE token = '{t}'
)"""
        for i, t in enumerate(esc)
    )
    joins = "".join(
        f" JOIN lg{i} USING (doc, start)" for i in range(1, len(terms))
    )
    return rf"""
WITH toks AS (
  SELECT "{id_col}" AS doc,
         string_split_regex(lower(trim("{text_col}")), '\s+') AS a
  FROM {rel_sql}
),
occ AS (
  SELECT doc, CAST(i - 1 AS INT) AS pos, a[i] AS token
  FROM toks, unnest(range(1, len(a) + 1)) AS u(i)
  WHERE length(a[i]) > 0
),
{legs}
SELECT doc,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(start) AS INT) AS first_pos
FROM lg0{joins}
GROUP BY doc
"""
