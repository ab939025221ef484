"""Text feature maps as JVM-side Column expressions (the fast path).

The reference extracts DOI/metadata features per record via LLM + JSON
parsing + dictionary normalization (reference ``src/services/parser.py``,
``src/utils.py:73-125``). Here the same feature surface is compiled to
built-in ``pyspark.sql.functions`` so it stays inside whole-stage
codegen — no Python in the hot path at all (north-rule: vectorized
only; built-ins beat even pandas UDFs).

Every function takes/returns Columns so callers compose them freely in
``select``/``withColumns``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FEATURES_VERSION = "1.0.0"

#: DOI syntax per the reference's DOI-as-key domain
#: (reference default id column ``DOI``, ``src/cli/commands_run.py:32``).
#: Java regex — used with regexp_extract_all / regexp_count.
DOI_REGEX = r"10\.\d{4,9}/[-._;()/:a-zA-Z0-9]+"

#: BPE-ish token splitter: words / numbers / single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+|[^\sA-Za-z\d]"

#: Small per-language marker-word lists for the n-gram/stopword
#: language-ID heuristic. Deterministic; oracle-expressible in SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "une"],
    "es": ["el", "los", "las", "es", "en", "que", "por", "una"],
}

_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "it", "on", "for", "as", "are"]


def doi_all(text: Column) -> Column:
    """Array of all DOI strings found in ``text``."""
    return F.regexp_extract_all(text, F.lit(DOI_REGEX), 0)


def doi_count(text: Column) -> Column:
    return F.size(doi_all(text)).cast("int")


def doi_first(text: Column) -> Column:
    """First DOI or null — replaces the reference's LLM DOI extraction."""
    arr = doi_all(text)
    return F.when(F.size(arr) > 0, F.element_at(arr, 1)).otherwise(F.lit(None))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("int")


def token_count_bpe(text: Column) -> Column:
    """BPE-ish regex token count (words / numbers / symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)).cast("int")


def _word_count(text: Column, word: str) -> Column:
    # \b word boundaries; case-insensitive via lower().
    return F.regexp_count(F.lower(text), F.lit(rf"\b{word}\b"))


def _words_count(text: Column, words: list[str]) -> Column:
    """Total hits of ANY of ``words`` in ONE regex scan. Equal to the
    sum of per-word counts (each \\b-delimited token matches exactly
    one alternation branch), but one pass over the text instead of
    len(words) passes — the scalar surface runs over every document,
    so scan count is the hot-path cost."""
    import re as _re

    pat = r"\b(?:" + "|".join(_re.escape(w) for w in words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def lang_marker_score(text: Column, lang: str) -> Column:
    """Number of marker-word hits for ``lang`` in ``text``."""
    return _words_count(text, LANG_MARKERS[lang]).cast("int")


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-word hits, 'und' if no
    hits. Ties break by language-code sort order (deterministic)."""
    langs = sorted(LANG_MARKERS)
    scores = [lang_marker_score(text, lg).alias(lg) for lg in langs]
    best = F.greatest(*scores)
    result = F.lit("und")
    # reversed so the FIRST lang in sorted order wins ties.
    for lg, sc in reversed(list(zip(langs, scores))):
        result = F.when((best > 0) & (sc == best), F.lit(lg)).otherwise(result)
    return result


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation/symbols.

    regexp_count instead of length(regexp_replace(...)): counting
    matches avoids materializing a stripped copy of every document."""
    n = F.length(text)
    n_punct = F.regexp_count(text, F.lit(r"\p{Punct}"))
    return F.when(n > 0, n_punct.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def stopword_ratio(text: Column) -> Column:
    """Fraction of whitespace tokens that are (English) stopwords."""
    n = token_count_ws(text)
    hits = _words_count(text, sorted(set(_STOPWORDS)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(
        F.lit(0.0)
    )


def quality_score(text: Column) -> Column:
    """Composite document-quality score in [0,1]: length band +
    stopword presence − punctuation excess. Deterministic and
    SQL-expressible (oracle in ``__spark_entry__.oracle_sql``)."""
    length_band = (
        F.when(F.length(text) >= 200, F.lit(0.5))
        .when(F.length(text) >= 50, F.lit(0.3))
        .when(F.length(text) > 0, F.lit(0.1))
        .otherwise(F.lit(0.0))
    )
    sw = F.least(stopword_ratio(text) * 2.0, F.lit(0.3))
    punct_penalty = F.least(punct_ratio(text), F.lit(0.2))
    return F.round(
        F.least(F.greatest(length_band + sw - punct_penalty, F.lit(0.0)), F.lit(1.0)),
        6,
    )
