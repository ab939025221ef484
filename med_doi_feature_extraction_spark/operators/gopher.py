"""Gopher word-statistics quality rules (Rae et al. 2021, §A1.1).

The OTHER half of the Gopher filter battery: `operators/repetition.py`
implements the duplicate-line/n-gram rules; this module implements the
word-shape rules that deleted most of MassiveWeb's garbage — word
count bounds, mean word length, symbol-to-word ratio (``#`` and
``...`` spam), bullet/ellipsis line fractions, alphabetic-word
fraction, and the ≥2-English-stopwords prose check. RefinedWeb,
Dolma and FineWeb all re-use this exact rule set, so it is a
first-class component of a web-scale curation engine; the reference
has no analogue (its records are already-clean metadata).

Execution shape: one codegen span over the scan — the word array is
computed once and every statistic is array algebra over it; no
shuffle, no UDF, no Python. Every expression has a DuckDB twin
generated from the same constants (``oracle_gopher_sql``), including
the ordered ``fail_reasons`` list, so the whole verdict — not just
the counters — is hash-checkable cross-engine.

Numeric convention: fractions/ratios rounded to 4 dp (module-wide
cross-engine float discipline); mean word length is exact
``non-ws-chars / n_words`` rounded 4 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Gopher's prose-evidence stopword list (Rae 2021 §A1.1): a document
#: must contain at least ``min_stopwords`` DISTINCT entries.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: Leading characters that mark a bullet line.
_BULLET = r"^[\-\*•‣▪▸]"
_ELLIPSIS = r"(\.\.\.|…)$"
_SYMBOL = r"#|\.\.\."

#: (rule name, default bound) — bounds are overridable per call.
DEFAULT_BOUNDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,
    "max_bullet_frac": 0.9,
    "max_ellipsis_frac": 0.3,
    "min_alpha_frac": 0.8,
    "min_stopwords": 2,
}


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.coalesce(text, F.lit("")), r"\s+"),
        lambda w: F.length(w) > 0,
    )


def _lines(text: Column) -> Column:
    return F.filter(
        F.split(F.coalesce(text, F.lit("")), "\n"),
        lambda l: F.length(F.trim(l)) > 0,
    )


def _frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.round(num.cast("double") / den, 4)).otherwise(
        F.lit(0.0)
    )


def gopher_stats(text: Column) -> dict[str, Column]:
    """All Gopher word statistics as named Columns (see module doc)."""
    words = _words(text)
    lines = _lines(text)
    n_words = F.size(words)
    n_lines = F.size(lines)
    nonws = F.length(
        F.regexp_replace(F.coalesce(text, F.lit("")), r"\s", "")
    )
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    bullets = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike(_BULLET))
    )
    ellipsis = F.size(
        F.filter(
            lines,
            lambda l: F.regexp_replace(l, r"[\s\r]+$", "").rlike(_ELLIPSIS),
        )
    )
    symbols = F.coalesce(
        F.regexp_count(F.coalesce(text, F.lit("")), F.lit(_SYMBOL)),
        F.lit(0),
    )
    lowered = F.transform(words, F.lower)
    # one set-intersect instead of |stopwords| array_contains passes:
    # Σ contains(lowered, s) counts DISTINCT stopwords present, which
    # is exactly |array_intersect(lowered, stopwords)| (intersect
    # dedups); empty/NULL text yields [] → 0 on both forms
    n_stop = F.size(
        F.array_intersect(
            lowered, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": _frac(nonws, n_words),
        "symbol_ratio": _frac(symbols, n_words),
        "bullet_frac": _frac(bullets, n_lines),
        "ellipsis_frac": _frac(ellipsis, n_lines),
        "alpha_frac": _frac(alpha, n_words),
        "n_stopwords": n_stop,
    }


def _rule_conds(stats: dict[str, Column], b: dict) -> list[tuple[str, Column]]:
    """(rule name, FAIL condition) pairs, fixed order."""
    return [
        ("too_few_words", stats["n_words"] < b["min_words"]),
        ("too_many_words", stats["n_words"] > b["max_words"]),
        ("mean_word_len", (stats["mean_word_len"] < b["min_mean_word_len"])
         | (stats["mean_word_len"] > b["max_mean_word_len"])),
        ("symbol_ratio", stats["symbol_ratio"] > b["max_symbol_ratio"]),
        ("bullet_lines", stats["bullet_frac"] > b["max_bullet_frac"]),
        ("ellipsis_lines", stats["ellipsis_frac"] > b["max_ellipsis_frac"]),
        ("alpha_words", stats["alpha_frac"] < b["min_alpha_frac"]),
        ("stopwords", stats["n_stopwords"] < b["min_stopwords"]),
    ]


def gopher_gate(
    df: DataFrame,
    text_col: str = "text",
    keep_col: str = "gopher_keep",
    reasons_col: str = "fail_reasons",
    **bounds,
) -> DataFrame:
    """Attach the statistics, the ordered list of failed rule names,
    and the keep verdict. ``bounds`` override :data:`DEFAULT_BOUNDS`
    entries (e.g. ``min_words=20`` for short-document corpora)."""
    unknown = set(bounds) - set(DEFAULT_BOUNDS)
    if unknown:
        raise ValueError(f"unknown bounds: {sorted(unknown)}")
    b = {**DEFAULT_BOUNDS, **bounds}
    stats = gopher_stats(F.col(text_col))
    conds = _rule_conds(stats, b)
    reasons = F.filter(
        F.array(
            *[F.when(c, F.lit(name)) for name, c in conds]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumns(
        {
            **stats,
            reasons_col: reasons,
            keep_col: F.size(reasons) == 0,
        }
    )


# --- DuckDB twin ------------------------------------------------------

def oracle_gopher_sql(text_expr: str, **bounds) -> dict[str, str]:
    """Expression map mirroring :func:`gopher_gate` (stats +
    fail_reasons + gopher_keep), generated from the same constants."""
    b = {**DEFAULT_BOUNDS, **bounds}
    t = f"coalesce({text_expr}, '')"
    words = f"list_filter(string_split_regex({t}, '\\s+'), w -> len(w) > 0)"
    lines = (
        f"list_filter(string_split({t}, chr(10)), l -> len(trim(l)) > 0)"
    )
    n_words = f"len({words})"
    n_lines = f"len({lines})"
    nonws = f"length(regexp_replace({t}, '\\s', '', 'g'))"
    alpha = f"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))"
    bullets = (
        f"len(list_filter({lines}, l -> regexp_matches(ltrim(l), '{_BULLET}')))"
    )
    ellipsis = (
        f"len(list_filter({lines}, l -> regexp_matches("
        f"regexp_replace(l, '[\\s\\r]+$', ''), '{_ELLIPSIS}')))"
    )
    symbols = f"len(regexp_extract_all({t}, '{_SYMBOL}'))"
    lowered = f"list_transform({words}, w -> lower(w))"
    n_stop = " + ".join(
        f"CASE WHEN list_contains({lowered}, '{s}') THEN 1 ELSE 0 END"
        for s in GOPHER_STOPWORDS
    )

    def frac(num: str, den: str) -> str:
        return (
            f"CASE WHEN {den} > 0 THEN round(({num})::DOUBLE / ({den}), 4)"
            f" ELSE 0.0 END"
        )

    stats = {
        "n_words": n_words,
        "mean_word_len": frac(nonws, n_words),
        "symbol_ratio": frac(symbols, n_words),
        "bullet_frac": frac(bullets, n_lines),
        "ellipsis_frac": frac(ellipsis, n_lines),
        "alpha_frac": frac(alpha, n_words),
        "n_stopwords": f"({n_stop})",
    }
    fails = [
        ("too_few_words", f"({n_words}) < {b['min_words']}"),
        ("too_many_words", f"({n_words}) > {b['max_words']}"),
        ("mean_word_len", f"(({stats['mean_word_len']}) < {b['min_mean_word_len']}"
         f" OR ({stats['mean_word_len']}) > {b['max_mean_word_len']})"),
        ("symbol_ratio", f"({stats['symbol_ratio']}) > {b['max_symbol_ratio']}"),
        ("bullet_lines", f"({stats['bullet_frac']}) > {b['max_bullet_frac']}"),
        ("ellipsis_lines",
         f"({stats['ellipsis_frac']}) > {b['max_ellipsis_frac']}"),
        ("alpha_words", f"({stats['alpha_frac']}) < {b['min_alpha_frac']}"),
        ("stopwords", f"({n_stop}) < {b['min_stopwords']}"),
    ]
    arr = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' ELSE NULL END" for name, cond in fails
    )
    reasons = f"list_filter([{arr}], x -> x IS NOT NULL)"
    return {
        **stats,
        "fail_reasons": reasons,
        "gopher_keep": f"len({reasons}) = 0",
    }
