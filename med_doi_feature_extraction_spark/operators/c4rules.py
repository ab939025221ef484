"""C4-style structural line filtering (Raffel et al. 2020, §2.2).

The C4 cleaning pass that turned Common Crawl into a usable LM corpus
is LINE-structural, not statistical: keep only lines that look like
prose (terminal punctuation, a minimum word count, no
cookie/javascript boilerplate), then drop documents that come out too
short or contain known template markers (``lorem ipsum``, source-code
``{``). It is complementary to the Gopher repetition rules
(`operators/repetition.py`) and the LM/compression quality scores
(`operators/lm.py`, `kernels/compress.py`): those score content,
this enforces prose SHAPE. The reference has no analogue (its inputs
are already-clean metadata records).

Execution shape: everything is per-row array algebra over the line
split — ``split → filter(lambda) → array_join`` — inside one
whole-stage-codegen span on the scan; no shuffle, no UDF, no state.
The DuckDB twins (``oracle_*_sql``) run the same lambda pipeline via
``list_filter``/``list_transform``, so every count, flag, and the
rebuilt text itself are hash-checkable cross-engine.

Line predicate (C4's, parameterized): a line SURVIVES iff it ends in
terminal punctuation (``. ! ? "`` plus CJK/curly closers — checked on the
trailing-whitespace-trimmed line, so CRLF endings don't defeat it)
AND has at least ``min_words`` whitespace words AND does not contain
a boilerplate phrase (case-insensitive: "javascript", "cookie
policy", "terms of use", "privacy policy" — C4's list). Document
gate: at least ``min_lines`` surviving lines, no "lorem ipsum", no
``{`` anywhere in the original text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Case-insensitive substrings that disqualify a LINE (C4 §2.2).
LINE_BLOCK_PHRASES = [
    "javascript",
    "cookie policy",
    "terms of use",
    "privacy policy",
]

#: Case-insensitive substrings that disqualify the whole DOCUMENT.
DOC_BLOCK_PHRASES = ["lorem ipsum"]

#: C4's rule is "period, exclamation, question mark, or end quotation
#: mark"; widened with the CJK full-width terminals (。！？) and curly
#: closers (” ’) so multilingual prose isn't structurally deleted —
#: C4 itself was English-only, this engine is not. Shared verbatim
#: with the DuckDB twin (no apostrophe → safe inside a SQL literal).
_TERMINAL = '[.!?"”’。！？]$'


def _lines(text: Column) -> Column:
    return F.split(F.coalesce(text, F.lit("")), "\n")


def _clean(line: Column) -> Column:
    """Trailing-whitespace(+CR)-trimmed line."""
    return F.regexp_replace(line, r"[\s\r]+$", "")


def _line_ok(line: Column, min_words: int) -> Column:
    t = _clean(line)
    words = F.size(
        F.filter(F.split(t, r"\s+"), lambda x: F.length(x) > 0)
    )
    ok = t.rlike(_TERMINAL) & (words >= min_words)
    low = F.lower(t)
    for phrase in LINE_BLOCK_PHRASES:
        ok = ok & ~low.contains(phrase)
    return ok


def surviving_lines(text: Column, min_words: int = 3) -> Column:
    """Array of lines passing the C4 line predicate, in order."""
    return F.filter(_lines(text), lambda l: _line_ok(l, min_words))


def c4_line_stats(text: Column, min_words: int = 3) -> dict[str, Column]:
    """Per-doc structural counters: total lines, surviving lines,
    terminal-punctuation line fraction (4 dp over non-empty lines;
    0.0 for a doc with no non-empty line)."""
    lines = _lines(text)
    nonempty = F.filter(lines, lambda l: F.length(_clean(l)) > 0)
    punct = F.filter(nonempty, lambda l: _clean(l).rlike(_TERMINAL))
    n_nonempty = F.size(nonempty)
    return {
        "n_lines": F.size(lines),
        "n_kept_lines": F.size(surviving_lines(text, min_words)),
        "end_punct_frac": F.when(
            n_nonempty > 0,
            F.round(F.size(punct).cast("double") / n_nonempty, 4),
        ).otherwise(F.lit(0.0)),
    }


def c4_doc_flags(text: Column) -> dict[str, Column]:
    low = F.lower(F.coalesce(text, F.lit("")))
    flags = {"has_brace": low.contains("{")}
    for phrase in DOC_BLOCK_PHRASES:
        flags["has_" + phrase.replace(" ", "_")] = low.contains(phrase)
    return flags


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 3,
    out_col: str = "clean_text",
    keep_col: str = "c4_keep",
) -> DataFrame:
    """Rebuild each document from its surviving lines and gate it:
    ``keep`` iff ≥ ``min_lines`` lines survive and no document-level
    blocker fires. The original column is kept (curation audits
    diff original vs clean); drop it at the write site."""
    text = F.col(text_col)
    kept = surviving_lines(text, min_words)
    flags = c4_doc_flags(text)
    blocked = flags["has_brace"]
    for name, c in flags.items():
        if name != "has_brace":
            blocked = blocked | c
    return df.withColumns(
        {
            out_col: F.array_join(F.transform(kept, _clean), "\n"),
            keep_col: (F.size(kept) >= min_lines) & ~blocked,
        }
    )


# --- DuckDB twins ----------------------------------------------------

_SQL_CLEAN = "regexp_replace({l}, '[\\s\\r]+$', '')"


def _sql_line_ok(min_words: int) -> str:
    """Lambda body over DuckDB variable ``l`` (a cleaned line)."""
    words = (
        "len(list_filter(string_split_regex({t}, '\\s+'),"
        " w -> len(w) > 0))"
    )
    t = _SQL_CLEAN.format(l="l")
    cond = (
        f"regexp_matches({t}, '{_TERMINAL}') AND"
        f" {words.format(t=t)} >= {min_words}"
    )
    for phrase in LINE_BLOCK_PHRASES:
        cond += f" AND NOT contains(lower({t}), '{phrase}')"
    return cond


def oracle_kept_lines_sql(text_expr: str, min_words: int = 3) -> str:
    """DuckDB list of cleaned surviving lines for ``text_expr``."""
    kept = (
        f"list_filter(string_split(coalesce({text_expr}, ''), chr(10)),"
        f" l -> {_sql_line_ok(min_words)})"
    )
    return f"list_transform({kept}, l -> {_SQL_CLEAN.format(l='l')})"


def oracle_c4_sql(
    text_expr: str, min_words: int = 3, min_lines: int = 3
) -> dict[str, str]:
    """Expression map mirroring :func:`c4_line_stats` +
    :func:`c4_clean` (keys: n_lines, n_kept_lines, end_punct_frac,
    clean_text, c4_keep)."""
    lines = f"string_split(coalesce({text_expr}, ''), chr(10))"
    clean = _SQL_CLEAN.format(l="l")
    nonempty = f"list_filter({lines}, l -> len({clean}) > 0)"
    punct = (
        f"list_filter({nonempty}, l -> regexp_matches({clean}, '{_TERMINAL}'))"
    )
    kept = oracle_kept_lines_sql(text_expr, min_words)
    low = f"lower(coalesce({text_expr}, ''))"
    blocked = " OR ".join(
        [f"contains({low}, '{{')"]
        + [f"contains({low}, '{p}')" for p in DOC_BLOCK_PHRASES]
    )
    return {
        "n_lines": f"len({lines})",
        "n_kept_lines": f"len({kept})",
        "end_punct_frac": (
            f"CASE WHEN len({nonempty}) > 0 THEN"
            f" round(len({punct})::DOUBLE / len({nonempty}), 4)"
            f" ELSE 0.0 END"
        ),
        # array_to_string([]) is NULL in DuckDB but '' in Spark's
        # array_join — coalesce to the Spark semantics
        "clean_text": f"coalesce(array_to_string({kept}, chr(10)), '')",
        "c4_keep": f"(len({kept}) >= {min_lines} AND NOT ({blocked}))",
    }
