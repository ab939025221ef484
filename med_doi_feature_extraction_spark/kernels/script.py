"""Unicode script profiling: per-document writing-system census.

Language-ID (``kernels/features.lang_id``, ``kernels/lang_trigram``)
assumes the text is in a script its models know; on web crawls the
FIRST routing decision is coarser — which writing system is this
page even in? Script detection needs no models: it is a census of
codepoint ranges, which compiles to pure JVM-side Column algebra
(``length(x) - length(regexp_replace(x, '[range]', ''))``), stays
inside whole-stage codegen, and has an exactly-matching DuckDB twin
because both engines count Unicode codepoints and both regex engines
(Java / RE2) accept ``\\x{XXXX}`` class ranges. The reference has no
analogue (its corpus is English metadata CSV); this is the webtext
routing step every multilingual pipeline runs before lang-id.

All ranges are BMP-only so ``length`` (codepoints) agrees across
engines regardless of UTF-16 surrogate handling; astral-plane
characters (emoji, rare CJK extensions) simply count toward no
script, which is the right default for a routing census.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Script name → regex character-class body (Java and RE2 both accept
#: the ``\x{XXXX}`` escape). Order is the dominance tiebreak priority.
SCRIPT_RANGES: dict[str, str] = {
    "latin": r"A-Za-z\x{00C0}-\x{024F}",
    "cyrillic": r"\x{0400}-\x{04FF}",
    "greek": r"\x{0370}-\x{03FF}",
    "arabic": r"\x{0600}-\x{06FF}",
    "hebrew": r"\x{0590}-\x{05FF}",
    "devanagari": r"\x{0900}-\x{097F}",
    "han": r"\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}",
    "kana": r"\x{3040}-\x{30FF}",
    "hangul": r"\x{1100}-\x{11FF}\x{AC00}-\x{D7AF}",
}

_SCRIPTS = list(SCRIPT_RANGES)


def script_count(text: Column, script: str) -> Column:
    """Number of codepoints of ``script`` in ``text`` (0 for NULL)."""
    body = SCRIPT_RANGES[script]
    t = F.coalesce(text, F.lit(""))
    return F.length(t) - F.length(F.regexp_replace(t, f"[{body}]", ""))


def script_counts(text: Column) -> dict[str, Column]:
    """All per-script counts, keyed by script name."""
    return {s: script_count(text, s) for s in _SCRIPTS}


def dominant_script(text: Column) -> Column:
    """Name of the script with the most codepoints; ties go to the
    earlier entry in :data:`SCRIPT_RANGES` (latin first — the
    deterministic choice has to land somewhere and web text is
    latin-biased); ``'none'`` when no script character occurs. The
    CASE chain re-states the counts rather than referencing named
    columns so the expression is usable in any select."""
    counts = script_counts(text)
    top = F.greatest(*counts.values())
    out: Column = F.lit("none")
    for s in reversed(_SCRIPTS):
        out = F.when(
            (top > 0) & (counts[s] == top), F.lit(s)
        ).otherwise(out)
    return out


def script_confidence(text: Column) -> Column:
    """Dominant-script share of all script codepoints, 4 dp (0.0 when
    no script chars): low values flag mixed-script spam / mojibake."""
    counts = script_counts(text)
    top = F.greatest(*counts.values())
    total = sum(list(counts.values())[1:], list(counts.values())[0])
    return F.when(total > 0, F.round(top / total, 4)).otherwise(F.lit(0.0))


# --- DuckDB twins (generated from the SAME range table) -------------

def oracle_script_count_sql(text_expr: str, script: str) -> str:
    body = SCRIPT_RANGES[script]
    t = f"coalesce({text_expr}, '')"
    return (
        f"length({t}) - length(regexp_replace({t}, '[{body}]', '', 'g'))"
    )


def oracle_dominant_sql(text_expr: str) -> str:
    counts = {s: oracle_script_count_sql(text_expr, s) for s in _SCRIPTS}
    top = "greatest(" + ", ".join(counts.values()) + ")"
    case = f"'{_SCRIPTS[-1]}'"
    for s in reversed(_SCRIPTS[:-1]):
        case = f"CASE WHEN ({counts[s]}) = ({top}) THEN '{s}' ELSE {case} END"
    return f"CASE WHEN ({top}) > 0 THEN {case} ELSE 'none' END"


def oracle_confidence_sql(text_expr: str) -> str:
    counts = [oracle_script_count_sql(text_expr, s) for s in _SCRIPTS]
    top = "greatest(" + ", ".join(counts) + ")"
    total = " + ".join(f"({c})" for c in counts)
    return (
        f"CASE WHEN ({total}) > 0 THEN round(({top})::DOUBLE / ({total}), 4)"
        f" ELSE 0.0 END"
    )
