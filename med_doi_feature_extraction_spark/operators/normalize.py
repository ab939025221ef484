"""Choice normalization: canonicalize free-text values against a
choices + synonyms dictionary.

Re-expression of the reference's parser normalization (trim →
case-fold → exact canonical match → synonym match → passthrough;
``src/services/parser.py:36-63``, dictionaries in ``config/fields/
*.yaml``) as a broadcast map lookup — a single JVM-side
``element_at(map, lower(trim(c)))`` with coalesce fallback; no UDF,
no shuffle, and the dictionary ships once per executor as a literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_lookup(
    choices: list[str], synonyms: dict[str, list[str]] | None = None
) -> dict[str, str]:
    """lower(choice | synonym) → canonical choice."""
    lookup = {c.strip().lower(): c for c in choices}
    for canonical, syns in (synonyms or {}).items():
        for s in syns:
            lookup[s.strip().lower()] = canonical
    return lookup


def normalize_column(col: Column, lookup: dict[str, str]) -> Column:
    """Canonical value if the (trimmed, case-folded) input matches a
    choice or synonym; else the original value (reference passthrough
    semantics, parser.py:63)."""
    pairs: list[Column] = []
    for k, v in sorted(lookup.items()):
        pairs += [F.lit(k), F.lit(v)]
    map_lit = F.create_map(*pairs)
    key = F.lower(F.trim(col))
    return F.coalesce(F.element_at(map_lit, key), col)


def normalize(
    df: DataFrame,
    column: str,
    choices: list[str],
    synonyms: dict[str, list[str]] | None = None,
    out: str | None = None,
) -> DataFrame:
    return df.withColumn(
        out or f"{column}_norm",
        normalize_column(F.col(column), build_lookup(choices, synonyms)),
    )
