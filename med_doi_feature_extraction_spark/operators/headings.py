"""Document structure: h1–h6 heading extraction + hierarchical
outline resolution.

Training-data pipelines increasingly keep document STRUCTURE, not
just flat text (markdown-style corpora, section-aware chunking,
title-conditioned training pairs); search/snippet pipelines key on
the heading path ("H1 > H2 > current section"). The per-document
outline — each heading's parent is the nearest preceding heading of
a smaller level — is the classic stack algorithm, re-expressed here
as fixed window algebra so it runs as one document-keyed exchange
instead of per-doc Python.

Execution shape, 100 TB lens:

- extraction: ONE ``regexp_extract_all`` + ``posexplode`` inside the
  scan stage (links.py portable-regex discipline: Java∩RE2, inline
  ``(?is)``, lazy quantifier, no lookaround); the wide html column
  never survives into the shuffle.
- outline: the "nearest preceding smaller-level heading" needs a
  per-document stack — unrolled into 5 ``last(... WHEN level=p)``
  window columns (one per possible parent level, levels are a fixed
  6-value domain) over ONE (doc, pos) window, then a CASE picks the
  deepest tracked level strictly above the current row's. One
  exchange, no iteration, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEADINGS_VERSION = "headings/v1"

#: whole heading elements; nested inline markup allowed in the body
_H_RE = r"(?is)<h([1-6])[^>]*>(.*?)</h[1-6]\s*>"
_TAG_RE = r"<[^>]*>"

_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#x27;", "'"), ("&#39;", "'"), ("&amp;", "&"),
)


def _clean(raw: F.Column) -> F.Column:
    t = F.regexp_replace(raw, _TAG_RE, " ")
    for ent, lit in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(lit))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def extract_headings(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per heading in document order: ``(url, pos, level,
    heading)`` — tag-stripped, entity-unescaped, whitespace-collapsed
    text; headings that clean to '' are dropped with positions
    renumbered (outline neighbors must be real)."""
    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    m = F.posexplode(F.regexp_extract_all(html, F.lit(_H_RE), 0))
    x = df.select(F.col(url_col).alias("url"), m.alias("_p", "_m"))
    level = F.regexp_extract(F.col("_m"), _H_RE, 1).cast("int")
    text = _clean(F.regexp_extract(F.col("_m"), _H_RE, 2))
    h = x.select(
        "url", "_p", level.alias("level"), text.alias("heading")
    ).where(F.length("heading") > 0)
    pos = F.row_number().over(
        Window.partitionBy("url").orderBy("_p")
    ) - F.lit(1)
    return h.select(
        "url", pos.cast("int").alias("pos"), "level", "heading"
    )


def headings_outline(headings: DataFrame) -> DataFrame:
    """Append ``parent`` (text of the nearest PRECEDING heading with
    a strictly smaller level; NULL at the top) and ``path_depth``
    (1 + number of LIVE ancestors — tracked levels not popped by a
    later shallower heading, the HTML5 outline-stack rule). Skipped
    levels resolve like the stack: an h4 under an h2 parents to the
    h2; an h2 before the current h1 is popped and neither parents
    nor deepens anything after that h1."""
    w = (
        Window.partitionBy("url")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lasts = {
        p: F.last(
            F.when(F.col("level") == p, F.col("heading")),
            ignorenulls=True,
        ).over(w)
        for p in range(1, 6)
    }
    lastpos = {
        p: F.last(
            F.when(F.col("level") == p, F.col("pos")),
            ignorenulls=True,
        ).over(w)
        for p in range(1, 6)
    }
    # parent = the tracked smaller level whose LAST occurrence is the
    # most recent (max pos) — a later h3 shadows an earlier h2 only
    # for rows deeper than 3, which comparing positions gets right.
    # Encoded engine-portably: eligible positions, NULL → −1, max,
    # then a deepest-first CASE maps the winning position back to its
    # heading (positions are unique per document, so no ties).
    ep = {
        p: F.when(
            lastpos[p].isNotNull() & (F.col("level") > p), lastpos[p]
        ).otherwise(F.lit(-1))
        for p in range(1, 6)
    }
    h2 = headings.select(
        "url",
        "pos",
        "level",
        "heading",
        *[ep[p].alias(f"_e{p}") for p in range(1, 6)],
        *[lasts[p].alias(f"_h{p}") for p in range(1, 6)],
    )
    bp = F.greatest(*[F.col(f"_e{p}") for p in range(1, 6)])
    parent = F.when(bp == -1, F.lit(None).cast("string"))
    for p in range(5, 0, -1):
        parent = parent.when(bp == F.col(f"_e{p}"), F.col(f"_h{p}"))
    # a tracked level is a LIVE ancestor only if no shallower tracked
    # level appeared after it (the stack pop): e_p > max(e_1..e_{p-1})
    def _live(p: int) -> F.Column:
        above = [F.col(f"_e{q}") for q in range(1, p)]
        prev_max = F.greatest(*above, F.lit(-1)) if above else F.lit(-1)
        return ((F.col(f"_e{p}") >= 0) & (F.col(f"_e{p}") > prev_max))

    ancestors = sum(_live(p).cast("int") for p in range(1, 6))
    return h2.select(
        "url",
        "pos",
        "level",
        "heading",
        parent.alias("parent"),
        (ancestors + 1).cast("int").alias("path_depth"),
    )


# ------------------------------------------------------------- fixture


def generate_heading_pages(n: int = 120):
    """Deterministic fixture exercising the outline stack: skipped
    levels, outline resets (later h1), popped branches, attribute
    markup, inline tags + entities in headings, empty headings, and
    heading-free pages. Returns pandas DataFrame (url, html)."""
    import pandas as pd

    rows = []
    for i in range(n):
        url = f"https://hd{i % 5}.example.com/doc-{i}"
        kind = i % 6
        if kind == 0:
            body = (
                f"<h1>Doc {i}</h1><p>x</p><h2>Part A</h2>"
                f"<h3>Detail {i}</h3><h2>Part B</h2><h4>Under B {i}</h4>"
            )
        elif kind == 1:  # reset: second h1 pops everything
            body = (
                f"<h1>First {i}</h1><h2>Old Sec</h2><h1>Second {i}</h1>"
                f"<h3>Fresh {i}</h3>"
            )
        elif kind == 2:  # markup + entities in heading text
            body = (
                f'<h2 class="t" id="s{i}">Tom &amp; <b>Jerry</b> {i}</h2>'
                f"<h6>deep jump {i}</h6>"
            )
        elif kind == 3:  # empty heading dropped, positions renumber
            body = f"<h3></h3><h2>Kept {i}</h2><h3>Child {i}</h3>"
        elif kind == 4:
            body = f"<p>no headings {i}</p>"
        else:
            body = (
                f"<H1>Upper {i}</H1><h5>Five {i}</h5><h4>Four {i}</h4>"
                f"<h5>Five again {i}</h5>"
            )
        rows.append((url, f"<html><body>{body}</body></html>"))
    return pd.DataFrame(rows, columns=["url", "html"])


# ---------------------------------------------------------------- oracle


def oracle_outline_sql(parquet_glob: str) -> str:
    """DuckDB twin ending in a final SELECT (url, pos, level,
    heading, parent, path_depth) — same regexes, same unrolled
    window-per-level algebra."""
    h_re = _H_RE.replace("'", "''")
    clean = f"regexp_replace(m, '{_TAG_RE}', ' ', 'g')"
    for e, lit in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#x27;", "''"), ("&#39;", "''"), ("&amp;", "&"),
    ):
        clean = f"replace({clean}, '{e}', '{lit}')"
    clean = f"trim(regexp_replace({clean}, '\\s+', ' ', 'g'))"
    last_cols = ",\n         ".join(
        f"""last_value(CASE WHEN level = {p} THEN heading END
           IGNORE NULLS) OVER w AS lh{p},
         last_value(CASE WHEN level = {p} THEN pos END
           IGNORE NULLS) OVER w AS lp{p}"""
        for p in range(1, 6)
    )
    eps = ",\n         ".join(
        f"CASE WHEN lp{p} IS NOT NULL AND level > {p} "
        f"THEN lp{p} ELSE -1 END AS e{p}"
        for p in range(1, 6)
    )
    def _live_sql(p: int) -> str:
        if p == 1:
            prev = "-1"
        else:
            inner = ", ".join(f"e{q}" for q in range(1, p))
            prev = f"greatest({inner}, -1)" if p > 2 else "greatest(e1, -1)"
        return f"(CASE WHEN e{p} >= 0 AND e{p} > {prev} THEN 1 ELSE 0 END)"

    anc = " + ".join(_live_sql(p) for p in range(1, 6))
    bp = "greatest(" + ", ".join(f"e{p}" for p in range(1, 6)) + ")"
    parent_case = "CASE WHEN " + bp + " = -1 THEN NULL " + " ".join(
        f"WHEN {bp} = e{p} THEN lh{p}" for p in range(5, 0, -1)
    ) + " END"
    return f"""
WITH raw AS (
  SELECT url, coalesce(CAST(html AS VARCHAR), '') AS html
  FROM read_parquet('{parquet_glob}')
),
ms AS (
  SELECT url, regexp_extract_all(html, '{h_re}', 0) AS a FROM raw
),
hx AS (
  SELECT url, CAST(i - 1 AS INT) AS rawpos, a[i] AS m
  FROM ms, unnest(range(1, len(a) + 1)) AS u(i)
),
hc AS (
  SELECT url, rawpos,
         CAST(regexp_extract(m, '{h_re}', 1) AS INT) AS level,
         {clean} AS heading
  FROM hx
),
hp AS (
  SELECT url,
         CAST(row_number() OVER (PARTITION BY url ORDER BY rawpos) - 1
              AS INT) AS pos,
         level, heading
  FROM hc WHERE length(heading) > 0
),
tracked AS (
  SELECT url, pos, level, heading,
         {last_cols}
  FROM hp
  WINDOW w AS (PARTITION BY url ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
elig AS (
  SELECT url, pos, level, heading,
         lh1, lh2, lh3, lh4, lh5,
         {eps}
  FROM tracked
)
SELECT url, pos, level, heading,
       {parent_case} AS parent,
       CAST({anc} + 1 AS INT) AS path_depth
FROM elig
"""
