"""HTML head-metadata extraction + soft-404 detection.

Title / meta-description / canonical-link / og:title are the head
fields a web-corpus pipeline keys ranking, dedup (rel=canonical IS
the site's own dedup hint) and snippeting on; soft-404s — pages that
return 200 with a "not found" body — are a well-documented crawl
pollution class (Bar-Yossef et al., WWW'04, "Sic transit gloria
telae"). The reference's analogue is per-record metadata parsing
before classification (``src/services/extraction_service.py``); at
10^12 rows both are ONE scan-stage regexp battery.

Portability contract: every pattern is RE2-safe (lazy quantifiers and
inline ``(?i)`` only — no lookaround, no backreferences) and mirrored
verbatim in the DuckDB oracle; the minimal entity unescape follows
operators/links.py (amp LAST so ``&amp;lt;`` round-trips).

Both attribute orders are handled per field (``name=.. content=..``
and ``content=.. name=..``) via coalesce-of-extracts — real head
markup is not order-normalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TITLE_RE = r"(?i)<title[^>]*>([\s\S]*?)</title>"
_DESC_A = r'(?i)<meta[^>]*name=["\']description["\'][^>]*content=["\']([^"\']*)'
_DESC_B = r'(?i)<meta[^>]*content=["\']([^"\']*)["\'][^>]*name=["\']description["\']'
_CANON_A = r'(?i)<link[^>]*rel=["\']canonical["\'][^>]*href=["\']([^"\']*)'
_CANON_B = r'(?i)<link[^>]*href=["\']([^"\']*)["\'][^>]*rel=["\']canonical["\']'
_OG_A = r'(?i)<meta[^>]*property=["\']og:title["\'][^>]*content=["\']([^"\']*)'
_OG_B = r'(?i)<meta[^>]*content=["\']([^"\']*)["\'][^>]*property=["\']og:title["\']'

#: soft-404 body markers (matched against lower-cased title+text)
SOFT404_MARKERS: tuple[str, ...] = (
    "page not found",
    "404 not found",
    "error 404",
    "404 error",
    "no longer available",
    "page does not exist",
    "page cannot be found",
    "access denied",
)
_MARKER_ALT = "|".join(SOFT404_MARKERS)

#: a marker alone is weak — real articles QUOTE these phrases; the
#: classic precision guard is a short body (Bar-Yossef et al. use
#: near-empty content after boilerplate removal)
SOFT404_MAX_LEN = 400

# (entity, literal) — ORDER MATTERS: &amp; last (links.py discipline)
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#x27;", "'"),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def _unescape(col: F.Column) -> F.Column:
    for ent, lit in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(lit))
    return col


def _first(html: F.Column, pat_a: str, pat_b: str) -> F.Column:
    a = F.regexp_extract(html, pat_a, 1)
    b = F.regexp_extract(html, pat_b, 1)
    return F.when(F.length(a) > 0, a).otherwise(b)


def extract_head_meta(
    df: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """Append ``title, meta_description, canonical_href, og_title,
    title_len, has_canonical`` — one codegen'd regexp battery over the
    html column, attribute order insensitive, entities minimally
    unescaped, title whitespace collapsed."""
    h = F.coalesce(F.col(html_col), F.lit(""))
    title = _unescape(
        F.trim(
            F.regexp_replace(
                F.regexp_extract(h, _TITLE_RE, 1), r"\s+", " "
            )
        )
    )
    desc = _unescape(_first(h, _DESC_A, _DESC_B))
    canon = _first(h, _CANON_A, _CANON_B)
    og = _unescape(_first(h, _OG_A, _OG_B))
    return df.select(
        F.col(url_col).alias("url"),
        title.alias("title"),
        desc.alias("meta_description"),
        canon.alias("canonical_href"),
        og.alias("og_title"),
        F.length(title).cast("int").alias("title_len"),
        (F.length(canon) > 0).alias("has_canonical"),
    )


def soft404_features(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """Append ``marker_hit`` (a soft-404 phrase appears in title or
    body), ``text_len``, and ``is_soft404`` (marker AND body shorter
    than :data:`SOFT404_MAX_LEN` — the quote-a-404-in-an-article case
    stays admitted)."""
    h = F.coalesce(F.col(html_col), F.lit(""))
    t = F.coalesce(F.col(text_col), F.lit(""))
    title = F.lower(F.regexp_extract(h, _TITLE_RE, 1))
    probe = F.concat_ws(" ", title, F.lower(t))
    hit = probe.rlike(_MARKER_ALT)
    tlen = F.length(t)
    return df.select(
        F.col(url_col).alias("url"),
        hit.alias("marker_hit"),
        tlen.cast("int").alias("text_len"),
        (hit & (tlen < SOFT404_MAX_LEN)).alias("is_soft404"),
    )


def soft404_col(html: F.Column, text: F.Column) -> F.Column:
    """:func:`soft404_features`'s ``is_soft404`` as a reusable Column
    (admission-gate form)."""
    h = F.coalesce(html, F.lit(""))
    t = F.coalesce(text, F.lit(""))
    title = F.lower(F.regexp_extract(h, _TITLE_RE, 1))
    probe = F.concat_ws(" ", title, F.lower(t))
    return probe.rlike(_MARKER_ALT) & (F.length(t) < SOFT404_MAX_LEN)


def canonical_col(html: F.Column) -> F.Column:
    """The canonical href ('' when absent) as a reusable Column."""
    return _first(F.coalesce(html, F.lit("")), _CANON_A, _CANON_B)


def sql_soft404_expr(h_expr: str, t_expr: str) -> str:
    """DuckDB expression form of :func:`soft404_col`."""
    h = f"coalesce({h_expr}, '')"
    t = f"coalesce({t_expr}, '')"
    probe = (
        f"concat_ws(' ', lower(regexp_extract({h}, '{_TITLE_RE}', 1)), "
        f"lower({t}))"
    )
    return (
        f"(regexp_matches({probe}, '{_MARKER_ALT}')"
        f" AND length({t}) < {SOFT404_MAX_LEN})"
    )


def sql_canonical_expr(h_expr: str) -> str:
    """DuckDB expression form of :func:`canonical_col`."""
    h = f"coalesce({h_expr}, '')"
    return _sql_first(h, _CANON_A, _CANON_B)


def canonical_groups(meta: DataFrame) -> DataFrame:
    """Site-declared dedup groups: pages sharing a ``rel=canonical``
    target collapse to one group key (pages without one are their own
    canonical). Emits per-group size, member count with a
    self-referencing canonical, and a deterministic representative
    (min url) — the free dedup signal a 10^12-page pipeline should
    consume BEFORE paying for content hashing. One hash-agg on the
    group key."""
    key = F.when(
        F.length("canonical_href") > 0, F.col("canonical_href")
    ).otherwise(F.col("url"))
    g = meta.select(
        key.alias("canonical_key"),
        F.col("url"),
        (F.col("canonical_href") == F.col("url")).cast("int").alias("_self"),
    )
    return g.groupBy("canonical_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.min("url").alias("rep_url"),
        F.sum("_self").cast("long").alias("n_self"),
    )


# ------------------------------------------------------------- fixture

HEADMETA_VERSION = "headmeta/v2"


def generate_head_pages(n: int = 240, seed: int = 211):
    """Deterministic page fixture with varied head markup: both
    attribute orders, single/double quotes, entities in titles,
    multiline titles, missing fields, og:title, canonical links, and
    a soft-404 stratum (marker + short body) plus marker-quoting long
    articles (the precision guard's quarry).

    Returns pandas DataFrame (url, html, text).
    """
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        url = f"https://site{i % 6}.example.com/doc-{i}"
        kind = i % 8
        title = f"Article {i} &amp; more" if i % 3 == 0 else f"Article {i}"
        q = '"' if i % 2 == 0 else "'"
        head = [f"<title>{title}</title>" if kind != 5 else ""]
        if kind in (0, 1, 4):
            if i % 2 == 0:
                head.append(
                    f"<meta name={q}description{q} content={q}Summary of doc {i}{q}>"
                )
            else:
                head.append(
                    f"<meta content={q}Summary of doc {i}{q} name={q}description{q}>"
                )
        if kind in (0, 2):
            if i % 2 == 0:
                head.append(
                    f"<link rel={q}canonical{q} href={q}https://site0.example.com/doc-{i - i % 3}{q}>"
                )
            else:
                head.append(
                    f"<link href={q}https://site0.example.com/doc-{i - i % 3}{q} rel={q}canonical{q}>"
                )
        if kind in (1, 3):
            head.append(
                f"<meta property={q}og:title{q} content={q}OG {i}{q}>"
            )
        if kind == 6:
            head = [f"<title>\n  Article {i}\n  part two\n</title>"]
        if kind == 7:  # soft-404 stratum
            head = ["<title>404 Not Found</title>"]
            text = "Sorry, this page does not exist."
        elif i % 9 == 0:  # long article QUOTING a marker phrase
            text = ("The server replied page not found once. " * 20)
        else:
            text = f"body of doc {i}. " * int(rng.integers(2, 30))
        html = (
            "<html><head>" + "".join(head) + "</head><body><p>"
            + text + "</p></body></html>"
        )
        rows.append((url, html, text))
    return pd.DataFrame(rows, columns=["url", "html", "text"])


# ---------------------------------------------------------------- oracle


def _sql_unescape(expr: str) -> str:
    out = expr
    for ent, lit in _ENTITIES:
        lit_sql = lit.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit_sql}')"
    return out


def _sql_first(h: str, pat_a: str, pat_b: str) -> str:
    def esc(p: str) -> str:
        return p.replace("'", "''")

    a = f"regexp_extract({h}, '{esc(pat_a)}', 1)"
    b = f"regexp_extract({h}, '{esc(pat_b)}', 1)"
    return f"CASE WHEN length({a}) > 0 THEN {a} ELSE {b} END"


def sql_head_meta(parquet_glob: str) -> str:
    """Full DuckDB query mirroring :func:`extract_head_meta`."""
    h = "coalesce(html, '')"
    title_raw = (
        f"trim(regexp_replace(regexp_extract({h}, "
        f"'{_TITLE_RE}', 1), '\\s+', ' ', 'g'))"
    )
    title = _sql_unescape(title_raw)
    desc = _sql_unescape(_sql_first(h, _DESC_A, _DESC_B))
    canon = _sql_first(h, _CANON_A, _CANON_B)
    og = _sql_unescape(_sql_first(h, _OG_A, _OG_B))
    return f"""
SELECT url,
       {title} AS title,
       {desc} AS meta_description,
       {canon} AS canonical_href,
       {og} AS og_title,
       CAST(length({title}) AS INT) AS title_len,
       (length({canon}) > 0) AS has_canonical
FROM read_parquet('{parquet_glob}')
"""


def sql_soft404(parquet_glob: str) -> str:
    """Full DuckDB query mirroring :func:`soft404_features`."""
    h = "coalesce(html, '')"
    t = "coalesce(text, '')"
    probe = (
        f"concat_ws(' ', lower(regexp_extract({h}, '{_TITLE_RE}', 1)), "
        f"lower({t}))"
    )
    return f"""
SELECT url,
       regexp_matches({probe}, '{_MARKER_ALT}') AS marker_hit,
       CAST(length({t}) AS INT) AS text_len,
       (regexp_matches({probe}, '{_MARKER_ALT}')
        AND length({t}) < {SOFT404_MAX_LEN}) AS is_soft404
FROM read_parquet('{parquet_glob}')
"""


# ---------------------------------------------------- structured data

#: JSON-LD carrier blocks (schema.org's recommended embedding)
_LD_RE = (
    r'(?is)<script[^>]*type=["\']application/ld\+json["\'][^>]*>'
    r"(.*?)</script>"
)
#: "@type": "Thing" inside a JSON-LD block (regex-level extraction —
#: engine-portable; full JSON parsing differs across engines on edge
#: cases, and the census only needs the type census)
_LD_TYPE_RE = r'"@type"\s*:\s*"([^"]+)"'
_OG_TYPE_A = r'(?i)<meta[^>]*property=["\']og:type["\'][^>]*content=["\']([^"\']*)'
_OG_TYPE_B = r'(?i)<meta[^>]*content=["\']([^"\']*)["\'][^>]*property=["\']og:type["\']'
#: boolean attribute OR the empty-value serialization DOM serializers
#: emit (itemscope="" / itemscope='')
_ITEMSCOPE_RE = r"(?i)<[^>]*\sitemscope(=[\"'][\"'])?[\s>/]"
_ITEMTYPE_RE = r'(?i)itemtype=["\']([^"\']+)'


def structured_data_census(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page schema.org / Open Graph markup census: ``n_jsonld``
    (ld+json blocks), ``jsonld_types`` (sorted distinct ``@type``
    values, csv), ``og_type``, ``n_itemscope`` + ``microdata_types``
    (sorted distinct itemtype URLs, csv), ``has_structured``.
    Structured-data presence is a quality/answerability prior (recipe
    /product/article pages label themselves) and the extraction seed
    for KG-style training pairs. One codegen regexp battery; the
    html column is pruned immediately."""
    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    blocks = F.regexp_extract_all(h, F.lit(_LD_RE), 1)
    ld_types = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        blocks,
                        lambda b: F.regexp_extract_all(
                            b, F.lit(_LD_TYPE_RE), 1
                        ),
                    )
                )
            )
        ),
        ",",
    )
    og = _first(h, _OG_TYPE_A, _OG_TYPE_B)
    n_scope = F.size(F.regexp_extract_all(h, F.lit(_ITEMSCOPE_RE), 0))
    md_types = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.regexp_extract_all(h, F.lit(_ITEMTYPE_RE), 1)
            )
        ),
        ",",
    )
    n_ld = F.size(blocks)
    return df.select(
        F.col(url_col).alias("url"),
        n_ld.cast("int").alias("n_jsonld"),
        ld_types.alias("jsonld_types"),
        og.alias("og_type"),
        n_scope.cast("int").alias("n_itemscope"),
        md_types.alias("microdata_types"),
        (
            (n_ld > 0) | (F.length(og) > 0) | (n_scope > 0)
        ).alias("has_structured"),
    )


def generate_structured_pages(n: int = 150):
    """Deterministic fixture: JSON-LD blocks (single / multiple /
    nested types / other script types that must NOT count), og:type
    in both attribute orders, microdata itemscope/itemtype, and
    plain pages. Returns pandas DataFrame (url, html)."""
    import pandas as pd

    rows = []
    for i in range(n):
        url = f"https://sd{i % 4}.example.com/p-{i}"
        kind = i % 6
        parts = []
        if kind == 0:
            parts.append(
                '<script type="application/ld+json">'
                '{"@context":"https://schema.org","@type":"Article",'
                f'"headline":"Doc {i}"}}</script>'
            )
        elif kind == 1:  # two blocks, nested @type, single quotes
            parts.append(
                "<script type='application/ld+json'>"
                '{"@type":"Recipe","author":{"@type":"Person"}}'
                "</script>"
                '<script type="application/ld+json">'
                '{"@type":"BreadcrumbList"}</script>'
            )
        elif kind == 2:  # og:type, alternating attribute order
            if i % 2 == 0:
                parts.append(
                    '<meta property="og:type" content="article">'
                )
            else:
                parts.append(
                    '<meta content="product" property="og:type">'
                )
        elif kind == 3:  # microdata
            parts.append(
                '<div itemscope itemtype="https://schema.org/Product">'
                f'<span itemprop="name">Widget {i}</span></div>'
                '<div itemscope itemtype="https://schema.org/Offer"></div>'
            )
        elif kind == 4:  # non-ld script must not count
            parts.append(
                '<script type="text/javascript">var x = '
                '\'{"@type":"Fake"}\';</script>'
            )
        body = "".join(parts) + f"<p>content {i}</p>"
        rows.append((url, f"<html><head></head><body>{body}</body></html>"))
    return pd.DataFrame(rows, columns=["url", "html"])


def sql_structured_census(parquet_glob: str) -> str:
    """DuckDB twin of :func:`structured_data_census`."""
    ld = _LD_RE.replace("'", "''")
    ldt = _LD_TYPE_RE.replace("'", "''")
    oga = _OG_TYPE_A.replace("'", "''")
    ogb = _OG_TYPE_B.replace("'", "''")
    isc = _ITEMSCOPE_RE.replace("'", "''")
    itt = _ITEMTYPE_RE.replace("'", "''")
    h = "coalesce(CAST(html AS VARCHAR), '')"
    og_first = (
        f"CASE WHEN length(regexp_extract({h}, '{oga}', 1)) > 0 "
        f"THEN regexp_extract({h}, '{oga}', 1) "
        f"ELSE regexp_extract({h}, '{ogb}', 1) END"
    )
    return f"""
WITH base AS (
  SELECT url,
         coalesce(regexp_extract_all({h}, '{ld}', 1), []) AS blocks,
         {og_first} AS og_type,
         coalesce(len(regexp_extract_all({h}, '{isc}', 0)), 0)
           AS n_itemscope,
         coalesce(array_to_string(list_sort(list_distinct(
           regexp_extract_all({h}, '{itt}', 1))), ','), '')
           AS microdata_types
  FROM read_parquet('{parquet_glob}')
)
SELECT url,
       CAST(coalesce(len(blocks), 0) AS INT) AS n_jsonld,
       coalesce(array_to_string(list_sort(list_distinct(flatten(
         list_transform(blocks,
                        b -> coalesce(regexp_extract_all(b, '{ldt}', 1),
                                      []))))), ','), '')
         AS jsonld_types,
       og_type,
       CAST(n_itemscope AS INT) AS n_itemscope,
       microdata_types,
       (len(blocks) > 0 OR length(og_type) > 0 OR n_itemscope > 0)
         AS has_structured
FROM base
"""


# ------------------------------------------------- canonical chains


def resolve_canonical_chains(
    meta: DataFrame, doublings: int = 4
) -> DataFrame:
    """Follow rel=canonical CHAINS to their terminal target
    (a → b → c collapses to c): pages declare canonicals that are
    themselves non-canonical variants, so the direct-target grouping
    (:func:`canonical_groups`) under-merges. Pointer DOUBLING — each
    round joins the current target's own target, so chains up to
    2^``doublings`` links resolve in ``doublings`` rounds (the
    log-hop trick dedup's CC resolution uses), not chain-length
    rounds.

    Input: :func:`extract_head_meta` output (``url``,
    ``canonical_href``). Output one row per page: ``final_target``
    (the fixpoint), ``resolved`` (final_target declares no further
    canonical — False only for cycles longer than one node or chains
    exceeding the horizon; a self-canonical IS a fixpoint).

    Each round = ONE equi-join of the slim (url, target) function
    table with itself; no corpus-sized state beyond it.
    """
    if doublings < 1:
        raise ValueError("doublings must be >= 1")
    f = meta.select(
        F.col("url").alias("u"),
        F.when(
            (F.length("canonical_href") > 0)
            & (F.col("canonical_href") != F.col("url")),
            F.col("canonical_href"),
        )
        .otherwise(F.col("url"))
        .alias("t"),
    ).distinct()  # snapshot duplicates would multiply through joins
    # function table g maps EVERY known url; targets outside the
    # crawl resolve to themselves (we can't follow what we didn't
    # fetch — they are fixpoints by construction)
    cur = f
    for _ in range(doublings):
        nxt = cur.select(F.col("u").alias("_u2"), F.col("t").alias("_t2"))
        cur = (
            cur.join(nxt, cur["t"] == nxt["_u2"], "left")
            .select(
                "u",
                F.coalesce(F.col("_t2"), F.col("t")).alias("t"),
            )
            .localCheckpoint(eager=False)
        )
    fin = cur.select("u", F.col("t").alias("final_target"))
    tgt = f.select(F.col("u").alias("_fu"), F.col("t").alias("_ft"))
    return (
        fin.join(tgt, fin["final_target"] == tgt["_fu"], "left")
        .select(
            F.col("u").alias("url"),
            "final_target",
            F.coalesce(
                F.col("_ft") == F.col("final_target"), F.lit(True)
            ).alias("resolved"),
        )
    )


def sql_canonical_chains(meta_sql: str, doublings: int = 4) -> str:
    """DuckDB twin of :func:`resolve_canonical_chains`
    (``meta_sql`` yields (url, canonical_href))."""
    parts = [f"""
f AS (
  SELECT DISTINCT url AS u,
         CASE WHEN length(canonical_href) > 0
                   AND canonical_href != url
              THEN canonical_href ELSE url END AS t
  FROM {meta_sql}
),
c0 AS (SELECT u, t FROM f)"""]
    for i in range(1, doublings + 1):
        parts.append(f"""
c{i} AS (
  SELECT a.u, coalesce(b.t, a.t) AS t
  FROM c{i - 1} a LEFT JOIN c{i - 1} b ON a.t = b.u
)""")
    return (
        "WITH " + ",".join(parts)
        + f"""
SELECT a.u AS url, a.t AS final_target,
       coalesce(f.t = a.t, TRUE) AS resolved
FROM c{doublings} a LEFT JOIN f ON f.u = a.t"""
    )
