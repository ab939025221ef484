"""Web-page admission pipeline: the session's crawl-hygiene gates
composed into ONE scan with first-failed attribution.

This is the curate-stage front door for a Common-Crawl-style corpus:
before any content hashing, embedding, or model scoring spends money
on a page, five cheap scan-stage gates decide admission —

1. ``trap``       — crawler-trap URL battery (hygiene.trap_score_col)
2. ``soft404``    — "not found" body with a short text (headmeta)
3. ``thin``       — too little text, or text buried in markup
4. ``lang``       — URL-declared vs doc-declared language conflict
5. ``canonical``  — page is a non-canonical variant (the site itself
   says fetch the other URL)

Composition reuses ``operators/funnel.py`` (first-failed CASE, all
predicates in ONE codegen projection — evaluating 5 gates costs one
corpus scan, not 5) so the admission decision, the per-gate drop
attribution, and the survivor filter are all the SAME plan shape the
funnel operators already pin. The reference's analogue is the
validation chain before its per-record extract loop
(``src/services/input_handler.py`` → ``quality_service.py``); here
the chain is Column algebra end-to-end — no UDF, nothing shuffles
until the summary's ≤ n_stages+1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: admission thresholds (frozen; callers override via gate rebuild)
MIN_TEXT_LEN = 50
MIN_TEXT_RATIO = 0.05

ADMISSION_VERSION = "admission/v1"


def admission_predicates(
    url_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    lang_col: str = "lang",
) -> list:
    """The five admission gates as raw (name, predicate Column)
    pairs — pure row-local Column algebra, usable both for the slim
    attribution projection and as a direct scan filter."""
    from med_doi_feature_extraction_spark.operators.align import (
        detect_url_lang,
    )
    from med_doi_feature_extraction_spark.operators.headmeta import (
        canonical_col,
        soft404_col,
    )
    from med_doi_feature_extraction_spark.operators.hygiene import (
        trap_score_col,
    )

    url = F.col(url_col)
    h = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    t = F.coalesce(F.col(text_col), F.lit(""))
    ulang = detect_url_lang(url)
    dlang = F.coalesce(F.lower(F.col(lang_col)), F.lit(""))
    canon = canonical_col(h)
    hlen = F.length(h)
    return [
        ("trap", trap_score_col(url) == 0),
        ("soft404", ~soft404_col(h, t)),
        (
            "thin",
            (F.length(t) >= MIN_TEXT_LEN)
            & (hlen > 0)
            & (F.length(t) / hlen >= F.lit(MIN_TEXT_RATIO)),
        ),
        (
            "lang",
            (F.length(ulang) == 0)
            | (F.length(dlang) == 0)
            | (ulang == dlang),
        ),
        ("canonical", (F.length(canon) == 0) | (canon == url)),
    ]


def admission_gates(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    text_col: str = "text",
    lang_col: str = "lang",
):
    """(slim_frame, stages): the five admission predicates computed
    in one projection over ``df``; ``stages`` feeds the funnel
    operators. The html payload is dropped from the slim frame — only
    booleans survive."""
    preds = admission_predicates(url_col, html_col, text_col, lang_col)
    slim = df.select(
        F.col(url_col).alias("url"),
        *[p.alias(f"g_{name}") for name, p in preds],
    )
    stages = [(name, F.col(f"g_{name}")) for name, _ in preds]
    return slim, stages


def web_admission_filter(df: DataFrame, **cols) -> DataFrame:
    """Survivors only, ALL original columns kept: the five gates as
    one conjunction at the scan (no join, predicate-pushdown
    friendly) — the curate-CLI form."""
    keep = F.lit(True)
    for _, p in admission_predicates(**cols):
        keep = keep & F.coalesce(p, F.lit(False))
    return df.where(keep)


def web_admission_audit(df: DataFrame, **cols) -> DataFrame:
    """(url, g_*, first_failed, kept) — per-page admission decision
    with first-failed-gate attribution, one codegen scan."""
    from med_doi_feature_extraction_spark.operators.funnel import (
        funnel_audit,
    )

    slim, stages = admission_gates(df, **cols)
    return funnel_audit(slim, stages)


def web_admission_summary(df: DataFrame, **cols) -> DataFrame:
    """Per-stage entering/dropped/surviving funnel table for the
    admission chain (corpus reduces through one ≤6-group hash-agg)."""
    from med_doi_feature_extraction_spark.operators.funnel import (
        funnel_summary,
    )

    slim, stages = admission_gates(df, **cols)
    return funnel_summary(slim, stages)


# ------------------------------------------------------------- fixture


def generate_admission_pages(n: int = 360, seed: int = 229):
    """Deterministic fixture exercising every gate: trap URLs,
    soft-404 bodies, thin/markup-buried pages, url-vs-doc language
    conflicts, non-canonical variants, and clean survivors.

    Returns pandas DataFrame (url, warc_ts, html, text, lang).
    """
    from datetime import datetime, timedelta

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    base_ts = datetime(2024, 5, 1)
    rows = []
    for i in range(n):
        host = f"site{i % 6}.example.com"
        kind = i % 9
        url = f"https://{host}/article/{i}"
        lang = "en"
        text = f"Body of article {i}. " * int(rng.integers(6, 25))
        head = f"<title>Article {i}</title>"
        if kind == 1:  # crawler trap (calendar archive)
            url = f"https://{host}/2021/0{1 + i % 9}/1{i % 9}/post-{i}"
        elif kind == 2:  # soft 404
            head = "<title>404 Not Found</title>"
            text = "Sorry, this page does not exist."
        elif kind == 3:  # thin page
            text = "ok"
        elif kind == 4:  # markup-buried (ratio below threshold)
            text = f"tiny {i}"
            head += "<script>" + ("var x=1;" * 400) + "</script>"
        elif kind == 5:  # language conflict
            url = f"https://{host}/fr/article/{i}"
            lang = "de"
        elif kind == 6:  # non-canonical variant
            head += (
                f'<link rel="canonical" '
                f'href="https://{host}/article/{i - 1}">'
            )
        elif kind == 7:  # canonical self-reference — admitted
            head += f'<link rel="canonical" href="{url}">'
        elif kind == 8:  # marked URL, matching doc lang — admitted
            url = f"https://{host}/es/article/{i}"
            lang = "es"
        html = (
            "<html><head>" + head + "</head><body><p>"
            + text + "</p></body></html>"
        )
        rows.append((url, base_ts + timedelta(minutes=i), html, text, lang))
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


# ---------------------------------------------------------------- oracle


def oracle_gates_cte(parquet_glob: str) -> str:
    """``g`` CTE body mirroring :func:`admission_gates` — every gate
    expression generated from the SAME constants the Column algebra
    uses (trap via hygiene.sql_trap_score, soft404/canonical via
    headmeta expr helpers, lang via align._sql_detect)."""
    from med_doi_feature_extraction_spark.operators.align import _sql_detect
    from med_doi_feature_extraction_spark.operators.headmeta import (
        sql_canonical_expr,
        sql_soft404_expr,
    )
    from med_doi_feature_extraction_spark.operators.hygiene import (
        sql_trap_score,
    )

    h = "coalesce(html, '')"
    t = "coalesce(text, '')"
    canon = sql_canonical_expr("html")
    ulang = _sql_detect("url")
    return f"""
g AS (
  SELECT url,
         ({sql_trap_score('url')} = 0) AS g_trap,
         (NOT {sql_soft404_expr('html', 'text')}) AS g_soft404,
         (length({t}) >= {MIN_TEXT_LEN} AND length({h}) > 0
          AND CAST(length({t}) AS DOUBLE) / length({h})
              >= {MIN_TEXT_RATIO}) AS g_thin,
         (length({ulang}) = 0 OR length(coalesce(lower(lang), '')) = 0
          OR {ulang} = coalesce(lower(lang), '')) AS g_lang,
         (length({canon}) = 0 OR {canon} = url) AS g_canonical
  FROM read_parquet('{parquet_glob}')
)
"""


SQL_FIRST_FAILED = """
CASE WHEN NOT coalesce(g_trap, false) THEN 'trap'
     WHEN NOT coalesce(g_soft404, false) THEN 'soft404'
     WHEN NOT coalesce(g_thin, false) THEN 'thin'
     WHEN NOT coalesce(g_lang, false) THEN 'lang'
     WHEN NOT coalesce(g_canonical, false) THEN 'canonical'
     ELSE NULL END
"""
