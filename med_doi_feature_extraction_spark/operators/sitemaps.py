"""Sitemap parsing: ``<urlset>`` / ``<sitemapindex>`` entry extraction.

Sitemaps are the crawl frontier's highest-precision seed source —
the site tells you its URLs and when they changed (``lastmod`` drives
recrawl scheduling exactly like the as-of snapshot cadence features).
The reference's analogue is structured-input ingestion before the
record loop (``src/services/input_handler.py``); at web scale a
sitemap corpus is itself billions of XML documents, so parsing is ONE
regexp extract-all + explode per document — no XML parser, no UDF,
nothing but codegen until the explode.

Patterns are RE2-safe (inline ``(?is)`` flags, lazy quantifiers, no
backreferences) and shared verbatim with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: a <url> or <sitemap> entry block (urlset and index files share
#: the block→loc/lastmod shape; alternation avoids backreferences)
_BLOCK_RE = r"(?is)<(?:url|sitemap)>[\s\S]*?</(?:url|sitemap)>"
_LOC_RE = r"(?is)<loc[^>]*>([^<]*)</loc>"
_LASTMOD_RE = r"(?is)<lastmod[^>]*>([^<]*)</lastmod>"
_INDEX_RE = r"(?is)<sitemapindex"

SITEMAP_VERSION = "sitemaps/v1"


def sitemap_entries(
    df: DataFrame, url_col: str = "sitemap_url", xml_col: str = "xml"
) -> DataFrame:
    """One row per sitemap entry: (sitemap_url, loc, lastmod,
    is_index). ``is_index`` marks entries of a ``<sitemapindex>``
    (their locs are MORE sitemaps → the frontier recurses);
    ``lastmod`` is the raw declared string ('' when absent) —
    typing it is the caller's business (W3C datetime has too many
    legal shapes to guess here). The xml column is pruned before the
    explode so the payload never rides the shuffle."""
    x = F.coalesce(F.col(xml_col).cast("string"), F.lit(""))
    blocks = F.explode(F.regexp_extract_all(x, F.lit(_BLOCK_RE), 0))
    b = df.select(
        F.col(url_col).alias("sitemap_url"),
        x.rlike(_INDEX_RE).alias("is_index"),
        blocks.alias("_b"),
    )
    # NOT F.trim: both engines' trim() is space-only, sitemap locs are
    # routinely newline-padded — regex \s strip, global in both
    def _ws(c: F.Column) -> F.Column:
        return F.regexp_replace(c, r"^\s+|\s+$", "")

    loc = _ws(F.regexp_extract("_b", _LOC_RE, 1))
    lastmod = _ws(F.regexp_extract("_b", _LASTMOD_RE, 1))
    return b.select(
        "sitemap_url",
        loc.alias("loc"),
        lastmod.alias("lastmod"),
        "is_index",
    ).where(F.length("loc") > 0)


def sitemap_stats(entries: DataFrame) -> DataFrame:
    """Per-sitemap rollup: entry count, lastmod coverage, distinct
    hosts referenced — the seed-quality census. One hash-agg."""
    from med_doi_feature_extraction_spark.operators.urls import url_host

    return entries.groupBy("sitemap_url", "is_index").agg(
        F.count(F.lit(1)).cast("long").alias("n_entries"),
        F.sum((F.length("lastmod") > 0).cast("long"))
        .cast("long")
        .alias("n_lastmod"),
        F.countDistinct(url_host(F.col("loc")))
        .cast("long")
        .alias("n_hosts"),
    )


# ------------------------------------------------------------- fixture


def generate_sitemaps(n: int = 90, seed: int = 59):
    """Deterministic sitemap corpus: urlset files (varying size,
    partial lastmod coverage, whitespace-padded locs), index files
    pointing at further sitemaps, and empty/junk strata.

    Returns pandas DataFrame (sitemap_url, xml).
    """
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        host = f"site{i % 7}.example.com"
        smurl = f"https://{host}/sitemap-{i}.xml"
        if i % 6 == 5:  # index file
            blocks = [
                f"<sitemap><loc>https://{host}/sitemap-{i}-{j}.xml</loc>"
                f"<lastmod>2024-0{1 + j % 9}-01</lastmod></sitemap>"
                for j in range(int(rng.integers(2, 6)))
            ]
            xml = (
                '<?xml version="1.0"?><sitemapindex>'
                + "".join(blocks)
                + "</sitemapindex>"
            )
        elif i % 11 == 10:  # junk / empty
            xml = "<?xml version=\"1.0\"?><urlset></urlset>"
        else:
            blocks = []
            for j in range(int(rng.integers(1, 25))):
                loc = f"https://{host}/page/{i * 100 + j}"
                if j % 3 == 0:
                    loc = f"\n    {loc}  \n"  # whitespace padding
                lm = (
                    f"<lastmod>2024-{1 + j % 12:02d}-{1 + j % 28:02d}</lastmod>"
                    if rng.random() < 0.6
                    else ""
                )
                blocks.append(f"<url><loc>{loc}</loc>{lm}</url>")
            xml = (
                '<?xml version="1.0"?><urlset>'
                + "".join(blocks)
                + "</urlset>"
            )
        rows.append((smurl, xml))
    return pd.DataFrame(rows, columns=["sitemap_url", "xml"])


# ---------------------------------------------------------------- oracle


def oracle_entries_cte(parquet_glob: str) -> str:
    """``entries`` CTE body mirroring :func:`sitemap_entries`."""
    block = _BLOCK_RE.replace("'", "''")
    loc = _LOC_RE.replace("'", "''")
    lm = _LASTMOD_RE.replace("'", "''")
    ws = r"^\s+|\s+$"
    return f"""
entries AS (
  SELECT sitemap_url,
         regexp_replace(regexp_extract(b, '{loc}', 1), '{ws}', '', 'g')
             AS loc,
         regexp_replace(regexp_extract(b, '{lm}', 1), '{ws}', '', 'g')
             AS lastmod,
         is_index
  FROM (
    SELECT sitemap_url,
           regexp_matches(coalesce(xml, ''), '{_INDEX_RE}') AS is_index,
           unnest(regexp_extract_all(coalesce(xml, ''), '{block}', 0)) AS b
    FROM read_parquet('{parquet_glob}')
  )
  WHERE length(regexp_replace(regexp_extract(b, '{loc}', 1),
                              '{ws}', '', 'g')) > 0
)
"""


def sitemap_coverage(
    entries: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Per-host sitemap-vs-crawl reconciliation — the crawl-ops
    dashboard row: ``n_sitemap`` (distinct non-index locs declared),
    ``n_crawled`` (distinct urls fetched), ``n_both``, ``coverage``
    (fetched share of declared, 6 dp — low = the crawler is missing
    what the site advertises), ``orphan_rate`` (fetched urls the site
    does NOT declare — high = trap/infinite-space suspicion, the
    hygiene battery's quarry). Hosts appearing on either side only
    are kept (full outer union of the two censuses).

    Execution shape: both sides collapse to DISTINCT slim url sets
    at the scan, the intersection is one equi-join on the url string,
    and everything downstream is host-keyed hash-aggs on aggregate
    tables. No corpus-wide anything survives the first projection.
    """
    from med_doi_feature_extraction_spark.operators.urls import url_host

    sm = (
        entries.filter(~F.col("is_index"))
        .select(F.col("loc").alias("u"))
        .filter(F.length("u") > 0)
        .distinct()
    )
    cr = crawled.select(F.col(url_col).alias("u")).distinct()
    both = sm.join(cr, "u", "left_semi")
    h = lambda d: d.select(url_host(F.col("u")).alias("host"))  # noqa: E731
    n_sm = h(sm).groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_sitemap")
    )
    n_cr = h(cr).groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_crawled")
    )
    n_bo = h(both).groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_both")
    )
    j = (
        n_sm.join(n_cr, "host", "full_outer")
        .join(n_bo, "host", "left")
        .select(
            "host",
            F.coalesce("n_sitemap", F.lit(0)).alias("n_sitemap"),
            F.coalesce("n_crawled", F.lit(0)).alias("n_crawled"),
            F.coalesce("n_both", F.lit(0)).alias("n_both"),
        )
    )
    return j.select(
        "host",
        "n_sitemap",
        "n_crawled",
        "n_both",
        F.when(
            F.col("n_sitemap") > 0,
            F.round(
                F.col("n_both").cast("double") / F.col("n_sitemap"), 6
            ),
        ).alias("coverage"),
        F.when(
            F.col("n_crawled") > 0,
            F.round(
                (F.col("n_crawled") - F.col("n_both")).cast("double")
                / F.col("n_crawled"),
                6,
            ),
        ).alias("orphan_rate"),
    )


def oracle_coverage_sql(
    entries_sql: str, crawled_sql: str, url_col: str = "url"
) -> str:
    """DuckDB twin of :func:`sitemap_coverage` (``entries_sql`` must
    yield (loc, is_index); ``crawled_sql`` yields ``url_col``)."""
    from med_doi_feature_extraction_spark.operators.urls import sql_url_host

    return f"""
WITH sm AS (
  SELECT DISTINCT loc AS u FROM {entries_sql}
  WHERE NOT is_index AND length(loc) > 0
),
cr AS (SELECT DISTINCT "{url_col}" AS u FROM {crawled_sql}),
bo AS (SELECT u FROM sm WHERE u IN (SELECT u FROM cr)),
nsm AS (SELECT {sql_url_host('u')} AS host,
               CAST(count(*) AS BIGINT) AS n_sitemap FROM sm GROUP BY 1),
ncr AS (SELECT {sql_url_host('u')} AS host,
               CAST(count(*) AS BIGINT) AS n_crawled FROM cr GROUP BY 1),
nbo AS (SELECT {sql_url_host('u')} AS host,
               CAST(count(*) AS BIGINT) AS n_both FROM bo GROUP BY 1),
j AS (
  SELECT coalesce(s.host, c.host) AS host,
         coalesce(s.n_sitemap, 0) AS n_sitemap,
         coalesce(c.n_crawled, 0) AS n_crawled,
         coalesce(b.n_both, 0) AS n_both
  FROM nsm s
  FULL OUTER JOIN ncr c ON s.host = c.host
  LEFT JOIN nbo b ON coalesce(s.host, c.host) = b.host
)
SELECT host, n_sitemap, n_crawled, n_both,
       CASE WHEN n_sitemap > 0
            THEN round((n_both)::DOUBLE / n_sitemap, 6) END AS coverage,
       CASE WHEN n_crawled > 0
            THEN round((n_crawled - n_both)::DOUBLE / n_crawled, 6) END
         AS orphan_rate
FROM j
"""
