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
