"""Mirror-site detection from shared page content (Bharat & Broder,
WWW'99 "mirror, mirror on the web" class).

Whole-host mirrors (the same site served from several domains —
CDNs, resellers, scraped re-hosts) defeat URL-level dedup: every
page is "new" by URL while the corpus doubles. The host-level signal
is set overlap of page CONTENT hashes: two hosts sharing many
identical documents are mirror candidates, ranked by containment /
Jaccard, and the downstream keep-one-host decision reuses the
cluster machinery (`dedup.dedup_decisions`). The reference scores
records independently (`src/services/quality_service.py`); mirror
structure only exists across the corpus.

Execution shape, 100 TB lens:

- page → (content_hash, host) distinct pairs: ONE scan + hash-agg
  (sha256 over the exact-dedup normalization, so this tier groups
  exactly what `dedup.exact_dedup` groups).
- hot-hash cap BEFORE pairing: a hash appearing on more than
  ``hot_cap`` hosts (empty pages, "domain parked" templates, shared
  boilerplate) is excluded from pair generation — the same bounded-
  expansion guard as the LSH hot-band cap; without it one universal
  page makes the self-join quadratic in the host count. Dropped mass
  only UNDERCOUNTS n_shared (conservative for a dedup trigger).
- pair generation: self-join of the capped (hash, host) table on
  hash with ``host_a < host_b`` — per-hash work ≤ hot_cap², total
  bounded by Σ fanout² over capped hashes.
- per-host distinct content counts (for the Jaccard denominator) come
  from the UNCAPPED table — |A| is the host's true content size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.urls import url_host

MIRRORS_VERSION = "mirrors/v1"


def _content_hash(text_col: str) -> F.Column:
    # exact_dedup's normalization, verbatim (dedup.py discipline)
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return F.sha2(norm, 256)


def mirror_candidates(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_shared: int = 2,
    hot_cap: int = 64,
) -> DataFrame:
    """Host pairs sharing ≥ ``min_shared`` identical documents:
    ``(host_a, host_b, n_shared, n_a, n_b, containment, jaccard)``
    with ``host_a < host_b``, ``containment`` = n_shared/min(n_a,n_b)
    and ``jaccard`` = n_shared/(n_a+n_b−n_shared), both 6 dp.
    """
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    if hot_cap < 2:
        raise ValueError("hot_cap must be >= 2")
    hh = df.select(
        _content_hash(text_col).alias("h"),
        url_host(F.col(url_col)).alias("host"),
    ).distinct()
    sizes = hh.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    fan = hh.groupBy("h").agg(F.count(F.lit(1)).alias("_fan"))
    capped = hh.join(
        fan.filter(
            (F.col("_fan") >= 2) & (F.col("_fan") <= hot_cap)
        ).select("h"),
        "h",
        "left_semi",
    )
    a = capped.select("h", F.col("host").alias("host_a"))
    b = capped.select("h", F.col("host").alias("host_b"))
    pairs = (
        a.join(b, "h")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(
        F.col("host").alias("host_a"), F.col("n_docs").alias("n_a")
    )
    sb = sizes.select(
        F.col("host").alias("host_b"), F.col("n_docs").alias("n_b")
    )
    j = pairs.join(sa, "host_a").join(sb, "host_b")
    shared = F.col("n_shared").cast("double")
    return j.select(
        "host_a",
        "host_b",
        "n_shared",
        "n_a",
        "n_b",
        F.round(shared / F.least("n_a", "n_b").cast("double"), 6).alias(
            "containment"
        ),
        F.round(
            shared
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                "double"
            ),
            6,
        ).alias("jaccard"),
    )


# ------------------------------------------------------------- fixture


def generate_mirror_pages(n_sites: int = 12, docs_per: int = 20, seed: int = 617):
    """Deterministic crawl fixture with planted mirror structure:
    ``m{i}a.example.com`` / ``m{i}b.example.com`` pairs share most
    documents (with whitespace/case variation the normalization must
    collapse), every host serves one universal boilerplate page (the
    hot-hash stratum the cap must exclude), and ``solo*`` hosts share
    nothing. Returns pandas DataFrame (url, text).
    """
    import pandas as pd

    rows = []
    for i in range(n_sites):
        a, b = f"m{i}a.example.com", f"m{i}b.example.com"
        for d in range(docs_per):
            body = f"site {i} document {d} body with stable words " * 4
            rows.append((f"https://{a}/doc-{d}", body))
            if d % 5 != 0:  # mirror ~80% of docs, vary whitespace/case
                mirrored = ("  " + body.upper()) if d % 2 else body
                rows.append((f"https://{b}/doc-{d}", mirrored))
            else:
                rows.append(
                    (f"https://{b}/doc-{d}", f"b-only {i} {d} text " * 6)
                )
        rows.append((f"https://{a}/empty", "domain parked placeholder"))
        rows.append((f"https://{b}/empty", "domain parked placeholder"))
    for s in range(6):
        h = f"solo{s}.example.net"
        for d in range(8):
            rows.append((f"https://{h}/p-{d}", f"unique {s} {d} words " * 5))
        rows.append((f"https://{h}/empty", "domain parked placeholder"))
    return pd.DataFrame(rows, columns=["url", "text"])


# ---------------------------------------------------------------- oracle


def oracle_mirrors_sql(
    rel_sql: str,
    url_col: str = "url",
    text_col: str = "text",
    min_shared: int = 2,
    hot_cap: int = 64,
) -> str:
    """DuckDB twin of :func:`mirror_candidates` (same normalization,
    cap and pair semantics)."""
    from med_doi_feature_extraction_spark.operators.urls import sql_url_host

    host = sql_url_host(url_col)
    h = (
        f"sha256(lower(trim(regexp_replace(\"{text_col}\", "
        f"'\\s+', ' ', 'g'))))"
    )
    return f"""
WITH hh AS (
  SELECT DISTINCT {h} AS h, {host} AS host FROM {rel_sql}
),
sizes AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_docs FROM hh GROUP BY host
),
fan AS (
  SELECT h FROM hh GROUP BY h
  HAVING count(*) >= 2 AND count(*) <= {hot_cap}
),
capped AS (SELECT hh.h, hh.host FROM hh JOIN fan USING (h)),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM capped a JOIN capped b ON a.h = b.h AND a.host < b.host
  GROUP BY 1, 2 HAVING count(*) >= {min_shared}
)
SELECT p.host_a, p.host_b, p.n_shared,
       sa.n_docs AS n_a, sb.n_docs AS n_b,
       round((p.n_shared)::DOUBLE
             / least(sa.n_docs, sb.n_docs)::DOUBLE, 6) AS containment,
       round((p.n_shared)::DOUBLE
             / (sa.n_docs + sb.n_docs - p.n_shared)::DOUBLE, 6)
         AS jaccard
FROM pairs p
JOIN sizes sa ON sa.host = p.host_a
JOIN sizes sb ON sb.host = p.host_b
"""
