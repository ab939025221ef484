"""robots.txt-style URL admission: longest-prefix-match rule
evaluation per host (the Robots Exclusion Protocol matching core,
RFC 9309 §2.2.2).

A crawl-derived corpus has to answer "was this URL even allowed?"
retroactively — license audits, takedown sweeps, and polite-recrawl
scheduling all re-evaluate the rule table against the stored URL
set. The REP decision procedure: collect every rule of the URL's
host whose path-prefix matches, pick the LONGEST match, allow wins
ties; a URL with no matching rule (or an unlisted host) is allowed.

Execution shape, 100 TB lens: the rule table is bounded (a few
rules per host) and broadcast — the candidate expansion is a
broadcast equi-join on host (no corpus shuffle), the per-URL winner
is ONE hash-agg ``max(struct(len, is_allow, prefix, type))`` on the
URL key (lexicographic struct max encodes exactly the REP
tie-break), and the verdict re-attaches with one keyed join. No
window over the corpus, no NLJ: prefix matching stays inside the
hash-join's residual filter.

Portability: host/path parsing reuses the portable regex algebra of
operators/urls (no parse_url), so an oracle engine runs the
IDENTICAL expressions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.urls import (
    url_host,
    url_path,
)


def apply_robots(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_cols: Sequence[str] = ("url",),
    host_col: str = "host",
    type_col: str = "rule",
    prefix_col: str = "path_prefix",
) -> DataFrame:
    """Evaluate REP rules against a URL table.

    ``rules``: one row per (host, 'allow'|'disallow', path_prefix);
    hosts must be normalized (lowercase, no userinfo/default port) —
    the URL side is normalized here with the same algebra.

    Output: ``*id_cols, url, robots_type, robots_prefix,
    robots_allowed`` (BIGINT 0/1; 1 when no rule matches).
    """
    ids = list(id_cols)
    u = df.select(
        *ids,
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("_host"),
        F.coalesce(
            F.nullif(url_path(F.col(url_col)), F.lit("")), F.lit("/")
        ).alias("_path"),
    )
    r = rules.select(
        F.col(host_col).alias("_host"),
        F.col(type_col).alias("_type"),
        F.col(prefix_col).alias("_prefix"),
    )
    matched = (
        u.join(F.broadcast(r), "_host")
        .filter(F.col("_path").startswith(F.col("_prefix")))
        .groupBy(*ids)
        .agg(
            F.max(
                F.struct(
                    F.length("_prefix").alias("len"),
                    (F.col("_type") == "allow")
                    .cast("int")
                    .alias("is_allow"),
                    F.col("_prefix").alias("prefix"),
                    F.col("_type").alias("type"),
                )
            ).alias("_best")
        )
    )
    out = u.join(matched, ids, "left")
    return out.select(
        *ids,
        "url",
        F.col("_best.type").alias("robots_type"),
        F.col("_best.prefix").alias("robots_prefix"),
        F.when(F.col("_best").isNull(), F.lit(1))
        .when(F.col("_best.is_allow") == 1, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("robots_allowed"),
    )


def oracle_robots_sql(
    urls_sql: str,
    rules_sql: str,
    id_cols: Sequence[str],
    url_col: str = "url",
) -> str:
    """DuckDB twin of :func:`apply_robots` — identical host/path
    regex algebra and the same (len, is_allow, prefix) tie-break via
    a window."""
    ids = ", ".join(f'"{c}"' for c in id_cols)
    ids_u = ", ".join(f'u."{c}"' for c in id_cols)
    return f"""
WITH u AS (
  SELECT {ids}, "{url_col}" AS url,
    regexp_replace(regexp_replace(
      lower(regexp_extract("{url_col}", '^[a-zA-Z]+://([^/?#]+)', 1)),
      '^.*@', ''), ':(80|443)$', '') AS host,
    coalesce(nullif(
      regexp_extract("{url_col}",
        '^[a-zA-Z]+://[^/?#]*(/[^?#]*)', 1), ''), '/') AS path
  FROM {urls_sql}
),
m AS (
  SELECT {ids}, r.rule AS rtype, r.path_prefix AS rprefix,
    row_number() OVER (
      PARTITION BY {ids}
      ORDER BY length(r.path_prefix) DESC,
               CASE WHEN r.rule = 'allow' THEN 1 ELSE 0 END DESC,
               r.path_prefix DESC
    ) AS rn
  FROM u JOIN ({rules_sql}) r ON r.host = u.host
  WHERE starts_with(u.path, r.path_prefix)
),
best AS (SELECT * FROM m WHERE rn = 1)
SELECT {ids_u}, u.url,
       best.rtype AS robots_type,
       best.rprefix AS robots_prefix,
       CAST(CASE WHEN best.rtype IS NULL THEN 1
                 WHEN best.rtype = 'allow' THEN 1
                 ELSE 0 END AS BIGINT) AS robots_allowed
FROM u LEFT JOIN best USING ({ids})
"""
