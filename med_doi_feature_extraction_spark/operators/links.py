"""HTML outlink extraction and anchor-text aggregation.

Web-corpus pipelines derive graph and anchor-text signals straight
from the crawl: outlinks feed host/page-level PageRank (Common Crawl
publishes exactly this graph; `operators/graph.py` consumes the edge
table this module produces), and the anchor text pointing AT a page
is a classic relevance/quality prior (it is how search engines
described pages before content analysis). The reference repo scores
records in isolation (`src/services/quality_service.py`); a
corpus-scale engine needs the cross-document link structure too.

Execution shape (the one that survives 100×):

- Extraction is pure JVM Column algebra — ``regexp_extract_all`` over
  the page HTML inside the scan stage (whole-stage codegen), then ONE
  ``explode``. No Python touches the hot path; the wide ``html``
  column never crosses a shuffle (the exploded output is the narrow
  (src, dst, anchor) triple).
- ``anchor_stats`` is one hash-agg keyed on the canonical target URL;
  partial aggregation absorbs hot targets (every page linking to a
  homepage) map-side. Deterministic representative anchor via ``min``
  — no ordering dependence, engine-portable.
- The regex dialect is the Java∩RE2 portable subset (same discipline
  as `operators/pii.py`): no lookaround, no backreferences — the
  DuckDB contract oracle runs the IDENTICAL pattern.

Extraction contract (documented subset, mirrored in the oracle):

- only double-quoted ``href`` attributes of ``<a>`` tags whose anchor
  text contains no nested markup (``[^<]*``) are extracted — links
  with nested tags in the anchor are out of scope for the signal, not
  silently mangled;
- absolute ``http(s)://`` hrefs are kept as-is, protocol-relative
  ``//host/...`` resolve against the source scheme, root-relative
  ``/path`` against the source origin; everything else
  (``mailto:``, ``javascript:``, path-relative, empty, bare
  fragments) is dropped — path-relative resolution needs dot-segment
  arithmetic that buys little on crawl data where boilerplate nav
  links are root-relative;
- fragments are stripped from the resolved target (RFC 3986 §3.5 —
  fragments are client-side);
- anchor text is whitespace-trimmed and minimally entity-unescaped
  (``&lt; &gt; &quot; &#x27; &amp;`` — amp LAST so ``&amp;lt;``
  round-trips to the literal ``&lt;`` the author wrote).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.urls import url_host

LINKS_VERSION = "links/1"

# portable (Java ∩ RE2): <a ...href="..."...>anchor-without-markup</a>
A_TAG_RE = r'<a\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>'

# (entity, literal) — ORDER MATTERS: &amp; must be unescaped last
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#x27;", "'"),
    ("&amp;", "&"),
)


def _unescape_min(col: F.Column) -> F.Column:
    for ent, lit in _ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(lit))
    return col


def resolve_href(src: F.Column, href: F.Column) -> F.Column:
    """Resolve ``href`` against the source URL per the module
    contract; NULL for unresolvable kinds. Fragment stripped."""
    scheme = F.regexp_extract(src, r"^([a-z]+):", 1)
    origin = F.regexp_extract(src, r"^[a-z]+://[^/?#]+", 0)
    dst = (
        F.when(href.rlike(r"^https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.lit(None).cast("string"))
    )
    dst = F.regexp_replace(dst, r"#.*$", "")
    return F.when(F.length(dst) > 0, dst)


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src, dst, anchor) outlink triples from the HTML column (binary
    or string). One regexp scan + one explode; rows whose href does
    not resolve are dropped. All other input columns are pruned —
    the wide html column must not survive into downstream shuffles."""
    html = F.col(html_col).cast("string")
    tags = F.explode(F.regexp_extract_all(html, F.lit(A_TAG_RE), 0))
    x = df.select(
        F.col(url_col).alias("src"),
        *[F.col(c) for c in df.columns if c == "warc_ts"],
        tags.alias("_tag"),
    )
    href = F.regexp_extract(F.col("_tag"), A_TAG_RE, 1)
    anchor = _unescape_min(F.trim(F.regexp_extract(F.col("_tag"), A_TAG_RE, 2)))
    out = x.select(
        "src",
        *[F.col(c) for c in x.columns if c == "warc_ts"],
        resolve_href(F.col("src"), href).alias("dst"),
        anchor.alias("anchor"),
    )
    return out.filter(F.col("dst").isNotNull())


def anchor_stats(links: DataFrame) -> DataFrame:
    """Per-target inbound summary: in-link count, distinct linking
    pages/hosts, and a deterministic representative anchor (the
    lexicographic min over non-empty anchors). One hash-agg on dst."""
    nonempty = F.when(F.length("anchor") > 0, F.col("anchor"))
    return links.groupBy("dst").agg(
        F.count(F.lit(1)).alias("in_links"),
        F.countDistinct("src").alias("n_src"),
        F.countDistinct(url_host(F.col("src"))).alias("n_src_hosts"),
        F.min(nonempty).alias("top_anchor"),
    )


def link_edges(links: DataFrame) -> DataFrame:
    """Host-level weighted edge table for `operators/graph.pagerank`:
    (src, dst, weight) with self-loops dropped (a page linking within
    its own host is navigation, not endorsement)."""
    e = links.select(
        url_host(F.col("src")).alias("src"),
        url_host(F.col("dst")).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return e.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))


def reciprocal_links(edges: DataFrame) -> DataFrame:
    """Unordered host pairs that link each other BOTH ways —
    the classic link-exchange / link-farm signal. Input is the
    host-granularity edge table from :func:`link_edges` (already
    aggregated: ≪ corpus size), so the self-join here shuffles the
    SMALL edge table on its keys, never the page corpus; emitted once
    per pair via ``host_a < host_b``."""
    a = edges.select(
        F.col("src").alias("host_a"),
        F.col("dst").alias("host_b"),
        F.col("weight").alias("w_ab"),
    )
    b = edges.select(
        F.col("dst").alias("host_a"),
        F.col("src").alias("host_b"),
        F.col("weight").alias("w_ba"),
    )
    return (
        a.join(b, ["host_a", "host_b"])
        .where(F.col("host_a") < F.col("host_b"))
        .select(
            "host_a",
            "host_b",
            F.col("w_ab").cast("long").alias("w_ab"),
            F.col("w_ba").cast("long").alias("w_ba"),
        )
    )


def link_reciprocity(edges: DataFrame) -> DataFrame:
    """Per-host link-graph hygiene: out/in degree (distinct
    counterpart hosts) and how many outlinked hosts link back —
    ``reciprocity`` = n_reciprocal / out_deg (portable 6-dp round).
    High reciprocity at high degree is the link-ring shape. All
    joins are on the aggregated host-edge table."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    recip = (
        edges.join(rev, ["src", "dst"], "left_semi")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
    )
    outd = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ind = (
        edges.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("in_deg"))
        .withColumnRenamed("dst", "src")
    )
    base = (
        outd.join(ind, "src", "full_outer")
        .join(recip, "src", "left")
        .select(
            F.col("src").alias("host"),
            F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce("n_reciprocal", F.lit(0))
            .cast("long")
            .alias("n_reciprocal"),
        )
    )
    ratio = F.col("n_reciprocal") / F.col("out_deg")
    r6 = F.floor(ratio * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return base.withColumn(
        "reciprocity",
        (F.when(F.col("out_deg") > 0, r6).otherwise(F.lit(0.0))
         + F.lit(0.0)).cast("double"),
    )


def outlink_profile(links: DataFrame) -> DataFrame:
    """Per-source-page outlink spam features: total outlinks,
    external count/ratio (target host ≠ own host), distinct target
    hosts, and the max share of outlinks aimed at ONE external host
    (the link-farm tell: many links, few distinct targets). One
    hash-agg on (src, dst_host) then one on src — both map-side
    combinable; ratios portable 6-dp."""
    from med_doi_feature_extraction_spark.operators.urls import url_host

    e = links.select(
        "src",
        url_host(F.col("src")).alias("_sh"),
        url_host(F.col("dst")).alias("_dh"),
    )
    per_host = e.groupBy("src", "_sh", "_dh").agg(
        F.count(F.lit(1)).alias("n_h")
    )
    ext = F.col("_dh") != F.col("_sh")
    agg = per_host.groupBy("src").agg(
        F.sum("n_h").cast("long").alias("n_out"),
        F.sum(F.when(ext, F.col("n_h")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_ext"),
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.max(F.when(ext, F.col("n_h")).otherwise(F.lit(0)))
        .cast("long")
        .alias("max_ext_one_host"),
    )
    def _r6(c: F.Column) -> F.Column:
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6) + F.lit(0.0)

    return agg.select(
        "src",
        "n_out",
        "n_ext",
        "n_hosts",
        _r6(F.col("n_ext") / F.col("n_out")).alias("ext_ratio"),
        F.when(
            F.col("n_ext") > 0,
            _r6(F.col("max_ext_one_host") / F.col("n_ext")),
        )
        .otherwise(F.lit(0.0))
        .alias("top_ext_share"),
    )


def anchor_expansion(
    links: DataFrame, k: int = 5
) -> DataFrame:
    """Inbound anchor-text expansion: for each target, the k
    lexicographically-first DISTINCT non-empty anchors joined with
    ``' | '`` — the classic retrieval-signal pseudo-text (anchor text
    describes the target better than the target does). Deterministic
    by construction: collect_set → array_sort → slice, one hash-agg
    on dst; k caps the per-target payload so a hot target (every
    page links the homepage) cannot blow the row."""
    nonempty = F.when(F.length("anchor") > 0, F.col("anchor"))
    return (
        links.groupBy("dst")
        .agg(F.collect_set(nonempty).alias("_set"))
        .select(
            "dst",
            F.array_join(
                F.slice(F.array_sort("_set"), 1, k), " | "
            ).alias("anchor_text"),
            F.least(F.size("_set"), F.lit(k))
            .cast("int")
            .alias("n_anchors"),
        )
        .where(F.col("n_anchors") > 0)
    )


def oracle_edges_cte(pages_glob: str) -> str:
    """Extends :func:`oracle_links_cte` with the host-level ``edges``
    CTE mirroring :func:`link_edges`."""
    from med_doi_feature_extraction_spark.operators.urls import sql_url_host

    hs = sql_url_host("src")
    hd = sql_url_host("dst")
    return (
        oracle_links_cte(pages_glob)
        + f""",
  edges AS (
    SELECT {hs} AS src, {hd} AS dst, CAST(count(*) AS BIGINT) AS weight
    FROM links WHERE {hs} <> {hd} GROUP BY 1, 2
  )
"""
    )


def oracle_links_cte(pages_glob: str) -> str:
    """DuckDB CTE body reproducing :func:`extract_links` over a seam
    parquet with columns (url, warc_ts, html_str). Runs the IDENTICAL
    portable regex and resolution CASE — keep in lockstep with the
    Column algebra above."""
    re_sql = A_TAG_RE.replace("'", "''")
    return f"""
  p AS (SELECT url, warc_ts, html_str
        FROM read_parquet('{pages_glob}')),
  m AS (SELECT url, warc_ts,
               unnest(regexp_extract_all(html_str, '{re_sql}', 0)) AS tag
        FROM p),
  x AS (SELECT url AS src, warc_ts,
               regexp_extract(tag, '{re_sql}', 1) AS href,
               replace(replace(replace(replace(replace(
                 trim(regexp_extract(tag, '{re_sql}', 2)),
                 '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                 '&#x27;', ''''), '&amp;', '&') AS anchor
        FROM m),
  resolved AS (
    SELECT src, warc_ts, anchor,
           regexp_replace(
             CASE
               WHEN regexp_matches(href, '^https?://') THEN href
               WHEN href LIKE '//%' THEN
                 regexp_extract(src, '^([a-z]+):', 1) || ':' || href
               WHEN href LIKE '/%' THEN
                 regexp_extract(src, '^[a-z]+://[^/?#]+', 0) || href
               ELSE NULL
             END, '#.*$', '') AS dst
    FROM x),
  links AS (SELECT src, warc_ts, dst, anchor
            FROM resolved WHERE dst IS NOT NULL AND length(dst) > 0)
"""


def link_churn(
    links: DataFrame,
    src_col: str = "src",
    ts_col: str = "warc_ts",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-(page, snapshot) outlink churn vs the page's PREVIOUS
    crawl snapshot: ``n_links, n_added, n_removed, n_kept,
    churn_rate`` (= (added+removed)/|union|, 6 dp). Link turnover is
    the freshness/instability signal the recrawl scheduler and the
    trap battery both want — a page whose outlink set is rewritten
    every crawl is navigation/ads churn, not content; one that never
    changes is static. First snapshots (no baseline) report
    ``n_links`` with NULL added/removed/kept/churn — explicitly, not
    as a fake zero.

    Input is :func:`extract_links` output (or any (src, ts, dst)
    edge stream); duplicate edges within a snapshot collapse first.

    Execution shape, 100 TB lens: ONE distinct on (src, ts, dst);
    the snapshot pairing is a lag window over the per-page snapshot
    list (partition = one page's snapshots, never the corpus); the
    prev-vs-cur comparison is a full-outer equi-join keyed on
    (src, ts, dst) — co-partitioned with the final (src, ts)
    hash-agg, so AQE reuses the exchange. No corpus×corpus shapes.
    """
    from pyspark.sql import Window

    e = links.select(
        F.col(src_col).alias("src"),
        F.col(ts_col).alias("ts"),
        F.col(dst_col).alias("dst"),
    ).distinct()
    snaps = e.select("src", "ts").distinct()
    w = Window.partitionBy("src").orderBy("ts")
    pairs = snaps.withColumn("prev_ts", F.lag("ts").over(w))
    cur = e.join(pairs, ["src", "ts"]).select(
        "src", "ts", "prev_ts", "dst", F.lit(1).alias("_c")
    )
    prev = (
        e.select(
            "src", F.col("ts").alias("prev_ts"), "dst",
            F.lit(1).alias("_p"),
        )
        .join(
            pairs.where(F.col("prev_ts").isNotNull()),
            ["src", "prev_ts"],
        )
        .select("src", "ts", "prev_ts", "dst", "_p")
    )
    m = cur.join(prev, ["src", "ts", "prev_ts", "dst"], "full_outer")
    agg = m.groupBy("src", "ts").agg(
        F.sum(F.col("_c")).cast("long").alias("_n_cur"),
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_p").isNull(), 1)
        ).cast("long").alias("_added"),
        F.sum(
            F.when(F.col("_p").isNotNull() & F.col("_c").isNull(), 1)
        ).cast("long").alias("_removed"),
        F.sum(
            F.when(F.col("_c").isNotNull() & F.col("_p").isNotNull(), 1)
        ).cast("long").alias("_kept"),
        F.max("prev_ts").alias("_prev"),
        F.count(F.lit(1)).cast("long").alias("_union"),
    )
    has_prev = F.col("_prev").isNotNull()
    z = F.coalesce
    return agg.select(
        "src",
        "ts",
        z(F.col("_n_cur"), F.lit(0)).alias("n_links"),
        F.when(has_prev, z(F.col("_added"), F.lit(0))).alias("n_added"),
        F.when(has_prev, z(F.col("_removed"), F.lit(0))).alias(
            "n_removed"
        ),
        F.when(has_prev, z(F.col("_kept"), F.lit(0))).alias("n_kept"),
        F.when(
            has_prev,
            F.round(
                (
                    z(F.col("_added"), F.lit(0))
                    + z(F.col("_removed"), F.lit(0))
                ).cast("double")
                / F.col("_union"),
                6,
            ),
        ).alias("churn_rate"),
    )


def oracle_link_churn_sql(links_sql: str) -> str:
    """DuckDB twin of :func:`link_churn` (``links_sql`` yields
    (src, warc_ts, dst))."""
    return f"""
WITH e AS (
  SELECT DISTINCT src, warc_ts AS ts, dst FROM {links_sql}
),
snaps AS (SELECT DISTINCT src, ts FROM e),
pairs AS (
  SELECT src, ts,
         lag(ts) OVER (PARTITION BY src ORDER BY ts) AS prev_ts
  FROM snaps
),
cur AS (
  SELECT e.src, e.ts, p.prev_ts, e.dst, 1 AS c
  FROM e JOIN pairs p ON p.src = e.src AND p.ts = e.ts
),
prv AS (
  SELECT p.src, p.ts, p.prev_ts, e.dst, 1 AS pp
  FROM e JOIN pairs p ON p.src = e.src AND p.prev_ts = e.ts
),
m AS (
  SELECT coalesce(c.src, p.src) AS src,
         coalesce(c.ts, p.ts) AS ts,
         coalesce(c.prev_ts, p.prev_ts) AS prev_ts,
         c.c, p.pp
  FROM cur c
  FULL OUTER JOIN prv p
    ON c.src = p.src AND c.ts = p.ts AND c.prev_ts = p.prev_ts
   AND c.dst = p.dst
),
agg AS (
  SELECT src, ts,
         CAST(coalesce(sum(c), 0) AS BIGINT) AS n_cur,
         CAST(coalesce(sum(CASE WHEN c IS NOT NULL AND pp IS NULL
                                THEN 1 END), 0) AS BIGINT) AS added,
         CAST(coalesce(sum(CASE WHEN pp IS NOT NULL AND c IS NULL
                                THEN 1 END), 0) AS BIGINT) AS removed,
         CAST(coalesce(sum(CASE WHEN c IS NOT NULL AND pp IS NOT NULL
                                THEN 1 END), 0) AS BIGINT) AS kept,
         max(prev_ts) AS prev_ts,
         CAST(count(*) AS BIGINT) AS un
  FROM m GROUP BY src, ts
)
SELECT src, ts, n_cur AS n_links,
       CASE WHEN prev_ts IS NOT NULL THEN added END AS n_added,
       CASE WHEN prev_ts IS NOT NULL THEN removed END AS n_removed,
       CASE WHEN prev_ts IS NOT NULL THEN kept END AS n_kept,
       CASE WHEN prev_ts IS NOT NULL
            THEN round((added + removed)::DOUBLE / un, 6) END
         AS churn_rate
FROM agg
"""
