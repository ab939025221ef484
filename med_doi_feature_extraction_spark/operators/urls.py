"""URL canonicalization and crawl-graph features.

A Common-Crawl-style corpus keys everything on ``url`` (the
reference keys on DOI — ``src/models.py`` ``record_id``; the url is
the web-corpus analogue of that coalesced key). Near-identical URLs
(scheme/case/fragment/trailing-slash variants) fragment what is one
logical page across snapshots, so a canonical form is the join/dedup
key, and host/path shape features feed quality and skew handling
(hot-domain detection).

All pure Column regexp/string algebra — no UDF, rides the scan, and
each expression is mirrored 1:1 in the DuckDB oracle (plain
regexp_extract / regexp_replace), so the whole surface is
hash-checkable. ``F.parse_url`` is deliberately NOT used: its
java.net semantics aren't reproducible outside the JVM, and a
canonical key that only one engine can recompute is a bad corpus
key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-zA-Z]+://([^/?#]+)"
_PATH_RE = r"^[a-zA-Z]+://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"

#: Two-label public suffixes under which the registrable domain is
#: THREE labels (``a.b.co.uk`` → ``b.co.uk``). A static slice of the
#: Mozilla public-suffix list covering the high-traffic ccTLD
#: registries — enough that hot-domain skew detection does not merge
#: all of ``*.co.uk`` into one key (VERDICT r3 task 9). Deliberately
#: a frozen literal (no external fetch): corpus keys must be
#: reproducible across engines and time.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.mx", "org.mx", "gob.mx",
    "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.sg", "edu.sg", "gov.sg",
    "com.tw", "org.tw", "edu.tw",
    "com.hk", "org.hk", "edu.hk",
    "co.kr", "or.kr", "ac.kr", "go.kr",
    "com.ar", "com.tr", "com.my", "com.ph", "com.vn",
    "com.eg", "com.sa", "com.pk", "com.ng", "com.co", "com.pe",
    "co.id", "co.th", "co.il", "org.il", "ac.il",
)


def suffix_in_sql() -> str:
    """``'co.uk', 'org.uk', ...`` — the IN-list literal for DuckDB
    oracles, generated from the SAME constant the Spark expression
    uses so the two engines cannot drift."""
    return ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)


def sql_url_host(expr: str) -> str:
    """DuckDB expression mirroring :func:`url_host` 1:1 — the single
    source for every oracle that needs a host key (anchor_stats,
    reciprocal links, ...)."""
    return (
        "regexp_replace(regexp_replace("
        f"lower(regexp_extract({expr}, '^[a-zA-Z]+://([^/?#]+)', 1)),"
        " '^.*@', ''), ':(80|443)$', '')"
    )


def sql_url_domain(host_expr: str) -> str:
    """DuckDB expression mirroring :func:`url_domain` 1:1 (the
    suffix-aware registrable-domain CASE) — the single source for
    every oracle that needs a domain key; generated from the SAME
    suffix constant as the Spark expression."""
    return (
        f"CASE WHEN regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1)"
        f" IN ({suffix_in_sql()})"
        f" AND length(regexp_extract({host_expr},"
        f" '([^.]+\\.[^.]+\\.[^.]+)$', 1)) > 0"
        f" THEN regexp_extract({host_expr}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
        f" ELSE regexp_extract({host_expr}, '([^.]+\\.[^.]+)$', 1) END"
    )


def url_host(url: F.Column) -> F.Column:
    """Lower-cased host part: userinfo (``user:pass@``) and default
    port stripped, so ``http://user@a.example.com/`` and
    ``http://a.example.com/`` agree on host (ADVICE r3). Greedy
    ``^.*@`` removes everything up to the LAST ``@`` — the host
    itself cannot contain one (RFC 3986 §3.2.2)."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^.*@", "")
    return F.regexp_replace(host, r":(80|443)$", "")


def url_domain(host: F.Column) -> F.Column:
    """Registrable domain: last two labels of the host
    (``a.b.example.com`` → ``example.com``), except under a known
    multi-label public suffix (:data:`MULTI_LABEL_SUFFIXES`), where
    it is the last THREE (``a.b.example.co.uk`` → ``example.co.uk``).
    A bare suffix host (``co.uk`` itself) falls back to the two-label
    form rather than an empty string. Pure Column algebra — the
    IN-list compiles to a codegen'd hash-set probe, no UDF."""
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    return F.when(
        last2.isin(*MULTI_LABEL_SUFFIXES) & (F.length(last3) > 0), last3
    ).otherwise(last2)


def url_path(url: F.Column) -> F.Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def url_path_depth(url: F.Column) -> F.Column:
    """Number of non-empty path segments."""
    path = url_path(url)
    seg = F.filter(
        F.split(path, "/"), lambda s: F.length(s) > 0
    )
    return F.size(seg)


def url_query_param_count(url: F.Column) -> F.Column:
    # strip the fragment FIRST: a '?' inside the fragment
    # ("/#/route?tab=1") is not a query component (RFC 3986 §3.4/3.5)
    q = F.regexp_extract(F.regexp_replace(url, r"#.*$", ""), _QUERY_RE, 1)
    return F.when(F.length(q) == 0, F.lit(0)).otherwise(
        F.size(F.split(q, "&"))
    )


def canonical_url(url: F.Column) -> F.Column:
    """Canonical join/dedup key: lower scheme+host, default port and
    fragment stripped, empty path normalized to ``/`` (RFC 3986 §6.2.3:
    ``http://a.com`` ≡ ``http://a.com/`` — the homepage must be ONE
    key), trailing slash trimmed on deeper paths, query kept byte-exact
    (param reordering is site semantics, not ours to normalize)."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    # lower the scheme://host prefix only
    prefix = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z]+://[^/?#]*", "")
    # drop userinfo: user@host variants must collapse to ONE key
    prefix = F.regexp_replace(prefix, r"^([a-z]+://)[^/?#@]*@", r"$1")
    prefix = F.regexp_replace(prefix, r":(80|443)$", "")
    joined = F.concat(prefix, rest)
    # empty path → "/" (before the query if one follows the authority)
    joined = F.regexp_replace(joined, r"(^[a-z]+://[^/?#]+)(\?|$)", r"$1/$2")
    # trailing slash RUN on a path (not on the bare authority) — /+
    # so "/a/b//" collapses in one pass (idempotence property test)
    return F.regexp_replace(joined, r"(^[a-z]+://[^/?#]+/[^?#]*?)/+(\?|$)", r"$1$2")


def subdomain_census(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registrable-domain subdomain-explosion census: distinct
    hosts, URL count, and hosts-per-100-urls — wildcard-subdomain
    spam farms (``a1.spam.com, a2.spam.com, …``) show thousands of
    hosts with a handful of pages each, while a legitimate domain has
    few hosts and many pages. One (domain, host) hash-agg then one
    domain hash-agg, both map-side combinable; rate portable 6-dp."""
    host = url_host(F.col(url_col))
    per_host = (
        df.select(
            url_domain(host).alias("domain"), host.alias("_h")
        )
        .groupBy("domain", "_h")
        .agg(F.count(F.lit(1)).alias("n_u"))
    )
    agg = per_host.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.sum("n_u").cast("long").alias("n_urls"),
    )
    rate = (F.col("n_hosts") * F.lit(100.0)) / F.col("n_urls")
    r6 = F.floor(rate * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6) + F.lit(0.0)
    return agg.withColumn("hosts_per_100_urls", r6)


def sql_subdomain_census(parquet_glob: str, url_expr: str = "url") -> str:
    """DuckDB query mirroring :func:`subdomain_census`."""
    host = sql_url_host(url_expr)
    dom = (
        f"CASE WHEN regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
        f" IN ({suffix_in_sql()})"
        f" AND length(regexp_extract({host},"
        f" '([^.]+\\.[^.]+\\.[^.]+)$', 1)) > 0"
        f" THEN regexp_extract({host}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)"
        f" ELSE regexp_extract({host}, '([^.]+\\.[^.]+)$', 1) END"
    )
    return f"""
WITH ph AS (
  SELECT {dom} AS domain, {host} AS h, count(*) AS n_u
  FROM read_parquet('{parquet_glob}') GROUP BY 1, 2
), a AS (
  SELECT domain, CAST(count(*) AS BIGINT) AS n_hosts,
         CAST(sum(n_u) AS BIGINT) AS n_urls
  FROM ph GROUP BY 1
)
SELECT domain, n_hosts, n_urls,
       (floor(((n_hosts * 100.0) / n_urls) * 1e6 + 0.5) / 1e6 + 0.0)
           AS hosts_per_100_urls
FROM a
"""


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add canonical_url/host/domain/path_depth/query_params columns."""
    u = F.col(url_col)
    host = url_host(u)
    return df.withColumns(
        {
            "canonical_url": canonical_url(u),
            "host": host,
            "domain": url_domain(host),
            "path_depth": url_path_depth(u),
            "query_params": url_query_param_count(u),
        }
    )


def hot_domains(
    df: DataFrame, url_col: str = "url", min_pages: int = 1000
) -> DataFrame:
    """(domain, n_pages) for domains above ``min_pages`` — the skew
    census that feeds salting decisions (BASELINE north rule:
    hot-domain skew handled explicitly). One hash-agg exchange."""
    return (
        df.select(url_domain(url_host(F.col(url_col))).alias("domain"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .filter(F.col("n_pages") >= min_pages)
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    entry_col: str = "entry",
) -> DataFrame:
    """Drop pages whose URL matches a domain blocklist (the UT1-style
    adult/malware list filtering RefinedWeb/FineWeb run before any
    content gate). An entry blocks a page when it equals the page's
    HOST or any DOT-SUFFIX of it (entry ``example.com`` blocks
    ``example.com`` and ``a.b.example.com``; entry ``bad.example.com``
    blocks only that subtree).

    Scale shape — zero corpus shuffles: an entry can only match a
    host that shares its REGISTRABLE DOMAIN (a dot-suffix pins the
    trailing labels), so the blocklist is grouped to
    ``(domain, entries array)`` — blocklists are O(10^6) rows, tens
    of MB, inside the broadcast envelope — LEFT-joined on the page's
    ``url_domain``, and the exact suffix check is a scan-stage
    ``exists`` over the (per-domain small) entries array. One
    broadcast join, no explode of the corpus, payload never moves.
    Entries are lower-cased here; hosts normalized by
    :func:`url_host`.

    Contract: entries must be REGISTRABLE domains or deeper
    (``example.com``, ``bad.example.com``) — public-suffix-wide
    entries (``com``, ``co.uk``) do not share their victims'
    registrable domain and are ignored by design (no real blocklist
    blocks an entire TLD)."""
    host = url_host(F.col(url_col))
    dom = url_domain(host)
    ent = F.lower(F.col(entry_col))
    by_dom = (
        blocklist.select(ent.alias("_e"))
        .withColumn("_bd", url_domain(F.col("_e")))
        .groupBy("_bd")
        .agg(F.collect_set("_e").alias("_entries"))
    )
    joined = df.withColumn("_pd", dom).join(
        F.broadcast(by_dom), F.col("_pd") == F.col("_bd"), "left"
    )
    h = url_host(F.col(url_col))
    blocked = F.exists(
        F.coalesce(F.col("_entries"), F.array().cast("array<string>")),
        lambda e: (h == e) | h.endswith(F.concat(F.lit("."), e)),
    )
    return joined.filter(~blocked).drop("_pd", "_bd", "_entries")


def surt_key(url: F.Column) -> F.Column:
    """SURT-form sortable URL key (the Common Crawl / web-archive
    index convention): host labels REVERSED and comma-joined, then
    ``)`` + the path — ``https://news.example.com/a/b`` →
    ``com,example,news)/a/b``. Sorting or range-partitioning a
    10^12-row url table on this key clusters every host under its
    registrable domain and every domain under its TLD, which is what
    makes per-domain scans pushdown-prunable on a sorted layout
    (the lexicographic twin of `layout.py`'s Z-order trick, for the
    one-dimensional url case). Leading ``www.`` dropped (archive
    convention); query strings excluded (the key addresses the
    resource, not its parameters). Pure codegen Column algebra."""
    host = F.regexp_replace(url_host(url), r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.coalesce(
        F.nullif(url_path(url), F.lit("")), F.lit("/")
    )
    return F.concat(rev, F.lit(")"), path)


def sql_surt_key(expr: str) -> str:
    """DuckDB twin of :func:`surt_key`."""
    host = f"regexp_replace({sql_url_host(expr)}, '^www\\.', '')"
    rev = (
        f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    )
    path = (
        f"coalesce(nullif(regexp_extract({expr}, "
        f"'^[a-zA-Z]+://[^/?#]*(/[^?#]*)', 1), ''), '/')"
    )
    return f"({rev} || ')' || {path})"
