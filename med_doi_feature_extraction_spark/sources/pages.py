"""Seeded synthetic generator for the canonical ``pages`` table.

Produces the input shape mandated by BASELINE.json ``input_hint``:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

plus the as-of dimension ``dim_snapshots(domain, obs_ts, rank_score,
category)`` (FIXTURES.md F1/F3). Fully deterministic per seed; the
generator writes the ground-truth text FIRST and then wraps it in
template HTML (headings/paragraphs/script/style/comments/entities/
inline + malformed tags) such that ``kernels.html_text.extract_text``
recovers the text byte-identically — that identity is asserted in
tests, making the golden suite self-verifying.

Skew: ``hot_domain_frac`` routes that fraction of URLs to a single
domain for skew/salting tests (SURVEY.md §5.2.4).
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from med_doi_feature_extraction_spark.kernels.html_text import extract_text

_VOCAB = (
    "the quick brown fox jumps over lazy dog data feature extract pipeline "
    "spark shuffle partition window session crawl snapshot medical journal "
    "abstract study patient trial result method analysis café naïve données "
    "straße 中文 研究 résumé coöperate AT&T x<y alpha beta gamma delta"
).split()

_LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]
_TLDS = ["com", "org", "net", "edu"]
_CATEGORIES = ["news", "research", "blog", "reference", "forum"]

_BASE_TS = datetime(2024, 1, 1, 0, 0, 0)


def domain_of_url(url: str) -> str:
    """Python twin of the engine's ``F.parse_url(url, 'HOST')``."""
    return url.split("://", 1)[1].split("/", 1)[0]


def _make_doi(rng: np.random.Generator) -> str:
    prefix = 1000 + int(rng.integers(0, 9000))
    suffix = "".join(
        rng.choice(list("abcdefghij0123456789"), size=8)
    )
    return f"10.{prefix}/{suffix}.{int(rng.integers(1, 99))}"


def _make_text(rng: np.random.Generator, page_scale: int = 1) -> list[str]:
    """Ground-truth text as a list of non-empty, space-normalized lines.

    ``page_scale`` multiplies paragraph count — scale≈8 yields ~20 KB
    HTML, the realistic Common-Crawl page size for bench/scaling runs
    (default 1 keeps unit-test fixtures small)."""
    lines = [" ".join(rng.choice(_VOCAB, size=int(rng.integers(3, 7))))]  # title
    n_paras = int(rng.integers(2, 8)) * page_scale
    for _ in range(n_paras):
        words = list(rng.choice(_VOCAB, size=int(rng.integers(5, 30))))
        for _ in range(int(rng.integers(0, 3))):
            if rng.random() < 0.4:
                words.insert(int(rng.integers(0, len(words))), _make_doi(rng))
        lines.append(" ".join(words))
    return lines


def _make_href(rng: np.random.Generator) -> str:
    """Deterministic synthetic href covering every resolution class
    of `operators/links.extract_links`: absolute, protocol-relative,
    root-relative, fragment-bearing, and the documented drop kinds
    (mailto/javascript/path-relative)."""
    kind = float(rng.random())
    d = int(rng.integers(0, 8))
    v = int(rng.integers(0, 500))
    tld = _TLDS[d % len(_TLDS)]
    host = f"site{d}.example.{tld}"
    if kind < 0.40:
        return f"https://{host}/page/{v}"
    if kind < 0.55:
        return f"//{host}/page/{v}"
    if kind < 0.70:
        return f"/page/{v}"
    if kind < 0.78:
        return f"https://{host}/page/{v}#sec{int(rng.integers(1, 5))}"
    if kind < 0.86:
        return "mailto:editor@example.com"
    if kind < 0.94:
        return "javascript:void(0)"
    return f"page/{v}.html"


def _wrap_html(
    lines: list[str], rng: np.random.Generator, link_frac: float = 0.0
) -> bytes:
    """Wrap ground-truth lines in template HTML whose extraction is
    byte-identical to ``"\\n".join(lines)``. ``link_frac`` wraps that
    fraction of paragraphs' words in ``<a href=...>`` anchors (the
    anchor word stays extracted text, so byte-identity holds); ALL
    link-related rng draws are guarded behind ``link_frac > 0`` so
    the default rng stream — and every golden pinned against it — is
    unchanged."""
    def esc(s: str) -> str:
        return _html.escape(s)

    def inline_mark(line: str) -> str:
        words = line.split(" ")
        i = int(rng.integers(0, len(words)))
        tag = rng.choice(["b", "i", "em", "strong", "span"])
        words[i] = f"<{tag}>{esc(words[i])}</{tag}>"
        return " ".join(esc(w) if not w.startswith("<") else w for w in words)

    parts = [
        "<html><head>",
        f"<title>{esc(lines[0])}</title>",
        '<style>body { color: #333; } .x>.y { margin: 0; }</style>',
        '<script type="text/javascript">var x = "<p>not text</p>"; if (x < 2) {}</script>',
        "</head><body>",
        "<!-- generator: synthetic page; this comment is not text -->",
    ]
    for j, line in enumerate(lines[1:], start=1):
        block = rng.choice(["p", "p", "p", "div", "h2", "li", "blockquote"])
        content = inline_mark(line) if rng.random() < 0.5 else esc(line)
        if link_frac > 0 and rng.random() < link_frac:
            words = content.split(" ")
            i = int(rng.integers(0, len(words)))
            if not words[i].startswith("<"):
                href = _make_href(rng)
                words[i] = f'<a href="{href}">{words[i]}</a>'
                content = " ".join(words)
        parts.append(f"<{block}>{content}</{block}>")
        if rng.random() < 0.15:
            parts.append("</div>")  # stray close tag (malformed; extracts empty)
        if rng.random() < 0.1:
            parts.append("<b>")  # unclosed inline tag (malformed; no text)
        if rng.random() < 0.2:
            parts.append("<noscript>js disabled banner</noscript>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def generate_pages(
    n_urls: int = 100,
    seed: int = 42,
    hot_domain_frac: float = 0.0,
    max_snapshots: int = 20,
    null_text_frac: float = 0.10,
    null_lang_frac: float = 0.05,
    session_gap_seconds: int = 3600,
    validate: bool = False,
    page_scale: int = 1,
    link_frac: float = 0.0,
) -> pd.DataFrame:
    """Deterministic pages table (one row per (url, warc_ts) snapshot)."""
    rng = np.random.default_rng(seed)
    n_domains = max(4, n_urls // 10)
    rows: list[dict] = []
    for u in range(n_urls):
        if hot_domain_frac > 0 and rng.random() < hot_domain_frac:
            dom_i = 0
        else:
            # Zipf-ish: low domain ids more likely
            dom_i = int(rng.zipf(1.5)) % n_domains
        domain = f"site{dom_i}.example.{_TLDS[dom_i % len(_TLDS)]}"
        url = f"https://{domain}/page/{u}"
        n_snaps = int(rng.integers(1, max_snapshots + 1))
        ts = _BASE_TS + timedelta(seconds=int(rng.integers(0, 86400)))
        lang = rng.choice(_LANGS)
        for s in range(n_snaps):
            if s > 0:
                # mixture of intra-session and session-breaking gaps
                if rng.random() < 0.6:
                    gap = int(rng.integers(60, session_gap_seconds // 2))
                else:
                    gap = int(rng.integers(session_gap_seconds * 2, session_gap_seconds * 48))
                ts = ts + timedelta(seconds=gap)
            lines = _make_text(rng, page_scale)
            text = "\n".join(lines)
            html = _wrap_html(lines, rng, link_frac=link_frac)
            if validate:
                assert extract_text(html) == text, url
            rows.append(
                {
                    "url": url,
                    "warc_ts": ts,
                    "html": html,
                    "text": None if rng.random() < null_text_frac else text,
                    "lang": None if rng.random() < null_lang_frac else str(lang),
                }
            )
    df = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    return df


def generate_dim_snapshots(
    pages: pd.DataFrame, seed: int = 43, obs_per_domain: int = 12
) -> pd.DataFrame:
    """As-of right side (FIXTURES.md F3): per-domain observations over
    the pages time range, including exact-tie timestamps (obs_ts ==
    some warc_ts) to pin the ``ts_right <= warc_ts`` latest-wins
    semantics in tests."""
    rng = np.random.default_rng(seed)
    domains = sorted({domain_of_url(u) for u in pages["url"]})
    t_lo = pages["warc_ts"].min()
    t_hi = pages["warc_ts"].max()
    span = max(1, int((t_hi - t_lo).total_seconds()))
    rows = []
    page_ts = pages["warc_ts"].tolist()
    for d in domains:
        for _ in range(obs_per_domain):
            if rng.random() < 0.1:  # exact-tie injection
                ts = page_ts[int(rng.integers(0, len(page_ts)))]
            else:
                ts = t_lo + timedelta(seconds=int(rng.integers(-3600, span + 3600)))
            rows.append(
                {
                    "domain": d,
                    "obs_ts": ts,
                    "rank_score": round(float(rng.random()), 6),
                    "category": str(rng.choice(_CATEGORIES)),
                }
            )
    df = pd.DataFrame(rows, columns=["domain", "obs_ts", "rank_score", "category"])
    df["obs_ts"] = df["obs_ts"].astype("datetime64[us]")
    return df


def generate_pages_spark(
    spark,
    out_dir: str,
    n_urls: int,
    seed: int = 42,
    urls_per_task: int = 1000,
    **gen_kwargs,
) -> tuple[str, str]:
    """Cluster-parallel generation of a large pages table: each task
    runs the seeded generator for one url-range (deterministic per
    (seed, range)), writing multi-file parquet ready for parallel
    scans. This is how bench/scaling fixtures at realistic page sizes
    are produced without a driver-side bottleneck."""
    import os

    from pyspark.sql import types as T

    chunks = [
        (lo, min(urls_per_task, n_urls - lo))
        for lo in range(0, n_urls, urls_per_task)
    ]
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )

    def gen(iterator):
        for pdf in iterator:
            for lo, n in zip(pdf["lo"], pdf["n"]):
                out = generate_pages(n_urls=int(n), seed=seed + int(lo), **gen_kwargs)
                out["url"] = out["url"].str.replace(
                    "/page/", f"/page/{int(lo)}_", regex=False
                )
                yield out

    chunk_df = spark.createDataFrame(
        pd.DataFrame(chunks, columns=["lo", "n"])
    ).repartition(len(chunks))
    pages = chunk_df.mapInPandas(gen, schema)
    pages_path = os.path.join(out_dir, "pages.parquet")
    pages.write.mode("overwrite").parquet(pages_path)

    # Dim generation needs (a) the distinct domain set, (b) the exact
    # global ts range, (c) a pool of REAL page timestamps for
    # exact-tie injection — never the full (url, warc_ts) table,
    # which the old path pulled with a whole-table toPandas() and
    # which would OOM the driver on a 100x fixture. Every collect
    # below is bounded: |domains| rows, 1 agg row, and a
    # deterministic hash-sampled ts pool capped near ``tie_cap``.
    from pyspark.sql import functions as F

    pg = spark.read.parquet(pages_path).select("url", "warc_ts")
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    domains = sorted(
        r["d"] for r in pg.select(host.alias("d")).distinct().collect()
    )
    rng_row = pg.agg(
        F.min("warc_ts").alias("lo"), F.max("warc_ts").alias("hi")
    ).first()
    tie_cap = 20_000
    k = max(1, n_urls // tie_cap)
    pool = (
        pg.where(F.pmod(F.xxhash64("url", "warc_ts"), F.lit(k)) == 0)
        .orderBy("url", "warc_ts")  # seed-stable pool order
        .limit(tie_cap)
        .toPandas()
    )
    pin_url = f"https://{domains[0]}/"
    sample = pd.concat(
        [
            pool,
            pd.DataFrame(
                {
                    "url": [f"https://{d}/" for d in domains]
                    + [pin_url, pin_url],
                    "warc_ts": [rng_row["lo"]] * len(domains)
                    + [rng_row["lo"], rng_row["hi"]],
                }
            ),
        ],
        ignore_index=True,
    )
    dim = generate_dim_snapshots(sample, seed=seed + 1)
    dim_path = os.path.join(out_dir, "dim_snapshots.parquet")
    spark.createDataFrame(dim).coalesce(1).write.mode("overwrite").parquet(dim_path)
    return pages_path, dim_path


def write_pages_parquet(
    out_dir: str, n_urls: int, seed: int = 42, **kwargs
) -> tuple[str, str]:
    """Materialize pages + dim to parquet (for bench / large fixtures).

    Generation is chunked by url-range so huge tables never sit fully
    in one pandas frame.

    Row groups are capped at 2,000 rows (~2-5 MB of html): Spark can
    only assign a file SPLIT to a task if a row group starts inside
    it, so pyarrow's default batching (which produced 3 × ~20k-row
    groups for the 60k-row sf0.1 table) silently capped the CPU-bound
    extract stage at 3-way parallelism no matter how many byte-range
    splits or cores existed. Real crawl tables (many files, 64-128 MB
    row groups) don't hit this; single-file local fixtures do."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)
    pages_path = os.path.join(out_dir, "pages.parquet")
    dim_path = os.path.join(out_dir, "dim_snapshots.parquet")
    chunk = 2000
    writer = None
    all_chunks = []
    for lo in range(0, n_urls, chunk):
        n = min(chunk, n_urls - lo)
        pdf = generate_pages(n_urls=n, seed=seed + lo, **kwargs)
        pdf["url"] = pdf["url"].str.replace("/page/", f"/page/{lo}_", regex=False)
        all_chunks.append(pdf[["url", "warc_ts"]])
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(pages_path, table.schema)
        writer.write_table(table, row_group_size=2000)
    if writer is not None:
        writer.close()
    sample = pd.concat(all_chunks, ignore_index=True)
    dim = generate_dim_snapshots(sample, seed=seed + 1)
    pq.write_table(pa.Table.from_pandas(dim, preserve_index=False), dim_path)
    return pages_path, dim_path
