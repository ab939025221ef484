"""Block-level main-content extraction (jusText-class heuristics).

Corpus-frequency boilerplate removal (`operators/paragraphs.py`)
needs a second pass over the whole corpus; this module is the
complementary PER-DOCUMENT extractor in the jusText family
(Pomikálek 2011, "Removing boilerplate and duplicate content from
web corpora"): segment the HTML into blocks at block-level tag
boundaries, score each block on link density / stopword density /
length, classify context-free, then let definite neighbors resolve
the ambiguous blocks. Navigation, footers and "related links" rails
are link-dense and stopword-poor; article prose is the opposite —
the same signal trafilatura/jusText/boilerpipe key on. The reference
parses each record's content in isolation
(``src/services/extraction_service.py``); at 10^12 pages the whole
extractor must be one scan.

Execution shape (the one that survives 100×):

- Segmentation + scoring is pure JVM Column algebra — ``split`` on a
  block-tag alternation, ONE ``posexplode``, then per-block regex /
  array algebra inside whole-stage codegen. No Python in the hot
  path; the wide ``html`` column is pruned before anything shuffles
  (the exploded rows carry only the block text + scalars).
- The context-sensitive pass is window algebra partitioned by
  ``(url)`` ordered by block position — the window partition is ONE
  document, never the corpus, so one document-keyed exchange total.
- ``main_content`` is one hash-agg per url (sorted-struct rebuild),
  the same shape as `operators/paragraphs.py`'s doc rebuild.

Classification contract (context-free pass; jusText defaults, the
copyright rule included):

- ``link_density > max_link_density``      → bad
- block contains ``©`` or ``&copy;``       → bad
- ``n_chars < length_low``                 → short (bad if any link)
- ``stop_density >= stopwords_high``       → good if
  ``n_chars > length_high`` else neargood
- ``stop_density >= stopwords_low``        → neargood
- otherwise                                → bad

Context-sensitive pass (documented SIMPLIFICATION of jusText §3.3 —
one window pass instead of its iterative neargood re-absorption;
edge blocks see an implicit ``bad`` boundary, as in jusText):

- ``short``    → good iff nearest definite neighbors on BOTH sides
  are good;
- ``neargood`` → good iff the nearest definite neighbor on EITHER
  side is good.

Portability: every regex is the Java∩RE2 subset (inline ``(?is)``,
lazy quantifiers, no lookaround/backreferences — links.py/pii.py
discipline); word splitting normalizes ``[^a-z0-9]+`` runs to a
single space in BOTH engines; densities are exact-integer ratios so
the IEEE division is bit-identical; the DuckDB oracle
(:func:`oracle_blocks_cte`) is generated from the SAME constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BLOCKTEXT_VERSION = "blocktext/v1"

#: block-boundary tags (opening OR closing form ends a block)
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h[1-6]|table|thead|tbody|tr|td|th|blockquote"
    "|section|article|header|footer|nav|aside|form|pre|body|html"
)
_SPLIT_RE = rf"(?i)</?(?:{_BLOCK_TAGS})(?:\s[^>]*)?/?>"

#: script/style bodies never contribute text — dropped before split
_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"

#: anchor text with no nested markup (links.py documented subset)
_ANCHOR_RE = r"(?i)<a[^>]*>([^<]*)</a>"

_TAG_RE = r"<[^>]*>"

#: jusText's English-stoplist idea, compact: function words that are
#: prose evidence. A plan literal in BOTH engines (shared constant).
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on",
    "at", "by", "for", "with", "from", "as", "is", "are", "was",
    "were", "be", "been", "it", "its", "this", "that", "these",
    "those", "he", "she", "they", "we", "you", "not", "have", "has",
    "had", "will", "would", "can", "could", "their", "there", "which",
)

#: jusText defaults (Pomikálek 2011 §3.2)
MAX_LINK_DENSITY = 0.2
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32


def _clean_text(raw: F.Column) -> F.Column:
    """Tag-stripped, minimally entity-unescaped, space-collapsed."""
    t = F.regexp_replace(raw, _TAG_RE, " ")
    for ent, lit in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#x27;", "'"), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(lit))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def _words(text: F.Column) -> F.Column:
    """Lower-cased alphanumeric word array ('' entries dropped)."""
    norm = F.regexp_replace(F.lower(text), "[^a-z0-9]+", " ")
    return F.filter(
        F.split(norm, " "), lambda w: F.length(w) > 0
    )


def split_blocks(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    key_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """One row per non-empty text block: ``(*key_cols, pos, text,
    n_chars, n_words, link_chars, link_density, stop_density)``.

    ``key_cols`` is the DOCUMENT identity (default ``(url_col,)``) —
    pass ``("url", "warc_ts")`` on a snapshot table so each crawl of
    a url is its own document; everything downstream (the neighbor
    window, the rebuild agg) keys on it. ``pos`` numbers the
    SURVIVING blocks 0..k per document (gaps from empty segments are
    closed, so neighbor windows see real neighbors). Link chars are
    measured on the raw segment before tag stripping; densities are
    exact-integer IEEE ratios.
    """
    keys = list(key_cols) if key_cols else [url_col]
    html = F.coalesce(F.col(html_col).cast("string"), F.lit(""))
    body = F.regexp_replace(
        F.regexp_replace(html, _SCRIPT_RE, " "), _STYLE_RE, " "
    )
    seg = F.posexplode(F.split(body, _SPLIT_RE))
    x = df.select(*[F.col(k) for k in keys], seg.alias("_p", "_raw"))
    text = _clean_text(F.col("_raw"))
    anchors = F.regexp_extract_all(F.col("_raw"), F.lit(_ANCHOR_RE), 1)
    link_chars = F.length(F.concat_ws("", anchors))
    words = _words(text)
    stop_lit = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(
        F.filter(words, lambda w: F.array_contains(stop_lit, w))
    )
    n_words = F.size(words)
    n_chars = F.length(text)
    b = x.select(
        *keys,
        "_p",
        text.alias("text"),
        n_chars.cast("int").alias("n_chars"),
        n_words.cast("int").alias("n_words"),
        link_chars.cast("int").alias("link_chars"),
        (link_chars.cast("double") / n_chars).alias("link_density"),
        F.when(n_words > 0, n_stop.cast("double") / n_words)
        .otherwise(F.lit(0.0))
        .alias("stop_density"),
        F.col("_raw").contains("©").alias("_c1"),
        F.col("_raw").contains("&copy;").alias("_c2"),
    ).where(F.col("n_chars") > 0)
    pos = F.row_number().over(
        Window.partitionBy(*keys).orderBy("_p")
    ) - F.lit(1)
    return b.select(
        *keys,
        pos.cast("int").alias("pos"),
        "text",
        "n_chars",
        "n_words",
        "link_chars",
        "link_density",
        "stop_density",
        (F.col("_c1") | F.col("_c2")).alias("has_copyright"),
    )


def classify_blocks(
    blocks: DataFrame,
    max_link_density: float = MAX_LINK_DENSITY,
    length_low: int = LENGTH_LOW,
    length_high: int = LENGTH_HIGH,
    stopwords_low: float = STOPWORDS_LOW,
    stopwords_high: float = STOPWORDS_HIGH,
) -> DataFrame:
    """Append ``cls`` (context-free: good/neargood/short/bad) and
    ``final_cls`` (good/bad after the neighbor-resolution window) per
    the module contract. One document-keyed window exchange. The
    document key = every column left of ``pos`` in the
    :func:`split_blocks` output (schema-positional, so composite
    ``key_cols`` flow through untouched)."""
    keys = blocks.columns[: blocks.columns.index("pos")]
    ld = F.col("link_density")
    sd = F.col("stop_density")
    nc = F.col("n_chars")
    cls = (
        F.when(ld > max_link_density, "bad")
        .when(F.col("has_copyright"), "bad")
        .when(
            nc < length_low,
            F.when(F.col("link_chars") > 0, "bad").otherwise("short"),
        )
        .when(
            sd >= stopwords_high,
            F.when(nc > length_high, "good").otherwise("neargood"),
        )
        .when(sd >= stopwords_low, "neargood")
        .otherwise("bad")
    )
    c = blocks.withColumn("cls", cls)
    w = Window.partitionBy(*keys).orderBy("pos")
    defc = F.when(F.col("cls").isin("good", "bad"), F.col("cls"))
    prev_def = F.coalesce(
        F.last(defc, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit("bad"),
    )
    next_def = F.coalesce(
        F.first(defc, ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)
        ),
        F.lit("bad"),
    )
    final = (
        F.when(F.col("cls") == "good", "good")
        .when(F.col("cls") == "bad", "bad")
        .when(
            F.col("cls") == "short",
            F.when(
                (prev_def == "good") & (next_def == "good"), "good"
            ).otherwise("bad"),
        )
        .otherwise(  # neargood
            F.when(
                (prev_def == "good") | (next_def == "good"), "good"
            ).otherwise("bad")
        )
    )
    return c.withColumn("final_cls", final)


def main_content(
    classified: DataFrame,
) -> DataFrame:
    """Per-document rebuild: ``content`` = good blocks joined with
    ``\\n`` in position order, plus block/char retention stats. One
    hash-agg on the document key (every column left of ``pos``)."""
    keys = classified.columns[: classified.columns.index("pos")]
    good = F.col("final_cls") == "good"
    g = classified.groupBy(*keys).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(good, F.struct("pos", "text"))
                    )
                ),
                lambda s: s.text,
            ),
            "\n",
        ).alias("content"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(good.cast("long")).alias("n_good"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.coalesce(
            F.sum(F.when(good, F.col("n_chars"))), F.lit(0)
        ).cast("long").alias("kept_chars"),
    )
    return g.withColumn(
        "kept_ratio",
        F.round(
            F.col("kept_chars").cast("double") / F.col("total_chars"), 6
        ),
    )


# ------------------------------------------------------------- fixture


def generate_block_pages(n: int = 160, seed: int = 431):
    """Deterministic page fixture exercising every classification
    branch: link-dense nav rails, long stopword-rich prose, short
    interstitials between good prose (resolved good) and between
    boilerplate (resolved bad), neargood teasers adjacent to good vs
    bad, copyright footers, link-free low-stopword keyword stuffing.

    Returns pandas DataFrame (url, html).
    """
    import pandas as pd

    prose = (
        "This is the part of the page that a reader actually came "
        "for, and it is written in plain prose with the usual "
        "function words that signal running text to the classifier. "
    )
    stuffing = (
        "cheap widgets best widgets discount widgets buy widgets "
        "widget sale widget deals widget shop widget store "
    )
    rows = []
    for i in range(n):
        url = f"https://blocks{i % 7}.example.com/page-{i}"
        nav = (
            '<div><a href="/">Home</a> <a href="/shop">Shop</a> '
            '<a href="/about">About</a> <a href="/contact">Contact</a></div>'
        )
        good = f"<p>{prose * (2 + i % 3)}Article {i}.</p>"
        short_between_good = "<p>He said it was so.</p>"
        teaser = (
            "<p>More of the story is told in the next part of the "
            f"series about topic {i}.</p>"
        )
        footer = f"<div>© 2026 blocks{i % 7}.example.com — " \
                 '<a href="/terms">Terms</a></div>'
        bad_stuff = f"<div>{stuffing * (1 + i % 2)}</div>"
        parts = [nav]
        kind = i % 5
        if kind == 0:  # good, short, good → short resolves good
            parts += [good, short_between_good, good]
        elif kind == 1:  # bad, short, bad → short resolves bad
            parts += [bad_stuff, short_between_good, bad_stuff]
        elif kind == 2:  # neargood next to good → good
            parts += [good, teaser, bad_stuff]
        elif kind == 3:  # neargood between bads → bad
            parts += [bad_stuff, teaser, bad_stuff]
        else:  # list page: items are short+linked → bad
            items = "".join(
                f'<li><a href="/item-{j}">Item {j} in list {i}</a></li>'
                for j in range(4)
            )
            parts += [f"<ul>{items}</ul>", good]
        parts.append(footer)
        html = "<html><body>" + "".join(parts) + "</body></html>"
        rows.append((url, html))
    return pd.DataFrame(rows, columns=["url", "html"])


# ---------------------------------------------------------------- oracle


def _sql_re(pat: str) -> str:
    # DuckDB single-quoted literals keep backslashes as-is — only
    # quote doubling is needed (robots.py discipline).
    return pat.replace("'", "''")


def oracle_blocks_cte(parquet_glob: str) -> str:
    """DuckDB CTE chain ending in ``cblk`` (url, pos, text, n_chars,
    n_words, link_chars, link_density, stop_density, has_copyright,
    cls, final_cls) — generated from the SAME constants and regexes
    as the Spark path (append after ``WITH``)."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    unescaped = f"regexp_replace(seg, '{_sql_re(_TAG_RE)}', ' ', 'g')"
    for e, lit in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#x27;", "''"), ("&#39;", "''"), ("&amp;", "&"),
    ):
        unescaped = f"replace({unescaped}, '{e}', '{lit}')"
    clean = f"trim(regexp_replace({unescaped}, '\\s+', ' ', 'g'))"
    words = (
        "list_filter(string_split(regexp_replace(lower(text), "
        "'[^a-z0-9]+', ' ', 'g'), ' '), w -> length(w) > 0)"
    )
    return f"""
pages AS (
  SELECT url,
         regexp_replace(regexp_replace(
           coalesce(CAST(html AS VARCHAR), ''),
           '{_sql_re(_SCRIPT_RE)}', ' ', 'g'),
           '{_sql_re(_STYLE_RE)}', ' ', 'g') AS body
  FROM read_parquet('{parquet_glob}')
),
segs AS (
  SELECT url, string_split_regex(body, '{_sql_re(_SPLIT_RE)}') AS p
  FROM pages
),
rawb AS (
  SELECT url, CAST(i - 1 AS INT) AS rawpos, p[i] AS seg
  FROM segs, unnest(range(1, len(p) + 1)) AS u(i)
),
feat AS (
  SELECT url, rawpos, text,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len({words}) AS INT) AS n_words,
         CAST(coalesce(length(array_to_string(
           regexp_extract_all(seg, '{_sql_re(_ANCHOR_RE)}', 1), '')),
           0) AS INT) AS link_chars,
         CAST(len(list_filter({words},
           w -> list_contains([{stop_list}], w))) AS INT) AS n_stop,
         (seg LIKE '%©%' OR seg LIKE '%&copy;%') AS has_copyright
  FROM (SELECT url, rawpos, seg, {clean} AS text FROM rawb) t
),
blk AS (
  SELECT url,
         CAST(row_number() OVER (PARTITION BY url ORDER BY rawpos) - 1
              AS INT) AS pos,
         text, n_chars, n_words, link_chars,
         CAST(link_chars AS DOUBLE) / n_chars AS link_density,
         CASE WHEN n_words > 0
              THEN CAST(n_stop AS DOUBLE) / n_words
              ELSE CAST(0 AS DOUBLE) END AS stop_density,
         has_copyright
  FROM feat WHERE n_chars > 0
),
cf AS (
  SELECT *,
         CASE
           WHEN link_density > {MAX_LINK_DENSITY} THEN 'bad'
           WHEN has_copyright THEN 'bad'
           WHEN n_chars < {LENGTH_LOW} THEN
             CASE WHEN link_chars > 0 THEN 'bad' ELSE 'short' END
           WHEN stop_density >= {STOPWORDS_HIGH} THEN
             CASE WHEN n_chars > {LENGTH_HIGH}
                  THEN 'good' ELSE 'neargood' END
           WHEN stop_density >= {STOPWORDS_LOW} THEN 'neargood'
           ELSE 'bad'
         END AS cls
  FROM blk
),
nbr AS (
  SELECT *,
         coalesce(last_value(CASE WHEN cls IN ('good', 'bad')
                                  THEN cls END IGNORE NULLS)
           OVER (PARTITION BY url ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           'bad') AS prev_def,
         coalesce(first_value(CASE WHEN cls IN ('good', 'bad')
                                   THEN cls END IGNORE NULLS)
           OVER (PARTITION BY url ORDER BY pos
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
           'bad') AS next_def
  FROM cf
),
cblk AS (
  SELECT url, pos, text, n_chars, n_words, link_chars, link_density,
         stop_density, has_copyright, cls,
         CASE
           WHEN cls = 'good' THEN 'good'
           WHEN cls = 'bad' THEN 'bad'
           WHEN cls = 'short' THEN
             CASE WHEN prev_def = 'good' AND next_def = 'good'
                  THEN 'good' ELSE 'bad' END
           ELSE
             CASE WHEN prev_def = 'good' OR next_def = 'good'
                  THEN 'good' ELSE 'bad' END
         END AS final_cls
  FROM nbr
)"""
