"""Deterministic HTML → text extraction kernel (stdlib-only).

This is the engine's replacement for the reference's per-record LLM
"extractor function" (reference ``src/engine.py:91-168``): a pure,
versioned, vectorized kernel. The SAME function body backs both the
Spark pandas UDF and the plain-pandas golden oracle, so extracted text
is byte-identical across the Arrow boundary by construction
(north-star invariant; see SURVEY.md §4.3.3 and §7.3).

Extraction rules (fixed — part of the kernel version contract):
- ``<script> <style> <noscript> <template>`` subtree text is dropped.
- HTML comments are dropped.
- Block-level tags start/end a line; inline tags do not break lines.
- Raw newlines in text data are whitespace (HTML semantics), NOT
  line breaks — only block-tag boundaries break lines.
- Character/entity references are decoded (``&amp;`` → ``&``).
- Within a line, runs of whitespace collapse to a single space.
- Empty lines are dropped; lines are joined with ``\\n``.
- Input ``bytes`` are decoded UTF-8 with ``errors='replace'``
  (fixed error policy so malformed bytes are deterministic).
- Malformed HTML never raises: best-effort with what parsed.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd

from med_doi_feature_extraction_spark.kernels.registry import register_kernel

KERNEL_VERSION = "1.0.0"

_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})
#: Sentinel for block boundaries — U+0000 cannot appear in parsed
#: character data, so it never collides with document text.
_BREAK = "\x00"
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody tr td th
    br hr article section header footer nav aside main title blockquote pre
    figure figcaption form fieldset address""".split()
)


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._chunks.append(_BREAK)

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _BLOCK_TAGS:
            self._chunks.append(_BREAK)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK_TAGS:
            self._chunks.append(_BREAK)

    def handle_data(self, data: str) -> None:
        if not self._skip_depth:
            self._chunks.append(data)


def extract_text(html: bytes | bytearray | str | None) -> str | None:
    """Scalar kernel: one HTML document → canonical extracted text."""
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Malformed input: keep whatever was extracted before the error.
        pass
    raw = "".join(parser._chunks)
    lines = (" ".join(segment.split()) for segment in raw.split(_BREAK))
    return "\n".join(line for line in lines if line)


@register_kernel("html_to_text", KERNEL_VERSION)
def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized kernel: Series[binary|str] → Series[str].

    Used verbatim as the body of the Spark pandas UDF AND as the pandas
    golden oracle (tests/test_html_text.py asserts sha256 equality).
    """
    return html.map(extract_text, na_action="ignore").astype(object)
