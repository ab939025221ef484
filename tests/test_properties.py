"""Property-based tests (hypothesis): extractor totality, sessionize
idempotence/permutation-invariance, minhash bounds (SURVEY.md §5.2.3)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from med_doi_feature_extraction_spark.kernels.hashing import (
    char_shingles,
    minhash_signatures,
    simhash64,
)
from med_doi_feature_extraction_spark.kernels.html_text import extract_text

# constrained HTML-ish grammar: tags (balanced or not), entities,
# text with unicode, comments, scripts
_tag = st.sampled_from(
    ["p", "div", "b", "i", "span", "h1", "li", "script", "style", "title"]
)
_chunk = st.one_of(
    st.text(max_size=30),
    _tag.map(lambda t: f"<{t}>"),
    _tag.map(lambda t: f"</{t}>"),
    st.sampled_from(["&amp;", "&lt;", "&#65;", "<!-- c -->", "<br/>", "<b", "</"]),
)


@given(st.lists(_chunk, max_size=30).map("".join))
@settings(max_examples=200, deadline=None)
def test_extractor_total_and_deterministic(html: str):
    """Never throws on arbitrary tag soup; pure (same input → same
    output); output never contains the block sentinel."""
    a = extract_text(html)
    b = extract_text(html)
    assert a == b
    assert a is None or "\x00" not in a
    # bytes path agrees with str path for valid UTF-8
    assert extract_text(html.encode("utf-8")) == a


@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000_000)),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=50, deadline=None)
def test_sessionize_pandas_oracle_properties(rows):
    """Oracle-level checks of sessionization algebra: session ids are
    1..K contiguous per entity, non-decreasing in time, and a gap
    > threshold always starts a new session. (The Spark operator is
    pinned to this oracle in test_windows.py; hypothesis explores the
    timestamp space here without a JVM round-trip per example.)"""
    gap_s = 3600
    pdf = pd.DataFrame(rows, columns=["e", "off"])
    pdf["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(pdf.off, unit="s")
    pdf = pdf.sort_values(["e", "ts", "off"], kind="stable").reset_index(drop=True)
    prev = pdf.groupby("e")["ts"].shift(1)
    gap = (pdf.ts - prev).dt.total_seconds()
    new = gap.isna() | (gap > gap_s)
    sid = new.groupby(pdf.e).cumsum()
    for e, grp in pdf.assign(sid=sid, gap=gap).groupby("e"):
        ids = grp.sid.to_numpy()
        assert ids[0] == 1
        assert ((np.diff(ids) == 0) | (np.diff(ids) == 1)).all()
        breaks = grp.gap.to_numpy()[1:] > gap_s
        assert (np.diff(ids) == breaks.astype(int)).all()


@given(st.text(min_size=0, max_size=500))
@settings(max_examples=100, deadline=None)
def test_hash_kernels_total(text: str):
    """Hashing kernels accept arbitrary unicode and return well-typed
    values; signatures are deterministic."""
    s = pd.Series([text, text])
    sig = minhash_signatures(s, n_hashes=16)
    assert sig[0] == sig[1]
    assert len(sig[0]) == 16
    assert all(0 <= v < (1 << 31) for v in sig[0])
    sh = simhash64(s)
    assert sh[0] == sh[1]
    sh_int = int(sh[0])
    assert -(1 << 63) <= sh_int < (1 << 63)


@given(st.text(min_size=1, max_size=200), st.text(min_size=1, max_size=200))
@settings(max_examples=100, deadline=None)
def test_minhash_identity_and_symmetry(a: str, b: str):
    """Identical normalized texts → identical signatures; signature
    agreement is symmetric."""
    sa, sb = minhash_signatures(pd.Series([a, b]), n_hashes=32)
    if set(char_shingles(a)) == set(char_shingles(b)):
        assert sa == sb
    agree_ab = sum(x == y for x, y in zip(sa, sb))
    agree_ba = sum(x == y for x, y in zip(sb, sa))
    assert agree_ab == agree_ba


@given(st.lists(st.one_of(st.none(), st.text(max_size=120)), min_size=1, max_size=40))
@settings(max_examples=60, deadline=None)
def test_fingerprint64_batch_matches_scalar_oracle(texts):
    """Batch-vectorized fingerprint == per-doc python Horner oracle of
    the same dual-M31 polynomial (bases 131/137), incl. null handling
    and normalization equivalence."""
    from med_doi_feature_extraction_spark.kernels.hashing import fingerprint64

    M31 = (1 << 31) - 1

    def oracle(t):
        if t is None:
            return None
        norm = " ".join(str(t).split()).lower()
        if len(norm) < 1:
            norm = "_"
        raw = norm.encode("utf-8")
        h = []
        for base in (131, 137):
            acc = 0
            for byte in raw:
                acc = (acc * base + byte) % M31
            h.append(acc)
        return (h[0] << 32) | h[1]

    got = fingerprint64(pd.Series(texts, dtype=object))
    for t, g in zip(texts, got):
        exp = oracle(t)
        assert (g is None and exp is None) or int(g) == exp, repr(t)


@given(
    st.lists(
        st.one_of(
            # no lone surrogates (category Cs): not UTF-8 encodable,
            # render_template rejects them explicitly (tested below)
            st.text(
                alphabet=st.characters(
                    blacklist_characters="{}", blacklist_categories=("Cs",)
                ),
                max_size=12,
            ),
            st.sampled_from(["{{ a }}", "{b}", "{{c}}", "{{ run }}", "{{a}}{b}"]),
        ),
        max_size=8,
    ).map("".join)
)
@settings(max_examples=60, deadline=None)
def test_render_template_matches_format_oracle(spark, tpl):
    """Compiled-concat template == python str.format/jinja-style
    substitution with record precedence for row columns."""

    from med_doi_feature_extraction_spark.operators.template import (
        _PLACEHOLDER_RE,
    )

    row = {"a": "A1", "b": 7, "c": None}
    variables = {"run": "r9"}

    def oracle():
        def sub(m):
            name = m.group(1) or m.group(2)
            if name in variables:
                return str(variables[name])
            v = row.get(name, "")
            return "" if v is None else str(v)

        return _PLACEHOLDER_RE.sub(sub, tpl).strip(" \t\n\r\f\x0b")

    from med_doi_feature_extraction_spark.operators.template import render_template

    df = spark.createDataFrame(pd.DataFrame([row]))
    got = df.select(render_template(tpl, variables).alias("s")).collect()[0].s
    assert got == oracle(), repr(tpl)


def test_render_template_rejects_lone_surrogate(spark):
    """A lone surrogate cannot cross the py4j UTF-8 transport; the
    compiler must raise a clear ValueError, not an opaque Py4JError."""
    from med_doi_feature_extraction_spark.operators.template import (
        render_template,
    )

    with pytest.raises(ValueError, match="UTF-8"):
        render_template("\ud800")
