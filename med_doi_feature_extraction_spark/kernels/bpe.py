"""Mini byte-pair-encoding tokenizer: deterministic merge-table
training + vectorized token counting.

``features.token_count_bpe`` counts regex pre-tokens — a fine proxy,
but sampling budgets and per-doc cost models in real pipelines key
off ACTUAL subword counts, where a rare word is several tokens and a
common word is one (VERDICT r3 task 7). This module implements the
classic BPE procedure (Sennrich et al. 2016, the public algorithm):

- ``train_bpe``: word-frequency table → repeatedly merge the most
  frequent adjacent symbol pair. Fully deterministic: ties break by
  lexicographic pair order, words start as chars with the final char
  carrying an end-of-word marker.
- ``apply_bpe``: greedy lowest-rank merge application per word, with
  an LRU word cache (Zipf: the cache hit rate on real text is ~95%+).
- ``token_count_series``: pandas-side counting over the regex
  pre-token stream (alphabetic pre-tokens get BPE'd; numbers and
  symbols count as single tokens) — shared by the Arrow-batched UDF
  and the pytest goldens.

The default merge table trains from the seeded in-repo corpus
generator (``lang_trigram.generate_lang_corpus`` — no external
data), cached per process. On a cluster you'd train once from a
corpus sample (driver-side, the table is KBs) and ship the table in
the UDF closure exactly as here.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

import pandas as pd

BPE_VERSION = "1.0.0"

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)
#: the same pre-token split as features.TOKEN_REGEX (words / numbers
#: / single symbols) — counting must agree with the regex surface on
#: what a pre-token is, BPE only refines the word entries
_PRETOKEN_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+|[^\sA-Za-z\d]")
_EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    """chars with the end-of-word marker fused onto the last char —
    so 'low' → ('l', 'o', 'w</w>') and merges can distinguish
    word-final from word-internal contexts."""
    return tuple(word[:-1]) + (word[-1] + _EOW,)


def train_bpe(texts, n_merges: int = 200) -> list[tuple[str, str]]:
    """Train a merge table: ``n_merges`` (pair → fused symbol) steps,
    most-frequent-first, ties by lexicographic pair order. Stops
    early when no adjacent pair repeats."""
    words: Counter = Counter()
    for t in texts:
        for w in _WORD_RE.findall(str(t).lower()):
            words[_word_symbols(w)] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, freq in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        best, best_n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )[0], max(pairs.values())
        if best_n < 2:
            break
        merges.append(best)
        fused = best[0] + best[1]
        new_words: Counter = Counter()
        for sym, freq in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] += freq
        words = new_words
    return merges


def apply_bpe(
    word: str, ranks: dict[tuple[str, str], int]
) -> tuple[str, ...]:
    """Greedy lowest-rank merging of one lowercased word."""
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


def merge_ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {pair: i for i, pair in enumerate(merges)}


def token_count_series(
    texts: pd.Series, merges: list[tuple[str, str]]
) -> pd.Series:
    """BPE token count per text: Σ len(bpe(word)) over alphabetic
    pre-tokens + 1 per numeric/symbol pre-token. NULL → 0."""
    ranks = merge_ranks(merges)
    cache: dict[str, int] = {}

    def count_one(text) -> int:
        if text is None:
            return 0
        total = 0
        for pre in _PRETOKEN_RE.findall(str(text)):
            if pre[0].isalpha():
                w = pre.lower()
                n = cache.get(w)
                if n is None:
                    n = len(apply_bpe(w, ranks))
                    cache[w] = n
                total += n
            else:
                total += 1
        return total

    return texts.map(count_one).astype("int64")


@lru_cache(maxsize=4)
def default_merges(n_merges: int = 200, seed: int = 7) -> tuple:
    """Merge table trained from the seeded in-repo fixture corpus —
    deterministic per (n_merges, seed), cached per process."""
    from med_doi_feature_extraction_spark.kernels.lang_trigram import (
        generate_lang_corpus,
    )

    corpus = generate_lang_corpus(800, seed)
    return tuple(train_bpe(corpus.text, n_merges=n_merges))


def token_count_bpe_udf(merges: list[tuple[str, str]] | tuple):
    """Arrow-batched pandas UDF counting BPE tokens with the given
    merge table (closure-captured)."""
    from pyspark.sql.functions import pandas_udf

    m = list(merges)

    @pandas_udf("long")
    def _udf(texts: pd.Series) -> pd.Series:
        return token_count_series(texts, m)

    return _udf


# --- token-ID emission (the export surface) ---------------------------

UNK_ID = 0
PAD_ID = 1

#: standalone (no-merge) base symbols: lowercase letters in both
#: word-internal and word-final forms, digits (numbers tokenize
#: per-digit — the GPT-style convention that keeps the vocab closed),
#: and ASCII punctuation. Anything outside this closed set maps to
#: UNK_ID rather than growing the vocab — id stability across corpus
#: snapshots matters more than coverage for a fixture tokenizer.
import string as _string

_BASE_SYMBOLS = (
    [c for c in _string.ascii_lowercase]
    + [c + _EOW for c in _string.ascii_lowercase]
    + list(_string.digits)
    + list(_string.punctuation)
)


def vocab_from_merges(merges) -> dict[str, int]:
    """Deterministic symbol→id table: ``<unk>``/``<pad>`` specials,
    the fixed base alphabet, then each merge's fused output in merge
    order (BPE ids are merge-order ids — the standard layout, so the
    SAME merge table always yields the SAME ids)."""
    vocab = {"<unk>": UNK_ID, "<pad>": PAD_ID}
    nxt = 2
    for s in _BASE_SYMBOLS:
        vocab[s] = nxt
        nxt += 1
    for a, b in merges:
        fused = a + b
        if fused not in vocab:
            vocab[fused] = nxt
            nxt += 1
    return vocab


def tokenize_ids_series(
    texts: pd.Series, merges, vocab: dict[str, int] | None = None
) -> pd.Series:
    """Token-id list per text (int32): alphabetic pre-tokens are
    lower-cased and BPE-merged to symbol ids, numeric pre-tokens
    emit one id per digit, symbol pre-tokens one id per char;
    out-of-vocab symbols → UNK_ID. NULL → empty list. Shares the
    pre-token regex with ``token_count_series`` so
    ``len(tokenize_ids(t)) == token_count(t)`` for digit/symbol-free
    text (counts treat a multi-digit number as ONE token, ids split
    it — counting stays the budget surface, ids the export surface)."""
    ranks = merge_ranks(list(merges))
    v = vocab_from_merges(merges) if vocab is None else vocab
    unk = v["<unk>"]
    cache: dict[str, list[int]] = {}

    def ids_one(text) -> list[int]:
        if text is None:
            return []
        out: list[int] = []
        for pre in _PRETOKEN_RE.findall(str(text)):
            if pre[0].isalpha():
                w = pre.lower()
                ids = cache.get(w)
                if ids is None:
                    ids = [v.get(s, unk) for s in apply_bpe(w, ranks)]
                    cache[w] = ids
                out.extend(ids)
            else:
                out.extend(v.get(c, unk) for c in pre)
        return out

    return texts.map(ids_one)


def decode_ids(ids, vocab: dict[str, int]) -> str:
    """Inverse mapping for round-trip tests: ids → symbols, ``</w>``
    becomes a word boundary. Case and original whitespace are not
    recoverable (the tokenizer lower-cases and the pre-token stream
    drops whitespace) — decode targets token-level fidelity."""
    rev = {i: s for s, i in vocab.items()}
    parts: list[str] = []
    for i in ids:
        s = rev.get(int(i), "<unk>")
        if s.endswith(_EOW):
            parts.append(s[: -len(_EOW)] + " ")
        else:
            parts.append(s)
    return "".join(parts).rstrip()


def tokenize_ids_udf(merges: list[tuple[str, str]] | tuple):
    """Arrow-batched pandas UDF emitting the token-id array (the
    training-data export path: curate → tokenize_ids → seq_pack)."""
    from pyspark.sql.functions import pandas_udf

    m = list(merges)
    v = vocab_from_merges(m)

    @pandas_udf("array<int>")
    def _udf(texts: pd.Series) -> pd.Series:
        return tokenize_ids_series(texts, m, v)

    return _udf
