"""Character-trigram language identification (profile-based).

Upgrade of the marker-word heuristic in ``features.lang_id``
(VERDICT r3 task 6): marker words are precision-brittle on short or
mixed text — a document with none of the 8 markers is 'und', and one
stray marker flips the label. The standard fix (Cavnar & Trenkle
n-gram profiles) classifies by similarity of the document's character
trigram distribution to per-language profiles, which every word of
the document contributes to.

No external data: profiles are TRAINED from the seeded in-repo
corpus generator below (deterministic per seed), and the pytest gate
holds accuracy on a held-out seed at ≥ the marker baseline. On a real
deployment you'd train the same way from any labelled sample of your
corpus — the trainer is the deliverable, the fixture vocabulary is
just the sandbox stand-in.

Scale shape: training is driver-side over a small labelled sample
(profiles are KBs); classification is an Arrow-batched pandas UDF —
per-doc trigram counting is genuinely not expressible as Column
algebra, so this sits in the §2.10 UDF tier next to the html kernel.
The profile dict rides the UDF closure (broadcast once per
executor), classification is O(doc length) per doc with no shuffle.
"""

from __future__ import annotations

import re
from collections import Counter
from math import sqrt

import numpy as np
import pandas as pd

LANG_TRIGRAM_VERSION = "1.0.0"

#: Seeded-generator vocabulary: common function words per language
#: (public-knowledge word lists) plus a few characteristic
#: diacritic-bearing content words. The first 8 of each are exactly
#: ``features.LANG_MARKERS`` so the marker baseline gets a fair shot
#: on generated text.
LANG_VOCAB: dict[str, list[str]] = {
    "en": [
        "the", "and", "of", "to", "is", "in", "that", "with",
        "you", "it", "he", "was", "for", "on", "are", "as", "his",
        "they", "at", "be", "this", "have", "from", "or", "one",
        "had", "by", "word", "but", "not", "what", "all", "were",
        "we", "when", "your", "can", "said", "there", "through",
    ],
    "de": [
        "der", "die", "das", "und", "ist", "nicht", "mit", "ein",
        "ich", "sie", "sich", "des", "auf", "für", "im", "dem",
        "den", "eine", "als", "auch", "es", "an", "werden", "aus",
        "er", "hat", "dass", "nach", "wird", "bei", "einer", "um",
        "am", "sind", "noch", "wie", "einem", "über", "müssen",
        "größe",
    ],
    "fr": [
        "le", "la", "les", "et", "est", "dans", "pour", "une",
        "des", "du", "il", "elle", "que", "qui", "ne", "pas",
        "sur", "se", "plus", "pouvoir", "par", "je", "avec",
        "tout", "faire", "son", "mettre", "autre", "on", "mais",
        "nous", "comme", "ou", "si", "leur", "dire", "été",
        "déjà", "français", "très",
    ],
    "es": [
        "el", "los", "las", "es", "en", "que", "por", "una",
        "de", "se", "no", "con", "para", "su", "al", "lo",
        "como", "más", "pero", "sus", "le", "ya", "este",
        "porque", "esta", "entre", "cuando", "muy", "sin",
        "sobre", "también", "hasta", "hay", "donde", "quien",
        "desde", "información", "años", "español", "señor",
    ],
}


def generate_lang_corpus(
    n_docs: int, seed: int, langs: list[str] | None = None
) -> pd.DataFrame:
    """Deterministic labelled corpus: (doc_id, lang, text), each text
    4-10 words sampled from the language's vocabulary. Different
    seeds give disjoint samples — train on one, hold out another."""
    langs = langs or sorted(LANG_VOCAB)
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        lang = langs[i % len(langs)]
        vocab = LANG_VOCAB[lang]
        n_words = int(rng.integers(4, 11))
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), n_words)]
        rows.append((i, lang, " ".join(words)))
    return pd.DataFrame(rows, columns=["doc_id", "lang", "text"])


_WS = re.compile(r"\s+")


def trigram_counts(text: str) -> Counter:
    """Char trigram counts over the normalized text: lowercase,
    whitespace collapsed to single spaces, one leading/trailing pad
    space so word boundaries contribute boundary trigrams."""
    t = " " + _WS.sub(" ", text.strip().lower()) + " "
    if len(t) < 3:
        return Counter()
    return Counter(t[i : i + 3] for i in range(len(t) - 2))


def train_trigram_profiles(
    corpus: pd.DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    top_k: int = 300,
) -> dict[str, dict[str, float]]:
    """Per-language L2-normalized top-``top_k`` trigram weight maps.
    Deterministic: ties in the top-k cut break by trigram sort order."""
    profiles: dict[str, dict[str, float]] = {}
    for lang, grp in corpus.groupby(lang_col):
        counts: Counter = Counter()
        for text in grp[text_col]:
            counts.update(trigram_counts(str(text)))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        norm = sqrt(sum(c * c for _, c in top))
        profiles[str(lang)] = {g: c / norm for g, c in top} if norm else {}
    return profiles


def classify_series(
    texts: pd.Series, profiles: dict[str, dict[str, float]]
) -> pd.Series:
    """Cosine of each text's trigram counts against every profile;
    argmax label, ties → language sort order, no trigrams or all-zero
    scores → 'und'. Shared by the pandas UDF and the pytest gate so
    the two can't drift."""
    langs = sorted(profiles)
    out = []
    for text in texts:
        counts = trigram_counts("" if text is None else str(text))
        if not counts:
            out.append("und")
            continue
        tnorm = sqrt(sum(c * c for c in counts.values()))
        best_lang, best_score = "und", 0.0
        for lang in langs:
            prof = profiles[lang]
            dot = sum(w * counts[g] for g, w in prof.items() if g in counts)
            score = dot / tnorm
            if score > best_score:
                best_lang, best_score = lang, score
        out.append(best_lang)
    return pd.Series(out, index=texts.index, dtype="object")


def lang_id_trigram_udf(profiles: dict[str, dict[str, float]]):
    """Arrow-batched pandas UDF classifying a text column with the
    given profiles (closure-captured — shipped once per executor)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(texts: pd.Series) -> pd.Series:
        return classify_series(texts, profiles)

    return _udf
