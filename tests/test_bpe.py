"""Mini-BPE tokenizer: trainer/applier goldens, determinism, count
semantics, UDF parity (VERDICT r3 task 7)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.kernels.bpe import (
    apply_bpe,
    default_merges,
    merge_ranks,
    token_count_bpe_udf,
    token_count_series,
    train_bpe,
)


def test_trainer_golden_tiny_corpus():
    """Hand-computed: corpus 'aa aa aa' has one word ('a', 'a</w>')
    ×3 → single merge, then no repeating pair remains."""
    m = train_bpe(["aa aa aa"], n_merges=10)
    assert m == [("a", "a</w>")]
    r = merge_ranks(m)
    assert apply_bpe("aa", r) == ("aa</w>",)
    # 'aaa' → a + a + a</w>; only the ranked pair (a, a</w>) merges
    assert apply_bpe("aaa", r) == ("a", "aa</w>")


def test_trainer_tie_break_and_order():
    """'ab ab cd cd' — pairs (a,b</w>) and (c,d</w>) both freq 2;
    lexicographic tie-break merges (a,b</w>) first."""
    m = train_bpe(["ab ab cd cd"], n_merges=10)
    assert m == [("a", "b</w>"), ("c", "d</w>")]


def test_count_semantics():
    """Alphabetic pre-tokens get BPE'd, numbers/symbols count 1 each,
    NULL/empty count 0."""
    m = train_bpe(["aa aa aa"], n_merges=10)
    got = list(
        token_count_series(pd.Series(["aa aaa 42 !", None, "", "AA"]), m)
    )
    # aa→1, aaa→2, 42→1, !→1 = 5; case-folded AA→1
    assert got == [5, 0, 0, 1]


def test_default_merges_deterministic_and_compressive():
    a = default_merges()
    b = default_merges()
    assert a == b and len(a) == 200
    # pinned head of the table (seeded fixture corpus, seed 7):
    assert a[:3] == (("r", "e</w>"), ("d", "e"), ("h", "a"))
    # common fixture words compress below their character count
    r = merge_ranks(list(a))
    for w in ["the", "information", "der", "les"]:
        assert 1 <= len(apply_bpe(w, r)) < len(w)
    # a trained common word is fewer tokens than an unseen rare one
    assert len(apply_bpe("the", r)) < len(apply_bpe("xylophonze", r))


def test_udf_matches_driver_counts(spark):
    m = default_merges()
    pdf = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the information about years",
                "der die das und",
                "les informations déjà",
                "12 + 34 = 46",
                "",
                "mixed Text WITH case",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.withColumn("n", token_count_bpe_udf(m)(F.col("text")))
        .orderBy("doc_id")
        .toPandas()
    )
    exp = token_count_series(pdf.text, list(m))
    assert list(got.n) == list(exp)


# --- token-ID emission ------------------------------------------------

def test_vocab_layout_deterministic():
    from med_doi_feature_extraction_spark.kernels.bpe import (
        PAD_ID,
        UNK_ID,
        default_merges,
        vocab_from_merges,
    )

    m = default_merges(60)
    v1, v2 = vocab_from_merges(m), vocab_from_merges(m)
    assert v1 == v2
    assert v1["<unk>"] == UNK_ID == 0 and v1["<pad>"] == PAD_ID == 1
    # base alphabet before merges; merge outputs in merge order
    fused = [a + b for a, b in m]
    ranks = [v1[f] for f in fused if f in v1]
    assert ranks == sorted(ranks)


def test_tokenize_ids_goldens():
    import pandas as pd

    from med_doi_feature_extraction_spark.kernels.bpe import (
        UNK_ID,
        decode_ids,
        default_merges,
        tokenize_ids_series,
        token_count_series,
        vocab_from_merges,
    )

    m = default_merges(60)
    v = vocab_from_merges(m)
    texts = pd.Series(["hello world", "Hello, WORLD!", "x 42 y", None, ""])
    ids = tokenize_ids_series(texts, m, v)
    a = list(ids[0])
    b = list(ids[1])
    # 'hello world' ids appear inside 'Hello, WORLD!' with punct ids added
    assert set(a) <= set(b)
    assert ids[3] == [] and ids[4] == []
    # digit splitting: '42' emits exactly two ids, both in-vocab
    x42 = ids[2]
    assert len(x42) == 4  # x</w>, '4', '2', y</w>
    assert UNK_ID not in x42
    # decode round-trips token-level content (lower-cased)
    assert decode_ids(ids[0], v) == "hello world"
    # counts treat a number as ONE token, ids split digits: count+1
    assert len(x42) == int(token_count_series(
        pd.Series(["x 42 y"]), m)[0]) + 1


def test_unknown_chars_map_to_unk():
    import pandas as pd

    from med_doi_feature_extraction_spark.kernels.bpe import (
        UNK_ID,
        default_merges,
        tokenize_ids_series,
    )

    m = default_merges(60)
    ids = tokenize_ids_series(pd.Series(["héllo №"]), m)
    assert UNK_ID in ids[0]


def test_tokenize_udf_matches_series(spark):
    import pandas as pd

    from med_doi_feature_extraction_spark.kernels.bpe import (
        default_merges,
        tokenize_ids_series,
        tokenize_ids_udf,
    )

    m = default_merges(60)
    texts = ["the quick brown fox", "jumps over 12 lazy dogs!", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    got = {
        r["i"]: list(r["ids"])
        for r in df.select("i", tokenize_ids_udf(m)("text").alias("ids")).collect()
    }
    want = tokenize_ids_series(pd.Series(texts), m)
    for i in range(len(texts)):
        assert got[i] == list(want[i])
