"""Multinomial Naive Bayes text classifier — model-based quality/
language filtering trained and applied entirely as Spark dataflow.

Web-scale curation pipelines gate documents with a lightweight linear
text classifier (CCNet/fastText-style: a quality model scores every
page, the low tail is dropped or down-sampled). The reference's
classify step is an LLM call per record (reference
``src/services/extraction_service.py`` + prompt kernels); this module
is the corpus-scale analogue a migrating user trains on their own
labels: multinomial NB with add-one smoothing over the same
whitespace-token space as ``operators/lm.py`` (shared tokenizer =
shared oracle SQL), trained with two hash aggregations and applied
with one bounded broadcast join — no per-row Python anywhere.

Scale shape. Training shuffles are keyed ``(label, token)`` then
``token`` (partial aggregation absorbs the Zipf head); the model is a
vocab-sized wide table (one row per token, one logp column per class)
that broadcasts to the scoring join the same way ``lm_quality_score``
broadcasts its LM. Scoring is occurrence-explode → per-(doc, token)
count → broadcast LEFT join → per-doc hash agg keyed by document id
(no skew by construction) → spine join so empty documents keep
prior-only scores instead of vanishing. Class constants (log prior,
OOV floor) are k bounded rows collected once and folded into the plan
as literals — never a join.

Float portability: per-doc sums are rounded to 6 dp like the LM
scores (sum magnitude ≲ 1e4 ⇒ double accumulation error ≲ 1e-8,
far inside the rounding slop), so DuckDB can retrain AND rescore the
whole model hash-exact.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.operators.lm import _occurrences


class ClassStat(NamedTuple):
    label: str
    prior_logp: float
    oov_logp: float


class NBModel(NamedTuple):
    """``vocab`` is the wide likelihood table (token, logp_<label>…);
    ``classes`` the bounded per-class constants, label-ascending (the
    deterministic argmax tie-break order)."""

    vocab: DataFrame
    classes: list[ClassStat]


def train_nb(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    min_count: int = 1,
) -> NBModel:
    """Fit multinomial NB with add-one smoothing.

    ``logp(token|c) = ln((n_tc + 1) / (T_c + V))`` where ``T_c`` is
    class c's token total and ``V`` the SHARED vocabulary size, so a
    token unseen in class c but present elsewhere scores exactly the
    class's OOV floor ``ln(1 / (T_c + V))`` — which is what the
    scoring join's ``coalesce`` substitutes, keeping in-vocab-but-
    unseen and out-of-vocab paths consistent by construction.
    ``min_count`` prunes the vocab AFTER totals are taken (pruning
    must not move the normalizer — same rule as ``train_unigram_lm``).
    Priors are document-count based: ``ln(docs_c / docs_total)``.

    Two corpus-sized aggregations, both partial-agg friendly; the
    pivot runs over the (label, token) counts with the class list
    fixed at plan time, so no extra collect job inside the pivot."""
    occ = _occurrences(labeled, text_col, label_col)
    counts = occ.groupBy(label_col, "token").agg(
        F.count(F.lit(1)).alias("n")
    )
    # bounded: one row per class (token totals + doc counts + V)
    cls_rows = (
        counts.groupBy(label_col)
        .agg(F.sum("n").alias("t_c"))
        .join(
            labeled.groupBy(label_col).agg(
                F.count(F.lit(1)).alias("docs_c")
            ),
            label_col,
        )
        .crossJoin(
            F.broadcast(
                counts.select("token").distinct().agg(
                    F.count(F.lit(1)).alias("v")
                )
            )
        )
        .collect()
    )
    import math

    docs_total = sum(r["docs_c"] for r in cls_rows)
    classes = sorted(
        ClassStat(
            label=str(r[label_col]),
            prior_logp=math.log(r["docs_c"] / docs_total),
            oov_logp=math.log(1.0 / (r["t_c"] + r["v"])),
        )
        for r in cls_rows
    )
    denom = {
        str(r[label_col]): float(r["t_c"] + r["v"]) for r in cls_rows
    }
    labels = [c.label for c in classes]
    likel = counts.select(
        "token",
        F.col(label_col).cast("string").alias("_lbl"),
        F.log(
            (F.col("n") + 1).cast("double")
            / F.element_at(
                F.create_map(
                    *[
                        x
                        for lbl in labels
                        for x in (F.lit(lbl), F.lit(denom[lbl]))
                    ]
                ),
                F.col(label_col).cast("string"),
            )
        ).alias("logp"),
    )
    vocab = (
        likel.groupBy("token")
        .pivot("_lbl", labels)
        .agg(F.first("logp"))
        .select(
            "token",
            *[F.col(lbl).alias(f"logp_{lbl}") for lbl in labels],
        )
    )
    if min_count > 1:
        keep = (
            counts.groupBy("token")
            .agg(F.sum("n").alias("_tot"))
            .filter(F.col("_tot") >= min_count)
            .select("token")
        )
        vocab = vocab.join(keep, "token", "left_semi")
    return NBModel(vocab=vocab, classes=classes)


def nb_score(
    docs: DataFrame,
    model: NBModel,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Score every document: per-class per-token-normalized joint
    log-likelihood ``(prior_c + Σ n·logp_c) / max(n_tokens, 1)``,
    argmax prediction (ties broken label-ascending), and the top-two
    margin (the filter threshold knob). The shared divisor preserves
    the argmax while making thresholds length-invariant AND keeping
    magnitudes small enough that the 6 dp rounding is orders of
    magnitude outside cross-engine float-accumulation noise (the
    unnormalized joint grows ∝ document length). Documents with no
    tokens keep their prior-only scores — a gate must see them, not
    lose them.

    Plan: occurrence explode → (doc, token) count agg → broadcast
    LEFT join against the vocab-wide table → one per-doc hash agg →
    spine LEFT join. The per-class OOV floors enter as plan literals
    via ``coalesce``, so the join stays single and narrow."""
    classes = model.classes
    toks = (
        _occurrences(docs, text_col, id_col)
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    joined = toks.join(F.broadcast(model.vocab), "token", "left")
    agg = joined.groupBy(id_col).agg(
        F.sum("n").cast("long").alias("n_tokens"),
        *[
            F.sum(
                F.col("n")
                * F.coalesce(F.col(f"logp_{c.label}"), F.lit(c.oov_logp))
            ).alias(f"_s_{c.label}")
            for c in classes
        ],
    )
    out = docs.select(id_col).join(agg, id_col, "left")
    norm = F.greatest(F.coalesce("n_tokens", F.lit(0)), F.lit(1)).cast(
        "double"
    )
    score_cols = []
    for c in classes:
        col = F.round(
            (
                F.lit(c.prior_logp)
                + F.coalesce(F.col(f"_s_{c.label}"), F.lit(0.0))
            )
            / norm,
            6,
        )
        score_cols.append(col.alias(f"score_{c.label}"))
    out = out.select(
        id_col,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        *score_cols,
    )
    # argmax with label-ascending tie-break: strictly-greater compare
    # against earlier labels, greater-or-equal against later ones
    pred = None
    for i, c in enumerate(classes):
        cond = None
        for j, o in enumerate(classes):
            if i == j:
                continue
            cmp = (
                F.col(f"score_{c.label}") > F.col(f"score_{o.label}")
                if j < i
                else F.col(f"score_{c.label}") >= F.col(f"score_{o.label}")
            )
            cond = cmp if cond is None else (cond & cmp)
        branch = F.when(cond, F.lit(c.label)) if cond is not None else F.lit(c.label)
        pred = branch if pred is None else pred.when(cond, F.lit(c.label))
    best = F.greatest(*[F.col(f"score_{c.label}") for c in classes]) \
        if len(classes) > 1 else F.col(f"score_{classes[0].label}")
    if len(classes) > 1:
        # second best = max over per-class scores masked at the argmax
        second = F.greatest(
            *[
                F.when(
                    F.col("predicted") != c.label, F.col(f"score_{c.label}")
                )
                for c in classes
            ]
        )
    else:
        second = best
    return (
        out.withColumn("predicted", pred)
        .withColumn("margin", F.round(best - second, 6))
    )
