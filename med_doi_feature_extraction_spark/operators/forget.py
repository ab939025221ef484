"""Deletion propagation (right-to-be-forgotten) through materialized
training artifacts.

Removing a document from the source corpus is an anti-join
(``operators/upsert.skip_done`` shape); the hard part at training
scale is everything DOWNSTREAM that already embeds the document's
tokens — the packed GPT-style training rows built by
``operators/packing.pack_sequences``. Rebuilding every pack for one
takedown request re-shuffles the whole corpus; this module instead
uses the spans table (the provenance the packer emits precisely for
this) to touch only affected packs:

- ``removal_audit`` — per-pack blast radius: how many spans/tokens in
  each pack belong to removed documents. The report a compliance run
  files, and the work estimate for the scrub.
- ``scrub_packs`` — rewrite ONLY affected packs, overwriting removed
  documents' token slices with ``pad_id`` in place (sequence length
  and all other documents' positions are preserved, so downstream
  span/mask tables stay valid); unaffected packs pass through
  untouched.

Scale shape: the removal list is request-sized (bounded — takedown
batches, not corpora), so it broadcasts; spans⋈removal is a
broadcast join keyed by document, the per-pack range list is a
bounded ``collect_list`` (≤ spans-per-pack ≤ budget), and the scrub
itself is JVM Column algebra (``transform`` with index + ``exists``
over ranges) — no Python, no corpus shuffle, and packs without
removed content don't even rewrite their arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def removal_audit(
    spans: DataFrame,
    removal: DataFrame,
    key_col: str = "key",
) -> DataFrame:
    """Per-pack deletion blast radius:
    ``(pack_id, spans_total, spans_removed, tokens_removed,
    affected)``. ``removal`` needs one column named ``key_col``."""
    rm = (
        removal.select(F.col(key_col)).distinct().withColumn("_r", F.lit(1))
    )
    j = spans.join(F.broadcast(rm), key_col, "left")
    return j.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("spans_total"),
        F.sum(F.coalesce("_r", F.lit(0))).cast("long").alias("spans_removed"),
        F.sum(F.when(F.col("_r").isNotNull(), F.col("len")).otherwise(0))
        .cast("long")
        .alias("tokens_removed"),
        (F.sum(F.coalesce("_r", F.lit(0))) > 0).alias("affected"),
    )


def scrub_packs(
    packs: DataFrame,
    spans: DataFrame,
    removal: DataFrame,
    key_col: str = "key",
    pad_id: int = 0,
    ids_col: str = "input_ids",
) -> DataFrame:
    """Packs with removed documents' token slices overwritten by
    ``pad_id``: ``(pack_id, n_tokens, input_ids, tokens_scrubbed)``.

    In-place masking (not splicing) keeps every pack's length and
    every surviving document's offsets identical, so the spans table
    minus the removed rows is still the correct attention/provenance
    mask — the trainer sees pad where the removed text was. Packs
    whose range list is empty return their original array object
    (no per-token work in the common case)."""
    rm = removal.select(F.col(key_col)).distinct()
    ranges = (
        spans.join(F.broadcast(rm), key_col)
        .groupBy("pack_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("start_in_pack").alias("s"),
                    (F.col("start_in_pack") + F.col("len")).alias("e"),
                )
            ).alias("_rm"),
            F.sum("len").cast("long").alias("tokens_scrubbed"),
        )
    )
    scrubbed = F.transform(
        F.col(ids_col),
        lambda x, i: F.when(
            F.exists(
                F.col("_rm"),
                lambda r: (i >= r["s"]) & (i < r["e"]),
            ),
            F.lit(pad_id),
        ).otherwise(x),
    )
    return (
        packs.join(ranges, "pack_id", "left")
        .select(
            "pack_id",
            "n_tokens",
            F.when(F.col("_rm").isNull(), F.col(ids_col))
            .otherwise(scrubbed)
            .alias(ids_col),
            F.coalesce("tokens_scrubbed", F.lit(0)).alias("tokens_scrubbed"),
        )
    )
