"""Sequence packing: assign documents to fixed token-budget training
rows.

The last step of a training-data pipeline is packing: documents are
concatenated into fixed-length sequences (e.g. 4096 tokens) so the
trainer sees full context windows instead of padding. The reference
pipeline stops at per-record features (``src/services/
extraction_service.py`` emits one record per document); at corpus
scale the packer is where token budgets, shard layout and determinism
meet, so it is a first-class operator here.

Two semantics, both deterministic and partition-layout-independent:

- :func:`pack_chunked` — concatenate-and-chunk: documents are laid
  end-to-end in a deterministic hash order and the stream is cut
  every ``budget`` tokens; a document may straddle a boundary (the
  GPT-style packing). Pure window algebra (one cumulative sum), so
  the DuckDB oracle runs the identical expression — hash-checkable.
- :func:`pack_greedy` — no-straddle first-fit-sequential: walk the
  same deterministic order, open a new pack when the current one
  cannot fit the next document whole (the T5/SFT-style packing where
  examples must not be split). Running remaining-capacity state is
  not expressible as a window function, so this is a vectorized
  per-shard ``applyInPandas`` kernel with a pure-Python reference
  pinned in pytest.

Scale shape: packing needs a total order, and a global total order is
a single-reducer sort — unusable at 10^12 documents. Both operators
therefore shard first: ``shard = floor(u * n_shards)`` where ``u`` is
the engine-portable sha256 uniform (``sampling.hash_uniform``), and
pack WITHIN shards. One exchange on ``shard``, per-shard sorts bound
by ``corpus/n_shards``, and pack ids are globally unique via
``shard * 2^32 + local_id``. Real packers work exactly this way
(per-output-shard packing); cross-shard "waste" is at most one
partial pack per shard.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import hash_uniform

_SHARD_STRIDE = 2**32


def _with_shard_order(
    df: DataFrame, key_col: str, n_shards: int, salt: str
) -> DataFrame:
    """Deterministic shard + intra-shard order: both derive from the
    sha256 uniform of the row key, so the layout of the input parquet
    can never change the packing."""
    u = hash_uniform(key_col, salt)
    return df.withColumn("_u", u).withColumn(
        "_shard", F.floor(F.col("_u") * n_shards).cast("long")
    )


def pack_chunked(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Concatenate-and-chunk packing (documents may straddle pack
    boundaries).

    Adds ``pack_id`` (global id of the pack this document STARTS in),
    ``pack_offset`` (token offset within that pack) and ``straddles``
    (true when the document crosses into the next pack). One exchange
    on ``_shard`` + a per-shard sort; the cumulative sum is a plain
    unbounded-preceding window — the identical expression runs in the
    DuckDB oracle (`__spark_entry__.q_seq_pack`).
    """
    sharded = _with_shard_order(df, key_col, n_shards, salt)
    w = (
        Window.partitionBy("_shard")
        .orderBy("_u", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    start = cum - F.col(token_col)  # token offset where this doc begins
    local = F.floor(start / budget)
    return (
        sharded.withColumn(
            "pack_id",
            (F.col("_shard") * F.lit(_SHARD_STRIDE) + local).cast("long"),
        )
        .withColumn("pack_offset", (start % budget).cast("long"))
        .withColumn(
            "straddles",
            F.floor((cum - 1) / budget) > local,
        )
        .drop("_u", "_shard")
    )


def pack_greedy_py(
    rows: list[tuple[str, int]], budget: int
) -> list[tuple[str, int, int]]:
    """Pure-Python reference for the greedy kernel: rows are
    (key, tokens) in final order; returns (key, local_pack, offset).
    A document longer than ``budget`` gets a pack of its own (offset
    0) — flagged, never split. Pinned against the Spark kernel in
    tests/test_packing.py."""
    out: list[tuple[str, int, int]] = []
    pack, used = 0, 0
    for key, tok in rows:
        if used > 0 and used + tok > budget:
            pack, used = pack + 1, 0
        out.append((key, pack, used))
        used += tok
        if used >= budget:
            pack, used = pack + 1, 0
    return out


def pack_greedy(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """No-straddle greedy packing (documents kept whole).

    Same deterministic shard/order as :func:`pack_chunked`; within a
    shard the running remaining-capacity fold runs in a vectorized
    ``applyInPandas`` kernel (numpy cumsum per batch would be wrong —
    the fold resets — so it is a tight Python loop over the shard's
    arrays, still one Arrow batch per shard, no per-row Spark UDF
    calls). Adds ``pack_id`` (global), ``pack_offset``, ``oversized``
    (doc alone exceeds the budget)."""
    sharded = _with_shard_order(df, key_col, n_shards, salt)
    schema = sharded.drop("_u").schema.add("pack_id", "long").add(
        "pack_offset", "long"
    ).add("oversized", "boolean")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_u", key_col], kind="mergesort")
        toks = pdf[token_col].to_numpy()
        packs = [0] * len(toks)
        offs = [0] * len(toks)
        pack, used = 0, 0
        for i, t in enumerate(toks):
            t = int(t)
            if used > 0 and used + t > budget:
                pack, used = pack + 1, 0
            packs[i], offs[i] = pack, used
            used += t
            if used >= budget:
                pack, used = pack + 1, 0
        shard = int(pdf["_shard"].iloc[0]) if len(pdf) else 0
        out = pdf.drop(columns=["_u"]).copy()
        out["pack_id"] = [shard * _SHARD_STRIDE + p for p in packs]
        out["pack_offset"] = offs
        out["oversized"] = toks > budget
        return out

    return (
        sharded.groupBy("_shard")
        .applyInPandas(fold, schema=schema)
        .drop("_shard")
    )


def pack_stats(packed: DataFrame, token_col: str, budget: int) -> DataFrame:
    """Per-pack fill statistics — the packing-efficiency audit
    (wasted-token fraction is THE packer quality metric). Groups on
    ``pack_id`` (already co-located by the packer's shard exchange in
    the greedy path; one hash-agg otherwise)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("tokens"),
        (F.sum(token_col) / F.lit(float(budget))).alias("fill_ratio"),
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    ids_col: str,
    budget: int,
    n_shards: int = 64,
    salt: str = "pack",
) -> tuple[DataFrame, DataFrame]:
    """Materialize the packed TRAINING ROWS themselves: concatenate
    each shard's token-id arrays in the deterministic hash order and
    cut every ``budget`` tokens (the GPT-style export — documents
    straddle; :func:`pack_chunked` computes the same layout but only
    labels documents, this emits the sequences).

    Returns ``(packs, spans)``:

    - ``packs``: ``(pack_id, n_tokens, input_ids)`` — every pack is
      exactly ``budget`` tokens except each shard's final partial
      pack (pad at the trainer with the vocab's PAD id if needed).
    - ``spans``: ``(pack_id, key, start_in_pack, len)`` — which slice
      of each pack belongs to which document, the attention-mask /
      provenance table (one row per document×pack piece).

    Plan shape: cumulative offsets are ONE per-shard window (same as
    `pack_chunked`); each document then explodes to the packs it
    touches — ceil(n/budget)+1 pieces at most, so the explode factor
    is ~1 — and assembly is ONE hash-agg on (shard, pack) whose
    ``array_sort(collect_list(struct))`` orders pieces by offset
    without a sort exchange (pack contents are ≤ budget tokens by
    construction, so per-group state is bounded). Two exchanges
    total, both on narrow keys; ids never cross a shuffle twice.
    Empty-id documents get no piece (they occupy zero tokens) but
    still appear in `pack_chunked`'s labeling if run separately."""
    sharded = _with_shard_order(df, key_col, n_shards, salt)
    w = (
        Window.partitionBy("_shard")
        .orderBy("_u", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.size(F.col(ids_col))
    cum = F.sum(n).over(w)
    start = (cum - n).cast("long")
    end = cum.cast("long")
    d = (
        sharded.withColumn("_start", start)
        .withColumn("_end", end)
        .filter(F.col("_end") > F.col("_start"))
        .withColumn(
            "_p",
            F.explode(
                F.sequence(
                    F.floor(F.col("_start") / budget),
                    F.floor((F.col("_end") - 1) / budget),
                )
            ),
        )
    )
    lo = F.greatest(F.col("_start"), F.col("_p") * budget)
    hi = F.least(F.col("_end"), (F.col("_p") + 1) * budget)
    pieces = d.select(
        F.col("_shard"),
        F.col("_p"),
        F.col(key_col).alias("key"),
        (lo - F.col("_p") * budget).cast("long").alias("start_in_pack"),
        (hi - lo).cast("long").alias("len"),
        F.slice(
            F.col(ids_col),
            (lo - F.col("_start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ).alias("piece"),
    )
    pack_id = (F.col("_shard") * F.lit(_SHARD_STRIDE) + F.col("_p")).cast(
        "long"
    )
    packs = (
        pieces.groupBy("_shard", "_p")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("start_in_pack", "piece"))
                    ),
                    lambda s: s["piece"],
                )
            ).alias("input_ids")
        )
        .select(
            pack_id.alias("pack_id"),
            F.size("input_ids").alias("n_tokens"),
            "input_ids",
        )
    )
    spans = pieces.select(
        pack_id.alias("pack_id"), "key", "start_in_pack", "len"
    )
    return packs, spans
