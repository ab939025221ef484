"""Document → training-chunk layout: fixed-size token windows with
overlap.

The stage between curation and sequence packing in an LLM data
pipeline: each document is split into chunks of ``chunk_tokens``
whitespace tokens advancing by ``stride = chunk_tokens - overlap``,
so consecutive chunks share ``overlap`` tokens of context (the
HF-tokenizer ``return_overflowing_tokens``/``stride`` layout).
``operators/packing.py`` consumes the resulting ``(id, n_tokens)``
rows.

Scale shape: pure JVM Column algebra — tokenize, build the start
offsets with ``sequence``, one ``posexplode``-style Generate, slice +
join per chunk. NO shuffle at all: chunking is embarrassingly
row-parallel and stays in whole-stage codegen; the only cost is the
output fan-out, which is inherent to the operation.

Tail rule: a final window that would contain NO token beyond the
previous chunk (``start + overlap >= n`` for a non-first chunk) is
not emitted — it would be a strict suffix of the previous chunk.
Every token of every document appears in ≥1 chunk (coverage is
property-tested), and no chunk is fully redundant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
    keep_text: bool = True,
) -> DataFrame:
    """One row per (doc, chunk): ``(id, chunk_id, chunk_start,
    chunk_len[, chunk_text])``.

    ``chunk_id`` is the 0-based window index (= chunk_start / stride),
    ``chunk_start`` the 0-based token offset, ``chunk_len`` the actual
    token count (< ``chunk_tokens`` only for the last chunk). Documents
    with no tokens (empty/whitespace text) emit no rows.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") > 0)
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride)),
        lambda s: (s == 0) | (s + overlap < F.col("_n")),
    )
    out = base.select(
        id_col,
        "_toks",
        "_n",
        F.explode(starts).alias("chunk_start"),
    ).select(
        id_col,
        (F.col("chunk_start") / stride).cast("int").alias("chunk_id"),
        "chunk_start",
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("chunk_start")).alias(
            "chunk_len"
        ),
        *(
            [
                F.array_join(
                    F.slice("_toks", F.col("chunk_start") + 1, chunk_tokens), " "
                ).alias("chunk_text")
            ]
            if keep_text
            else []
        ),
    )
    return out
