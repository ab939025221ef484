"""Streaming flagship path: incremental pages → features.

Batch ``pipeline.page_features`` computes window features over the
FULL per-url history — correct for backfills, impossible to restate
incrementally without state. This module is the streaming twin for
continuous ingestion of the same input shape (url, warc_ts, html,
text, lang):

- scan-side stage identical to batch: the Arrow html→text kernel +
  regex feature maps run per micro-batch with the blob pruned before
  any stateful operator (same column-pruning discipline);
- per-url crawl-gap session ids via the stateful sessionizer
  (``buffer_late=True`` → watermark-ordered, exact batch parity);
- append sink with checkpointing — exactly-once per (url, warc_ts)
  under the standard file-sink contract.

Lag/ffill/rolling features are deliberately NOT offered here: their
full-history semantics belong to the batch engine (re-run the batch
pipeline over the accumulated table); serving pipelines that need
"latest value per url" streaming-side should keep it in state the way
``sessionize_stateful`` does. This split mirrors the
lambda-architecture guidance in SURVEY.md §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.pipeline import extract_stage
from med_doi_feature_extraction_spark.streaming.stateful import (
    sessionize_stateful,
)


def stream_page_features(
    pages_stream: DataFrame,
    gap_seconds: int = 3600,
    watermark: str = "1 hour",
    entity_hash_col: str = "url_id",
) -> DataFrame:
    """Streaming extract + sessionize over a pages readStream.

    The stateful sessionizer keys state by a 64-bit url hash (LongType
    group key keeps state rows fixed-width; collision probability at
    10^12 urls ≈ 2.7e-2 per *pair*... birthday-bounded corpus-wide by
    sharding the stream — the session id only needs uniqueness WITHIN
    a url, and a colliding pair would interleave sessions, detectable
    via the lineage url set; acceptable for the streaming tier).
    Output: one row per (url_id, warc_ts) with session columns; join
    back to the extracted features on (url_id, warc_ts) downstream or
    run the two sinks side by side.
    """
    extracted = extract_stage(pages_stream).drop("text")
    extracted = extracted.withColumn(entity_hash_col, F.xxhash64("url"))
    sess = sessionize_stateful(
        extracted.select(entity_hash_col, "warc_ts"),
        entity_hash_col,
        "warc_ts",
        gap_seconds,
        watermark=watermark,
        buffer_late=True,
    )
    return sess


def stream_extract(pages_stream: DataFrame) -> DataFrame:
    """Stateless streaming stage: html→text + regex features, blob
    pruned — appendable straight to the features table."""
    return extract_stage(pages_stream).drop("text")
