"""Custom stateful streaming operator: per-row session assignment with
cross-microbatch state (``applyInPandasWithState``).

``session_window`` aggregates per session; training pipelines usually
need the session id ON EVERY EVENT ROW (it's a feature). This operator
keeps (last_ts, session_id, snap_rank) per entity in group state and
assigns ids incrementally as microbatches arrive — the streaming twin
of ``operators.windows.sessionize`` with identical semantics (new
session when gap > threshold, strictly).

Caveats (inherent to the primitive, documented for operators):
- rows must arrive in non-decreasing ts order per entity across
  batches for ids to match the batch operator (use a watermark +
  sorted sources, or accept per-batch-local ordering);
- state size is O(entities); at 10^12-doc scale key the stream by
  url-bucket shards and use state-store rocksdb on a real cluster.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("snap_rank", T.LongType()),
    ]
)


def _output_schema(entity: str, ts: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(entity, T.LongType()),
            T.StructField(ts, T.TimestampType()),
            T.StructField("session_id", T.LongType()),
            T.StructField("session_seq", T.LongType()),
            T.StructField("snap_rank", T.LongType()),
        ]
    )


def sessionize_stateful(
    events: DataFrame,
    entity: str,
    ts: str,
    gap_seconds: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-row sessionization. Input may be a streaming or
    batch DataFrame grouped by ``entity``."""

    def assign(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_ts_us, session_id, session_seq, snap_rank = state.get
        else:
            last_ts_us, session_id, session_seq, snap_rank = None, 0, 0, 0
        out_rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts, kind="stable")
            for t in pdf[ts]:
                t_us = int(pd.Timestamp(t).value // 1000)
                if last_ts_us is None or (t_us - last_ts_us) / 1_000_000 > gap_seconds:
                    session_id += 1
                    session_seq = 0
                last_ts_us = t_us
                session_seq += 1
                snap_rank += 1
                out_rows.append((key[0], t, session_id, session_seq, snap_rank))
        state.update((last_ts_us, session_id, session_seq, snap_rank))
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=[entity, ts, "session_id", "session_seq", "snap_rank"],
            )

    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark(ts, watermark)
    return events.groupBy(entity).applyInPandasWithState(
        assign,
        _output_schema(entity, ts),
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
