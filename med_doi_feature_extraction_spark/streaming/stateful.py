"""Custom stateful streaming operator: per-row session assignment with
cross-microbatch state (``applyInPandasWithState``).

``session_window`` aggregates per session; training pipelines usually
need the session id ON EVERY EVENT ROW (it's a feature). This operator
keeps (last_ts, session_id, snap_rank) per entity in group state and
assigns ids incrementally as microbatches arrive — the streaming twin
of ``operators.windows.sessionize`` with identical semantics (new
session when gap > threshold, strictly; gaps compared on FLOORED epoch
seconds exactly like the batch operator's ``_epoch_seconds``, so
sub-second timestamps session identically in both modes).

Two delivery modes:

- ``buffer_late=False`` (default): rows are assigned ids immediately,
  assuming non-decreasing ts per entity across batches (sorted source).
  A row arriving after a later row has been processed gets a WRONG id —
  this failure mode is pinned by a test.
- ``buffer_late=True``: rows are held in group state until the event
  watermark passes them, then finalized in ts order — out-of-order
  arrival within the watermark yields exactly the batch ids (append
  semantics: rows newer than the final watermark stay buffered, same
  contract as ``session_window`` append mode). Uses EventTimeTimeout
  so buffered rows flush on no-data microbatches as the watermark
  advances.

State size is O(entities) (+O(buffered rows) in buffered mode — bounded
by rows-per-watermark-window); at 10^12-doc scale key the stream by
url-bucket shards and use the rocksdb state store on a real cluster.
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
        T.StructField("pending_ts_us", T.ArrayType(T.LongType())),
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
    buffer_late: bool = False,
) -> DataFrame:
    """Streaming per-row sessionization. Input may be a streaming or
    batch DataFrame grouped by ``entity`` (``buffer_late`` requires a
    streaming input — it finalizes on watermark advance)."""

    def assign(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_ts_us, session_id, session_seq, snap_rank, pending = state.get
            pending = list(pending or [])
        else:
            last_ts_us, session_id, session_seq, snap_rank = None, 0, 0, 0
            pending = []

        new_ts: list[int] = []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                # one vectorized ns→µs conversion per batch (floor
                # division matches pd.Timestamp(t).value // 1000)
                new_ts.extend(
                    (pdf[ts].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000).tolist()
                )

        if buffer_late:
            wm_us = state.getCurrentWatermarkMs() * 1000
            pending = sorted(pending + new_ts)
            ready = [t for t in pending if t <= wm_us]
            pending = [t for t in pending if t > wm_us]
        else:
            ready = sorted(new_ts)

        # the state transitions themselves are inherently sequential
        # per entity (each row's session depends on the previous one);
        # only plain ints flow through the loop — timestamp object
        # construction happens vectorized below
        out_rows = []
        for t_us in ready:
            t_s = t_us // 1_000_000
            if last_ts_us is None or t_s - (last_ts_us // 1_000_000) > gap_seconds:
                session_id += 1
                session_seq = 0
            last_ts_us = t_us
            session_seq += 1
            snap_rank += 1
            out_rows.append((t_us, session_id, session_seq, snap_rank))

        state.update((last_ts_us, session_id, session_seq, snap_rank, pending))
        if buffer_late and pending:
            # re-arm: fire as soon as the watermark can finalize the
            # earliest buffered row (must be strictly > current wm)
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(min(pending) // 1000, wm_ms + 1))
        if out_rows:
            cols = pd.DataFrame(
                out_rows,
                columns=["_us", "session_id", "session_seq", "snap_rank"],
            )
            yield pd.DataFrame(
                {
                    entity: key[0],
                    ts: pd.to_datetime(cols["_us"], unit="us"),
                    "session_id": cols["session_id"],
                    "session_seq": cols["session_seq"],
                    "snap_rank": cols["snap_rank"],
                }
            )

    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark(ts, watermark)
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if buffer_late
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(entity).applyInPandasWithState(
        assign,
        _output_schema(entity, ts),
        STATE_SCHEMA,
        "append",
        timeout,
    )


EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("num", T.DoubleType()),
        T.StructField("den", T.DoubleType()),
        T.StructField("pending_ts_us", T.ArrayType(T.LongType())),
        T.StructField("pending_val", T.ArrayType(T.DoubleType())),
    ]
)


def _ewma_output_schema(entity: str, ts: str, value: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(entity, T.LongType()),
            T.StructField(ts, T.TimestampType()),
            T.StructField(value, T.DoubleType()),
            T.StructField(f"{value}_ewma", T.DoubleType()),
        ]
    )


def ewma_stateful(
    events: DataFrame,
    entity: str,
    ts: str,
    value: str,
    alpha: float,
    watermark: str = "1 hour",
    buffer_late: bool = False,
) -> DataFrame:
    """Streaming per-row EWMA with cross-microbatch state — the
    streaming twin of ``operators.feateng.ewma`` (adjust=True,
    ignore_na=False semantics).

    State per entity is two scalars: ``num_t = x_t + (1-a)·num_{t-1}``
    and ``den_t = 1 + (1-a)·den_{t-1}`` (NaN rows decay both without
    adding — exactly pandas ``ignore_na=False`` weight bookkeeping);
    the emitted mean is ``num/den``. O(entities) state regardless of
    history length — the streaming-native form of a feature whose
    batch recursion needs the whole history in order.

    Same delivery contract as :func:`sessionize_stateful`: default
    mode assumes per-entity non-decreasing ts across microbatches;
    ``buffer_late=True`` holds rows in state until the event watermark
    passes them and finalizes in ts order (append semantics). Ties at
    equal ts finalize in arrival order (stable sort), matching the
    batch operator's stable mergesort when no tiebreak is given.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    r = 1.0 - alpha

    def step(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_ts_us, num, den, p_ts, p_val = state.get
            pending = list(zip(p_ts or [], p_val or []))
        else:
            last_ts_us, num, den = None, 0.0, 0.0
            pending = []

        new_rows: list[tuple[int, float]] = []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = (
                    pdf[ts].to_numpy(dtype="datetime64[ns]").astype("int64")
                    // 1000
                )
                vals = pdf[value].to_numpy(dtype="float64")
                new_rows.extend(zip(ts_us.tolist(), vals.tolist()))

        if buffer_late:
            wm_us = state.getCurrentWatermarkMs() * 1000
            pending = sorted(pending + new_rows, key=lambda p: p[0])
            ready = [p for p in pending if p[0] <= wm_us]
            pending = [p for p in pending if p[0] > wm_us]
        else:
            ready = sorted(new_rows, key=lambda p: p[0])
            pending = []

        out_rows = []
        for t_us, x in ready:
            num *= r
            den *= r
            if x == x:  # non-NaN
                num += x
                den += 1.0
            last_ts_us = t_us
            out_rows.append((t_us, x, (num / den) if den > 0 else None))

        state.update(
            (
                last_ts_us,
                num,
                den,
                [p[0] for p in pending],
                [p[1] for p in pending],
            )
        )
        if buffer_late and pending:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(min(p[0] for p in pending) // 1000, wm_ms + 1)
            )
        if out_rows:
            cols = pd.DataFrame(out_rows, columns=["_us", value, f"{value}_ewma"])
            yield pd.DataFrame(
                {
                    entity: key[0],
                    ts: pd.to_datetime(cols["_us"], unit="us"),
                    value: cols[value],
                    f"{value}_ewma": cols[f"{value}_ewma"],
                }
            )

    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark(ts, watermark)
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if buffer_late
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(entity).applyInPandasWithState(
        step,
        _ewma_output_schema(entity, ts, value),
        EWMA_STATE_SCHEMA,
        "append",
        timeout,
    )


CHANGE_RATE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("prev_c", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("changes", T.LongType()),
        T.StructField("gap_sum", T.DoubleType()),
        T.StructField("last_change_us", T.LongType()),
        T.StructField("p_ts", T.ArrayType(T.LongType())),
        T.StructField("p_c", T.ArrayType(T.StringType())),
    ]
)


def _change_rate_output_schema(entity: str, ts: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(entity, T.LongType()),
            T.StructField("n_snapshots", T.LongType()),
            T.StructField("n_changes", T.LongType()),
            T.StructField("change_rate", T.DoubleType()),
            T.StructField("mean_gap_sec", T.DoubleType()),
            T.StructField("last_change_ts", T.TimestampType()),
        ]
    )


def change_rate_stateful(
    events: DataFrame,
    entity: str,
    ts: str,
    content: str,
    watermark: str = "1 hour",
    buffer_late: bool = False,
) -> DataFrame:
    """Streaming per-entity content-churn features — the streaming
    twin of ``operators.windows.change_rate_features`` with O(1) state
    per entity: (last ts, previous content value, snapshot/change
    counts, gap sum, last-change ts). Each microbatch emits the
    entity's RUNNING feature row (update semantics — pair with
    ``outputMode("update")``); after the final batch the last emission
    per entity equals the batch operator's aggregate exactly (pinned
    in tests).

    Same delivery contract as the other stateful ops here: default
    mode assumes per-entity non-decreasing ts across microbatches;
    ``buffer_late=True`` holds rows in state until the event watermark
    passes them, so bounded out-of-order arrival still yields the
    batch answer. Null-safe change semantics match the batch op:
    NULL→NULL is no change, NULL↔value is a change, the first snapshot
    never counts. Gap seconds use the same whole-second floor as the
    batch epoch cast.
    """
    NULL_MARK = "\x00<null>"

    def _r6(x: float) -> float:
        # Spark's round() is HALF_UP; Python's is banker's — they
        # diverge at exact 5e-7 tails (e.g. 1/128), so replicate
        # HALF_UP for non-negative inputs
        import math

        return math.floor(x * 1e6 + 0.5) / 1e6

    def step(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            (last_ts_us, prev_c, n, changes, gap_sum, last_change_us,
             p_ts, p_c) = state.get
            pending = list(zip(p_ts or [], p_c or []))
        else:
            last_ts_us, prev_c = None, None
            n, changes, gap_sum, last_change_us = 0, 0, 0.0, None
            pending = []

        new_rows: list[tuple[int, str]] = []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = (
                    pdf[ts].to_numpy(dtype="datetime64[ns]").astype("int64")
                    // 1000
                )
                cs = [
                    NULL_MARK if c is None or c != c else str(c)
                    for c in pdf[content].tolist()
                ]
                new_rows.extend(zip(ts_us.tolist(), cs))

        if buffer_late:
            wm_us = state.getCurrentWatermarkMs() * 1000
            pending = sorted(pending + new_rows, key=lambda p: p[0])
            ready = [p for p in pending if p[0] <= wm_us]
            pending = [p for p in pending if p[0] > wm_us]
        else:
            ready = sorted(new_rows, key=lambda p: p[0])
            pending = []

        for t_us, c in ready:
            if n > 0:
                # whole-second gap (batch op floors via epoch cast)
                gap_sum += float(t_us // 1_000_000 - last_ts_us // 1_000_000)
                if c != prev_c:
                    changes += 1
                    last_change_us = t_us
            n += 1
            last_ts_us = t_us
            prev_c = c

        state.update(
            (
                last_ts_us, prev_c, n, changes, gap_sum, last_change_us,
                [p[0] for p in pending], [p[1] for p in pending],
            )
        )
        if buffer_late and pending:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(min(p[0] for p in pending) // 1000, wm_ms + 1)
            )
        if ready:
            yield pd.DataFrame(
                {
                    entity: [key[0]],
                    "n_snapshots": [n],
                    "n_changes": [changes],
                    "change_rate": [
                        _r6(changes / (n - 1)) if n > 1 else None
                    ],
                    "mean_gap_sec": [
                        _r6(gap_sum / (n - 1)) if n > 1 else None
                    ],
                    "last_change_ts": [
                        pd.to_datetime(last_change_us, unit="us")
                        if last_change_us is not None
                        else pd.NaT
                    ],
                }
            )

    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark(ts, watermark)
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if buffer_late
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(entity).applyInPandasWithState(
        step,
        _change_rate_output_schema(entity, ts),
        CHANGE_RATE_STATE_SCHEMA,
        "update",
        timeout,
    )


CUM_DISTINCT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("seen", T.ArrayType(T.StringType())),
        T.StructField("n_seen", T.LongType()),
        T.StructField("p_ts", T.ArrayType(T.LongType())),
        T.StructField("p_v", T.ArrayType(T.StringType())),
    ]
)


def _cum_distinct_output_schema(
    entity: str, ts: str, val: str
) -> T.StructType:
    return T.StructType(
        [
            T.StructField(entity, T.LongType()),
            T.StructField(ts, T.TimestampType()),
            T.StructField(val, T.StringType()),
            T.StructField("n_distinct_seen", T.LongType()),
        ]
    )


def cumulative_distinct_stateful(
    events: DataFrame,
    entity: str,
    ts: str,
    val: str,
    watermark: str = "1 hour",
    buffer_late: bool = False,
) -> DataFrame:
    """Streaming running-distinct breadth — the streaming twin of
    ``operators.windows.cumulative_distinct``: every row is emitted
    with the number of DISTINCT non-null ``val`` values its entity
    has exhibited so far. NULL values never increment (emitted with
    the running count carried through), matching the batch operator.

    State per entity = the SET of values seen (plus the usual
    buffered-late arrays): O(distinct values per entity) — bounded
    for the categorical columns this feature means (languages,
    template ids, content hashes bucketed upstream); it is NOT the
    right streaming shape for unbounded-cardinality values (hash to
    a fixed sketch upstream, or use an HLL variant, if so).

    Delivery contract identical to :func:`ewma_stateful`: default
    mode assumes per-entity non-decreasing ts across microbatches;
    ``buffer_late=True`` holds rows until the event watermark passes
    them and finalizes in ts order (append semantics). Ties at equal
    ts finalize in arrival order (stable sort) — the batch twin with
    a tiebreak column may order equal-ts rows differently; the FINAL
    count after the tie group is identical either way (set union is
    order-free).
    """

    def step(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            last_ts_us, seen_arr, n_seen, p_ts, p_v = state.get
            seen = set(seen_arr or [])
            pending = list(zip(p_ts or [], p_v or []))
        else:
            last_ts_us, seen, pending = None, set(), []

        new_rows: list[tuple[int, object]] = []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us = (
                    pdf[ts].to_numpy(dtype="datetime64[ns]").astype("int64")
                    // 1000
                )
                vals = pdf[val].astype(object).where(
                    pdf[val].notna(), None
                )
                new_rows.extend(zip(ts_us.tolist(), vals.tolist()))

        if buffer_late:
            wm_us = state.getCurrentWatermarkMs() * 1000
            pending = sorted(pending + new_rows, key=lambda p: p[0])
            ready = [p for p in pending if p[0] <= wm_us]
            pending = [p for p in pending if p[0] > wm_us]
        else:
            ready = sorted(new_rows, key=lambda p: p[0])
            pending = []

        out_rows = []
        for t_us, v in ready:
            if v is not None:
                seen.add(v)
            last_ts_us = t_us
            out_rows.append((t_us, v, len(seen)))

        state.update(
            (
                last_ts_us,
                sorted(seen),
                len(seen),
                [p[0] for p in pending],
                [p[1] for p in pending],
            )
        )
        if buffer_late and pending:
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(min(p[0] for p in pending) // 1000, wm_ms + 1)
            )
        if out_rows:
            cols = pd.DataFrame(
                out_rows, columns=["_us", val, "n_distinct_seen"]
            )
            yield pd.DataFrame(
                {
                    entity: key[0],
                    ts: pd.to_datetime(cols["_us"], unit="us"),
                    val: cols[val],
                    "n_distinct_seen": cols["n_distinct_seen"].astype(
                        "int64"
                    ),
                }
            )

    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark(ts, watermark)
    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if buffer_late
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(entity).applyInPandasWithState(
        step,
        _cum_distinct_output_schema(entity, ts, val),
        CUM_DISTINCT_STATE_SCHEMA,
        "append",
        timeout,
    )


TOPK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_processed", T.LongType()),
    ]
)


def _topk_output_schema(group: str, item: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(group, T.StringType()),
            T.StructField(item, T.StringType()),
            T.StructField("mg_count", T.LongType()),
            T.StructField("n_processed", T.LongType()),
        ]
    )


def topk_stateful(
    events: DataFrame,
    group: str,
    item: str,
    k: int,
) -> DataFrame:
    """Streaming heavy hitters per group — the Misra–Gries summary
    (1982; the "space-saving" family) in ``applyInPandasWithState``:
    O(k) state per group regardless of stream length, with the
    classic deterministic guarantee ``true_count − mg_count ≤ n/k``
    — any item with true frequency > n/k is IN the summary. The
    streaming twin of the batch top-n-gram / hot-domain censuses for
    dashboards that cannot afford a full (group, item) hash-agg of
    an unbounded stream.

    Per microbatch each group that made PROGRESS (processed ≥ 1
    non-null item) emits its UPDATED summary snapshot — one row per
    retained item, or a single NULL-item row when the MG step left
    the summary empty, so the snapshot stream always advances and an
    emptied summary can never lose to a stale one. A consumer keeps
    the rows with the max ``n_processed`` per group, then drops the
    NULL-item sentinel. No-progress microbatches emit nothing
    (n_processed unchanged ⇒ re-emitting would duplicate the
    max-n snapshot). Arrival order within a group decides MG
    tie-breaking, so tests feed an ordered single-partition source
    (the sessionize_stateful convention).
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def step(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            items, counts, n = state.get
            summary = dict(zip(items or [], counts or []))
        else:
            summary, n = {}, 0
        n_before = n

        for pdf in pdf_iter:
            for it in pdf[item].astype(object):
                if it is None:
                    continue
                n += 1
                if it in summary:
                    summary[it] += 1
                elif len(summary) < k:
                    summary[it] = 1
                else:  # decrement-all; drop zeros (the MG step)
                    summary = {
                        i: c - 1 for i, c in summary.items() if c > 1
                    }

        keys_sorted = sorted(summary)  # deterministic state layout
        state.update(
            (
                keys_sorted,
                [summary[i] for i in keys_sorted],
                n,
            )
        )
        if n > n_before:
            out_items = keys_sorted or [None]
            out_counts = [summary[i] for i in keys_sorted] or [0]
            yield pd.DataFrame(
                {
                    group: key[0],
                    item: out_items,
                    "mg_count": out_counts,
                    "n_processed": n,
                }
            )

    return events.groupBy(group).applyInPandasWithState(
        step,
        _topk_output_schema(group, item),
        TOPK_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
