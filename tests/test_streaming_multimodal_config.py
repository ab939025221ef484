"""Streaming sessions (batch parity), multimodal plumbing, config layer."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from med_doi_feature_extraction_spark.multimodal.binary_ops import (
    extract_media_features,
    fake_feature_vector,
    make_fake_media,
    sample_frames,
)
from med_doi_feature_extraction_spark.plans.config import (
    deep_merge,
    load_pipeline_spec,
    substitute_env,
    to_feature_config,
)
from med_doi_feature_extraction_spark.streaming.sessions import (
    run_stream_once,
    streaming_dedupe,
    streaming_sessions,
)


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Streaming session_window over a parquet stream == the batch
    session_window oracle, for every session the watermark finalized.

    Append mode only EMITS sessions whose window end is below the
    final watermark (max event time − delay); sessions still pending
    at end-of-stream stay in state. So the parity set is the batch
    result filtered to finalized sessions — with a single ordered
    source file the stream processes one batch and that set is
    deterministic."""
    delay_s = 7200
    src = str(tmp_path / "events_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.orderBy("ts").coalesce(1).write.parquet(src)

    streamed = run_stream_once(
        spark, src, events.schema,
        lambda s: streaming_sessions(s, "user_id", "ts", 1800, watermark=f"{delay_s} seconds"),
        query_name="sess_stream",
    ).toPandas()

    batch = (
        events.groupBy("user_id", F.session_window("ts", "1800 seconds"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .toPandas()
    )
    max_ts = batch.session_end.max()
    finalized = batch[
        batch.session_end <= max_ts - pd.Timedelta(seconds=delay_s)
    ]
    assert len(finalized) > 0.5 * len(batch)
    key = ["user_id", "session_start"]
    pd.testing.assert_frame_equal(
        streamed.sort_values(key).reset_index(drop=True),
        finalized.sort_values(key).reset_index(drop=True),
    )


def test_streaming_dedupe(spark, tmp_path):
    src = str(tmp_path / "dup_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(100)
    dup = events.union(events)
    dup.write.parquet(src)
    out = run_stream_once(
        spark, src, events.schema,
        lambda s: streaming_dedupe(s, ["event_id"], "ts"),
        query_name="dedup_stream",
    )
    assert out.count() == 100


def test_media_features(spark):
    media = make_fake_media(spark, n=64)
    out = extract_media_features(media, max_batch_bytes=16_000).toPandas()
    assert len(out) == 64
    ok = out[out.decode_error.isna()]
    bad = out[out.decode_error.notna()]
    assert len(bad) > 0 and (bad.decode_error == "empty_payload").all()
    assert ok.features.map(len).eq(16).all()
    # determinism: same payload bytes → same fake vector (media_id 0
    # has an empty payload by construction; use 1)
    mpdf = media.toPandas().set_index("media_id")
    p1 = bytes(mpdf.payload[1])
    assert list(ok[ok.media_id == 1].features.iloc[0]) == fake_feature_vector(p1)


def test_resize_images(spark):
    from med_doi_feature_extraction_spark.multimodal.binary_ops import (
        resize_images,
    )

    media = make_fake_media(spark, n=32)
    out = resize_images(media, 64, 64, max_batch_bytes=16_000).toPandas()
    assert len(out) == 32
    # real resample: output payload is exactly target_h*target_w*3
    # interpolated RGB bytes
    assert (
        out[out.decode_error.isna()].resized.map(len) == 64 * 64 * 3
    ).all()
    ok = out[out.decode_error.isna()]
    bad = out[out.decode_error.notna()]
    assert len(bad) > 0 and (bad.decode_error == "empty_payload").all()
    assert (out.width == 64).all() and (out.height == 64).all()
    # src dims flow through from metadata
    meta = media.select("media_id", "meta.width").toPandas().set_index("media_id")
    for _, r in ok.iterrows():
        assert r.src_width == meta.loc[r.media_id, "width"]
    # deterministic: rerun yields identical resized bytes
    again = resize_images(media, 64, 64).toPandas().set_index("media_id")
    for _, r in ok.iterrows():
        assert bytes(r.resized) == bytes(again.loc[r.media_id, "resized"])


def test_bilinear_resize_golden_4x4_to_2x2():
    """Hand-computed golden: half-pixel mapping of 4×4→2×2 lands each
    target pixel at the exact center of a 2×2 source block, so every
    output value is the mean of its block (weights all 0.5); .5
    values round half-to-even via np.rint."""
    import numpy as np

    from med_doi_feature_extraction_spark.multimodal.binary_ops import (
        bilinear_resize,
    )

    a = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = bilinear_resize(a, 2, 2)
    # block means: (0+1+4+5)/4=2.5, (2+3+6+7)/4=4.5, 10.5, 12.5 →
    # rint half-to-even → 2, 4, 10, 12
    assert out.tolist() == [[2, 4], [10, 12]]
    assert out.dtype == np.uint8
    # identity: resizing to the same dims returns the same pixels
    same = bilinear_resize(a, 4, 4)
    assert (same == a).all()
    # upscale 2×2→4×4 float: corners replicate, centers interpolate
    b = np.array([[0.0, 4.0], [8.0, 12.0]])
    up = bilinear_resize(b, 4, 4)
    assert up[0, 0] == 0.0 and up[3, 3] == 12.0
    # exact half-pixel math: xs = [-0.25, 0.25, 0.75, 1.25] → clipped
    # [0, 0.25, 0.75, 1], so fractional weights [0, .25, .75, 0]:
    exp = np.array(
        [[0.0, 1.0, 3.0, 4.0],
         [2.0, 3.0, 5.0, 6.0],
         [6.0, 7.0, 9.0, 10.0],
         [8.0, 9.0, 11.0, 12.0]]
    )
    assert np.allclose(up, exp)


def test_frame_sampling(spark):
    media = make_fake_media(spark, n=8)
    frames = sample_frames(media, every_ms=1000).toPandas()
    meta = media.select("media_id", "meta.duration_ms").toPandas()
    for _, row in meta.iterrows():
        expected = max(int(row.duration_ms // 1000), 1)
        assert (frames.media_id == row.media_id).sum() == expected
    assert (frames.frame_ts_ms == frames.frame_idx * 1000).all()


def test_config_layer(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "name: base\nwindow:\n  session_gap_seconds: 3600\n  lag_k: 1\n"
        "execution:\n  n_buckets: 64\n"
    )
    (tmp_path / "pipe.yaml").write_text(
        "include: base.yaml\nname: crawl\nrun_id: ${TEST_RUN_ID}\n"
        "window:\n  session_gap_seconds: 900\n"
    )
    os.environ["TEST_RUN_ID"] = "r42"
    spec = load_pipeline_spec(tmp_path / "pipe.yaml", overrides={"window": {"lag_k": 2}})
    assert spec.name == "crawl"
    assert spec.run_id == "r42"
    assert spec.window.session_gap_seconds == 900  # overlay wins
    assert spec.window.lag_k == 2  # CLI override wins last
    assert spec.execution.n_buckets == 64  # from include
    cfg = to_feature_config(spec)
    assert cfg.session_gap_seconds == 900 and cfg.lag_k == 2 and cfg.run_id == "r42"
    with pytest.raises(Exception):
        spec.window = None  # frozen


def test_deep_merge_and_env():
    assert deep_merge({"a": {"x": 1, "y": 2}, "l": [1]}, {"a": {"y": 3}, "l": [2]}) == {
        "a": {"x": 1, "y": 3},
        "l": [2],
    }
    os.environ["FOO_VAR"] = "bar"
    assert substitute_env({"k": "${FOO_VAR}/x", "n": ["${MISSING_VAR}"]}) == {
        "k": "bar/x",
        "n": [""],
    }


def test_stateful_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState per-row sessionization over a stream ==
    the batch sessionize operator, including session_seq continuity."""
    from med_doi_feature_extraction_spark.operators.windows import sessionize
    from med_doi_feature_extraction_spark.streaming.stateful import (
        sessionize_stateful,
    )

    src = str(tmp_path / "stateful_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.orderBy("ts").coalesce(1).write.parquet(src)

    streamed = run_stream_once(
        spark, src, events.schema,
        lambda s: sessionize_stateful(s, "user_id", "ts", 1800),
        query_name="stateful_sess",
    ).toPandas()

    batch = (
        sessionize(
            events.withColumn("ts", F.col("ts").cast("timestamp")),
            "user_id", "ts", 1800,
        )
        .select("user_id", "ts", "session_id", "session_seq", "snap_rank")
        .toPandas()
    )
    key = ["user_id", "ts"]
    streamed = streamed.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(streamed) == len(batch)
    for col in ["session_id", "session_seq", "snap_rank"]:
        assert (streamed[col].astype("int64") == batch[col].astype("int64")).all(), col


def test_stateful_sessionizer_survives_restart(spark, tmp_path):
    """Streaming resumability: stop the query, deliver more data,
    restart from the SAME checkpoint — session state (last_ts,
    session_id, snap_rank) must be restored from the state store so
    ids continue exactly as the one-shot batch result, with no
    duplicate or lost output rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from med_doi_feature_extraction_spark.operators.windows import sessionize
    from med_doi_feature_extraction_spark.streaming.stateful import (
        sessionize_stateful,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")

    def mk(offs):
        return pd.DataFrame(
            {"user_id": 1, "ts": [base + pd.Timedelta(seconds=s) for s in offs]}
        ).astype({"ts": "datetime64[us]"})

    src = tmp_path / "restart_src"
    src.mkdir()
    sink = str(tmp_path / "restart_sink")
    ckpt = str(tmp_path / "restart_ckpt")
    schema = spark.createDataFrame(mk([0])).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        out = sessionize_stateful(stream, "user_id", "ts", 1800)
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # first incarnation sees [0, 100]; ts=200 continues the session and
    # ts=5000 opens a new one ONLY if state survived the restart
    pq.write_table(
        pa.Table.from_pandas(mk([0, 100]), preserve_index=False),
        str(src / "f0.parquet"),
    )
    run_once()
    pq.write_table(
        pa.Table.from_pandas(mk([200, 5000]), preserve_index=False),
        str(src / "f1.parquet"),
    )
    run_once()

    got = (
        spark.read.parquet(sink).toPandas().sort_values("ts").reset_index(drop=True)
    )
    expected = (
        sessionize(spark.createDataFrame(mk([0, 100, 200, 5000])), "user_id", "ts", 1800)
        .select("user_id", "ts", "session_id", "session_seq", "snap_rank")
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == 4  # exactly-once: no dupes, no loss across restart
    for col in ["session_id", "session_seq", "snap_rank"]:
        assert got[col].astype("int64").tolist() == expected[col].astype(
            "int64"
        ).tolist(), col


def test_stateful_sessionize_out_of_order(spark, tmp_path):
    """VERDICT r1 #9: with buffer_late=True, rows arriving out of order
    across microbatches (but within the watermark) get exactly the
    batch operator's session ids; without buffering, the same source
    provably mis-sessions (the documented failure mode)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from med_doi_feature_extraction_spark.operators.windows import sessionize
    from med_doi_feature_extraction_spark.streaming.stateful import (
        sessionize_stateful,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    mk = lambda offs, uid=1: pd.DataFrame(
        {"user_id": uid, "ts": [base + pd.Timedelta(seconds=s) for s in offs]}
    ).astype({"ts": "datetime64[us]"})
    src = tmp_path / "ooo_src"
    src.mkdir()
    # f2 delivers ts=100 AFTER f1 already delivered ts=5000
    batches = [mk([0, 5000]), mk([100, 5100]), mk([100000], uid=99)]
    for i, pdf in enumerate(batches):
        p = str(src / f"f{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (1700000000 + i * 10, 1700000000 + i * 10))

    schema = spark.createDataFrame(batches[0]).schema

    def run(buffered: bool, name: str):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        out = sessionize_stateful(
            stream, "user_id", "ts", 1800,
            watermark="1000 seconds", buffer_late=buffered,
        )
        q = (
            out.writeStream.outputMode("append").format("memory")
            .queryName(name).trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return spark.sql(f"SELECT * FROM {name} WHERE user_id = 1").toPandas()

    got = run(True, "ooo_buffered").sort_values("ts").reset_index(drop=True)
    expected = (
        sessionize(spark.createDataFrame(mk([0, 100, 5000, 5100])),
                   "user_id", "ts", 1800)
        .select("user_id", "ts", "session_id", "session_seq", "snap_rank")
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == 4, f"expected all 4 rows finalized, got {len(got)}"
    for col in ["session_id", "session_seq", "snap_rank"]:
        assert got[col].astype("int64").tolist() == expected[col].astype("int64").tolist(), col

    # without buffering the late row is mis-sessioned
    naive = run(False, "ooo_naive").sort_values("ts").reset_index(drop=True)
    assert naive.session_id.astype("int64").tolist() != expected.session_id.astype(
        "int64"
    ).tolist()


def test_stream_page_features_parity(spark, tmp_path):
    """Streaming flagship path: extract parity is byte-exact vs the
    batch stage; stateful session ids match the batch sessionizer for
    every row the watermark finalized."""
    from med_doi_feature_extraction_spark.operators.windows import sessionize
    from med_doi_feature_extraction_spark.pipeline import extract_stage
    from med_doi_feature_extraction_spark.sources.pages import generate_pages
    from med_doi_feature_extraction_spark.streaming.pipeline import (
        stream_extract,
        stream_page_features,
    )

    pdf = generate_pages(n_urls=30, seed=21)
    src = str(tmp_path / "pages_src")
    pages = spark.createDataFrame(pdf)
    pages.orderBy("warc_ts").coalesce(1).write.parquet(src)

    # stateless extract parity (byte-exact text + doi features)
    streamed_ext = run_stream_once(
        spark, src, pages.schema, stream_extract, query_name="pages_ext"
    ).toPandas()
    batch_ext = extract_stage(pages).drop("text").toPandas()
    key = ["url", "warc_ts"]
    a = streamed_ext.sort_values(key).reset_index(drop=True)
    b = batch_ext.sort_values(key).reset_index(drop=True)
    assert (a.text_extracted == b.text_extracted).all()
    assert (a.doi_count == b.doi_count).all()
    assert "html" not in a.columns

    # stateful sessionization parity on finalized rows
    streamed_sess = run_stream_once(
        spark, src, pages.schema,
        lambda s: stream_page_features(s, gap_seconds=3600, watermark="0 seconds"),
        query_name="pages_sess",
    ).toPandas()
    batch_sess = (
        sessionize(
            pages.withColumn("url_id", F.xxhash64("url")),
            "url_id", "warc_ts", 3600,
        )
        .select("url_id", "warc_ts", "session_id", "session_seq", "snap_rank")
        .toPandas()
    )
    assert len(streamed_sess) > 0
    merged = streamed_sess.merge(
        batch_sess, on=["url_id", "warc_ts"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(streamed_sess)  # every emitted row matches a batch row
    for col in ["session_id", "session_seq", "snap_rank"]:
        assert (merged[f"{col}_s"] == merged[f"{col}_b"]).all(), col


def test_stateful_ewma_matches_batch(spark, tmp_path):
    """Streaming O(1)-state EWMA == the batch feateng.ewma recursion
    for every row, across microbatch boundaries."""
    from med_doi_feature_extraction_spark.operators.feateng import ewma
    from med_doi_feature_extraction_spark.streaming.stateful import ewma_stateful

    src = str(tmp_path / "ewma_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.orderBy("ts").coalesce(1).write.parquet(src)

    streamed = run_stream_once(
        spark, src, events.schema,
        lambda s: ewma_stateful(s, "user_id", "ts", "value", alpha=0.3),
        query_name="stateful_ewma",
    ).toPandas()

    batch = (
        ewma(
            events.withColumn("ts", F.col("ts").cast("timestamp"))
            .select("user_id", "ts", "value"),
            "user_id", "ts", ["value"], alpha=0.3,
        )
        .select("user_id", "ts", "value", "value_ewma")
        .toPandas()
    )
    key = ["user_id", "ts"]
    streamed = streamed.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(streamed) == len(batch) == 1000
    assert (
        (streamed["value_ewma"] - batch["value_ewma"]).abs() < 1e-9
    ).all()


def test_stateful_ewma_out_of_order_and_nan(spark, tmp_path):
    """buffer_late=True: rows arriving out of order across
    microbatches (within the watermark) produce exactly the batch
    EWMA; NaN rows decay the weights without contributing
    (ignore_na=False parity)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from med_doi_feature_extraction_spark.operators.feateng import ewma
    from med_doi_feature_extraction_spark.streaming.stateful import ewma_stateful

    base = pd.Timestamp("2024-01-01 00:00:00")
    mk = lambda offs, vals, uid=1: pd.DataFrame(
        {
            "user_id": uid,
            "ts": [base + pd.Timedelta(seconds=s) for s in offs],
            "value": vals,
        }
    ).astype({"ts": "datetime64[us]", "value": "float64"})
    src = tmp_path / "ewma_ooo"
    src.mkdir()
    # second file delivers ts=100 AFTER ts=5000 was already seen; one
    # NaN value in-band; uid=99 row advances the watermark far enough
    # to finalize everything
    batches = [
        mk([0, 5000], [10.0, 30.0]),
        mk([100, 5100], [20.0, float("nan")]),
        mk([100000], [1.0], uid=99),
    ]
    for i, pdf in enumerate(batches):
        p = str(src / f"f{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (1700000000 + i * 10, 1700000000 + i * 10))

    schema = spark.createDataFrame(batches[0]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = ewma_stateful(
        stream, "user_id", "ts", "value", alpha=0.5,
        watermark="1000 seconds", buffer_late=True,
    )
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("ewma_ooo").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM ewma_ooo WHERE user_id = 1")
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    assert len(got) == 4, f"expected all 4 rows finalized, got {len(got)}"

    expected = (
        ewma(
            spark.createDataFrame(
                mk([0, 100, 5000, 5100], [10.0, 20.0, 30.0, float("nan")])
            ),
            "user_id", "ts", ["value"], alpha=0.5,
        )
        .toPandas().sort_values("ts").reset_index(drop=True)
    )
    assert (
        (got["value_ewma"] - expected["value_ewma"]).abs() < 1e-12
    ).all()
    # the NaN row still emits the carried mean, not NaN
    assert got["value_ewma"].iloc[3] == got["value_ewma"].iloc[2]


def test_stateful_change_rate_matches_batch(spark, tmp_path):
    """Streaming O(1)-state churn features: after the last microbatch,
    each entity's final update-mode emission equals the batch
    windows.change_rate_features aggregate exactly."""
    from med_doi_feature_extraction_spark.operators.windows import (
        change_rate_features,
    )
    from med_doi_feature_extraction_spark.streaming.stateful import (
        change_rate_stateful,
    )

    src = str(tmp_path / "cr_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # 4 files in ts order → 4 microbatches under maxFilesPerTrigger=1
    ordered = events.orderBy("ts").select("user_id", "ts", "event_type")
    pdf = ordered.toPandas()
    import os

    os.makedirs(src)
    step = len(pdf) // 4 + 1
    for i in range(4):
        chunk = pdf.iloc[i * step : (i + 1) * step]
        if len(chunk):
            spark.createDataFrame(chunk).coalesce(1).write.parquet(
                f"{src}/part{i}", mode="overwrite"
            )
    stream = (
        spark.readStream.schema(ordered.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    out = change_rate_stateful(stream, "user_id", "ts", "event_type")
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("cr_stream").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    emitted = spark.sql(
        "SELECT * FROM cr_stream"
    ).toPandas()
    assert len(emitted) > len(emitted["user_id"].unique())  # true updates
    # last emission per entity = the one with max n_snapshots
    last = (
        emitted.sort_values("n_snapshots")
        .groupby("user_id", as_index=False)
        .last()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    batch = (
        change_rate_features(events, "user_id", "ts", "event_type")
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(last) == len(batch)
    for col in ["n_snapshots", "n_changes"]:
        assert (last[col].to_numpy() == batch[col].to_numpy()).all(), col
    import numpy as np

    for col in ["change_rate", "mean_gap_sec"]:
        a = last[col].astype(float).to_numpy()
        b = batch[col].astype(float).to_numpy()
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), col
    assert (
        pd.to_datetime(last["last_change_ts"]).to_numpy()
        == pd.to_datetime(batch["last_change_ts"]).to_numpy()
    ).all()


def test_stateful_cum_distinct_matches_batch(spark, tmp_path):
    """Streaming running-distinct == the batch
    windows.cumulative_distinct for every row (ts totally orders
    each entity's events in this fixture, so tiebreak is moot)."""
    from med_doi_feature_extraction_spark.operators.windows import (
        cumulative_distinct,
    )
    from med_doi_feature_extraction_spark.streaming.stateful import (
        cumulative_distinct_stateful,
    )

    src = str(tmp_path / "cd_src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.orderBy("ts").coalesce(1).write.parquet(src)

    streamed = run_stream_once(
        spark, src, events.schema,
        lambda s: cumulative_distinct_stateful(
            s, "user_id", "ts", "event_type"
        ),
        query_name="stateful_cum_distinct",
    ).toPandas()

    batch = (
        cumulative_distinct(
            events.withColumn("ts", F.col("ts").cast("timestamp"))
            .select("user_id", "ts", "event_id", "event_type"),
            "user_id", "ts", "event_type", tiebreak=["event_id"],
        )
        .select("user_id", "ts", "event_type", "n_distinct_seen")
        .toPandas()
    )
    key = ["user_id", "ts"]
    streamed = streamed.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(streamed) == len(batch) == 1000
    assert (
        streamed["n_distinct_seen"] == batch["n_distinct_seen"]
    ).all()


def test_stateful_cum_distinct_out_of_order_buffered(spark, tmp_path):
    """buffer_late=True: a value arriving late (within watermark)
    still counts exactly once and rows finalize in ts order."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from med_doi_feature_extraction_spark.streaming.stateful import (
        cumulative_distinct_stateful,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    mk = lambda offs, vals, uid=1: pd.DataFrame(
        {
            "user_id": uid,
            "ts": [base + pd.Timedelta(seconds=s) for s in offs],
            "event_type": vals,
        }
    ).astype({"ts": "datetime64[us]"})
    src = tmp_path / "cd_ooo"
    src.mkdir()
    batches = [
        mk([0, 5000], ["a", "b"]),
        mk([100, 5100], ["b", None]),  # late 'b' + a null row
        mk([100000], ["z"], uid=99),   # watermark push
    ]
    for i, pdf in enumerate(batches):
        p = str(src / f"f{i}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
        os.utime(p, (1700000000 + i * 10, 1700000000 + i * 10))

    schema = spark.createDataFrame(batches[0]).schema
    out = run_stream_once(
        spark, str(src), schema,
        lambda s: cumulative_distinct_stateful(
            s, "user_id", "ts", "event_type",
            watermark="0 seconds", buffer_late=True,
        ),
        query_name="stateful_cd_ooo",
    ).toPandas()
    u1 = out[out.user_id == 1].sort_values("ts").reset_index(drop=True)
    # ts order: 0:'a'->1, 100:'b'->2, 5000:'b'->2 (dup), 5100:None->2
    assert list(u1["n_distinct_seen"]) == [1, 2, 2, 2]


def test_stateful_topk_misra_gries(spark, tmp_path):
    """Streaming MG heavy hitters: guarantee bound vs exact counts,
    state carry across microbatches, deterministic summary."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from med_doi_feature_extraction_spark.streaming.stateful import (
        topk_stateful,
    )

    # skewed stream: 'hot' 60x, 'warm' 25x, 15 one-off items
    seq = (["hot"] * 60 + ["warm"] * 25 + [f"cold{i}" for i in range(15)])
    # interleave deterministically so cold items pepper the stream
    order = []
    hot, rest = seq[:60], seq[60:]
    for i in range(60):
        order.append(hot[i])
        if i < len(rest):
            order.append(rest[i])
    rows = [("g1", it) for it in order]

    src = str(tmp_path / "topk_src")
    os.makedirs(src, exist_ok=True)
    # two files + maxFilesPerTrigger=1 -> two microbatches in ONE
    # availableNow run: state must carry between them
    b1 = pa.table({"grp": [r[0] for r in rows[:50]],
                   "item": [r[1] for r in rows[:50]]})
    pq.write_table(b1, f"{src}/part-0.parquet")
    b2 = pa.table({"grp": [r[0] for r in rows[50:]],
                   "item": [r[1] for r in rows[50:]]})
    pq.write_table(b2, f"{src}/part-1.parquet")

    schema = spark.createDataFrame(rows[:1], "grp string, item string").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        topk_stateful(stream, "grp", "item", k=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mg_topk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.sql("SELECT * FROM mg_topk").toPandas()
    final_n = out["n_processed"].max()
    assert final_n == len(rows)
    final = out[out["n_processed"] == final_n].set_index("item")
    # the guarantee: any item with true freq > n/k is present
    n, k = len(rows), 4
    assert "hot" in final.index and "warm" in final.index
    # error bound: true - mg <= n/k
    assert 60 - final.loc["hot", "mg_count"] <= n / k
    assert 25 - final.loc["warm", "mg_count"] <= n / k
    assert len(final) <= k


def test_stateful_topk_emptied_summary_emits_sentinel(spark, tmp_path):
    """A batch that empties the MG summary must still advance the
    snapshot stream (NULL-item sentinel), or a stale snapshot wins
    the consumer's max-n_processed filter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from med_doi_feature_extraction_spark.streaming.stateful import (
        topk_stateful,
    )

    src = str(tmp_path / "topk_src2")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.table({"grp": ["g"], "item": ["a"]}),
                   f"{src}/part-0.parquet")
    pq.write_table(pa.table({"grp": ["g"], "item": ["b"]}),
                   f"{src}/part-1.parquet")  # k=1: decrement-all -> {}
    stream = (
        spark.readStream.schema("grp string, item string")
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        topk_stateful(stream, "grp", "item", k=1)
        .writeStream.outputMode("append").format("memory")
        .queryName("mg_sentinel").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = spark.sql("SELECT * FROM mg_sentinel").toPandas()
    final_n = out["n_processed"].max()
    assert final_n == 2  # the emptying batch DID advance the stream
    final = out[out["n_processed"] == final_n]
    assert len(final) == 1 and final.iloc[0]["item"] is None
    assert final.iloc[0]["mg_count"] == 0
