"""Stream-stream interval join and watermarked stream dedup: streaming
(availableNow) results must equal the same plan run in batch, and the
interval bound / duplicate horizon semantics must hold."""

import os
from datetime import datetime, timedelta

from temporal_vector_database_spark.streaming.relational import (
    stream_deduplicate,
    stream_interval_join,
)

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, kind string"


def _impressions():
    t0 = datetime(2025, 3, 1, 10, 0, 0)
    return [
        (100 + i, t0 + timedelta(minutes=3 * i), i % 5, "impression")
        for i in range(40)
    ]


def _conversions():
    t0 = datetime(2025, 3, 1, 10, 0, 0)
    # every other conversion lands within 10 min of some impression of
    # the same user; the offset ones miss the window
    return [
        (500 + i, t0 + timedelta(minutes=3 * i + (4 if i % 2 else 25)), i % 5, "conversion")
        for i in range(40)
    ]


def _write_stream_input(spark, tmp_path, name, rows, schema):
    d = str(tmp_path / name)
    os.makedirs(d)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(d)
    return spark.readStream.schema(schema).parquet(d)


def test_interval_join_stream_equals_batch(spark, tmp_path):
    imps, convs = _impressions(), _conversions()
    ls = _write_stream_input(spark, tmp_path, "imp", imps, EVENT_SCHEMA)
    rs = _write_stream_input(spark, tmp_path, "conv", convs, EVENT_SCHEMA)

    q = (
        stream_interval_join(ls, rs, key="user_id", upper="10 minutes")
        .writeStream.format("memory")
        .queryName("ij")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT l_event_id, r_event_id FROM ij").collect()}

    lb = spark.createDataFrame(imps, EVENT_SCHEMA)
    rb = spark.createDataFrame(convs, EVENT_SCHEMA)
    want = {
        tuple(r)
        for r in stream_interval_join(lb, rb, key="user_id", upper="10 minutes")
        .select("l_event_id", "r_event_id")
        .collect()
    }
    assert got == want
    assert len(want) > 0


def test_interval_join_respects_upper_bound(spark):
    lb = spark.createDataFrame(_impressions(), EVENT_SCHEMA)
    rb = spark.createDataFrame(_conversions(), EVENT_SCHEMA)
    joined = stream_interval_join(lb, rb, key="user_id", upper="10 minutes").collect()
    for r in joined:
        gap = (r.r_ts - r.l_ts).total_seconds()
        assert 0 <= gap <= 600
    # the +25-minute conversions must appear for SOME earlier impression
    # or not at all — never matched to an impression less than 0 or more
    # than 10 minutes before them (checked above); and at least one
    # conversion is window-less entirely
    matched_r = {r.r_event_id for r in joined}
    all_r = {row[0] for row in _conversions()}
    assert matched_r < all_r


def test_stream_dedup_equals_batch_and_bounds_state(spark, tmp_path):
    t0 = datetime(2025, 3, 1, 10, 0, 0)
    rows = []
    for i in range(60):
        ts = t0 + timedelta(minutes=i)
        rows.append((i % 20, ts, i % 7, "click"))  # every id duplicated 3x
    st = _write_stream_input(spark, tmp_path, "dup", rows, EVENT_SCHEMA)
    q = (
        stream_deduplicate(st, key_cols=("event_id",), watermark="2 hours")
        .writeStream.format("memory")
        .queryName("dd")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got_ids = sorted(r.event_id for r in spark.sql("SELECT event_id FROM dd").collect())
    batch = stream_deduplicate(
        spark.createDataFrame(rows, EVENT_SCHEMA), key_cols=("event_id",)
    )
    want_ids = sorted(r.event_id for r in batch.select("event_id").collect())
    assert got_ids == want_ids == list(range(20))
