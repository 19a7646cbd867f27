"""Stream-stream as-of join: watermark-gated emission, batch parity.

The streaming as-of join may only emit a left row once the watermark
passes its event time; drops are sequenced through availableNow runs
sharing one checkpoint so the watermark advances deterministically
(restored from the commit log between runs).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from temporal_vector_database_spark.operators.temporal import asof_join
from temporal_vector_database_spark.streaming.asof import stream_asof_join

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("tag", T.StringType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("price", T.DoubleType()),
    ]
)


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


@pytest.fixture()
def dirs(tmp_path):
    d = {n: str(tmp_path / n) for n in ("left", "right", "out", "ckpt")}
    return d


def _run(spark, dirs):
    left = spark.readStream.schema(LEFT_SCHEMA).parquet(dirs["left"])
    right = spark.readStream.schema(RIGHT_SCHEMA).parquet(dirs["right"])
    joined = stream_asof_join(left, right, on="ts", by=["key"], value_cols=["price"])
    q = (
        joined.writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ckpt"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _drop(spark, path, schema, rows):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)


def test_stream_asof_matches_batch(spark, dirs):
    rights1 = [("k1", _t(0), 1.0), ("k1", _t(5), 2.0), ("k2", _t(1), 9.0)]
    lefts1 = [("k1", _t(2), "a"), ("k1", _t(7), "b"), ("k2", _t(0), "c")]
    _drop(spark, dirs["right"], RIGHT_SCHEMA, rights1)
    _drop(spark, dirs["left"], LEFT_SCHEMA, lefts1)
    _run(spark, dirs)

    # availableNow's trailing no-data batch advances the watermark to the
    # batch max (10:07) and fires the event-time timeouts: lefts STRICTLY
    # before the watermark resolve in the same run, the frontier row stays.
    out_schema = "key string, ts timestamp, tag string, price_asof double"
    got = {
        (r.key, r.ts, r.tag): r.price_asof
        for r in spark.read.schema(out_schema).parquet(dirs["out"]).collect()
    }
    assert got == {
        ("k1", _t(2), "a"): 1.0,  # latest right <= 10:02 is 10:00
        ("k2", _t(0), "c"): None,  # no right at-or-before → NULL
    }

    # heartbeat (watermark → 10:30) flushes the 10:07 left; the
    # buffered-right compaction must still resolve it to the 10:05 right
    _drop(spark, dirs["left"], LEFT_SCHEMA, [("k1", _t(30), "z")])
    _run(spark, dirs)
    got = {
        (r.key, r.ts, r.tag): r.price_asof
        for r in spark.read.schema(out_schema).parquet(dirs["out"]).collect()
    }
    assert got[("k1", _t(7), "b")] == 2.0
    assert ("k1", _t(30), "z") not in got  # frontier row: wm == its ts

    # one more heartbeat (watermark → 10:45) flushes the 10:30 left
    _drop(spark, dirs["left"], LEFT_SCHEMA, [("k1", _t(45), "zz")])
    _run(spark, dirs)
    got = {
        (r.key, r.ts, r.tag): r.price_asof
        for r in spark.read.schema(out_schema).parquet(dirs["out"]).collect()
    }
    assert got[("k1", _t(30), "z")] == 2.0

    # batch parity on everything emitted so far
    lb = spark.createDataFrame(lefts1 + [("k1", _t(30), "z")], LEFT_SCHEMA)
    rb = spark.createDataFrame(rights1, RIGHT_SCHEMA)
    batch = {
        (r.key, r.ts, r.tag): r.price_asof
        for r in asof_join(lb, rb, on="ts", by=["key"], value_cols=["price"]).collect()
    }
    assert got == batch
