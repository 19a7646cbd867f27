"""Watermarked streaming windowed aggregation must equal the same plan run
in batch (complete mode), and must drop late rows in append mode."""

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from temporal_vector_database_spark.streaming.analytics import windowed_event_stats

SCHEMA = "ts timestamp, event_type string, user_id long, value double"


def _events(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows():
    t0 = datetime(2025, 3, 1, 10, 0, 0)
    out = []
    for i in range(200):
        out.append(
            (
                t0 + timedelta(minutes=i % 170),
                "click" if i % 3 else "view",
                i % 7,
                float(i % 10) / 4,
            )
        )
    return out


def test_stream_equals_batch_complete_mode(spark, tmp_path):
    rows = _rows()
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _events(spark, rows).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        windowed_event_stats(stream, "1 hour", "30 minutes")
        .writeStream.format("memory")
        .queryName("win_stats")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_stats").collect()}
    want = {tuple(r) for r in windowed_event_stats(_events(spark, rows)).collect()}
    assert got == want and len(want) >= 4


def test_append_mode_emits_only_finalized_windows(spark, tmp_path):
    rows = _rows()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _events(spark, rows).coalesce(1).write.mode("append").parquet(in_dir)

    from temporal_vector_database_spark.streaming.analytics import windowed_event_stats as ws

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        ws(stream, "1 hour", "30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.read.parquet(out_dir)
    # max event time 12:50 → watermark 12:20 → only the 10:00 and 11:00
    # windows are finalized; the 12:00 window is still open and held back
    starts = {r.window_start for r in emitted.select("window_start").distinct().collect()}
    assert starts == {datetime(2025, 3, 1, 10), datetime(2025, 3, 1, 11)}
    # emitted windows carry exactly the batch-computed values
    batch = windowed_event_stats(_events(spark, rows))
    want = {
        tuple(r)
        for r in batch.where(F.col("window_start") < F.lit(datetime(2025, 3, 1, 12))).collect()
    }
    assert {tuple(r) for r in emitted.collect()} == want


def test_streaming_search_matches_batch(spark, tmp_path, versions, queries_vec):
    from temporal_vector_database_spark.operators.search import (
        build_search_index,
        topk_cosine_indexed,
    )
    from temporal_vector_database_spark.streaming.search import run_search_stream

    in_dir = str(tmp_path / "queries_in")
    out_dir = str(tmp_path / "hits")
    ckpt = str(tmp_path / "ckpt")
    queries_vec.coalesce(1).write.mode("append").parquet(in_dir)

    idx = build_search_index(versions)
    stream = spark.readStream.schema(queries_vec.schema).parquet(in_dir)
    run_search_stream(stream, idx, out_dir, ckpt)

    from temporal_vector_database_spark.streaming.search import read_search_results

    res = read_search_results(spark, out_dir)
    want_df = topk_cosine_indexed(idx, queries_vec)
    got = {tuple(r) for r in res.select(*want_df.columns).collect()}
    want = {tuple(r) for r in want_df.collect()}
    assert got == want and len(want) > 0


def test_session_window_stream_equals_batch(spark, tmp_path):
    from temporal_vector_database_spark.streaming.analytics import session_window_stats

    rows = _rows()
    in_dir = str(tmp_path / "sw_in")
    os.makedirs(in_dir)
    _events(spark, rows).coalesce(1).write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        session_window_stats(stream, gap="10 minutes", key_col="user_id")
        .writeStream.format("memory")
        .queryName("sw")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT * FROM sw").collect()}
    want = {
        tuple(r)
        for r in session_window_stats(
            _events(spark, rows), gap="10 minutes", key_col="user_id"
        ).collect()
    }
    assert got == want and len(want) >= 7  # every user sessions identically


def test_wave3_stream_serve_gates_equal_batch_gates(spark, sf_dir):
    """r11 wave 2/3: the series-state and edge-state serve gates are
    value-equal to their batch twins (same exactness the driver's
    oracle checks; columns differ only where documented —
    source_overlap_stream publishes the estimator half)."""
    from temporal_vector_database_spark.plans.registry import (
        q_events_acf,
        q_events_acf_stream,
        q_events_type_corr,
        q_events_type_corr_stream,
        q_neardup_pagerank,
        q_neardup_pagerank_stream,
        q_source_overlap,
        q_source_overlap_stream,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    got = canon(q_events_type_corr_stream(spark, sf_dir))
    assert got == canon(q_events_type_corr(spark, sf_dir)) and len(got) > 0
    got = canon(q_events_acf_stream(spark, sf_dir))
    assert got == canon(q_events_acf(spark, sf_dir)) and len(got) > 0
    got = canon(q_neardup_pagerank_stream(spark, sf_dir))
    assert got == canon(q_neardup_pagerank(spark, sf_dir)) and len(got) > 0
    got = canon(q_source_overlap_stream(spark, sf_dir))
    want = canon(
        q_source_overlap(spark, sf_dir).select(
            "src_a", "src_b", "n_match", "est_jaccard"
        )
    )
    assert got == want and len(got) > 0


def test_wave4_stream_serve_gates_equal_batch_gates(spark, sf_dir):
    """r11 wave 4: checksum/M4/DSIR/CMS state serves are value-equal
    to their batch twins."""
    from temporal_vector_database_spark.plans.registry import (
        q_cms_estimate_check,
        q_cms_estimate_stream,
        q_dsir_select,
        q_dsir_select_stream,
        q_events_m4,
        q_events_m4_stream,
        q_table_checksum,
        q_table_checksum_stream,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    for stream_q, batch_q in (
        (q_table_checksum_stream, q_table_checksum),
        (q_events_m4_stream, q_events_m4),
        (q_dsir_select_stream, q_dsir_select),
        (q_cms_estimate_stream, q_cms_estimate_check),
    ):
        got = canon(stream_q(spark, sf_dir))
        assert got == canon(batch_q(spark, sf_dir)) and len(got) > 0, (
            stream_q.__name__
        )


def test_wave5_stream_serve_gates_equal_batch_gates(spark, sf_dir):
    """r11 wave 5: OHLC/rollup/counter/bloom state serves are
    value-equal to their batch twins (bloom compared on the oracle's
    published columns)."""
    from temporal_vector_database_spark.plans.registry import (
        q_bloom_decontaminate,
        q_bloom_decontaminate_stream,
        q_events_counter_rate,
        q_events_counter_rate_stream,
        q_events_ohlc,
        q_events_ohlc_stream,
        q_version_rollup_report,
        q_version_rollup_report_stream,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    for stream_q, batch_q in (
        (q_events_ohlc_stream, q_events_ohlc),
        (q_version_rollup_report_stream, q_version_rollup_report),
        (q_events_counter_rate_stream, q_events_counter_rate),
    ):
        got = canon(stream_q(spark, sf_dir))
        assert got == canon(batch_q(spark, sf_dir)) and len(got) > 0, (
            stream_q.__name__
        )
    cols = ["doc_id", "n_ngrams", "n_bloom_hits", "bloom_frac",
            "is_contaminated"]
    got = canon(q_bloom_decontaminate_stream(spark, sf_dir))
    want = canon(q_bloom_decontaminate(spark, sf_dir).select(*cols))
    assert got == want and len(got) > 0


def test_scd2_stream_serve_gate_equals_batch_gate(spark, sf_dir):
    """r11: the SCD2 snapshot served from the maintained interval
    store equals the batch gate."""
    from temporal_vector_database_spark.plans.registry import (
        q_events_scd2_snapshot,
        q_events_scd2_snapshot_stream,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    got = canon(q_events_scd2_snapshot_stream(spark, sf_dir))
    assert got == canon(q_events_scd2_snapshot(spark, sf_dir)) and len(got) > 0


def test_heavy_hitters_stream_gate_equals_batch_gate(spark, sf_dir):
    """r11: the MG-state heavy-hitter serve equals the batch gate —
    both candidate supersets canonicalize through the exact-count
    threshold filter."""
    from temporal_vector_database_spark.plans.registry import (
        q_heavy_hitters_sketch,
        q_heavy_hitters_stream,
    )

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    got = canon(q_heavy_hitters_stream(spark, sf_dir))
    assert got == canon(q_heavy_hitters_sketch(spark, sf_dir)) and len(got) > 0
