"""Incremental IVF store: upsert / delete / merge-on-read serving /
compaction (operators/ivf_store.py)."""

import contextlib
import io
import os

from pyspark.sql import functions as F


def _emb(i, dim=16):
    return [((i * 13 + d * 7) % 21 - 10) / 1024.0 for d in range(dim)]


def _corpus(spark, ids):
    return spark.createDataFrame(
        [(i, _emb(i)) for i in ids], ["vec_id", "embedding"]
    )


def _queries(spark):
    rows = [(j, [((j * 11 + d * 5) % 19 - 9) / 1024.0 for d in range(16)]) for j in range(4)]
    return spark.createDataFrame(rows, ["query_id", "embedding"])


def _topk_map(df):
    return {(r.query_id, r.rank): (r.vec_id, round(r.sim, 12)) for r in df.collect()}


def test_ivf_store_lifecycle_latest_wins(spark, tmp_path):
    from temporal_vector_database_spark.operators.ivf_store import (
        ivf_store_current,
        ivf_store_delete,
        ivf_store_init,
        ivf_store_upsert,
    )

    path = str(tmp_path / "store")
    base = _corpus(spark, range(200))
    ivf_store_init(base, path)

    # upsert: 5 brand-new ids + one REPLACED id (3) with a different vector
    batch = spark.createDataFrame(
        [(1000 + i, _emb(300 + i)) for i in range(5)] + [(3, _emb(777))],
        ["vec_id", "embedding"],
    )
    ivf_store_upsert(spark, path, batch)
    # delete: ids 10..14 and one of the new ones
    ivf_store_delete(spark, path, spark.createDataFrame([(i,) for i in [10, 11, 12, 13, 14, 1004]], ["vec_id"]))

    cur = {r.vid: r.emb for r in ivf_store_current(spark, path).collect()}
    want_ids = (set(range(200)) - {10, 11, 12, 13, 14}) | {1000, 1001, 1002, 1003}
    assert set(cur) == want_ids
    # replaced id serves its NEW embedding
    assert [round(x, 9) for x in cur[3]] == [round(x, 9) for x in _emb(777)]

    # resurrect: upsert id 10 again after deletion
    ivf_store_upsert(spark, path, spark.createDataFrame([(10, _emb(10))], ["vec_id", "embedding"]))
    cur2 = {r.vid for r in ivf_store_current(spark, path).collect()}
    assert 10 in cur2 and 11 not in cur2


def test_ivf_store_topk_merge_on_read_equals_compacted(spark, tmp_path):
    from temporal_vector_database_spark.operators.ivf_store import (
        ivf_store_compact,
        ivf_store_current,
        ivf_store_delete,
        ivf_store_init,
        ivf_store_topk,
        ivf_store_upsert,
    )

    path = str(tmp_path / "store")
    ivf_store_init(_corpus(spark, range(200)), path)
    ivf_store_upsert(
        spark, path,
        spark.createDataFrame([(500 + i, _emb(i * 3 + 1)) for i in range(10)], ["vec_id", "embedding"]),
    )
    ivf_store_delete(spark, path, spark.createDataFrame([(i,) for i in range(0, 40, 2)], ["vec_id"]))
    q = _queries(spark)

    before = _topk_map(ivf_store_topk(spark, path, q, k=5, nprobe=2))
    pre_rows = sorted((r.vid, r.centroid_id) for r in ivf_store_current(spark, path).collect())

    ivf_store_compact(spark, path)
    # logs cleared, merged state identical
    assert not os.path.isdir(os.path.join(path, "delta"))
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    post_rows = sorted((r.vid, r.centroid_id) for r in ivf_store_current(spark, path).collect())
    assert post_rows == pre_rows
    after = _topk_map(ivf_store_topk(spark, path, q, k=5, nprobe=2))
    assert after == before and len(after) > 0


def test_ivf_store_topk_reduces_to_persisted_when_log_empty(spark, tmp_path):
    from temporal_vector_database_spark.operators.ivf_store import (
        ivf_store_init,
        ivf_store_topk,
    )
    from temporal_vector_database_spark.operators.search import ivf_topk_persisted

    path = str(tmp_path / "store")
    ivf_store_init(_corpus(spark, range(200)), path)
    q = _queries(spark)
    got = ivf_store_topk(spark, path, q, k=5, nprobe=2)
    want = ivf_topk_persisted(spark, path, q, k=5, nprobe=2)
    assert _topk_map(got) == _topk_map(want) and len(_topk_map(want)) > 0

    # serving still prunes the lists scan to the probed partitions
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    pf = [ln for ln in buf.getvalue().splitlines() if "PartitionFilters" in ln]
    assert any("centroid_id" in ln and " IN " in ln for ln in pf)


def test_ivf_store_compact_drops_emptied_partition(spark, tmp_path):
    from temporal_vector_database_spark.operators.ivf_store import (
        ivf_store_compact,
        ivf_store_current,
        ivf_store_delete,
        ivf_store_init,
    )

    path = str(tmp_path / "store")
    base = _corpus(spark, range(200))
    ivf_store_init(base, path)
    # find one inverted list and tombstone EVERY vid in it
    lists = spark.read.parquet(os.path.join(path, "lists"))
    cid = lists.groupBy("centroid_id").count().orderBy("count", "centroid_id").first()["centroid_id"]
    doomed = lists.where(F.col("centroid_id") == cid).select(
        F.col("vid").alias("vec_id")
    )
    n_doomed = doomed.count()
    assert n_doomed > 0
    ivf_store_delete(spark, path, doomed)
    ivf_store_compact(spark, path)
    assert not os.path.isdir(os.path.join(path, "lists", f"centroid_id={cid}"))
    cur = ivf_store_current(spark, path)
    assert cur.count() == 200 - n_doomed
    assert cur.where(F.col("centroid_id") == cid).count() == 0


def _state(spark, path):
    from temporal_vector_database_spark.operators.ivf_store import ivf_store_current

    return sorted(
        (r.vid, r.centroid_id, tuple(round(x, 9) for x in r.emb))
        for r in ivf_store_current(spark, path).collect()
    )


def test_streaming_ivf_ingest_stream_equals_batch_and_replay_idempotent(spark, tmp_path):
    from temporal_vector_database_spark.operators.ivf_store import (
        ivf_store_delete,
        ivf_store_init,
        ivf_store_upsert,
    )
    from temporal_vector_database_spark.streaming.ivf_ingest import (
        process_ivf_ingest_batch,
    )

    base = _corpus(spark, range(100))

    # streamed store: 3 micro-batches of mixed maintenance ops
    s_path = str(tmp_path / "streamed")
    ivf_store_init(base, s_path)
    batches = [
        # b0: insert 4 new vectors
        [(200 + i, _emb(50 + i), "upsert") for i in range(4)],
        # b1: delete two base ids, replace one base id in the same batch
        [(5, None, "delete"), (6, None, "delete"), (7, _emb(400), "upsert")],
        # b2: delete a b0 insert, resurrect a b1 delete
        [(201, None, "delete"), (5, _emb(5), "upsert")],
    ]

    def as_df(rows):
        return spark.createDataFrame(
            [(v, e if e is not None else [0.0] * 16, op) for v, e, op in rows],
            "vec_id long, embedding array<double>, op string",
        )

    for bid, rows in enumerate(batches):
        process_ivf_ingest_batch(as_df(rows), bid, s_path)

    # batch-built store applying the same logical ops
    b_path = str(tmp_path / "batch")
    ivf_store_init(base, b_path)
    ivf_store_upsert(spark, b_path, as_df(batches[0]).select("vec_id", "embedding"))
    ivf_store_delete(spark, b_path, spark.createDataFrame([(5,), (6,)], ["vec_id"]))
    ivf_store_upsert(spark, b_path, as_df([batches[1][2]]).select("vec_id", "embedding"))
    ivf_store_delete(spark, b_path, spark.createDataFrame([(201,)], ["vec_id"]))
    ivf_store_upsert(spark, b_path, as_df([batches[2][1]]).select("vec_id", "embedding"))

    want_ids = (set(range(100)) - {6}) | {200, 202, 203}
    got = _state(spark, s_path)
    assert {v for v, _, _ in got} == want_ids
    assert got == _state(spark, b_path)

    # at-least-once replay: re-apply batch 1 (same batch_id) — state unchanged
    before = got
    process_ivf_ingest_batch(as_df(batches[1]), 1, s_path)
    assert _state(spark, s_path) == before
