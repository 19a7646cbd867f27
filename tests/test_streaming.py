"""Streaming ingest must produce byte-identical output to the batch
encoder, including state carried ACROSS micro-batch boundaries (a delta in
run 2 is computed against the reconstruction of run 1's last version)."""

import os

import pytest
from pyspark.sql import functions as F

from temporal_vector_database_spark.config import FIXTURE_CONFIG
from temporal_vector_database_spark.operators.ingest import ingest
from temporal_vector_database_spark.streaming.ingest import run_ingest_stream


def _raw_rows(spark, n_contents=3, n_versions=12):
    import numpy as np

    rows = []
    for c in range(n_contents):
        rng = np.random.default_rng(100 + c)
        vec = np.round(rng.normal(size=16) * 128) / 128
        for k in range(1, n_versions + 1):
            if k > 1:
                noise = np.zeros(16)
                dims = rng.choice(16, size=3, replace=False)
                noise[dims] = rng.integers(2, 4, size=3) / 128
                vec = vec + noise
            rows.append(
                (
                    f"s{c}",
                    f"2025-01-{k:02d}T00:00:00",
                    [float(x) for x in vec],
                    False,
                    5,
                )
            )
    df = spark.createDataFrame(
        rows, ["content_id", "ts_s", "embedding", "force_base", "base_interval"]
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    return df.select(
        "content_id",
        "ts",
        "embedding",
        "force_base",
        F.col("base_interval").cast("int").alias("base_interval"),
    )


def _canon(df):
    rows = df.select(
        "content_id",
        "seq",
        "kind",
        "from_seq",
        "magnitude",
        "n_changed",
        F.aggregate(F.coalesce("embedding", F.array()), F.lit(0.0), lambda a, x: a + x).alias("esum"),
        F.aggregate(F.coalesce("sparse_val", F.array()), F.lit(0.0), lambda a, x: a + x).alias("vsum"),
    ).collect()
    return sorted(tuple(r) for r in rows)


def test_stream_matches_batch_across_microbatches(spark, tmp_path):
    from pyspark.sql import Window

    raw = _raw_rows(spark)
    # split the timeline mid-stream: seqs 1-6 arrive in run 1, 7-12 in run 2
    w_rank = F.row_number().over(Window.partitionBy("content_id").orderBy("ts"))
    ranked = raw.withColumn("rk", w_rank)
    in_dir = os.path.join(tmp_path, "in")
    out_dir = os.path.join(tmp_path, "out")
    ckpt = os.path.join(tmp_path, "ckpt")
    os.makedirs(in_dir)

    ranked.where(F.col("rk") <= 6).drop("rk").coalesce(1).write.mode("append").parquet(in_dir)
    run_ingest_stream(spark, in_dir, out_dir, ckpt, FIXTURE_CONFIG)
    ranked.where(F.col("rk") > 6).drop("rk").coalesce(1).write.mode("append").parquet(in_dir)
    run_ingest_stream(spark, in_dir, out_dir, ckpt, FIXTURE_CONFIG)

    streamed = spark.read.parquet(out_dir)
    batch = ingest(raw, FIXTURE_CONFIG)
    assert _canon(streamed) == _canon(batch)
    # sanity: promotion placement preserved across the batch boundary
    bases = sorted(
        r.seq for r in streamed.where((F.col("content_id") == "s0") & (F.col("kind") == "base")).collect()
    )
    assert bases == [1, 6, 11]


def test_streaming_search_equals_batch_ivf(spark, tmp_path):
    """Queries streamed in micro-batches against the persisted IVF index
    must produce, in union, exactly the one-shot ivf_topk results; a
    replayed batch must not duplicate rows."""
    from temporal_vector_database_spark.operators.search import ivf_topk, write_ivf_index
    from temporal_vector_database_spark.plans.registry import _quantized_embeddings
    from temporal_vector_database_spark.streaming.search import (
        process_search_batch,
        read_search_results,
        run_search_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    emb = _quantized_embeddings(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 17 == 0).select(
        F.col("vec_id").cast("int").alias("query_id"), "embedding"
    )
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, idx)

    # stream the queries file-by-file (two files -> two micro-batches)
    src = str(tmp_path / "qsrc")
    queries.where(F.col("query_id") < 25).coalesce(1).write.mode("append").parquet(src)
    queries.where(F.col("query_id") >= 25).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(queries.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "res")
    run_search_stream(stream, idx, out, str(tmp_path / "ckpt"), k=5, nprobe=2)

    # replay one batch manually: must overwrite, not append
    replay = queries.where(F.col("query_id") < 25)
    process_search_batch(replay, 0, idx, out, k=5, nprobe=2)

    got = {
        (r.query_id, r.rank, r.vec_id, r.sim)
        for r in read_search_results(spark, out).collect()
    }
    got_n = read_search_results(spark, out).count()
    want = {
        (r.query_id, r.rank, r.vec_id, r.sim)
        for r in ivf_topk(emb, queries, k=5, nprobe=2).collect()
    }
    assert got == want and len(want) > 0
    assert got_n == len(want)  # no duplicate rows after replay


def test_ooo_ingest_batches_converge_to_batch_ingest(spark, tmp_path):
    """Out-of-order streaming ingest: interleaved and late arrivals over
    3 micro-batches produce the exact chains of a single all-at-once
    batch ingest (supra-threshold timeline → lossless re-encode), and a
    replayed batch is a byte-level no-op."""
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from temporal_vector_database_spark.config import FIXTURE_CONFIG
    from temporal_vector_database_spark.operators.ingest import ingest
    from temporal_vector_database_spark.streaming.ingest import (
        process_ooo_ingest_batch,
    )

    t0 = datetime(2025, 6, 1)
    dim = 8
    rows = []
    for c in range(2):
        vec = [((c * 7 + d) % 9 - 4) / 64.0 for d in range(dim)]
        for k in range(1, 10):
            if k > 1:
                for d in range(dim):
                    if (k + d + c) % 3 == 0:
                        vec[d] += (1 + (k + d) % 2) / 64.0
            rows.append((f"sc{c}", t0 + timedelta(days=k), list(vec), k))
    raw = spark.createDataFrame(
        rows, "content_id string, ts timestamp, embedding array<double>, rk int"
    )
    store = str(tmp_path / "store")
    # b0: ranks 1-2 and 5 (gap!), b1: the LATE ranks 3-4 + new rank 6,
    # b2: ranks 7-9 in order + a redelivery of rank 5
    b0 = raw.where(F.col("rk").isin(1, 2, 5))
    b1 = raw.where(F.col("rk").isin(3, 4, 6))
    b2 = raw.where(F.col("rk").isin(5, 7, 8, 9))
    for bid, b in enumerate([b0, b1, b2]):
        process_ooo_ingest_batch(b.drop("rk"), bid, store, FIXTURE_CONFIG)

    def canon(df):
        return sorted(
            (
                r.content_id, r.seq, r.kind, r.from_seq, r.n_changed, r.magnitude,
                tuple(r.embedding or []), tuple(r.sparse_idx or []),
                tuple(r.sparse_val or []), r.version_id,
            )
            for r in df.collect()
        )

    got = spark.read.option("basePath", store).parquet(store)
    want = ingest(raw.drop("rk"), FIXTURE_CONFIG)
    assert canon(got) == canon(want) and got.count() == 18

    # replay of batch 1: exact redeliveries only -> store unchanged
    before = canon(spark.read.option("basePath", store).parquet(store))
    process_ooo_ingest_batch(b1.drop("rk"), 1, store, FIXTURE_CONFIG)
    assert canon(spark.read.option("basePath", store).parquet(store)) == before


def test_scd2_stream_equals_batch_and_replay_noop(spark, tmp_path):
    """Streaming SCD2 maintenance: updates over 3 micro-batches — with a
    LATE row that must resurrect a previously-folded state change — end
    in a store equal to the one-shot batch scd2_intervals over all
    updates; replaying a batch leaves the store row-identical."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.temporal import scd2_intervals
    from temporal_vector_database_spark.streaming.scd2 import (
        process_scd2_batch,
        read_scd2_store,
    )

    rows = [
        # key 1: a@10, a@30 (folds into a@10 until the late b@20 arrives)
        (1, 1, 10, "a"), (1, 3, 30, "a"), (1, 5, 50, "c"),
        # key 2: independent churn
        (2, 2, 10, "x"), (2, 4, 40, "y"),
        # key 3: appears only in the last batch
        (3, 6, 60, "z"),
    ]
    late = [(1, 7, 20, "b")]  # resurrects a@30 as a real change
    df = spark.createDataFrame(
        rows + late, "user_id long, event_id long, ts_ms long, event_type string"
    )
    store = str(tmp_path / "scd2")
    b0 = df.where(F.col("event_id").isin(1, 2, 3))
    b1 = df.where(F.col("event_id").isin(4, 5, 7))  # 7 is LATE for key 1
    b2 = df.where(F.col("event_id").isin(6, 5))  # 5 is a redelivery
    kw = dict(
        key_col="user_id", time_col="ts_ms", attr_cols=("event_type",),
        tiebreak_cols=("event_id",), n_buckets=4,
    )
    for bid, b in enumerate([b0, b1, b2]):
        process_scd2_batch(b, bid, store, **kw)

    def canon(d):
        return sorted(
            ((r.user_id, r.valid_from, r.valid_to, r.event_type) for r in d.collect()),
            key=lambda x: (x[0], x[1], x[2] is None, x[2] or 0),
        )

    want = scd2_intervals(
        df, key_cols=("user_id",), time_col="ts_ms",
        attr_cols=("event_type",), tiebreak_cols=("event_id",),
    )
    got = read_scd2_store(spark, store)
    assert canon(got) == canon(want)
    # the late row really did resurrect the folded change
    assert (1, 30, 50, "a") in canon(got)

    # replay batch 1 → no-op
    process_scd2_batch(b1, 1, store, **kw)
    assert canon(read_scd2_store(spark, store)) == canon(want)


def test_replay_guard_raises_on_checkpoint_regression(spark, tmp_path):
    """ADVICE r05: a batch id BELOW the committed state head means the
    stream's checkpoint was deleted/recreated while the state dir
    persisted (ids restart at 0 and every batch would silently no-op
    forever) — the guard must raise, not drop data."""
    import pytest as _pytest

    from temporal_vector_database_spark.streaming.m4 import process_m4_batch

    df = spark.createDataFrame(
        [("a", 1, 10, 5.0), ("a", 2, 150, 3.0)],
        "k string, event_id long, ts_ms long, v double",
    )
    state = str(tmp_path / "m4_state")
    kw = dict(time_col="ts_ms", key_cols=("k",), value_col="v",
              bucket_ms=100, tiebreak_cols=("event_id",))
    process_m4_batch(df.where(F.col("event_id") == 1), 0, state, **kw)
    process_m4_batch(df.where(F.col("event_id") == 2), 1, state, **kw)
    # head redelivery: fine
    process_m4_batch(df.where(F.col("event_id") == 2), 1, state, **kw)
    # regression below head: fresh-checkpoint signature -> raise
    with _pytest.raises(RuntimeError, match="checkpoint"):
        process_m4_batch(df.where(F.col("event_id") == 1), 0, state, **kw)


def test_snapshot_bucket_refresh_incremental_and_idempotent(spark, tmp_path):
    """Streaming snapshot maintenance: a batch touching one content
    rewrites ONLY that content's bucket (untouched bucket files are
    byte-identical on disk), the refreshed table equals the full
    recompute, and redelivery is a no-op by value."""
    import os
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from temporal_vector_database_spark.config import FIXTURE_CONFIG
    from temporal_vector_database_spark.operators.ingest import ingest
    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_latest,
    )
    from temporal_vector_database_spark.streaming.snapshot import (
        _bucket,
        process_snapshot_batch,
        refresh_snapshot_buckets,
    )

    t0 = datetime(2025, 3, 1)
    dim = 8

    def raw_rows(cids, n, t_off=0):
        rows = []
        for ci, c in enumerate(cids):
            vec = [((ci * 5 + d) % 9 - 4) / 64.0 for d in range(dim)]
            for k in range(1, n + 1):
                vec = [x + ((k + d + ci) % 3 == 0) * (1 / 64.0) for d, x in enumerate(vec)]
                rows.append((c, t0 + timedelta(days=t_off + k), list(vec)))
        return spark.createDataFrame(
            rows, "content_id string, ts timestamp, embedding array<double>"
        )

    cids = [f"s{i}" for i in range(8)]
    vpath = str(tmp_path / "versions")
    spath = str(tmp_path / "snap")
    v1 = ingest(raw_rows(cids, 4), FIXTURE_CONFIG)
    v1.write.mode("overwrite").parquet(vpath)

    # initial full materialization
    all_contents = spark.read.parquet(vpath).select("content_id").distinct()
    refresh_snapshot_buckets(spark.read.parquet(vpath), all_contents, spath)

    def canon(df):
        return sorted(
            (r.content_id, r.target_seq, r.base_seq, r.cost, tuple(r.embedding))
            for r in df.select(
                "content_id", "target_seq", "base_seq", "cost", "embedding"
            ).collect()
        )

    assert canon(spark.read.parquet(spath)) == canon(
        reconstruct_latest(spark.read.parquet(vpath))
    )

    # append new versions for ONE content; note untouched buckets' files
    touched = cids[0]
    tb = spark.range(1).select(_bucket(F.lit(touched))).first()[0]
    untouched_files = {}
    for d in os.listdir(spath):
        if d.startswith("bucket=") and d != f"bucket={tb}":
            p = os.path.join(spath, d)
            untouched_files[d] = {
                f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
            }
    from temporal_vector_database_spark.operators.ingest import append_versions

    newv = append_versions(
        spark.read.parquet(vpath), raw_rows([touched], 2, t_off=10), FIXTURE_CONFIG
    )
    newv.write.mode("append").parquet(vpath)
    batch = newv.select("content_id").distinct()
    process_snapshot_batch(batch, 1, vpath, spath)

    assert canon(spark.read.parquet(spath)) == canon(
        reconstruct_latest(spark.read.parquet(vpath))
    )
    for d, files in untouched_files.items():
        p = os.path.join(spath, d)
        assert {
            f: os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
        } == files, f"untouched {d} was rewritten"

    # redelivery: same batch again -> same values
    before = canon(spark.read.parquet(spath))
    process_snapshot_batch(batch, 1, vpath, spath)
    assert canon(spark.read.parquet(spath)) == before


def test_snapshot_refresh_honors_bucket_count_and_deletes_emptied(
    spark, tmp_path
):
    """ADVICE r07 regressions: (1) a snapshot exported with buckets!=8
    must be maintained with the SAME modulus — the old hard-coded
    SNAPSHOT_BUCKETS=8 bucketed touched rows mod 8, overwriting wrong
    partitions and stranding stale rows in buckets >= 8; (2) a touched
    bucket whose every content was deleted upstream must have its stale
    bucket= directory removed, since dynamic partition overwrite only
    rewrites partitions present in the output."""
    import os
    from datetime import datetime, timedelta

    from pyspark.sql import functions as F

    from temporal_vector_database_spark.config import FIXTURE_CONFIG
    from temporal_vector_database_spark.operators.ingest import ingest
    from temporal_vector_database_spark.operators.maintenance import (
        export_snapshot,
    )
    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_latest,
    )
    from temporal_vector_database_spark.streaming.snapshot import (
        _bucket,
        refresh_snapshot_buckets,
    )

    t0 = datetime(2025, 3, 1)
    dim = 8
    rows = []
    cids = [f"nb{i}" for i in range(12)]
    for ci, c in enumerate(cids):
        vec = [((ci * 3 + d) % 9 - 4) / 64.0 for d in range(dim)]
        for k in range(1, 4):
            vec = [
                x + ((k + d + ci) % 3 == 0) * (1 / 64.0)
                for d, x in enumerate(vec)
            ]
            rows.append((c, t0 + timedelta(days=k), list(vec)))
    raw = spark.createDataFrame(
        rows, "content_id string, ts timestamp, embedding array<double>"
    )
    versions = ingest(raw, FIXTURE_CONFIG)
    vpath = str(tmp_path / "versions")
    versions.write.mode("overwrite").parquet(vpath)
    versions = spark.read.parquet(vpath)

    # export at a NON-default bucket count, then refresh every content
    # through the maintenance path with the same count
    B = 16
    spath = str(tmp_path / "snap16")
    export_snapshot(versions, t0 + timedelta(days=30), spath, buckets=B)
    all_contents = versions.select("content_id").distinct()
    refresh_snapshot_buckets(versions, all_contents, spath, buckets=B)

    def canon(df):
        return sorted(
            (r.content_id, r.target_seq, tuple(r.embedding))
            for r in df.select("content_id", "target_seq", "embedding").collect()
        )

    # no duplicates, no strays: the refreshed table equals the latest
    # reconstruction exactly, and on-disk bucket dirs match the B-modulus
    assert canon(spark.read.parquet(spath)) == canon(
        reconstruct_latest(versions)
    )
    want_buckets = {
        r[0]
        for r in versions.select(
            _bucket(F.col("content_id"), B)
        ).distinct().collect()
    }
    have_dirs = {
        int(d.split("=")[1])
        for d in os.listdir(spath)
        if d.startswith("bucket=")
    }
    assert have_dirs == want_buckets and max(have_dirs) >= 8

    # (2) delete every content in one bucket upstream -> its directory
    # must disappear from the snapshot after a refresh touching it
    victim_bucket = sorted(want_buckets)[0]
    dead = versions.where(
        _bucket(F.col("content_id"), B) == victim_bucket
    ).select("content_id").distinct()
    survivors = versions.join(dead, "content_id", "left_anti")
    vpath2 = str(tmp_path / "versions_after_delete")
    survivors.write.mode("overwrite").parquet(vpath2)
    refresh_snapshot_buckets(
        spark.read.parquet(vpath2), dead, spath, buckets=B
    )
    assert not os.path.exists(
        os.path.join(spath, f"bucket={victim_bucket}")
    )
    assert canon(spark.read.parquet(spath)) == canon(
        reconstruct_latest(spark.read.parquet(vpath2))
    )

    # r08 manifest (verdict stretch): export + every refresh keep
    # _MANIFEST.json fresh at partition grain; verify_snapshot
    # recomputes and agrees; the deleted bucket's entry is gone; a
    # tampered entry is caught.
    import json

    from temporal_vector_database_spark.operators.maintenance import (
        verify_snapshot,
    )

    mpath = os.path.join(spath, "_MANIFEST.json")
    manifest = json.load(open(mpath))
    assert str(victim_bucket) not in manifest["bucket_checksums"]
    assert manifest["buckets"] == B
    assert manifest["n_rows"] == spark.read.parquet(spath).count()
    res = verify_snapshot(spark, spath)
    assert res["ok"] and res["manifest_rows"] == res["actual_rows"]

    tampered = dict(manifest)
    some = next(iter(tampered["bucket_checksums"]))
    tampered["bucket_checksums"][some]["xor_hi"] ^= 1
    with open(mpath, "w") as f:
        json.dump(tampered, f)
    bad = verify_snapshot(spark, spath)
    assert not bad["ok"] and bad["mismatched_buckets"] == [some]


def test_source_sig_stream_equals_batch_and_replay_idempotent(spark, tmp_path, sf_dir):
    """Streaming source-signature maintenance: folding the corpus in 3
    micro-batches produces estimates identical to the batch
    source_overlap estimator half; head redelivery is a no-op; a torn
    (uncommitted) state write is invisible to readers and superseded by
    the next fold (ADVICE r07: the old in-place overwrite lost all
    state on a crash mid-write); a below-head batch id raises (the
    shared checkpoint-regression guard)."""
    from pyspark.sql import functions as F

    from temporal_vector_database_spark.operators.dedup import source_overlap
    from temporal_vector_database_spark.streaming.sourcesig import (
        process_source_sig_batch,
        read_source_overlap_estimates,
    )

    docs = spark.read.parquet(sf_dir + "/documents.parquet").where(
        F.col("doc_id") % 5 == 0
    )
    state = str(tmp_path / "srcsig")
    batches = [docs.where(F.col("doc_id") % 3 == r) for r in range(3)]
    for bid, b in enumerate(batches):
        process_source_sig_batch(b, bid, state)

    def canon(df):
        return sorted(
            (r.src_a, r.src_b, r.n_match, r.est_jaccard) for r in df.collect()
        )

    served = canon(read_source_overlap_estimates(spark, state))
    batch = canon(
        source_overlap(docs).select("src_a", "src_b", "n_match", "est_jaccard")
    )
    assert served == batch and len(served) > 0

    # head redelivery: skipped by the replay guard -> unchanged by value
    process_source_sig_batch(batches[2], 2, state)
    assert canon(read_source_overlap_estimates(spark, state)) == served

    # crash atomicity: a torn write is an uncommitted v= dir — readers
    # ignore it and the next batch supersedes it
    import os as _os

    torn = _os.path.join(state, "v=3")
    _os.makedirs(torn, exist_ok=True)  # no _SUCCESS inside
    assert canon(read_source_overlap_estimates(spark, state)) == served

    # foreign entry with a non-integer v= suffix: skipped, not fatal
    # (ADVICE r10) — even one carrying a _SUCCESS marker
    foreign = _os.path.join(state, "v=tmp-leftover")
    _os.makedirs(foreign, exist_ok=True)
    open(_os.path.join(foreign, "_SUCCESS"), "w").close()
    assert canon(read_source_overlap_estimates(spark, state)) == served
    import shutil as _shutil

    _shutil.rmtree(foreign)  # keep the version-pruning assert below exact
    # next fold (rows already absorbed) writes a committed v=3 over it
    process_source_sig_batch(batches[0].limit(1), 3, state)
    assert canon(read_source_overlap_estimates(spark, state)) == served

    # below-head batch id: checkpoint/state identity mismatch -> raise
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="checkpoint"):
        process_source_sig_batch(batches[1], 1, state)

    # superseded-version pruning (ADVICE r08): a long-running stream
    # keeps at most {read head, new version} — not one dir per batch
    vdirs = [d for d in _os.listdir(state) if d.startswith("v=")]
    assert len(vdirs) <= 2, vdirs
