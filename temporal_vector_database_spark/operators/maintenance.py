"""Timeline maintenance: base promotion (compaction) and retention.

The reference's advisor only REPORTS high-cost sequences
(``optimize_content_bases``, ``storage/temporal_database.py:443-494``) —
it has no operator to act on the report. These close the loop:

- ``promote_bases``: replace chosen delta rows with materialized base
  rows. EXACT by construction: the new base stores the reconstruction at
  that seq, and every downstream delta encodes the diff against exactly
  that reconstruction, so all reconstructions are bit-identical before
  and after (test-pinned). Chain costs after the new base drop.
- ``truncate_before``: retention — drop all versions with ``ts < cutoff``
  while preserving every reconstruction at-or-after the cutoff, by first
  promoting each content's as-of version at the cutoff to a base.

Both are pure DataFrame→DataFrame rewrites (no driver loops); at cluster
scale they run as one reconstruction pass + an anti-join rewrite, and the
result is written as a new table version (append-only storage model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.reconstruct import reconstruct_at


def _as_base_rows(
    versions: DataFrame,
    targets: DataFrame,
    reconstructions: DataFrame | None = None,
) -> DataFrame:
    """Materialize (content_id, target_seq) reconstructions as base rows
    carrying the original row's ts/total_dims/metadata.

    ``reconstructions``: optional precomputed (content_id, target_seq,
    embedding) rows covering exactly the reconstructable targets (e.g. a
    filtered ``reconstruct_all`` output). Callers that already paid a
    full reconstruction pass — the advisor→promote loop — supply it so
    promotion does not re-run ``reconstruct_at``'s tag+fold over the
    whole versions table a second time (guide §2.4: remove the shuffle
    outright; r12)."""
    if reconstructions is None:
        rec = reconstruct_at(versions, targets).select(
            "content_id", F.col("target_seq").alias("seq"), "embedding"
        )
    else:
        rec = reconstructions.join(
            targets.select("content_id", "target_seq"),
            ["content_id", "target_seq"],
            "left_semi",
        ).select("content_id", F.col("target_seq").alias("seq"), "embedding")
    orig = versions.join(
        targets.select("content_id", F.col("target_seq").alias("seq")),
        ["content_id", "seq"],
        "left_semi",
    )
    meta_cols = [c for c in ("metadata",) if c in versions.columns]
    return orig.select(
        "content_id", "seq", "ts", "total_dims", "version_id", *meta_cols
    ).join(rec, ["content_id", "seq"]).select(
        "content_id",
        "seq",
        "ts",
        F.lit("base").alias("kind"),
        "embedding",
        F.lit(None).cast("array<int>").alias("sparse_idx"),
        F.lit(None).cast("array<double>").alias("sparse_val"),
        F.lit(None).cast("int").alias("from_seq"),
        F.lit(None).cast("double").alias("magnitude"),
        F.lit(None).cast("int").alias("n_changed"),
        "total_dims",
        # base id format (data_structures.py:38-39): content + timestamp
        F.concat(
            F.col("content_id"),
            F.lit("_"),
            # microsecond epoch, matching the ingest base-id format (UTC session tz)
            F.unix_micros(F.col("ts").cast("timestamp")).cast("string"),
        ).alias("version_id"),
        *meta_cols,
    )


def promote_bases(
    versions: DataFrame,
    targets: DataFrame,
    reconstructions: DataFrame | None = None,
) -> DataFrame:
    """Compaction: rewrite the chosen delta sequences as base snapshots
    (e.g. feed it the advisor's recommendations). Reconstruction-
    preserving by construction.

    ``reconstructions``: see ``_as_base_rows`` — precomputed target
    embeddings, skipping the in-promotion reconstruction pass. A target
    NOT covered by ``reconstructions`` is left in place unmodified
    (ADVICE r12: it used to vanish from the compacted table — the
    anti-join removed it while no base row replaced it); the rewrite
    set is restricted to the covered targets, so the table stays
    reconstruction-complete regardless of coverage."""
    # pin both small tables: `targets` (k recommendations — often an
    # advisor plan that would otherwise re-run per reference) feeds the
    # base rewrite AND the anti-join, and `new_bases` (k rows) embeds a
    # full delta-chain reconstruction that every downstream consumer of
    # the compacted table would re-execute per reference (the
    # compaction_invariance gate scanned the versions parquet 72×
    # before this pin — r10 plan audit).
    if reconstructions is not None:
        targets = targets.join(
            reconstructions.select("content_id", "target_seq"),
            ["content_id", "target_seq"],
            "left_semi",
        )
    targets = targets.localCheckpoint()
    new_bases = _as_base_rows(versions, targets, reconstructions).localCheckpoint()
    keep = versions.join(
        targets.select("content_id", F.col("target_seq").alias("seq")),
        ["content_id", "seq"],
        "left_anti",
    )
    return keep.unionByName(new_bases, allowMissingColumns=True)


def truncate_before(versions: DataFrame, cutoff) -> DataFrame:
    """Retention: drop rows with ``ts < cutoff`` keeping all
    reconstructions at ``ts >= cutoff`` intact. Each content's governing
    version at the cutoff is promoted to a base first (if it isn't one),
    so surviving delta chains still have a base at-or-before them."""
    anchor = (
        versions.where(F.col("ts") < F.lit(cutoff))
        .groupBy("content_id")
        .agg(F.max("seq").alias("target_seq"))
    )
    # only promote anchors that are deltas (bases already self-contained)
    anchor_deltas = anchor.join(
        versions.where(F.col("kind") == "delta").select(
            "content_id", F.col("seq").alias("target_seq")
        ),
        ["content_id", "target_seq"],
        "left_semi",
    )
    promoted = promote_bases(versions, anchor_deltas)
    keep_seqs = anchor.select("content_id", F.col("target_seq").alias("_keep_seq"))
    out = promoted.join(keep_seqs, "content_id", "left").where(
        (F.col("ts") >= F.lit(cutoff)) | (F.col("seq") == F.col("_keep_seq"))
    )
    return out.drop("_keep_seq")


def retention_dryrun(versions: DataFrame, cutoff) -> DataFrame:
    """What :func:`truncate_before` WOULD do, without doing it (r08,
    beyond-reference — the report→act loop the reference's advisor only
    has half of): per content, the versions retention would drop
    (``ts < cutoff`` minus the kept anchor), the logical floats freed
    (dense bases / 2·nnz deltas — the ``storage_efficiency``
    convention), whether the anchor (the governing version at the
    cutoff) is a DELTA and so needs base promotion first, the storage
    growth that promotion costs (``total_dims − 2·n_changed``), and the
    surviving version count. A capacity planner diffs ``floats_freed``
    against ``promote_growth`` before committing to a retention run.

    Plan: one anchor aggregate + three content-keyed joins over the
    versions table — no reconstruction, no collect; same row-selection
    predicates as ``truncate_before`` so the report is exact by
    construction.

    Output: ``(content_id, anchor_seq, anchor_is_delta, n_dropped,
    floats_freed, promote_growth, n_survivors)``.
    """
    anchor = (
        versions.where(F.col("ts") < F.lit(cutoff))
        .groupBy("content_id")
        .agg(F.max("seq").alias("anchor_seq"))
    )
    ar = anchor.join(
        versions.select(
            "content_id",
            F.col("seq").alias("anchor_seq"),
            F.col("kind").alias("_akind"),
            F.col("total_dims").alias("_adims"),
            F.col("n_changed").alias("_anch"),
        ),
        ["content_id", "anchor_seq"],
    )
    floats = F.when(F.col("kind") == "base", F.col("total_dims")).otherwise(
        F.lit(2) * F.coalesce(F.col("n_changed"), F.lit(0))
    )
    dropped = (
        versions.join(anchor, "content_id")
        .where((F.col("ts") < F.lit(cutoff)) & (F.col("seq") != F.col("anchor_seq")))
        .groupBy("content_id")
        .agg(
            F.count("*").cast("long").alias("n_dropped"),
            F.sum(floats).cast("long").alias("floats_freed"),
        )
    )
    survivors = (
        versions.join(anchor, "content_id", "left")
        .where((F.col("ts") >= F.lit(cutoff)) | (F.col("seq") == F.col("anchor_seq")))
        .groupBy("content_id")
        .agg(F.count("*").cast("long").alias("n_survivors"))
    )
    return (
        versions.select("content_id")
        .distinct()
        .join(ar, "content_id", "left")
        .join(dropped, "content_id", "left")
        .join(survivors, "content_id", "left")
        .select(
            "content_id",
            "anchor_seq",
            (F.col("_akind") == "delta").alias("anchor_is_delta"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce("floats_freed", F.lit(0)).cast("long").alias("floats_freed"),
            F.when(
                F.col("_akind") == "delta",
                F.col("_adims") - F.lit(2) * F.coalesce(F.col("_anch"), F.lit(0)),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("promote_growth"),
            F.coalesce("n_survivors", F.lit(0)).cast("long").alias("n_survivors"),
        )
    )


def export_snapshot(
    versions: DataFrame, t, path: str, buckets: int = 8
) -> str:
    """Materialize the WHOLE database's as-of state at ``t`` as a
    bucket-partitioned parquet snapshot — the export/serving sink of
    the time-travel surface (r07, beyond-reference: the reference can
    only reconstruct one content at a time into memory,
    ``core/reconstruction_service.py:159-184``). A downstream consumer
    (a trainer, a serving index build) reads a plain columnar table
    with no knowledge of delta encoding, and the bucket layout gives
    it partition pruning on content lookups for free.

    One reconstruction fold (one content_id shuffle) + one partitioned
    write; buckets are a deterministic hash of content_id, so the same
    snapshot always lands in the same layout. Returns ``path``."""
    from temporal_vector_database_spark.operators.reconstruct import (
        reconstruct_asof,
    )

    contents = versions.select("content_id").distinct()
    snap = reconstruct_asof(versions, contents.withColumn("t", F.lit(t))).select(
        "content_id", "target_seq", "base_seq", "cost", "embedding"
    )
    out = snap.withColumn(
        "bucket", F.pmod(F.xxhash64("content_id"), F.lit(int(buckets))).cast("int")
    )
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)
    if _is_local_path(path):
        write_snapshot_manifest(versions.sparkSession, path, buckets=int(buckets))
    else:
        # Manifest maintenance uses local-filesystem APIs (listdir /
        # atomic os.replace); for object-store / HDFS exports the
        # parquet snapshot itself is the contract and the manifest is
        # skipped rather than failing the export (ADVICE r08).
        import warnings

        warnings.warn(
            f"export_snapshot: skipping _MANIFEST.json for non-local "
            f"path {path!r} (manifest writer is local-fs only)",
            RuntimeWarning,
            stacklevel=2,
        )
    return path


def _is_local_path(path: str) -> bool:
    """True for plain local paths and ``file:`` URIs; False for any
    other ``scheme://`` (s3a, hdfs, gs, ...) where the manifest's
    os-level listdir/replace calls cannot operate."""
    import re

    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*):", path)
    return m is None or m.group(1).lower() == "file"


def _snapshot_bucket_checksums(snap: DataFrame) -> DataFrame:
    """Per-bucket order-invariant fingerprints of a snapshot layout —
    the :func:`table_checksum` XOR primitive at BUCKET grain, so the
    streaming partition-grain refresh can update the manifest without a
    full-table rescan (only touched buckets recompute; the global
    fingerprint is the XOR of the bucket entries). The embedding is
    encoded as a comma-joined shortest-round-trip double string —
    portable to any engine formatting doubles the same way (the repo's
    dyadic-grid values always do)."""
    from temporal_vector_database_spark.operators.relational import (
        table_checksum,
    )

    enc = snap.withColumn(
        "emb_str",
        F.concat_ws(",", F.transform("embedding", lambda x: x.cast("string"))),
    )
    return table_checksum(
        enc,
        key_cols=("content_id",),
        compare_cols=("target_seq", "base_seq", "cost", "emb_str"),
        group_cols=("bucket",),
    )


def write_snapshot_manifest(
    spark, path: str, buckets: int, only_buckets: list[int] | None = None
) -> dict:
    """Write/refresh ``_MANIFEST.json`` beside a snapshot export (r07
    verdict stretch): row count + per-bucket XOR fingerprints so a
    consumer can verify integrity WITHOUT the engine. ``only_buckets``
    recomputes just those buckets' entries (partition-pruned read) and
    merges them into the existing manifest — the streaming refresh
    path; buckets with no surviving directory are dropped. Returns the
    manifest dict."""
    import json
    import os

    mpath = os.path.join(path, "_MANIFEST.json")
    entries: dict[str, dict] = {}
    if only_buckets is not None and os.path.exists(mpath):
        with open(mpath) as f:
            entries = json.load(f).get("bucket_checksums", {})
    on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(path)
        if d.startswith("bucket=")
    }
    want = sorted(on_disk if only_buckets is None else set(only_buckets))
    # drop manifest entries whose bucket directory no longer exists
    entries = {b: v for b, v in entries.items() if int(b) in on_disk}
    todo = [b for b in want if b in on_disk]
    if todo:
        snap = spark.read.parquet(path).where(
            F.col("bucket").isin([int(b) for b in todo])
        )
        for r in _snapshot_bucket_checksums(snap).collect():
            entries[str(int(r.bucket))] = {
                "n_rows": int(r.n_rows),
                "xor_hi": int(r.xor_hi),
                "xor_lo": int(r.xor_lo),
            }
    manifest = {
        "format": "tvdb-snapshot-manifest/1",
        "buckets": int(buckets),
        "n_rows": sum(e["n_rows"] for e in entries.values()),
        "bucket_checksums": dict(sorted(entries.items(), key=lambda kv: int(kv[0]))),
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, mpath)  # atomic: a torn manifest write never lands
    return manifest


def verify_snapshot(spark, path: str) -> dict:
    """Recompute the snapshot's per-bucket fingerprints and compare to
    ``_MANIFEST.json``. Returns ``{"ok": bool, "mismatched_buckets":
    [...], "manifest_rows": int, "actual_rows": int}``; raises
    FileNotFoundError if no manifest exists."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    actual = {
        str(int(r.bucket)): (int(r.n_rows), int(r.xor_hi), int(r.xor_lo))
        for r in _snapshot_bucket_checksums(spark.read.parquet(path)).collect()
    }
    want = {
        b: (e["n_rows"], e["xor_hi"], e["xor_lo"])
        for b, e in manifest["bucket_checksums"].items()
    }
    bad = sorted(
        set(k for k in actual if actual.get(k) != want.get(k))
        | set(k for k in want if actual.get(k) != want.get(k)),
        key=int,
    )
    return {
        "ok": not bad,
        "mismatched_buckets": bad,
        "manifest_rows": manifest["n_rows"],
        "actual_rows": sum(v[0] for v in actual.values()),
    }
