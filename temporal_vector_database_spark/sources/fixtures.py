"""Deterministic fixture generation for the temporal-vector engine.

Derives a ``versions`` storage table (base snapshots + sparse deltas) and a
``versions_raw`` ground-truth table from the driver's ``embeddings`` parquet
(TESTDATA.md), mirroring the reference's data model (SURVEY.md §1.4) and its
integration-test scenarios (``tests/test_week2.py``):

- per-content timelines of N versions, delta-encoded with sparsity threshold
  0.01 and base-promotion interval 5 → expected base seqs {1, 6, 11}
  (reference ``tests/test_week2.py:409-434``);
- one content with a >70 %-dims change mid-stream → sparsity-promoted base
  (``storage/temporal_database.py:388-402``, ``tests/test_week2.py:86-101``);
- one content with a single base + many deltas (advisor / high-cost case,
  ``tests/test_week2.py:631-657``);
- two corrupt contents (missing sequence / dangling delta predecessor) for
  integrity validation (``core/reconstruction_service.py:322-343``).

Cross-engine exactness
----------------------
The driver compares every Spark query against a DuckDB oracle with an
order-insensitive *value hash*, so floating-point results must match
bit-for-bit. All fixture arithmetic therefore lives on a dyadic grid:

- version-1 embeddings are the driver's float32 vectors quantized to
  multiples of 2^-20;
- every injected change is a multiple of 2^-7.

Sums, differences and (pairwise) products of such values over 64 dims stay
well inside float64's 53-bit mantissa, i.e. they are EXACT — reconstruction
folds, dot products and squared norms produce identical bits in any engine
and any aggregation order. ``sqrt``/division are IEEE-correctly-rounded, so
cosine scores are bit-identical too. (This replaces the reference
simulator's per-version re-normalization, ``simulation/wikipedia.py:312``,
which would leave the grid; documented deviation, affects only test inputs,
not engine semantics.)

Fixtures are written once per scale factor to ``<repo>/fixtures/<sf>/`` and
read by BOTH engines (Spark via ``spark.read.parquet``, DuckDB via the
literal path), eliminating any generator-parity concern in the oracle gate.
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_VERSION = "v2"  # v2 (r07): + supra-threshold late-ingest family
GRID = 1.0 / (1 << 20)  # quantization grid for version-1 embeddings
STEP = 1.0 / (1 << 7)  # all injected changes are multiples of this
EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00 UTC, microseconds
DAY_US = 86_400_000_000
MINUTE_US = 60_000_000

SPARSITY_THRESHOLD = 0.01  # reference core/delta_computer.py:19
PROMO_SPARSITY = 0.7  # reference storage/temporal_database.py:31
BASE_INTERVAL = 5  # reference tests/test_week2.py:409-434
GAP_FACTOR = 2  # reference storage/temporal_database.py:407


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture_dir(sf_dir: str) -> str:
    """Fixture directory for a testdata scale-factor directory."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(repo_root(), "fixtures", sf_name)


def versions_per_content(sf_dir: str) -> int:
    # Larger timelines at bench scale; 12 versions (bases {1,6,11}) at
    # correctness scale to match the reference's golden expectations.
    return 40 if os.path.basename(os.path.normpath(sf_dir)) == "sf0.1" else 12


def _quantize(vec: np.ndarray) -> np.ndarray:
    return np.round(vec.astype(np.float64) / GRID) * GRID


def _encode_timeline(
    content_id: str,
    ts_list: list[int],
    raws: list[np.ndarray],
    interval: int,
    force_base: list[bool],
    threshold: float = SPARSITY_THRESHOLD,
    promo_sparsity: float = PROMO_SPARSITY,
    gap_factor: int = GAP_FACTOR,
) -> list[dict]:
    """Reference write-path transcription (storage/temporal_database.py:86-178).

    Deltas are computed against the RECONSTRUCTED previous version (the
    reference reloads + reconstructs seq-1 on every insert,
    ``storage/temporal_database.py:134-135``), so sub-threshold residue
    carries forward and may cross the threshold later. Promotion rules in
    reference order: forced → first → interval ``(seq-1)%I==0`` → changed-dim
    ratio strictly > promo threshold → gap since last base > ``2*I``
    (``storage/temporal_database.py:354-413``).
    """
    dim = len(raws[0])
    rows: list[dict] = []
    recon: np.ndarray | None = None
    last_base_seq = 0
    for i, raw in enumerate(raws):
        seq = i + 1
        ts = ts_list[i]
        if seq == 1 or force_base[i]:
            is_base = True
            diff = None
            changed = None
        else:
            diff = raw - recon
            changed = np.abs(diff) >= threshold  # >= : delta_computer.py:65
            ratio = float(changed.sum()) / dim
            is_base = (
                ((seq - 1) % interval == 0)  # temporal_database.py:384
                or (ratio > promo_sparsity)  # strict > : temporal_database.py:395
                or ((seq - last_base_seq) > gap_factor * interval)
            )
        if is_base:
            rows.append(
                {
                    "content_id": content_id,
                    "seq": seq,
                    "ts": ts,
                    "kind": "base",
                    "embedding": raw.tolist(),
                    "sparse_idx": None,
                    "sparse_val": None,
                    "from_seq": None,
                    "magnitude": None,
                    "n_changed": None,
                    "total_dims": dim,
                    # base id format: data_structures.py:38-39
                    "version_id": f"{content_id}_{ts}",
                }
            )
            recon = raw.copy()
            last_base_seq = seq
        else:
            idx = np.nonzero(changed)[0]
            vals = diff[idx]
            magnitude = float(math.sqrt(float((diff * diff).sum())))  # RAW diff: delta_computer.py:74
            recon = recon.copy()
            recon[idx] += vals
            rows.append(
                {
                    "content_id": content_id,
                    "seq": seq,
                    "ts": ts,
                    "kind": "delta",
                    "embedding": None,
                    "sparse_idx": idx.astype(np.int32).tolist(),
                    "sparse_val": vals.tolist(),
                    "from_seq": seq - 1,  # invariant: data_structures.py:100-101
                    "magnitude": magnitude,
                    "n_changed": int(len(idx)),
                    "total_dims": dim,
                    # delta id format: data_structures.py:103-104
                    "version_id": f"{content_id}_v{seq}",
                }
            )
    return rows


def _make_noise(rng: np.random.Generator, dim: int, kept_lo=8, kept_hi=20, sub_lo=2, sub_hi=6) -> np.ndarray:
    """Sparse change: some dims >= threshold (kept), some below (dropped)."""
    noise = np.zeros(dim, dtype=np.float64)
    n_keep = int(rng.integers(kept_lo, kept_hi + 1))
    n_sub = int(rng.integers(sub_lo, sub_hi + 1))
    dims = rng.choice(dim, size=n_keep + n_sub, replace=False)
    keep_mag = rng.integers(2, 4, size=n_keep)  # {2,3}/128 >= 0.01
    keep_sign = rng.choice(np.array([-1.0, 1.0]), size=n_keep)
    noise[dims[:n_keep]] = keep_mag * keep_sign * STEP
    sub_sign = rng.choice(np.array([-1.0, 1.0]), size=n_sub)
    noise[dims[n_keep:]] = sub_sign * STEP  # 1/128 < 0.01 → dropped
    return noise


def _gen_content_raws(
    rng: np.random.Generator, base_vec: np.ndarray, n_versions: int, big_change_at: int | None = None
) -> list[np.ndarray]:
    dim = len(base_vec)
    raws = [base_vec]
    cur = base_vec
    for k in range(2, n_versions + 1):
        if big_change_at is not None and k == big_change_at:
            # change >70% of dims by >= threshold → sparsity promotion
            noise = np.zeros(dim, dtype=np.float64)
            dims = rng.choice(dim, size=int(dim * 0.8), replace=False)
            noise[dims] = rng.integers(2, 4, size=len(dims)) * rng.choice(np.array([-1.0, 1.0]), size=len(dims)) * STEP
        else:
            noise = _make_noise(rng, dim)
        cur = cur + noise
        raws.append(cur)
    return raws


_SCHEMA_VERSIONS = pa.schema(
    [
        ("content_id", pa.string()),
        ("seq", pa.int32()),
        ("ts", pa.timestamp("us")),
        ("kind", pa.string()),
        ("embedding", pa.list_(pa.float64())),
        ("sparse_idx", pa.list_(pa.int32())),
        ("sparse_val", pa.list_(pa.float64())),
        ("from_seq", pa.int32()),
        ("magnitude", pa.float64()),
        ("n_changed", pa.int32()),
        ("total_dims", pa.int32()),
        ("version_id", pa.string()),
    ]
)

_SCHEMA_RAW = pa.schema(
    [
        ("content_id", pa.string()),
        ("seq", pa.int32()),
        ("ts", pa.timestamp("us")),
        ("embedding", pa.list_(pa.float64())),
        ("force_base", pa.bool_()),
        ("base_interval", pa.int32()),
    ]
)

_SCHEMA_QUERIES = pa.schema(
    [("query_id", pa.int32()), ("embedding", pa.list_(pa.float64())), ("k", pa.int32())]
)

_SCHEMA_PROBES = pa.schema(
    [
        ("probe_id", pa.int32()),
        ("content_id", pa.string()),
        ("t", pa.timestamp("us")),
        ("case", pa.string()),
    ]
)


def _write(path: str, rows: list[dict], schema: pa.Schema) -> None:
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    arrays = []
    for f in schema:
        if pa.types.is_timestamp(f.type):
            arrays.append(pa.array(cols[f.name], type=f.type))
        else:
            arrays.append(pa.array(cols[f.name], type=f.type))
    table = pa.Table.from_arrays(arrays, schema=schema)
    pq.write_table(table, path)


def ensure_fixtures(sf_dir: str) -> str:
    """Generate (idempotently) the fixture parquet files for one sf. Returns dir."""
    out = fixture_dir(sf_dir)
    marker = os.path.join(out, f"_DONE_{FIXTURE_VERSION}")
    if os.path.exists(marker):
        return out

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    table = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    vec_ids = table.column("vec_id").to_pylist()
    embs = table.column("embedding").to_pylist()
    n_versions = versions_per_content(sf_dir)

    version_rows: list[dict] = []
    raw_rows: list[dict] = []

    def add_content(content_id, seed, base_vec, n_ver, interval, big_change_at=None, drop_seqs=()):
        rng = np.random.default_rng(seed)
        raws = _gen_content_raws(rng, base_vec, n_ver, big_change_at=big_change_at)
        start = EPOCH_US + seed % 100_000 * MINUTE_US
        ts_list = [start + (k - 1) * DAY_US for k in range(1, n_ver + 1)]
        force = [False] * n_ver
        enc = _encode_timeline(content_id, ts_list, raws, interval, force)
        for r in enc:
            if r["seq"] in drop_seqs:
                continue  # corrupt-storage injection (integrity negatives)
            version_rows.append(r)
        for k, (ts, raw) in enumerate(zip(ts_list, raws), start=1):
            raw_rows.append(
                {
                    "content_id": content_id,
                    "seq": k,
                    "ts": ts,
                    "embedding": raw.tolist(),
                    "force_base": False,
                    "base_interval": interval,
                }
            )

    # --- regular contents: one per driver embedding row --------------------
    for vec_id, emb in zip(vec_ids, embs):
        base = _quantize(np.asarray(emb, dtype=np.float64))
        add_content(f"c{int(vec_id):05d}", 10_000 + int(vec_id), base, n_versions, BASE_INTERVAL)

    # --- special contents (reference test scenarios) ------------------------
    seed0 = _quantize(np.asarray(embs[0], dtype=np.float64))
    seed1 = _quantize(np.asarray(embs[1 % len(embs)], dtype=np.float64))
    seed2 = _quantize(np.asarray(embs[2 % len(embs)], dtype=np.float64))
    seed3 = _quantize(np.asarray(embs[3 % len(embs)], dtype=np.float64))
    # >70% dims change at seq 4 → sparsity-promoted base (test_week2.py:86-101)
    add_content("sparsejump", 777, seed0 + STEP, 8, BASE_INTERVAL, big_change_at=4)
    # single base + 11 deltas (advisor high-cost case, test_week2.py:631-657)
    add_content("longchain", 778, seed1 + STEP, 12, 100)
    # corrupt storage: missing middle seq (integrity check (a)+(b))
    add_content("corrupt1", 779, seed2 + STEP, 8, BASE_INTERVAL, drop_seqs=(4,))
    # corrupt storage: missing first base (dangling predecessor at seq 2)
    add_content("corrupt2", 780, seed3 + STEP, 6, BASE_INTERVAL, drop_seqs=(1,))

    # --- similarity queries --------------------------------------------------
    rngq = np.random.default_rng(4242)
    query_rows: list[dict] = []
    stride = max(1, len(embs) // 10)
    qid = 0
    for j in range(0, len(embs), stride):
        q = _quantize(np.asarray(embs[j], dtype=np.float64)) + _make_noise(rngq, len(embs[j]))
        query_rows.append({"query_id": qid, "embedding": q.tolist(), "k": 5})
        qid += 1
    # negated vector → exercises the sim > 0 filter (storage_engine.py:465)
    query_rows.append({"query_id": qid, "embedding": (-seed0).tolist(), "k": 5})
    # k far beyond index size → exercises the k cap (storage_engine.py:460)
    query_rows.append({"query_id": qid + 1, "embedding": seed1.tolist(), "k": 1_000_000})

    # --- supra-threshold late-ingest family (r07) ----------------------------
    # Timelines whose every changed dim moves by >= 1/64 (supra the 0.01
    # sparsity threshold): delta encode is LOSSLESS on them by
    # construction, so the out-of-order ingest roundtrip (reconstruct →
    # merge late rows → re-encode) is bit-equal to the all-at-once encode
    # (tests/test_ingest.py contract (a)). The all-at-once encode is
    # committed here by the INDEPENDENT fixture encoder and serves as the
    # ingest_late oracle's expected final state — the same cross-engine
    # gate pattern as ingest_encode vs versions.parquet. Values live on
    # the 2^-6 dyadic grid, so every sum/diff is exact float64 in any
    # engine and any order.
    late_version_rows: list[dict] = []
    late_raw_rows: list[dict] = []
    n_late = max(2, len(embs) // 25)
    dim_late = 16
    n_late_ver = 9
    for c in range(n_late):
        base = np.array(
            [((c * 7 + d) % 9 - 4) / 64.0 for d in range(dim_late)], dtype=np.float64
        )
        raws = [base]
        cur = base
        for k in range(2, n_late_ver + 1):
            noise = np.zeros(dim_late, dtype=np.float64)
            for d in range(dim_late):
                if (k + d + c) % 3 == 0:
                    noise[d] = (1 + (k + d) % 2) / 64.0
            cur = cur + noise
            raws.append(cur)
        cid = f"late{c:05d}"
        start = EPOCH_US + (200_000 + c) % 1_000_000 * MINUTE_US
        ts_list = [start + (k - 1) * DAY_US for k in range(1, n_late_ver + 1)]
        late_version_rows.extend(
            _encode_timeline(cid, ts_list, raws, BASE_INTERVAL, [False] * n_late_ver)
        )
        for k, (ts, raw) in enumerate(zip(ts_list, raws), start=1):
            late_raw_rows.append(
                {
                    "content_id": cid,
                    "seq": k,
                    "ts": ts,
                    "embedding": raw.tolist(),
                    "force_base": False,
                    "base_interval": BASE_INTERVAL,
                }
            )

    # --- as-of probes ---------------------------------------------------------
    probe_rows: list[dict] = []
    pid = 0
    for vec_id in vec_ids[:20]:
        cid = f"c{int(vec_id):05d}"
        start = EPOCH_US + (10_000 + int(vec_id)) % 100_000 * MINUTE_US
        cases = [
            (start - DAY_US, "before_first"),  # expect no version (recon_service.py:151-153)
            (start + 2 * DAY_US, "exact_seq3"),  # inclusive <= → seq 3 (data_structures.py:219,224)
            (start + 4 * DAY_US + DAY_US // 2, "between_5_and_6"),  # → seq 5
            (start + 10 * n_versions * DAY_US, "after_last"),  # → seq N
        ]
        for t, case in cases:
            probe_rows.append({"probe_id": pid, "content_id": cid, "t": t, "case": case})
            pid += 1

    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = tempfile.mkdtemp(dir=os.path.dirname(out))
    try:
        _write(os.path.join(tmp, "versions.parquet"), version_rows, _SCHEMA_VERSIONS)
        _write(os.path.join(tmp, "versions_raw.parquet"), raw_rows, _SCHEMA_RAW)
        _write(
            os.path.join(tmp, "versions_late_raw.parquet"), late_raw_rows, _SCHEMA_RAW
        )
        _write(
            os.path.join(tmp, "versions_late_full.parquet"),
            late_version_rows,
            _SCHEMA_VERSIONS,
        )
        _write(os.path.join(tmp, "queries_vec.parquet"), query_rows, _SCHEMA_QUERIES)
        _write(os.path.join(tmp, "asof_probes.parquet"), probe_rows, _SCHEMA_PROBES)
        with open(os.path.join(tmp, f"_DONE_{FIXTURE_VERSION}"), "w") as f:
            f.write("ok\n")
        if os.path.exists(out):
            shutil.rmtree(out)
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp) and tmp != out:
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def ensure_minhash_store(spark, sf_dir: str, num_hashes: int = 8, width: int = 3) -> str:
    """The dedup pipeline's production layout: a PERSISTED MinHash
    signature table over ``documents`` (idempotent build). Returns path.

    At 100 TB the signature store is maintained incrementally at ingest
    (``operators.dedup.incremental_near_duplicate_pairs`` appends each
    batch's signatures), so batch jobs like the curation funnel never
    re-shingle the corpus — they read this table and pay only the LSH
    band join. The store here is built once per sf from the fixture
    documents; bench builds it outside the clock, mirroring that layout.
    """
    out = os.path.join(fixture_dir(sf_dir), f"minhash_store_h{num_hashes}_w{width}.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        from temporal_vector_database_spark.operators.dedup import minhash_signatures

        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        minhash_signatures(docs, num_hashes=num_hashes, width=width).write.mode(
            "overwrite"
        ).parquet(out)
    return out


def bucketed_table_name(sf_dir: str) -> str:
    """Catalog name for the bucketed ``versions`` table of one sf."""
    sf = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")
    return f"tvdb_versions_{sf}_{FIXTURE_VERSION}"


def ensure_bucketed_versions(spark, sf_dir: str, buckets: int = 32):
    """The engine's production layout for ``versions``: bucketed by
    ``content_id``, sorted by ``(content_id, seq)`` (idempotent build from
    the fixture parquet; see ``sources.tables.write_versions_bucketed``).

    Every temporal operator windows/groups/joins on ``content_id`` — the
    bucketed layout lets Catalyst drop the hash exchange from those plans
    entirely (plan-verified in tests). The fixture parquet stays the
    interchange format; this is the table a deployment would actually
    serve queries from.
    """
    from temporal_vector_database_spark.sources.tables import write_versions_bucketed

    name = bucketed_table_name(sf_dir)
    if not spark.catalog.tableExists(name):
        _drop_orphan_table_location(spark, name)
        df = spark.read.parquet(os.path.join(ensure_fixtures(sf_dir), "versions.parquet"))
        write_versions_bucketed(df, name, buckets=buckets)
        # same stale-listing hazard as ensure_lsh_band_store: rebuild under
        # a fresh session must invalidate the shared file-status cache
        spark.catalog.refreshTable(name)
    return spark.table(name)


def _drop_orphan_table_location(spark, name: str) -> None:
    """A managed table's files live in spark-warehouse (persists across
    sessions) while the default in-memory catalog does not — a fresh
    session then sees tableExists()=False but the write fails with
    LOCATION_ALREADY_EXISTS. Registering the files as an external table
    would silently LOSE the bucketing metadata (and with it the
    zero-exchange plans), so the orphaned location is removed and the
    table rebuilt instead."""
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(wh.removeprefix("file:"), name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def lsh_band_store_name(sf_dir: str, num_hashes: int = 8, bands: int = 4) -> str:
    """Catalog name for the persisted LSH band store of one sf."""
    sf = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_").replace("-", "_")
    return f"tvdb_lsh_bands_{sf}_h{num_hashes}_b{bands}_{FIXTURE_VERSION}"


def ensure_lsh_band_store(spark, sf_dir: str, num_hashes: int = 8, bands: int = 4):
    """Idempotently build the persisted LSH band layout from the MinHash
    signature store (``operators.dedup.write_lsh_band_store``): band
    hashes + tiling cells precomputed, bucketed by the full verify
    grouping key, so the near-dup query plan has ZERO exchanges. Returns
    the catalog table name."""
    from temporal_vector_database_spark.operators.dedup import write_lsh_band_store

    name = lsh_band_store_name(sf_dir, num_hashes, bands)
    if not spark.catalog.tableExists(name):
        _drop_orphan_table_location(spark, name)
        sigs = spark.read.parquet(ensure_minhash_store(spark, sf_dir))
        write_lsh_band_store(sigs, name, num_hashes=num_hashes, bands=bands)
        # a rebuild under a NEW session (fresh in-memory catalog) leaves the
        # JVM-shared file-status cache pointing at the rmtree'd old part
        # files; refresh so readers list the rewritten location (the
        # test_tz FAILED_READ_FILE.FILE_NOT_EXIST ordering artifact, r12)
        spark.catalog.refreshTable(name)
    return name


def ensure_ivf_store_upserted(spark, sf_dir: str) -> str:
    """An incremental-IVF-store fixture in its post-maintenance state
    (idempotent): init over the quantized embeddings, then one upsert
    batch (every vec_id % 10 == 1 re-ingested under id + 1000000) and
    one delete batch (every vec_id % 13 == 5) left UNCOMPACTED — so
    queries over it exercise the merge-on-read path (base ∪ delta −
    tombstones). The end state is deterministic, hence rebuild-safe.
    Returns the store path."""
    from pyspark.sql import functions as F

    out = os.path.join(fixture_dir(sf_dir), "ivf_store_upserted")
    marker = os.path.join(out, "_STORE_READY")
    if os.path.exists(marker):
        return out
    from temporal_vector_database_spark.operators.ivf_store import (
        ivf_store_delete,
        ivf_store_init,
        ivf_store_upsert,
    )
    from temporal_vector_database_spark.plans.registry import _quantized_embeddings

    emb = _quantized_embeddings(spark, sf_dir)
    ivf_store_init(emb, out)
    batch = emb.where(F.col("vec_id") % 10 == 1).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    ivf_store_upsert(spark, out, batch)
    ivf_store_delete(spark, out, emb.where(F.col("vec_id") % 13 == 5).select("vec_id"))
    with open(marker, "w") as f:
        f.write("ok")
    return out


def ensure_events_zordered(spark, sf_dir: str) -> str:
    """Z-order-clustered events fixture (idempotent): rows sorted by the
    Morton interleave of (user_id, day) — see
    ``sources.tables.write_events_zordered``. Integer time column only
    (ts dropped), so reads are physical-type- and session-TZ-proof."""
    out = os.path.join(fixture_dir(sf_dir), "events_zordered")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        from temporal_vector_database_spark.sources.tables import (
            load_events,
            write_events_zordered,
        )

        ev = load_events(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value", "props", "ts_ms"
        )
        write_events_zordered(ev, out)
    return out


def ensure_mrl_index(spark, sf_dir: str, prefix_dims: int = 16) -> str:
    """Persisted Matryoshka layout fixture (idempotent): the quantized
    corpus with a physical ``prefix_emb`` column — shortlist scans read
    prefix bytes only (``operators.search.write_mrl_index``)."""
    out = os.path.join(fixture_dir(sf_dir), f"mrl_index_{prefix_dims}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        from temporal_vector_database_spark.operators.search import write_mrl_index
        from temporal_vector_database_spark.plans.registry import (
            _quantized_embeddings,
        )

        write_mrl_index(_quantized_embeddings(spark, sf_dir), out, prefix_dims)
    return out


def ensure_ivfpq_index(spark, sf_dir: str, m: int = 4) -> str:
    """Persisted IVF-PQ index fixture (idempotent): PQ codes partitioned
    by inverted list + centroid/codebook tables
    (``operators.search.write_ivfpq_index``). The corpus encode is paid
    here, once — serving never touches embedding bytes."""
    out = os.path.join(fixture_dir(sf_dir), f"ivfpq_index_{m}")
    if not os.path.exists(
        os.path.join(out, "codes", "_SUCCESS")
    ) or not os.path.exists(os.path.join(out, "codebooks", "_SUCCESS")):
        from temporal_vector_database_spark.operators.search import (
            write_ivfpq_index,
        )
        from temporal_vector_database_spark.plans.registry import (
            _quantized_embeddings,
        )

        write_ivfpq_index(_quantized_embeddings(spark, sf_dir), out, m)
    return out


def ensure_ivfpq_residual_index(spark, sf_dir: str, m: int = 4) -> str:
    """Persisted residual-encoded IVF-PQ index fixture (idempotent) —
    ``operators.search.write_ivfpq_residual_index``."""
    out = os.path.join(fixture_dir(sf_dir), f"ivfpq_res_index_{m}")
    if not os.path.exists(
        os.path.join(out, "codes", "_SUCCESS")
    ) or not os.path.exists(os.path.join(out, "codebooks", "_SUCCESS")):
        from temporal_vector_database_spark.operators.search import (
            write_ivfpq_residual_index,
        )
        from temporal_vector_database_spark.plans.registry import (
            _quantized_embeddings,
        )

        write_ivfpq_residual_index(_quantized_embeddings(spark, sf_dir), out, m)
    return out


def ensure_snapshot_export(spark, sf_dir: str) -> str:
    """Idempotently materialize the as-of snapshot at the instant
    ``max(ts) of any seq-7 row`` via :func:`operators.maintenance.
    export_snapshot` — the time-travel serving sink built once at
    deployment time; gated queries read it back and the oracle
    recomputes the same state from raw versions, cross-checking the
    whole export path (resolve → fold → write → read)."""
    out = os.path.join(fixture_dir(sf_dir), "snapshot_t7.parquet")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        from pyspark.sql import functions as F

        from temporal_vector_database_spark.operators.maintenance import (
            export_snapshot,
        )

        v = spark.read.parquet(
            os.path.join(ensure_fixtures(sf_dir), "versions.parquet")
        ).where(~F.col("content_id").startswith("corrupt"))
        t = v.where(F.col("seq") == 7).agg(F.max("ts")).first()[0]
        export_snapshot(v, t, out)
    return out
