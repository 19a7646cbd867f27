"""Multimodal payload plumbing: binary columns, Arrow-batched decode,
frame sampling, pluggable decoder."""

import pytest
from pyspark.sql import functions as F

from temporal_vector_database_spark.operators.multimodal import (
    decode_image,
    decode_payload,
    payload_metadata,
    sample_frames,
    with_payload,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "spark multimodal payload"), (2, "x")],
        ["doc_id", "text"],
    )


def test_payload_metadata_matches_bytes(docs):
    rows = {r.doc_id: r for r in payload_metadata(docs).collect()}
    assert rows[0].byte_len == len("hello world")
    import hashlib

    assert rows[0].checksum == hashlib.md5(b"hello world").hexdigest()
    assert rows[0].modality == "image"


def test_decode_is_deterministic_and_batched(docs):
    d1 = {r.doc_id: r for r in decode_payload(with_payload(docs)).collect()}
    d2 = {r.doc_id: r for r in decode_payload(with_payload(docs)).collect()}
    assert d1.keys() == d2.keys()
    for k in d1:
        assert d1[k] == d2[k]
        assert d1[k].width % 16 == 0 and 16 <= d1[k].width <= 1024
        assert 1 <= d1[k].channels <= 4
        assert 1 <= d1[k].n_frames <= 16


def test_custom_decoder_plugs_in(docs):
    def decoder(payload: bytes):
        return ("deadbeef", len(payload), 1, 2, 3, 4)

    rows = decode_payload(with_payload(docs), decoder=decoder).collect()
    assert all(r.checksum == "deadbeef" and r.n_frames == 4 for r in rows)


def test_decode_image_is_documented_stub(docs):
    with pytest.raises(NotImplementedError):
        decode_image(with_payload(docs))


def test_sample_frames_every_k(docs):
    dec = decode_payload(with_payload(docs))
    frames = sample_frames(dec, every_k=2).collect()
    assert all(r.frame_id % 2 == 0 for r in frames)
    n = {r.doc_id: r.n_frames for r in dec.collect()}
    got = {}
    for r in frames:
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
    for doc_id, nf in n.items():
        assert got[doc_id] == (nf + 1) // 2


def test_resize_plan_dims(docs):
    from temporal_vector_database_spark.operators.multimodal import (
        decode_payload,
        resize_plan,
        with_payload,
    )

    plan = resize_plan(decode_payload(with_payload(docs)), max_w=256, max_h=256).collect()
    assert len(plan) > 0
    for r in plan:
        assert 1 <= r.out_w <= 256 and 1 <= r.out_h <= 256
        if r.width <= 256 and r.height <= 256:
            assert (r.out_w, r.out_h) == (r.width, r.height)
        else:
            # long edge fits exactly; aspect preserved to integer floor
            assert max(r.out_w, r.out_h) == 256
            assert r.out_w == r.width * r.out_h // r.height or r.out_h == r.height * r.out_w // r.width


def test_payload_features_feed_near_dup(docs, spark):
    """The multimodal → dedup bridge: extracted feature vectors are a
    valid embedding input for the ANN/near-dup surface."""
    from temporal_vector_database_spark.operators.dedup import embedding_near_duplicates
    from temporal_vector_database_spark.operators.multimodal import (
        payload_features,
        with_payload,
    )

    feats = payload_features(with_payload(docs))
    row = feats.first()
    assert len(row.embedding) == 8 and all(0.0 <= v <= 1.0 for v in row.embedding)
    # duplicate every payload under a shifted id: every doc must pair up
    n = docs.count()
    from pyspark.sql import functions as F

    dup = feats.union(feats.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    pairs = embedding_near_duplicates(
        dup, id_col="doc_id", emb_col="embedding", bands=2, dims_per_band=4, min_cosine=0.99
    )
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    exact_dups = {(r.doc_id, r.doc_id + 1_000_000) for r in feats.collect()}
    assert exact_dups <= got  # identical vectors always collide and verify
