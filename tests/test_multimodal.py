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
