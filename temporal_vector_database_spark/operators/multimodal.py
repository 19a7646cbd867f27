"""Multimodal column plumbing (beyond-reference, BASELINE.json north star).

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, exactly as a 100 TB training-data pipeline would: the bytes stay
opaque to Spark (no JVM deserialization), metadata/filter/sample run as
column expressions, and per-item decode runs Arrow-batched in
``mapInPandas`` so Python touches each payload once per batch.

The real decoders (PIL / libav / torchaudio) are NOT installed in this
environment, so ``decode_payload`` is a clearly-marked STUB: pass
``decoder=`` to plug a real one in; the default deterministic fake derives
plausible (width, height, channels, n_frames) from the payload's md5 — the
Spark-side plumbing (schema, batching, partitioning, UDF signature) is real
and oracle-tested, only the pixel math is fake.

Scale posture: payload columns dominate row size → keep them out of
shuffles (derive metadata first, shuffle the slim metadata, join back by
id only when bytes are needed); ``spark.sql.files.maxPartitionBytes``
bounds scan partitions; mapInPandas batches amortize Python crossing.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata for an opaque payload column
PAYLOAD_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    (Fixture stand-in: the driver tables carry no real media, so the
    payload is the utf-8 bytes of ``text`` — byte-identical in any engine,
    which is what the oracle needs. Real pipelines read the bytes from
    ``spark.read.format('binaryFile')`` or a parquet ``binary`` column.)
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.octet_length(payload).cast("int").alias("byte_len"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def payload_metadata(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flat payload metadata — pure JVM column expressions, no Python."""
    p = with_payload(docs, text_col)
    return p.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.byte_len").alias("byte_len"),
        F.col("meta.checksum").alias("checksum"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int, int, int, int]:
    """Deterministic fake decoder: md5-derived dimensions.

    STUB for a real image/audio decoder (not installed here); the hex-digit
    math is mirrored in the DuckDB oracle so the whole mapInPandas path is
    value-checked end-to-end.
    """
    h = hashlib.md5(payload).hexdigest()
    width = 16 * (1 + int(h[0:2], 16) % 64)
    height = 16 * (1 + int(h[2:4], 16) % 64)
    channels = 1 + int(h[4], 16) % 4
    n_frames = 1 + int(h[5:7], 16) % 16
    return h, len(payload), width, height, channels, n_frames


def decode_payload(
    payloads: DataFrame,
    decoder: Callable[[bytes], tuple] | None = None,
) -> DataFrame:
    """Arrow-batched decode: (doc_id, payload) → typed feature rows.

    ``decoder`` plugs in a real implementation; the default is the
    deterministic fake. Raising ``NotImplementedError`` here is the
    documented behavior for modalities the deployment hasn't wired up.
    """
    dec = decoder or _fake_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, blen, w, ht, ch, nf = dec(bytes(payload))
                out.append((doc_id, blen, h, w, ht, ch, nf))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "byte_len", "checksum", "width", "height", "channels", "n_frames",
                ],
            )

    return payloads.select("doc_id", "payload").mapInPandas(fn, schema=DECODED_SCHEMA)


def decode_image(payloads: DataFrame) -> DataFrame:  # pragma: no cover
    """Real image decode — requires PIL/pyarrow image codecs.

    NOT IMPLEMENTED in this environment (no image libraries baked in);
    the plumbing path is ``decode_payload(payloads, decoder=your_decoder)``.
    """
    raise NotImplementedError(
        "real image decoding needs PIL/torchvision; pass decoder= to decode_payload"
    )


def sample_frames(decoded: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling over decoded video-like payloads: explode the frame
    index space ``0..n_frames-1`` and keep every ``k``-th frame — the
    standard pre-embedding subsampling step. Pure JVM explode (the frames
    themselves stay opaque; a real pipeline would carry frame byte-ranges)."""
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_id"),
    ).where((F.col("frame_id") % every_k) == 0)


def resize_plan(decoded: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Aspect-preserving thumbnail planning over decoded dimensions —
    the resize step's Spark-side half, pure integer column math (never
    upscale; fit the long edge). The byte-level resample needs an image
    library: plug it in as ``decode_payload(..., decoder=...)``-style
    pandas stages downstream; every dimension decision happens here,
    JVM-side, before any payload bytes move.
    """
    w, h = F.col("width"), F.col("height")
    fits = (w <= max_w) & (h <= max_h)
    height_bound = (w * max_h) <= (h * max_w)
    out_w = F.when(fits, w).otherwise(
        F.when(height_bound, F.expr(f"div(width * {max_h}, height)")).otherwise(F.lit(max_w))
    )
    out_h = F.when(fits, h).otherwise(
        F.when(height_bound, F.lit(max_h)).otherwise(F.expr(f"div(height * {max_w}, width)"))
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        out_w.cast("int").alias("out_w"),
        out_h.cast("int").alias("out_h"),
        (w * h > max_w * max_h).alias("downsampled"),
    )


def payload_features(
    payloads: DataFrame,
    dim: int = 8,
    extractor: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """Feature extraction: payload bytes → fixed-dim float vector, the
    bridge from multimodal ingest into the ANN/dedup surface (the output
    feeds ``embedding_near_duplicates`` / ``ann_brute_force`` directly).

    The default extractor is the deterministic fake (md5 16-bit slices
    scaled to [0, 1] — mirrored in the DuckDB oracle); a real CLIP-style
    encoder plugs in via ``extractor`` and everything downstream is
    unchanged. Requires ``dim <= 8`` for the fake (md5 is 128 bits).
    """
    if extractor is None and dim > 8:
        raise ValueError("md5 fake extractor yields at most 8 16-bit slices")

    def fake(payload: bytes) -> list:
        hx = hashlib.md5(payload).hexdigest()
        return [int(hx[4 * i : 4 * i + 4], 16) / 65535.0 for i in range(dim)]

    ext = extractor or fake

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "embedding": [ext(bytes(p)) for p in pdf["payload"]],
                }
            )

    id_type = payloads.schema["doc_id"].dataType.simpleString()
    return payloads.select("doc_id", "payload").mapInPandas(
        fn, schema=f"doc_id {id_type}, embedding array<double>"
    )
