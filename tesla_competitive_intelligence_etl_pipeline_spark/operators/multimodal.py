"""X-4: multimodal columns — opaque binary payloads + typed metadata
(SURVEY.md §2.9).

The container has no image/audio libraries, so the *decode* step is stubbed
(deterministic fake features / NotImplementedError for real codecs), but the
Spark-side plumbing is real and tested: BinaryType columns, Arrow-batched
mapInPandas with a declared output schema, batch-shape-preserving iteration,
and partition-count-preserving execution.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, payload_md5 string, "
    "features array<double>"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model documents as multimodal rows: payload = utf-8 bytes of the text
    (stands in for image/audio bytes), modality tag, byte-length metadata."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        F.lit("text").alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.to_json(F.struct(F.col("lang"), F.col("source"))).alias("meta"),
    )


def decode_payload(payload: bytes, modality: str) -> bytes:
    """Real codec hook. Image/audio/video decoding requires libraries not
    present in this container — the Spark plumbing around this function is
    what the engine provides."""
    if modality == "text":
        return payload
    raise NotImplementedError(
        f"decoder for modality={modality!r} requires external codec libraries"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for an embedding/feature extractor: byte-sum
    per stride bucket, normalized. Replace with a real model at deploy."""
    if payload is None or len(payload) == 0:
        return [0.0] * FEATURE_DIM
    buckets = [0] * FEATURE_DIM
    for i, byte in enumerate(payload):
        buckets[i % FEATURE_DIM] += byte
    total = float(sum(buckets)) or 1.0
    return [round(b / total, 6) for b in buckets]


def sample_frames(
    multimodal: DataFrame, frame_bytes: int = 256, max_frames: int = 4
) -> DataFrame:
    """Frame sampling over opaque binary payloads — the video/audio
    "sample k fixed-size frames per asset" plumbing, with a codec-free frame
    definition: frame i = payload bytes [i*frame_bytes, (i+1)*frame_bytes),
    capped at ``max_frames`` leading frames. Everything a real sampler needs
    except the codec is exercised: per-asset fan-out (sequence → explode,
    no shuffle), typed frame metadata, and a per-frame byte checksum; the
    decode itself stays behind ``decode_payload``.

    Frames are checksummed as md5(hex(frame bytes)) — hex first, because the
    DuckDB oracle has no BLOB substring, and md5-over-hex is byte-exact and
    engine-portable (verified identical Spark vs DuckDB incl. multi-byte
    utf-8). Returns (doc_id, modality, frame_ix, frame_n_bytes, frame_md5).
    """
    fb = frame_bytes
    n_frames = F.least(
        F.floor((F.col("n_bytes") + fb - 1) / fb).cast("int"), F.lit(max_frames)
    )
    hex_payload = F.hex(F.col("payload"))
    frame = F.col("__hex").substr(
        F.col("frame_ix") * (2 * fb) + 1, F.lit(2 * fb)
    )
    return (
        multimodal.filter(F.col("n_bytes") > 0)
        .select(
            "doc_id",
            "modality",
            hex_payload.alias("__hex"),
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_ix"),
        )
        .select(
            "doc_id",
            "modality",
            F.col("frame_ix").cast("long").alias("frame_ix"),
            (F.length(frame) / 2).cast("long").alias("frame_n_bytes"),
            F.md5(frame).alias("frame_md5"),
        )
    )


def extract_features(multimodal: DataFrame, batch_limit: int | None = None) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched mapInPandas
    (X-10 surface). One Python worker pass per partition; batch shape is
    whatever Arrow delivers — the udf must not assume one batch per
    partition.

    Besides the feature vector, the udf emits ``payload_md5`` — an md5 of the
    decoded bytes computed IN PYTHON (hashlib) per row. This is the hard
    correctness signal for the Python-worker path: DuckDB's md5() over the
    same bytes must agree, so the driver oracle proves the Arrow round-trip
    delivered every payload byte intact (not just row counts)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_payload(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "payload_md5": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in decoded
                    ],
                    "features": [_fake_features(p) for p in decoded],
                }
            )
            yield out

    df = multimodal if batch_limit is None else multimodal.limit(batch_limit)
    return df.mapInPandas(run, schema=FEATURES_SCHEMA)
