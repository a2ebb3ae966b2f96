"""Multimodal column handling: opaque binary payloads + typed metadata.

The schema contract for image/audio/video at scale: one `binary` payload
column plus a `meta` struct (modality, codec hints, dimensions). Decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
iterators over `mapInPandas` — one Python worker per partition, one serde
per batch, payload bytes never touch the driver.

This container has no media codecs, so `decode_payload` is STUBBED: real
decode raises NotImplementedError unless `fake=True`, which substitutes a
deterministic fake feature extractor (byte-histogram head + length). The
Spark-side plumbing — schema, partitioning, UDF signature, batch shape — is
real and tested; swapping in PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_to_clickhouse_schema_spark.sources.io import load_table

DECODE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, feat array<double>, decode_ok boolean"
)
N_FEAT = 8


def decode_payload(payload: bytes, modality: str, fake: bool = False) -> list[float]:
    """Decode one payload into a feature vector.

    Real decode (image resize / audio resample / video frame-sample) needs
    media libraries not present in this container — stubbed per the build
    contract. The deterministic fake derives N_FEAT values from the byte
    content so tests can assert exact plumbing behavior end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg/torchaudio) are not available in this "
            "environment; pass fake=True for the deterministic stub"
        )
    if not payload:
        return [0.0] * N_FEAT
    # fake "features": mean byte value of N_FEAT equal-width chunks
    n = len(payload)
    step = max(n // N_FEAT, 1)
    feats = []
    for i in range(N_FEAT):
        chunk = payload[i * step : (i + 1) * step] or payload[-step:]
        feats.append(round(sum(chunk) / len(chunk), 4))
    return feats


def decode_payload_batches(fake: bool = True):
    """mapInPandas iterator: (doc_id, payload, meta.modality) batches in,
    (doc_id, modality, n_bytes, feat, decode_ok) batches out. Arrow carries
    the binary column; nothing is collected driver-side."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, ok = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append(decode_payload(bytes(payload), "text", fake=fake))
                    ok.append(True)
                except NotImplementedError:
                    feats.append([0.0] * N_FEAT)
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feat": feats,
                    "decode_ok": ok,
                }
            )

    return fn


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-shaped into the multimodal layout: payload + meta struct."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


def extract_features(spark: SparkSession, sf_dir: str, fake: bool = True) -> DataFrame:
    """The full decode pipeline: multimodal table → mapInPandas feature
    extraction. Partitioned by doc_id so payload batches are balanced; at
    100 TB the repartition count follows payload bytes per partition, not
    row count."""
    mm = multimodal_table(spark, sf_dir).select(
        "doc_id", "payload", F.col("meta.modality").alias("modality")
    )
    return mm.mapInPandas(decode_payload_batches(fake=fake), schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int, resize_ok boolean"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary, sample_ok boolean"


def resize_payload(payload: bytes, width: int, height: int, fake: bool = False) -> bytes:
    """Resize one image payload to (width, height). Real decode-resize-encode
    needs PIL/libvips — stubbed per the build contract. The deterministic
    fake emits exactly width*height bytes by striding/cycling the source so
    tests can assert the size contract end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image codecs (PIL/libvips) are not available in this environment; "
            "pass fake=True for the deterministic stub"
        )
    target = width * height
    if not payload:
        return bytes(target)
    reps = -(-target // len(payload))
    return (payload * reps)[:target]


def resize_batches(width: int, height: int, fake: bool = True):
    """mapInPandas iterator for bulk image resize: (doc_id, payload) in,
    (doc_id, payload, width, height, resize_ok) out. The payload column
    stays binary through Arrow both ways — at 100 TB the only knob is
    bytes-per-partition (repartition upstream so a batch of decoded images
    fits the Python worker's memory)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out, ok = [], []
            for payload in pdf["payload"]:
                try:
                    out.append(resize_payload(bytes(payload), width, height, fake=fake))
                    ok.append(True)
                except NotImplementedError:
                    out.append(b"")
                    ok.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                    "resize_ok": ok,
                }
            )

    return fn


def resize_images(
    spark: SparkSession, sf_dir: str, width: int = 8, height: int = 4, fake: bool = True
) -> DataFrame:
    """Bulk resize over the multimodal table (stub codec, real plumbing)."""
    mm = multimodal_table(spark, sf_dir).select("doc_id", "payload")
    return mm.mapInPandas(resize_batches(width, height, fake=fake), schema=RESIZE_SCHEMA)


def sample_frames_payload(
    payload: bytes, n_frames: int, fake: bool = False
) -> list[bytes]:
    """Sample n_frames evenly spaced frames from one video payload. Real
    demuxing needs ffmpeg — stubbed. The deterministic fake slices the
    payload into n_frames evenly spaced fixed-width byte windows (the shape
    a real frame sampler produces: one binary blob per sampled frame)."""
    if not fake:
        raise NotImplementedError(
            "video codecs (ffmpeg) are not available in this environment; "
            "pass fake=True for the deterministic stub"
        )
    if not payload:
        return [b""] * n_frames
    w = max(len(payload) // n_frames, 1)
    return [payload[i * w : i * w + w] or payload[-w:] for i in range(n_frames)]


def frame_sample_batches(n_frames: int, fake: bool = True):
    """mapInPandas iterator for frame sampling: one input row fans out to
    n_frames output rows (doc_id, frame_idx, frame, sample_ok) — the
    explode happens INSIDE the Python worker so frame bytes cross Arrow
    once, already split."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, oks = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    fs = sample_frames_payload(bytes(payload), n_frames, fake=fake)
                    ok = True
                except NotImplementedError:
                    fs, ok = [b""] * n_frames, False
                for i, fr in enumerate(fs):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr)
                    oks.append(ok)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                    "sample_ok": oks,
                }
            )

    return fn


def sample_frames(
    spark: SparkSession, sf_dir: str, n_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Bulk frame sampling over the multimodal table (stub codec, real
    plumbing): each payload row fans out to n_frames frame rows."""
    mm = multimodal_table(spark, sf_dir).select("doc_id", "payload")
    return mm.mapInPandas(frame_sample_batches(n_frames, fake=fake), schema=FRAMES_SCHEMA)
