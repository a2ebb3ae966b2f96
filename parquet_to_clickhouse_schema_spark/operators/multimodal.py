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
