"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas
iterators (mapInPandas).

The decode step is STUBBED (no image/audio libraries in this
container): `decode_image_meta` produces a deterministic fake
(dimensions derived from the md5 of the bytes) and `extract_features`
a deterministic pseudo-embedding.  The Spark-side contract — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested;
swapping the stub body for PIL/ffmpeg is a one-function change.

Scale notes: binary payloads should live in their own parquet column
chunk (they do, by construction) so metadata-only queries never read
them; mapInPandas streams Arrow batches so peak memory is one batch,
not one partition; `spark.sql.execution.arrow.maxRecordsPerBatch`
bounds batch size for large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),      # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)

FEATURE_DIM = 8


def _fake_decode(payload: bytes | None) -> tuple[int | None, int | None, str | None]:
    """Deterministic stand-in for a real image decode.  A real
    implementation would call PIL.Image.open here; the container has
    no imaging libraries, so dimensions are derived from the digest.
    Raises nothing — bad payloads yield nulls, mirroring PERMISSIVE
    source semantics."""
    if payload is None:
        return None, None, None
    digest = hashlib.md5(payload).hexdigest()
    width = 16 + int(digest[:4], 16) % 4080
    height = 16 + int(digest[4:8], 16) % 4080
    return width, height, digest


def decode_image_meta(df: DataFrame) -> DataFrame:
    """payload → (n_bytes, digest, width, height) via mapInPandas.
    Arrow-batched: each pandas chunk is one Arrow batch, so memory is
    bounded regardless of partition size."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            payloads = pdf["payload"]
            out["n_bytes"] = [
                len(p) if p is not None else None for p in payloads
            ]
            decoded = [_fake_decode(p) for p in payloads]
            out["digest"] = [d[2] for d in decoded]
            out["width"] = pd.array(
                [d[0] for d in decoded], dtype="Int64"
            )
            out["height"] = pd.array(
                [d[1] for d in decoded], dtype="Int64"
            )
            yield out[["media_id", "n_bytes", "digest", "width", "height"]]

    return df.select("media_id", "payload").mapInPandas(
        fn, schema=IMAGE_META_SCHEMA
    )


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """payload → fixed-size pseudo-embedding (deterministic stub for
    a vision encoder).  Demonstrates the feature-extraction batch
    contract: array<double> output column of constant length."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                digest = hashlib.md5(p).hexdigest()
                feats.append(
                    [
                        (int(digest[i * 4 : i * 4 + 4], 16) % 2001 - 1000)
                        / 1000.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return df.select("media_id", "payload").mapInPandas(
        fn, schema=FEATURE_SCHEMA
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Placeholder for a decode→resize→re-encode pass.  The real body
    needs an imaging library; the plumbing (binary→binary mapInPandas
    with metadata passthrough) is the contract."""
    raise NotImplementedError(
        "resize requires an imaging library not present in this "
        "environment; use decode_image_meta/extract_features for the "
        "tested plumbing"
    )


def binary_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """Pure-SQL metadata over a binary column (no Python): byte
    length + hex prefix — the fast path for triage queries that must
    not deserialize payloads."""
    b = F.col(bin_col)
    return df.select(
        F.col(id_col),
        F.octet_length(b).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(b, 1, 8))).alias("prefix_hex"),
        F.md5(b).alias("digest"),
    )
