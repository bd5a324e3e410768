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


def decode_image_meta(df: DataFrame) -> DataFrame:
    """payload → (n_bytes, digest, width, height) via mapInPandas.
    Arrow-batched: each pandas chunk is one Arrow batch, so memory is
    bounded regardless of partition size.

    The batch function is deliberately SELF-CONTAINED (local imports,
    no references to module globals): Spark pickles closure globals as
    (module, name) references, and Python workers may not have this
    package on their path when the driving process imported it from a
    bare file path.  A real implementation would call PIL.Image.open
    where the md5-derived fake dimensions are computed."""

    def fn(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = _pd.DataFrame()
            out["media_id"] = pdf["media_id"]
            payloads = pdf["payload"]
            n_bytes, digests, widths, heights = [], [], [], []
            for p in payloads:
                if p is None:
                    n_bytes.append(None)
                    digests.append(None)
                    widths.append(None)
                    heights.append(None)
                    continue
                d = _hashlib.md5(p).hexdigest()
                n_bytes.append(len(p))
                digests.append(d)
                widths.append(16 + int(d[:4], 16) % 4080)
                heights.append(16 + int(d[4:8], 16) % 4080)
            out["n_bytes"] = _pd.array(n_bytes, dtype="Int64")
            out["digest"] = digests
            out["width"] = _pd.array(widths, dtype="Int64")
            out["height"] = _pd.array(heights, dtype="Int64")
            yield out[["media_id", "n_bytes", "digest", "width", "height"]]

    return df.select("media_id", "payload").mapInPandas(
        fn, schema=IMAGE_META_SCHEMA
    )


def extract_features(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """payload → fixed-size pseudo-embedding (deterministic stub for
    a vision encoder).  Demonstrates the feature-extraction batch
    contract: array<double> output column of constant length."""

    def fn(batches):
        # self-contained closure — see decode_image_meta
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                digest = _hashlib.md5(p).hexdigest()
                feats.append(
                    [
                        (int(digest[i * 4 : i * 4 + 4], 16) % 2001 - 1000)
                        / 1000.0
                        for i in range(dim)
                    ]
                )
            yield _pd.DataFrame(
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
