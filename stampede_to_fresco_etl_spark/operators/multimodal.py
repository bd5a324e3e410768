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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("digest", StringType(), True),
    ]
)


def resize_image(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Nearest-neighbor resize of raw RGB888 rasters (binary→binary
    mapInPandas — the decode→resize→re-encode pass of an image
    training pipeline, minus the codec: payloads here are already
    decoded H×W×3 byte planes, so numpy is the whole kernel).

    Output pixel (y, x) takes source pixel
    (floor(y·H/out_h), floor(x·W/out_w)) — the floor-scale NN mapping,
    chosen over PIL's half-pixel-center variant because it is exactly
    re-expressible in SQL for the oracle (catalog `mm3_resize`).
    Rows whose payload is NULL, or whose byte count ≠ H·W·3, yield
    NULL output (malformed media never kills the batch).

    `digest` is md5 of the lowercase hex of the resized bytes —
    hex-space because the oracle engine's md5 is VARCHAR-only.

    Scale: Arrow-batched like its siblings; peak memory is one batch
    of decoded rasters, so cap
    `spark.sql.execution.arrow.maxRecordsPerBatch` when frames are
    large (a 4K RGB frame is ~24 MB decoded).
    """

    def fn(batches):
        # self-contained closure — see decode_image_meta
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, payloads, digests = [], [], []
            for mid, p, w, h in zip(
                pdf[id_col], pdf[payload_col], pdf[width_col], pdf[height_col]
            ):
                ids.append(mid)
                # null ints surface as NaN in pandas — isna covers both
                if p is None or _pd.isna(w) or _pd.isna(h) or w < 1 or h < 1:
                    payloads.append(None)
                    digests.append(None)
                    continue
                raw = _np.frombuffer(bytes(p), dtype=_np.uint8)
                if raw.size != int(h) * int(w) * 3:
                    payloads.append(None)
                    digests.append(None)
                    continue
                img = raw.reshape(int(h), int(w), 3)
                ys = (_np.arange(out_h) * int(h)) // out_h
                xs = (_np.arange(out_w) * int(w)) // out_w
                resized = img[ys][:, xs].tobytes()
                payloads.append(resized)
                digests.append(
                    _hashlib.md5(resized.hex().encode()).hexdigest()
                )
            yield _pd.DataFrame(
                {
                    "media_id": _pd.array(ids, dtype="Int64"),
                    "payload": payloads,
                    "width": _pd.array([out_w] * len(ids), dtype="Int64"),
                    "height": _pd.array([out_h] * len(ids), dtype="Int64"),
                    "digest": digests,
                }
            )

    return df.select(
        F.col(id_col).alias(id_col),
        F.col(payload_col),
        F.col(width_col),
        F.col(height_col),
    ).mapInPandas(fn, schema=RESIZED_SCHEMA)


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


SAMPLED_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), True),
        StructField("frame", BinaryType(), True),
        StructField("digest", StringType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    n_samples: int,
    frame_bytes: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Uniform frame sampling from video-as-binary (the frame-sample
    pass of a video training pipeline, minus the codec: payloads here
    are already-decoded fixed-size frame planes concatenated
    back-to-back, so the kernel is pure slice arithmetic — swapping
    in ffmpeg/pyav changes one function body, not the contract).

    A payload of n_frames = len/frame_bytes frames yields
    k = min(n_samples, n_frames) rows: frame j is source index
    (j·n_frames)//k — the floor-scale mapping (strictly increasing
    for k ≤ n_frames), chosen like mm3's resize because it is exactly
    re-expressible in SQL for the oracle.  A NULL payload or one
    whose length is not a frame multiple yields ONE row with NULL
    frame_idx/frame/digest (malformed media never kills the batch,
    and never silently disappears).  `digest` is md5 of the lowercase
    hex of the frame bytes (hex-space: oracle md5 is VARCHAR-only).

    Scale: Arrow-batched mapInPandas like its siblings; output fan-out
    is ≤ n_samples rows per video, each one frame — peak memory is one
    batch of frames, bounded via arrow.maxRecordsPerBatch.
    """

    def fn(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            ids, idxs, frames, digests = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None or len(p) == 0 or len(p) % frame_bytes != 0:
                    ids.append(mid)
                    idxs.append(None)
                    frames.append(None)
                    digests.append(None)
                    continue
                raw = bytes(p)
                n_frames = len(raw) // frame_bytes
                k = min(n_samples, n_frames)
                for j in range(k):
                    src = (j * n_frames) // k
                    fr = raw[src * frame_bytes:(src + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(src)
                    frames.append(fr)
                    digests.append(
                        _hashlib.md5(fr.hex().encode()).hexdigest()
                    )
            yield _pd.DataFrame(
                {
                    "media_id": _pd.array(ids, dtype="Int64"),
                    "frame_idx": _pd.array(idxs, dtype="Int64"),
                    "frame": frames,
                    "digest": digests,
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(fn, schema=SAMPLED_FRAMES_SCHEMA)


AUDIO_ENERGY_SCHEMA = (
    "media_id long, frame_idx long, n_samples long, energy long"
)


def audio_frame_energy(
    df: DataFrame,
    frame_samples: int = 16,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-frame energy of int16-PCM audio-as-binary — the feature-
    extraction pass of an audio training pipeline (VAD gating, crude
    loudness normalization) minus the codec, like mm4 is video minus
    the codec: payloads are already-decoded little-endian int16
    samples, so swapping in a real decoder changes one function body.

    The kernel is Arrow-batched mapInPandas over numpy: frombuffer →
    truncate (an odd trailing byte and a partial trailing frame are
    DROPPED — the standard hop-window contract) → reshape(n_frames,
    frame_samples) → Σ v² per frame.  Energy is an exact int64
    (frame_samples · 32768² ≪ 2⁶³): no floats anywhere, so any engine
    reproduces it bit-for-bit — the property the mm5 oracle leans on.
    A NULL or sub-frame payload yields ONE all-NULL row (malformed
    media never kills the batch, never silently disappears — mm4's
    contract).

    Scale: output is len/(2·frame_samples) rows of four longs per
    clip; peak memory one Arrow batch of payloads."""

    def fn(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, idxs, ns, es = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                raw = None if p is None else bytes(p)
                n_frames = (
                    0
                    if raw is None
                    else (len(raw) // 2) // frame_samples
                )
                if n_frames == 0:
                    ids.append(mid)
                    idxs.append(None)
                    ns.append(None)
                    es.append(None)
                    continue
                n_samp = n_frames * frame_samples
                v = _np.frombuffer(
                    raw[: n_samp * 2], dtype="<i2"
                ).astype(_np.int64)
                e = (v.reshape(n_frames, frame_samples) ** 2).sum(axis=1)
                for j in range(n_frames):
                    ids.append(mid)
                    idxs.append(j)
                    ns.append(frame_samples)
                    es.append(int(e[j]))
            yield _pd.DataFrame(
                {
                    "media_id": _pd.array(ids, dtype="Int64"),
                    "frame_idx": _pd.array(idxs, dtype="Int64"),
                    "n_samples": _pd.array(ns, dtype="Int64"),
                    "energy": _pd.array(es, dtype="Int64"),
                }
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(fn, schema=AUDIO_ENERGY_SCHEMA)


def image_patches(
    df: DataFrame,
    height: int,
    width: int,
    patch_h: int,
    patch_w: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Non-overlapping 2-D patch extraction from image-as-binary (the
    ViT-style patchify pass, minus the codec: payloads are row-major
    height×width single-channel planes, so the kernel is a numpy
    reshape + block gather — swapping in a real decoder changes one
    function body, not the contract).

    Yields (height//patch_h)·(width//patch_w) rows per well-formed
    image: patch (r, c) carries the contiguous bytes of rows
    r·patch_h…(r+1)·patch_h−1 restricted to columns
    c·patch_w…(c+1)·patch_w−1, in row-major order — exactly
    re-expressible as fixed hex-substring concatenation for the
    oracle.  A NULL payload or one whose length ≠ height·width yields
    ONE row with NULL patch fields (malformed media never kills the
    batch, never silently disappears — the mm4 contract).  `digest`
    is md5 of the lowercase hex of the patch bytes.

    Scale: Arrow-batched mapInPandas; fan-out is the fixed patch
    count, peak memory one batch of patches."""
    import pandas as _pd  # noqa: F401 (signature parity with siblings)

    n_pr = height // patch_h
    n_pc = width // patch_w

    def fn(batches):
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, prs, pcs, patches, digests = [], [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None or len(p) != height * width:
                    ids.append(mid)
                    prs.append(None)
                    pcs.append(None)
                    patches.append(None)
                    digests.append(None)
                    continue
                img = _np.frombuffer(bytes(p), dtype=_np.uint8).reshape(
                    height, width
                )
                for r in range(n_pr):
                    for c in range(n_pc):
                        blk = img[
                            r * patch_h:(r + 1) * patch_h,
                            c * patch_w:(c + 1) * patch_w,
                        ].tobytes()
                        ids.append(mid)
                        prs.append(r)
                        pcs.append(c)
                        patches.append(blk)
                        digests.append(
                            _hashlib.md5(blk.hex().encode()).hexdigest()
                        )
            yield _pd.DataFrame(
                {
                    id_col: ids,
                    "patch_row": _pd.array(prs, dtype="Int64"),
                    "patch_col": _pd.array(pcs, dtype="Int64"),
                    "patch": patches,
                    "digest": digests,
                }
            )

    out_schema = (
        f"{id_col} long, patch_row long, patch_col long, "
        "patch binary, digest string"
    )
    return df.select(id_col, payload_col).mapInPandas(fn, out_schema)


SHOT_BOUNDARY_SCHEMA = (
    "media_id long, frame_idx long, diff long, is_boundary boolean"
)


def shot_boundaries(
    df: DataFrame,
    frame_bytes: int,
    threshold: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Shot-boundary detection over video-as-binary (the scene-cut
    pass of a video curation pipeline, minus the codec — like
    `sample_frames`, payloads are decoded fixed-size frame planes
    back-to-back; swapping in a real decoder changes one function
    body, not the contract).

    For each consecutive frame pair (i−1, i) the kernel emits the
    L1 frame difference Σ|bytes_i − bytes_{i−1}| (exact int64 — the
    classic pixel-difference cut detector) and flags a boundary
    where diff > threshold.  A NULL payload, a length that is not a
    frame multiple, or fewer than two frames yields ONE row with
    NULL frame_idx/diff/is_boundary (malformed media never kills
    the batch, never silently disappears — mm4's contract).

    Scale: Arrow-batched mapInPandas; the numpy reshape+diff is
    vectorized per payload, output fan-out is n_frames−1 rows per
    video, and nothing shuffles — downstream per-media shot counts
    are one map-combined aggregate."""

    def fn(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            # Vectorize ACROSS payloads, not per payload: a Python
            # loop over rows costs ~0.3 ms/row and turned the sf1
            # rehearsal 29× superlinear.  Well-formed payloads with a
            # common frame count are concatenated into ONE buffer and
            # diffed as a single (docs, frames, frame_bytes) tensor.
            lens = pdf[payload_col].map(
                lambda p: -1 if p is None else len(p)
            )
            ok = (
                (lens >= 2 * frame_bytes) & (lens % frame_bytes == 0)
            ).to_numpy()
            bad_ids = pdf[id_col][~ok]
            frames = []
            if len(bad_ids):
                frames.append(
                    _pd.DataFrame(
                        {
                            "media_id": _pd.array(
                                bad_ids, dtype="Int64"
                            ),
                            "frame_idx": _pd.array(
                                [None] * len(bad_ids), dtype="Int64"
                            ),
                            "diff": _pd.array(
                                [None] * len(bad_ids), dtype="Int64"
                            ),
                            "is_boundary": _pd.array(
                                [None] * len(bad_ids), dtype="boolean"
                            ),
                        }
                    )
                )
            good = pdf[ok]
            for nf, grp in good.groupby(
                (lens[ok] // frame_bytes).to_numpy()
            ):
                n = len(grp)
                buf = _np.frombuffer(
                    b"".join(bytes(p) for p in grp[payload_col]),
                    dtype=_np.uint8,
                ).astype(_np.int64).reshape(n, nf, frame_bytes)
                d = _np.abs(_np.diff(buf, axis=1)).sum(axis=2)
                mids = _np.repeat(
                    grp[id_col].to_numpy(dtype=_np.int64), nf - 1
                )
                idxs = _np.tile(_np.arange(1, nf), n)
                dv = d.reshape(-1)
                frames.append(
                    _pd.DataFrame(
                        {
                            "media_id": _pd.array(mids, dtype="Int64"),
                            "frame_idx": _pd.array(idxs, dtype="Int64"),
                            "diff": _pd.array(dv, dtype="Int64"),
                            "is_boundary": _pd.array(
                                dv > threshold, dtype="boolean"
                            ),
                        }
                    )
                )
            if frames:
                yield _pd.concat(frames, ignore_index=True)

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(fn, schema=SHOT_BOUNDARY_SCHEMA)
