"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched (mapInPandas) decode/feature stages.

The reference handles images as files on disk re-referenced by path
(ingestion/docling_parser.py:32-93, ingestion/image_extractor.py) and
sends them one-at-a-time to a vision model with 15 s sleeps
(ingestion/image_extractor.py:64-103,150-158). The Spark-native design:
``spark.read.format("binaryFile")`` → a ``content: binary`` column flows
through the DataFrame like any other; decode / resize / feature-extract
are ``mapInPandas`` stages that see Arrow record batches, with the heavy
library loaded once per executor — no per-item process spawn, no sleeps,
batch-size-bounded memory.

The image/audio codec libraries are NOT in this container, so the decode
kernel is stubbed (clearly marked): ``decode_stub=True`` derives
deterministic fake metadata from the payload bytes; ``decode_stub=False``
raises NotImplementedError where Pillow/librosa would be called. The
Spark-side plumbing — schema, batch iteration, partitioning, UDF
signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("media_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
}


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content). Pushdown
    applies to path/length filters; content stays columnar until a decode
    stage touches it."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def _sniff_format(payload: bytes) -> str:
    for magic, name in _MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


def decode_media(
    binary_df: DataFrame, decode_stub: bool = True, feature_dims: int = 8
) -> DataFrame:
    """Decode/feature-extract stage over a binaryFile DataFrame.

    STUB: with ``decode_stub=True`` (default — codec libs absent in this
    image) width/height/feature are derived deterministically from the
    payload's md5, so tests exercise the full Arrow round-trip with stable
    outputs. With ``decode_stub=False`` this is where PIL.Image.open /
    soundfile.read would run per Arrow batch — one import per executor.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if not decode_stub:
            raise NotImplementedError(
                "real media decode requires Pillow/librosa, absent in this "
                "image; run with decode_stub=True"
            )
        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content)
                h = hashlib.md5(payload).digest()
                out.append(
                    {
                        "path": path,
                        "media_id": h.hex()[:16],
                        "n_bytes": len(payload),
                        "format": _sniff_format(payload),
                        "width": 1 + h[0],
                        "height": 1 + h[1],
                        "feature": [
                            (h[2 + (i % 12)] - 128.0) / 128.0
                            for i in range(feature_dims)
                        ],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_META_SCHEMA])

    return binary_df.select("path", "content").mapInPandas(
        batches, schema=MEDIA_META_SCHEMA
    )


def frame_sample_plan(media_meta: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video columns: one row per sampled
    frame index (explode of a sequence — JVM-side), ready for a per-frame
    decode stage. Frame count is stubbed as height (deterministic stand-in
    until a real container parser is wired in)."""
    return media_meta.select(
        "media_id",
        "path",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("height") - 1, F.lit(0)), F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


# --------------------------------------------------------------------------
# Perceptual hash (average-hash family) over the media column. A real
# pHash decodes the image, resizes to an 8x8 luma grid, and thresholds
# each cell against the mean — the decode/resize is the codec boundary
# (stubbed here like decode_media). The stand-in "luma grid" samples a
# fixed 64-position grid of code points from the payload text: position
# i reads the character at (i * len) // 64, so the grid scales with
# payload length exactly the way a resize scales with image size — a
# small edit or length change moves few cells, which is what makes the
# Hamming distance a near-dup signal (the same robustness property the
# real aHash gets from resizing). Everything AFTER the stubbed decode —
# mean threshold, 4x16-bit band packing, banded Hamming candidate join
# (plans/multimodal_queries.media_phash_near_dup) — is the real,
# portable integer arithmetic a production pHash dedup runs, and is
# recomputed bit-for-bit by the DuckDB oracle.
# --------------------------------------------------------------------------
PHASH_CELLS = 64
PHASH_BANDS = 4  # 16 bits per band

PHASH_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("media_id", T.StringType()),
        T.StructField("b0", T.IntegerType()),
        T.StructField("b1", T.IntegerType()),
        T.StructField("b2", T.IntegerType()),
        T.StructField("b3", T.IntegerType()),
    ]
)


def phash_media(binary_df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched pHash stage: (path, content) -> (path, media_id,
    b0..b3) where b0..b3 are the four 16-bit bands of the 64-bit
    average-hash. ``decode_stub=False`` is where PIL resize + grayscale
    would produce the cell grid."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if not decode_stub:
            raise NotImplementedError(
                "real pHash requires an image codec (Pillow), absent in "
                "this image; run with decode_stub=True"
            )
        for pdf in it:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content)
                # total over arbitrary bytes: real media is not UTF-8
                # (replace keeps the stage deterministic either way),
                # and a 0-byte payload gets the all-zero grid instead
                # of an IndexError killing the whole Arrow batch
                s = payload.decode("utf-8", errors="replace")
                n = len(s)
                cells = (
                    [
                        ord(s[(i * n) // PHASH_CELLS])
                        for i in range(PHASH_CELLS)
                    ]
                    if n
                    else [0] * PHASH_CELLS
                )
                total = sum(cells)
                # integer threshold: cell > mean  <=>  cell * 64 > total
                bits = [
                    1 if c * PHASH_CELLS > total else 0 for c in cells
                ]
                bands = [
                    sum(
                        bits[16 * j + k] << k for k in range(16)
                    )
                    for j in range(PHASH_BANDS)
                ]
                out.append(
                    {
                        "path": path,
                        "media_id": hashlib.md5(payload).hexdigest()[:16],
                        "b0": bands[0],
                        "b1": bands[1],
                        "b2": bands[2],
                        "b3": bands[3],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in PHASH_SCHEMA])

    return binary_df.select("path", "content").mapInPandas(
        batches, schema=PHASH_SCHEMA
    )


def resize_plan(
    media_meta: DataFrame, max_dim: int = 64
) -> DataFrame:
    """Resize stage plumbing: aspect-preserving target dimensions for
    each media row, computed with exact integer arithmetic (floor of
    the scaled short side, floored at 1). The pixel resample itself is
    the codec boundary (PIL.Image.resize in production — the same
    stub-vs-real split as decode_media); everything a scheduler needs
    — which rows shrink, to what shape, at what area ratio — is this
    JVM-side arithmetic."""
    w, h = F.col("width"), F.col("height")
    needs = F.greatest(w, h) > max_dim
    # exact integer floor division (SQL DIV) — bit-identical in DuckDB,
    # no double rounding in the scaled short side
    scaled_w = F.greatest(F.expr(f"width * {max_dim} DIV height"), F.lit(1))
    scaled_h = F.greatest(F.expr(f"height * {max_dim} DIV width"), F.lit(1))
    tw = F.when(~needs, w).otherwise(
        F.when(w >= h, F.lit(max_dim)).otherwise(scaled_w)
    )
    th = F.when(~needs, h).otherwise(
        F.when(h > w, F.lit(max_dim)).otherwise(scaled_h)
    )
    return media_meta.withColumn("scaled", needs).withColumn(
        "target_w", tw.cast("int")
    ).withColumn("target_h", th.cast("int"))
