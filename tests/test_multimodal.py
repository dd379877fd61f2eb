"""Multimodal plumbing tests: binaryFile scan → mapInPandas decode stub →
frame sampling. Exercises the real Arrow batch path; only the codec call
itself is stubbed (absent in this image)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from data_ingestion_din_spark.sources.binary import (
    decode_media,
    frame_sample_plan,
    read_binary_dir,
)


@pytest.fixture(scope="module")
def media_dir():
    d = tempfile.mkdtemp(prefix="media_")
    Path(d, "a.png").write_bytes(b"\x89PNG\r\n\x1a\n" + b"fakepngdata" * 100)
    Path(d, "b.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"fakejpeg" * 50)
    Path(d, "c.bin").write_bytes(b"justbytes")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_binary_scan_and_decode_stub(spark, media_dir):
    raw = read_binary_dir(spark, media_dir)
    assert raw.count() == 3
    meta = decode_media(raw).orderBy("path")
    rows = meta.collect()
    by_fmt = {r.path.rsplit("/", 1)[-1]: r for r in rows}
    assert by_fmt["a.png"].format == "png"
    assert by_fmt["b.jpg"].format == "jpeg"
    assert by_fmt["c.bin"].format == "unknown"
    for r in rows:
        assert r.n_bytes > 0 and len(r.feature) == 8
        assert 1 <= r.width <= 256 and 1 <= r.height <= 256
    # deterministic: same payload → same media_id across runs
    again = {r.path: r.media_id for r in decode_media(raw).collect()}
    assert again == {r.path: r.media_id for r in rows}


def test_decode_without_stub_raises(spark, media_dir):
    raw = read_binary_dir(spark, media_dir)
    with pytest.raises(Exception, match="NotImplementedError|decode_stub"):
        decode_media(raw, decode_stub=False).collect()


def test_frame_sampling(spark, media_dir):
    meta = decode_media(read_binary_dir(spark, media_dir))
    frames = frame_sample_plan(meta, every_n=10)
    pdf = frames.toPandas()
    heights = {r.media_id: r.height for r in meta.collect()}
    for mid, grp in pdf.groupby("media_id"):
        expected = (max(heights[mid] - 1, 0)) // 10 + 1
        assert len(grp) == expected
        assert list(grp.frame_idx)[:2] in ([0], [0, 10])


def test_phash_media_bands_and_locality(spark):
    """pHash stage plumbing: 4 x 16-bit bands, deterministic across
    runs, and LOCALITY — a small payload edit moves few bits, while an
    unrelated payload is ~32/64 away (what makes banded Hamming a
    near-dup signal)."""
    from data_ingestion_din_spark.sources.binary import phash_media

    base = "the quick brown fox jumps over the lazy dog " * 20
    edited = base.replace("lazy", "hazy", 1)
    other = "completely different payload contents " * 25
    df = spark.createDataFrame(
        [("a", bytearray(base.encode())),
         ("b", bytearray(edited.encode())),
         ("c", bytearray(other.encode()))],
        "path string, content binary",
    )
    rows = {r.path: r for r in phash_media(df).collect()}
    assert all(0 <= rows[p][f"b{j}"] < 65536 for p in "abc" for j in range(4))

    def ham(x, y):
        return sum(
            bin(rows[x][f"b{j}"] ^ rows[y][f"b{j}"]).count("1")
            for j in range(4)
        )

    assert ham("a", "b") <= 10, ham("a", "b")   # near-dup: few bits move
    assert ham("a", "c") >= 16, ham("a", "c")   # unrelated: far apart
    # deterministic re-run
    rows2 = {r.path: r for r in phash_media(df).collect()}
    assert {p: tuple(rows[p]) for p in rows} == {
        p: tuple(rows2[p]) for p in rows2
    }

    # decode_stub=False is the documented codec boundary
    import pytest

    with pytest.raises(Exception, match="NotImplemented|Pillow|codec"):
        phash_media(df, decode_stub=False).collect()


def test_phash_media_total_on_empty_and_binary_payloads(spark):
    """The pHash stage must be total over arbitrary binary content
    (review finding): a 0-byte payload gets the all-zero grid instead
    of an IndexError killing the Arrow batch, and non-UTF-8 bytes
    decode with replacement instead of raising."""
    from data_ingestion_din_spark.sources.binary import phash_media

    df = spark.createDataFrame(
        [
            ("empty", bytearray(b"")),
            ("binary", bytearray(bytes([0xFF, 0xFE, 0x89, 0x50] * 40))),
            ("text", bytearray(b"plain old ascii text " * 10)),
        ],
        "path string, content binary",
    )
    rows = {r.path: r for r in phash_media(df).collect()}
    assert len(rows) == 3
    # empty payload: all cells 0 -> every bit fails c*64 > 0 -> bands 0
    assert all(rows["empty"][f"b{j}"] == 0 for j in range(4))
    assert all(
        0 <= rows[p][f"b{j}"] < 65536 for p in rows for j in range(4)
    )


def test_resize_plan_arithmetic(spark):
    """Aspect-preserving target dims: landscape pins width to max_dim,
    portrait pins height, squares pin both, small rows pass through,
    extreme ratios floor at 1 — all exact integer division."""
    from data_ingestion_din_spark.sources.binary import resize_plan

    meta = spark.createDataFrame(
        [
            ("landscape", 200, 100),
            ("portrait", 100, 200),
            ("square", 150, 150),
            ("small", 30, 20),
            ("sliver", 256, 2),
        ],
        "path string, width int, height int",
    )
    rows = {
        r.path: (r.scaled, r.target_w, r.target_h)
        for r in resize_plan(meta, max_dim=64).collect()
    }
    assert rows["landscape"] == (True, 64, 32)
    assert rows["portrait"] == (True, 32, 64)
    assert rows["square"] == (True, 64, 64)
    assert rows["small"] == (False, 30, 20)
    assert rows["sliver"] == (True, 64, 1)  # short side floors at 1
