"""Unit tests pinning multimodal-stub semantics on handcrafted payloads
(the oracle harness checks corpus-sized runs; these pin the edge cases:
wide vs tall aspect fits, the degenerate 1-pixel clamp, null payloads)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s


def test_image_resize_aspect_fit(spark):
    from olive_spark.ops.multimodal import attach_binary_payload, image_resize

    # byte length n -> width = n%512+16, height = (7n)%512+16
    # n=100: w=116, h=188 (tall);  n=512: w=16+0? 512%512=0 -> w=16, h=(3584)%512=0 -> h=16 (square)
    df = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 512), (3, "z" * 300)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in
            image_resize(attach_binary_payload(df)).collect()}

    r1 = rows[1]  # tall: out_h pinned to 64, out_w scaled down
    assert (r1["width"], r1["height"]) == (116, 204)
    assert r1["out_h"] == 64 and r1["out_w"] == 116 * 64 // 204
    assert r1["n_thumb_bytes"] == r1["out_w"] * r1["out_h"]

    r2 = rows[2]  # square: w == h -> both 64
    assert (r2["width"], r2["height"]) == (16, 16)
    assert (r2["out_w"], r2["out_h"]) == (64, 64)

    r3 = rows[3]  # wide: 300%512+16=316, (2100)%512+16=68
    assert (r3["width"], r3["height"]) == (316, 68)
    assert r3["out_w"] == 64 and r3["out_h"] == 68 * 64 // 316


def test_image_resize_clamps_to_one_pixel(spark):
    from pyspark.sql import functions as F

    from olive_spark.ops.multimodal import image_resize

    # extreme aspect ratio: w=527, h=17 -> out_h = 17*64//527 = 2; and a
    # synthetic near-degenerate one via empty payload (w=16,h=16 square)
    df = spark.createDataFrame([(1, b"")], ["doc_id", "payload"]).withColumn(
        "payload", F.col("payload").cast("binary")
    )
    r = image_resize(df).collect()[0]
    assert (r["width"], r["height"]) == (16, 16)
    assert (r["out_w"], r["out_h"]) == (64, 64)


def _has_lib(name):
    try:
        __import__(name)
        return True
    except ImportError:
        return False


def test_real_codec_guarded_import(spark):
    """codec='real' must either work (library present) or fail at plan
    time with a clear ImportError naming the missing library — never a
    mid-job executor crash; and the stub default must stay unaffected."""
    from olive_spark.ops.multimodal import audio_windows, decode_metadata, image_resize

    df = spark.createDataFrame([(1, b"abcdef" * 100)], ["doc_id", "payload"])
    if not _has_lib("PIL"):
        with pytest.raises(ImportError, match="Pillow"):
            decode_metadata(df, codec="real")
        with pytest.raises(ImportError, match="Pillow"):
            image_resize(df, codec="real")
    else:
        # payload isn't a real image: real decode flags it, never crashes
        r = decode_metadata(df, codec="real").collect()[0]
        assert r["ok"] is False and r["n_bytes"] == 600
    if not _has_lib("soundfile"):
        with pytest.raises(ImportError, match="soundfile"):
            audio_windows(df, codec="real")
    else:
        r = audio_windows(df, codec="real").collect()[0]
        assert r["n_samples"] == 0  # not a decodable container
    with pytest.raises(ValueError, match="codec"):
        decode_metadata(df, codec="ffmpeg")
    # stub defaults still deterministic
    r = decode_metadata(df).collect()[0]
    assert (r["width"], r["height"]) == (600 % 512 + 16, (600 * 7) % 512 + 16)


def test_real_codec_image_decode_and_resize(spark):
    """Runs the codec='real' Pillow branch where Pillow exists (skips
    otherwise): genuine PNG bytes decode to true dimensions, resize
    preserves aspect, and corrupt payloads surface as ok=false rows
    rather than task failures."""
    Image = pytest.importorskip("PIL.Image")
    import io

    from olive_spark.ops.multimodal import decode_metadata, image_resize

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.new("L", (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, png_bytes(100, 40)),
        (2, png_bytes(30, 90)),
        (3, b"not an image at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    got = {r["doc_id"]: r for r in decode_metadata(df, codec="real").collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["ok"]) == (100, 40, True)
    assert (got[2]["width"], got[2]["height"], got[2]["ok"]) == (30, 90, True)
    assert got[3]["ok"] is False and got[3]["width"] == 0

    rs = {r["doc_id"]: r for r in
          image_resize(df, target=64, codec="real").collect()}
    # aspect fit: 100x40 -> 64x25 (h*t//w), 30x90 -> 21x64 (w*t//h)
    assert (rs[1]["out_w"], rs[1]["out_h"]) == (64, 40 * 64 // 100)
    assert (rs[2]["out_w"], rs[2]["out_h"]) == (30 * 64 // 90, 64)
    assert rs[1]["n_thumb_bytes"] == rs[1]["out_w"] * rs[1]["out_h"]  # mode L
    assert (rs[3]["out_w"], rs[3]["out_h"], rs[3]["n_thumb_bytes"]) == (0, 0, 0)


def test_real_codec_audio_windows(spark):
    """Runs the codec='real' soundfile branch where soundfile exists
    (skips otherwise): a genuine WAV container reports its true frame
    count (not the byte-math stub), corrupt payloads yield 0 windows."""
    sf_mod = pytest.importorskip("soundfile")
    import io

    import numpy as np

    from olive_spark.ops.multimodal import audio_windows

    def wav_bytes(n_samples):
        buf = io.BytesIO()
        sf_mod.write(buf, np.zeros(n_samples, dtype=np.float32), 16000,
                     format="WAV", subtype="PCM_16")
        return buf.getvalue()

    rows = [(1, wav_bytes(5000)), (2, wav_bytes(100)), (3, b"xx")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in
           audio_windows(df, window=1024, hop=512, codec="real").collect()}
    assert got[1]["n_samples"] == 5000
    assert got[1]["n_windows"] == (5000 - 1024) // 512 + 1
    assert (got[2]["n_samples"], got[2]["n_windows"]) == (100, 0)
    assert (got[3]["n_samples"], got[3]["n_windows"]) == (0, 0)
