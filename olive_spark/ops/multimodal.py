"""Multimodal column handling (SURVEY.md north star).

Image/audio/video payloads are opaque ``binary`` columns plus typed
metadata structs. The Spark-side plumbing — schema, Arrow batching,
``mapInPandas`` UDF signatures, partition-preserving decode — is real and
tested.  Codec work is selected per call: the default ``codec="stub"``
is deterministic arithmetic (reproducible by the SQL oracles; this
container ships no image/audio libraries), while ``codec="real"``
decodes with Pillow / soundfile behind guarded imports that raise a
clear ImportError when the library is absent.  The stub stays the
default even where the libraries exist, because the correctness oracles
pin the stub arithmetic.

At 100 TB the pattern is: binary payloads stay in their scan partitions,
decode/feature-extract runs as Arrow-batched ``mapInPandas`` (one Python
roundtrip per batch, not per row), and only small extracted features ever
shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int, ok boolean"
)


def _require_pil():
    """Guarded import of the real image codec.  The stub stays the
    DEFAULT even when Pillow is installed: every multimodal query's
    DuckDB oracle reproduces the stub arithmetic, so silently
    auto-switching codecs would flip correct pipelines to hash-mismatch
    the moment a library appears on the image."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError as exc:
        raise ImportError(
            "codec='real' needs Pillow, which is not installed; "
            "use the default codec='stub' (deterministic arithmetic) "
            "or install pillow"
        ) from exc


def _require_soundfile():
    """Guarded import of the real audio codec (see _require_pil)."""
    try:
        import soundfile  # noqa: PLC0415

        return soundfile
    except ImportError as exc:
        raise ImportError(
            "codec='real' needs soundfile, which is not installed; "
            "use the default codec='stub' (16-bit-PCM byte math) "
            "or install soundfile"
        ) from exc


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB: deterministic fake for the image/video decoder.

    A real deployment plugs Pillow/ffmpeg here (not available in this
    container). Kept pure-arithmetic so the correctness oracle can
    reproduce it in SQL: width/height/frames derive only from byte length.
    """
    n = len(payload)
    return (n % 512) + 16, ((n * 7) % 512) + 16, (n % 30) + 1


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat utf-8 bytes of a text column as an opaque binary payload —
    the testdata has no real media, but the plumbing is payload-agnostic."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    codec: str = "stub",
) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) partitions.
    Binary stays partition-local; output is a narrow metadata table.

    ``codec="stub"`` (default): deterministic arithmetic the SQL oracle
    reproduces.  ``codec="real"``: Pillow decode (width/height/n_frames
    from the actual image bytes; undecodable payloads → ok=false) —
    raises a clear ImportError where Pillow isn't installed."""
    import pandas as pd

    if codec not in ("stub", "real"):
        raise ValueError(f"codec must be 'stub' or 'real', got {codec!r}")
    if codec == "real":
        _require_pil()  # fail at plan time, not inside executors

    src = df.select(id_col, payload_col)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            meta = [_fake_decode(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "ok": [p is not None for p in payloads],
                }
            )

    def decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _require_pil()
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "n_bytes", "width", "height", "n_frames", "ok")}
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(did)
                rows["n_bytes"].append(len(p) if p is not None else 0)
                try:
                    with Image.open(io.BytesIO(p)) as img:
                        rows["width"].append(img.width)
                        rows["height"].append(img.height)
                        rows["n_frames"].append(getattr(img, "n_frames", 1))
                        rows["ok"].append(True)
                except Exception:  # noqa: BLE001 — corrupt payloads are data
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["n_frames"].append(0)
                    rows["ok"].append(False)
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode_real if codec == "real" else decode, DECODE_SCHEMA)


def audio_windows(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    window: int = 1024, hop: int = 512, codec: str = "stub",
) -> DataFrame:
    """Audio windower: the strided analysis-window count per clip (the
    shape every feature-extraction pipeline needs before STFT).

    ``codec="stub"`` (default) treats the payload as 16-bit PCM —
    sample math the SQL oracle reproduces:

        n_samples = n_bytes // 2
        n_windows = 0 if n_samples < window else (n_samples-window)//hop + 1

    ``codec="real"`` decodes the container with soundfile (n_samples
    from actual frames; undecodable → 0 samples) — raises a clear
    ImportError where soundfile isn't installed."""
    import pandas as pd

    if codec not in ("stub", "real"):
        raise ValueError(f"codec must be 'stub' or 'real', got {codec!r}")
    if codec == "real":
        _require_soundfile()  # fail at plan time, not inside executors

    src = df.select(id_col, payload_col)
    schema = "doc_id long, n_samples long, n_windows long"

    def n_windows(n_samples: int) -> int:
        return 0 if n_samples < window else (n_samples - window) // hop + 1

    def win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, samples, wins = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                n = (len(p) if p is not None else 0) // 2
                ids.append(did)
                samples.append(n)
                wins.append(n_windows(n))
            yield pd.DataFrame(
                {"doc_id": ids, "n_samples": samples, "n_windows": wins}
            )

    def win_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        sf_mod = _require_soundfile()
        for pdf in batches:
            ids, samples, wins = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    info = sf_mod.info(io.BytesIO(p))
                    n = int(info.frames)
                except Exception:  # noqa: BLE001 — corrupt payloads are data
                    n = 0
                ids.append(did)
                samples.append(n)
                wins.append(n_windows(n))
            yield pd.DataFrame(
                {"doc_id": ids, "n_samples": samples, "n_windows": wins}
            )

    return src.mapInPandas(win_real if codec == "real" else win, schema)


def image_resize(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    target: int = 64, codec: str = "stub",
) -> DataFrame:
    """STUB image resize: aspect-preserving fit into a ``target``-square
    box.  Source dims come from the deterministic fake decoder
    (_fake_decode); the resize arithmetic is integer-only so the oracle
    reproduces it in SQL:

        out_w, out_h = (t, max(1, h*t//w)) if w >= h else (max(1, w*t//h), t)
        n_thumb_bytes = out_w * out_h          (grayscale stub)

    A real deployment swaps the body for Pillow's ``Image.resize`` —
    the Arrow-batched mapInPandas shape (binary in, narrow metadata +
    thumbnail payload out, no shuffle) is the part that carries to
    100 TB: payloads never leave their scan partitions and only
    target²-byte thumbnails continue down the pipeline."""
    import numpy as np
    import pandas as pd

    if codec not in ("stub", "real"):
        raise ValueError(f"codec must be 'stub' or 'real', got {codec!r}")
    if codec == "real":
        _require_pil()  # fail at plan time, not inside executors

    src = df.select(id_col, payload_col)
    schema = (
        "doc_id long, width int, height int, out_w int, out_h int, "
        "n_thumb_bytes int"
    )

    def fit(w: int, h: int) -> tuple[int, int]:
        if w >= h:
            return target, max(1, h * target // w)
        return max(1, w * target // h), target

    def resize_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _require_pil()
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "out_w", "out_h",
                     "n_thumb_bytes")}
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(did)
                try:
                    with Image.open(io.BytesIO(p)) as img:
                        w, h = img.width, img.height
                        ow, oh = fit(w, h)
                        thumb = img.resize((ow, oh))
                        nb = len(thumb.tobytes())
                except Exception:  # noqa: BLE001 — corrupt payloads are data
                    w = h = ow = oh = nb = 0
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_w"].append(ow)
                rows["out_h"].append(oh)
                rows["n_thumb_bytes"].append(nb)
            yield pd.DataFrame(rows)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = np.array(
                [len(p) if p is not None else 0 for p in pdf[payload_col]],
                dtype=np.int64,
            )
            w = n % 512 + 16
            h = (n * 7) % 512 + 16
            wide = w >= h
            out_w = np.where(wide, target, np.maximum(1, w * target // h))
            out_h = np.where(wide, np.maximum(1, h * target // w), target)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": w.astype(np.int32),
                    "height": h.astype(np.int32),
                    "out_w": out_w.astype(np.int32),
                    "out_h": out_h.astype(np.int32),
                    "n_thumb_bytes": (out_w * out_h).astype(np.int32),
                }
            )

    return src.mapInPandas(resize_real if codec == "real" else resize, schema)


def decode_png_meta(
    df: DataFrame, payload_col: str = "png", id_col: str = "doc_id",
) -> DataFrame:
    """REAL image decode, no external libraries: parse actual PNG bytes
    with the stdlib-only codec (ops/media_codecs.py — chunk walk,
    CRC-32 verification, zlib inflate, scanline filter reconstruction)
    and emit (width, height, bit_depth, px_sum, ok).  Malformed
    payloads are data, not errors: ok=false, zeros.

    Same 100 TB shape as the stub path: payloads stay in their scan
    partitions, decode is Arrow-batched ``mapInPandas``, and only the
    narrow metadata row continues down the pipeline."""
    import pandas as pd

    from olive_spark.ops.media_codecs import png_decode_gray

    src = df.select(id_col, payload_col)
    schema = "doc_id long, width int, height int, bit_depth int, px_sum long, ok boolean"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "width", "height", "bit_depth", "px_sum", "ok")}
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(did)
                try:
                    w, h, d, s = png_decode_gray(p if p is not None else b"")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["bit_depth"].append(d)
                    rows["px_sum"].append(s)
                    rows["ok"].append(True)
                except Exception:  # noqa: BLE001 — corrupt payloads are data
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["bit_depth"].append(0)
                    rows["px_sum"].append(0)
                    rows["ok"].append(False)
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode, schema)


def decode_wav_meta(
    df: DataFrame, payload_col: str = "wav", id_col: str = "doc_id",
    window: int = 256, hop: int = 128,
) -> DataFrame:
    """REAL audio decode via the stdlib ``wave`` RIFF parser
    (ops/media_codecs.py): (n_frames, n_channels, framerate,
    sample_sum) from the actual PCM stream, plus the strided
    analysis-window count over decoded frames.  Malformed payloads →
    ok=false, zeros.  Arrow-batched mapInPandas, partition-local."""
    import pandas as pd

    from olive_spark.ops.media_codecs import wav_decode_info

    src = df.select(id_col, payload_col)
    schema = (
        "doc_id long, n_frames long, n_channels int, framerate int, "
        "sample_sum long, n_windows long, ok boolean"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "n_frames", "n_channels", "framerate",
                     "sample_sum", "n_windows", "ok")}
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(did)
                try:
                    nf, ch, rate, ssum = wav_decode_info(
                        p if p is not None else b""
                    )
                    nw = 0 if nf < window else (nf - window) // hop + 1
                    rows["n_frames"].append(nf)
                    rows["n_channels"].append(ch)
                    rows["framerate"].append(rate)
                    rows["sample_sum"].append(ssum)
                    rows["n_windows"].append(nw)
                    rows["ok"].append(True)
                except Exception:  # noqa: BLE001 — corrupt payloads are data
                    for k in ("n_frames", "n_channels", "framerate",
                              "sample_sum", "n_windows"):
                        rows[k].append(0)
                    rows["ok"].append(False)
            yield pd.DataFrame(rows)

    return src.mapInPandas(decode, schema)


def frame_sample(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
                 every_n: int = 10) -> DataFrame:
    """STUB frame sampler: emits one row per sampled 'frame' with a
    deterministic byte-slice as the frame payload. Real ffmpeg decode
    would replace the slicing; the explode/batch shape is the real part."""
    import pandas as pd

    src = df.select(id_col, payload_col)
    schema = "doc_id long, frame_no int, frame_bytes binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, blobs = [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                n_frames = (len(p) % 30) + 1
                for fi in range(0, n_frames, every_n):
                    ids.append(did)
                    frames.append(fi)
                    start = (fi * 97) % max(len(p), 1)
                    blobs.append(bytes(p[start : start + 16]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": frames, "frame_bytes": blobs}
            )

    return src.mapInPandas(sample, schema)


PHASH_SCHEMA = "doc_id long, phash long"


def _stub_pixels(payload: bytes, side: int) -> "object":
    """STUB pixel decode: tile the payload bytes into a side x side
    grayscale image (repeat to fill, like the other stub codecs a
    container without Pillow uses).  Content-sensitive by construction:
    payloads differing in one byte differ in a handful of pixels, so
    near-identical payloads land at small Hamming distance — which is
    what the planted-pair tests pin."""
    import numpy as np

    n = side * side
    raw = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    reps = -(-n // len(raw))
    return np.tile(raw, reps)[:n].reshape(side, side).astype(np.float64)


def _dct_matrix(n: int) -> "object":
    """Orthonormal DCT-II basis (the JPEG/pHash transform), built once
    per executor and applied as two matmuls — no scipy dependency."""
    import numpy as np

    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * x + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def phash64(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    codec: str = "stub", img_size: int = 32, hash_size: int = 8,
) -> DataFrame:
    """64-bit perceptual hash (pHash) per binary payload: decode to
    ``img_size``² grayscale, 2-D DCT, keep the top-left ``hash_size``²
    low-frequency block, threshold against its median (DC term
    excluded) → one bit per coefficient.  Perceptually-close images
    agree on most low-frequency signs, so near-duplicates land at small
    Hamming distance — the image-side analogue of MinHash for text.

    ``codec="stub"`` (default): deterministic byte-tiling decode the
    tests pin (this container has no image libs); ``codec="real"``:
    Pillow ``convert("L").resize(...)``.  Arrow-batched mapInPandas;
    the DCT is two (32×32)·(32×32) matmuls per image against a
    per-executor cached basis — microseconds; payloads never shuffle,
    only (id, 64-bit hash) leaves the scan."""
    import pandas as pd

    if codec not in ("stub", "real"):
        raise ValueError(f"codec must be 'stub' or 'real', got {codec!r}")
    if codec == "real":
        _require_pil()

    src = df.select(id_col, payload_col)

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import numpy as np

        dct = _dct_matrix(img_size)
        Image = _require_pil() if codec == "real" else None
        for pdf in batches:
            ids, hashes = [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                if codec == "real":
                    try:
                        with Image.open(io.BytesIO(p)) as img:
                            g = np.asarray(
                                img.convert("L").resize((img_size, img_size)),
                                dtype=np.float64,
                            )
                    except Exception:  # noqa: BLE001 — corrupt payload
                        g = np.zeros((img_size, img_size))
                else:
                    g = _stub_pixels(p, img_size)
                coeffs = (dct @ g @ dct.T)[:hash_size, :hash_size]
                flat = coeffs.flatten()
                med = np.median(flat[1:])  # DC term excluded
                bits = flat > med
                h = 0
                for b in bits:
                    h = (h << 1) | int(b)
                # two's-complement into int64 for Spark's LongType
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(did)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return src.mapInPandas(compute, PHASH_SCHEMA)


def phash_pairs(
    hashes: DataFrame, max_hamming: int = 6, n_bands: int = 8,
) -> DataFrame:
    """All (a_id, b_id, hamming) pairs of pHashes within ``max_hamming``
    bits — WITHOUT an all-pairs product, via band blocking: split the
    64-bit hash into ``n_bands`` byte bands; two hashes within
    ``max_hamming < n_bands`` MUST agree on at least one whole band
    (pigeonhole), so candidates come from an equi-join on
    (band_index, band_value) and only candidates pay the exact
    ``bit_count(xor)`` check — the same blocked-join shape as the
    MinHash-LSH text path (ops/dedup.py).

    100 TB shape: the shuffle key is (band, byte) over slim (id, hash)
    rows — 8 rows per image, never pixels; the exact filter is a JVM
    ``bit_count`` expression.  Requires ``max_hamming < n_bands`` or
    completeness breaks (enforced)."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"band blocking is complete only for max_hamming < n_bands "
            f"({max_hamming} >= {n_bands}) — raise n_bands"
        )
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = hashes.select(
        F.col("doc_id"),
        F.col("phash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("phash"), i * width)
                    .bitwiseAND(F.lit(mask)).alias("val"),
                )
                for i in range(n_bands)
            ])
        ).alias("b"),
    ).select("doc_id", "phash", "b.band", "b.val")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
