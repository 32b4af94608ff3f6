"""Real media codecs, stdlib-only: PNG (grayscale-8) and WAV (PCM16).

The multimodal operators default to deterministic arithmetic stubs
because this environment ships no Pillow/soundfile — but "the container
has no image library" must not mean "the real decode path is never
driver-checked".  These are REAL codecs built on the public formats and
the standard library alone:

* PNG per the public specification (RFC 2083 / ISO 15948): chunk
  framing with CRC-32 validation, zlib-inflated IDAT, and per-scanline
  filter reconstruction (None/Sub/Up are emitted by the encoder, all
  five filter types are reconstructed by the decoder).
* WAV via the stdlib ``wave`` module (RIFF/WAVE PCM): a genuine
  container parse — frames, channels, sample rate — plus an int16
  sample checksum from the decoded PCM stream.

The planted fixtures derive every dimension and sample value from
``doc_id`` alone, so a DuckDB oracle recomputes the expected decode
output integer-exactly (see queries/llm.py mm_decode_png_real /
mm_audio_wav_real): a decoder that mis-parses a chunk length, skips CRC,
mis-applies a Sub/Up filter, or drops a frame hash-mismatches.

The reference format has no media layer (it is a columnar container,
/root/reference/src/root.zig:9-16); this module backs the engine's
multimodal extension surface (ops/multimodal.py).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from binascii import crc32

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode_gray(rows: "list[bytes]") -> bytes:
    """Encode a grayscale-8 image (list of equal-length scanlines) as a
    real PNG.  Filter choice alternates Sub (1) on even rows and Up (2)
    on odd rows — so a decoder that fakes filter reconstruction cannot
    round-trip the pixels."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    if h == 0 or w == 0 or any(len(r) != w for r in rows):
        raise ValueError("need a non-empty rectangular scanline list")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = bytearray()
    prev = bytes(w)
    for y, row in enumerate(rows):
        if y % 2 == 0:  # Sub: delta vs left neighbour
            raw.append(1)
            left = 0
            for b in row:
                raw.append((b - left) & 0xFF)
                left = b
        else:  # Up: delta vs the row above
            raw.append(2)
            raw.extend((b - p) & 0xFF for b, p in zip(row, prev))
        prev = row
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode_gray(data: bytes) -> "tuple[int, int, int, int]":
    """Decode a grayscale-8 PNG: returns (width, height, bit_depth,
    pixel_sum).  Full real-codec path — signature, chunk walk with
    CRC-32 verification, zlib inflate, and reconstruction of all five
    PNG filter types.  Raises ValueError on anything malformed."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = depth = None
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, color = struct.unpack(">IIBB", body[:10])
            if depth != 8 or color != 0:
                raise ValueError("decoder handles grayscale-8 only")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if width is None or not seen_end:
        raise ValueError("missing IHDR or IEND")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (width + 1) * height:
        raise ValueError("pixel data length mismatch")
    px_sum = 0
    prev = bytes(width)
    view = memoryview(raw)
    for y in range(height):
        ftype = view[y * (width + 1)]
        line = bytearray(view[y * (width + 1) + 1 : (y + 1) * (width + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(width):
                left = line[x - 1] if x else 0
                line[x] = (line[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(width):
                a = line[x - 1] if x else 0
                b = prev[x]
                c = prev[x - 1] if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        px_sum += sum(line)
        prev = bytes(line)
    return width, height, depth, px_sum


def wav_encode_pcm16(samples: "list[int]", n_channels: int, framerate: int) -> bytes:
    """Encode interleaved int16 samples as a real RIFF/WAVE file via the
    stdlib ``wave`` writer."""
    if len(samples) % n_channels:
        raise ValueError("sample count must be a multiple of n_channels")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode_info(data: bytes) -> "tuple[int, int, int, int]":
    """Parse a RIFF/WAVE container with the stdlib ``wave`` reader:
    returns (n_frames, n_channels, framerate, sample_sum) where
    sample_sum is the exact int sum of every decoded int16 sample.
    Raises on malformed containers or non-16-bit PCM."""
    with wave.open(io.BytesIO(data), "rb") as r:
        if r.getsampwidth() != 2:
            raise ValueError("decoder handles 16-bit PCM only")
        n_frames = r.getnframes()
        n_channels = r.getnchannels()
        rate = r.getframerate()
        pcm = r.readframes(n_frames)
    n = len(pcm) // 2
    if n != n_frames * n_channels:
        raise ValueError("PCM payload shorter than declared frame count")
    return n_frames, n_channels, rate, sum(struct.unpack(f"<{n}h", pcm))
