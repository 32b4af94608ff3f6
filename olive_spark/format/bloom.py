"""Per-file Bloom filters — an equality-pruning extension.

The reference stores no statistics at all (SURVEY.md §4); our min/max
page stats already prune range predicates, but min/max is useless for
point lookups on high-cardinality, roughly-uniform columns (ids,
hashes): every file's [min, max] spans the whole domain.  A small Bloom
filter per (file, column) lets the scan planner disprove `col = v` /
`col IN (...)` for a file without opening its data section — at 100 TB
that turns a point lookup from "touch every file's pages" into "touch
the handful of files whose filter fires" (false-positive rate ~0.8% at
10 bits/value, k=7).

Layout: stored in the (JSON) chunk header per top-level field as
``{"m": n_bits, "k": n_hashes, "b64": base64(bitmap)}``.  Readers that
don't know the key ignore it — the format stays readable by older code.

Hashing: md5(canonical bytes) → two independent 64-bit halves, probed
via double hashing h1 + i·h2 (Kirsch–Mitzenmacher).  md5 is used as a
stable, dependency-free 128-bit mix, not for security.
"""

from __future__ import annotations

import base64
import hashlib
import math
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BITS_PER_VALUE = 10  # ~0.8% false positives at k=7
_MAX_VALUES = 1 << 22  # cap builder memory on pathological chunks


def _canonical_bytes(v: Any) -> Optional[bytes]:
    """Stable byte encoding of a value for hashing; None = unhashable
    (the filter is then built/probed without it — conservative)."""
    if v is None:
        return None
    if isinstance(v, bool):  # before int: bool is an int subclass
        return b"\x01" if v else b"\x00"
    if isinstance(v, (int, np.integer)):
        return int(v).to_bytes(16, "little", signed=True)
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return None


def _positions(data: bytes, m: int, k: int) -> "np.ndarray":
    d = hashlib.md5(data).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full-period stride
    return (h1 + np.arange(k, dtype=np.uint64) * np.uint64(h2)) % np.uint64(m)


_BLOOM_OK = (
    pa.types.is_integer,
    pa.types.is_string,
    pa.types.is_large_string,
    pa.types.is_binary,
    pa.types.is_large_binary,
    pa.types.is_fixed_size_binary,
)


def supported_type(dt: pa.DataType) -> bool:
    return any(p(dt) for p in _BLOOM_OK)


def build_bloom(arr: pa.Array, bits_per_value: int = _BITS_PER_VALUE) -> Optional[dict]:
    """Build a Bloom filter over the distinct non-null values of ``arr``.
    Returns None when the column type is unsupported or the chunk is
    empty (no filter beats a useless filter)."""
    if not supported_type(arr.type):
        return None
    try:
        vals = pc.unique(arr.drop_null())
    except Exception:  # noqa: BLE001 — unsupported nested/exotic arrays
        return None
    n = len(vals)
    if n == 0 or n > _MAX_VALUES:
        return None
    m = max(64, 1 << math.ceil(math.log2(n * bits_per_value)))
    k = 7
    bits = np.zeros(m // 8, dtype=np.uint8)
    for v in vals.to_pylist():
        b = _canonical_bytes(v)
        if b is None:
            return None  # a value we can't hash poisons the whole filter
        pos = _positions(b, m, k)
        np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
    return {"m": int(m), "k": int(k), "b64": base64.b64encode(bits.tobytes()).decode("ascii")}


def might_contain(bloom: dict, value: Any) -> bool:
    """False ONLY when the value is definitely absent.  Any malformed
    filter (hostile header bytes) reads as "might contain" — pruning
    must never turn corruption into silent row loss."""
    try:
        m, k = int(bloom["m"]), int(bloom["k"])
        bits = np.frombuffer(base64.b64decode(bloom["b64"]), dtype=np.uint8)
        if m <= 0 or k <= 0 or len(bits) * 8 < m:
            return True
        b = _canonical_bytes(value)
        if b is None:
            return True
        pos = _positions(b, m, k)
        return bool(np.all(bits[pos // 8] & (1 << (pos % 8)).astype(np.uint8)))
    except Exception:  # noqa: BLE001
        return True
