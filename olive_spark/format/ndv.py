"""Per-file HyperLogLog NDV sketches: metadata-only approx
COUNT(DISTINCT col).

Opt-in at write time (``.option("ndvColumns", "col[,col2]")``): every
chunk file's manifest entry gains a 1 KiB register array per requested
column, and ``ops.maintenance.approx_distinct`` answers the
table-level (or snapshot-level) distinct-count question by merging the
registers driver-side — no Spark job, no data pages, the same one-GET
plan-time story as the stats manifest and ``count_rows``.  HLL
registers merge by element-wise max, so the estimate is
partition-order- and file-boundary-independent by construction.

Geometry: p=10 → 1024 registers ≈ 3.2 % standard error — chosen so a
million-file table's sketches stay ~1.4 GiB of manifest (opt-in
columns only), not the 4× of p=12.  Hashing uses pandas'
deterministic vectorized hasher; sketches are self-consistent within
an environment, and cross-environment merges (different pandas major
versions) degrade gracefully toward overestimation rather than
failing.  The reference stores no statistics at all
(/root/reference/src/header.zig stores layout only); NDV sketches are
this engine's extension, the stats a query planner's join-size and
distinct-rollup decisions feed on at 100 TB.
"""

from __future__ import annotations

import base64

P = 10
M = 1 << P  # 1024 registers
_ALPHA = 0.7213 / (1.0 + 1.079 / M)  # standard HLL bias constant, m>=128


def sketch_from_array(arr) -> bytes:
    """HLL registers (M bytes) for a pyarrow Array/ChunkedArray.
    Nulls are ignored (NDV counts values, like COUNT(DISTINCT)).

    Nulls are dropped ARROW-side, before the pandas conversion: a
    nullable int64 chunk would otherwise convert to float64 while a
    null-free chunk of the same column converts to int64, and pandas
    hashes int64 5 and float64 5.0 differently — per-file sketches of
    the same logical column would then disagree on shared values and
    the merged estimate double-counts (and ints above 2^53 would
    collapse).  Dictionary arrays hash their decoded values, so
    encoded and plain files sketch identically."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    arr = pc.drop_null(arr)
    regs = np.zeros(M, dtype=np.uint8)
    if len(arr) == 0:
        return regs.tobytes()
    s = arr.to_pandas()
    if isinstance(s, pd.DataFrame):  # never for flat columns
        raise TypeError("sketch_from_array expects a flat column")
    h = pd.util.hash_pandas_object(s, index=False).to_numpy(
        dtype=np.uint64, copy=False
    )
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - P)) - 1)
    # rho = leading-zero count of the low 64-P bits, + 1; w == 0 gets
    # the maximum.  float64 log2 is exact enough below 2^54 and any
    # boundary rounding is CONSISTENT across files, so merges stay sound
    rho = np.full(h.shape, 64 - P + 1, dtype=np.uint8)
    nz = w > 0
    bits = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
    rho[nz] = ((64 - P) - bits).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs.tobytes()


def merge_sketches(blobs) -> bytes:
    """Element-wise max of register arrays — the HLL union."""
    import numpy as np

    out = np.zeros(M, dtype=np.uint8)
    for b in blobs:
        if len(b) != M:
            raise ValueError(
                f"NDV sketch has {len(b)} registers, expected {M} — "
                "written by a different geometry; rewrite or re-compact"
            )
        np.maximum(out, np.frombuffer(b, dtype=np.uint8), out=out)
    return out.tobytes()


def estimate(blob: bytes) -> int:
    """Standard HLL estimator with the small-range linear-counting
    correction (no large-range correction needed with 64-bit hashes)."""
    import numpy as np

    regs = np.frombuffer(blob, dtype=np.uint8)
    est = _ALPHA * M * M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * M and zeros > 0:
        est = M * np.log(M / zeros)
    return int(round(float(est)))


def encode(blob: bytes) -> str:
    return base64.b64encode(blob).decode("ascii")


def decode(s: str) -> bytes:
    return base64.b64decode(s.encode("ascii"))
