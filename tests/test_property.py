"""Property-based roundtrip tests (SURVEY.md §5 — mirrors the
reference's fuzz strategy src/fuzz.zig:63-151: arbitrary schema →
arbitrary data → write → read → structural equality), via Hypothesis
over pyarrow tables.

Bounds follow the reference's generator (src/fuzz_input.zig:17,82):
nesting depth ≤ 3 here (8 upstream — deep nesting is slow in pure
Python), ≤ 255 rows, 1–4 fields.
"""

from __future__ import annotations

import pyarrow as pa
from hypothesis import HealthCheck, given, settings, strategies as st

from olive_spark.format import OliveError, read_all_tables, read_chunk, write_chunk

SCALARS = [
    (pa.int8(), st.integers(-128, 127)),
    (pa.int64(), st.integers(-(2**63), 2**63 - 1)),
    (pa.uint32(), st.integers(0, 2**32 - 1)),
    (pa.float64(), st.floats(allow_nan=False, width=64)),
    (pa.bool_(), st.booleans()),
    (pa.string(), st.text(max_size=40)),
    (pa.binary(), st.binary(max_size=40)),
    (pa.binary(20), st.binary(min_size=20, max_size=20)),
    (pa.binary(32), st.binary(min_size=32, max_size=32)),
    (pa.timestamp("us"), st.integers(-(2**52), 2**52)),
]


@st.composite
def column(draw, depth: int = 0):
    dt, elems = draw(st.sampled_from(SCALARS))
    base = st.one_of(st.none(), elems)
    if depth < 2 and draw(st.booleans()):
        if draw(st.booleans()):
            dt = pa.list_(dt)
            base = st.one_of(st.none(), st.lists(base, max_size=4))
        else:
            dt = pa.struct([pa.field("a", dt)])
            base = st.one_of(
                st.none(), st.fixed_dictionaries({"a": base})
            )
    return dt, base


@st.composite
def table(draw):
    n_fields = draw(st.integers(1, 4))
    n_rows = draw(st.integers(0, 255))
    arrays, fields = [], []
    for i in range(n_fields):
        dt, elems = draw(column())
        vals = draw(
            st.lists(elems, min_size=n_rows, max_size=n_rows)
        )
        if pa.types.is_timestamp(dt):
            arr = pa.array(
                [None if v is None else int(v) for v in vals], pa.int64()
            ).cast(dt)
        else:
            arr = pa.array(vals, dt)
        arrays.append(arr)
        fields.append(pa.field(f"f{i}", dt))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


@given(t=table(), page_rows=st.sampled_from([7, 64, 100000]))
@settings(
    max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_roundtrip_property(t: pa.Table, page_rows: int):
    got = read_all_tables(write_chunk({"t": t}, page_rows=page_rows))["t"]
    assert got.schema.equals(t.schema)
    assert got.equals(t)


@given(t=table(), data=st.data())
@settings(
    max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_hostile_bytes_property(t: pa.Table, data):
    """Bit-flipped chunks must raise typed OliveError or return valid
    tables — never crash (reference src/fuzz.zig:12-61)."""
    blob = bytearray(write_chunk({"t": t}))
    n_flips = data.draw(st.integers(1, 8))
    for _ in range(n_flips):
        i = data.draw(st.integers(0, len(blob) - 1))
        blob[i] ^= 1 << data.draw(st.integers(0, 7))
    try:
        read_chunk(bytes(blob))
    except OliveError:
        pass


@given(data=st.data())
@settings(max_examples=100, deadline=None)
def test_sliced_list_offsets_property(data):
    """For ANY slice of ANY list array, the rebased (offsets, values)
    pair must reproduce exactly the sliced lists — the contract every
    reduceat consumer (minhash, simhash) depends on."""
    import numpy as np

    from olive_spark.ops.dedup import _list_offsets_values

    lists = data.draw(
        st.lists(st.lists(st.integers(-2**40, 2**40), max_size=6), max_size=12)
    )
    la = pa.array(lists, pa.list_(pa.int64()))
    start = data.draw(st.integers(0, len(lists)))
    length = data.draw(st.integers(0, len(lists) - start))
    s = la.slice(start, length)
    off, vals = _list_offsets_values(s)
    rebuilt = [
        vals[off[i]:off[i + 1]].tolist() for i in range(len(off) - 1)
    ]
    assert rebuilt == lists[start:start + length]
    if len(vals):
        # reduceat over non-empty rows gives per-list minima
        lens = np.diff(off)
        nz = np.nonzero(lens > 0)[0]
        if nz.size:
            mins = np.minimum.reduceat(vals, off[nz])
            expect = [min(lists[start + i]) for i in nz]
            assert mins.tolist() == expect
