"""Arrow logical type ⇄ JSON serialization for olive headers.

The reference takes the schema as an *input* on both write and read and
type-checks every array header against it (reference src/read.zig:41-47,
127-182; src/schema.zig:9-73). Our files are self-describing instead: the
header embeds the schema, serialized with this module, and `read()` still
accepts an optional expected schema to enforce.

Covers every logical type the reference round-trips
(reference src/write.zig:118-231), with physical-only encodings
(dictionary, run-end-encoded, views) canonicalized before serialization —
they are erased on write exactly like the reference canonicalizes them
(src/write.zig:234-282, 352-421, 701-751).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from olive_spark.format.errors import ValidationError

_SIMPLE: dict[str, pa.DataType] = {
    "null": pa.null(),
    "bool": pa.bool_(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "uint8": pa.uint8(),
    "uint16": pa.uint16(),
    "uint32": pa.uint32(),
    "uint64": pa.uint64(),
    "float16": pa.float16(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "utf8": pa.utf8(),
    "large_utf8": pa.large_utf8(),
    "date32": pa.date32(),
    "date64": pa.date64(),
    "interval_month_day_nano": pa.month_day_nano_interval(),
}
_SIMPLE_REV = {dt: name for name, dt in _SIMPLE.items()}


def type_to_json(dt: pa.DataType) -> Any:
    """Serialize an Arrow type to a JSON-able value."""
    name = _SIMPLE_REV.get(dt)
    if name is not None:
        return name
    if pa.types.is_decimal(dt):
        return {"t": "decimal", "bits": dt.bit_width, "precision": dt.precision, "scale": dt.scale}
    if pa.types.is_timestamp(dt):
        return {"t": "timestamp", "unit": dt.unit, "tz": dt.tz}
    if pa.types.is_time32(dt) or pa.types.is_time64(dt):
        return {"t": "time", "bits": dt.bit_width, "unit": dt.unit}
    if pa.types.is_duration(dt):
        return {"t": "duration", "unit": dt.unit}
    if pa.types.is_fixed_size_binary(dt):
        return {"t": "fixed_size_binary", "width": dt.byte_width}
    if pa.types.is_large_list(dt):
        return {"t": "large_list", "item": type_to_json(dt.value_type)}
    if pa.types.is_list(dt):
        return {"t": "list", "item": type_to_json(dt.value_type)}
    if pa.types.is_fixed_size_list(dt):
        return {"t": "fixed_size_list", "item": type_to_json(dt.value_type), "size": dt.list_size}
    if pa.types.is_struct(dt):
        return {
            "t": "struct",
            "fields": [
                {"name": f.name, "type": type_to_json(f.type), "nullable": f.nullable}
                for f in dt
            ],
        }
    if pa.types.is_map(dt):
        return {
            "t": "map",
            "key": type_to_json(dt.key_type),
            "value": type_to_json(dt.item_type),
            "keys_sorted": dt.keys_sorted,
        }
    raise ValidationError(f"unsupported olive type: {dt}")


def type_from_json(j: Any) -> pa.DataType:
    """Inverse of :func:`type_to_json`; rejects malformed input cleanly."""
    if isinstance(j, str):
        dt = _SIMPLE.get(j)
        if dt is None:
            raise ValidationError(f"unknown olive type name {j!r}")
        return dt
    if not isinstance(j, dict) or "t" not in j:
        raise ValidationError(f"malformed olive type json: {j!r}")
    t = j["t"]
    try:
        if t == "decimal":
            bits = j["bits"]
            ctor = {32: pa.decimal32, 64: pa.decimal64, 128: pa.decimal128, 256: pa.decimal256} \
                if hasattr(pa, "decimal32") else {128: pa.decimal128, 256: pa.decimal256}
            if bits not in ctor:
                raise ValidationError(f"unsupported decimal bit width {bits}")
            return ctor[bits](j["precision"], j["scale"])
        if t == "timestamp":
            return pa.timestamp(j["unit"], tz=j.get("tz"))
        if t == "time":
            return pa.time32(j["unit"]) if j["bits"] == 32 else pa.time64(j["unit"])
        if t == "duration":
            return pa.duration(j["unit"])
        if t == "fixed_size_binary":
            return pa.binary(int(j["width"]))
        if t == "list":
            return pa.list_(type_from_json(j["item"]))
        if t == "large_list":
            return pa.large_list(type_from_json(j["item"]))
        if t == "fixed_size_list":
            return pa.list_(type_from_json(j["item"]), int(j["size"]))
        if t == "struct":
            return pa.struct(
                [
                    pa.field(f["name"], type_from_json(f["type"]), nullable=f.get("nullable", True))
                    for f in j["fields"]
                ]
            )
        if t == "map":
            return pa.map_(
                type_from_json(j["key"]),
                type_from_json(j["value"]),
                keys_sorted=j.get("keys_sorted", False),
            )
    except ValidationError:
        raise
    except Exception as exc:  # noqa: BLE001
        raise ValidationError(f"malformed olive type json: {j!r}: {exc}") from exc
    raise ValidationError(f"unknown olive type tag {t!r}")


def canonicalize_array(arr: pa.Array) -> pa.Array:
    """Erase physical-only encodings, like the reference's write path does.

    dictionary → plain (reference src/write.zig:352-403 materializes on its
    side too — key rebasing is an internal detail), run-end-encoded → plain
    (src/write.zig:405-421), string/binary views → offset-based
    (src/write.zig:234-282,701-751).
    """
    dt = arr.type
    if pa.types.is_dictionary(dt):
        return canonicalize_array(arr.dictionary_decode())
    if pa.types.is_run_end_encoded(dt):
        import pyarrow.compute as pc

        return canonicalize_array(pc.run_end_decode(arr))
    if pa.types.is_string_view(dt):
        return arr.cast(pa.utf8())
    if pa.types.is_binary_view(dt):
        return arr.cast(pa.binary())
    if pa.types.is_list_view(dt) or pa.types.is_large_list_view(dt):
        inner = dt.value_type
        return arr.cast(pa.list_(inner))
    if pa.types.is_union(dt):
        return _lower_union(arr)
    return arr


def _lower_union(arr: pa.Array) -> pa.Array:
    """Lower a dense/sparse union to a tagged struct
    ``{_type_id: int8, <field>: ..., ...}`` with all-but-selected children
    null (SURVEY.md §1.2 — Spark has no union type; the reference writes
    unions natively, src/write.zig:463-549, so this is our storable
    equivalent; the tag keeps the row's active branch recoverable)."""
    import numpy as np
    import pyarrow.compute as pc

    dt = arr.type
    if arr.offset != 0:
        # normalize the slice away so buffer math below starts at row 0
        arr = pa.concat_arrays([arr])
    n = len(arr)
    codes = np.asarray(arr.type_codes)
    children: list[pa.Array] = []
    names: list[str] = []
    dense = dt.mode == "dense"
    offsets = np.asarray(arr.offsets) if dense else None
    for i in range(dt.num_fields):
        f = dt.field(i)
        code = dt.type_codes[i]
        child = canonicalize_array(arr.field(i))
        sel = codes == code
        if dense:
            idx = pa.array(
                np.where(sel, offsets, 0).astype(np.int64), mask=~sel
            )
            lowered = child.take(idx)
        else:
            lowered = pc.if_else(
                pa.array(sel), child, pa.nulls(n, child.type)
            )
        children.append(lowered)
        names.append(f.name or f"f{i}")
    tag = pa.array(codes, pa.int8())
    return pa.StructArray.from_arrays([tag, *children], ["_type_id", *names])
