"""Protobuf wire-format support without external libraries — the
``extensions/protobuf`` analog (reference: extensions/protobuf/src/main/
java/com/hazelcast/jet/protobuf/ProtobufSerializer.java — serializes
IMap/stream values as protobuf messages).

The reference requires compiled message classes; the analog here takes a
**field spec** instead of a ``.proto`` file (no codegen in container):

    SPEC = [(1, "id", "int64"), (2, "name", "string"), (3, "score", "double")]

and implements the proto3 wire format directly — ``tag = (field_no << 3)
| wire_type``; varints (wire 0), fixed 64/32 (wire 1/5), length-delimited
(wire 2) — with proto3 presence semantics: scalar fields at their default
value are omitted on encode and default-filled on decode; unknown fields
are skipped on decode (forward compatibility).

Scalar types: int32/int64 (two's-complement varint), sint32/sint64
(zigzag), bool, double, float, string, bytes.  Nested messages, repeated
fields, and maps are out of scope (documented).

Spark surface: :func:`decode_udf` (binary → struct) and
:func:`encode_udf` (struct fields → binary) as Arrow-batched pandas UDFs
— the hot path stays vectorized per batch, one Python call per ~10k rows
not per row.
"""

from __future__ import annotations

import struct

_VARINT_TYPES = {"int32", "int64", "sint32", "sint64", "bool"}
_WIRE = {"double": 1, "float": 5, "string": 2, "bytes": 2}
_DEFAULTS = {
    "int32": 0, "int64": 0, "sint32": 0, "sint64": 0, "bool": False,
    "double": 0.0, "float": 0.0, "string": "", "bytes": b"",
}
_DDL = {
    "int32": "int", "int64": "bigint", "sint32": "int", "sint64": "bigint",
    "bool": "boolean", "double": "double", "float": "float",
    "string": "string", "bytes": "binary",
}


def _write_varint(out: bytearray, n: int) -> None:
    n &= (1 << 64) - 1  # two's-complement for negatives
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return acc, pos
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def schema_ddl(spec: list[tuple[int, str, str]]) -> str:
    """Spark DDL for a decoded message struct."""
    return ", ".join(f"{name} {_DDL[t]}" for _, name, t in spec)


def encode_message(spec: list[tuple[int, str, str]], values: dict) -> bytes:
    out = bytearray()
    for fno, name, t in spec:
        v = values.get(name)
        if v is None or v == _DEFAULTS[t]:
            continue  # proto3: defaults are not serialized
        if t in _VARINT_TYPES:
            _write_varint(out, fno << 3 | 0)
            if t == "bool":
                _write_varint(out, 1)
            elif t.startswith("sint"):
                _write_varint(out, _zigzag(int(v)))
            else:
                _write_varint(out, int(v))
        elif t == "double":
            _write_varint(out, fno << 3 | 1)
            out.extend(struct.pack("<d", float(v)))
        elif t == "float":
            _write_varint(out, fno << 3 | 5)
            out.extend(struct.pack("<f", float(v)))
        else:  # string / bytes
            raw = v.encode("utf-8") if t == "string" else bytes(v)
            _write_varint(out, fno << 3 | 2)
            _write_varint(out, len(raw))
            out.extend(raw)
    return bytes(out)


def decode_message(spec: list[tuple[int, str, str]], data: bytes) -> dict:
    by_no = {fno: (name, t) for fno, name, t in spec}
    out = {name: _DEFAULTS[t] for _, name, t in spec}
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        fno, wire = tag >> 3, tag & 7
        field = by_no.get(fno)
        if wire == 0:
            raw, pos = _read_varint(data, pos)
            if field:
                name, t = field
                if t == "bool":
                    out[name] = bool(raw)
                elif t.startswith("sint"):
                    out[name] = _unzigzag(raw)
                else:  # two's-complement int32/int64
                    bits = 32 if t == "int32" else 64
                    out[name] = raw - (1 << 64) if raw >= (1 << 63) else raw
                    if bits == 32:
                        out[name] = ((out[name] + (1 << 31)) & ((1 << 32) - 1)) - (1 << 31)
        elif wire == 1:
            if field:
                name, t = field
                out[name] = struct.unpack_from("<d", data, pos)[0]
            pos += 8
        elif wire == 5:
            if field:
                name, t = field
                out[name] = struct.unpack_from("<f", data, pos)[0]
            pos += 4
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            raw = data[pos:pos + ln]
            pos += ln
            if field:
                name, t = field
                out[name] = raw.decode("utf-8") if t == "string" else bytes(raw)
        else:
            raise ValueError(f"unsupported wire type {wire} (groups are proto2-only)")
    return out


def decode_udf(spec: list[tuple[int, str, str]]):
    """Arrow-batched ``binary → struct`` decoder; use with
    ``df.select(decode_udf(SPEC)(F.col("payload")).alias("msg"))`` then
    ``msg.*`` to flatten."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    names = [name for _, name, _ in spec]

    # untyped SCALAR form: a pd.Series -> pd.DataFrame hint is rejected by
    # the hint checker for struct returns, but works at runtime
    def _dec(payloads):
        rows = [
            {n: None for n in names} if p is None else decode_message(spec, bytes(p))
            for p in payloads
        ]
        return pd.DataFrame(rows, columns=names)

    return pandas_udf(_dec, f"struct<{schema_ddl(spec)}>")


def encode_udf(spec: list[tuple[int, str, str]]):
    """Arrow-batched ``struct → binary`` encoder (pass a struct column,
    e.g. ``F.struct("id", "name", ...)``)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    names = [name for _, name, _ in spec]

    # no type hints: a struct argument arrives as a pd.DataFrame, which the
    # hint checker doesn't accept as a signature — the untyped SCALAR form
    # handles it fine at runtime.  Fields are matched POSITIONALLY to the
    # spec (struct field names are unreliable for derived columns, e.g.
    # casts), so pass fields in spec order.
    def _enc(rows):
        if len(rows.columns) != len(names):
            raise ValueError(
                f"struct has {len(rows.columns)} fields, spec has {len(names)}"
            )
        rows = rows.set_axis(names, axis=1)
        return pd.Series(
            [encode_message(spec, r) for r in rows.to_dict("records")], dtype=object
        )

    return pandas_udf(_enc, "binary")
