"""Avro object-container-file support without external libraries — the
``AvroSources.files`` / ``AvroSinks.files`` analog
(reference: extensions/avro/src/main/java/com/hazelcast/jet/avro/
AvroSources.java:38, AvroSinks.java:43; file-connector avro formats in
hazelcast-jet-sql's unified file connector tests).

The container distribution jars ship Avro's core but NOT the spark-avro
DataSource module, and no Python avro package is installed — so this
module implements the Avro 1.x "Object Container Files" spec directly
(magic ``Obj\\x01``, metadata map with ``avro.schema``/``avro.codec``,
16-byte sync marker, then blocks of ``(count, size, records, sync)``)
and exposes it to Spark through the Python Data Source API:

* :func:`register` + ``spark.read.format("jet-avro").load(path)`` —
  distributed read, one input partition per ``.avro`` file;
* ``df.write.format("jet-avro").save(dir)`` — one file per partition;
* :func:`write_avro` / :func:`read_avro` — local fixture helpers.

Scope (documented, honest): record schemas of primitive fields —
null/boolean/int/long/float/double/bytes/string — and ``["null", T]``
unions, codecs ``null`` and ``deflate``.  Avro logical types (decimal,
date, timestamp-*) are out of scope; read them as their underlying
primitive.
"""

from __future__ import annotations

import glob
import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

_AVRO_TO_DDL = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}
_DDL_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "integer": "int",
    "bigint": "long",
    "long": "long",
    "float": "float",
    "double": "double",
    "binary": "bytes",
    "string": "string",
}


# ---------------------------------------------------------------------------
# binary encoding (Avro spec: zigzag varint longs, LE IEEE floats,
# length-prefixed bytes/strings)
# ---------------------------------------------------------------------------

def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag (arbitrary-precision >> is arithmetic)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(data: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = data[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return (acc >> 1) ^ -(acc & 1), pos
        shift += 7


def _write_value(out: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # ["null", T] union: branch index then value
        if v is None:
            _write_long(out, typ.index("null"))
            return
        branch = next(i for i, t in enumerate(typ) if t != "null")
        _write_long(out, branch)
        _write_value(out, typ[branch], v)
    elif typ == "null":
        pass
    elif typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        _write_long(out, int(v))
    elif typ == "float":
        out.extend(struct.pack("<f", float(v)))
    elif typ == "double":
        out.extend(struct.pack("<d", float(v)))
    elif typ in ("bytes", "string"):
        raw = v.encode("utf-8") if typ == "string" else bytes(v)
        _write_long(out, len(raw))
        out.extend(raw)
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _read_value(data: bytes, pos: int, typ):
    if isinstance(typ, list):
        idx, pos = _read_long(data, pos)
        return _read_value(data, pos, typ[idx])
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return data[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _read_long(data, pos)
    if typ == "float":
        return struct.unpack_from("<f", data, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if typ in ("bytes", "string"):
        n, pos = _read_long(data, pos)
        raw = data[pos:pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    raise ValueError(f"unsupported avro type {typ!r}")


# ---------------------------------------------------------------------------
# container files
# ---------------------------------------------------------------------------

def write_avro(path: str, records: list[dict], schema: dict,
               codec: str = "null", sync_marker: bytes = b"\x00" * 16) -> None:
    """Write one object container file (all records in one block)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    fields = schema["fields"]
    body = bytearray()
    for rec in records:
        for f in fields:
            _write_value(body, f["type"], rec.get(f["name"]))
    block = zlib.compress(bytes(body))[2:-4] if codec == "deflate" else bytes(body)

    out = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_value(out, "string", k)
        _write_value(out, "bytes", v)
    _write_long(out, 0)  # end of metadata map
    out.extend(sync_marker)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(block))
        out.extend(block)
        out.extend(sync_marker)
    with open(path, "wb") as f:
        f.write(bytes(out))


def _read_header(data: bytes) -> tuple[dict, str, bytes, int]:
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos, meta = 4, {}
    while True:
        count, pos = _read_long(data, pos)
        if count == 0:
            break
        if count < 0:  # negative block count: byte size follows
            _, pos = _read_long(data, pos)
            count = -count
        for _ in range(count):
            k, pos = _read_value(data, pos, "string")
            v, pos = _read_value(data, pos, "bytes")
            meta[k] = v
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = data[pos:pos + 16]
    return schema, codec, sync, pos + 16


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Read one container file into (schema, records-as-dicts)."""
    with open(path, "rb") as f:
        data = f.read()
    schema, codec, sync, pos = _read_header(data)
    fields = schema["fields"]
    records = []
    while pos < len(data):
        count, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        block = data[pos:pos + size]
        pos += size
        if data[pos:pos + 16] != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bpos = 0
        for _ in range(count):
            rec = {}
            for f in fields:
                rec[f["name"]], bpos = _read_value(block, bpos, f["type"])
            records.append(rec)
    return schema, records


def schema_to_ddl(schema: dict) -> str:
    """Avro record schema → Spark DDL string (nullable unions collapse to
    the non-null branch; Spark fields are nullable by default)."""
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            t = next(x for x in t if x != "null")
        cols.append(f"{f['name']} {_AVRO_TO_DDL[t]}")
    return ", ".join(cols)


def ddl_schema_to_avro(spark_schema, name: str = "spark_record") -> dict:
    """Spark StructType → Avro record schema (every field nullable)."""
    fields = []
    for f in spark_schema.fields:
        t = _DDL_TO_AVRO.get(f.dataType.simpleString())
        if t is None:
            raise ValueError(
                f"jet-avro writer: unsupported Spark type {f.dataType.simpleString()!r} "
                f"for field {f.name!r}"
            )
        fields.append({"name": f.name, "type": ["null", t]})
    return {"type": "record", "name": name, "fields": fields}


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.avro")))
    else:
        files = sorted(glob.glob(path)) if glob.has_magic(path) else [path]
    if not files:
        raise FileNotFoundError(f"no .avro files at {path}")
    return files


# ---------------------------------------------------------------------------
# Spark Python Data Source
# ---------------------------------------------------------------------------

def register(spark) -> None:
    """Register the ``jet-avro`` Python data source (idempotent)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        WriterCommitMessage,
    )

    class _Reader(DataSourceReader):
        def __init__(self, files: list[str]):
            self._files = files

        def partitions(self):
            return [InputPartition(f) for f in self._files]

        def read(self, partition):
            schema, records = read_avro(partition.value)
            names = [f["name"] for f in schema["fields"]]
            for rec in records:
                yield tuple(rec[n] for n in names)

    class _Writer(DataSourceWriter):
        def __init__(self, path: str, avro_schema: dict, overwrite: bool):
            self._path = path
            self._schema = avro_schema
            if overwrite and os.path.isdir(path):
                for f in glob.glob(os.path.join(path, "part-*.avro")):
                    os.unlink(f)

        def write(self, iterator):
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            os.makedirs(self._path, exist_ok=True)
            names = [f["name"] for f in self._schema["fields"]]
            recs = [dict(zip(names, row)) for row in iterator]
            out = os.path.join(self._path, f"part-{pid:05d}-{os.getpid()}.avro")
            write_avro(out, recs, self._schema)
            return WriterCommitMessage()

    class JetAvroDataSource(DataSource):
        @classmethod
        def name(cls):
            return "jet-avro"

        def schema(self):
            files = _expand(self.options["path"])
            with open(files[0], "rb") as f:
                head = f.read(1 << 20)  # header is tiny; 1 MiB is ample
            schema, _, _, _ = _read_header(head)
            return schema_to_ddl(schema)

        def reader(self, schema):
            return _Reader(_expand(self.options["path"]))

        def writer(self, schema, overwrite):
            return _Writer(
                self.options["path"], ddl_schema_to_avro(schema), overwrite
            )

    spark.dataSource.register(JetAvroDataSource)


def load(spark, path: str):
    """Read ``path`` (file, dir, or glob of .avro container files) as a
    DataFrame — the ``AvroSources.files`` entry point."""
    register(spark)
    return spark.read.format("jet-avro").load(path)
