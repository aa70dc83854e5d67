"""Pure-Python Avro binary decoder (Apache Avro 1.11 spec, stdlib only).

The spark-avro jar is not bundled with a plain PySpark install, so the
``deserialize`` module falls back to this decoder when the jar is absent
— the common "decode Kafka Avro payloads" path works with zero extra
dependencies.  Implements the binary encoding from the public spec
(https://avro.apache.org/docs/1.11.1/specification/): zigzag varints,
length-prefixed bytes/strings, little-endian IEEE floats, records in
field order, block-encoded arrays/maps, union index prefix, enum index,
fixed, and the timestamp/date logical types.

Writer's schema must be supplied (as in the reference's DeserializeTransform
config — schema resolution/evolution against a reader schema is out of
scope).  Confluent wire framing (magic 0x00 + 4-byte schema id) is
detected and stripped by the caller.
"""

from __future__ import annotations

import datetime as dt
import json
import struct
from typing import Any

from pyspark.sql import types as T


class AvroError(ValueError):
    pass


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("truncated avro payload")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        # zigzag varint
        shift, acc = 0, 0
        while True:
            if self.pos >= len(self.buf):
                raise AvroError("truncated varint")
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)


def _named_types(schema: Any, reg: dict[str, Any]) -> None:
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed") and schema.get("name"):
            reg[schema["name"]] = schema
        if t == "record":
            for f in schema.get("fields", []):
                _named_types(f.get("type"), reg)
        elif t == "array":
            _named_types(schema.get("items"), reg)
        elif t == "map":
            _named_types(schema.get("values"), reg)
    elif isinstance(schema, list):
        for s in schema:
            _named_types(s, reg)


def parse_schema(schema_json: str | dict) -> tuple[Any, dict[str, Any]]:
    schema = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    reg: dict[str, Any] = {}
    _named_types(schema, reg)
    return schema, reg


def _decode(r: _Reader, schema: Any, reg: dict[str, Any]) -> Any:
    if isinstance(schema, str):
        if schema in reg:
            return _decode(r, reg[schema], reg)
        t = schema
    elif isinstance(schema, list):  # union: varint index then value
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode(r, schema[idx], reg)
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            return _decode(r, t, reg)

    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        v = r.read_long()
        lt = schema.get("logicalType") if isinstance(schema, dict) else None
        if lt == "timestamp-millis":
            return dt.datetime.utcfromtimestamp(v / 1000.0)
        if lt == "timestamp-micros":
            return dt.datetime.utcfromtimestamp(0) + dt.timedelta(microseconds=v)
        if lt == "date":
            return dt.date(1970, 1, 1) + dt.timedelta(days=v)
        return v
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return bytes(r.read(r.read_long()))
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "record":
        return {
            f["name"]: _decode(r, f["type"], reg) for f in schema["fields"]
        }
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return bytes(r.read(schema["size"]))
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte size
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(r, schema["items"], reg))
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out_m
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read(r.read_long()).decode("utf-8")
                out_m[k] = _decode(r, schema["values"], reg)
    raise AvroError(f"unsupported avro type {t!r}")


def decode_record(payload: bytes, schema: Any, reg: dict[str, Any]) -> dict[str, Any]:
    """Decode one datum; strips Confluent wire framing when present."""
    if len(payload) > 5 and payload[0] == 0:
        # Confluent wire format: magic 0 + 4-byte schema id + datum.
        # Heuristic: try framed first, fall back to raw on any decode
        # failure (a raw datum may legitimately start with a zigzag 0)
        try:
            r = _Reader(payload[5:])
            out = _decode(r, schema, reg)
            if r.pos == len(r.buf):
                return out
        except (AvroError, struct.error, UnicodeDecodeError, IndexError):
            pass
    r = _Reader(payload)
    out = _decode(r, schema, reg)
    if r.pos != len(r.buf):
        raise AvroError(f"{len(r.buf) - r.pos} trailing bytes after datum")
    return out


def avro_to_spark_type(schema: Any, reg: dict[str, Any] | None = None) -> T.DataType:
    """Avro schema → Spark type (for the fallback UDF's return type)."""
    if reg is None:
        _, reg = parse_schema(schema if isinstance(schema, (str, dict)) else json.dumps(schema))
        if isinstance(schema, str):
            schema = json.loads(schema)
    if isinstance(schema, str):
        if schema in reg:
            return avro_to_spark_type(reg[schema], reg)
        prim = {
            "null": T.NullType(), "boolean": T.BooleanType(), "int": T.IntegerType(),
            "long": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
            "bytes": T.BinaryType(), "string": T.StringType(),
        }
        if schema in prim:
            return prim[schema]
        raise AvroError(f"unknown avro type {schema!r}")
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null"]
        if len(non_null) != 1:
            raise AvroError("only 2-branch [null, T] unions map to Spark types")
        return avro_to_spark_type(non_null[0], reg)
    t = schema["type"]
    if isinstance(t, (dict, list)):
        return avro_to_spark_type(t, reg)
    lt = schema.get("logicalType")
    if lt in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType()
    if lt == "date":
        return T.DateType()
    if t == "record":
        return T.StructType(
            [
                T.StructField(f["name"], avro_to_spark_type(f["type"], reg))
                for f in schema["fields"]
            ]
        )
    if t == "enum":
        return T.StringType()
    if t == "fixed":
        return T.BinaryType()
    if t == "array":
        return T.ArrayType(avro_to_spark_type(schema["items"], reg))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(schema["values"], reg))
    return avro_to_spark_type(t, reg)
