"""Pure-Python protobuf binary decoder (proto wire format, stdlib only).

The spark-protobuf jar (and the protobuf Python package) are not bundled
with a plain PySpark install, so the ``deserialize`` module falls back to
this decoder — the "decode Kafka protobuf payloads given a compiled
descriptor file" path works with zero extra dependencies, mirroring the
avro fallback (functions/avrodec.py).  Reference behavior being
re-expressed: module/transform/DeserializeTransform.java protobuf branch
(descriptorFile + messageName config).

Implements the public wire format (https://protobuf.dev/programming-guides/encoding/):
varints, zigzag sint32/64, fixed32/64, length-delimited, packed repeated
primitives, nested messages, maps (map_entry submessages), and enum
number→name resolution.  The descriptor file itself is a serialized
``FileDescriptorSet`` — also a protobuf message with a public schema
(descriptor.proto), so it is parsed with the same wire decoder,
bootstrapping from nothing.

Semantics match protobuf-java / spark-protobuf: proto3 singular scalars
default to 0/""/false/first-enum when absent; message fields default to
null; repeated to []; maps to {}.
"""

from __future__ import annotations

import struct
from typing import Any

from pyspark.sql import types as T


class ProtoError(ValueError):
    pass


# ---------------------------------------------------------------- wire layer

_VARINT, _I64, _LEN, _SGROUP, _EGROUP, _I32 = 0, 1, 2, 3, 4, 5


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        if pos >= len(buf):
            raise ProtoError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7
        if shift > 70:
            raise ProtoError("varint too long")


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's raw fields.

    value is int for varint/fixed, bytes for length-delimited.
    """
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        fno, wt = tag >> 3, tag & 7
        if wt == _VARINT:
            v, pos = _read_varint(buf, pos)
        elif wt == _I64:
            if pos + 8 > len(buf):
                raise ProtoError("truncated fixed64")
            v = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        elif wt == _LEN:
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ProtoError("truncated length-delimited field")
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == _I32:
            if pos + 4 > len(buf):
                raise ProtoError("truncated fixed32")
            v = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        elif wt in (_SGROUP, _EGROUP):  # groups: obsolete, skip markers
            v = b""
        else:
            raise ProtoError(f"unknown wire type {wt}")
        yield fno, wt, v


def _fields_map(buf: bytes) -> dict[int, list]:
    out: dict[int, list] = {}
    for fno, _wt, v in iter_fields(buf):
        out.setdefault(fno, []).append(v)
    return out


def _s(v: bytes) -> str:
    return v.decode("utf-8")


# ------------------------------------------------- descriptor.proto parsing
# Field numbers below are from the public descriptor.proto.


class FieldDesc:
    __slots__ = ("name", "number", "label", "type", "type_name", "proto3_optional")

    def __init__(self, buf: bytes):
        f = _fields_map(buf)
        self.name = _s(f[1][0]) if 1 in f else ""
        self.number = f[3][0] if 3 in f else 0
        self.label = f[4][0] if 4 in f else 1  # 1 optional, 3 repeated
        self.type = f[5][0] if 5 in f else 0
        self.type_name = _s(f[6][0]).lstrip(".") if 6 in f else ""
        self.proto3_optional = bool(f[17][0]) if 17 in f else False


class EnumDesc:
    def __init__(self, buf: bytes):
        f = _fields_map(buf)
        self.name = _s(f[1][0]) if 1 in f else ""
        self.values: dict[int, str] = {}
        self.first_name = None
        for vb in f.get(2, []):  # EnumValueDescriptorProto
            vf = _fields_map(vb)
            vname = _s(vf[1][0]) if 1 in vf else ""
            vnum = vf[2][0] if 2 in vf else 0
            self.values[vnum] = vname
            if self.first_name is None:
                self.first_name = vname


class MessageDesc:
    def __init__(self, buf: bytes):
        f = _fields_map(buf)
        self.name = _s(f[1][0]) if 1 in f else ""
        self.fields = [FieldDesc(b) for b in f.get(2, [])]
        self.nested = [MessageDesc(b) for b in f.get(3, [])]
        self.enums = [EnumDesc(b) for b in f.get(4, [])]
        self.map_entry = False
        for ob in f.get(7, []):  # MessageOptions
            of = _fields_map(ob)
            if 7 in of and of[7][0]:  # map_entry
                self.map_entry = True


class FileDesc:
    def __init__(self, buf: bytes):
        f = _fields_map(buf)
        self.package = _s(f[2][0]) if 2 in f else ""
        self.messages = [MessageDesc(b) for b in f.get(4, [])]
        self.enums = [EnumDesc(b) for b in f.get(5, [])]


class DescriptorPool:
    """Fully-qualified-name → MessageDesc/EnumDesc from a FileDescriptorSet."""

    def __init__(self, fds_bytes: bytes):
        self.messages: dict[str, MessageDesc] = {}
        self.enums: dict[str, EnumDesc] = {}
        files = _fields_map(fds_bytes).get(1, [])
        if not files:
            raise ProtoError("descriptor set contains no files")
        for fb in files:
            fd = FileDesc(fb)
            prefix = fd.package + "." if fd.package else ""
            for e in fd.enums:
                self.enums[prefix + e.name] = e
            for m in fd.messages:
                self._add_message(prefix, m)

    def _add_message(self, prefix: str, m: MessageDesc) -> None:
        fq = prefix + m.name
        self.messages[fq] = m
        for e in m.enums:
            self.enums[fq + "." + e.name] = e
        for n in m.nested:
            self._add_message(fq + ".", n)

    def message(self, name: str) -> MessageDesc:
        name = name.lstrip(".")
        if name in self.messages:
            return self.messages[name]
        # allow unqualified names when unambiguous (config convenience)
        tails = [k for k in self.messages if k.split(".")[-1] == name]
        if len(tails) == 1:
            return self.messages[tails[0]]
        raise ProtoError(
            f"message '{name}' not found in descriptor set "
            f"(have: {sorted(self.messages)})"
        )


# --------------------------------------------------------- value decoding

# proto field type numbers (descriptor.proto Type enum)
_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32 = 1, 2, 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL, _T_STRING, _T_GROUP = 6, 7, 8, 9, 10
_T_MESSAGE, _T_BYTES, _T_UINT32, _T_ENUM = 11, 12, 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18

_PACKABLE_VARINT = {_T_INT64, _T_UINT64, _T_INT32, _T_UINT32, _T_BOOL,
                    _T_ENUM, _T_SINT32, _T_SINT64}


def _sign32(v: int) -> int:
    return v - (1 << 32) if v >= 1 << 31 else v


def _sign64(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _scalar(ftype: int, wt: int, v: Any, pool: DescriptorPool, fd: FieldDesc):
    if ftype == _T_DOUBLE:
        return struct.unpack("<d", int(v).to_bytes(8, "little"))[0]
    if ftype == _T_FLOAT:
        return struct.unpack("<f", int(v).to_bytes(4, "little"))[0]
    if ftype in (_T_INT64, _T_INT32):
        out = _sign64(v)
        return out
    if ftype in (_T_UINT64, _T_UINT32):
        return v
    if ftype == _T_FIXED64:
        return v  # unsigned
    if ftype == _T_FIXED32:
        return v
    if ftype == _T_SFIXED64:
        return _sign64(v)
    if ftype == _T_SFIXED32:
        return _sign32(v)
    if ftype in (_T_SINT32, _T_SINT64):
        return _zigzag(v)
    if ftype == _T_BOOL:
        return bool(v)
    if ftype == _T_STRING:
        return v.decode("utf-8")
    if ftype == _T_BYTES:
        return bytes(v)
    if ftype == _T_ENUM:
        en = pool.enums.get(fd.type_name)
        return en.values.get(v, str(v)) if en else str(v)
    raise ProtoError(f"unsupported field type {ftype}")


def _unpack_packed(ftype: int, buf: bytes, pool, fd):
    out = []
    if ftype in _PACKABLE_VARINT:
        pos = 0
        while pos < len(buf):
            v, pos = _read_varint(buf, pos)
            out.append(_scalar(ftype, _VARINT, v, pool, fd))
    elif ftype in (_T_DOUBLE, _T_FIXED64, _T_SFIXED64):
        for i in range(0, len(buf), 8):
            out.append(_scalar(ftype, _I64, int.from_bytes(buf[i:i+8], "little"), pool, fd))
    elif ftype in (_T_FLOAT, _T_FIXED32, _T_SFIXED32):
        for i in range(0, len(buf), 4):
            out.append(_scalar(ftype, _I32, int.from_bytes(buf[i:i+4], "little"), pool, fd))
    else:
        raise ProtoError(f"field type {ftype} is not packable")
    return out


def _default(ftype: int, fd: FieldDesc, pool: DescriptorPool):
    """proto3 singular defaults (protobuf-java parity)."""
    if ftype in (_T_DOUBLE, _T_FLOAT):
        return 0.0
    if ftype == _T_BOOL:
        return False
    if ftype == _T_STRING:
        return ""
    if ftype == _T_BYTES:
        return b""
    if ftype == _T_ENUM:
        en = pool.enums.get(fd.type_name)
        return en.first_name if en else "0"
    if ftype in (_T_MESSAGE, _T_GROUP):
        return None
    return 0


def decode_message(buf: bytes, desc: MessageDesc, pool: DescriptorPool) -> dict:
    """Decode one message payload to a plain dict (unknown fields skipped)."""
    by_num = {fd.number: fd for fd in desc.fields}
    raw: dict[int, list] = {}
    for fno, wt, v in iter_fields(buf):
        if fno in by_num:
            raw.setdefault(fno, []).append((wt, v))
    out: dict[str, Any] = {}
    for fd in desc.fields:
        vals = raw.get(fd.number)
        repeated = fd.label == 3
        sub = pool.messages.get(fd.type_name) if fd.type == _T_MESSAGE else None
        is_map = bool(sub is not None and sub.map_entry)
        if vals is None:
            out[fd.name] = ({} if is_map else [] if repeated
                            else _default(fd.type, fd, pool))
            continue
        if is_map:
            kf = next(f for f in sub.fields if f.number == 1)
            vf = next(f for f in sub.fields if f.number == 2)
            m = {}
            for _wt, entry in vals:
                ed = decode_message(entry, sub, pool)
                m[ed[kf.name]] = ed[vf.name]
            out[fd.name] = m
        elif fd.type == _T_MESSAGE:
            decoded = [decode_message(v, sub, pool) for _wt, v in vals]
            out[fd.name] = decoded if repeated else decoded[-1]
        elif repeated:
            items: list = []
            for wt, v in vals:
                if wt == _LEN and fd.type not in (_T_STRING, _T_BYTES):
                    items.extend(_unpack_packed(fd.type, v, pool, fd))
                else:
                    items.append(_scalar(fd.type, wt, v, pool, fd))
            out[fd.name] = items
        else:
            wt, v = vals[-1]  # last one wins, per spec
            out[fd.name] = _scalar(fd.type, wt, v, pool, fd)
    return out


# --------------------------------------------------------- schema mapping

_SPARK_SCALAR = {
    _T_DOUBLE: T.DoubleType(),
    _T_FLOAT: T.FloatType(),
    _T_INT64: T.LongType(),
    _T_UINT64: T.LongType(),    # may overflow for > 2^63-1; documented
    _T_INT32: T.IntegerType(),
    _T_FIXED64: T.LongType(),
    _T_FIXED32: T.LongType(),   # unsigned 32 needs the wider type
    _T_BOOL: T.BooleanType(),
    _T_STRING: T.StringType(),
    _T_BYTES: T.BinaryType(),
    _T_UINT32: T.LongType(),
    _T_ENUM: T.StringType(),
    _T_SFIXED32: T.IntegerType(),
    _T_SFIXED64: T.LongType(),
    _T_SINT32: T.IntegerType(),
    _T_SINT64: T.LongType(),
}


def message_to_spark_type(
    desc: MessageDesc, pool: DescriptorPool, _depth: int = 0
) -> T.StructType:
    if _depth > 20:
        raise ProtoError("message nesting too deep (recursive type?)")
    fields = []
    for fd in desc.fields:
        sub = pool.messages.get(fd.type_name) if fd.type == _T_MESSAGE else None
        is_map = False
        if sub is not None and sub.map_entry:
            is_map = True
            kf = next(f for f in sub.fields if f.number == 1)
            vf = next(f for f in sub.fields if f.number == 2)
            vt = (
                message_to_spark_type(pool.messages[vf.type_name], pool, _depth + 1)
                if vf.type == _T_MESSAGE
                else _SPARK_SCALAR[vf.type]
            )
            dtype: T.DataType = T.MapType(_SPARK_SCALAR[kf.type], vt)
        elif fd.type == _T_MESSAGE:
            if sub is None:
                raise ProtoError(f"unresolved message type '{fd.type_name}'")
            dtype = message_to_spark_type(sub, pool, _depth + 1)
        else:
            dtype = _SPARK_SCALAR.get(fd.type)
            if dtype is None:
                raise ProtoError(f"unsupported proto type {fd.type} ({fd.name})")
        if fd.label == 3 and not is_map:  # repeated (map fields are
            dtype = T.ArrayType(dtype)    # "repeated entry" on the wire)
        fields.append(T.StructField(fd.name, dtype, nullable=True))
    return T.StructType(fields)
