"""Pure-Python protobuf decoder: hand-encoded wire-format fixtures.

The encoder below is test-only: it builds payloads AND the serialized
FileDescriptorSet byte-by-byte from the public wire format, so the
decoder is checked against the spec, not against itself.
"""

import struct

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pipeline_spark.functions.protodec import (
    DescriptorPool,
    decode_message,
    message_to_spark_type,
)
from pipeline_spark.operators.deserialize import deserialize_transform
from pipeline_spark.registry import ModuleContext


# ------------------------------------------------------- wire encoder

def varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def tag(fno: int, wt: int) -> bytes:
    return varint((fno << 3) | wt)


def vi(fno: int, v: int) -> bytes:
    return tag(fno, 0) + varint(v)


def ld(fno: int, payload: bytes) -> bytes:
    return tag(fno, 2) + varint(len(payload)) + payload


def zz(v: int) -> int:
    return (v << 1) ^ (v >> 63)


# ------------------------------------------- descriptor set fixture

def field_desc(name: str, number: int, ftype: int, *, label=1, type_name=""):
    out = ld(1, name.encode()) + vi(3, number) + vi(4, label) + vi(5, ftype)
    if type_name:
        out += ld(6, type_name.encode())
    return out


def enum_desc(name: str, values):
    out = ld(1, name.encode())
    for vname, vnum in values:
        out += ld(2, ld(1, vname.encode()) + vi(2, vnum))
    return out


def message_desc(name: str, fields, *, nested=(), enums=(), map_entry=False):
    out = ld(1, name.encode())
    for f in fields:
        out += ld(2, f)
    for n in nested:
        out += ld(3, n)
    for e in enums:
        out += ld(4, e)
    if map_entry:
        out += ld(7, vi(7, 1))  # MessageOptions.map_entry = true
    return out


@pytest.fixture(scope="module")
def pool():
    counts_entry = message_desc(
        "CountsEntry",
        [field_desc("key", 1, 9), field_desc("value", 2, 3)],
        map_entry=True,
    )
    inner = message_desc(
        "Inner",
        [field_desc("label", 1, 9), field_desc("xs", 2, 1, label=3)],
    )
    event = message_desc(
        "Event",
        [
            field_desc("id", 1, 3),                     # int64
            field_desc("name", 2, 9),                   # string
            field_desc("score", 3, 1),                  # double
            field_desc("flag", 4, 8),                   # bool
            field_desc("nums", 5, 5, label=3),          # repeated int32
            field_desc("status", 6, 14, type_name=".test.Status"),
            field_desc("inner", 7, 11, type_name=".test.Inner"),
            field_desc("counts", 8, 11, label=3,
                       type_name=".test.Event.CountsEntry"),
            field_desc("delta", 9, 18),                 # sint64
            field_desc("tags", 10, 9, label=3),         # repeated string
            field_desc("blob", 11, 12),                 # bytes
            field_desc("f32", 12, 7),                   # fixed32
            field_desc("sf64", 13, 16),                 # sfixed64
            field_desc("ratio", 14, 2),                 # float
        ],
        nested=[counts_entry],
    )
    status = enum_desc("Status", [("UNKNOWN", 0), ("ACTIVE", 1), ("DELETED", 2)])
    file_pb = (
        ld(1, b"test.proto") + ld(2, b"test") + ld(4, event) + ld(4, inner)
        + ld(5, status)
    )
    return DescriptorPool(ld(1, file_pb))


@pytest.fixture(scope="module")
def payload():
    inner = ld(1, b"in") + ld(2, struct.pack("<d", 1.0) + struct.pack("<d", 2.5))
    return (
        vi(1, 42)
        + ld(2, b"hello")
        + tag(3, 1) + struct.pack("<d", 1.5)
        + vi(4, 1)
        + ld(5, varint(1) + varint(2) + varint(300))     # packed int32
        + vi(6, 1)                                        # ACTIVE
        + ld(7, inner)
        + ld(8, ld(1, b"a") + vi(2, 1))                   # counts["a"]=1
        + ld(8, ld(1, b"b") + vi(2, 2))
        + vi(9, zz(-3))                                   # sint64 -3
        + ld(10, b"x") + ld(10, b"y")
        + ld(11, b"\x00\x01\xff")
        + tag(12, 5) + struct.pack("<I", 4_000_000_000)   # fixed32 > int32
        + tag(13, 1) + struct.pack("<q", -9)
        + tag(14, 5) + struct.pack("<f", 0.5)
    )


def test_decode_full_message(pool, payload):
    d = decode_message(payload, pool.message("test.Event"), pool)
    assert d["id"] == 42
    assert d["name"] == "hello"
    assert d["score"] == 1.5
    assert d["flag"] is True
    assert d["nums"] == [1, 2, 300]
    assert d["status"] == "ACTIVE"
    assert d["inner"] == {"label": "in", "xs": [1.0, 2.5]}
    assert d["counts"] == {"a": 1, "b": 2}
    assert d["delta"] == -3
    assert d["tags"] == ["x", "y"]
    assert d["blob"] == b"\x00\x01\xff"
    assert d["f32"] == 4_000_000_000
    assert d["sf64"] == -9
    assert abs(d["ratio"] - 0.5) < 1e-7


def test_decode_defaults_for_empty_payload(pool):
    d = decode_message(b"", pool.message("test.Event"), pool)
    assert d["id"] == 0 and d["name"] == "" and d["score"] == 0.0
    assert d["flag"] is False and d["nums"] == [] and d["status"] == "UNKNOWN"
    assert d["inner"] is None and d["counts"] == {} and d["tags"] == []


def test_negative_int64_ten_byte_varint(pool):
    d = decode_message(vi(1, -7), pool.message("test.Event"), pool)
    assert d["id"] == -7


def test_unpacked_repeated_and_last_wins(pool):
    # same repeated field arriving unpacked, plus a scalar set twice
    buf = vi(5, 9) + vi(5, 10) + ld(2, b"first") + ld(2, b"second")
    d = decode_message(buf, pool.message("test.Event"), pool)
    assert d["nums"] == [9, 10]
    assert d["name"] == "second"


def test_unknown_fields_skipped(pool):
    buf = vi(99, 1234) + ld(98, b"junk") + vi(1, 5)
    d = decode_message(buf, pool.message("test.Event"), pool)
    assert d["id"] == 5


def test_spark_type_mapping(pool):
    st = message_to_spark_type(pool.message("test.Event"), pool)
    by_name = {f.name: f.dataType.simpleString() for f in st.fields}
    assert by_name["id"] == "bigint"
    assert by_name["nums"] == "array<int>"
    assert by_name["status"] == "string"
    assert by_name["inner"] == "struct<label:string,xs:array<double>>"
    assert by_name["counts"] == "map<string,bigint>"
    assert by_name["f32"] == "bigint"
    assert by_name["ratio"] == "float"


def test_unqualified_message_name(pool):
    assert pool.message("Event").name == "Event"
    with pytest.raises(Exception, match="not found"):
        pool.message("Nope")


def test_deserialize_module_protobuf_fallback(spark, pool, payload, tmp_path):
    # jar absent in this container → module must fall back to the pure
    # decoder; descriptor comes from a real descriptorFile on disk
    counts_entry = message_desc(
        "CountsEntry",
        [field_desc("key", 1, 9), field_desc("value", 2, 3)],
        map_entry=True,
    )
    inner = message_desc(
        "Inner", [field_desc("label", 1, 9), field_desc("xs", 2, 1, label=3)]
    )
    event = message_desc(
        "Event",
        [
            field_desc("id", 1, 3),
            field_desc("name", 2, 9),
            field_desc("status", 6, 14, type_name=".test.Status"),
            field_desc("inner", 7, 11, type_name=".test.Inner"),
            field_desc("counts", 8, 11, label=3,
                       type_name=".test.Event.CountsEntry"),
        ],
        nested=[counts_entry],
    )
    status = enum_desc("Status", [("UNKNOWN", 0), ("ACTIVE", 1)])
    file_pb = (
        ld(1, b"test.proto") + ld(2, b"test") + ld(4, event) + ld(4, inner)
        + ld(5, status)
    )
    desc_file = tmp_path / "event.desc"
    desc_file.write_bytes(ld(1, file_pb))

    rows = [
        Row(k=1, payload=bytearray(vi(1, 7) + ld(2, b"abc") + vi(6, 1)
                                   + ld(8, ld(1, b"z") + vi(2, 9)))),
        Row(k=2, payload=bytearray(vi(1, 8))),
    ]
    df = spark.createDataFrame(rows)
    out = deserialize_transform(
        ModuleContext(
            spark=spark,
            name="d",
            params={
                "format": "protobuf",
                "field": "payload",
                "messageName": "test.Event",
                "descriptorFile": str(desc_file),
            },
            inputs=[df],
            input_names=["in"],
            side_inputs={},
        )
    )[""]
    got = {r["k"]: r for r in out.collect()}
    assert got[1]["id"] == 7 and got[1]["name"] == "abc"
    assert got[1]["status"] == "ACTIVE"
    assert got[1]["counts"] == {"z": 9}
    assert got[2]["id"] == 8 and got[2]["name"] == "" and got[2]["inner"] is None


def test_protobuf_dead_letter_on_truncated_payload(spark, tmp_path):
    event = message_desc("Event", [field_desc("id", 1, 3), field_desc("name", 2, 9)])
    file_pb = ld(1, b"t.proto") + ld(2, b"t") + ld(4, event)
    desc_file = tmp_path / "e.desc"
    desc_file.write_bytes(ld(1, file_pb))

    good = vi(1, 5) + ld(2, b"ok")
    truncated = tag(2, 2) + varint(99)  # claims 99 bytes, has none
    df = spark.createDataFrame(
        [Row(k=1, payload=bytearray(good)), Row(k=2, payload=bytearray(truncated))]
    )
    outs = deserialize_transform(
        ModuleContext(
            spark=spark,
            name="d",
            params={
                "format": "protobuf",
                "field": "payload",
                "messageName": "Event",
                "descriptorFile": str(desc_file),
            },
            inputs=[df],
            input_names=["in"],
            side_inputs={},
            config={"failFast": False},
        )
    )
    ok = {r["k"] for r in outs[""].collect()}
    failed = {r["k"] for r in outs["failures"].collect()}
    assert ok == {1} and failed == {2}

    # failFast (default) raises instead of silently nulling
    with pytest.raises(Exception):
        deserialize_transform(
            ModuleContext(
                spark=spark,
                name="d",
                params={
                    "format": "protobuf",
                    "field": "payload",
                    "messageName": "Event",
                    "descriptorFile": str(desc_file),
                },
                inputs=[df],
                input_names=["in"],
                side_inputs={},
            )
        )[""].collect()
