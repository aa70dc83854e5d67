"""Property tests for the Delta deletion-vector codec (functions/deltadv):
z85 and portable-RoaringBitmapArray round trips over adversarial position
sets — every container type (array, bitset via >4096-dense ranges, and
reading runs), multi-key 64-bit values, and the file framing with CRC."""

from __future__ import annotations

import struct
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline_spark.functions.deltadv import (
    encode_dv_file,
    load_dv_positions,
    make_dv_descriptor_relative,
    roaring_array_deserialize,
    roaring_array_serialize,
    z85_decode,
    z85_encode,
)


@given(st.binary(min_size=0, max_size=200).filter(lambda b: len(b) % 4 == 0))
def test_z85_roundtrip_aligned(b):
    assert z85_decode(z85_encode(b)) == b


@given(st.binary(min_size=0, max_size=203))
def test_z85_padded_roundtrip_prefix(b):
    enc = z85_encode(b, pad=True)
    dec = z85_decode(enc)
    assert dec[: len(b)] == b
    assert set(dec[len(b):]) <= {0}


positions_strategy = st.one_of(
    # sparse arbitrary 64-bit-ish positions (array containers, multi-key)
    st.lists(st.integers(0, 2**40), max_size=300, unique=True),
    # dense runs that force bitset containers (>4096 in one 16-bit chunk)
    st.integers(0, 50_000).map(lambda start: list(range(start, start + 5000))),
    # two dense blocks in different high words
    st.integers(0, 1000).map(
        lambda s: list(range(s, s + 4200)) + list(range(2**33 + s, 2**33 + s + 10))
    ),
)


@settings(max_examples=40, deadline=None)
@given(positions_strategy)
def test_roaring_array_roundtrip(positions):
    blob = roaring_array_serialize(positions)
    back = roaring_array_deserialize(blob)
    assert sorted(set(int(p) for p in positions)) == [int(x) for x in back]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 2**20), min_size=1, max_size=200, unique=True))
def test_dv_file_framing_roundtrip(tmp_path_factory, positions):
    tmp = tmp_path_factory.mktemp("dv")
    desc, target, blob = make_dv_descriptor_relative(str(tmp), sorted(positions))
    import os

    os.makedirs(os.path.dirname(target), exist_ok=True)
    with open(target, "wb") as fh:
        fh.write(blob)
    got = load_dv_positions(str(tmp), desc)
    assert [int(x) for x in got] == sorted(positions)
    # framing invariants: version byte, BE size, trailing CRC of the bitmap
    assert blob[0] == 1
    (size,) = struct.unpack_from(">i", blob, desc["offset"])
    bitmap = blob[desc["offset"] + 4 : desc["offset"] + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, desc["offset"] + 4 + size)
    assert crc == (zlib.crc32(bitmap) & 0xFFFFFFFF)


def test_encode_dv_file_offset_points_at_size():
    bitmap = roaring_array_serialize([1, 2, 3])
    blob, off = encode_dv_file(bitmap)
    (size,) = struct.unpack_from(">i", blob, off)
    assert size == len(bitmap)


def test_run_container_reading():
    """External writers (delta-spark/CRoaring) may emit RUN containers
    (cookie 12347); build one by hand and decode it."""
    from pipeline_spark.functions.deltadv import MAGIC

    # one 32-bit bitmap, key 0, one container (key 0) with runs
    # runs: [5..9] and [100..102]  (start, length-1) pairs
    n = 1
    bitmap = struct.pack("<HH", 12347, n - 1)       # cookie + (n-1)
    bitmap += bytes([0b1])                            # run flag bitset
    bitmap += struct.pack("<HH", 0, 8 - 1)           # key 0, cardinality-1
    # n < 4 and run cookie → no offset header
    bitmap += struct.pack("<H", 2)                    # numRuns
    bitmap += struct.pack("<HH", 5, 4)                # 5..9
    bitmap += struct.pack("<HH", 100, 2)              # 100..102
    arr = struct.pack("<I", MAGIC) + struct.pack("<q", 1)
    arr += struct.pack("<I", 0) + bitmap
    got = roaring_array_deserialize(arr)
    assert [int(x) for x in got] == [5, 6, 7, 8, 9, 100, 101, 102]


def test_run_container_ending_at_65535_no_overflow():
    """Review fix: a run touching low-value 65535 must not wrap under
    numpy>=2's uint16 arithmetic (65000+535+1 → 0 → empty range)."""
    from pipeline_spark.functions.deltadv import MAGIC

    bitmap = struct.pack("<HH", 12347, 0)            # run cookie, n=1
    bitmap += bytes([0b1])                            # run flag
    bitmap += struct.pack("<HH", 0, 536 - 1)          # key 0, card-1
    bitmap += struct.pack("<H", 1)                    # one run
    bitmap += struct.pack("<HH", 65000, 535)          # 65000..65535
    arr = struct.pack("<I", MAGIC) + struct.pack("<q", 1)
    arr += struct.pack("<I", 0) + bitmap
    got = roaring_array_deserialize(arr)
    assert len(got) == 536
    assert int(got[0]) == 65000 and int(got[-1]) == 65535


def test_descriptor_from_generator_has_correct_cardinality(tmp_path):
    """Review fix: a generator argument must not be double-consumed into
    cardinality 0."""
    desc, _t, _b = make_dv_descriptor_relative(
        str(tmp_path), (i for i in [3, 1, 2])
    )
    assert desc["cardinality"] == 3
