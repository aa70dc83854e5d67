"""Property sweeps over the stdlib codecs the lakehouse paths rest on:
z85 (delta DV descriptor uuids / inline vectors) and the avro OCF
encode/decode pair (every iceberg manifest byte)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline_spark.functions.avroocf import read_ocf, write_ocf_bytes
from pipeline_spark.functions.deltadv import z85_decode, z85_encode


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=120))
def test_z85_roundtrip(b):
    enc = z85_encode(b, pad=True)
    pad = (-len(b)) % 4
    assert z85_decode(enc)[: len(b)] == b
    assert len(z85_decode(enc)) == len(b) + pad


_record_schema = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "string"], "default": None},
        {"name": "c", "type": ["null", "bytes"], "default": None},
        {"name": "d", "type": {"type": "array", "items": "int"}},
        {"name": "e", "type": "boolean"},
        {"name": "f", "type": "double"},
    ],
}

_rows = st.lists(
    st.fixed_dictionaries({
        "a": st.integers(min_value=-2**63, max_value=2**63 - 1),
        "b": st.one_of(st.none(), st.text(max_size=40)),
        "c": st.one_of(st.none(), st.binary(max_size=40)),
        "d": st.lists(
            st.integers(min_value=-2**31, max_value=2**31 - 1), max_size=8
        ),
        "e": st.booleans(),
        "f": st.floats(allow_nan=False, allow_infinity=False),
    }),
    max_size=20,
)


@settings(max_examples=60, deadline=None)
@given(_rows)
def test_avro_ocf_roundtrip(rows):
    blob = write_ocf_bytes(_record_schema, rows)
    _schema, got = read_ocf(blob)
    assert list(got) == rows
