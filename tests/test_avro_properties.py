"""Property-based conformance for the Avro binary codec (hypothesis).

The golden-byte tests pin known spec vectors; these pin the *laws*: every
in-range value round-trips exactly, encodings are self-delimiting inside a
record, and the varint length matches the spec's 7-bit-group rule.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_exercise_spark.functions.avro_wire import (
    AvroField,
    decode_long,
    decode_record,
    encode_long,
    encode_record,
)

INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(INT64)
@settings(max_examples=500)
def test_long_roundtrip(n):
    got, pos = decode_long(encode_long(n), 0)
    assert got == n
    assert pos == len(encode_long(n))


@given(INT64)
def test_varint_length_matches_spec(n):
    """Encoded length == ceil(significant_bits(zigzag)/7), min 1 byte."""
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    expect = max(1, math.ceil(z.bit_length() / 7))
    assert len(encode_long(n)) == expect


@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.text(max_size=80),
    st.one_of(st.none(), st.text(max_size=40)),
    st.floats(allow_nan=False, width=64),
    st.binary(max_size=64),
    st.booleans(),
)
@settings(max_examples=200)
def test_record_roundtrip_all_types(k, s, opt, d, raw, flag):
    fields = [
        AvroField("k", "long", False),
        AvroField("s", "string", False),
        AvroField("opt", "string", True),
        AvroField("d", "double", False),
        AvroField("raw", "bytes", False),
        AvroField("flag", "boolean", False),
    ]
    row = {"k": k, "s": s, "opt": opt, "d": d, "raw": raw, "flag": flag}
    assert decode_record(encode_record(row, fields), fields) == row


@given(st.lists(INT64, min_size=1, max_size=20))
def test_concatenated_longs_are_self_delimiting(values):
    """A record body is fields concatenated with no framing — decoding must
    consume exactly each field's bytes (the property record decode relies
    on)."""
    buf = b"".join(encode_long(v) for v in values)
    pos, out = 0, []
    while pos < len(buf):
        v, pos = decode_long(buf, pos)
        out.append(v)
    assert out == values
