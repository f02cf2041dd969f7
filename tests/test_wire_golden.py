"""Golden byte fixtures ported as *data* from the reference's unit tests.

Sources: /root/reference/write_primitives_test.go:11-58 (values, varint,
packed uint32). These pin the wire writers byte-exactly without any Go
toolchain.
"""

import numpy as np
import pytest

from vector_tile_go_spark.codec.values import read_value, write_value
from vector_tile_go_spark.codec.wire import (encode_varint, read_varint,
                                             varint_decode_all,
                                             varint_encode_array,
                                             write_packed_uint32)

# write_primitives_test.go:11-12
GOLDEN_VALUES = [
    ("string", bytes([0x22, 0x8, 0xA, 0x6, 0x73, 0x74, 0x72, 0x69, 0x6E, 0x67])),
    (np.float32(100.23), bytes([0x22, 0x5, 0x15, 0xC3, 0x75, 0xC8, 0x42])),
    (float(100.23), bytes([0x22, 0x9, 0x19, 0x1F, 0x85, 0xEB, 0x51, 0xB8, 0x0E, 0x59, 0x40])),
    (int(10201203912), bytes([0x22, 0x6, 0x20, 0xC8, 0x89, 0xA8, 0x80, 0x26])),
    (np.uint64(10201203912), bytes([0x22, 0x6, 0x28, 0xC8, 0x89, 0xA8, 0x80, 0x26])),
    (True, bytes([0x22, 0x2, 0x38, 0x1])),
]


@pytest.mark.parametrize("value,expected", GOLDEN_VALUES,
                         ids=["str", "f32", "f64", "i64", "u64", "bool"])
def test_write_value_golden(value, expected):
    assert write_value(value) == expected


@pytest.mark.parametrize("value,expected", GOLDEN_VALUES,
                         ids=["str", "f32", "f64", "i64", "u64", "bool"])
def test_value_roundtrip(value, expected):
    # decode the inner Value body (skip the 0x22 tag + length prefix)
    n, pos = read_varint(expected, 1)
    got = read_value(expected, pos, pos + n)
    if isinstance(value, np.floating):
        assert float(got) == pytest.approx(float(value))
    else:
        assert got == value


def test_varint_232():
    # write_primitives_test.go:27-43: EncodeVarint(232) == {0xe8, 0x1}
    assert encode_varint(232) == bytes([0xE8, 0x1])
    assert varint_encode_array(np.array([232])) == bytes([0xE8, 0x1])


def test_packed_uint32_golden():
    # write_primitives_test.go:45-58: WritePackedUint32({10,400,500,600,700})
    vals = np.array([10, 400, 500, 600, 700], dtype=np.uint64)
    expected = bytes([0x9, 0xA, 0x90, 0x3, 0xF4, 0x3, 0xD8, 0x4, 0xBC, 0x5])
    assert write_packed_uint32(vals) == expected


def test_varint_vector_roundtrip():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**32 - 1, size=5000, dtype=np.uint64)
    vals[:10] = [0, 1, 127, 128, 16383, 16384, 2097151, 2097152, 2**31, 2**32 - 1]
    enc = varint_encode_array(vals)
    dec = varint_decode_all(np.frombuffer(enc, dtype=np.uint8))
    assert np.array_equal(dec, vals)


def test_varint_sequential_matches_vector():
    vals = [0, 5, 127, 128, 300, 70000, 2**28, 2**35]
    enc = varint_encode_array(np.array(vals, dtype=np.uint64))
    pos = 0
    out = []
    for _ in vals:
        v, pos = read_varint(enc, pos)
        out.append(v)
    assert out == vals
