"""MVT ``Value`` message encode/decode (the 7-type property variant).

Byte-compatible re-creation of the reference's hand-rolled Value writer
(write_primitives.go:161-243) and the read-side variant switch
(read_layer.go:97-114), pinned by the golden byte fixtures from
write_primitives_test.go:11-25 in tests/test_wire_golden.py.

Wire layout (MVT spec): a layer-level field 4 (tag byte 0x22) wrapping one of
  1 string | 2 float | 3 double | 4 int64 | 5 uint64 | 6 sint64 | 7 bool
"""

from __future__ import annotations

import struct

import numpy as np

from .wire import encode_varint, read_key, read_varint


def write_value(value) -> bytes:
    """Encode one property value; dispatch mirrors WriteValue
    (write_primitives.go:202-243): unknown types degrade to empty string."""
    if isinstance(value, bool):  # before int: bool is an int subclass in Python
        return bytes([34, 2, 56, 1 if value else 0])
    if isinstance(value, bytes):
        value = value.decode("utf-8", "replace")
    if isinstance(value, str):
        raw = value.encode("utf-8")
        inner = bytes([10]) + encode_varint(len(raw)) + raw
        return bytes([34]) + encode_varint(len(inner)) + inner
    if isinstance(value, np.float32):
        return bytes([34, 5, 21]) + struct.pack("<f", float(value))
    if isinstance(value, (float, np.floating)):
        return bytes([34, 9, 25]) + struct.pack("<d", float(value))
    if isinstance(value, (np.uint8, np.uint16, np.uint32, np.uint64)):
        payload = encode_varint(int(value))
        return bytes([34, len(payload) + 1, 40]) + payload
    if isinstance(value, (int, np.integer)):
        # Go converts via uint64(vv.Int()): negatives wrap to 2^64 + v
        payload = encode_varint(int(value) & 0xFFFFFFFFFFFFFFFF)
        return bytes([34, len(payload) + 1, 32]) + payload
    # fallback: empty string (write_primitives.go:232-240)
    inner = bytes([10, 0])
    return bytes([34]) + encode_varint(len(inner)) + inner


def read_value(buf: bytes, pos: int, end: int):
    """Decode the *inner* Value message body in buf[pos:end] -> python value.

    Mirrors the read-side switch (read_layer.go:97-114); sint64 (field 6) is
    decoded as plain uint like the reference does."""
    value = ""
    while pos < end:
        field, wt, pos = read_key(buf, pos)
        if field == 1 and wt == 2:      # string
            n, pos = read_varint(buf, pos)
            value = buf[pos:pos + n].decode("utf-8", "replace")
            pos += n
        elif field == 2 and wt == 5:    # float32
            value = np.float32(struct.unpack_from("<f", buf, pos)[0])
            pos += 4
        elif field == 3 and wt == 1:    # float64
            value = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif field == 4 and wt == 0:    # int64
            v, pos = read_varint(buf, pos)
            value = v - (1 << 64) if v >= (1 << 63) else v
        elif field == 5 and wt == 0:    # uint64
            value, pos = read_varint(buf, pos)
        elif field == 6 and wt == 0:    # sint64: reference reads as uint
            value, pos = read_varint(buf, pos)
        elif field == 7 and wt == 0:    # bool
            v, pos = read_varint(buf, pos)
            value = bool(v)
        else:  # skip unknown
            if wt == 0:
                _, pos = read_varint(buf, pos)
            elif wt == 2:
                n, pos = read_varint(buf, pos)
                pos += n
            elif wt == 5:
                pos += 4
            elif wt == 1:
                pos += 8
            else:
                break
    return value
