"""Protobuf wire primitives, numpy-vectorized.

Re-creates (from the public protobuf wire spec, not a port) what the
reference gets from ``github.com/murphy214/pbf`` plus its own writers:

- varint encode            (write_primitives.go:10-20 ``EncodeVarint32``)
- packed uint32 field      (write_primitives.go:70-119 ``WritePackedUint32``)
- vectorized varint decode (pbf.ReadVarint / ReadPackedUInt32 call sites,
  read_layer.go:97-114, read_feature_lazy.go:156)

The writers are byte-compatible with the reference (pinned by the golden
fixtures from write_primitives_test.go in tests/test_wire_golden.py). The
"single allocation" trick of the reference's benchmarked writer is played
here as numpy bulk length computation + one preallocated output buffer.
"""

from __future__ import annotations

import numpy as np

_THRESH = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28, 1 << 35,
                    1 << 42, 1 << 49, 1 << 56, 1 << 63], dtype=np.uint64)


def encode_varint(x: int) -> bytes:
    """LEB128 varint of a non-negative int (uint64 range)."""
    x = int(x)
    out = bytearray()
    while x > 127:
        out.append(0x80 | (x & 0x7F))
        x >>= 7
    out.append(x)
    return bytes(out)


def varint_encode_array(values: np.ndarray) -> bytes:
    """Varint-encode an array of uint values into one contiguous byte string.

    Vectorized: per-value byte lengths via searchsorted, cumsum offsets,
    single output buffer fill — the numpy analog of the reference's
    allocation-tuned size-class writer (write_primitives.go:70-119)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    nbytes = np.searchsorted(_THRESH, v, side="right") + 1  # bytes per value
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # fill byte k of every value that has > k bytes
    rem = v.copy()
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        pos = starts[mask] + k
        is_last = nbytes[mask] == k + 1
        b = (rem[mask] & np.uint64(0x7F)).astype(np.uint8)
        out[pos] = np.where(is_last, b, b | np.uint8(0x80))
        rem = rem >> np.uint64(7)
    return out.tobytes()


def write_packed_uint32(values: np.ndarray) -> bytes:
    """Length-prefixed packed repeated uint32 (no field tag).

    Byte-identical to the reference's WritePackedUint32
    (write_primitives.go:70-119): varint(total payload len) + varints."""
    payload = varint_encode_array(np.asarray(values, dtype=np.uint64))
    return encode_varint(len(payload)) + payload


def varint_decode_all(buf: np.ndarray) -> np.ndarray:
    """Decode a buffer that is entirely back-to-back varints -> uint64 array.

    Fully vectorized: continuation-bit mask -> group boundaries ->
    per-group positional weights -> add.reduceat."""
    buf = np.asarray(buf, dtype=np.uint8)
    if buf.size == 0:
        return np.zeros(0, dtype=np.uint64)
    ends = (buf & 0x80) == 0                  # last byte of each varint
    # group start indices: 0 and every index following an end
    starts = np.flatnonzero(np.concatenate(([True], ends[:-1])))
    idx = np.arange(buf.size)
    # position of each byte within its varint: start index repeated over
    # its group (single linear pass — measured ~10x over the former
    # searchsorted on batch-sized buffers)
    grp_start_per_byte = np.repeat(starts, np.diff(np.append(starts,
                                                             buf.size)))
    shift = ((idx - grp_start_per_byte) * 7).astype(np.uint64)
    contrib = (buf & np.uint8(0x7F)).astype(np.uint64) << shift
    return np.add.reduceat(contrib, starts)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Sequential varint read -> (value, new_pos). For framing-level parsing."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def read_key(buf: bytes, pos: int) -> tuple[int, int, int]:
    """Read a protobuf field key -> (field_number, wire_type, new_pos)."""
    k, pos = read_varint(buf, pos)
    return k >> 3, k & 0x7, pos
