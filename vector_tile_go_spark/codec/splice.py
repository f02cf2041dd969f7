"""Zero-copy byte-splice operations over serialized tiles — the reference's
fast path that never re-encodes geometry:

- remove_layer     splice a layer frame out of a tile   (operations.go:11-23)
- filter_layer     keep selected features of a layer by verbatim byte copy,
                   reusing the original key/value dictionaries
                   (read_layer.go:297-317 FilterLayer + CleanLayer reuse)
- render           re-frame kept layers of a tile       (read_tile.go:47-56)

These run on single tile buffers (the Spark layer maps them over Arrow
batches); predicates see decoded properties only — geometry bytes are
copied, never decoded, exactly the reference's "no geometry re-encode"
trick.
"""

from __future__ import annotations

from .decode import LayerFrame, decode_feature, parse_tile
from .wire import encode_varint


def _frame_layer_body(body: bytes) -> bytes:
    return bytes([26]) + encode_varint(len(body)) + body


def render(layers: list[LayerFrame]) -> bytes:
    """Re-serialize kept layer frames verbatim (read_tile.go:47-56)."""
    out = bytearray()
    for lf in layers:
        body = lf.buf[lf.start:lf.end]
        out += _frame_layer_body(body)
    return bytes(out)


def remove_layer(buf: bytes, layer_name: str) -> bytes:
    """Splice out the named layer, byte-identical otherwise
    (operations.go:11-23; keeps every other byte verbatim)."""
    layers = parse_tile(buf)
    out = bytearray()
    for lf in layers:
        if lf.name == layer_name:
            continue
        # frame start = layer start minus its 0x1a tag + varint length
        size = lf.end - lf.start
        frame_start = lf.start - len(encode_varint(size)) - 1
        out += buf[frame_start:lf.end]
    return bytes(out)


def filter_layer(buf: bytes, layer_name: str, keep_fn) -> bytes:
    """FilterLayer (read_layer.go:297-317): re-emit the named layer with only
    the features for which ``keep_fn(properties: dict, feature_id) -> bool``;
    feature frames and the key/value dictionaries are copied verbatim
    (geometry bytes untouched); other layers pass through unchanged."""
    out = bytearray()
    for lf in parse_tile(buf):
        size = lf.end - lf.start
        frame_start = lf.start - len(encode_varint(size)) - 1
        if lf.name != layer_name:
            out += buf[frame_start:lf.end]
            continue
        body = bytearray()
        raw = lf.name.encode("utf-8")
        body += bytes([10]) + encode_varint(len(raw)) + raw
        for span, frame in zip(lf.feature_spans, lf.feature_frame_spans):
            f = decode_feature(lf, span, mode="props")
            if f is not None and keep_fn(f.properties, f.feature_id):
                body += buf[frame[0]:frame[1]]
        for ds in lf.dict_spans:
            body += buf[ds[0]:ds[1]]
        body += bytes([40]) + encode_varint(lf.extent)
        body += bytes([120, lf.version])
        out += _frame_layer_body(bytes(body))
    return bytes(out)
