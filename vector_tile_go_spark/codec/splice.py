"""Zero-copy byte-splice operations over serialized tiles — the reference's
fast path that never re-encodes geometry:

- remove_layer     splice a layer frame out of a tile   (operations.go:11-23)
- filter_layer     keep selected features of a layer by verbatim byte copy,
                   reusing the original key/value dictionaries
                   (read_layer.go:297-317 FilterLayer + CleanLayer reuse)
- render           re-frame kept layers of a tile       (read_tile.go:47-56)
- clean_layer      seed a LayerEncoder with a frame's existing dictionaries
                   and verbatim feature bytes            (operations.go:26-54)
- append_features  O(appended-bytes) layer append: splice the old frame out,
                   append new features reusing dictionary indices
                   (operations.go:60-91 AddFeaturesToLayer)
- get_last_point   final cursor position of a layer's last feature
                   (read_feature_lazy.go:402-445)

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


def _frame_start(lf: LayerFrame) -> int:
    """Byte offset of the layer's 0x1a tag. parse_tile records the actual
    offset (robust to padded length varints in foreign tiles); the minimal-
    varint derivation remains only as a fallback for hand-built frames."""
    if lf.frame_start >= 0:
        return lf.frame_start
    size = lf.end - lf.start
    return lf.start - len(encode_varint(size)) - 1


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
        out += buf[_frame_start(lf):lf.end]
    return bytes(out)


def filter_layer(buf: bytes, layer_name: str, keep_fn) -> bytes:
    """FilterLayer (read_layer.go:297-317): re-emit the named layer with only
    the features for which ``keep_fn(properties: dict, feature_id) -> bool``;
    feature frames and the key/value dictionaries are copied verbatim
    (geometry bytes untouched); other layers pass through unchanged."""
    out = bytearray()
    for lf in parse_tile(buf):
        if lf.name != layer_name:
            out += buf[_frame_start(lf):lf.end]
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


def remove_layers(buf: bytes, layer_names) -> bytes:
    """DeleteLayers (read_tile.go:59-72): splice several layers out in one
    pass; every surviving byte verbatim."""
    drop = set(layer_names)
    out = bytearray()
    for lf in parse_tile(buf):
        if lf.name in drop:
            continue
        out += buf[_frame_start(lf):lf.end]
    return bytes(out)


def get_last_point(lf: LayerFrame) -> tuple[int, int] | None:
    """get_last_point (read_feature_lazy.go:402-445): the last vertex of a
    layer's final feature — the cursor seed the reference's lazy append
    (ToLayerWrite, read_layer.go:196-232) installs before AddFeatureLazy.

    The engine exposes it for parity/diagnostics but does NOT seed appended
    features with it, and source analysis shows the reference never does
    either — its continuation machinery is dead code: AddFeatureLazy
    immediately calls RefreshCursor() which resets LastPoint to (0,0)
    (write_feature.go:97, write_layer.go:115-117), then copies the source
    geometry bytes VERBATIM (feature.GeomBytes(); the cursor-encoding
    branches at write_feature.go:125-155 are commented out). So no
    reference-produced tile carries cross-feature continuation deltas, and
    this codec's spec-mode append (cursor reset per feature) is byte-
    compatible with the reference's actual append output. The one residual
    decoder quirk — read_tile.go:231-236 reads later polygon-ring MoveTos
    as ABSOLUTE while the reference's own encoder writes spec-relative ring
    deltas (write_geometry.go:261-270) — is a reference self-roundtrip bug
    for multi-ring polygons, not a parity gap this engine can or should
    reproduce."""
    if not lf.feature_spans:
        return None
    f = decode_feature(lf, lf.feature_spans[-1], mode="int")
    if f is None or not len(f.xs):
        return None
    return int(f.xs[-1]), int(f.ys[-1])


def clean_layer(lf: LayerFrame, z: int, x: int, y: int,
                extent_clamp: bool = True):
    """CleanLayer (operations.go:26-54): a LayerEncoder pre-seeded with the
    frame's existing key/value dictionaries — dictionary BYTES copied
    verbatim, index maps rebuilt so appended features reuse existing
    indices — and the raw feature frames copied verbatim. Appending to the
    returned encoder costs O(appended bytes), not O(tile bytes)."""
    from .encode import LayerEncoder

    enc = LayerEncoder(z, x, y, lf.name, lf.extent, lf.version, extent_clamp)
    for i, k in enumerate(lf.keys):
        if k in enc.keys:
            # duplicate dictionary entry (foreign tile): keep the first
            # index live, burn slot i with an unmatchable filler so new
            # keys keep indexing past the existing frames
            enc.keys[("__dup_key__", i)] = i
        else:
            enc.keys[k] = i
    for i, v in enumerate(lf.values):
        vk = (type(v).__name__, v)
        if vk in enc.values:
            enc.values[("__dup_val__", i)] = i
        else:
            enc.values[vk] = i
    for ds in lf.dict_spans:
        # key AND value frames verbatim, original order; new key frames
        # append after (protobuf repeated fields may interleave — decoders
        # index each field number by arrival order, which is preserved)
        enc.keys_bytes += lf.buf[ds[0]:ds[1]]
    for fs in lf.feature_frame_spans:
        enc.features += lf.buf[fs[0]:fs[1]]
    enc.n_features = len(lf.feature_frame_spans)
    return enc


def append_features(buf: bytes, layer_name: str, features, z: int, x: int,
                    y: int, extent_clamp: bool = True) -> bytes:
    """AddFeaturesToLayer (operations.go:60-91) in splice mode: the target
    layer's dictionaries and feature bytes are copied verbatim
    (clean_layer), new features are appended reusing dictionary indices,
    the old frame is spliced out and the rebuilt frame appended at the
    tile's end — byte-order parity with the reference. When the layer is
    absent a fresh one is created. ``features`` are encode_layer-style
    dicts (type/coordinates/properties/id). For small appends into huge
    tiles this is O(appended bytes) of encode work vs the re-encode path's
    O(tile bytes); only the first matching frame is cleaned (composited
    same-name frames pass through verbatim — readers merge them)."""
    from .encode import LayerEncoder

    enc = None
    out = bytearray()
    for lf in parse_tile(buf):
        if enc is None and lf.name == layer_name:
            enc = clean_layer(lf, z, x, y, extent_clamp)
            continue  # spliced out; the rebuilt frame lands at the end
        out += buf[_frame_start(lf):lf.end]
    if enc is None:
        enc = LayerEncoder(z, x, y, layer_name, extent_clamp=extent_clamp)
    for f in features:
        enc.add_feature(f["type"], f["coordinates"], f.get("properties"),
                        f.get("id"))
    return bytes(out) + enc.flush()
