"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as Arrow-batched kernels.

The container has no image/audio libraries, so the *decode* step is STUBBED:
``decode_image`` raises NotImplementedError unless a codec is injected, and
``fake_decode`` provides a deterministic stand-in (pure formula of the
payload bytes) so the Spark-side plumbing — schema, batch shape, UDF
signatures, partitioning — is real and tested end-to-end.

Payload generation is deterministic from doc_id (a fake PNG-ish container:
magic + width/height header + pseudo-pixel bytes), so the DuckDB oracle can
verify the extracted metadata with integer arithmetic.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"\x89FAKEIMG"


def attach_fake_images(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Add (image binary, image_meta struct) columns: a deterministic fake
    payload per doc. width = 16 + doc_id % 624, height = 16 + doc_id % 464,
    8 pseudo-pixel bytes from md5(doc_id)."""
    w = (F.col(key_col) % 624 + 16).cast("int")
    h = (F.col(key_col) % 464 + 16).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        F.to_binary(F.lpad(F.hex(w), 8, "0"), F.lit("hex")),
        F.to_binary(F.lpad(F.hex(h), 8, "0"), F.lit("hex")))
    pixels = F.to_binary(F.substring(F.md5(F.col(key_col).cast("string")), 1, 16),
                         F.lit("hex"))
    return docs.withColumn("image", F.concat(header, pixels)) \
        .withColumn("image_meta", F.struct(
            w.alias("width"), h.alias("height"),
            F.lit("fakeimg").alias("format")))


def decode_image(images: DataFrame, codec: Callable | None = None,
                 key_col: str = "doc_id") -> DataFrame:
    """Real decode entry point. ``codec(payload: bytes) -> np.ndarray`` must
    be supplied (e.g. PIL/libvips when available); without one this raises —
    the deliberate stub demanded by the no-image-libs container."""
    if codec is None:
        raise NotImplementedError(
            "no image codec available in this environment; inject one via "
            "`codec=` or use fake_decode() for the plumbing path")
    return _decode_with(images, codec, key_col)


def fake_decode(images: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in decode: parses the fake header + derives
    4 'features' from the pseudo-pixels. Exercises the exact batch shape the
    real codec would use."""
    def codec(payload: bytes):
        assert payload[:8] == MAGIC
        w = int.from_bytes(payload[8:12], "big")
        h = int.from_bytes(payload[12:16], "big")
        px = np.frombuffer(payload[16:24], dtype=np.uint8)
        return w, h, px

    return _decode_with(images, codec, key_col)


def _decode_with(images: DataFrame, codec, key_col: str) -> DataFrame:
    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf["image"]):
                w, h, px = codec(bytes(payload))
                rows.append((int(key), w, h, int(px.sum()), int(px.max()),
                             int(px.min())))
            yield pd.DataFrame(rows, columns=[key_col, "width", "height",
                                              "px_sum", "px_max", "px_min"])

    return images.select(key_col, "image").mapInPandas(
        decode_batch, f"{key_col} bigint, width int, height int, "
                      "px_sum bigint, px_max int, px_min int")


def resize_stub(decoded: DataFrame, target: int = 64) -> DataFrame:
    """Resize metadata math (aspect-preserving fit into target x target) —
    the pixel resample itself is part of the stubbed codec."""
    scale = F.least(F.lit(target) / F.col("width"),
                    F.lit(target) / F.col("height"))
    return decoded.withColumn(
        "out_width", F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int")
    ).withColumn(
        "out_height", F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int"))


def frame_sample_plan(n_frames: F.Column, every: int = 30) -> F.Column:
    """Frame-sampling plan for a video payload: indexes 0, every, 2*every...
    as an array column (the sampling itself belongs to the stubbed codec)."""
    return F.sequence(F.lit(0), n_frames - 1, F.lit(every))
