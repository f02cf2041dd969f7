"""Spark-facing codec operators: grouped-map encode, map-batch decode.

The one unavoidable Python boundary in the engine is the MVT byte codec —
everything before (extraction, tile assignment) and after (aggregation,
joins) stays JVM-side. Both UDFs are Arrow-batched (grouped map /
mapInPandas); no per-row Python anywhere.

Scale notes (the 100 TB story):
- encode shuffles once on (z, x, y) — the same explicit boundary the
  reference hits when grouping features into layers (SURVEY.md EP3). Hot
  tiles (urban cells / hot domains) are handled by salting: encode partial
  layers per salt, then binary-concat them — valid because MVT layer bytes
  are self-framing (write_layer.go:172-174) and feature frames within a
  layer are order-independent for readers.
- decode is embarrassingly parallel per tile row; column pruning upstream
  picks the 'props'/'int'/'lnglat' mode so unneeded geometry is never
  decoded (the reference's lazy-read win, README.md:46).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec.decode import decode_tile
from ..codec.encode import encode_point_layer

TILE_SCHEMA = "z int, x bigint, y bigint, layer string, tile_pbf binary, n_features int"

FEATURE_SCHEMA = ("z int, x bigint, y bigint, layer string, feature_id bigint, "
                  "geom_type int, geojson_type string, lng double, lat double, "
                  "properties map<string,string>")


def _encode_sorted_batches(batches: Iterator[pd.DataFrame], layer_name: str,
                           prop_cols: tuple[str, ...], extent: int,
                           id_col: str) -> Iterator[pd.DataFrame]:
    """Streaming group-by over partition-sorted batches: rows arrive sorted
    by (z, x, y, ...); tile groups are sliced out locally and a partial
    group at a batch boundary is carried into the next batch. One Python
    invocation per Arrow batch (thousands of tiles), NOT one per tile —
    applyInPandas pays its UDF round-trip per *group*, which is the
    dominant cost when tiles are small."""
    from ..codec.encode_fast import encode_point_tiles_bulk

    pending: pd.DataFrame | None = None
    group_cols = ["z", "x", "y"]  # extended with 'salt' when present
    cols = ["z", "x", "y", "layer", "tile_pbf", "n_features"]
    first = True

    def encode_batch(pdf: pd.DataFrame, starts, ends) -> pd.DataFrame:
        props = {c: pdf[c].astype(str).to_numpy() for c in prop_cols}
        # per-row z: the bulk projector broadcasts arrays fine
        z = pdf["z"].to_numpy()
        bufs = encode_point_tiles_bulk(
            z, pdf["x"].to_numpy(), pdf["y"].to_numpy(),
            pdf["lng"].to_numpy(), pdf["lat"].to_numpy(),
            pdf[id_col].to_numpy(np.int64), props, starts, ends,
            layer_name, extent)
        xs = pdf["x"].to_numpy()[starts]
        ys = pdf["y"].to_numpy()[starts]
        zs = pdf["z"].to_numpy()[starts]
        res = pd.DataFrame({"z": zs, "x": xs, "y": ys, "layer": layer_name,
                            "tile_pbf": bufs,
                            "n_features": (np.asarray(ends) -
                                           np.asarray(starts)).astype("int32")})
        if "salt" in pdf.columns:
            res["salt"] = pdf["salt"].to_numpy()[starts]
        return res

    for pdf in batches:
        if first:
            first = False
            if "salt" in pdf.columns:
                group_cols = ["z", "x", "y", "salt"]
                cols = cols + ["salt"]
        if pending is not None:
            pdf = pd.concat([pending, pdf], ignore_index=True)
            pending = None
        if not len(pdf):
            continue
        change = np.zeros(len(pdf) - 1, dtype=bool)
        for c in group_cols:
            v = pdf[c].to_numpy()
            change |= v[1:] != v[:-1]
        boundaries = np.flatnonzero(change) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(pdf)]])
        # hold the last group: it may continue in the next batch
        if len(starts) > 1:
            yield encode_batch(pdf, starts[:-1], ends[:-1])
        pending = pdf.iloc[starts[-1]:]
    if pending is not None and len(pending):
        yield encode_batch(pending.reset_index(drop=True), np.array([0]),
                           np.array([len(pending)]))


def _encode_sorted_batches_arrow(batches, layer_name: str,
                                 prop_cols: tuple[str, ...], extent: int,
                                 id_col: str):
    """Arrow-native variant of _encode_sorted_batches (mapInArrow): columns
    go pyarrow -> numpy with zero-copy where the type allows, and the
    output RecordBatch is built directly — no pandas DataFrame
    materialization on either side of the boundary. Same streaming
    group-carry protocol; byte-identical tiles."""
    import pyarrow as pa

    from ..codec.encode_fast import encode_point_tiles_bulk

    group_cols = ["z", "x", "y"]
    first = True
    has_salt = False
    pending: dict[str, np.ndarray] | None = None
    out_schema = None

    def to_np(rb: "pa.RecordBatch") -> dict[str, np.ndarray]:
        cols = {}
        for name in rb.schema.names:
            col = rb.column(rb.schema.get_field_index(name))
            if name in prop_cols and (not pa.types.is_string(col.type)
                                      or col.null_count):
                # non-string or null-carrying props: python-str formatting
                # parity with the pandas path's astype(str) (None -> 'None',
                # NaN -> 'nan'); null-free string columns pass through
                cols[name] = pd.Series(
                    col.to_numpy(zero_copy_only=False)).astype(str).to_numpy()
            else:
                cols[name] = col.to_numpy(zero_copy_only=False)
        return cols

    def encode_arrays(arrs: dict[str, np.ndarray], starts, ends):
        props = {c: arrs[c] for c in prop_cols}
        bufs = encode_point_tiles_bulk(
            arrs["z"], arrs["x"], arrs["y"], arrs["lng"], arrs["lat"],
            np.asarray(arrs[id_col], dtype=np.int64), props, starts, ends,
            layer_name, extent)
        n = len(starts)
        data = [
            pa.array(np.asarray(arrs["z"])[starts], type=pa.int32()),
            pa.array(np.asarray(arrs["x"])[starts], type=pa.int64()),
            pa.array(np.asarray(arrs["y"])[starts], type=pa.int64()),
            pa.array([layer_name] * n, type=pa.string()),
            pa.array(bufs, type=pa.binary()),
            pa.array((np.asarray(ends) - np.asarray(starts)).astype("int32"),
                     type=pa.int32()),
        ]
        names = ["z", "x", "y", "layer", "tile_pbf", "n_features"]
        if has_salt:
            data.append(pa.array(np.asarray(arrs["salt"])[starts],
                                 type=pa.int32()))
            names.append("salt")
        return pa.RecordBatch.from_arrays(data, names=names)

    for rb in batches:
        if first:
            first = False
            has_salt = "salt" in rb.schema.names
            if has_salt:
                group_cols = ["z", "x", "y", "salt"]
        arrs = to_np(rb)
        if pending is not None:
            arrs = {k: np.concatenate([pending[k], arrs[k]])
                    for k in arrs}
            pending = None
        m = len(arrs["z"])
        if not m:
            continue
        change = np.zeros(m - 1, dtype=bool)
        for c in group_cols:
            v = arrs[c]
            change |= v[1:] != v[:-1]
        boundaries = np.flatnonzero(change) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [m]])
        if len(starts) > 1:
            yield encode_arrays(arrs, starts[:-1], ends[:-1])
        pending = {k: v[starts[-1]:] for k, v in arrs.items()}
    if pending is not None and len(pending["z"]):
        yield encode_arrays(pending, np.array([0]),
                            np.array([len(pending["z"])]))


def encode_point_tiles(entities: DataFrame, layer_name: str = "geo",
                       prop_cols: tuple[str, ...] = ("url", "mention_idx"),
                       extent: int = 4096, n_partitions: int | None = None,
                       id_col: str = "doc_id",
                       use_arrow: bool = True) -> DataFrame:
    """(z, x, y, lng, lat, <id_col>, props...) -> one MVT layer per tile.

    Plan: one shuffle — repartition on the tile key + sortWithinPartitions
    (z, x, y, id, props) — then a single streaming map-batch UDF that
    encodes every tile of the partition (deterministic feature order from
    the sort). This is the reference's EP3 boundary (SURVEY.md §3) with
    the per-group UDF overhead amortized across whole Arrow batches.
    ``use_arrow`` routes through mapInArrow (no pandas materialization at
    the boundary — the zero-copy path of SURVEY §2.10); tiles are
    byte-identical either way."""
    cols = ["z", "x", "y", "lng", "lat", id_col, *prop_cols]
    df = entities.select(*cols)
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    df = (df.repartition(n_partitions, "z", "x", "y")
          .sortWithinPartitions("z", "x", "y", id_col, *prop_cols))

    if use_arrow:
        def run_arrow(batches):
            return _encode_sorted_batches_arrow(batches, layer_name,
                                                prop_cols, extent, id_col)
        return df.mapInArrow(run_arrow, TILE_SCHEMA)

    def run(batches):
        return _encode_sorted_batches(batches, layer_name, prop_cols, extent,
                                      id_col)

    return df.mapInPandas(run, TILE_SCHEMA)


def encode_point_tiles_salted(entities: DataFrame, layer_name: str = "geo",
                              prop_cols: tuple[str, ...] = ("url", "mention_idx"),
                              n_salts: int = 8, id_col: str = "doc_id") -> DataFrame:
    """Skew-resistant encode: hash-salt the tile group key, encode partial
    layers per (tile, salt), then binary-concat partials per tile.

    Concat of serialized layers is a valid multi-layer tile (compositing,
    README.md:142-191); readers that merge same-named layers see one logical
    layer. The final concat is a tiny per-tile agg, so the heavy encode work
    spreads over n_salts times more tasks for hot tiles."""
    cols = ["z", "x", "y", "lng", "lat", id_col, *prop_cols]
    df = entities.select(*cols).withColumn(
        "salt", F.pmod(F.xxhash64(id_col), F.lit(n_salts)).cast("int"))
    n_parts = df.sparkSession.sparkContext.defaultParallelism * 2
    df = (df.repartition(n_parts, "z", "x", "y", "salt")
          .sortWithinPartitions("z", "x", "y", "salt", id_col, *prop_cols))

    def run(batches):
        return _encode_sorted_batches_arrow(batches, layer_name, prop_cols,
                                            4096, id_col)

    partials = df.mapInArrow(
        run, TILE_SCHEMA + ", salt int").drop("layer")
    # per-tile binary concat of the (few) partials, ordered by salt for
    # determinism; this is the O(1) compositing union — no re-encode.
    # F.aggregate + F.concat stays JVM-side (whole-stage codegen), no
    # Python round-trip for the merge.
    return (partials
            .groupBy("z", "x", "y")
            .agg(F.sort_array(F.collect_list(F.struct("salt", "tile_pbf"))).alias("ps"),
                 F.sum("n_features").cast("int").alias("n_features"))
            .select("z", "x", "y", F.lit(layer_name).alias("layer"),
                    F.aggregate(F.col("ps.tile_pbf"),
                                F.lit(b"").cast("binary"),
                                lambda acc, b: F.concat(acc, b))
                    .alias("tile_pbf"), "n_features"))


def decode_tiles(tiles: DataFrame, mode: str = "lnglat",
                 layers: list[str] | None = None,
                 prop_cols: tuple[str, ...] | None = None,
                 quarantine: bool = False) -> DataFrame:
    """tiles(z, x, y, tile_pbf) -> feature rows. Point-centric projection:
    emits (lng, lat) of the first coordinate for point features; full
    geometry consumers use decode_tile_vertices.

    ``prop_cols``: project named properties to flat string columns instead
    of the map<string,string> — the reference's lazy property projection
    (README.md:34) pushed into the UDF; flat columns skip the Arrow/JVM map
    builders, which dominate wide decodes.

    ``quarantine``: corrupt tiles become rows with the ``error`` column set
    (null feature fields) instead of failing the stage — the distributed
    form of the reference's per-tile panic/recover (read_tile.go:79-84)."""
    want_geom = mode != "props"
    # decode to tile ints; inverse-project the whole Arrow batch in ONE
    # vectorized call (the per-feature Project of the reference,
    # read_feature_lazy.go:54-63, amortized batch-wide)
    inner_mode = "int" if want_geom else "props"

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import tilemath as tm
        from ..codec.decode import bulk_point_layer, decode_feature, parse_tile
        for pdf in batches:
            # Two accumulators, merged IN ORDER at batch end: bulk point
            # layers append whole numpy segments (no per-feature Python —
            # the r4 VERDICT's remaining interpreter cost on full-feature
            # decodes); the per-feature walk and error rows append scalars,
            # flushed into a segment whenever a bulk segment arrives.
            segs: list[dict] = []
            cz, cx, cy, clay, cid, cgt, cgj = [], [], [], [], [], [], []
            cpx, cpy, cext, cprops, cerr = [], [], [], [], []
            pcols = {c: [] for c in (prop_cols or ())}

            def flush_scalar():
                if not cz:
                    return
                seg = {"z": np.asarray(cz, np.int64),
                       "x": np.asarray(cx, np.int64),
                       "y": np.asarray(cy, np.int64),
                       "layer": np.asarray(clay, object),
                       "fid": np.asarray(cid, object),
                       "gt": np.asarray(cgt, object),
                       "gj": np.asarray(cgj, object),
                       "px": np.asarray(cpx, np.float64),
                       "py": np.asarray(cpy, np.float64),
                       "ext": np.asarray(cext, np.int64),
                       "err": np.asarray(cerr, object)}
                if prop_cols is None:
                    seg["props"] = np.asarray(cprops, object)
                else:
                    for c in prop_cols:
                        seg[c] = np.asarray(pcols[c], object)
                segs.append(seg)
                for lst in (cz, cx, cy, clay, cid, cgt, cgj, cpx, cpy,
                            cext, cprops, cerr, *pcols.values()):
                    lst.clear()

            def emit_error(z, x, y, msg):
                # corrupt-tile quarantine (SURVEY.md §4: the reference's
                # panic/recover per-tile isolation, read_tile.go:79-84,
                # becomes an error row instead of a failed job — at 10^12
                # docs one bad tile must not kill the stage)
                cz.append(z)
                cx.append(x)
                cy.append(y)
                clay.append(None)
                cid.append(None)
                cgt.append(None)
                cgj.append(None)
                cpx.append(np.nan)
                cpy.append(np.nan)
                cext.append(4096)
                cerr.append(msg[:200])
                if prop_cols is None:
                    cprops.append({})
                else:
                    for c in prop_cols:
                        pcols[c].append(None)

            for z, x, y, buf in zip(pdf["z"], pdf["x"], pdf["y"], pdf["tile_pbf"]):
                if buf is None:
                    continue
                z, x, y = int(z), int(x), int(y)
                try:
                    frames = parse_tile(bytes(buf))
                except Exception as e:  # noqa: BLE001 — quarantine, not crash
                    if quarantine:
                        emit_error(z, x, y, f"parse: {e!r}")
                        continue
                    raise
                for lf in frames:
                    if layers is not None and lf.name not in layers:
                        continue
                    bulk = bulk_point_layer(lf)
                    if bulk is not None:
                        ids, key_idx, val_idx, px, py, n_props = bulk
                        n = len(ids)
                        # uniform key layout + in-range dictionary indices
                        # required for the vectorized join (our encoder
                        # always satisfies both; foreign tiles fall back)
                        if (n and bool((key_idx == key_idx[0]).all())
                                and bool((key_idx[0] < len(lf.keys)).all())
                                and bool((val_idx < len(lf.values)).all())):
                            flush_scalar()
                            fid_obj = ids.astype(object)
                            fid_obj[ids == 0] = None
                            seg = {
                                "z": np.full(n, z, np.int64),
                                "x": np.full(n, x, np.int64),
                                "y": np.full(n, y, np.int64),
                                "layer": np.full(n, lf.name, object),
                                "fid": fid_obj,
                                "gt": np.full(n, 1, object),
                                "gj": np.full(n, "Point", object),
                                "err": np.full(n, None, object),
                            }
                            if want_geom:
                                seg["px"] = px.astype(np.float64)
                                seg["py"] = py.astype(np.float64)
                                seg["ext"] = np.full(n, lf.extent, np.int64)
                            else:
                                # match the per-feature walk: props mode
                                # never exposes coords (lng/lat = NaN)
                                seg["px"] = np.full(n, np.nan)
                                seg["py"] = np.full(n, np.nan)
                                seg["ext"] = np.full(n, 4096, np.int64)
                            # str() once per DICTIONARY entry, then gather —
                            # O(distinct values), not O(features x props)
                            vals_str = np.array([str(v) for v in lf.values],
                                                dtype=object)
                            names0 = [lf.keys[k] if k < len(lf.keys) else ""
                                      for k in key_idx[0].tolist()]
                            if prop_cols is None:
                                colvals = [vals_str[val_idx[:, j]]
                                           for j in range(n_props)]
                                seg["props"] = np.array(
                                    [{names0[j]: colvals[j][r]
                                      for j in range(n_props)}
                                     for r in range(n)], dtype=object)
                            else:
                                for c in prop_cols:
                                    if c in names0:
                                        j = names0.index(c)
                                        seg[c] = vals_str[val_idx[:, j]]
                                    else:
                                        seg[c] = np.full(n, None, object)
                            segs.append(seg)
                            continue
                    for span in lf.feature_spans:
                        try:
                            f = decode_feature(lf, span, mode=inner_mode)
                        except Exception as e:  # noqa: BLE001
                            if quarantine:
                                emit_error(z, x, y, f"feature: {e!r}")
                                continue
                            raise
                        if f is None:
                            continue
                        cz.append(z)
                        cx.append(x)
                        cy.append(y)
                        clay.append(lf.name)
                        cid.append(f.feature_id)
                        cgt.append(f.geom_type)
                        cgj.append(f.geojson_type)
                        cerr.append(None)
                        if want_geom and len(f.xs):
                            cpx.append(f.xs[0])
                            cpy.append(f.ys[0])
                            cext.append(lf.extent)
                        else:
                            cpx.append(np.nan)
                            cpy.append(np.nan)
                            cext.append(4096)
                        p = f.properties
                        if prop_cols is None:
                            cprops.append({k: str(v) for k, v in p.items()})
                        else:
                            for c in prop_cols:
                                v = p.get(c)
                                pcols[c].append(None if v is None else str(v))
            flush_scalar()
            if not segs:
                continue  # empty batch: yielding nothing beats fighting
                # pandas' float64 default dtype for empty object columns
            col = {k: np.concatenate([s[k] for s in segs])
                   for k in segs[0]}
            if mode == "lnglat":
                lngs, lats = tm.project_tile_to_lnglat(
                    col["px"], col["py"], col["z"],
                    col["x"].astype(np.float64),
                    col["y"].astype(np.float64), col["ext"])
            else:
                lngs, lats = col["px"], col["py"]
            data = {"z": pd.Series(col["z"], dtype="int32"),
                    "x": pd.Series(col["x"], dtype="int64"),
                    "y": pd.Series(col["y"], dtype="int64"),
                    "layer": col["layer"], "feature_id": col["fid"],
                    "geom_type": col["gt"],
                    "geojson_type": col["gj"], "lng": lngs, "lat": lats}
            if prop_cols is None:
                data["properties"] = col["props"]
            else:
                for c in prop_cols:
                    data[c] = col[c]
            if quarantine:
                data["error"] = col["err"]
            yield pd.DataFrame(data)

    if prop_cols is None:
        schema = FEATURE_SCHEMA
    elif prop_cols:
        schema = FEATURE_SCHEMA.replace(
            "properties map<string,string>",
            ", ".join(f"{c} string" for c in prop_cols))
    else:  # properties projected away entirely
        schema = FEATURE_SCHEMA.replace(
            ", properties map<string,string>", "")
    if quarantine:
        schema += ", error string"
    return tiles.mapInPandas(decode_batch, schema)


def decode_tile_stats(tiles: DataFrame, layers: list[str] | None = None,
                      distinct_prop: str = "url",
                      out_col: str = "n_urls",
                      quarantine: bool = False) -> DataFrame:
    """Fused decode+aggregate: per-tile feature count and distinct values of
    one property, computed INSIDE the decode UDF — ~1 output row per tile
    instead of 1 per feature crossing the python->JVM Arrow boundary.

    Semantically identical to
    ``decode_tiles(mode="props").groupBy(z,x,y).agg(count(*),
    countDistinct(properties[distinct_prop]))`` for the count-shaped
    round-trip queries, because the encoders emit exactly one row per
    (z, x, y): the per-tile group is already complete within the row, so
    the aggregation needs no shuffle at all. Multi-frame tiles (salted
    concat / composites) union the distinct sets across frames in Python.

    This is the engine's answer to the decode-return scaling bottleneck
    (BASELINE.md §scaling): the contended Arrow return traffic drops by
    ~features-per-tile (10^3x for dense tiles) for queries that only need
    per-tile aggregates. Null property values are excluded from the
    distinct count (countDistinct semantics).

    ``quarantine``: corrupt tiles become zero-count rows with ``error``
    set instead of failing the stage — same isolation contract as
    ``decode_tiles(quarantine=True)`` (read_tile.go:79-84 at scale)."""

    def tile_counts(buf: bytes) -> tuple[int, int]:
        from ..codec.decode import bulk_point_layer, decode_feature, parse_tile
        n = 0
        vals: set = set()
        for lf in parse_tile(buf):
            if layers is not None and lf.name not in layers:
                continue
            bulk = bulk_point_layer(lf)
            if bulk is not None:
                ids, key_idx, val_idx, _, _, n_props = bulk
                if (len(ids) and bool((key_idx == key_idx[0]).all())
                        and bool((key_idx[0] < len(lf.keys)).all())
                        and bool((val_idx < len(lf.values)).all())):
                    n += len(ids)
                    names0 = [lf.keys[k] for k in key_idx[0].tolist()]
                    if distinct_prop in names0:
                        j = names0.index(distinct_prop)
                        varr = np.asarray(lf.values, dtype=object)
                        # distinct over unique dictionary indices, then map
                        # to values (robust to foreign tiles with
                        # duplicated dictionary entries)
                        for v in varr[np.unique(val_idx[:, j])]:
                            if v is not None:
                                vals.add(str(v))
                    continue
            for span in lf.feature_spans:
                f = decode_feature(lf, span, mode="props")
                if f is None:
                    continue
                n += 1
                v = f.properties.get(distinct_prop)
                if v is not None:
                    vals.add(str(v))
        return n, len(vals)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        from ..codec.decode import bulk_point_tile_stats
        use_bulk = os.environ.get("SPARK_GRAFT_BULK_DECODE", "1") != "0"
        for pdf in batches:
            # cross-tile fused fast path: one varint pass over the whole
            # batch's conforming tiles (per-tile numpy setup amortized —
            # the decode-side twin of the bulk encoder)
            keep = [(int(z), int(x), int(y), bytes(buf))
                    for z, x, y, buf in zip(pdf["z"], pdf["x"], pdf["y"],
                                            pdf["tile_pbf"])
                    if buf is not None]
            if not keep:
                continue
            bufs = [r[3] for r in keep]
            if use_bulk:
                # The batch kernel wins where the per-tile walk's fixed
                # numpy setup dominates — SPARSE tiles (few features). On
                # dense tiles (KBs of features each) the walk is already
                # amortized and the kernel's big streaming temporaries
                # lose (this sandbox's guest kernel inflates sustained
                # streaming passes ~10x, BASELINE.md r3/r4). Route by
                # tile size; chunk the sparse set by tiles AND bytes so
                # the working set stays cache-resident.
                max_tile = int(os.environ.get(
                    "SPARK_GRAFT_BULK_DECODE_MAX_TILE", "4096"))
                chunk = int(os.environ.get("SPARK_GRAFT_BULK_DECODE_CHUNK",
                                           "1024"))
                # 256 KB of wire bytes per chunk: the kernel's int64
                # matrices expand ~30x, so this keeps each chunk's
                # temporaries ~8 MB (cache-adjacent, under the host's
                # streaming-pass inflation threshold)
                byte_budget = int(os.environ.get(
                    "SPARK_GRAFT_BULK_DECODE_BYTES", str(1 << 18)))
                ns = np.zeros(len(bufs), dtype=np.int64)
                nvs = np.zeros(len(bufs), dtype=np.int64)
                handled = np.zeros(len(bufs), dtype=bool)
                small = [i for i, b in enumerate(bufs) if len(b) <= max_tile]
                lo = 0
                while lo < len(small):
                    hi, acc = lo, 0
                    while hi < len(small) and hi - lo < chunk and \
                            acc < byte_budget:
                        acc += len(bufs[small[hi]])
                        hi += 1
                    sel = small[lo:hi]
                    # Any kernel exception degrades this chunk to the
                    # quarantined per-tile walk (handled stays False) —
                    # one corrupt tile must never fail the Spark task
                    # (ADVICE r4 high: decode_tile_stats' per-tile
                    # isolation contract).
                    try:
                        cns, cnvs, ch = bulk_point_tile_stats(
                            [bufs[i] for i in sel], distinct_prop, layers)
                    except Exception:  # noqa: BLE001 — isolate chunk
                        lo = hi
                        continue
                    for k, i in enumerate(sel):
                        ns[i], nvs[i], handled[i] = cns[k], cnvs[k], ch[k]
                    lo = hi
            else:
                ns = nvs = None
                handled = np.zeros(len(keep), dtype=bool)
            rows = []
            for i, (z, x, y, buf) in enumerate(keep):
                if handled[i]:
                    if ns[i]:
                        rows.append((z, x, y, int(ns[i]), int(nvs[i]), None)
                                    if quarantine else
                                    (z, x, y, int(ns[i]), int(nvs[i])))
                    continue
                if quarantine:
                    try:
                        n, nv = tile_counts(buf)
                    except Exception as e:  # noqa: BLE001 — isolate tile
                        rows.append((z, x, y, 0, 0, f"decode: {e!r}"[:200]))
                        continue
                    if n:
                        rows.append((z, x, y, n, nv, None))
                else:
                    n, nv = tile_counts(buf)
                    if n:
                        rows.append((z, x, y, n, nv))
            if rows:
                cols = ["z", "x", "y", "n_features", out_col]
                if quarantine:
                    cols.append("error")
                yield pd.DataFrame(rows, columns=cols)

    schema = f"z int, x bigint, y bigint, n_features bigint, {out_col} bigint"
    if quarantine:
        schema += ", error string"
    return tiles.mapInPandas(stats, schema)


def decode_tile_point_agg(tiles: DataFrame, agg_fn, agg_schema: str,
                          layers: list[str] | None = None) -> DataFrame:
    """Pluggable member of the fused decode+aggregate family
    (decode_tile_stats is the count/distinct instance): ONE Arrow return
    row per tile, with ``agg_fn(z, x, y, pxs, pys, extents) -> tuple``
    computed inside the UDF over the tile's decoded first-coordinate
    arrays (tile ints, float64; extents per point). Any per-tile aggregate
    of point coordinates — count, in-tile check, bbox, cell histogram —
    can ride this without paying the one-row-per-feature Arrow return
    (the decode-return scaling bottleneck, BASELINE.md §scaling).

    Coordinate semantics match decode_tiles(mode='int'): point layers via
    the bulk decoder, other features contribute their first vertex, and
    empty geometries contribute NaN (so counts include them, coordinate
    predicates exclude them — same as the unfused groupBy plan).

    INPUT CONTRACT (same as decode_tile_stats): ONE row per (z, x, y)
    tile key. The aggregate runs per input ROW, not per key — feeding a
    key split across multiple rows yields duplicate (z, x, y) output
    rows, diverging from the unfused decode+groupBy plan. Composite
    partial-union tiles first (sparkops.compositing.composite)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codec.decode import bulk_point_layer, decode_feature, parse_tile
        for pdf in batches:
            rows = []
            for z, x, y, buf in zip(pdf["z"], pdf["x"], pdf["y"],
                                    pdf["tile_pbf"]):
                if buf is None:
                    continue
                z, x, y = int(z), int(x), int(y)
                xs_parts, ys_parts, ext_parts = [], [], []
                for lf in parse_tile(bytes(buf)):
                    if layers is not None and lf.name not in layers:
                        continue
                    bulk = bulk_point_layer(lf)
                    if bulk is not None:
                        # coords only: the dictionary-uniformity checks of
                        # the props decoders don't apply here
                        px, py = bulk[3], bulk[4]
                        xs_parts.append(np.asarray(px, dtype=np.float64))
                        ys_parts.append(np.asarray(py, dtype=np.float64))
                        ext_parts.append(np.full(len(px), lf.extent,
                                                 dtype=np.float64))
                        continue
                    for span in lf.feature_spans:
                        f = decode_feature(lf, span, mode="int")
                        if f is None:
                            continue
                        if len(f.xs):
                            xs_parts.append(np.asarray(f.xs[:1], np.float64))
                            ys_parts.append(np.asarray(f.ys[:1], np.float64))
                        else:
                            xs_parts.append(np.array([np.nan]))
                            ys_parts.append(np.array([np.nan]))
                        ext_parts.append(np.array([lf.extent], np.float64))
                if not xs_parts:
                    continue
                rows.append((z, x, y, *agg_fn(
                    z, x, y, np.concatenate(xs_parts),
                    np.concatenate(ys_parts), np.concatenate(ext_parts))))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["z", "x", "y"] +
                    [c.strip().split()[0] for c in agg_schema.split(",")])

    return tiles.mapInPandas(run, f"z int, x bigint, y bigint, {agg_schema}")


def encode_geobuf_tiles(entities: DataFrame,
                        prop_cols: tuple[str, ...] = ("url", "mention_idx"),
                        id_col: str = "doc_id",
                        n_partitions: int | None = None) -> DataFrame:
    """(z, x, y, lng, lat, id, props...) -> one geobuf feature STREAM per
    tile — the alternate-source codec (murphy214/geobuf; the reference's
    WriteLayerGeobuf input, write_layer.go:218-267).

    Same single-shuffle plan as encode_point_tiles; the geobuf feature
    framing itself is a small per-feature kernel inside the Arrow batch
    (compat ingestion codec, not the bulk hot path)."""
    from ..codec.geobuf import encode_geobuf_feature
    from ..codec.wire import encode_varint

    cols = ["z", "x", "y", "lng", "lat", id_col, *prop_cols]
    df = entities.select(*cols)
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    df = (df.repartition(n_partitions, "z", "x", "y")
          .sortWithinPartitions("z", "x", "y", id_col, *prop_cols))

    def emit(pdf: pd.DataFrame, starts, ends) -> pd.DataFrame:
        zs, xs, ys = (pdf[c].to_numpy() for c in ("z", "x", "y"))
        lng, lat = pdf["lng"].to_numpy(), pdf["lat"].to_numpy()
        ids = pdf[id_col].to_numpy()
        pvals = {c: pdf[c].astype(str).to_numpy() for c in prop_cols}
        out = []
        for s, e in zip(starts, ends):
            blob = bytearray()
            for i in range(s, e):
                m = encode_geobuf_feature(
                    "Point", [float(lng[i]), float(lat[i])],
                    {c: pvals[c][i] for c in prop_cols}, int(ids[i]))
                blob += encode_varint(len(m)) + m
            out.append((int(zs[s]), int(xs[s]), int(ys[s]),
                        bytes(blob), e - s))
        return pd.DataFrame(out, columns=["z", "x", "y", "geobuf",
                                          "n_features"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _stream_sorted_tile_groups(batches, emit)

    return df.mapInPandas(
        run, "z int, x bigint, y bigint, geobuf binary, n_features int")


def transcode_geobuf_tiles(gb_tiles: DataFrame,
                           layer_name: str = "geo") -> DataFrame:
    """Per-tile geobuf stream -> serialized MVT layer (WriteLayerGeobuf,
    write_layer.go:218-267). Embarrassingly parallel per tile row; output is
    byte-identical to the direct encode path of the quantized features."""
    from ..codec.geobuf import transcode_geobuf_layer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, x, y, blob, nf in zip(pdf["z"], pdf["x"], pdf["y"],
                                         pdf["geobuf"], pdf["n_features"]):
                buf = transcode_geobuf_layer(bytes(blob), int(z), int(x),
                                             int(y), layer_name)
                rows.append((int(z), int(x), int(y), layer_name, buf, int(nf)))
            yield pd.DataFrame(rows, columns=["z", "x", "y", "layer",
                                              "tile_pbf", "n_features"])

    return gb_tiles.mapInPandas(run, TILE_SCHEMA)


_BULK_GEOM_TYPES = ("MultiPoint", "LineString", "MultiLineString",
                    "Polygon", "MultiPolygon")


def _stream_sorted_tile_groups(batches, emit, group_cols=("z", "x", "y")):
    """Shared sorted-batch carry protocol for pandas tile-group streams:
    concat the carried tail, find group boundaries, hand emit() ONLY the
    rows of complete groups (trimmed to the last boundary), carry the
    final (possibly incomplete) group into the next batch. Factored out
    of the geobuf and geometry encoders so the trim invariant — emit's
    input is EXACTLY covered by its slices — cannot diverge between
    copies again (round-5 review)."""
    pending = None
    for pdf in batches:
        if pending is not None:
            pdf = pd.concat([pending, pdf], ignore_index=True)
            pending = None
        if not len(pdf):
            continue
        change = np.zeros(len(pdf) - 1, dtype=bool)
        for c in group_cols:
            v = pdf[c].to_numpy()
            change |= v[1:] != v[:-1]
        boundaries = np.flatnonzero(change) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(pdf)]])
        if len(starts) > 1:
            yield emit(pdf.iloc[:int(ends[-2])], starts[:-1], ends[:-1])
        pending = pdf.iloc[starts[-1]:]
    if pending is not None and len(pending):
        yield emit(pending.reset_index(drop=True),
                   np.array([0]), np.array([len(pending)]))


def _is_4level(coords) -> bool:
    # [poly][ring][pt][xy] vs [ring][pt][xy]: probe the FIRST NON-EMPTY
    # leaf chain (an empty first polygon/ring must not misroute the row,
    # ADVICE-style review r5) — a coordinate scalar has no __len__, a
    # [x, y] pair does
    for a in coords:
        if not hasattr(a, "__len__"):
            return False
        for b in a:
            if not hasattr(b, "__len__"):
                return False
            for c in b:
                return hasattr(c, "__len__")
    return False


def encode_geom_tiles(features: DataFrame, geom_type: str,
                      layer_name: str = "features", extent: int = 4096,
                      extent_clamp: bool = False,
                      n_partitions: int | None = None) -> DataFrame:
    """Bulk non-point encode (VERDICT r4 task #1): same plan shape as
    encode_point_tiles — ONE repartition on the tile key +
    sortWithinPartitions + a streaming mapInPandas whose kernel
    (encode_geom_tiles_bulk) vectorizes projection/winding/delta/varint
    across every tile in the Arrow batch. Byte-identical to the scalar
    encode_geojson_tiles path (same encode_layer bytes, pinned by
    tests/test_encode_fast.py); rows whose props break the bulk contract
    (non-uniform key sets, non-string values) fall back to the scalar
    encoder per tile group inside the UDF.

    This gives polygon-heavy workloads (building footprints, parcels —
    billions of rows) the same cost model as the point firehose instead of
    per-feature Python Cursor builders (reference equivalent:
    write_geometry.go:108-378, one cost model for every type)."""
    from ..codec.encode import encode_layer
    from ..codec.encode_fast import encode_geom_tiles_bulk, flatten_geom_rows

    df = features.select("z", "x", "y", "feature_id", "coords", "props")
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism * 2
    df = (df.repartition(n_partitions, "z", "x", "y")
          .sortWithinPartitions("z", "x", "y", "feature_id"))

    def normalize(coords):
        # STRUCTURAL reshape only (same shape mapping as the scalar
        # encode_group; MultiPolygon also accepts 4-level polygons with
        # holes) — no per-vertex float() casts: both flatten_geom_rows
        # (np.asarray per ring) and encode_layer's builders coerce
        # element types themselves, so element-wise Python conversion
        # here would reintroduce the O(vertices) interpreter cost the
        # bulk kernel exists to remove
        if geom_type in ("LineString", "MultiPoint"):
            return coords[0]
        if geom_type == "MultiPolygon" and not _is_4level(coords):
            return [[ring] for ring in coords]
        return coords

    def scalar_tile(zs, xs, ys, fids, rows, props, s, e):
        feats = [{"type": geom_type, "coordinates": rows[i],
                  "properties": props[i], "id": int(fids[i])}
                 for i in range(s, e)]
        buf = encode_layer(feats, int(zs[s]), int(xs[s]), int(ys[s]),
                           layer_name, extent=extent,
                           extent_clamp=extent_clamp)
        return (int(zs[s]), int(xs[s]), int(ys[s]), layer_name, buf, e - s)

    def emit(pdf: pd.DataFrame, starts, ends) -> pd.DataFrame:
        zs = pdf["z"].to_numpy()
        xs = pdf["x"].to_numpy()
        ys = pdf["y"].to_numpy()
        fids = pdf["feature_id"].to_numpy()
        rows = [normalize(c) for c in pdf["coords"]]
        props = [dict(p) if p is not None else {} for p in pdf["props"]]
        keys0 = sorted(props[0]) if props else []
        uniform = all(sorted(p) == keys0 for p in props) and all(
            isinstance(v, str) for p in props for v in p.values())
        out = []
        if uniform:
            prop_cols = {k: np.array([p[k] for p in props], dtype=object)
                         for k in keys0}
            verts, ring_lens, ring_feat, firsts = \
                flatten_geom_rows(geom_type, rows)
            bufs, _ = encode_geom_tiles_bulk(
                zs, xs, ys, fids.astype(np.int64), prop_cols,
                starts, ends, layer_name, geom_type, verts, ring_lens,
                ring_feat, firsts, extent=extent, clamp=extent_clamp)
            for t, (s, e) in enumerate(zip(starts, ends)):
                out.append((int(zs[s]), int(xs[s]), int(ys[s]), layer_name,
                            bufs[t], int(e - s)))
        else:
            for s, e in zip(starts, ends):
                out.append(scalar_tile(zs, xs, ys, fids, rows, props, s, e))
        return pd.DataFrame(out, columns=["z", "x", "y", "layer",
                                          "tile_pbf", "n_features"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return _stream_sorted_tile_groups(batches, emit)

    return df.mapInPandas(run, TILE_SCHEMA)


def encode_geojson_tiles(features: DataFrame, geom_type: str,
                         layer_name: str = "features",
                         extent: int = 4096,
                         extent_clamp: bool = False) -> DataFrame:
    """Generic-geometry encode: rows of (z, x, y, feature_id, coords, props)
    -> one MVT layer per tile via the full LayerEncoder (WriteLayer,
    write_layer.go:127-175), covering LineString/Polygon/Multi* command
    streams, winding enforcement and ring closure — the paths the bulk
    point encoder skips.

    ``coords`` is ``array<array<array<double>>>`` (Polygon rings / an array
    of lines); for LineString the single line is ``coords[0]``. MultiPolygon
    also accepts 4-level ``array<array<array<array<double>>>>`` —
    [polygon][ring][pt][xy], holes included — detected per row. Geometry
    tables are dimension-sized relative to the point firehose (polygons per
    admin area vs points per document), so a grouped ``applyInPandas`` with
    per-feature Python is the right cost model here; the web-scale fact
    path stays on ``encode_point_tiles``."""
    import json
    import os

    from pyspark.sql.types import MapType, StringType

    from ..codec.encode import encode_layer

    # bulk fast path: line/polygon geometry with map<string,string> props
    # rides the cross-tile vectorized kernel (byte-identical output);
    # JSON-string/typed props and point shapes stay on the scalar path
    ptype = features.schema["props"].dataType
    if (geom_type in _BULK_GEOM_TYPES
            and os.environ.get("SPARK_GRAFT_BULK_GEOM", "1") != "0"
            and isinstance(ptype, MapType)
            and isinstance(ptype.keyType, StringType)
            and isinstance(ptype.valueType, StringType)):
        return encode_geom_tiles(features, geom_type, layer_name, extent,
                                 extent_clamp)

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("feature_id")
        z, x, y = int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
        feats = []
        for fid, coords, props in zip(pdf["feature_id"], pdf["coords"],
                                      pdf["props"]):
            if geom_type == "MultiPolygon" and _is_4level(coords):
                # 4-level input (array<array<array<array<double>>>>):
                # polygons WITH interior rings pass straight through to
                # make_multipolygon (encode.py:190), which already winds
                # exteriors/holes correctly — closes VERDICT r4 missing #2.
                c = [[[list(map(float, p)) for p in ring] for ring in poly]
                     for poly in coords]
            else:
                c = [[list(map(float, p)) for p in ring] for ring in coords]
                if geom_type == "LineString":
                    c = c[0]
                elif geom_type == "MultiPoint":
                    c = c[0]
                elif geom_type == "Point":
                    c = c[0][0]
                elif geom_type == "MultiPolygon":
                    # 3-level back-compat mapping: one ring per polygon
                    c = [[ring] for ring in c]
            if isinstance(props, str):
                # JSON-typed properties: str/int/float/bool survive as the
                # MVT Value variant types (codec/values.py write_value)
                props = json.loads(props)
            feats.append({"type": geom_type, "coordinates": c,
                          "properties": dict(props) if props is not None else {},
                          "id": int(fid)})
        buf = encode_layer(feats, z, x, y, layer_name, extent=extent,
                           extent_clamp=extent_clamp)
        return pd.DataFrame([(z, x, y, layer_name, buf, len(feats))],
                            columns=["z", "x", "y", "layer", "tile_pbf",
                                     "n_features"])

    return (features.select("z", "x", "y", "feature_id", "coords", "props")
            .groupBy("z", "x", "y")
            .applyInPandas(encode_group, TILE_SCHEMA))


def decode_tile_vertices(tiles: DataFrame, scale_dim: float | None = None) -> DataFrame:
    """Full-geometry decode to exploded vertex rows in tile-local integer
    coords — the LoadGeometry int path (read_feature_lazy.go:162-291).

    With ``scale_dim`` also emits coords scaled by 1/dim with
    round-half-away-from-zero — ConvertGeometry / LoadGeometryScaled
    (read_feature_lazy.go:342-396, ``pbf.Round(x/dim, .5, 0)``)."""
    from ..codec.decode import decode_tile

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Per-FEATURE scalar metadata + per-feature vertex arrays; the
            # per-vertex expansion happens once at the end with np.repeat —
            # no per-vertex Python (the bulk treatment the point decoder got,
            # see VERDICT r2 next-round #1).
            meta_z, meta_x, meta_y = [], [], []
            meta_layer, meta_fid, meta_gt = [], [], []
            counts = []            # vertices per feature
            rings_per_feat = []    # rings per feature
            all_ring_lens = []     # flat: vertices per ring, across features
            xs_parts, ys_parts = [], []
            for z, x, y, buf in zip(pdf["z"], pdf["x"], pdf["y"],
                                    pdf["tile_pbf"]):
                if buf is None:
                    continue
                for lname, f in decode_tile(bytes(buf), int(z), int(x),
                                            int(y), mode="int"):
                    n = sum(f.ring_lens)
                    if n == 0:
                        continue
                    meta_z.append(int(z)); meta_x.append(int(x))
                    meta_y.append(int(y)); meta_layer.append(lname)
                    meta_fid.append(f.feature_id)
                    meta_gt.append(f.geojson_type)
                    counts.append(n)
                    rings_per_feat.append(len(f.ring_lens))
                    all_ring_lens.extend(f.ring_lens)
                    xs_parts.append(f.xs)
                    ys_parts.append(f.ys)
            if counts:
                cnt = np.asarray(counts, dtype=np.int64)
                # ring_idx / pt_idx computed ONCE at batch level:
                # ring index within its feature, repeated per vertex …
                lens = np.asarray(all_ring_lens, dtype=np.int64)
                rpf = np.asarray(rings_per_feat, dtype=np.int64)
                ring_off = np.repeat(np.cumsum(rpf) - rpf, rpf)
                ring_in_feat = np.arange(len(lens), dtype=np.int64) - ring_off
                ring_idx = np.repeat(ring_in_feat.astype(np.int32), lens)
                # … and vertex index within its ring.
                vert_off = np.repeat(np.cumsum(lens) - lens, lens)
                pt_idx = (np.arange(int(lens.sum()), dtype=np.int64)
                          - vert_off).astype(np.int32)
                out = pd.DataFrame({
                    "z": np.repeat(np.asarray(meta_z, np.int32), cnt),
                    "x": np.repeat(np.asarray(meta_x, np.int64), cnt),
                    "y": np.repeat(np.asarray(meta_y, np.int64), cnt),
                    "layer": np.repeat(np.asarray(meta_layer, object), cnt),
                    # feature_id may be None (id field absent in the wire);
                    # object-repeat + nullable Int64 keeps bigint-with-null.
                    "feature_id": pd.array(
                        np.repeat(np.asarray(meta_fid, object), cnt),
                        dtype="Int64"),
                    "geojson_type": np.repeat(np.asarray(meta_gt, object), cnt),
                    "ring_idx": ring_idx,
                    "pt_idx": pt_idx,
                    "ix": np.concatenate(xs_parts).astype(np.int64),
                    "iy": np.concatenate(ys_parts).astype(np.int64),
                })
            else:
                out = pd.DataFrame({
                    "z": np.array([], np.int32), "x": np.array([], np.int64),
                    "y": np.array([], np.int64),
                    "layer": np.array([], object),
                    "feature_id": np.array([], np.int64),
                    "geojson_type": np.array([], object),
                    "ring_idx": np.array([], np.int32),
                    "pt_idx": np.array([], np.int32),
                    "ix": np.array([], np.int64),
                    "iy": np.array([], np.int64),
                })
            if scale_dim is not None:
                for src, dst in (("ix", "sx"), ("iy", "sy")):
                    v = out[src].to_numpy(np.float64) / float(scale_dim)
                    out[dst] = (np.sign(v) *
                                np.floor(np.abs(v) + 0.5)).astype(np.int64)
            yield out

    schema = ("z int, x bigint, y bigint, layer string, feature_id bigint, "
              "geojson_type string, ring_idx int, pt_idx int, "
              "ix bigint, iy bigint")
    if scale_dim is not None:
        schema += ", sx bigint, sy bigint"
    return tiles.mapInPandas(run, schema)


def decode_tile_props_typed(tiles: DataFrame,
                            prop_schema: dict[str, str]) -> DataFrame:
    """Decode features to flat TYPED property columns — the 7-type MVT
    Value variant (write_primitives.go:202-243 / read_layer.go:97-114)
    surviving the distributed round trip with python-native types.

    ``prop_schema``: {prop_name: spark_type} e.g. {"nk": "bigint",
    "frac": "double", "flag": "boolean", "name": "string"}. Adds a
    ``ptypes`` column with the decoded python type names (sorted by prop)
    so tests/oracles can assert type preservation, not just values."""
    from ..codec.decode import decode_feature, parse_tile

    names = sorted(prop_schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {"feature_id": [], "ptypes": []}
            for c in names:
                cols[c] = []
            for buf in pdf["tile_pbf"]:
                if buf is None:
                    continue
                for lf in parse_tile(bytes(buf)):
                    for span in lf.feature_spans:
                        f = decode_feature(lf, span, mode="props")
                        if f is None:
                            continue
                        cols["feature_id"].append(f.feature_id)
                        tags = []
                        for c in names:
                            v = f.properties.get(c)
                            cols[c].append(v)
                            tags.append(type(v).__name__)
                        cols["ptypes"].append(",".join(tags))
            yield pd.DataFrame(cols)

    schema = "feature_id bigint, ptypes string, " + ", ".join(
        f"{c} {prop_schema[c]}" for c in names)
    return tiles.mapInPandas(run, schema)


def tile_stats(tiles: DataFrame) -> DataFrame:
    """Header-only scan: layer names + feature counts without decoding
    features — the NewTile lazy-catalog path (read_tile.go:20-44)."""
    from ..codec.decode import parse_tile

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for z, x, y, buf in zip(pdf["z"], pdf["x"], pdf["y"], pdf["tile_pbf"]):
                for lf in parse_tile(bytes(buf)):
                    rows.append((int(z), int(x), int(y), lf.name,
                                 len(lf.feature_spans), lf.extent, lf.version,
                                 len(lf.keys), len(lf.values)))
            yield pd.DataFrame(rows, columns=["z", "x", "y", "layer",
                                              "n_features", "extent", "version",
                                              "n_keys", "n_values"])

    return tiles.mapInPandas(
        stats, "z int, x bigint, y bigint, layer string, n_features int, "
               "extent int, version int, n_keys int, n_values int")
