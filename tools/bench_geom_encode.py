"""Reproduce the round-5 bulk line/polygon encoder microbench
(BASELINE.md "Round 5: bulk non-point encoder").

Usage:  python tools/bench_geom_encode.py [ntiles] [feats_per_tile] [verts]

Compares the scalar per-tile encode_layer loop (what encode_geojson_tiles
ran before round 5) against flatten_geom_rows + encode_geom_tiles_bulk on
the same synthetic two-ring (exterior + hole) polygon workload, asserts
byte-identity, and prints per-feature/per-vertex costs. Standalone kernel
benches on this host need the malloc thresholds pinned (see CLAUDE.md);
this script sets them for its own numpy allocations where it can, but for
faithful numbers run:

  MALLOC_MMAP_THRESHOLD_=268435456 MALLOC_TRIM_THRESHOLD_=268435456 \
      python tools/bench_geom_encode.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import vector_tile_go_spark.tilemath as tm  # noqa: E402
from vector_tile_go_spark.codec.encode import encode_layer  # noqa: E402
from vector_tile_go_spark.codec.encode_fast import (  # noqa: E402
    encode_geom_tiles_bulk, flatten_geom_rows)


def main():
    ntiles = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    fpt = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    vpr = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    rng = np.random.default_rng(7)
    z = 9
    rows, props, ids, xs, ys, zs, starts, ends = [], [], [], [], [], [], [], []
    for _ in range(ntiles):
        tx, ty = int(rng.integers(0, 512)), int(rng.integers(100, 400))
        w, s, e, n = tm.tile_bounds(z, tx, ty)
        starts.append(len(rows))
        for i in range(fpt):
            cx = w + rng.random() * (e - w)
            cy = s + rng.random() * (n - s)
            ang = np.linspace(0, 2 * np.pi, vpr, endpoint=False)
            r = (e - w) * 0.03
            rows.append(
                [np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)],
                          1).tolist(),
                 np.stack([cx + .4 * r * np.cos(ang),
                           cy + .4 * r * np.sin(ang)], 1).tolist()])
            props.append({"nk": str(i % 7), "cls": "bldg"})
            ids.append(i + 1)
            xs.append(tx)
            ys.append(ty)
            zs.append(z)
        ends.append(len(rows))

    nfeat, nverts = len(rows), len(rows) * vpr * 2
    t0 = time.perf_counter()
    scalar0 = None
    for t in range(ntiles):
        feats = [{"type": "Polygon", "coordinates": rows[i],
                  "properties": props[i], "id": ids[i]}
                 for i in range(starts[t], ends[t])]
        buf = encode_layer(feats, z, xs[starts[t]], ys[starts[t]], "g",
                           extent_clamp=False)
        if t == 0:
            scalar0 = buf
    t_scalar = time.perf_counter() - t0

    pc = {k: np.array([p[k] for p in props], dtype=object)
          for k in ("cls", "nk")}
    t_bulk = None
    for _ in range(2):  # warm pass: cold page faults invert results here
        t0 = time.perf_counter()
        fl = flatten_geom_rows("Polygon", rows)
        bufs, _ = encode_geom_tiles_bulk(
            np.array(zs), np.array(xs), np.array(ys), np.array(ids), pc,
            starts, ends, "g", "Polygon", *fl)
        t_bulk = time.perf_counter() - t0
    assert bufs[0] == scalar0, "bulk diverges from scalar"
    print(f"features={nfeat} verts={nverts}")
    print(f"scalar: {t_scalar:.3f}s ({1e6 * t_scalar / nfeat:.1f} us/feat, "
          f"{1e6 * t_scalar / nverts:.2f} us/vert)")
    print(f"bulk:   {t_bulk:.3f}s ({1e6 * t_bulk / nfeat:.1f} us/feat, "
          f"{1e6 * t_bulk / nverts:.2f} us/vert)")
    print(f"speedup: {t_scalar / t_bulk:.1f}x (warm)")


if __name__ == "__main__":
    main()
