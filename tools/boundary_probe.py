"""Arrow python-boundary probe: measures send-heavy and return-heavy
mapInArrow throughput on one JVM, plus the host kernel-time share during
the run — the instrument for the allocator-churn hypothesis behind the
multi-JVM scaling collapse documented in BASELINE.md.

pyarrow's bundled jemalloc pool defaults to decay_ms=0: every freed IPC
buffer is madvise-purged to the OS immediately, so each Arrow batch in
every worker re-faults its pages (memcg-charged anon faults — the exact
kernel-stack signature captured in round 1). Configs probed:

  default        pyarrow as shipped (jemalloc, decay 0)
  decay          jemalloc with SPARK_GRAFT_JEMALLOC_DECAY_MS page retention
  mimalloc       ARROW_DEFAULT_MEMORY_POOL=mimalloc
  system         ARROW_DEFAULT_MEMORY_POOL=system (+ glibc thresholds)

Usage:  python tools/boundary_probe.py [config ...]   (default: all four)
Each config runs in a fresh subprocess so env vars take effect before
pyarrow/JVM start. Prints one JSON line per config.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

CONFIGS = {
    "default": {},
    "decay": {"SPARK_GRAFT_JEMALLOC_DECAY_MS": "60000"},
    "mimalloc": {"ARROW_DEFAULT_MEMORY_POOL": "mimalloc"},
    "system": {"ARROW_DEFAULT_MEMORY_POOL": "system",
               "MALLOC_MMAP_THRESHOLD_": "268435456",
               "MALLOC_TRIM_THRESHOLD_": "268435456"},
}

WORKER = r"""
import json, os, time
import numpy as np

def cpu_times():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    user, nice, sys_, idle, iowait, irq, softirq, steal = vals
    return user + nice, sys_ + irq + softirq, idle + iowait, steal

def tune_pool_worker():
    ms = os.environ.get("SPARK_GRAFT_JEMALLOC_DECAY_MS")
    if ms is None:
        return
    try:
        import pyarrow as pa
        if pa.default_memory_pool().backend_name == "jemalloc":
            pa.jemalloc_set_decay_ms(int(ms))
    except Exception:
        pass

from vector_tile_go_spark.session import get_spark
spark = get_spark("boundary_probe", cores=int(os.environ.get("PROBE_CORES", "32")))
sc = spark.sparkContext
from pyspark.sql import functions as F

N = int(os.environ.get("PROBE_ROWS", "12000000"))
EXPAND = int(os.environ.get("PROBE_EXPAND", "40"))

base = (spark.range(0, N, 1, 64)
        .select(F.col("id"),
                (F.col("id") % 4096).cast("long").alias("x"),
                ((F.col("id") / 7).cast("long") % 4096).alias("y"),
                (F.rand(7) * 360 - 180).alias("lng"),
                (F.rand(11) * 170 - 85).alias("lat"),
                F.concat(F.lit("https://example.com/doc/"),
                         F.col("id").cast("string")).alias("url")))
base = base.persist()
base.count()

def ident_send(batches):
    import pyarrow as pa
    tune_pool_worker()
    for rb in batches:
        yield pa.RecordBatch.from_arrays(
            [pa.array([rb.num_rows], type=pa.int64())], names=["n"])

def expand_return(batches):
    import pyarrow as pa
    tune_pool_worker()
    for rb in batches:
        n = rb.num_rows * EXPAND
        ids = np.repeat(rb.column(0).to_numpy(zero_copy_only=False), EXPAND)
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids, type=pa.int64()),
             pa.array(np.arange(n, dtype=np.float64)),
             pa.array(np.arange(n, dtype=np.float64) * 0.5)],
            names=["id", "lng", "lat"])

out = {"config": os.environ.get("PROBE_CONFIG", "?"),
       "cores": int(os.environ.get("PROBE_CORES", "32")), "rows": N}

def shuffle_job():
    # JVM-only: repartition + sort + hash agg, zero python involvement —
    # isolates the shuffle fabric (tmpfs spill, Unsafe sort, lz4) from the
    # Arrow boundary
    n_parts = 2 * int(os.environ.get("PROBE_CORES", "32"))
    # noop sink keeps the sort in the plan (EliminateSorts would drop a
    # sort under an aggregate) and writes nothing
    (base.repartition(n_parts, "x", "y")
         .sortWithinPartitions("x", "y", "id")
         .write.format("noop").mode("overwrite").save())

for name, fn, src, schema in [
        ("send", ident_send, base, "n long"),
        ("shuffle", None, base, None),
        ("ret", expand_return,
         base.select("id").limit(N // EXPAND).repartition(64).persist(),
         "id long, lng double, lat double")]:
    if name == "shuffle":
        shuffle_job()  # warm
        c0 = cpu_times(); t0 = time.time()
        shuffle_job()
        dt = time.time() - t0
        c1 = cpu_times()
        tot = max(1, sum(b - a for a, b in zip(c0, c1)))
        out[name] = {"sec": round(dt, 2),
                     "mrows_per_sec": round(N / dt / 1e6, 2),
                     "user_pct": round(100 * (c1[0] - c0[0]) / tot, 1),
                     "sys_pct": round(100 * (c1[1] - c0[1]) / tot, 1),
                     "steal_pct": round(100 * (c1[3] - c0[3]) / tot, 1)}
        continue
    if name == "ret":
        src.count()
    # warm pass (JIT)
    src.mapInArrow(fn, schema).selectExpr("count(*) c").collect()
    u0, s0, i0, st0 = cpu_times()
    t0 = time.time()
    src.mapInArrow(fn, schema).selectExpr("count(*) c").collect()
    dt = time.time() - t0
    u1, s1, i1, st1 = cpu_times()
    tot = max(1, (u1 - u0) + (s1 - s0) + (i1 - i0) + (st1 - st0))
    out[name] = {
        "sec": round(dt, 2),
        "mrows_per_sec": round((N if name == "send" else
                                (N // EXPAND) * EXPAND) / dt / 1e6, 2),
        "user_pct": round(100 * (u1 - u0) / tot, 1),
        "sys_pct": round(100 * (s1 - s0) / tot, 1),
        "steal_pct": round(100 * (st1 - st0) / tot, 1),
    }

print("PROBE_JSON " + json.dumps(out))
spark.stop()
"""


def run_one(name: str, cores: str, rows: str, pin: str | None,
            extra_env: dict | None = None) -> subprocess.Popen:
    env = dict(os.environ)
    env.update(CONFIGS[name])
    if extra_env:
        env.update(extra_env)
    env["PROBE_CONFIG"] = name
    env["PROBE_CORES"] = cores
    env["PROBE_ROWS"] = rows
    cmd = [sys.executable, "-c", WORKER]
    if pin is not None:
        cmd = ["taskset", "-c", pin] + cmd
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True,
                            cwd=os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__))))


def harvest(name: str, p: subprocess.Popen) -> None:
    out, err = p.communicate()
    for line in out.splitlines():
        if line.startswith("PROBE_JSON "):
            print(line[len("PROBE_JSON "):], flush=True)
            return
    print(json.dumps({"config": name, "error": err[-800:]}), flush=True)


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--fleet":
        # the multi-JVM concurrency reproducer: 4 pinned 8-core probes at
        # once, each on 1/4 the rows — fair share would match a lone
        # 8-core probe on 1/4 rows (run that with:
        #   PROBE_CORES=8 PROBE_ROWS=3000000 python tools/boundary_probe.py CFG)
        name = argv[1] if len(argv) > 1 else "default"
        rows = os.environ.get("PROBE_ROWS", "12000000")
        per = str(int(rows) // 4)
        pins = ["0-7", "8-15", "16-23", "24-31"]
        procs = [run_one(name, "8", per, pins[i],
                         {"SPARK_GRAFT_LOCAL_DIR":
                          f"/dev/shm/spark-local-fleet{i}"})
                 for i in range(4)]
        for p in procs:
            harvest(name, p)
        return
    which = argv or list(CONFIGS)
    for name in which:
        p = run_one(name, os.environ.get("PROBE_CORES", "32"),
                    os.environ.get("PROBE_ROWS", "12000000"), None)
        harvest(name, p)


if __name__ == "__main__":
    main()
