"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at the given sf dir and the matching
``oracle_sql()`` on DuckDB over the same parquet files, then compares
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(df) -> str:
    """Order-insensitive hash: sort columns by name, sort rows, hash repr
    of values (floats at 12 significant digits)."""
    import pandas as pd
    pdf = df if isinstance(df, pd.DataFrame) else df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    def norm(v):
        if isinstance(v, float):
            return f"{v:.12g}"
        if isinstance(v, bytes):
            return hashlib.md5(v).hexdigest()
        return str(v)
    rows = sorted("\x01".join(norm(v) for v in row) for row in
                  pdf.itertuples(index=False, name=None))
    return hashlib.md5("\x02".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from vector_tile_go_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows={len(sdf):7d}  (rows-only, no oracle)")
            continue
        odf = con.sql(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = value_hash(sdf) == value_hash(odf) if ok_rows and ok_cols else False
        status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{name:24s} rows={len(sdf):7d}/{len(odf):7d} cols={ok_cols} "
              f"hash={ok_hash} {status}")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"   spark cols: {sorted(sdf.columns)}")
                print(f"   oracle cols: {sorted(odf.columns)}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
