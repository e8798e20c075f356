"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
over the same sf dir; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def main(sf_dir: str = "/root/testdata/sf0.01", *only: str) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        sdf = fn(spark, sf_dir).toPandas()
        timings[name] = time.perf_counter() - t0
        if name not in oracles:
            print(f"[rows-only] {name}: {len(sdf)} rows, "
                  f"cols={list(sdf.columns)}  ({timings[name]:.2f}s)")
            continue
        odf = con.sql(oracles[name]).df()
        a, b = normalize(sdf), normalize(odf)
        ok = True
        if list(a.columns) != list(b.columns):
            print(f"[FAIL cols] {name}: spark={list(a.columns)} oracle={list(b.columns)}")
            ok = False
        elif len(a) != len(b):
            print(f"[FAIL rows] {name}: spark={len(a)} oracle={len(b)}")
            ok = False
        else:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False)
            except AssertionError as e:
                print(f"[FAIL vals] {name}: {str(e)[:500]}")
                ok = False
            # the driver's hash is typed by KIND: a value-equal float64 vs
            # int64 column (e.g. DuckDB HUGEINT sums) hash-mismatches,
            # while int32 vs int64 does not (r02 evidence: rank columns)
            dt = [(c, str(a[c].dtype), str(b[c].dtype))
                  for c in a.columns if a[c].dtype.kind != b[c].dtype.kind]
            if dt:
                print(f"[WARN dtype] {name}: {dt} "
                      "(driver typed-hash will mismatch)")
                ok = False
        if ok:
            print(f"[OK]        {name}: {len(a)} rows match oracle"
                  f"  ({timings[name]:.2f}s)")
        else:
            failures += 1
    if timings:
        total = sum(timings.values())
        worst = sorted(timings.items(), key=lambda kv: -kv[1])[:8]
        print(f"[time]      spark-side total {total:.1f}s over "
              f"{len(timings)} queries; slowest: "
              + ", ".join(f"{k}={v:.1f}s" for k, v in worst))
    # smoke entry()
    if only:
        spark.stop()
        return failures
    edf = entrymod.entry(spark)
    n = edf.count()
    print(f"[entry]     {n} rows, schema={edf.schema.simpleString()}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
