"""Local emulation of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf=0.01, compare row count, column names, and order-insensitive
values. Usage: python scripts/check_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = E.queries(), E.oracle_sql()
    only = set(sys.argv[2:])  # optional: check just these entries
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    failed = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failed.append(name)
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failed.append(name)
            continue
        eq = True
        for c in g.columns:
            a, b = g[c], w[c]
            if a.dtype.kind in "iu" and b.dtype.kind in "iu":
                # width-normalize int kinds: int32 vs int64 stringify (and
                # therefore driver-hash) identically — Series.equals alone
                # is dtype-width strict and would spurious-FAIL with an
                # empty diff sample
                a = a.astype("int64")
                b = b.astype("int64")
            # Driver hashes stringified values per-dtype: int64 11757 vs
            # float64 11757.0 is a hash MISMATCH even though allclose passes
            # (DuckDB SUM(BIGINT)→HUGEINT→float64 trap). Be dtype-strict.
            if (a.dtype.kind in "iu") != (b.dtype.kind in "iu"):
                eq = False
                print(f"     {name}.{c} dtype kind mismatch: "
                      f"{a.dtype} vs {b.dtype} (driver hash would differ)")
                continue
            if (a.dtype.kind == "f" or b.dtype.kind == "f") and not (
                a.dtype == object or b.dtype == object
            ):
                import numpy as np
                if not np.allclose(
                    a.astype(float).to_numpy(),
                    b.astype(float).to_numpy(),
                    atol=0,
                    rtol=0,
                    equal_nan=True,
                ):
                    eq = False
                    bad = (a.astype(float) != b.astype(float)).to_numpy().nonzero()[0][:3]
                    print(f"     {name}.{c} first diffs at {bad}: "
                          f"{a.iloc[bad[0]]} vs {b.iloc[bad[0]]}" if len(bad) else "")
            else:
                # object-vs-float (or any exotic pairing) lands here too:
                # compare stringified, the driver-hash notion of equality —
                # and never let a comparison error abort the whole gate
                try:
                    same = a.equals(b) or a.astype(str).equals(b.astype(str))
                except Exception as ce:
                    same = False
                    print(f"     {name}.{c} compare error: {ce}")
                if not same:
                    eq = False
                    try:
                        neq = a.astype(str) != b.astype(str)
                        i = neq[neq].index[:1]
                        print(f"     {name}.{c} diff e.g. idx {list(i)}: "
                              f"{a.loc[i].tolist()} vs {b.loc[i].tolist()}")
                    except Exception:
                        print(f"     {name}.{c} dtypes {a.dtype} vs {b.dtype}")
        if eq:
            print(f"ok   {name}: rows={len(g)} exact match [{time.time()-t0:.1f}s]")
        else:
            print(f"FAIL {name}: value mismatch")
            failed.append(name)

    print()
    print("ALL OK" if not failed else f"FAILED: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
