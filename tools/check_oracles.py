"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on
DuckDB at sf0.01, compare row count, column names, and sorted values.

Usage: python tools/check_oracles.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from shaman_scraping_spark.session import get_spark

    spark = get_spark("check-oracles", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        fn = qs[name]
        try:
            sdf = fn(spark, args.sf)
            spark_rows = sdf.collect()
            spark_cols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols_raw = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        duck_cols = sorted(duck_cols_raw)
        if spark_cols != duck_cols:
            print(f"FAIL  {name}: cols spark={spark_cols} duck={duck_cols}")
            failures += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(
                f"FAIL  {name}: rowcount spark={len(spark_rows)} "
                f"duck={len(duck_rows)}"
            )
            failures += 1
            continue
        sidx = [sdf.columns.index(c) for c in spark_cols]
        didx = [duck_cols_raw.index(c) for c in spark_cols]
        sset = sorted(
            tuple(norm(row[i]) for i in sidx) for row in spark_rows
        )
        dset = sorted(
            tuple(norm(row[i]) for i in didx) for row in duck_rows
        )
        if sset != dset:
            diff = [
                (a, b) for a, b in zip(sset, dset) if a != b
            ][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            failures += 1
            continue
        print(f"OK    {name}: {len(spark_rows)} rows")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
