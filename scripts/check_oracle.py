"""Local mirror of the driver's DuckDB-oracle correctness check.

Runs every ``queries()`` entry on Spark and, when an ``oracle_sql()``
twin exists, the SQL on DuckDB over the same parquet tables; compares
row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = f"{v:.6f}"
                if v == "-0.000000":
                    v = "0.000000"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return hashlib.md5("\n".join(out).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from energy_aware_entity_resolution_spark import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) "
                  f"[{time.monotonic() - t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {e}")
            n_bad += 1
            continue
        dcols = list(ddf.columns)
        drows = ddf.to_dict("records")
        problems = []
        if sorted(cols) != sorted(dcols):
            problems.append(f"schema {sorted(cols)} vs {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} vs {len(drows)}")
        if not problems:
            hs = normalize(srows, cols)
            hd = normalize(drows, dcols)
            if hs != hd:
                problems.append("value hash mismatch")
                for a, b in list(zip(
                    sorted("|".join(f"{r[c]}" for c in sorted(cols)) for r in srows),
                    sorted("|".join(f"{r[c]}" for c in sorted(dcols)) for r in drows),
                ))[:2000]:
                    if a != b:
                        problems.append(f"  first diff:\n  spark={a}\n  duck ={b}")
                        break
        dt = time.monotonic() - t0
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems[:3])} [{dt:.1f}s]")
            n_bad += 1
        else:
            print(f"OK    {name}: {len(srows)} rows match [{dt:.1f}s]")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_rowsonly} rows-only, {n_bad} failed")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
