"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry on Spark AND its ``oracle_sql()``
on DuckDB over the same sf dir, then compare row count + column names +
order-insensitive value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entry
from json_validator_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    import math

    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}".rstrip("0").rstrip(".") or "0"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.6f}".rstrip("0").rstrip(".") or "0"
    except Exception:
        pass
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"[SPARK-ERR] {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_rows)} rows")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"[DUCK-ERR]  {name}: {type(e).__name__}: {str(e)[:300]}")
            continue
        sc, sr = canon(s_cols, s_rows)
        dc, dr = canon(d_cols, d_rows)
        if sc != dc:
            failures.append(name)
            print(f"[COLS]  {name}: spark={sc} duck={dc}")
            continue
        if len(sr) != len(dr):
            failures.append(name)
            print(f"[COUNT] {name}: spark={len(sr)} duck={len(dr)}")
            so, do = set(sr), set(dr)
            for x in list(so - do)[:3]:
                print("   spark-only:", x)
            for x in list(do - so)[:3]:
                print("   duck-only: ", x)
            continue
        if sr != dr:
            failures.append(name)
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
            print(f"[VALUES] {name}: {len(diffs)} differing rows of {len(sr)}")
            for i in diffs[:3]:
                print("   spark:", sr[i])
                print("   duck: ", dr[i])
            continue
        print(f"[OK]    {name}: {len(sr)} rows")
    print(f"\n{'FAIL: ' + ', '.join(failures) if failures else 'ALL MATCH'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
