"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs each __spark_entry__.queries() entry and its oracle_sql() twin,
compares row count, column names, and an order-insensitive value
digest. Usable as a script:  python tests/compare_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import resource
import sys

import duckdb

# Spark local mode holds many shuffle/cache file handles; give DuckDB room
_soft, _hard = resource.getrlimit(resource.RLIMIT_NOFILE)
resource.setrlimit(resource.RLIMIT_NOFILE, (_hard, _hard))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _digest(rows, cols):
    cols = sorted(cols)
    lines = sorted(
        "|".join(_norm(row[c]) for c in cols) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def compare(spark, sf_dir: str, only: list[str] | None = None) -> dict:
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    oracles = entrymod.oracle_sql()
    import time

    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = list(sdf.columns)
        spark_sec = round(time.perf_counter() - t0, 2)
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(srows), "sec": spark_sec}
            continue
        cur = con.execute(oracles[name])
        dcols = [d[0] for d in cur.description]
        drows = [dict(zip(dcols, row)) for row in cur.fetchall()]
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_vals = ok_rows and ok_cols and _digest(srows, scols) == _digest(drows, dcols)
        results[name] = {
            "status": "match" if (ok_rows and ok_cols and ok_vals) else "MISMATCH",
            "rows": (len(srows), len(drows)),
            "cols": (scols, dcols) if not ok_cols else scols,
            "values_match": ok_vals,
            "sec": spark_sec,  # Spark-side wall (the driver-budget cost)
        }
    return results


if __name__ == "__main__":
    from essentials_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark(master="local[4]", app_name="oracle-compare", shuffle_partitions=8)
    res = compare(spark, sf_dir, only)
    bad = 0
    total = 0.0
    for name, r in res.items():
        total += r.get("sec", 0.0)
        print(f"{name:28s} {r['status']:10s} rows={r['rows']} sec={r.get('sec')} cum={round(total, 1)}")
        if r["status"] == "MISMATCH":
            bad += 1
            print("   detail:", r)
    print("RESULT:", "ALL MATCH" if bad == 0 else f"{bad} MISMATCHES")
    sys.exit(1 if bad else 0)
