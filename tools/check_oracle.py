"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin side-by-side,
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, values stringified with float rounding). Run:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision: %.6g masked cent-level diffs at ~150k magnitude
        # (hid the q16 ulp failure for two rounds)
        return repr(v)
    if isinstance(v, (datetime.datetime,)):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    from sea_serpent_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = list(res.columns)
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_n = len(srows) == len(drows)
        ok_c = sorted(scols) == sorted(dcols)
        ok_h = ok_n and ok_c and table_hash(scols, srows) == table_hash(dcols, drows)
        status = "ok   " if (ok_n and ok_c and ok_h) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(
            f"{status}{name}: rows {len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_c else f'{scols} vs {dcols}'} "
            f"hash={'ok' if ok_h else 'MISMATCH'} ({time.time()-t0:.1f}s)"
        )
        if not ok_h and ok_n and ok_c and len(srows) <= 2000:
            o = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = {"|".join(norm_cell(r[i]) for i in o) for r in srows}
            d_o = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = {"|".join(norm_cell(r[i]) for i in d_o) for r in drows}
            diff1 = list(sset - dset)[:3]
            diff2 = list(dset - sset)[:3]
            for d in diff1:
                print(f"      spark-only: {d}")
            for d in diff2:
                print(f"      duck-only:  {d}")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
