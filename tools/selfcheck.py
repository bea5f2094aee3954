"""Self-check harness: runs every queries() entry on Spark and its
oracle_sql() twin on DuckDB at a given sf dir, compares row counts and an
order-insensitive value hash (mimics the driver's CORRECTNESS gate).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    """STRICT cell rendering — mimics the driver's value hash.

    Round 1 lesson: the driver does NOT normalize Decimals, so DECIMAL
    outputs (Spark decimal(38,x) vs DuckDB decimal/HUGEINT) hash-mismatch
    even when numerically equal. str(Decimal) here is deliberately
    unnormalized so any final projection still emitting DECIMAL fails
    locally before it fails the driver gate.
    """
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def fragile_type_warnings(rows, colnames, engine):
    """Flag output cell types whose cross-engine rendering is not stable:
    Decimal (scale differs by engine) and out-of-int64 ints (DuckDB HUGEINT).
    """
    import decimal

    warns = set()
    for r in rows[:100]:
        for i, v in enumerate(r):
            if isinstance(v, decimal.Decimal):
                warns.add(f"{engine}:{colnames[i]}=Decimal")
            elif isinstance(v, int) and not isinstance(v, bool) and abs(v) >= 2**63:
                warns.add(f"{engine}:{colnames[i]}=int128")
    return warns


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pyelt_spark.session import get_session

    spark = get_session("selfcheck", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in os_:
            print(f"OK?   {name}: rows={len(srows)} (no oracle; rows-only check)")
            continue
        try:
            cur = con.execute(os_[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        sh = value_hash([tuple(r) for r in srows], scols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        warns = fragile_type_warnings(
            [tuple(r) for r in srows], scols, "spark"
        ) | fragile_type_warnings(drows, dcols, "duck")
        if warns:
            print(f"WARN  {name}: fragile output types: {sorted(warns)}")
        status = "OK  " if (ok_count and ok_schema and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status}  {name}: rows {len(srows)}/{len(drows)} "
            f"schema={'=' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'=' if ok_hash else 'MISMATCH'}"
        )
        if not ok_hash and ok_count and ok_schema:
            # show a few differing rows for debugging
            sset = {
                "\x1f".join(norm_cell(v) for v in r) for r in
                [tuple(r[scols.index(c)] for c in sorted(scols)) for r in srows]
            }
            dset = {
                "\x1f".join(norm_cell(v) for v in r) for r in
                [tuple(r[dcols.index(c)] for c in sorted(dcols)) for r in drows]
            }
            for x in list(sset - dset)[:3]:
                print("   spark-only:", x.replace("\x1f", " | ")[:200])
            for x in list(dset - sset)[:3]:
                print("   duck-only :", x.replace("\x1f", " | ")[:200])

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
