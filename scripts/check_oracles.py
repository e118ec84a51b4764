"""Mimic the driver's correctness gate: run each queries() entry on Spark and
its oracle_sql() on DuckDB over the same parquet, compare row count, schema
(column names), and order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [name_filter]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entrymod
    from table_annotation_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in sorted(queries.items()):
        if name_filter and name_filter not in name:
            continue
        import time
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):6d} (rows-only, no oracle) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        t_duck = time.time() - t0
        ok_schema = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_hash = (
            value_hash(srows, scols) == value_hash(orows, ocols)
            if ok_schema
            else False
        )
        status = "OK" if (ok_schema and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name:28s} {status} rows={len(srows)}/{len(orows)} "
            f"schema={'=' if ok_schema else f'{scols} vs {ocols}'} "
            f"hash={'=' if ok_hash else 'DIFF'} [spark {t_spark:.1f}s, duck {t_duck:.1f}s]"
        )
        if status == "FAIL" and ok_schema:
            sset = {tuple(map(norm_cell, r)) for r in srows}
            oset = {tuple(map(norm_cell, r)) for r in orows}
            print("   only-spark:", list(sset - oset)[:3])
            print("   only-duck: ", list(oset - sset)[:3])
    print("failures:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
