#!/usr/bin/env python
"""Reproduce the grading driver's correctness check locally: run each
__spark_entry__.queries() entry and its oracle_sql() twin (DuckDB) at
SF_DIR (default sf0.01), compare row count, schema (sorted column names)
and a value hash over sorted rows/columns. Usage:

    python tools/check_contract.py [query ...]    # default: all
"""
from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        tuple(repr(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in canon:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def norm(v):
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    only = set(sys.argv[1:])
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(norm(v) for v in r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark err {type(e).__name__}: {e}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak {name}: no oracle, spark rows={len(srows)}")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb err {type(e).__name__}: {e}")
            failures += 1
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = (value_hash(scols, srows) == value_hash(ocols, orows)
                   if schema_ok else False)
        status = "ok  " if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{status} {name}: rows {len(srows)}/{len(orows)} "
              f"schema={schema_ok} hash={hash_ok}")
        if status == "FAIL" and schema_ok and rows_ok:
            sset = set(map(tuple, srows))
            oset = set(map(tuple, orows))
            for d in list(sset - oset)[:3]:
                print("   spark-only:", d)
            for d in list(oset - sset)[:3]:
                print("   oracle-only:", d)
        elif status == "FAIL":
            print("   spark cols:", scols)
            print("   oracle cols:", ocols)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
