"""Driver-contract verification: every (queries()[name], oracle_sql()[name])
pair must agree — row count, column names, and values — exactly the way the
driver's DuckDB comparison does (SURVEY.md §5.2 item 8). Runs at sf0.001 for
speed; the driver runs the same contract at sf0.01."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


ALL_QUERIES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only check (driver's weaker path)
        assert len(srows) >= 0
        return
    res = duck.execute(sql).fetchall()
    dcols = [d[0] for d in duck.execute(sql).description]
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(res), \
        f"{name}: row count {len(srows)} vs oracle {len(res)}"
    sset = _rows_to_set(scols, srows)
    dset = _rows_to_set(dcols, res)
    mism = [(a, b) for a, b in zip(sset, dset) if a != b][:5]
    assert sset == dset, f"{name}: value mismatch, first diffs: {mism}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "score" in df.columns
