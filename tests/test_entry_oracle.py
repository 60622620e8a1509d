"""Driver-contract simulation: run every queries() entry at sf0.01 and
compare against oracle_sql() via DuckDB exactly like the driver does
(row count + schema + order-insensitive values, columns sorted by name)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


ORACLES = sorted(entry_mod.oracle_sql().keys())
ALL = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    ores = ddb.execute(entry_mod.oracle_sql()[name]).fetchall()
    ocols = [d[0] for d in ddb.description]
    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(ores), f"{name}: row count {len(srows)} vs {len(ores)}"
    sn, on = _norm(srows, scols), _norm(ores, ocols)
    mismatches = [i for i, (a, b) in enumerate(zip(sn, on)) if a != b]
    assert not mismatches, f"{name}: first mismatch {sn[mismatches[0]]} vs {on[mismatches[0]]}"


@pytest.mark.parametrize("name", [n for n in ALL if n not in ORACLES])
def test_rows_only_queries_run(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["url_a", "url_b", "est_sim", "jaccard", "is_dup"]
