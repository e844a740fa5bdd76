"""Local replica of the driver's correctness gate: run each queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01, compare row
count + order-insensitive value hash (columns sorted by name)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_DIR}/{t}.parquet'")
    return con


SQL_QUERIES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    sh = _value_hash(srows, scols)
    dh = _value_hash(drows, dcols)
    if sh != dh:
        # debugging aid: find first differing canonical row
        so = sorted(tuple(_norm_cell(r[i]) for i in
                          sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows)
        do = sorted(tuple(_norm_cell(r[i]) for i in
                          sorted(range(len(dcols)), key=lambda i: dcols[i]))
                    for r in drows)
        diffs = [(a, b) for a, b in zip(so, do) if a != b][:3]
        pytest.fail(f"{name}: value hash mismatch; first diffs: {diffs}")


ROWS_ONLY = [n for n in entry_mod.queries() if n not in SQL_QUERIES]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
