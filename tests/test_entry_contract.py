"""Local replica of the driver's correctness gate: run each queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01, compare row
count + order-insensitive value hash (columns sorted by name).

The DuckDB side is fetched through pandas (`.df()`), matching the
external driver — this is load-bearing: duckdb's HUGEINT (from
sum(BIGINT)) converts to float64 under pandas but to Python int under
fetchall(), and round-1's q08/q15/q19 driver hash mismatches were
exactly that class of bug, invisible to a fetchall()-based replica."""

import math

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    # array-valued cells: duckdb's .df() yields numpy ndarrays where
    # Spark collects Python lists — identical contents, different
    # reprs — so canonicalize both to an elementwise form.  (Only the
    # packed-example `tokens` columns (q94/q95) are non-scalar, and
    # both sit OUTSIDE the driver's 50-query graded window, so the
    # driver's own treatment of array cells never comes into play.)
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    # unwrap numpy scalars WITHOUT erasing the int/float distinction —
    # an int64 2279 and a float64 2279.0 must hash differently, exactly
    # as they do in the driver's pandas-based canonicalizer
    if isinstance(v, np.integer):
        v = int(v)
    elif isinstance(v, np.floating):
        v = float(v)
    elif isinstance(v, np.bool_):
        v = bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        # duckdb.df() renders DATE columns as midnight Timestamps while
        # Spark collects datetime.date — fold them together
        iso = v.isoformat()
        return iso[:-9] if iso.endswith("T00:00:00") else iso
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

    ddf = ddb.execute(entry_mod.oracle_sql()[name]).df()  # pandas, as driver
    dcols = list(ddf.columns)
    drows = [tuple(r) for r in ddf.itertuples(index=False, name=None)]

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
