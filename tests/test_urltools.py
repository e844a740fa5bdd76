"""URL canonicalization (functions/urltools): explicit edge cases,
and the DuckDB rendering must produce identical bytes (q68's oracle
path)."""

import pytest

from pyspark.sql import functions as F

from pii_extract_base_spark.functions.urltools import (
    canonicalize_url, canonicalize_url_sql)

CASES = [
    # (raw, canonical)
    ("https://Example.COM/Path", "https://example.com/Path"),
    ("HTTP://HOST:80/a", "http://host/a"),
    ("https://host:443/a", "https://host/a"),
    ("https://host:8443/a", "https://host:8443/a"),   # non-default kept
    ("http://host:443/a", "http://host:443/a"),       # wrong-scheme port kept
    ("https://h/a/b/", "https://h/a/b"),
    ("https://h///", "https://h"),
    ("https://h/p#frag", "https://h/p"),
    ("https://h/p?utm_source=x", "https://h/p"),
    ("https://h/p?a=1&utm_medium=m&b=2", "https://h/p?a=1&b=2"),
    ("https://h/p?utm_campaign=c&a=1", "https://h/p?a=1"),
    ("https://h/p?gclid=g&fbclid=f&msclkid=m&mc_eid=e&ref=r",
     "https://h/p"),
    # param case/order preserved for non-tracking params
    ("https://h/p?B=2&A=1", "https://h/p?B=2&A=1"),
    # utm in a VALUE survives (only &utm_*=... pairs are dropped)
    ("https://h/p?q=utm_source", "https://h/p?q=utm_source"),
    ("https://h/p?", "https://h/p"),
    # non-absolute inputs pass through unchanged
    ("/relative/path?utm_source=x", "/relative/path?utm_source=x"),
    ("mailto:a@b", "mailto:a@b"),
    ("", ""),
]


def test_canonicalize_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, u string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonicalize_url(F.col("u")).alias("c"))
             .collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_sql_rendering_parity(spark):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    sql = canonicalize_url_sql("u")
    for raw, want in CASES:
        got = con.execute(f"SELECT {sql} FROM (SELECT ? AS u)",
                          [raw]).fetchone()[0]
        assert got == want, (raw, got, want)


def test_plan_is_native(spark):
    df = spark.createDataFrame([("https://x/y",)], "u string")
    plan = (df.select(canonicalize_url(F.col("u")))
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
