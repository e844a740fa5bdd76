"""Deterministic, engine-replayable sketches (operators/sketch):
KMV distinct estimate + histogram quantiles — the portable stand-ins
for HLL / approx_percentile whose internal state never crosses
engines (round-3 ADVICE item for q28)."""

import duckdb


def test_kmv_estimate_accuracy_and_determinism(spark):
    from pii_extract_base_spark.operators.sketch import kmv_distinct
    n = 5000
    df = spark.range(n).selectExpr("concat('v', id % 2000) AS v")
    est = kmv_distinct(df, "v", k=256).collect()[0]["approx_distinct"]
    assert abs(est - 2000) / 2000 < 0.15          # ~1/sqrt(254) ≈ 6%
    est2 = (kmv_distinct(df.repartition(13), "v", k=256)
            .collect()[0]["approx_distinct"])
    assert est2 == est                            # partitioning-free


def test_kmv_small_domain_is_exact(spark):
    from pii_extract_base_spark.operators.sketch import kmv_distinct
    df = spark.range(1000).selectExpr("concat('x', id % 37) AS v")
    est = kmv_distinct(df, "v", k=256).collect()[0]["approx_distinct"]
    assert est == 37.0                            # m < k → true count


def test_kmv_prefilter_does_not_change_result(spark):
    from pii_extract_base_spark.operators.sketch import kmv_distinct
    df = spark.range(20000).selectExpr("concat('v', id) AS v")
    full = kmv_distinct(df, "v", k=128).collect()[0][0]
    filt = kmv_distinct(df, "v", k=128,
                        prefilter=0.05).collect()[0][0]
    tiny = spark.range(40).selectExpr("concat('v', id) AS v")
    fallback = kmv_distinct(tiny, "v", k=128,
                            prefilter=1e-6).collect()[0][0]
    assert filt == full
    assert fallback == 40.0                       # fallback path exact


def test_histogram_quantiles_track_exact(spark):
    from pii_extract_base_spark.operators.sketch import (
        histogram_quantiles)
    df = spark.range(10000).selectExpr(
        "cast(pmod(id * 131, 9973) as double) AS x")
    row = histogram_quantiles(df, "x", (0.5, 0.95, 0.99)).collect()[0]
    exact = df.selectExpr(
        "percentile(x, 0.5) p50", "percentile(x, 0.95) p95",
        "percentile(x, 0.99) p99").collect()[0]
    span = 9973.0
    assert abs(row["p5"] - exact["p50"]) < span / 1000
    assert abs(row["p95"] - exact["p95"]) < span / 1000
    assert abs(row["p99"] - exact["p99"]) < span / 1000


def test_sketch_sql_twins_match_spark(spark):
    """The DuckDB renderings replay the Spark values bit-for-bit on a
    shared dataset (the q28 oracle contract, isolated)."""
    from pii_extract_base_spark.operators.sketch import (
        histogram_quantiles, histogram_quantiles_sql, kmv_distinct,
        kmv_distinct_sql)
    rows = [(f"t{i % 701}", float((i * 17) % 997)) for i in range(3000)]
    df = spark.createDataFrame(rows, "t string, x double")
    s_kmv = kmv_distinct(df, "t", k=64).collect()[0][0]
    s_hq = histogram_quantiles(df, "x", (0.5, 0.9)).collect()[0]

    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ",".join(f"('{t}', {x!r})" for t, x in rows)
                + ") AS v(t, x)")
    d_kmv = con.execute(
        f"SELECT {kmv_distinct_sql('t', 'd', 64)}").fetchone()[0]
    d_hq = con.execute(
        f"SELECT hq.* FROM "
        f"{histogram_quantiles_sql('x', 'd', (0.5, 0.9))} AS hq"
    ).fetchone()
    assert d_kmv == s_kmv
    assert (d_hq[0], d_hq[1]) == (s_hq["p5"], s_hq["p9"])
