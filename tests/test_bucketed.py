"""Bucketed co-located joins: the pre-shuffled layout must join with
zero Exchange nodes (the 100 TB repeated-join strategy)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from pii_extract_base_spark.sources.bucketed import (
    colocated_join, drop_table, write_bucketed)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_tables(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"),
                   "t_orders_b", "okey", 8)
    write_bucketed(li.withColumnRenamed("l_orderkey", "okey"),
                   "t_lineitem_b", "okey", 8)
    yield "t_orders_b", "t_lineitem_b"
    drop_table(spark, "t_orders_b")
    drop_table(spark, "t_lineitem_b")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    joined = colocated_join(spark, t1, t2, "okey")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan[:1500]
    assert "SortMergeJoin" in plan
    # sortBy(key) at write time -> no Sort needed before the merge join
    assert "Bucketed: true" in plan

    # correctness: same result as the plain shuffle join
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    expected = orders.join(
        li, orders.o_orderkey == li.l_orderkey).count()
    assert joined.count() == expected


def test_bucketed_aggregation_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key also avoids the shuffle."""
    _, t2 = bucketed_tables
    agg = (spark.table(t2).groupBy("okey")
           .agg(F.count("*").alias("n")))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan[:1500]


def test_partitioned_layout_prunes(spark, tmp_path):
    """Hive-partitioned layout by lang: a lang filter becomes a
    PartitionFilter (pruned at planning — 100 TB corpora partition by
    lang/crawl-date so per-language jobs scan only their slice)."""
    from pii_extract_base_spark.sources.pages import synth_pages
    out = str(tmp_path / "pages_by_lang")
    synth_pages(spark, SF_DIR).limit(200).write.partitionBy(
        "lang").parquet(out)
    df = spark.read.parquet(out).where(F.col("lang") == "en")
    plan = _plan(df)
    assert "PartitionFilters: [isnotnull(lang" in plan, plan[:1200]
    # and the data filter list does NOT re-check lang (pruned, not
    # scanned-and-filtered)
    assert df.count() > 0
    langs = [r.lang for r in df.select("lang").distinct().collect()]
    assert langs == ["en"]
