"""Distributed logistic regression (operators/lr): the Spark trainer,
the pure-Python reference, and the DuckDB oracle rendering must all
walk the identical quantized weight trajectory."""

import random

import pytest

from pii_extract_base_spark.operators.lr import (
    logreg_oracle_sql, logreg_predict, logreg_python, logreg_train)


def _blobs(n=120, seed=3):
    """Two noisy 2-d blobs, linearly separable-ish."""
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        y = rng.random() < 0.5
        cx, cy = (0.7, 0.7) if y else (0.3, 0.3)
        rows.append((cx + rng.gauss(0, 0.08), cy + rng.gauss(0, 0.08),
                     1 if y else 0))
    return rows


# small_rows=0 forces the distributed GD loop; the default takes the
# adaptive driver numpy replay — the quantized weight trajectory must
# be EXACTLY identical on both (and to the pure-Python reference)
@pytest.mark.parametrize("small", [0, 10 ** 6],
                         ids=["distributed", "driver"])
def test_train_matches_python_reference(spark, small):
    rows = _blobs()
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    w_spark = logreg_train(df, ["x1", "x2"], "y", iters=10, lr=4.0,
                           small_rows=small)
    w_py = logreg_python([(r[0], r[1], float(r[2])) for r in rows],
                         k=2, iters=10, lr=4.0)
    assert w_spark == w_py


def test_predict_beats_majority(spark):
    rows = _blobs()
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    w = logreg_train(df, ["x1", "x2"], "y", iters=30, lr=8.0)
    got = logreg_predict(df, ["x1", "x2"], w).collect()
    acc = sum(int(r["pred"]) == r["y"] for r in got) / len(got)
    maj = max(sum(r[2] for r in rows), len(rows) - sum(r[2] for r in rows)
              ) / len(rows)
    assert acc > 0.9
    assert acc > maj


def test_oracle_replays_trainer(spark):
    duckdb = pytest.importorskip("duckdb")
    rows = _blobs(n=60, seed=11)
    df = spark.createDataFrame(rows, "x1 double, x2 double, y int")
    w_spark = logreg_train(df, ["x1", "x2"], "y", iters=8, lr=4.0)
    vals = ", ".join(f"({repr(a)}, {repr(b)}, {y})" for a, b, y in rows)
    feats = f"SELECT * FROM (VALUES {vals}) AS t(x1, x2, y)"
    sql = logreg_oracle_sql(feats, k=2, iters=8, lr=4.0)
    got = duckdb.connect().execute(sql).fetchone()
    assert list(got) == w_spark


def test_predict_plan_is_native(spark):
    df = spark.createDataFrame(_blobs(20), "x1 double, x2 double, y int")
    plan = (logreg_predict(df, ["x1", "x2"], [0.1, 0.2, 0.3])
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "x1 double, y int").where("x1 > 0")
    with pytest.raises(ValueError):
        logreg_train(df, ["x1"], "y", iters=1)
