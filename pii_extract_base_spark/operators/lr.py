"""Distributed logistic regression (batch gradient descent) — the
trainer behind a fastText-style linear quality classifier (north-star
stage N1 names "a linear classifier"; this is the from-scratch,
engine-native way to fit one on corpus-derived features).

Spark-first shape (the same iterative-ML driver-loop contract as
`operators/cluster.kmeans`):

 - The feature relation is materialized ONCE (localCheckpoint; persist
   on a real cluster) — every GD round then costs one scan + one
   map-side-combinable aggregation to k+1 gradient sums.  Only k+1
   scalars ever reach the driver per round, never rows.
 - The weight vector is broadcast state inlined as plan literals, so
   the sigmoid + gradient expressions run entirely inside
   WholeStageCodegen — no UDF, no Python crossing, no shuffle beyond
   the k+1-column partial-aggregate exchange.
 - Determinism/replayability: weights update on the driver as
   ``round(w - lr * grad_i / n, quant)`` — quantizing per round makes
   the whole trajectory reproducible across runs, partitionings, AND
   engines (the driver's DuckDB oracle replays every round as an
   unrolled CTE; sub-quantum float drift from summation order cannot
   escape a round).  z is built in explicit left-fold order for the
   same reason.

At 1e12-doc scale: iters × (feature-table scan + tiny agg) — the
standard batch-GD profile; minibatching would swap the scan for a
deterministic `sampling.stratified_sample` slice.
"""

import math
from typing import List, Sequence

from pyspark.sql import DataFrame, functions as F


def _qround(x: float, q: int) -> float:
    """Half-away-from-zero rounding in BINARY double space:
    sign·floor(|x|·10^q + 0.5)/10^q — the exact arithmetic of
    DuckDB's double round(). Python's built-in round() is banker's
    (round(0.125,2)=0.12), so using it on the driver would let a
    single exact-midpoint weight update diverge the oracle trajectory
    permanently.

    NOT interchangeable with operators/graph._round_half_up: that
    helper reproduces Catalyst's F.round (HALF_UP over the double's
    repr()-shortest DECIMAL representation) and the two disagree on
    inputs like 2.675 at dp=2 (binary scaling gives 2.67, decimal
    repr gives 2.68). Pick the helper that matches the engine you
    replay: _qround here because BOTH lr paths run the weight update
    in driver Python and the oracle is DuckDB; _round_half_up in
    graph/cluster because their distributed twins round with
    Catalyst F.round."""
    m = 10.0 ** q
    return math.copysign(math.floor(abs(x) * m + 0.5), x) / m


def _z_col(w: Sequence[float], feature_cols: Sequence[str]):
    """w0 + w1*x1 + … in explicit left-fold order (replay contract)."""
    z = F.lit(float(w[0]))
    for i, c in enumerate(feature_cols):
        z = z + F.lit(float(w[i + 1])) * F.col(c)
    return z


# Adaptive small-input gate for the GD loop (round 5, the same
# AQE-style move as operators/graph and operators/cluster): at or
# below this many training rows the 24-round trajectory is replayed
# on the driver with numpy instead of paying iters sequential
# scan+agg jobs of scheduling overhead. Honest driver-heap math: the
# collect materializes Python Rows with boxed floats (~100 B per
# float plus row overhead), so 1M rows × (k+1) floats is a few
# hundred MB of transient driver heap, not the ~40 MB the packed
# bytes suggest — fine on the multi-GB drivers a 100-TB job runs,
# but size `small_rows` DOWN on memory-constrained drivers. Above
# the gate the distributed loop (the 1e12-doc path) is unchanged.
# Pass 0 to force it.
LR_DRIVER_ROWS = 1_000_000


def _logreg_train_driver(rows, k: int, iters: int, lr: float,
                         quant: int, n: float) -> List[float]:
    """Driver replay of the GD rounds over the collected feature
    relation. The per-round weight update is the IDENTICAL driver
    code path (`_qround(w - lr·(g/n), quant)`); the only difference
    from the distributed loop is WHERE the gradient sums run — numpy
    here (deterministic pairwise summation, no BLAS threading) vs
    Spark partial aggregates there. Both differ from each other and
    from the DuckDB oracle only in floating summation order and exp()
    last-bit rounding, which the per-round ``quant``-digit weight
    quantization exists to absorb — the module's documented
    cross-engine invariant. Exact path parity is pytest-pinned and
    q67 re-hash-verified at sf0.001/sf0.01.

    NULL semantics mirror the aggregates: a row with any NULL feature
    or label contributes to NO gradient sum (err is NULL), but DOES
    count in ``n`` (the caller's full count)."""
    import numpy as np
    clean = [r for r in rows if all(x is not None for x in r)]
    X = np.array([r[:k] for r in clean], dtype=np.float64)
    y = np.array([r[k] for r in clean], dtype=np.float64)
    w = [0.0] * (k + 1)
    for _ in range(iters):
        # elementwise-multiply + .sum, NOT X @ w: matmul dispatches to
        # BLAS, whose thread-split summation order varies run to run
        z = (X * np.array(w[1:], dtype=np.float64)).sum(axis=1) + w[0]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = [float(err.sum())] + [float((err * X[:, i]).sum())
                                  for i in range(k)]
        w = [_qround(w[i] - lr * (g[i] / n), quant)
             for i in range(k + 1)]
    return w


def logreg_train(df: DataFrame, feature_cols: Sequence[str],
                 label_col: str = "y", iters: int = 12,
                 lr: float = 2.0, quant: int = 8,
                 small_rows: int = LR_DRIVER_ROWS) -> List[float]:
    """Fit weights [w0(bias), w1..wk] by full-batch GD from zeros.

    ``label_col`` must be 0/1-valued (booleans are cast).  Returns the
    quantized weight trajectory's final point.
    """
    k = len(feature_cols)
    X = (df.select(*[F.col(c).cast("double").alias(c)
                     for c in feature_cols],
                   F.col(label_col).cast("double").alias("_y"))
           .localCheckpoint())
    n = float(X.count())
    if n == 0:
        raise ValueError("empty training input")
    if small_rows and n <= small_rows:
        rows = [tuple(r[c] for c in feature_cols) + (r["_y"],)
                for r in X.collect()]
        return _logreg_train_driver(rows, k, iters, lr, quant, n)
    w = [0.0] * (k + 1)
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z_col(w, feature_cols)))
        err = p - F.col("_y")
        aggs = [F.sum(err).alias("g0")]
        aggs += [F.sum(err * F.col(c)).alias(f"g{i + 1}")
                 for i, c in enumerate(feature_cols)]
        g = X.agg(*aggs).collect()[0]
        w = [_qround(w[i] - lr * (float(g[f"g{i}"]) / n), quant)
             for i in range(k + 1)]
    return w


def logreg_predict(df: DataFrame, feature_cols: Sequence[str],
                   w: Sequence[float], out_col: str = "pred",
                   prob_col: str = None) -> DataFrame:
    """Score with fitted weights: pure projection (codegen, no UDF)."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z_col(w, feature_cols)))
    out = df.withColumn(out_col, p >= F.lit(0.5))
    if prob_col:
        out = out.withColumn(prob_col, p)
    return out


def logreg_python(rows, k: int, iters: int = 12, lr: float = 2.0,
                  quant: int = 8) -> List[float]:
    """Pure-Python GD reference (tests): rows = [(x1..xk, y), ...]."""
    n = float(len(rows))
    w = [0.0] * (k + 1)
    for _ in range(iters):
        g = [0.0] * (k + 1)
        for r in rows:
            z = w[0]
            for i in range(k):
                z = z + w[i + 1] * r[i]
            p = 1.0 / (1.0 + math.exp(-z))
            e = p - r[k]
            g[0] += e
            for i in range(k):
                g[i + 1] += e * r[i]
        w = [_qround(w[i] - lr * (g[i] / n), quant)
             for i in range(k + 1)]
    return w


def logreg_oracle_sql(feats_cte: str, k: int, iters: int = 12,
                      lr: float = 2.0, quant: int = 8,
                      final_select: str = None) -> str:
    """DuckDB replay of `logreg_train` as unrolled CTE rounds.

    ``feats_cte`` must select columns x1..xk and y (0/1).  Returns a
    WITH…SELECT whose final relation is one row of columns w0..wk —
    every arithmetic step mirrors the Spark/driver expressions' shape
    and association order; ::DOUBLE casts keep DuckDB out of DECIMAL
    arithmetic.  ``final_select`` overrides the trailing SELECT (it may
    reference ``feats``, ``nn`` and any ``w{r}_`` CTE — e.g. to score
    accuracy with the final weights).
    """
    lrr = repr(float(lr))
    xs = [f"x{i}" for i in range(1, k + 1)]
    ctes = [
        f"feats AS MATERIALIZED ({feats_cte})",
        "nn AS (SELECT count(*)::DOUBLE AS n FROM feats)",
        "w0_ AS MATERIALIZED (SELECT " + ", ".join(
            f"0.0::DOUBLE AS w{i}" for i in range(k + 1)) + ")",
    ]
    for r in range(1, iters + 1):
        z = "w0" + "".join(f" + w{i + 1}*{x}" for i, x in enumerate(xs))
        g_terms = ", ".join(
            ["sum(p - y) AS g0"]
            + [f"sum((p - y)*{x}) AS g{i + 1}" for i, x in enumerate(xs)])
        ctes.append(
            f"g{r} AS MATERIALIZED (SELECT {g_terms} FROM ("
            f"SELECT 1.0::DOUBLE/(1.0::DOUBLE + exp(-({z}))) AS p, "
            f"y::DOUBLE AS y, {', '.join(xs)} FROM feats, w{r - 1}_))")
        upd = ", ".join(
            f"round(w{i} - ({lrr})::DOUBLE * (g{i} / nn.n), {quant}) "
            f"AS w{i}" for i in range(k + 1))
        ctes.append(f"w{r}_ AS MATERIALIZED (SELECT {upd} FROM w{r - 1}_, g{r}, nn)")
    tail = final_select or f"SELECT * FROM w{iters}_"
    return "WITH " + ",\n".join(ctes) + "\n" + tail
