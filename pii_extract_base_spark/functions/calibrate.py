"""Distributed classifier calibration sweep — the threshold-tuning
report every quality-filter deployment runs before picking its cut:
given a continuous score column and a boolean label column, compute
confusion counts and TPR/FPR/precision at every threshold of a
B-bin score histogram (the distributed ROC-curve shape).

Plan at 100 TB (the only scale-safe ROC rendering):
  1. ONE map-combined aggregate for the global score (min, max) —
     broadcast back as a 1-row relation;
  2. ONE hash aggregate builds the (bin → n_pos, n_neg) histogram —
     counts shuffle, never rows;
  3. the cumulative sweep is a window over the ≤B-row histogram —
     B is a constant (64), so the "global sort" touches 64 rows no
     matter the corpus size.  Sorting the corpus by score to sweep
     thresholds row-by-row — the single-node sklearn shape — is the
     anti-pattern this replaces.

Determinism contract: the score must live on a 1/``scale`` decimal
grid (e.g. q63's 5-dp-rounded logppl with scale=1e5).  Scores scale
to exact BIGINTs, so bin assignment and bin edges are integer
arithmetic — bit-identical on every engine.  Deriving edges from
double min/max instead flips the last printed digit between engines
when an edge lands within an ulp of a rounding boundary (observed in
the first cut of q87: 9.593734…9 vs 9.593735…1); the scaled-integer
grid is the fix, not more rounding.
"""

from pyspark.sql import DataFrame, Window, functions as F


def threshold_sweep(df: DataFrame, score_col: str, label_col: str,
                    n_bins: int = 64, scale: int = 100_000,
                    predict_low: bool = True) -> DataFrame:
    """Per-bin calibration rows: (bin, threshold, n_pos, n_neg, tp,
    fp, fn, tn, tpr, fpr, precision).

    ``predict_low=True`` means LOW scores predict the positive label
    (the perplexity convention: low ppl → keep); the sweep then
    accumulates from the lowest bin upward, and row `bin` reports the
    confusion matrix of the rule "predict positive iff the score
    falls in bins 0..bin".  With ``predict_low=False`` the
    accumulation runs from the top bin down.

    ``threshold`` is the upper (resp. lower) score edge of the bin:
    (mn·B + (bin+off)·(mx−mn)) in scaled-integer space divided by
    B·scale — exact integers up to the final constant division, so
    both engines emit the identical double.  NULL scores and NULL
    labels are excluded from the sweep (reported by the caller's
    completeness checks, not silently binned).
    """
    s5 = F.round(F.col(score_col).cast("double") * scale).cast("long")
    base = (df.select(s5.alias("s5"),
                      F.col(label_col).cast("boolean").alias("y"))
              .where(F.col("s5").isNotNull() & F.col("y").isNotNull()))
    ext = base.agg(F.min("s5").alias("mn5"), F.max("s5").alias("mx5"))
    span = F.col("mx5") - F.col("mn5")
    b = F.floor((F.col("s5") - F.col("mn5")) * n_bins / span)
    bin_ = (F.when(span == 0, F.lit(0))
             .otherwise(F.least(b, F.lit(n_bins - 1)))
             .cast("int"))
    hist = (base.crossJoin(F.broadcast(ext))
                .select(bin_.alias("bin"), "y", "mn5", "mx5")
                .groupBy("bin", "mn5", "mx5")
                .agg(F.sum(F.when(F.col("y"), 1).otherwise(0))
                      .cast("long").alias("n_pos"),
                     F.sum(F.when(F.col("y"), 0).otherwise(1))
                      .cast("long").alias("n_neg")))
    order = F.col("bin").asc() if predict_low else F.col("bin").desc()
    w = (Window.orderBy(order)
               .rowsBetween(Window.unboundedPreceding, 0))
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    off = 1 if predict_low else 0
    edge = ((F.col("mn5") * n_bins
             + (F.col("bin") + off) * (F.col("mx5") - F.col("mn5")))
            / F.lit(float(n_bins * scale)))
    tp = F.sum("n_pos").over(w)
    fp = F.sum("n_neg").over(w)
    all_pos = F.sum("n_pos").over(tot)
    all_neg = F.sum("n_neg").over(tot)

    def rate(num, den):
        return F.round(F.when(den > 0, num / den).otherwise(F.lit(0.0)),
                       6)

    return (hist.select(
        "bin",
        edge.alias("threshold"),
        "n_pos", "n_neg",
        tp.alias("tp"), fp.alias("fp"),
        (all_pos - tp).alias("fn"), (all_neg - fp).alias("tn"),
        rate(tp, all_pos).alias("tpr"),
        rate(fp, all_neg).alias("fpr"),
        rate(tp, tp + fp).alias("precision")))


def threshold_sweep_oracle_sql(score_sql: str, label_sql: str,
                               from_sql: str, n_bins: int = 64,
                               scale: int = 100_000,
                               predict_low: bool = True) -> str:
    """DuckDB replay: identical scaled-integer binning and edge
    arithmetic (exact BIGINTs until the final constant division),
    identical cumulative window."""
    direction = "ASC" if predict_low else "DESC"
    off = 1 if predict_low else 0
    return f"""
WITH base AS (
    SELECT round(({score_sql})::DOUBLE * {scale})::BIGINT AS s5,
           ({label_sql})::BOOLEAN AS y
    FROM {from_sql}
    WHERE ({score_sql}) IS NOT NULL AND ({label_sql}) IS NOT NULL
),
ext AS (SELECT min(s5) AS mn5, max(s5) AS mx5 FROM base),
hist AS (
    SELECT CASE WHEN mx5 = mn5 THEN 0
                ELSE least(floor((s5 - mn5) * {n_bins}
                                 / (mx5 - mn5)),
                           {n_bins - 1}) END::INT AS bin,
           mn5, mx5,
           sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS n_pos,
           sum(CASE WHEN y THEN 0 ELSE 1 END)::BIGINT AS n_neg
    FROM base CROSS JOIN ext
    GROUP BY 1, 2, 3
),
sweep AS (
    SELECT bin,
           (mn5 * {n_bins} + (bin + {off}) * (mx5 - mn5))
               / {float(n_bins * scale)!r} AS threshold,
           n_pos, n_neg,
           sum(n_pos) OVER (ORDER BY bin {direction}
                            ROWS UNBOUNDED PRECEDING) AS tp,
           sum(n_neg) OVER (ORDER BY bin {direction}
                            ROWS UNBOUNDED PRECEDING) AS fp,
           sum(n_pos) OVER () AS all_pos,
           sum(n_neg) OVER () AS all_neg
    FROM hist
)
SELECT bin, threshold, n_pos, n_neg,
       -- window sums are HUGEINT in DuckDB and arrive as float64 in
       -- pandas; pin the confusion counts to BIGINT so both the
       -- driver's comparator and the repo contract test see integers
       tp::BIGINT AS tp, fp::BIGINT AS fp,
       (all_pos - tp)::BIGINT AS fn, (all_neg - fp)::BIGINT AS tn,
       round(CASE WHEN all_pos > 0 THEN tp / all_pos ELSE 0.0 END, 6)
           AS tpr,
       round(CASE WHEN all_neg > 0 THEN fp / all_neg ELSE 0.0 END, 6)
           AS fpr,
       round(CASE WHEN (tp + fp) > 0 THEN tp / (tp + fp)
             ELSE 0.0 END, 6) AS precision
FROM sweep
"""
