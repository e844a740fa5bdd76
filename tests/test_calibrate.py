"""threshold_sweep: the distributed ROC/calibration report."""

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, s double, y boolean")


def test_sweep_hand_computed_perfect_classifier(spark):
    from pii_extract_base_spark.functions.calibrate import threshold_sweep
    # scores 0..9, positive iff score < 5 → a perfect low-score rule
    rows = [(i, float(i), i < 5) for i in range(10)]
    out = {r["bin"]: r for r in
           threshold_sweep(_df(spark, rows), "s", "y",
                           n_bins=10, predict_low=True).collect()}
    assert len(out) == 10                     # one row per non-empty bin
    # bin of score s: floor(s*10/9), s=9 clamps to 9
    # cutting after bin 4 captures all 5 positives, zero negatives
    assert (out[4]["tp"], out[4]["fp"]) == (5, 0)
    assert out[4]["tpr"] == 1.0 and out[4]["fpr"] == 0.0
    assert out[4]["precision"] == 1.0
    # the full sweep ends at (all_pos, all_neg)
    assert (out[9]["tp"], out[9]["fp"]) == (5, 5)
    assert out[9]["tpr"] == 1.0 and out[9]["fpr"] == 1.0
    # confusion identities hold in every row
    for r in out.values():
        assert r["tp"] + r["fn"] == 5 and r["fp"] + r["tn"] == 5


def test_sweep_predict_high_reverses_direction(spark):
    from pii_extract_base_spark.functions.calibrate import threshold_sweep
    rows = [(i, float(i), i >= 5) for i in range(10)]   # high = positive
    out = {r["bin"]: r for r in
           threshold_sweep(_df(spark, rows), "s", "y",
                           n_bins=10, predict_low=False).collect()}
    # accumulating from the TOP bin: after bin 5 all positives are in
    assert (out[5]["tp"], out[5]["fp"]) == (5, 0)
    assert out[5]["precision"] == 1.0


def test_sweep_constant_score_single_bin(spark):
    from pii_extract_base_spark.functions.calibrate import threshold_sweep
    rows = [(i, 3.5, i % 2 == 0) for i in range(6)]
    out = threshold_sweep(_df(spark, rows), "s", "y", n_bins=16).collect()
    assert len(out) == 1 and out[0]["bin"] == 0
    assert out[0]["tp"] == 3 and out[0]["fp"] == 3


def test_sweep_excludes_null_scores_and_labels(spark):
    from pii_extract_base_spark.functions.calibrate import threshold_sweep
    rows = [(0, 1.0, True), (1, None, True), (2, 2.0, None),
            (3, 3.0, False)]
    out = threshold_sweep(_df(spark, rows), "s", "y", n_bins=4).collect()
    assert sum(r["n_pos"] + r["n_neg"] for r in out) == 2


def test_sweep_histogram_is_corpus_size_independent(spark):
    """The window runs over <= n_bins rows no matter the input size —
    row count of the report is bounded by n_bins."""
    from pii_extract_base_spark.functions.calibrate import threshold_sweep
    rows = [(i, float(i % 97), i % 3 == 0) for i in range(2000)]
    out = threshold_sweep(_df(spark, rows), "s", "y", n_bins=8).collect()
    assert len(out) <= 8
    assert sum(r["n_pos"] + r["n_neg"] for r in out) == 2000
