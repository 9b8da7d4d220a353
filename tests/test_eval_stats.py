"""Unit tests for the round-12 evaluation/statistics wave —
classifier_eval (AUC / Mann-Whitney), psi_drift, moments_profile —
hand-computed pins; the sf-scale DuckDB oracle checks live in
test_oracle (qx112/qx113/qx114)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from strategicai_visibility_loop_etl_spark.operators.aggregate import (
    moments_profile,
)
from strategicai_visibility_loop_etl_spark.operators.drift import psi_drift
from strategicai_visibility_loop_etl_spark.operators.scorer import (
    classifier_eval,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "g string, score double, label int")


# ---------------------------------------------------------------- AUC


def test_auc_perfect_separation(spark):
    rows = [("a", float(s), 1 if s >= 10 else 0) for s in range(20)]
    out = classifier_eval(_scored(spark, rows), "score", "label", ["g"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_pos"] == 10 and r["n_neg"] == 10
    assert r["auc"] == 1.0
    assert r["u_stat"] == 100.0  # n_pos * n_neg
    assert r["z"] > 3.0


def test_auc_reversed_is_zero(spark):
    rows = [("a", float(s), 0 if s >= 10 else 1) for s in range(20)]
    r = classifier_eval(_scored(spark, rows), "score", "label", ["g"]).collect()[0]
    assert r["auc"] == 0.0
    assert r["u_stat"] == 0.0
    assert r["z"] < -3.0


def test_auc_all_tied_is_half(spark):
    rows = [("a", 1.0, i % 2) for i in range(10)]
    r = classifier_eval(_scored(spark, rows), "score", "label", ["g"]).collect()[0]
    assert r["auc"] == 0.5
    # Every comparison is a tie -> U = n_pos*n_neg/2; variance is 0
    # (single tie group of size n), so z must be NULL, not a 0/0.
    assert r["u_stat"] == 12.5
    assert r["z"] is None


def test_auc_hand_case_with_ties(spark):
    # scores [1,1,2,3], labels [0,1,0,1]: avg ranks 1.5,1.5,3,4.
    # R_pos = 1.5+4 = 5.5 -> AUC = (5.5 - 3)/4 = 0.625, U = 2.5.
    rows = [("a", 1.0, 0), ("a", 1.0, 1), ("a", 2.0, 0), ("a", 3.0, 1)]
    r = classifier_eval(_scored(spark, rows), "score", "label", ["g"]).collect()[0]
    assert r["auc"] == 0.625
    assert r["u_stat"] == 2.5


def test_auc_single_class_null_metrics(spark):
    rows = [("a", float(s), 1) for s in range(5)]
    r = classifier_eval(_scored(spark, rows), "score", "label", ["g"]).collect()[0]
    assert r["n_pos"] == 5 and r["n_neg"] == 0
    assert r["auc"] is None and r["u_stat"] is None and r["z"] is None


def test_auc_null_rows_excluded_and_groups_independent(spark):
    rows = [
        ("a", 0.0, 1), ("a", 1.0, 0),          # AUC 0 in group a
        ("b", 0.0, 0), ("b", 1.0, 1),          # AUC 1 in group b
        ("a", None, 1), ("b", 2.0, None),      # excluded
    ]
    out = {r["g"]: r for r in classifier_eval(
        _scored(spark, rows), "score", "label", ["g"]).collect()}
    assert out["a"]["auc"] == 0.0 and out["a"]["n"] == 2
    assert out["b"]["auc"] == 1.0 and out["b"]["n"] == 2


# ---------------------------------------------------------------- PSI


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def test_psi_identical_distribution_near_zero(spark):
    base = _vals(spark, [("x", float(i)) for i in range(100)])
    cur = _vals(spark, [("s", float(i)) for i in range(100)])
    r = psi_drift(cur, "v", ["g"], baseline=base).collect()[0]
    assert r["n_cur"] == 100 and r["n_base"] == 100
    assert 0.0 <= r["psi"] < 1e-6


def test_psi_shifted_distribution_large(spark):
    base = _vals(spark, [("x", float(i)) for i in range(100)])
    shifted = _vals(spark, [("s", float(i) + 1000.0) for i in range(100)])
    r = psi_drift(shifted, "v", ["g"], baseline=base).collect()[0]
    # Everything lands in the top bin: classic "action required" PSI.
    assert r["psi"] > 1.0


def test_psi_groups_ranked_by_drift(spark):
    base = _vals(spark, [("x", float(i)) for i in range(200)])
    cur = _vals(
        spark,
        [("same", float(i)) for i in range(200)]
        + [("skew", float(i % 20)) for i in range(200)],
    )
    out = {r["g"]: r["psi"] for r in
           psi_drift(cur, "v", ["g"], baseline=base).collect()}
    assert out["skew"] > out["same"]


def test_psi_rejects_degenerate_bins(spark):
    df = _vals(spark, [("a", 1.0)])
    with pytest.raises(ValueError):
        psi_drift(df, "v", ["g"], n_bins=1)


# ------------------------------------------------------------ moments


def test_moments_hand_case(spark):
    # [1..5]: mean 3, sample std sqrt(2.5), m3=0 -> skew 0;
    # m4 = 6.8, g2 = 6.8/4 - 3 = -1.3 -> G2 = ((6)(-1.3)+6)*4/6 = -1.2
    df = _vals(spark, [("a", float(i)) for i in range(1, 6)])
    r = moments_profile(df, "v", ["g"]).collect()[0]
    assert r["n"] == 5
    assert r["mean"] == 3.0
    assert abs(r["std"] - math.sqrt(2.5)) < 1e-6
    assert r["skewness"] == 0.0
    assert abs(r["kurtosis"] - (-1.2)) < 1e-9


def test_moments_right_skewed_positive(spark):
    df = _vals(spark, [("a", v) for v in [1.0] * 20 + [100.0]])
    r = moments_profile(df, "v", ["g"]).collect()[0]
    assert r["skewness"] > 3.0
    assert r["kurtosis"] > 10.0


def test_moments_degenerate_groups(spark):
    rows = (
        [("n2", 1.0), ("n2", 2.0)]                     # n<3: no skew
        + [("n3", 1.0), ("n3", 2.0), ("n3", 4.0)]      # n<4: no kurt
        + [("const", 7.0)] * 6                         # zero variance
    )
    out = {r["g"]: r for r in moments_profile(_vals(spark, rows), "v", ["g"]).collect()}
    assert out["n2"]["skewness"] is None and out["n2"]["kurtosis"] is None
    assert out["n2"]["std"] is not None
    assert out["n3"]["skewness"] is not None
    assert out["n3"]["kurtosis"] is None
    assert out["const"]["skewness"] is None
    assert out["const"]["kurtosis"] is None
    assert out["const"]["std"] == 0.0


def test_moments_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0)],
        "g string, v double",
    )
    r = moments_profile(df, "v", ["g"]).collect()[0]
    assert r["n"] == 5 and r["mean"] == 3.0
