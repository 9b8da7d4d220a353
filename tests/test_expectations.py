"""Deequ-lite expectation gate (operators/expectations.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strategicai_visibility_loop_etl_spark.operators.expectations import (
    validate_expectations,
)


def test_every_rule_kind_counts_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "OK", 100),
            (2, None, -5.0, "OK", 100),        # null email, below range
            (2, "b@y.org", 10.0, "BAD", None), # dup id, bad status, null fk
            (4, "not-an-email", 99.0, "OK", 999),  # regex fail, fk missing
            (None, "c@z.io", 1000.0, "OK", 100),   # null id, above range
            (None, "d@w.co", 10.0, "OK", 100),     # second null id
        ],
        "id long, email string, amount double, status string, cust long",
    )
    ref = spark.createDataFrame([(100,), (101,)], "c long")
    rules = [
        {"rule": "not_null", "col": "email"},
        {"rule": "unique", "col": "id"},
        {"rule": "in_range", "col": "amount", "min": 0, "max": 500},
        {"rule": "accepted_values", "col": "status", "values": ["OK"]},
        {"rule": "matches_regex", "col": "email",
         "pattern": r"^[\w.]+@[\w.]+$"},
        {"rule": "foreign_key", "col": "cust", "ref": ref, "ref_col": "c"},
    ]
    got = {r["rule_id"]: r.asDict() for r in
           validate_expectations(df, rules).collect()}
    assert all(got[i]["n_rows"] == 6 for i in got)
    assert got[0]["n_violations"] == 1          # one null email
    # dup id=2 contributes 1 extra; two null ids contribute 1 extra
    assert got[1]["n_violations"] == 2
    assert got[2]["n_violations"] == 2          # -5 and 1000
    assert got[3]["n_violations"] == 1          # BAD
    assert got[4]["n_violations"] == 1          # not-an-email (nulls skip)
    assert got[5]["n_violations"] == 1          # 999 unmatched (null skips)
    assert not any(got[i]["passed"] for i in got)


def test_clean_table_passes_and_report_is_lazy(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 6.0)], "id long, v double"
    )
    rules = [
        {"rule": "not_null", "col": "v"},
        {"rule": "unique", "col": "id"},
        {"rule": "in_range", "col": "v", "min": 0.0},
    ]
    rep = validate_expectations(df, rules)  # no action yet
    rows = rep.collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rows)
    assert [r["rule_id"] for r in rows] == [0, 1, 2]


def test_unknown_rule_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown row-level rule"):
        validate_expectations(df, [{"rule": "nope", "col": "id"}]).collect()
