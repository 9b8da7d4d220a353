"""literal_frame (optimization r14): model-sized local rows as literal
single-task DataFrames must be row/type-identical to createDataFrame,
and must not route through a Python-RDD parallelize."""

from __future__ import annotations

from strategicai_visibility_loop_etl_spark.functions.localframe import (
    literal_frame,
)


def test_literal_frame_matches_createdataframe(spark):
    rows = [
        ("a", 1, 1.5, [1.0, 2.0]),
        ("b", None, None, []),
        (None, 3, -0.0, [3.5]),
    ]
    schema = "s string, i int, d double, v array<double>"
    lit_df = literal_frame(spark, rows, schema)
    ref_df = spark.createDataFrame(rows, schema)
    # dtypes (names + types) are the contract; nullability flags may
    # tighten (literals are provably non-null where values are given)
    assert lit_df.dtypes == ref_df.dtypes
    key = lambda r: tuple(map(str, r))  # noqa: E731 - None-safe sort
    assert sorted(map(tuple, lit_df.collect()), key=key) == sorted(
        map(tuple, ref_df.collect()), key=key
    )


def test_literal_frame_is_single_task_jvm_plan(spark):
    df = literal_frame(spark, [("x", 1)], "k string, n int")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in plan  # no python parallelize
    assert df.rdd.getNumPartitions() == 1


def test_literal_frame_falls_back_when_oversized_or_empty(spark):
    big = [(i,) for i in range(600)]
    df = literal_frame(spark, big, "n int", max_literal_rows=512)
    assert df.count() == 600
    empty = literal_frame(spark, [], "n int")
    assert empty.count() == 0 and empty.schema.fieldNames() == ["n"]
