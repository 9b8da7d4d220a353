"""Automated plan-quality audit over EVERY registered query.

The scale contract this repo makes — no all-pairs joins, no
row-at-a-time Python in hot paths — is asserted per-operator in
test_plan_shapes.py; this audit enforces the two universal
anti-patterns across the whole registry so a future query can't
reintroduce them unnoticed:

- ``CartesianProduct``: a non-broadcast cross join is quadratic in
  inputs and never survives 100 TB. (Broadcast nested-loop joins of
  scalar/model-sized frames are legitimate and still allowed.)
- ``BatchEvalPython``: a row-at-a-time Python UDF — 10-100x slower
  than Arrow-batched execution. The declared Python boundaries use
  ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = sorted(entrymod.queries()) + sorted(entrymod.extra_queries())


@pytest.mark.parametrize("name", QUERIES)
def test_no_cartesian_or_rowwise_python(spark, sf_dir, name):
    df = {**entrymod.queries(), **entrymod.extra_queries()}[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product\n{plan[:2000]}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF\n{plan[:2000]}"
