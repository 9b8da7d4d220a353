"""Driver-style correctness gate: every queries() entry vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duckdb_result, spark_result


pytestmark = pytest.mark.sweep  # full-registry oracle sweep at sf0.001 (161 queries)

QUERIES = sorted(entrymod.queries()) + sorted(entrymod.extra_queries())


def _all_queries():
    return {**entrymod.queries(), **entrymod.extra_queries()}


def _all_oracles():
    return {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = _all_queries()[name]
    oracles = _all_oracles()
    df = fn(spark, sf_dir)
    s_cols, s_rows, s_kinds = spark_result(df)
    if name not in oracles:
        assert len(s_rows) >= 0  # rows-only: runs and returns a frame
        assert len(s_cols) > 0
        return
    o_cols, o_rows, o_kinds = duckdb_result(oracles[name], sf_dir)
    rep = compare(name, s_cols, s_rows, o_cols, o_rows,
                  s_kinds=s_kinds, o_kinds=o_kinds)
    assert rep["status"] == "ok", rep


def test_query_registry_contract():
    """The driver's gate checks at most 50 sorted keys — enforce the cap
    mechanically, and every oracle key must name a registered query."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) <= 50, f"{len(qs)} queries; driver gate caps at 50"
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys with no queries() entry: {sorted(missing)}"
    # The qx* extra registry must stay disjoint from the driver's 50
    # (a shared key would double-register under the harness merge) and
    # every extra oracle must name an extra query.
    ex = entrymod.extra_queries()
    ex_oracles = entrymod.extra_oracle_sql()
    assert not set(ex) & set(qs), "extra_queries keys collide with queries()"
    assert not set(ex_oracles) - set(ex), "extra oracle keys with no extra query"
    # Every extra query carries an oracle unless explicitly declared
    # rows-only here — a new extra can't silently skip verification.
    declared_rows_only = {"qx05_hll_shard_distinct"}  # HLL estimates are engine-specific
    assert set(ex) - set(ex_oracles) == declared_rows_only


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"p_partkey", "revenue", "n_orders"}
