"""Contract tests for the decade-sweep tooling (tools/gen_decade.py,
tools/decade_cc_check.py) — DuckDB-only, no SparkSession, fast tier.

The decade replica is only a valid oracle-sweep input if every FK
stays closed, every column keeps its source type, and the mutated
documents stay internally consistent. These pins are what made the
round-12 sf0.5 sweep meaningful; they guard the tool for the next
scale jump.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.gen_decade import OFF, generate  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
MULT = 3


@pytest.fixture(scope="module")
def decade_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("decade"))
    counts = generate(SRC, out, MULT)
    return out, counts


def _one(con, q):
    return con.execute(q).fetchone()[0]


def test_row_counts_replicate(decade_dir):
    out, counts = decade_dir
    con = duckdb.connect()
    for table in ("customer", "orders", "lineitem", "events",
                  "documents", "embeddings", "part", "supplier"):
        src_n = _one(con, f"SELECT count(*) FROM read_parquet('{SRC}/{table}.parquet')")
        assert counts[table] == src_n * MULT, table
    for table in ("region", "nation"):
        src_n = _one(con, f"SELECT count(*) FROM read_parquet('{SRC}/{table}.parquet')")
        assert counts[table] == src_n, table


def test_schema_types_preserved(decade_dir):
    out, _ = decade_dir
    con = duckdb.connect()
    for table in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"):
        src = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchall()
        dst = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{out}/{table}.parquet')"
        ).fetchall()
        assert [(c[0], c[1]) for c in src] == [(c[0], c[1]) for c in dst], table


def test_fks_stay_closed(decade_dir):
    out, _ = decade_dir
    con = duckdb.connect()
    fks = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    for child, ck, parent, pk in fks:
        orphans = _one(con, f"""
            SELECT count(*) FROM read_parquet('{out}/{child}.parquet') c
            WHERE c.{ck} IS NOT NULL AND c.{ck} NOT IN
                  (SELECT {pk} FROM read_parquet('{out}/{parent}.parquet'))
        """)
        assert orphans == 0, f"{child}.{ck} -> {parent}.{pk}"


def test_fk_offsets_form_closed_sub_universes(decade_dir):
    """Each replica joins only within its own key block — the property
    that makes per-group aggregates exact MULT-fold ties."""
    out, _ = decade_dir
    con = duckdb.connect()
    cross = _one(con, f"""
        SELECT count(*) FROM read_parquet('{out}/lineitem.parquet') l
        JOIN read_parquet('{out}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        WHERE l.l_orderkey // {OFF} <> o.o_custkey // {OFF}
    """)
    assert cross == 0


def test_documents_mutated_but_consistent(decade_dir):
    out, _ = decade_dir
    con = duckdb.connect()
    bad = _one(con, f"""
        SELECT count(*) FROM read_parquet('{out}/documents.parquet')
        WHERE n_chars <> length(text)
    """)
    assert bad == 0
    # rep 0 byte-identical to source; rep>0 carries the tail token
    diff0 = _one(con, f"""
        SELECT count(*) FROM read_parquet('{out}/documents.parquet') d
        JOIN read_parquet('{SRC}/documents.parquet') s USING (doc_id)
        WHERE d.doc_id < {OFF} AND d.text <> s.text
    """)
    assert diff0 == 0
    untagged = _one(con, f"""
        SELECT count(*) FROM read_parquet('{out}/documents.parquet')
        WHERE doc_id >= {OFF}
          AND text NOT LIKE '%rep' || CAST(doc_id // {OFF} AS VARCHAR)
    """)
    assert untagged == 0


def test_embeddings_shifted_per_replica(decade_dir):
    out, _ = decade_dir
    con = duckdb.connect()
    # no exact-duplicate vectors across replicas of the same source row
    dups = _one(con, f"""
        SELECT count(*) FROM read_parquet('{out}/embeddings.parquet') a
        JOIN read_parquet('{out}/embeddings.parquet') b
          ON a.vec_id % {OFF} = b.vec_id % {OFF} AND a.vec_id < b.vec_id
        WHERE a.embedding = b.embedding
    """)
    assert dups == 0


def test_mult_cap_guards_qx100_arg_min_key():
    """mult * OFF must stay <= 2^32: qx100's oracle breaks argmin ties
    with the composite key h*2^32 + cand, order-equivalent to
    (h, cand) only while ids fit below 2^32 (ADVICE r13). The guard
    fails loudly instead of silently changing oracle tie-breaking,
    and fails BEFORE creating the output directory."""
    target = "/tmp/gen_decade_guard_should_not_exist"
    with pytest.raises(ValueError, match="2\\^32"):
        generate(SRC, target, mult=430)
    assert not os.path.exists(target)


def test_q22_sampled_tool_oracle_surgery_assumption():
    """decade_q22_sampled_check swaps q22's single `FROM documents`
    source for the sampled subquery by string surgery — pin the
    single-occurrence assumption so an oracle rewrite that breaks it
    fails THIS test, not silently mis-samples the sweep."""
    import __spark_entry__ as entrymod

    from tools.decade_q22_sampled_check import SAMPLE_PRED

    sql = entrymod.oracle_sql()["q22_ngram_jaccard"]
    assert sql.count("FROM documents") == 1
    assert "%" in SAMPLE_PRED and "doc_id" in SAMPLE_PRED


def test_union_find_matches_recursive_closure_semantics():
    from tools.decade_cc_check import union_find

    # chain + separate triangle + self-contained pair, shuffled input
    edges = [(5, 3), (3, 9), (9, 7), (20, 21), (21, 22), (22, 20), (40, 41)]
    labels = union_find(edges)
    assert labels == {5: 3, 3: 3, 9: 3, 7: 3,
                      20: 20, 21: 20, 22: 20, 40: 40, 41: 40}


def test_reps_split_staged_oracle_equals_recursive_oracle(tmp_path):
    """The qx12/qx36 decade checker's string-surgered oracle (staged
    union-find component table spliced in place of the embedded q42
    recursive CTE) returns byte-identical rows to the REGISTERED
    recursive oracle at a scale where the recursion is tractable —
    proving the splice changes the closure's ENGINE, not its
    semantics. DuckDB-only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from tools.decade_cc_check import duckdb_edges, union_find
    from tools.decade_reps_split_check import staged_oracle_sql

    sf_dir = SRC
    edges = duckdb_edges(
        entrymod.oracle_sql()["q42_dedup_clusters"], sf_dir
    )
    labels = union_find(edges)
    comp_path = str(tmp_path / "components.parquet")
    ids = sorted(labels)
    pq.write_table(
        pa.table({
            "id": pa.array(ids, pa.int64()),
            "component": pa.array([labels[i] for i in ids], pa.int64()),
        }),
        comp_path,
    )
    staged = staged_oracle_sql(entrymod, comp_path)
    registered = entrymod.extra_oracle_sql()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    for name in ("qx12_cluster_reps", "qx36_leakage_split"):
        assert "read_parquet" in staged[name]
        assert "RECURSIVE" not in staged[name].upper()
        want = con.execute(registered[name]).fetchall()
        got = con.execute(staged[name]).fetchall()
        assert got == want, name
