"""Physical-plan regression tests: the shapes that matter at 100 TB.

Correctness tests prove the answer; these prove the PLAN — filters
reach the parquet scan, small dims broadcast, top-N never globally
sorts, the anomaly slice never single-partitions. A refactor that
keeps results but loses one of these shapes regresses 100× at scale
while staying green everywhere else; these tests catch that.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_pushed_to_parquet_scan(spark, sf_dir):
    plan = _plan(entrymod.q01_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan, plan[:2000]
    # Column pruning: the scan must not read the whole 16-col lineitem.
    assert "ReadSchema" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read and "l_shipmode" not in read, read


def test_q03_small_dim_broadcasts(spark, sf_dir):
    plan = _plan(entrymod.q03_top_orders(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # Global sort+limit must compile to TakeOrdered, not a full sort.
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_q14_bucket_scoring_is_joinless(spark, sf_dir):
    """Expected-CTR buckets are a when-chain projection, not a join —
    first-match semantics with zero shuffle."""
    plan = _plan(entrymod.q14_ctr_underperf(spark, sf_dir))
    assert "RangeJoin" not in plan
    assert "CartesianProduct" not in plan
    # One broadcast is allowed (the scalar median fallback); the bucket
    # table itself must not appear as a join of N bucket rows.
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan[:3000]


def test_q37_semi_anti_stay_semi_anti(spark, sf_dir):
    plan = _plan(entrymod.q37_semi_anti_join(spark, sf_dir))
    assert "LeftSemi" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]


def test_q16_topn_uses_group_limit(spark, sf_dir):
    """Top-N per group must pre-prune via WindowGroupLimit (Spark 3.5+)
    so only N rows per key survive the shuffle, not the full table."""
    plan = _plan(entrymod.q16_top_parts_per_brand(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_q43_chunking_is_shuffle_free(spark, sf_dir):
    """Chunking is sequence+explode+slice — a pure per-partition plan.
    Any Exchange here would mean a 100 TB corpus shuffles for no
    reason. The scan must also prune to (doc_id, text)."""
    plan = _plan(entrymod.q43_chunk_documents(spark, sf_dir))
    assert "Exchange" not in plan, plan[:2000]
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read, read


def test_q44_sample_rates_broadcast_fact_never_shuffles(spark, sf_dir):
    """Per-leg plan shapes (asserting an exact exchange count over the
    unioned plan is brittle across Spark versions / AQE re-plans):

    - rate leg: the per-stratum rate dim broadcasts and the fact side
      reaches its filter with NO hash exchange at all;
    - topk leg: pre-limits via WindowGroupLimit, whose per-stratum
      window is its only hash exchange."""
    from pyspark.sql import functions as F

    from strategicai_visibility_loop_etl_spark.operators.textprep import (
        hash_sample,
        topk_per_stratum,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    rates = spark.createDataFrame(
        [("A", 50), ("N", 200), ("R", 10)], "l_returnflag string, rate_per_mille int"
    )
    rate_plan = _plan(
        hash_sample(li, rates, key_col="l_orderkey", stratum_col="l_returnflag")
    )
    assert "BroadcastHashJoin" in rate_plan, rate_plan[:2000]
    assert "SortMergeJoin" not in rate_plan, rate_plan[:2000]
    assert "Exchange hashpartitioning" not in rate_plan, rate_plan[:3000]

    topk_plan = _plan(
        topk_per_stratum(
            li.withColumn("__skey", F.col("l_orderkey") * 10 + F.col("l_linenumber")),
            k=8,
            key_col="__skey",
            stratum_col="l_returnflag",
            tiebreak_cols=["l_quantity"],
        )
    )
    assert "WindowGroupLimit" in topk_plan, topk_plan[:2000]
    assert topk_plan.count("Exchange hashpartitioning") == 1, topk_plan[:3000]


def test_ivf_assignment_reduces_map_side(spark):
    """IVF nearest-centroid assignment must be a broadcast cross join
    followed by a partial (map-side) aggregate — the corpus must never
    hash-shuffle ×n_centroids candidate rows."""
    from strategicai_visibility_loop_etl_spark.operators.similarity import ivf_topk

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    queries = emb.limit(2).select(
        emb.vec_id.alias("query_id"), emb.embedding.alias("query_vec")
    )
    plan = _plan(ivf_topk(emb, queries, k=3, n_centroids=4, n_probe=2, iters=1))
    assert "BroadcastNestedLoopJoin" in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    # min_by partial agg: both a partial and a final aggregate level.
    assert "partial_min_by" in plan or "partial_first" in plan, plan[:3000]


def test_pipeline_merge_has_no_giant_interpreted_stage(spark, tmp_path):
    """The visibility merge must stay inside whole-stage codegen: the
    constraint-propagation pathology (inferred isnotnull(url) expanded
    through the normalize tree) previously emitted >64KB methods and
    knocked stages into interpreted mode. Guard: with the pipeline's
    conf applied, the merge plan carries no filter on the url leg long
    enough to embed the expanded tree."""
    from strategicai_visibility_loop_etl_spark.operators.aggregate import agg_gsc
    from strategicai_visibility_loop_etl_spark.operators.merge import merge_visibility
    from strategicai_visibility_loop_etl_spark.sources.loaders import load_frog, load_gsc

    frog_csv = tmp_path / "frog.csv"
    frog_csv.write_text(
        "Address,Status Code\nhttps://a.example/x,200\n/rel/path,200\n"
    )
    gsc_csv = tmp_path / "gsc.csv"
    gsc_csv.write_text(
        "Top pages,Clicks,Impressions,CTR,Position\nhttps://a.example/x,5,100,5%,2.0\n"
    )
    prev = spark.conf.get("spark.sql.constraintPropagation.enabled")
    try:
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
        frog = load_frog(spark, str(frog_csv), "https://a.example")
        gsc = agg_gsc(load_gsc(spark, str(gsc_csv), "https://a.example"))
        merged = merge_visibility(frog, gsc, gsc.select("url", "clicks"))
        plan = _plan(merged)
        # The expanded pathology produced plans of >1MB; a healthy plan
        # for this 3-leg merge is a few KB.
        assert len(plan) < 100_000, f"plan blew up: {len(plan)} chars"
    finally:
        spark.conf.set("spark.sql.constraintPropagation.enabled", prev)


def test_q53_sampler_prelimits_before_exchange(spark, sf_dir):
    """The exactly-k sampler must ship only each task's local top-k per
    stratum: a Partial WindowGroupLimit below the exchange."""
    plan = _plan(entrymod.q53_topk_sample(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert plan.index("Partial") > 0
    # Partial limit sits below (after, in printed order) the Exchange.
    assert "Exchange" in plan


def test_q54_cube_expands_below_partial_agg(spark, sf_dir):
    """CUBE must Expand before the partial aggregate so the exchange
    carries per-grouping-set partials, not 4x the fact table."""
    plan = _plan(entrymod.q54_event_cube(spark, sf_dir))
    assert "Expand" in plan, plan[:2000]
    i_expand = plan.rindex("Expand")
    i_exchange = plan.rindex("Exchange")
    # Printed plans list consumers above producers: the Expand (deepest)
    # must appear BELOW the exchange in the text.
    assert i_expand > i_exchange, plan[:3000]


def test_q61_tfidf_uses_group_limit(spark, sf_dir):
    plan = _plan(entrymod.q61_tfidf(spark, sf_dir))
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_q52_line_dedup_no_cartesian_no_broadcast_of_common(spark, sf_dir):
    """The common-line set joins back by hash key; nothing may turn
    into a cartesian product, and the reassembly must be a single
    aggregate (exactly one agg exchange on doc_id)."""
    plan = _plan(entrymod.q52_line_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan or "HashAggregate" in plan


def test_winnowing_profile_is_shuffle_free(spark, sf_dir):
    """The winnowing fingerprint profile is a pure projection — gram
    hashing, window minima and the checksum all evaluate per row.
    Any Exchange means a 100 TB corpus shuffles for no reason; the
    scan must also prune to (doc_id, text)."""
    from strategicai_visibility_loop_etl_spark.operators.dedup import (
        winnow_fingerprints,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _plan(winnow_fingerprints(docs, k=5, window=4))
    assert "Exchange" not in plan, plan[:2000]
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "lang" not in read and "source" not in read, read


def test_scan_parallelize_is_adaptive(spark, sf_dir, monkeypatch):
    """Optimization r14: `_t(..., heavy=True)` repairs degenerate scan
    parallelism (the driver testdata is ONE file / ONE row group per
    table, so every pre-shuffle stage otherwise runs in a single task)
    with one round-robin repartition to the session's core count — but
    ONLY on reads the query hints as compute-heavy, and only when the
    layout is degenerate. The production claim: naturally-parallel
    inputs, dimension-sized tables, and every un-hinted read keep the
    pristine shuffle-free scan (the full-session A/B measured the
    blanket form taxing ~120 light queries an exchange each: 387 s
    blanket vs 302 s off vs ~274 s hinted)."""
    import __spark_entry__ as em

    p = spark.sparkContext.defaultParallelism
    big = f"{sf_dir}/embeddings.parquet"  # >128 KiB at every sf
    # Hinted degenerate single-row-group scan → exactly one round-robin.
    df = em._t(spark, sf_dir, "embeddings", heavy=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in df._jdf.queryExecution().logical().toString() or \
        "RoundRobinPartitioning" in plan, plan[:1500]
    assert df.rdd.getNumPartitions() == p
    # Un-hinted read (the default) → pristine scan, no repartition tax.
    base = em._t(spark, sf_dir, "embeddings")
    assert "RoundRobin" not in base._jdf.queryExecution().executedPlan().toString()
    # Dimension-sized table (region, < _SCAN_PAR_MIN_BYTES) → untouched
    # even when hinted.
    dim = em._t(spark, sf_dir, "region", heavy=True)
    assert "RoundRobin" not in dim._jdf.queryExecution().executedPlan().toString()
    # Naturally-parallel input (>= cores partitions) → untouched.
    par = spark.read.parquet(big).repartition(p)
    assert em._parallelize_scan(spark, par) is par
    # Kill switch beats the hint.
    monkeypatch.setattr(em, "_SCAN_PAR_MODE", "off")
    off = em._t(spark, sf_dir, "embeddings", heavy=True)
    assert "RoundRobin" not in off._jdf.queryExecution().executedPlan().toString()


def test_anomaly_rank_window_has_explicit_partition(spark):
    """The priority_rank window must carry a (constant) partition spec:
    the slice is bounded by .limit() so single-partition execution is
    safe, but the bound is now EXPLICIT in the plan — no
    'WindowExec: No Partition Defined' hazard warning, and a refactor
    that drops the limit still can't silently widen an unpartitioned
    global sort."""
    from strategicai_visibility_loop_etl_spark.operators.anomaly import (
        anomaly_ctr_underperf,
    )

    scored = spark.createDataFrame(
        [
            ("https://e.com/a", 1.0, 0.05, 1000.0, 40.0, 10.0),
            ("https://e.com/b", 2.0, 0.02, 2000.0, 90.0, 20.0),
            ("https://e.com/c", 3.0, 0.01, 500.0, 12.0, 5.0),
        ],
        "url string, position double, ctr double, impressions double,"
        " missed_clicks double, clicks double",
    )
    out = anomaly_ctr_underperf(scored, {"scoring": {}})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    # the Window node's partition spec survives optimization (a bare
    # literal would be folded away by EliminateWindowPartitions): a
    # partitioned Window renders three bracket lists (functions,
    # PARTITION SPEC, ordering) where the unpartitioned hazard form
    # renders only two.
    import re

    win_line = next(ln for ln in plan.splitlines() if "Window [" in ln)
    assert re.search(
        r"\], \[\S*_w0#\d+\S*\], \[missed_clicks", win_line
    ), win_line
    # ranking semantics unchanged
    rows = out.orderBy("priority_rank").collect()
    assert [r["priority_rank"] for r in rows] == [1, 2, 3]
    assert rows[0]["missed_clicks"] == 90.0


def test_anomaly_rank_survives_nan_metric(spark):
    """A NaN missed_clicks row (NaN > 0 is true in Spark) must not
    split the constant-key window into a second partition and
    duplicate ranks."""
    from strategicai_visibility_loop_etl_spark.operators.anomaly import (
        anomaly_ctr_underperf,
    )

    scored = spark.createDataFrame(
        [
            ("https://e.com/a", 1.0, 0.05, 1000.0, 40.0, 10.0),
            ("https://e.com/b", 2.0, 0.02, 2000.0, float("nan"), 20.0),
            ("https://e.com/c", 3.0, 0.01, 500.0, 12.0, 5.0),
        ],
        "url string, position double, ctr double, impressions double,"
        " missed_clicks double, clicks double",
    )
    rows = anomaly_ctr_underperf(scored, {"scoring": {}}).collect()
    ranks = sorted(r["priority_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1)), ranks
