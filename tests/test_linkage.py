"""Fuzzy record linkage (capability row 137): token blocking +
levenshtein verify — semantics and the hot-token skew guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from strategicai_visibility_loop_etl_spark.operators.linkage import fuzzy_match_pairs


def _catalog(spark):
    rows = [
        (1, "Cold Widget"),
        (2, "cold widget"),        # case/space-normalized exact dup of 1
        (3, "cld widget"),         # deletion typo of 1/2
        (4, "bold widget"),        # 1 substitution from "cold widget"
        (5, "copper pipe"),        # unrelated
        (6, "coper pipe"),         # deletion typo of 5
        (7, None),                 # can't block
        (8, "   "),                # normalizes to '' -> dropped
    ]
    return spark.createDataFrame(rows, "id long, name string")


def test_fuzzy_match_pairs_semantics(spark):
    got = {
        (r["id_a"], r["id_b"]): r
        for r in fuzzy_match_pairs(
            _catalog(spark), max_dist=2, min_sim=0.8, max_block=1000
        ).collect()
    }
    # Exact dup after normalization: dist 0, similarity 1.
    assert got[(1, 2)]["dist"] == 0 and got[(1, 2)]["similarity"] == 1.0
    # Deletion typos match through the shared token block.
    assert got[(1, 3)]["dist"] == 1 and got[(2, 3)]["dist"] == 1
    assert got[(5, 6)]["dist"] == 1
    # One substitution is still a match at max_dist=2.
    assert (2, 4) in got
    # Cross-family pairs share no token OR fail the distance gate.
    assert (1, 5) not in got and (3, 6) not in got
    # Null and whitespace-only names never appear.
    assert not any(7 in p or 8 in p for p in got)


def test_fuzzy_match_hot_token_guard(spark):
    """With the cap below the 'widget' posting size, the widget block
    is dropped: pairs sharing ONLY hot tokens disappear, pairs that
    also share a cold token survive."""
    rows = [
        (1, "cold widget"),
        (2, "cold widget"),   # shares cold 'cold' AND hot 'widget'
        (3, "blue widget"),
        (4, "bluu widget"),   # shares ONLY the hot token with 3
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(
            df, max_dist=2, min_sim=0.0, max_block=3
        ).collect()
    }
    assert (1, 2) in got          # cold-token block survives
    assert (3, 4) not in got      # only shared token was hot -> missed
    # No pruning with a high cap: the pair comes back.
    got_all = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_match_pairs(
            df, max_dist=2, min_sim=0.0, max_block=1000
        ).collect()
    }
    assert (3, 4) in got_all


def test_blocking_quality_hand_example(spark):
    from strategicai_visibility_loop_etl_spark.operators.linkage import (
        blocking_quality,
    )

    # Block A = {1,2,3}, block B = {4}: candidates (1,2),(1,3),(2,3)
    # of C(4,2)=6 total -> RR = 0.5.  Truth {(1,2),(4,1)}: one of two
    # covered -> PC = 0.5; PQ = 1/3.
    recs = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B")], "id long, block_key string"
    )
    truth = spark.createDataFrame([(1, 2), (4, 1)], "id_a long, id_b long")
    r = blocking_quality(recs, truth).collect()[0]
    assert (r["n_records"], r["candidate_pairs"], r["truth_pairs"],
            r["truth_covered"], r["oversize_blocks"]) == (4, 3, 2, 1, 0)
    assert (r["reduction_ratio"], r["pairs_completeness"],
            r["pairs_quality"]) == (0.5, 0.5, 0.333333)


def test_blocking_quality_multikey_and_oversize_guard(spark):
    from strategicai_visibility_loop_etl_spark.operators.linkage import (
        blocking_quality,
    )

    # Multi-key: (1,2) co-blocked under BOTH keys counts once.  With
    # max_block=2 the size-3 block is excluded and reported; the pair
    # (1,2) survives via the small block.
    recs = spark.createDataFrame(
        [(1, "big"), (2, "big"), (3, "big"), (1, "small"), (2, "small")],
        "id long, block_key string",
    )
    truth = spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    r = blocking_quality(recs, truth, max_block=2).collect()[0]
    assert (r["candidate_pairs"], r["oversize_blocks"]) == (1, 1)
    assert r["pairs_completeness"] == 0.0
    r2 = blocking_quality(recs, truth, max_block=10).collect()[0]
    assert (r2["candidate_pairs"], r2["truth_covered"]) == (3, 1)
