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
