"""Hashed n-gram linear scorer (SURVEY §2 row 107)."""

from __future__ import annotations

from pyspark.sql import functions as F

from strategicai_visibility_loop_etl_spark.operators.scorer import (
    hashed_features,
    hashed_scorer_scores,
    train_hashed_scorer,
)

_M = 1_000_000_007


def _py_hash(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % _M
    return acc


def _py_features(text: str, n_buckets: int, char_n: int = 3) -> list[int]:
    words = text.lower().split()
    feats = [_py_hash(w) % n_buckets for w in words]
    feats += [
        _py_hash(f"{a} {b}") % n_buckets for a, b in zip(words, words[1:])
    ]
    for w in words:
        m = f"<{w}>"
        feats += [
            _py_hash(m[i : i + char_n]) % n_buckets
            for i in range(len(m) - char_n + 1)
        ]
    return feats


def test_hashed_features_match_python_reimplementation(spark):
    texts = ["The quick brown fox", "a", "héllo wörld again", "x y"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: r["f"]
        for r in df.select(
            "i", hashed_features(F.col("text"), 512).alias("f")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_features(t, 512), (t, got[i])


def test_train_and_score_separates_classes(spark):
    pos = [f"the cat sat on the mat number {i}" for i in range(30)]
    neg = [f"zzz qqq vvv kkk jjj item {i}" for i in range(30)]
    rows = [(i, t, True) for i, t in enumerate(pos)] + [
        (100 + i, t, False) for i, t in enumerate(neg)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    w = train_hashed_scorer(df, "label", n_buckets=2048)
    scored = hashed_scorer_scores(df, w, n_buckets=2048)
    got = {r["doc_id"]: r for r in scored.collect()}
    for i, _t, y in rows:
        assert got[i]["pred"] == y, (i, got[i])
    assert all(r["n_features"] > 0 for r in got.values())


def test_score_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "real text here", True), (2, None, False), (3, "   ", False)],
        "doc_id long, text string, label boolean",
    )
    w = train_hashed_scorer(df, "label", n_buckets=256)
    got = {r["doc_id"]: r for r in
           hashed_scorer_scores(df, w, n_buckets=256).collect()}
    for i in (2, 3):
        assert got[i]["n_features"] == 0
        assert got[i]["score"] is None and got[i]["pred"] is False


def test_score_plan_has_no_python_or_cartesian(spark):
    df = spark.createDataFrame(
        [(1, "a b c", True), (2, "d e f", False)],
        "doc_id long, text string, label boolean",
    )
    w = train_hashed_scorer(df, "label", n_buckets=128)
    out = hashed_scorer_scores(df, w, n_buckets=128)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_dsir_selects_target_like_documents(spark):
    """DSIR must prefer raw docs that resemble the target corpus: with
    a target full of cat-phrases and a raw pool split between
    cat-phrases and junk, the selected half must be overwhelmingly the
    cat half, and log-weights must rank cat docs above junk docs."""
    from strategicai_visibility_loop_etl_spark.operators.scorer import dsir_select

    target = spark.createDataFrame(
        [(1000 + i, f"the cat sat on the mat and purred number {i}")
         for i in range(20)],
        "doc_id long, text string",
    )
    raw_rows = [(i, f"the cat sat near the mat today item {i}") for i in range(25)]
    raw_rows += [(100 + i, f"zzz qqq vvv kkk www uuu ooo {i}") for i in range(25)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")

    out = dsir_select(raw, target, k=20, n_buckets=2048)
    rows = out.collect()
    assert len(rows) == 20
    assert {r["sel_rank"] for r in rows} == set(range(1, 21))
    cat_ids = {r["doc_id"] for r in rows if r["doc_id"] < 100}
    assert len(cat_ids) >= 18  # Gumbel noise may admit a stray junk doc
    # log-weights themselves must separate the pools
    scores = {r["doc_id"]: r["logw"] for r in rows}
    junk = [v for i, v in scores.items() if i >= 100]
    cat = [v for i, v in scores.items() if i < 100]
    assert not junk or max(junk) < min(cat)


def test_dsir_is_deterministic(spark):
    from strategicai_visibility_loop_etl_spark.operators.scorer import dsir_select

    target = spark.createDataFrame(
        [(900 + i, f"alpha beta gamma {i}") for i in range(5)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, f"alpha beta delta {i}") for i in range(30)],
        "doc_id long, text string",
    )
    a = sorted((r["doc_id"], r["sel_rank"]) for r in
               dsir_select(raw, target, k=10, n_buckets=512).collect())
    b = sorted((r["doc_id"], r["sel_rank"]) for r in
               dsir_select(raw.repartition(7), target, k=10, n_buckets=512).collect())
    assert a == b


def _pava_reference(weights, means):
    """Textbook pool-adjacent-violators on (weight, mean) blocks;
    returns the per-block fitted values."""
    pools = []  # [weight, weighted_sum, n_blocks]
    for w, m in zip(weights, means):
        pools.append([w, w * m, 1])
        while len(pools) > 1 and (
            pools[-2][1] / pools[-2][0] > pools[-1][1] / pools[-1][0]
        ):
            w2, s2, c2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
            pools[-1][2] += c2
    res = []
    for w, s, c in pools:
        res.extend([s / w] * c)
    return res


def test_isotonic_calibrate_matches_pava(spark):
    """The max-min closed form equals textbook PAVA; fit is monotone
    non-decreasing; degenerate constant score lands in bin 0."""
    import pytest as _pytest

    from strategicai_visibility_loop_etl_spark.operators.scorer import (
        isotonic_calibrate,
    )

    rows = []
    # bin means 0.8, 0.2, 0.5, 0.9 with weights 5, 5, 2, 2 over
    # scores 0..3 (n_bins=4 over range [0,3])
    rows += [(0.0, 1.0)] * 4 + [(0.0, 0.0)]
    rows += [(1.0, 1.0)] * 1 + [(1.0, 0.0)] * 4
    rows += [(2.0, 1.0), (2.0, 0.0)]
    rows += [(3.0, 0.9), (3.0, 0.9)]
    df = spark.createDataFrame(rows, "score double, label double")
    out = sorted(
        isotonic_calibrate(df, "score", "label", n_bins=4).collect(),
        key=lambda r: r["bin"],
    )
    want = _pava_reference([5, 5, 2, 2], [0.8, 0.2, 0.5, 0.9])
    got = [r["fit"] for r in out]
    assert got == [round(v, 6) for v in want] == [0.5, 0.5, 0.5, 0.9]
    assert [r["label_mean"] for r in out] == [0.8, 0.2, 0.5, 0.9]
    assert all(a <= b for a, b in zip(got, got[1:]))  # monotone
    assert [r["n"] for r in out] == [5, 5, 2, 2]

    # constant score: everything in bin 0, fit = global mean
    const = spark.createDataFrame(
        [(7.0, 1.0), (7.0, 0.0)], "score double, label double"
    )
    c = isotonic_calibrate(const, "score", "label", n_bins=4).collect()
    assert len(c) == 1 and c[0]["bin"] == 0 and c[0]["fit"] == 0.5

    with _pytest.raises(ValueError):
        isotonic_calibrate(df, "score", "label", n_bins=0)
