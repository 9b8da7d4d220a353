"""End-to-end corpus-cleaning pipeline: composition of the oracle-gated
training-data operators, verified on a hand-built fixture plus the real
documents table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strategicai_visibility_loop_etl_spark.plans.corpus import (
    default_corpus_config,
    run_corpus_pipeline,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, BASE),
        (2, BASE.upper()),                      # exact dup of 1 (normalized)
        (3, BASE + " tonight"),                 # near dup of 1
        (4, "completely different words about spark catalyst execution plans here"),
        (5, "short"),                           # under min_tokens
        (6, "mail me at jane.doe@example.com " + BASE),  # PII + near dup
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_corpus_pipeline_stages(corpus):
    cfg = default_corpus_config()
    cfg["min_tokens"] = 6
    cfg["neardup"] = {"enable": True, "k": 3, "threshold": 0.5, "max_bucket": 10**6}
    cfg["chunk"] = {"enable": True, "chunk_tokens": 8, "overlap": 2}
    cfg["pack"] = {"enable": True, "budget_tokens": 16, "stratum_col": None}
    cfg["shards"] = 2
    out = run_corpus_pipeline(corpus, cfg)

    ann = {r["doc_id"]: r for r in out["annotated"].collect()}
    assert len(ann) == 6                       # annotation never drops rows
    assert ann[1]["n_tokens"] == len(BASE.split())
    assert ann[1]["lang"] is not None and 0.0 <= ann[1]["quality"] <= 1.0

    clean = {r["doc_id"]: r for r in out["clean"].collect()}
    # 5 dropped (too short); 1/2/3/6 are one near-dup cluster -> keep 1;
    # 4 distinct -> kept.
    assert set(clean) == {1, 4}
    # PII was redacted before dedup, so the kept text is clean even
    # when a redacted doc had been the cluster's representative.
    assert "@" not in clean[1]["text"]

    chunks = out["chunks"].collect()
    assert all(r["doc_id"] in {1, 4} for r in chunks)
    assert any(r["chunk_idx"] > 0 for r in chunks)  # BASE splits into >1 chunk

    packs = {r["doc_id"]: r["pack_id"] for r in out["packed"].collect()}
    assert set(packs) == {1, 4}

    shards = {r["doc_id"]: r["shard"] for r in out["shards"].collect()}
    assert set(shards) == {1, 4}
    assert all(0 <= s < 2 for s in shards.values())


def test_corpus_pipeline_exact_only_and_filters(corpus):
    cfg = default_corpus_config()
    cfg["min_tokens"] = 6
    cfg["neardup"] = {"enable": False}
    out = run_corpus_pipeline(corpus, cfg)
    clean = {r["doc_id"] for r in out["clean"].collect()}
    # Exact-only: 2 collapses into 1; near-dups 3 and 6 survive.
    assert clean == {1, 3, 4, 6}


def test_corpus_pipeline_decontaminate(corpus, spark):
    bench = spark.createDataFrame(
        [(100, "catalyst execution plans here are completely different words about spark")],
        "doc_id long, text string",
    )
    cfg = default_corpus_config()
    cfg["min_tokens"] = 6
    cfg["neardup"] = {"enable": False}
    cfg["decontaminate"] = {"enable": True, "k": 5}
    out = run_corpus_pipeline(corpus, cfg, benchmark=bench)
    clean = {r["doc_id"] for r in out["clean"].collect()}
    # doc 4 shares 5-grams with the benchmark text -> dropped.
    assert 4 not in clean and 1 in clean

    with pytest.raises(ValueError, match="benchmark"):
        run_corpus_pipeline(corpus, cfg)


def test_corpus_pipeline_on_real_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    cfg = default_corpus_config()
    cfg["neardup"] = {"enable": True, "k": 3, "threshold": 0.8, "max_bucket": 10**6}
    out = run_corpus_pipeline(docs, cfg)
    n_in = docs.count()
    n_clean = out["clean"].count()
    assert 0 < n_clean <= n_in
    # Cleaned output keeps the annotation columns and the original ids.
    assert {"lang", "quality", "n_tokens"} <= set(out["clean"].columns)
