"""BM25 full-text retrieval over the relational engine.

The lexical complement of the embedding ANN family
(``operators/similarity.py``): Okapi BM25 (Robertson & Zaragoza 2009)
re-expressed as three hash aggregates and one broadcast join — the
shape every search engine's batch scoring job takes on Spark.

Scale story: the posting table (doc, term, tf, dl) is ONE explode +
hash aggregate over the corpus and can be staged/reused across query
batches; document frequency and the average document length fold from
it map-side (model-sized); the query side is tiny and broadcast, so
scoring never shuffles the corpus — the only post-postings exchange
carries (query, doc, partial score) aggregates. Top-k per query is a
rank window over queries (thousands of rows), not documents.

Determinism contract (the repo's engine-exactness discipline): each
per-(query, doc, term) BM25 contribution rounds to DECIMAL(18,6)
before the per-pair sum, so scores are independent of join order and
partitioning, and DuckDB replays them bit-for-bit; ranking orders by
the rounded score with doc id as the total tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def document_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf, dl): term frequencies plus the document length
    (token count) every BM25 variant needs. One explode + one hash
    aggregate; stage the result to score many query batches."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "term"
        ),
    )
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("id").agg(F.sum("tf").alias("dl"))
    return tf.join(dl, "id")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query",
    query_id_col: str = "query_id",
    postings: DataFrame | None = None,
    stage_path: str | None = None,
) -> DataFrame:
    """Top-``k`` documents per query under Okapi BM25.

    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (always positive), term
    score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)). Returns
    (query_id_col, rank, id_col, score) — rank 1 is the best match;
    ties on the rounded score break by ascending document id.

    Pass ``postings`` (from ``document_postings``, possibly read back
    from parquet) to reuse an existing index; otherwise one is built
    and optionally staged at ``stage_path`` so corpus stats and the
    scoring join all read one materialization.
    """
    if postings is None:
        postings = document_postings(docs, text_col, id_col)
        if stage_path is not None:
            postings.write.mode("overwrite").parquet(stage_path)
            postings = docs.sparkSession.read.parquet(stage_path)

    # corpus stats fold from the postings: N, avgdl, df(term)
    nstats = (
        postings.groupBy("id")
        .agg(F.first("dl").alias("dl"))
        .agg(
            F.count("*").alias("__n"),
            (F.sum("dl") / F.count("*")).alias("__avgdl"),
        )
    )
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))

    qterms = queries.select(
        F.col(query_id_col).alias("qid"),
        F.explode(
            F.array_distinct(tokens(F.coalesce(F.col(query_col), F.lit(""))))
        ).alias("term"),
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl")
    )
    contrib = F.round(idf * tf * F.lit(k1 + 1.0) / norm, 6).cast(
        "decimal(18,6)"
    )

    # qterms is query-batch-sized: always broadcast. dfreq is
    # vocabulary-sized: no hint — AQE broadcasts it at small SF and
    # shuffles at web-corpus vocabulary scale.
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(nstats))
        .select("qid", "id", contrib.alias("__c"))
        .groupBy("qid", "id")
        .agg(F.sum("__c").alias("__s"))
    )
    win = Window.partitionBy("qid").orderBy(
        F.col("__s").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("rank").cast("int").alias("rank"),
            F.col("id").alias(id_col),
            F.col("__s").cast("double").alias("score"),
        )
    )
