"""Similarity search over embedding columns (array<float>).

- ``knn_cosine_topk`` — exact brute-force top-k: broadcast the (small)
  query set against the corpus, cosine via native array expressions,
  per-query top-k through a window. This is the correctness baseline
  and the oracle target.
- ``ann_lsh_topk`` — the scale path: random-hyperplane LSH. Each vector
  gets a ``nbits``-bit signature from seeded deterministic hyperplanes;
  candidates share a signature bucket (multi-probe over bands), exact
  cosine re-ranks within buckets. At 100 TB the corpus is scanned once
  to signatures, and each query touches only its buckets.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def knn_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    Query side is broadcast (queries ≪ corpus); the corpus streams
    through one whole-stage-codegen'd projection. Per-query top-k uses
    row_number over (query, -cos) — with AQE this is a shuffle keyed on
    query_id, each reducer holding one query's scores.
    """
    q = queries.select(F.col(query_id), F.col(query_vec))
    joined = corpus.select(F.col(corpus_id), F.col(corpus_vec)).crossJoin(F.broadcast(q))
    scored = joined.select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(cosine_similarity(F.col(corpus_vec), F.col(query_vec)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (driver-side literals)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]


def _signature(vec_col, planes: list[list[float]]):
    """Bit b = 1 iff dot(vec, plane_b) >= 0; assembled into a BIGINT."""
    bits = []
    for b, plane in enumerate(planes):
        dot_b = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(x) for x in plane]),
                lambda v, p: v.cast("double") * p,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(dot_b >= 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for bc in bits[1:]:
        out = out + bc
    return out


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    nbits: int = 16,
    bands: int = 4,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    The ``nbits`` signature is split into ``bands``; a corpus vector is
    a candidate for a query iff they agree on at least one band
    (multi-probe recall boost without hamming-ball enumeration).
    """
    if dim is None:
        first = corpus.select(F.size(corpus_vec).alias("d")).first()
        dim = int(first["d"]) if first else 0
    planes = _hyperplanes(dim, nbits, seed)
    rbits = nbits // bands

    def band_cols(sig_col):
        return [
            F.shiftright(sig_col, b * rbits).bitwiseAND(F.lit((1 << rbits) - 1)).alias(f"band_{b}")
            for b in range(bands)
        ]

    c_sig = corpus.select(
        F.col(corpus_id), F.col(corpus_vec), _signature(F.col(corpus_vec), planes).alias("sig")
    )
    q_sig = queries.select(
        F.col(query_id), F.col(query_vec), _signature(F.col(query_vec), planes).alias("sig")
    )

    c_bands = c_sig.select(
        corpus_id,
        corpus_vec,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * rbits)
                        .bitwiseAND(F.lit((1 << rbits) - 1))
                        .alias("bv"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(corpus_id, corpus_vec, F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))

    q_bands = q_sig.select(
        query_id,
        query_vec,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * rbits)
                        .bitwiseAND(F.lit((1 << rbits) - 1))
                        .alias("bv"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(query_id, query_vec, F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))

    cand = (
        c_bands.join(F.broadcast(q_bands), ["band", "bv"])
        .select(query_id, corpus_id, corpus_vec, query_vec)
        .dropDuplicates([query_id, corpus_id])
    )
    scored = cand.select(
        F.col(query_id),
        F.col(corpus_id),
        F.round(cosine_similarity(F.col(corpus_vec), F.col(query_vec)), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
