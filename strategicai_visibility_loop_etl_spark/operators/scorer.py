"""Hashed n-gram linear text scorer (the fastText shape).

fastText-style quality/topic classification (Joulin et al. 2016, "Bag
of Tricks for Efficient Text Classification") over this engine's
relational primitives: documents become bags of HASHED features (word
unigrams, word bigrams, boundary-marked char n-grams — hashing trick,
fixed bucket count), the model is a model-sized (bucket, weight)
table, and a document's score is the mean weight of its features — a
linear classifier. The lang-ID marker-word heuristic
(``functions/text.py:97``) stays as the zero-setup fallback; this is
the trained upgrade path.

Training here is naive-Bayes log-odds (add-one smoothing): weight(b) =
ln P(b|pos) − ln P(b|neg) — the classic linear-model closed form that
needs exactly two hash aggregates, no gradient loop. Any externally
trained weight table with the same (bucket, weight) schema drops in.

Scale shape: features hash map-side with the engine's portable
polynomial hash (same fold the q20 oracle replays — NOT xxhash, so
any SQL engine can recompute it); training is one explode + per-bucket
conditional aggregate; scoring is one explode + hash join against the
weight table (AQE broadcasts it — it is at most ``n_buckets`` rows)
+ a per-doc aggregate whose exchange carries map-side partials.
Weights round to DECIMAL before the per-doc sum (the unigram-LM
trick), so scores are order-independent and engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

_FP_BASE = 31
_FP_MOD = 1_000_000_007


def _poly_hash(s: Column) -> Column:
    """(acc·31 + codepoint) mod 1e9+7 folded over the characters —
    bit-identical to ``fingerprint64``'s fold and its SQL replay."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(_FP_BASE) + F.ascii(ch)) % F.lit(_FP_MOD),
    )


def hashed_features(
    col: Column, n_buckets: int = 1 << 18, char_n: int = 3
) -> Column:
    """array<long> of feature bucket ids: word unigrams + adjacent word
    bigrams + char ``char_n``-grams of each ``<``boundary-marked``>``
    word, each hashed into ``n_buckets``. Pure higher-order
    expressions — no shuffle, no Python."""
    b = F.lit(n_buckets)
    words = tokens(col)
    nw = F.size(words)
    uni = F.transform(words, lambda w: _poly_hash(w) % b)
    big_idx = F.when(nw >= 2, F.sequence(F.lit(1), nw - 1)).otherwise(
        F.array().cast("array<int>")
    )
    big = F.transform(
        big_idx,
        lambda i: _poly_hash(
            F.concat_ws(" ", F.element_at(words, i), F.element_at(words, i + 1))
        )
        % b,
    )
    marked = F.transform(words, lambda w: F.concat(F.lit("<"), w, F.lit(">")))
    chars = F.flatten(
        F.transform(
            marked,
            lambda m: F.transform(
                F.sequence(F.lit(1), F.length(m) - F.lit(char_n - 1)),
                lambda i: _poly_hash(F.substring(m, i, char_n)) % b,
            ),
        )
    )
    return F.concat(uni, big, chars)


def train_hashed_scorer(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    char_n: int = 3,
    logw_decimals: int = 6,
    stage_path: str | None = None,
) -> DataFrame:
    """Learn the (bucket, w) weight table from boolean/0-1 labels:
    naive-Bayes log-odds with add-one smoothing over ``n_buckets``
    virtual vocabulary slots. Returns DataFrame (bucket long,
    w decimal) — model-sized, at most ``n_buckets`` rows."""
    feats = df.select(
        F.col(label_col).cast("int").alias("__y"),
        F.explode(
            hashed_features(
                F.coalesce(F.col(text_col), F.lit("")), n_buckets, char_n
            )
        ).alias("bucket"),
    )
    agg = feats.groupBy("bucket").agg(
        F.sum("__y").alias("__pos"),
        (F.count("*") - F.sum("__y")).alias("__neg"),
    )
    if stage_path is not None:
        agg.write.mode("overwrite").parquet(stage_path)
        agg = df.sparkSession.read.parquet(stage_path)
    tot = agg.agg(
        F.sum("__pos").alias("__tp"), F.sum("__neg").alias("__tn")
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log(
                (F.col("__pos") + 1).cast("double")
                / (F.col("__tp") + F.lit(n_buckets)).cast("double")
            )
            - F.log(
                (F.col("__neg") + 1).cast("double")
                / (F.col("__tn") + F.lit(n_buckets)).cast("double")
            ),
            logw_decimals,
        )
        .cast(f"decimal(18,{logw_decimals})")
        .alias("w"),
    )


def hashed_scorer_scores(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1 << 18,
    char_n: int = 3,
) -> DataFrame:
    """Score documents with a (bucket, w) table: mean feature weight,
    positive ⇒ the positive class. Buckets absent from the table
    contribute 0 (train and score on the same bucket space to avoid
    that; the default only fires on features unseen in training).
    Returns (id_col, n_features, score, pred); docs with no features
    (empty/null text) score NULL, pred false."""
    feats = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            hashed_features(
                F.coalesce(F.col(text_col), F.lit("")), n_buckets, char_n
            )
        ).alias("bucket"),
    )
    dec = weights.schema["w"].dataType.simpleString()
    scored = (
        feats.join(weights, "bucket", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_features"),
            F.sum(F.coalesce(F.col("w"), F.lit(0).cast(dec))).alias("__sw"),
        )
    )
    # + 0.0 canonicalizes IEEE negative zero (a tiny negative sum that
    # rounds to zero must not hash-differ from +0.0 across engines)
    score = F.round(
        F.col("__sw").cast("double") / F.col("n_features"), 6
    ) + F.lit(0.0)
    out = scored.select(
        F.col("id").alias(id_col),
        F.col("n_features").cast("long").alias("n_features"),
        score.alias("score"),
        (score > 0).alias("pred"),
    )
    base = df.select(F.col(id_col)).distinct()
    return base.join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
        "score",
        F.coalesce("pred", F.lit(False)).alias("pred"),
    )
