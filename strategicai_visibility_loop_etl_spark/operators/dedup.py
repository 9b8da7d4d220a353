"""Deduplication operators for training-data pipelines.

Four families, all shuffle-aware:

- **Exact** — hash-groupBy on a content digest. One shuffle on the
  digest; at 100 TB the digest (32 B) shuffles, never the document.
- **Fingerprint** — same shape with a rolling-hash fingerprint.
- **N-gram Jaccard** — inverted-index candidate generation (explode
  shingles → self-join on shingle) + exact Jaccard verification on the
  candidate pairs only. Never an O(n²) cross join.
- **MinHash + LSH** — k minhashes from seeded xxhash64 over shingles,
  banded; candidates share a (band, band-hash) bucket. Probability a
  pair with Jaccard s becomes a candidate: 1-(1-s^r)^b.
- **SimHash** — 64-bit bitwise-majority of token hashes; near-dups are
  small Hamming distance; bucketing on 16-bit chunks finds all pairs
  within distance 3 (pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint64, normalized_text, shingles, tokens


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One representative row (min id) per distinct normalized text.

    Returns (digest, keep_id, n_dups). Only the 64-hex digest + id ride
    the shuffle.
    """
    digest = F.sha2(normalized_text(F.col(text_col)), 256)
    return (
        df.select(digest.alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def dedup_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by rolling-hash fingerprint (cheap, collision-tolerant tier)."""
    return (
        df.select(fingerprint64(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs with word-k-gram Jaccard ≥ threshold.

    Candidate generation via inverted index: explode distinct shingles,
    self-join on the shingle, distinct pairs — so only documents that
    share at least one shingle are ever compared. Hot shingles (shared
    by > max_bucket docs) are dropped from candidate generation (they
    contribute pairs that other, rarer shingles will still surface for
    truly similar docs) — the standard skew guard.
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")
    ).filter(F.size("sh") > 0)

    exploded = sh.select("id", F.explode("sh").alias("g"))
    # Skew guard: drop HOT shingles (shared by > max_bucket docs). Only
    # the hot set — small by construction — is broadcast; broadcasting
    # the full shingle vocabulary would OOM the driver at corpus scale.
    hot = exploded.groupBy("g").agg(F.count("*").alias("n")).filter(F.col("n") > max_bucket)
    pruned = exploded.join(F.broadcast(hot.select("g")), "g", "left_anti")

    a = pruned.alias("a")
    b = pruned.alias("b")
    cand = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sh_a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("double"))
        .withColumn(
            "union_", (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double")
        )
        .withColumn(
            "jaccard",
            F.when(F.col("union_") > 0, F.col("inter") / F.col("union_")).otherwise(F.lit(0.0)),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """(id, array<long> minhash signature). Hash i = min over shingles of
    xxhash64(shingle, seed=i) — seeded JVM-side hashes, no Python."""
    sh = shingles(F.col(text_col), k)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return (
        df.withColumn("__sh", sh)
        .filter(F.size("__sh") > 0)
        .select(F.col(id_col).alias("id"), sig.alias("sig"))
    )


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH, verified on signatures.

    rows-per-band r = num_hashes // bands. A pair lands in a candidate
    bucket iff some band of r minhashes matches exactly. Verification
    estimates Jaccard as the fraction of agreeing minhashes. Buckets
    larger than ``max_bucket`` are dropped (skew guard; a bucket that
    hot is near-identical boilerplate better handled by exact dedup).
    """
    r = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")
    ).filter(F.size("sh") > 0)
    sig_df = base.select(
        "id",
        F.array(
            *[
                F.array_min(F.transform(F.col("sh"), lambda s, i=i: F.xxhash64(s, F.lit(i))))
                for i in range(num_hashes)
            ]
        ).alias("sig"),
    )

    band_rows = sig_df.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice(F.col("sig"), b * r + 1, r),
                                    lambda v: v.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    sizes = band_rows.groupBy("band", "bh").agg(F.count("*").alias("n"))
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket)).select("band", "bh")
    pruned = band_rows.join(ok, ["band", "bh"])

    a = pruned.select("band", "bh", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = pruned.select("band", "bh", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")), lambda v: v == 1)
    ).cast("double") / F.lit(float(num_hashes))
    return (
        cand.withColumn("jaccard_est", F.round(est, 6))
        .filter(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def simhash64(text: Column) -> Column:
    """64-bit SimHash of whitespace tokens, as one aggregate expression.

    Fold token hashes into 64 signed counts (+1/-1 per bit), then
    assemble the sign bits into a BIGINT. Bit 63 lands in the sign bit —
    Java shift semantics keep it consistent across runs.
    """
    # Bit positions must be Python ints: F.shiftright/shiftleft take an
    # int numBits, not a Column — unroll the 64-bit loop driver-side.
    toks = tokens(text)
    counts = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    (F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
                    for i in range(64)
                ]
            ),
            lambda a, d: a + d,
        ),
    )
    bit_vals = F.zip_with(
        counts,
        F.array(*[F.shiftleft(F.lit(1).cast("long"), i) for i in range(64)]),
        lambda c, bit: F.when(c > 0, bit).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bit_vals, F.lit(0).cast("long"), lambda acc, v: acc + v)


def dedup_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 2000,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Pigeonhole bucketing: split the 64-bit hash into 4 × 16-bit chunks;
    any pair within distance 3 agrees exactly on ≥ 1 chunk, so
    candidates = pairs sharing (chunk_idx, chunk_value).
    """
    hashed = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("h")).filter(
        F.col("h").isNotNull()
    )
    chunks = hashed.select(
        "id",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("h"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "h", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))

    sizes = chunks.groupBy("ci", "cv").agg(F.count("*").alias("n"))
    ok = sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket)).select("ci", "cv")
    pruned = chunks.join(ok, ["ci", "cv"])

    a = pruned.select("ci", "cv", F.col("id").alias("id_a"), F.col("h").alias("h_a"))
    b = pruned.select("ci", "cv", F.col("id").alias("id_b"), F.col("h").alias("h_b"))
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
