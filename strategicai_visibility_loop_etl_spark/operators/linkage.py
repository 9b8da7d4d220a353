"""Fuzzy record linkage / entity resolution: token blocking + edit
distance.

The duplicate-listing problem the visibility domain hits constantly —
the same product/page appearing under slightly different names
("cold widget" / "cld widget" / "cold  widget") — and the
entity-resolution shape a training-data pipeline needs for metadata
tables (author names, site titles, product catalogs). Reference has
no analog (its dedup is URL-exact); this generalizes the dedup family
(SURVEY §2 rows 28-32) from text shingles to short-string edit
distance.

Scale shape: candidate generation is TOKEN BLOCKING over an inverted
index — two records become a candidate pair iff they share ≥1
non-hot token — so the corpus never self-joins all-pairs; the
verification (`levenshtein`) runs only on candidates and is
JVM-codegen (no UDF anywhere). Hot tokens (shared by more than
``max_block`` records) are dropped from blocking via the same
data-driven skew guard as the LSH family (``resolve_max_bucket``) —
a stopword-like token ("widget") otherwise makes one block
quadratic. A pair whose EVERY shared token is hot is missed, exactly
like a hot-shingle pair in ``ngram_jaccard_pairs``; the guard's cap
is data-driven and documented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import round_c


def fuzzy_match_pairs(
    df: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    max_dist: int = 2,
    min_sim: float = 0.8,
    max_block: int | str = "auto",
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, dist, similarity) for every pair
    sharing a non-hot blocking token with edit distance ≤ ``max_dist``
    AND normalized similarity ≥ ``min_sim``.

    - normalize: lower, trim, collapse internal whitespace — the
      canonical string both the blocking and the distance see.
    - block: explode DISTINCT tokens per record, drop tokens held by
      more than ``max_block`` records (data-driven ``"auto"`` cap via
      ``resolve_max_bucket``), self-join the inverted index on token
      with ``id_a < id_b``, collapse multi-token co-candidates with a
      grouped count (a pure hash aggregate, no DISTINCT sort).
    - verify: join the (id, norm) spine back on both sides (ids only
      travel through the blocking shuffle, never the strings), then
      ``levenshtein`` + ``similarity = 1 − dist/greatest(|a|,|b|)``,
      both engine-portable expressions (DuckDB's levenshtein is the
      same classic DP), similarity through ``round_c``.

    Null/empty names can't block (no tokens) and drop out, as in the
    shingle family. At 100 TB: the inverted index is the only
    corpus-wide shuffle; blocks are bounded by the cap, candidates by
    Σ_block C(n,2), and verification is candidate-sized.
    """
    from .dedup import resolve_max_bucket  # noqa: PLC0415 (sibling module)

    norm = F.lower(F.trim(F.regexp_replace(F.col(name_col), r"\s+", " ")))
    spine = df.select(F.col(id_col).alias("id"), norm.alias("norm")).filter(
        F.col("norm").isNotNull() & (F.col("norm") != "")
    )
    toks = spine.select(
        "id", F.explode(F.array_distinct(F.split(F.col("norm"), " "))).alias("tok")
    )

    posting_sizes = toks.groupBy("tok").agg(F.count("*").alias("n"))
    cap = resolve_max_bucket(posting_sizes, max_block)
    hot = posting_sizes.filter(F.col("n") > cap)
    pruned = toks.join(F.broadcast(hot.select("tok")), "tok", "left_anti")

    a = pruned.select(F.col("tok"), F.col("id").alias("id_a"))
    b = pruned.select(F.col("tok"), F.col("id").alias("id_b"))
    cand = (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__shared_toks"))
        .select("id_a", "id_b")
    )

    na = spine.select(F.col("id").alias("id_a"), F.col("norm").alias("name_a"))
    nb = spine.select(F.col("id").alias("id_b"), F.col("norm").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    sim = F.lit(1.0) - dist.cast("double") / F.greatest(
        F.length("name_a"), F.length("name_b"), F.lit(1)
    ).cast("double")
    return (
        cand.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("dist", dist.cast("int"))
        .withColumn("similarity", round_c(sim, 6))
        .filter((F.col("dist") <= max_dist) & (F.col("similarity") >= min_sim))
        .select("id_a", "id_b", "name_a", "name_b", "dist", "similarity")
    )


def blocking_quality(
    records: DataFrame,
    truth_pairs: DataFrame,
    id_col: str = "id",
    key_col: str = "block_key",
    max_block: int = 100_000,
) -> DataFrame:
    """Blocking-scheme evaluation (Christen 2012 ch.7): one row of
    the three standard metrics a linkage pipeline reads before
    trusting a blocking key at corpus scale —

    - ``reduction_ratio`` = 1 − |candidates| / C(N,2): how much of
      the all-pairs quadratic the key eliminated;
    - ``pairs_completeness`` = recall of ground-truth matches inside
      the candidate set (a truth pair outside it can NEVER be linked);
    - ``pairs_quality`` = precision — truth pairs per candidate.

    ``records`` may carry MULTIPLE keys per id (multi-key blocking);
    candidate pairs are the DISTINCT co-blocked (a < b) pairs.
    Blocks larger than ``max_block`` are excluded from pair
    generation (the LSH hot-bucket guard — one stopword block is
    otherwise quadratic) and surfaced in ``oversize_blocks``; the
    metrics then describe the GUARDED scheme, which is what runs.

    Counts stay exact integers; the three ratios are IEEE-double
    divisions at the end through ``round_c``.  Shape: one key-keyed
    self-join bounded by the guard, hash aggregates, two broadcast
    1-row frames; truth containment is a broadcast-able semi-join on
    the canonicalized pair.
    """
    ids = records.select(F.col(id_col).alias("i")).distinct()
    keyed = records.select(
        F.col(key_col).alias("k"), F.col(id_col).alias("i")
    ).distinct()
    sizes = keyed.groupBy("k").agg(F.count("*").alias("c"))
    ok_keys = sizes.filter(F.col("c") <= max_block).select("k")
    kept = keyed.join(ok_keys, "k")
    cand = (
        kept.alias("a")
        .join(kept.alias("b"), "k")
        .filter(F.col("a.i") < F.col("b.i"))
        .select(F.col("a.i").alias("id_a"), F.col("b.i").alias("id_b"))
        .distinct()
    )
    truth = (
        truth_pairs.select(
            F.least(F.col("id_a"), F.col("id_b")).alias("id_a"),
            F.greatest(F.col("id_a"), F.col("id_b")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .distinct()
    )
    g_n = ids.agg(F.count("*").alias("n_records"))
    g_c = cand.agg(F.count("*").alias("candidate_pairs"))
    g_t = truth.agg(F.count("*").alias("truth_pairs"))
    g_cov = (
        truth.join(cand, ["id_a", "id_b"], "left_semi")
        .agg(F.count("*").alias("truth_covered"))
    )
    g_over = sizes.filter(F.col("c") > max_block).agg(
        F.count("*").alias("oversize_blocks")
    )
    n_d = F.col("n_records").cast("double")
    total = n_d * (n_d - F.lit(1.0)) / F.lit(2.0)
    cand_d = F.col("candidate_pairs").cast("double")
    return (
        g_n.crossJoin(F.broadcast(g_c))
        .crossJoin(F.broadcast(g_t))
        .crossJoin(F.broadcast(g_cov))
        .crossJoin(F.broadcast(g_over))
        .select(
            "n_records",
            "candidate_pairs",
            "truth_pairs",
            "truth_covered",
            "oversize_blocks",
            round_c(F.lit(1.0) - cand_d / total, 6).alias("reduction_ratio"),
            round_c(
                F.col("truth_covered").cast("double")
                / F.col("truth_pairs").cast("double"),
                6,
            ).alias("pairs_completeness"),
            round_c(
                F.col("truth_covered").cast("double") / cand_d, 6
            ).alias("pairs_quality"),
        )
    )


def golden_record(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    ts_col: str = "ts",
    attr_cols: list[str] | None = None,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Survivorship consolidation — the step AFTER matching that every
    entity-resolution pipeline needs: matched pairs (from
    :func:`fuzzy_match_pairs` or any dedup family member) collapse
    into entities via connected components, and each entity emits ONE
    golden row where every attribute is the LATEST NON-NULL value
    across the entity's records (ties on ``ts_col`` break by max
    ``id_col`` — a total order, so the output is
    partitioning-deterministic).

    Output: (entity_id = min member id, n_records, <attr_cols...>).
    Records that appear in no pair are singleton entities and pass
    through unchanged. NULL-only attributes stay NULL (visible as
    missing, never fabricated — the winsorize/ks_test convention).

    Scale shape: components over the PAIR graph only (near-dup pair
    volume, not corpus volume), one broadcast-able id→entity map
    joined to the record spine, then ONE hash aggregate with
    ``max_by(attr, (ts, id)) FILTER (attr IS NOT NULL)`` per attribute
    — no window, no per-entity explode. DuckDB replays with
    ``arg_max(...) FILTER``.
    """
    from .clusters import connected_components  # noqa: PLC0415

    if attr_cols is None:
        attr_cols = [
            c for c in records.columns if c not in (id_col, ts_col)
        ]
    comp = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "id", id_col
    )
    tagged = records.join(comp, id_col, "left").withColumn(
        "__entity", F.coalesce(F.col("component"), F.col(id_col))
    )

    def _bq(name: str) -> str:
        # backquote an identifier for F.expr (doubling embedded
        # backticks, the Spark escape) so column names with spaces,
        # dashes or reserved words parse as identifiers, never as
        # expressions
        inner = name.replace("`", "``")
        return f"`{inner}`"

    ord_expr = f"struct({_bq(ts_col)}, {_bq(id_col)})"
    aggs = [
        F.min(id_col).alias("entity_id_min"),
        F.count(F.lit(1)).alias("n_records"),
    ] + [
        F.expr(
            f"max_by({_bq(c)}, {ord_expr}) FILTER (WHERE {_bq(c)} IS NOT NULL)"
        ).alias(c)
        for c in attr_cols
    ]
    return (
        tagged.groupBy("__entity")
        .agg(*aggs)
        .select(
            F.col("entity_id_min").alias("entity_id"),
            "n_records",
            *attr_cols,
        )
    )
