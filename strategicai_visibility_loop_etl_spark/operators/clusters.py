"""Near-duplicate cluster formation: connected components over a pair
graph.

The dedup family emits PAIRS (exact digests, MinHash/SimHash/Jaccard
candidates); a training-data pipeline needs CLUSTERS — "keep one doc
per component of the similarity graph". Components are computed by
min-label propagation: every node starts labeled with its own id, and
each round takes the min of its own and its neighbors' labels. The
label of a component's minimum node floods outward one hop per round,
so convergence takes O(graph diameter) rounds — near-dup graphs are
shallow (dup clusters are cliques or short chains), so a handful.

Scale shape: each round is one join + one aggregate, both shuffling on
node id — the same partitioning every round, which AQE/exchange reuse
co-locates. ``localCheckpoint`` truncates the lineage each round so
the plan doesn't grow with iterations (the classic iterative-algorithm
footgun). The per-round convergence count is a scalar action, not a
collect of the frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def collapse_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Exact-duplicate pre-collapse for near-dup clustering:
    ``(representatives, star_edges)``.

    Crawl corpora are 30-50% byte-identical pages; running shingle-based
    candidate generation on them wastes the whole inverted index on
    jaccard-1 pairs (every posting doubles, every dup pair meets in
    EVERY shared shingle). Collapsing first costs one narrow shuffle on
    a 64-hex digest and turns each exact group into O(n) star edges
    (member → group-min) instead of O(n²) posting work.

    Component equivalence with the uncollapsed graph: identical
    normalized texts have identical shingle sets, so jaccard is a
    function of the representative — every cross-group edge survives via
    the rep pair, every in-group edge is replaced by stars to the same
    rep, and the reachable-min label of every node is unchanged.

    ``min_tokens`` must match the shingle width ``k`` of the pair
    generator run on the representatives: docs with fewer tokens have no
    shingles, hence no edges in the pair graph, and must not be pulled
    into components by a star edge either.
    """
    norm = normalized_text(F.coalesce(F.col(text_col), F.lit("")))
    t = df.select(
        F.col(id_col),
        F.col(text_col),
        F.sha2(norm, 256).alias("__key"),
        F.when(norm == "", 0).otherwise(F.size(F.split(norm, " "))).alias("__n"),
    ).filter(F.col("__n") >= min_tokens)
    t = t.withColumn("__rep", F.min(id_col).over(Window.partitionBy("__key")))
    reps = t.filter(F.col(id_col) == F.col("__rep")).select(id_col, text_col)
    stars = t.filter(F.col(id_col) != F.col("__rep")).select(
        F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b")
    )
    return reps, stars


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) for every node in ``edges``; component = min node
    id reachable through the undirected pair graph.

    Raises if the propagation hasn't converged after ``max_iter``
    rounds (a component with diameter > max_iter — degenerate for
    near-dup graphs and worth failing loudly on).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionAll(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        neigh = (
            sym.join(
                labels.select(F.col("id").alias("b"), F.col("component").alias("nc")),
                "b",
            )
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("nc").alias("nmin"))
        )
        updated = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.col("nmin") < F.col("component")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("__changed")).count()
        labels = updated.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(pathologically deep component?)"
    )


def cluster_representatives(
    df: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep one row per near-dup cluster: the component's min id wins;
    rows not in any component (no near-dup edges) keep themselves."""
    joined = df.join(
        components.select(F.col("id").alias(id_col), "component"), id_col, "left"
    )
    return joined.filter(
        F.col("component").isNull() | (F.col(id_col) == F.col("component"))
    ).drop("component")
