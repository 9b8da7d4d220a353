"""Generic relational operators the reference exercises implicitly.

- ``top_n_per_group`` — window rank ≤ N per group key (SURVEY §2 row 12).
- ``union_sources`` — union of heterogeneous exports by column name
  (SURVEY row 14; the reference's multi-export merge use case,
  reference etl_merge.py:88-108 reads several export shapes of the
  same logical source).
- ``pivot_counts`` / ``conditional_agg`` — pivot / sum(when()) event
  breakdowns (SURVEY row 15).
- ``funnel_steps`` — ordered conversion funnel (earliest step-i event
  strictly after step i−1), one shuffle key for all stages.

Scale notes: top-N-per-group is ONE shuffle on the group key with the
rank evaluated streaming per partition — never a global sort. With a
known small N, Spark's WindowGroupLimit pushes the limit beneath the
shuffle (partial top-N map-side). ``pivot_counts`` requires an explicit
value list — letting Spark infer values adds a whole extra job and an
unbounded-width schema; at 100 TB the caller must name the columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: (user, t_1 … t_k) where ``t_i`` is
    the user's earliest ``steps[i]`` event strictly AFTER ``t_{i-1}``
    (NULL once a step is never reached — later steps stay NULL too).

    Each step is one hash aggregate + one co-partitioned join, all
    keyed on ``user_col``: after the first exchange every later stage
    reuses the same partitioning (AQE exchange reuse — the q40
    decorrelation pattern), so a k-step funnel costs one wide shuffle
    of the filtered events, not k. The strictly-after semantics makes
    the result independent of any secondary sort: ties on the same
    timestamp do not advance the funnel, so no engine-dependent
    within-timestamp order can change the answer.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(user_col, type_col, ts_col)
    reached = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    out = reached
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t_{i - 1}"
        reached = (
            ev.filter(F.col(type_col) == step)
            .join(reached.select(user_col, prev), user_col)
            .filter(F.col(ts_col) > F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{i}"))
        )
        out = out.join(reached.select(user_col, f"t_{i}"), user_col, "left")
    return out


def top_n_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    n: int,
    ascending: bool = False,
    rank_col: str = "rank",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-``n`` rows per group by ``order_col``.

    ``row_number`` (not rank/dense_rank) so output size is bounded at
    exactly n per group; ``tiebreak_cols`` make the cut deterministic —
    pass the group's natural key for reproducible (and oracle-matching)
    results.
    """
    ordering = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    ordering += [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*ordering)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def union_sources(frames: Sequence[DataFrame], source_names: Sequence[str] | None = None) -> DataFrame:
    """Union heterogeneous frames by column name, null-filling gaps.

    ``unionByName(allowMissingColumns=True)`` — the Spark analog of the
    reference's "merge several exports of the same logical source"
    flow: differing column sets align by name, missing columns become
    NULL. Optionally tags provenance with a ``source`` column.
    """
    if not frames:
        raise ValueError("union_sources needs at least one frame")
    tagged = []
    for i, f in enumerate(frames):
        if source_names is not None:
            f = f.withColumn("source", F.lit(str(source_names[i])))
        tagged.append(f)
    out = tagged[0]
    for f in tagged[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def pivot_counts(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    values: Sequence[str],
    agg: Column | None = None,
) -> DataFrame:
    """Pivot ``pivot_col`` into one column per value of ``values``.

    The explicit ``values`` list matters at scale: without it Spark runs
    an extra distinct-collect job and the schema width is data-driven.
    Default aggregate is count(*).
    """
    agg = agg if agg is not None else F.count(F.lit(1))
    return df.groupBy(group_col).pivot(pivot_col, list(values)).agg(agg)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salt-split hot keys (the skew-join pattern).

    The left side's rows scatter across ``salt`` sub-keys (deterministic
    pmod of a hash over the whole row, so the distribution is stable and
    even); the right side replicates each row into all ``salt`` sub-keys
    via a small explode. A key holding 30% of the data then occupies
    ``salt`` reducers instead of one. Result set is identical to a plain
    equi-join on ``key`` — use when AQE's skew-join split isn't enough
    (e.g. skewed *aggregation* feeding the join, or joins under
    ``spark.sql.adaptive.enabled=false``). Right side grows ×salt, so
    keep it the smaller input.

    Only inner/left joins are supported: the right side is replicated
    into every salt sub-key, so an unmatched right row under
    ``how="right"``/``"full"`` would surface ``salt`` times — a silent
    wrong answer. Salt the other input (or pre-aggregate) instead.
    """
    if how not in {"inner", "left", "left_outer"}:
        raise ValueError(
            f"salted_join supports how in {{'inner','left','left_outer'}}, got {how!r}: "
            "replicated right-side rows would duplicate unmatched rows "
            "under right/full outer joins"
        )
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_s = left.withColumn("__salt", salt_col.cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l_s.join(r_s, [key, "__salt"], how).drop("__salt")


def conditional_agg(
    df: DataFrame,
    group_col: str,
    cond_col: str,
    conditions: dict[str, Column],
) -> DataFrame:
    """sum(when(cond, x)) breakdown — the shuffle-free-wide alternative
    to pivot when conditions are arbitrary expressions, one hash
    aggregate, map-side partial agg."""
    aggs = [F.sum(F.when(cond, F.col(cond_col))).alias(name) for name, cond in conditions.items()]
    return df.groupBy(group_col).agg(*aggs)
