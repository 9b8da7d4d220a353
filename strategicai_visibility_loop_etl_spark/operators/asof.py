"""As-of (most-recent-match) join — an operator Spark lacks natively.

``asof_join(left, right, key, left_ts, right_ts)`` attaches to every
left row the right row with the greatest ``right_ts`` ≤ ``left_ts``
within the same key (the time-series "last known value" join; DuckDB's
ASOF JOIN is the SQL twin used as the oracle).

Spark-first design — the union-sort-carry shape, NOT a range join:
tag both sides, union by name, and carry the latest right ROW (as one
struct) with ``last(…, ignorenulls=True)`` over a window partitioned
by key and ordered by (ts, side) — right rows sort before left rows at
equal timestamps so an exact-tie match is visible to the left row.
One shuffle on the key, one sort within partitions; no inequality
join (which Catalyst would execute as a broadcast-nested-loop at
O(n·m) per key).

Scale notes: the window is ``rowsBetween(unboundedPreceding,
currentRow)`` with ``last`` — Spark evaluates it in one streaming pass
per partition holding one row of state. Carrying the right row as a
single struct keeps "latest row wins" semantics even when individual
right columns are null. Skewed keys (one key dominating) should be
pre-split by time range before this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row + the latest right row's values
    at-or-before its timestamp (null columns when nothing precedes)."""
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]

    r_struct = F.struct(*[F.col(c) for c in right_value_cols])
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    )
    l_tag = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
    )

    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__r_last", F.last("__r", ignorenulls=True).over(w))
    return carried.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__r_last.{c}").alias(c) for c in right_value_cols],
    )
