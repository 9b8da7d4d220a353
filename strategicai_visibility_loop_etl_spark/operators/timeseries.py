"""Time-series regularization: resample an event stream onto a dense
per-key daily grid with forward-fill.

The reference pipeline is snapshot-based; a visibility engine tracking
metrics over time needs the classic gap-fill shape — turn irregular
events into a regular series so downstream window math (moving
averages q33, retention q62) sees no holes. Pandas spells it
``resample('D').ffill()``; the Spark-first form below is a sequence
explode plus one ``last(ignorenulls)`` running window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def resample_daily_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Dense daily series per key with forward-filled values:
    (key, day, value, is_gap) for every day in the key's observed
    span — gap days carry the last observed day's value and
    ``is_gap = true``.

    Per-(key, day) totals sum through DECIMAL so the value is
    identical under any partition/merge order (cross-engine exact,
    like every other money-typed sum in this engine). The dense grid
    is ``sequence(min_day, max_day)`` exploded per key — generated,
    never shuffled in — and the fill is one ``last(value, ignorenulls)``
    running window over the key's days: one shuffle on the key, state
    bounded by the span length. At 100 TB the explode output is
    O(keys × span-days), the size the dense result inherently is; no
    stage materializes more than that.
    """
    day = F.to_date(F.col(ts_col))
    daily = df.groupBy(F.col(key_col), day.alias("day")).agg(
        F.sum(F.col(value_col).cast(_DEC)).alias("day_value")
    )
    span = daily.groupBy(key_col).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        key_col, F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, [key_col, "day"], "left")
        .select(
            key_col,
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("value"),
            F.col("day_value").isNull().alias("is_gap"),
        )
    )
