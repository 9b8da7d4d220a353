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


def rolling_zscore_anomalies(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    window: int = 7,
    z_threshold: float = 3.0,
    min_periods: int = 4,
    out_decimals: int = 6,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each point scored
    against the mean/std of the PRECEDING ``window`` points (the
    current point excluded — no self-masking), flagged when
    |z| > ``z_threshold``. The standard metrics-monitoring shape
    (traffic spikes, crawl anomalies, pipeline regressions).

    Engine-exactness: ``y_col`` must be DECIMAL — rolling mean and
    variance come from exact rolling sums (Σy, Σy², n) via the
    frame window, then the closed form var = (n·Σy² − (Σy)²)/(n(n−1));
    nothing depends on the engine's incremental-variance algorithm
    (Welford vs naive differ in low bits), only the final z passes
    through double. z is NULL (and the row unflagged) with fewer than
    ``min_periods`` history points or zero variance.

    One shuffle (the per-key window); frames are ROWS-based over the
    observed points in ``x_col`` order, so gaps don't change the
    window population — both the Spark plan and the SQL replay agree
    row for row.
    """
    y = F.col(y_col).cast("decimal(28,6)")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(x_col))
        .rowsBetween(-window, -1)
    )
    n = F.count(y).over(w)
    sy = F.sum(y).over(w)
    syy = F.sum(y * y).over(w)
    den = (n * syy - sy * sy).cast("decimal(38,12)")
    ok = (n >= min_periods) & (den > 0)
    mean = sy.cast("double") / n.cast("double")
    var = den.cast("double") / (n * (n - 1)).cast("double")
    z = F.when(
        ok,
        F.round(
            (F.col(y_col).cast("double") - mean) / F.sqrt(var), out_decimals
        ),
    )
    return df.select(
        *key_cols,
        F.col(x_col),
        F.col(y_col),
        n.cast("long").alias("n_history"),
        z.alias("z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )
