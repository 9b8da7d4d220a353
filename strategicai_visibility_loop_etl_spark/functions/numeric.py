"""Numeric coercion helpers as native column expressions.

Re-expresses reference etl_merge.py:285-312 (``to_float_nocomma``,
``to_int``, ``normalize_ctr``). Casting a non-numeric string yields
NULL in Spark, matching pandas ``errors="coerce"``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def round_c(col: Column, n: int) -> Column:
    """round(x, n) on a double with C-library semantics, matching
    engines (DuckDB, C++/Rust analytics cores) that implement it as
    ``round(x * 10^n) / 10^n``.

    Spark's round/bround instead round the double's shortest decimal
    repr, and the two families disagree whenever ``x * 10^n`` lands
    exactly on a .5 boundary (or the repr straddles one). Routing
    through the same multiply makes every step IEEE-identical:
    ``F.round(y, 0)`` equals C's ``round(y)`` for every |y| < 2^53
    (exact at .5 ties, away from zero, no internal scaling). Use this
    for any rounded double that must hash-match a non-JVM engine."""
    p = F.lit(float(10**n))
    return F.round(col * p, 0) / p


def to_double_nocomma(col: Column) -> Column:
    """Parse floats while tolerating thousands separators ('1,234.5').

    ``try_cast``, not ``cast``: Spark 4 runs ANSI mode by default, where
    a malformed string cast THROWS. The reference's pandas
    ``errors="coerce"`` semantics require null-on-failure.
    """
    return F.trim(F.regexp_replace(col.cast("string"), ",", "")).try_cast("double")


def to_long(col: Column) -> Column:
    """Integer coercion with null-on-failure (pandas Int64 analog)."""
    # Via double first so "12.0" and "1,2" behave like pd.to_numeric.
    return to_double_nocomma(col).try_cast("long")


def normalize_ctr(df: DataFrame, ctr_col: str, out_col: str | None = None) -> DataFrame:
    """Normalize a CTR column to a fraction, reference-heuristic style.

    Reference etl_merge.py:295-312: strip '%'/','; divide by 100 when a
    percent sign appears anywhere OR the majority of parsed values fall
    in (1, 100].

    The "did we see a percent sign / majority in (1,100]" decision is a
    GLOBAL property of the column, so this is a two-pass plan: a scalar
    aggregate (single reduce, map-side partial agg) broadcast back via a
    1-row cross join. At 100 TB that is one cheap extra pass — never a
    window over an unpartitioned dataset.
    """
    out_col = out_col or ctr_col
    s = F.col(ctr_col).cast("string")
    cleaned = F.trim(F.regexp_replace(F.regexp_replace(s, "%", ""), ",", ""))
    vals = cleaned.try_cast("double")

    # The majority fraction counts unparseable rows in the denominator —
    # the reference's ((vals>1)&(vals<=100)).mean() treats NaN compares
    # as False over the full column length.
    stats = df.select(
        F.max(F.when(s.contains("%"), F.lit(1)).otherwise(F.lit(0))).alias("__saw_pct"),
        F.avg(
            F.when(vals.isNotNull() & (vals > 1.0) & (vals <= 100.0), F.lit(1)).otherwise(F.lit(0))
        ).alias("__frac_pctish"),
    )

    joined = df.withColumn("__ctr_val", vals).crossJoin(F.broadcast(stats))
    scaled = F.when(
        (F.col("__saw_pct") == 1) | (F.col("__frac_pctish") > 0.5),
        F.col("__ctr_val") / 100.0,
    ).otherwise(F.col("__ctr_val"))
    return joined.withColumn(out_col, scaled).drop("__ctr_val", "__saw_pct", "__frac_pctish")
