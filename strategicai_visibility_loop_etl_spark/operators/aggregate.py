"""Per-key collapse of fact sources (reference etl_merge.py:658-710).

Both aggregations are single hash-aggregate shuffles on the join key —
map-side partial aggregation means the shuffle carries one row per
(partition, key), and because the downstream merge joins on the same
key, AQE can reuse the exchange. At 100 TB the weighted mean costs
nothing extra: sum(x*w) and sum(w) ride the same shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def weighted_mean(
    value: Column, weight: Column, neutral_weight: float = 1.0, exact: bool = False
) -> Column:
    """sum(v*w)/sum(w) with a neutral weight when w is NULL or <= 0.

    Mirrors the reference's impressions-weighted position
    (etl_merge.py:677-693): rows with zero/missing weight still count,
    with weight ``neutral_weight``.

    ``exact=True`` routes both sums through DECIMAL(38,6): decimal
    addition is exact and order-independent, so the result is
    bit-identical regardless of partitioning (and matches a SQL oracle
    computing the same casts). Costs ~2× on the aggregate — use it
    when reproducibility across runs/engines matters more than raw
    throughput.
    """
    w = F.when(weight.isNotNull() & (weight > 0), weight).otherwise(F.lit(neutral_weight))
    if exact:
        num = F.sum((value * w).cast("decimal(38,6)")).cast("double")
        den = F.sum(w.cast("decimal(38,6)")).cast("double")
        return F.when(den > 0, num / den)
    num = F.sum(value * w)
    # Denominator sums w over ALL rows — the reference's w_sum
    # (etl_merge.py:688-693) counts null-value rows' weights too.
    den = F.sum(w)
    return F.when(den > 0, num / den)


def agg_gsc(gsc: DataFrame, key: str = "url") -> DataFrame:
    """Collapse GSC rows to one per URL: sum clicks/impressions,
    impressions-weighted mean position, recomputed ctr."""
    out = gsc.groupBy(key).agg(
        F.sum("clicks").alias("clicks"),
        F.sum("impressions").alias("impressions"),
        weighted_mean(F.col("position"), F.col("impressions")).alias("position"),
    )
    return out.withColumn(
        "ctr",
        F.when(F.col("impressions") > 0, F.col("clicks") / F.col("impressions")),
    )


def agg_ga4(ga4: DataFrame, key: str = "url") -> DataFrame:
    """Collapse GA4 rows to one per URL by summing every numeric metric."""
    num_cols = [c for c, t in ga4.dtypes if c != key and t in ("double", "float", "bigint", "int", "long")]
    return ga4.groupBy(key).agg(*[F.sum(c).alias(c) for c in num_cols])
