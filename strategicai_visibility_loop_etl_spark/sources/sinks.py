"""Output sinks: partitioned / bucketed writes for shuffle-free reuse.

At 100 TB the win is not the write — it's every downstream join and
aggregation on the bucket key skipping its shuffle. ``write_bucketed``
persists a DataFrame as a bucketed table (sorted within buckets);
two tables bucketed on the same key × count join with NO exchange on
either side, and a groupBy on the key needs no shuffle at all.

Bucketed tables require the session catalog (``saveAsTable``); plain
``parquet(path)`` cannot carry bucket metadata. Partitioned writes
(``partition_cols``) compose: partition pruning eliminates files,
bucketing eliminates shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 64,
    partition_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally partitioned) table.

    ``num_buckets`` sizing: aim for buckets of 100-500 MB at the target
    scale — too few buckets caps join parallelism, too many makes small
    files. Data is sorted within buckets by the bucket key so
    merge-joins need no sort either.
    """
    writer = df.write.mode(mode).format("parquet")
    if path:
        writer = writer.option("path", path)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer = writer.bucketBy(num_buckets, *bucket_cols).sortBy(*bucket_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata flows into planning)."""
    return spark.table(table)
