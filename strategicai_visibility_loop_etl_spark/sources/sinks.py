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


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_mb: int = 256,
) -> int:
    """Rewrite a directory of (typically many small) parquet files into
    ~``target_mb``-sized files; returns the output file count.

    The nightly small-files compaction every long-lived ingest needs:
    streaming/micro-batch sinks accumulate thousands of KB-scale files
    and scan planning (file listing + footer reads + one task per tiny
    split) comes to dominate. Output file count = ceil(input bytes /
    target), sized from the Hadoop FS API (object-store safe — never
    ``os.listdir``); the rewrite is one round-robin repartition, no
    key assumption. For sort/cluster-aware layouts use
    ``write_bucketed`` instead — this keeps only sizes, not order.
    """
    import math

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    spark.read.parquet(in_path).repartition(n_files).write.mode("overwrite").parquet(out_path)
    out_p = jvm.org.apache.hadoop.fs.Path(out_path)
    statuses = fs.listStatus(out_p)
    return sum(
        1 for i in range(len(statuses)) if statuses[i].getPath().getName().endswith(".parquet")
    )
