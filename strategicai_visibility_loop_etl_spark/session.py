"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set fleet-wide on a real cluster:
AQE on (runtime re-planning, skew-join handling, partition coalescing),
shuffle partitions sized to cores rather than the 200 default, Arrow on
for the few pandas-UDF boundaries, UTC session timezone so results are
comparable against UTC-naive oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "strategicai_visibility_loop_etl_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or "0") or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def register_views(spark: SparkSession, data_dir: str, tables: list[str] | None = None) -> list[str]:
    """Register each ``<data_dir>/<name>.parquet`` as a temp view so the
    whole engine is reachable through plain ``spark.sql(...)`` — the
    SQL front door next to the DataFrame one. Returns the view names.

    Views are lazy metadata: no data is read until a query runs, and
    every registered query (and any ad-hoc SQL) then benefits from the
    same Catalyst pushdown/pruning as the DataFrame API.
    """
    import glob
    import os as _os

    if tables is None:
        tables = sorted(
            _os.path.splitext(_os.path.basename(p))[0]
            for p in glob.glob(_os.path.join(data_dir, "*.parquet"))
        )
    for t in tables:
        spark.read.parquet(_os.path.join(data_dir, f"{t}.parquet")).createOrReplaceTempView(t)
    return list(tables)
