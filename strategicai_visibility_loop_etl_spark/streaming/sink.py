"""Exactly-once streaming MERGE sink.

Structured Streaming's checkpoint gives at-least-once delivery of
micro-batches to ``foreachBatch``; end-to-end exactly-once follows
when the sink is IDEMPOTENT per (batch_id, batch contents). This
module implements the classic transactional-sink protocol over plain
parquet:

- every batch MERGEs (upserts by key) into the latest committed
  snapshot and writes the result as a NEW versioned snapshot
  ``v{batch_id}`` — never in place;
- a batch-id ledger marker commits the version ATOMICALLY (tmp file +
  ``os.replace``) only after the snapshot write completes;
- a replayed batch (crash after data write, before marker — or any
  at-least-once redelivery) either finds its marker and no-ops, or
  overwrites the same ``v{batch_id}`` directory with identical content
  and commits — both end states are byte-equal, so restarts can
  neither lose nor duplicate rows;
- readers resolve state through the ledger (highest committed id),
  never by directory listing alone, so a torn snapshot without a
  marker is invisible.

The marker ledger uses local-filesystem atomic rename; on an object
store or HDFS the same protocol runs through the FileSystem API or a
table format's commit log (Delta/Iceberg) — the PROTOCOL is what this
module demonstrates and tests (kill-and-replay included).

At 100 TB the full-snapshot rewrite per batch becomes a compacted
merge-on-read (append deltas, compact on schedule); the ledger logic
is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.snapshot import upsert
from .events import streaming_visibility_update

_KEY = "__eo_key"
_SEP = "\x1f"


def _ledger_dir(target_dir: str) -> str:
    return os.path.join(target_dir, "_applied")


def committed_batches(target_dir: str) -> list[int]:
    led = _ledger_dir(target_dir)
    if not os.path.isdir(led):
        return []
    return sorted(int(n) for n in os.listdir(led) if n.isdigit())


def read_latest(spark: SparkSession, target_dir: str) -> DataFrame | None:
    """The latest COMMITTED snapshot (ledger-resolved), or None."""
    ids = committed_batches(target_dir)
    if not ids:
        return None
    return spark.read.parquet(os.path.join(target_dir, f"v{ids[-1]}"))


def exactly_once_upsert(
    batch_df: DataFrame,
    batch_id: int,
    target_dir: str,
    key_cols: list[str],
) -> None:
    """The foreachBatch body: idempotent ledgered MERGE (see module
    docstring). Safe to call again with the same (batch_id, contents)
    any number of times, at any interruption point."""
    marker = os.path.join(_ledger_dir(target_dir), str(batch_id))
    if os.path.exists(marker):
        return  # this batch already committed — redelivery no-ops
    spark = batch_df.sparkSession
    batch = batch_df.withColumn(_KEY, F.concat_ws(_SEP, *key_cols))
    current = read_latest(spark, target_dir)
    if current is None:
        merged = batch
    else:
        merged = upsert(
            current.withColumn(_KEY, F.concat_ws(_SEP, *key_cols)),
            batch,
            _KEY,
        )
    version_dir = os.path.join(target_dir, f"v{batch_id}")
    merged.drop(_KEY).write.mode("overwrite").parquet(version_dir)
    os.makedirs(_ledger_dir(target_dir), exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(f"v{batch_id}")
    os.replace(tmp, marker)  # the atomic commit point


def start_visibility_upsert_stream(
    events: DataFrame,
    spine: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    key: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
):
    """End-to-end exactly-once visibility maintenance: the streaming
    per-(window, key) activity aggregate joined to the static spine
    (``streaming_visibility_update``), delivered through the ledgered
    MERGE sink in update mode. Returns the started StreamingQuery;
    read state with :func:`read_latest`."""
    upd = streaming_visibility_update(
        events, spine, key=key, ts_col=ts_col, watermark=watermark
    )
    cols = [c for c in upd.columns if c != "w"]
    flat = upd.select(F.col("w.start").alias("window_start"), *cols)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        exactly_once_upsert(
            batch_df, batch_id, target_dir, ["window_start", key]
        )

    return (
        flat.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
