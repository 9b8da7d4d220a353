"""Snapshot diffing: what changed between two crawls.

The reference's visibility loop is inherently run-over-run (this
crawl's merged table vs the last one — cf. /root/reference
etl_merge.py run-provenance fields); this operator makes the
comparison itself a first-class distributed op: classify every key as
added / removed / changed / unchanged between two snapshots by
comparing content fingerprints.

Scale shape: one full-outer shuffled join on the key — only (key,
fingerprint) ride the shuffle, never document bodies; with both
snapshots written bucketed on the key (sources/sinks.py) the Exchange
disappears entirely. Status is a pure codegen'd CASE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fingerprint_col: str = "digest",
) -> DataFrame:
    """(key, status) for every key in either snapshot; status ∈
    {added, removed, changed, unchanged} by fingerprint comparison.

    Fingerprints must be non-null on present rows (use a content digest
    such as ``sha2(normalized_text(text), 256)``); null fingerprints
    would be indistinguishable from absence.
    """
    o = old.select(F.col(key_col), F.col(fingerprint_col).alias("__fp_old"))
    n = new.select(F.col(key_col), F.col(fingerprint_col).alias("__fp_new"))
    status = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") == F.col("__fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, key_col, "full_outer").select(key_col, status.alias("status"))
