"""Dump the formatted physical plan of registered queries.

Usage:
    python tools/plan_dump.py [query ...]        # default: headline set

Prints each query's `.explain("formatted")` output — the evidence for
the plan-quality claims in PLANS.md. Run from the repo root.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary",
    "q10_visibility_merge",
    "q16_top_parts_per_brand",
    "q23_minhash_lsh",
    "q43_chunk_documents",
]


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    for name in names:
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        qs[name](spark, sf_dir).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
