"""Local replica of the driver's DuckDB-oracle correctness gate.

For each entry in ``__spark_entry__.queries()`` with a matching
``oracle_sql()`` string: run both on the same parquet tables, then
compare row count, column-name set, and an order-insensitive value
hash (columns sorted by name, rows sorted, values stringified). Used
by tests/test_oracle.py and runnable standalone:

    python tests/oracle_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # 17 significant digits round-trips doubles exactly.
        return repr(v)
    return str(v)


def canonical_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_canon_value(r[i]) for i in order) for r in rows)


def spark_result(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def duckdb_result(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def compare(name: str, s_cols, s_rows, o_cols, o_rows, max_diffs: int = 5):
    report = {"query": name, "rows": len(s_rows), "oracle_rows": len(o_rows)}
    if sorted(s_cols) != sorted(o_cols):
        report["status"] = "schema_mismatch"
        report["spark_cols"] = sorted(s_cols)
        report["oracle_cols"] = sorted(o_cols)
        return report
    if len(s_rows) != len(o_rows):
        report["status"] = "rowcount_mismatch"
        return report
    s_canon = canonical_rows(s_cols, s_rows)
    o_canon = canonical_rows(o_cols, o_rows)
    if s_canon == o_canon:
        report["status"] = "ok"
        return report
    report["status"] = "value_mismatch"
    diffs = []
    for a, b in zip(s_canon, o_canon):
        if a != b:
            diffs.append({"spark": a, "oracle": b})
            if len(diffs) >= max_diffs:
                break
    report["diffs"] = diffs
    return report


def run_all(spark, sf_dir: str, only: list[str] | None = None):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        s_cols, s_rows = spark_result(df)
        if name not in oracles:
            results.append({"query": name, "status": "rows_only", "rows": len(s_rows)})
            continue
        o_cols, o_rows = duckdb_result(oracles[name], sf_dir)
        results.append(compare(name, s_cols, s_rows, o_cols, o_rows))
    return results


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:] or None
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for rep in run_all(spark, sf_dir, only):
        print(rep)
    spark.stop()
