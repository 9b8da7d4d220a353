"""Robust tabular ingest: CSV / Excel / Parquet / JSON → string-typed DataFrame.

Spark-first counterpart of reference etl_merge.py:88-108
(``load_table_any``) and :579-601 (GA4-robust CSV reader). Everything
is read as strings (like the reference's ``dtype=str``) so downstream
normalization is predictable; coercion happens explicitly later.

CSV strategy: Spark's CSV datasource in PERMISSIVE mode with header,
comment='#' (GA4 exports carry '# ---' preamble lines), quoting and
escaping on. Delimiter sniffing — pandas' ``sep=None`` trick — has no
distributed equivalent, so we sniff on a driver-side sample of the
first file block (bounded read, not a collect of the dataset).

Excel: Spark has no xlsx datasource; gated behind an import-try of
pandas' optional engines and converted via ``spark.createDataFrame``.
Excel exports are small config-ish files in practice; the 100 TB path
is CSV/parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CANDIDATE_SEPS = [",", "\t", ";", "|"]


def _sniff_sep(path: str, default: str = ",") -> str:
    """Pick the delimiter that yields the most fields on the header line.

    Driver-side read of the first ~64 KiB of one file — O(1) regardless
    of dataset size.
    """
    try:
        target = path
        if os.path.isdir(path):
            entries = [e for e in sorted(os.listdir(path)) if not e.startswith((".", "_"))]
            if not entries:
                return default
            target = os.path.join(path, entries[0])
        with open(target, "rb") as fh:
            head = fh.read(65536).decode("utf-8", errors="replace")
        lines = [ln for ln in head.splitlines() if ln.strip() and not ln.startswith("#")]
        if not lines:
            return default
        header = lines[0]
        best, best_n = default, 0
        for sep in _CANDIDATE_SEPS:
            n = header.count(sep)
            if n > best_n:
                best, best_n = sep, n
        return best
    except OSError:
        return default


def _read_csv(spark: SparkSession, path: str, sep: str | None = None) -> DataFrame:
    # multiLine (quoted embedded newlines) makes each file a single split —
    # no read parallelism. Default OFF (4× faster on a single node, and
    # the difference between parallel and serial scans on a cluster);
    # exports with embedded newlines can opt in via ETL_CSV_MULTILINE=1.
    multiline = os.getenv("ETL_CSV_MULTILINE", "").strip().lower() in {"1", "true", "yes"}
    sep = sep or _sniff_sep(path)
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("comment", "#")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", multiline)
        .option("mode", "PERMISSIVE")
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .csv(path)
    )


def _read_excel(spark: SparkSession, path: str) -> DataFrame:
    # Probe the engine up front so the failure mode is a clear,
    # declared capability gap rather than a confusing pandas error.
    try:
        import openpyxl  # noqa: F401, PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "Excel ingest needs openpyxl; not available in this environment "
            "(reference reads xlsx via pandas, etl_merge.py:88-108). "
            "Convert to CSV or install openpyxl."
        ) from exc
    import pandas as pd  # noqa: PLC0415

    pdf = pd.read_excel(path, dtype=str)
    return spark.createDataFrame(pdf.astype("string").where(pdf.notna(), None))


def resolve_sibling_extension(path: str) -> str:
    """csv↔xlsx extension fallback (reference etl_merge.py:717-731):
    when the configured file is missing but a sibling with the paired
    extension exists, use the sibling."""
    if os.path.exists(path):
        return path
    stem, ext = os.path.splitext(path)
    swaps = {".csv": (".xlsx", ".xls"), ".xlsx": (".csv",), ".xls": (".csv",)}
    for alt in swaps.get(ext.lower(), ()):
        candidate = stem + alt
        if os.path.exists(candidate):
            return candidate
    return path


def load_table_any(spark: SparkSession, path: str) -> DataFrame:
    """Load CSV/Excel/Parquet/JSON by extension; columns as strings.

    Headers are whitespace-trimmed (reference strips them per-loader).
    """
    path = resolve_sibling_extension(path)
    ext = os.path.splitext(path)[1].lower()
    if ext in {".xlsx", ".xls"}:
        df = _read_excel(spark, path)
    elif ext == ".parquet" or (os.path.isdir(path) and path.rstrip("/").endswith(".parquet")):
        df = spark.read.parquet(path)
    elif ext in {".json", ".jsonl", ".ndjson"}:
        df = spark.read.json(path)
    else:
        df = _read_csv(spark, path)
        # Single-garbage-column fallback (reference etl_merge.py:589-594):
        # retry with sniffed separators when the header collapsed.
        if len(df.columns) == 1:
            for sep in _CANDIDATE_SEPS:
                retry = _read_csv(spark, path, sep=sep)
                if len(retry.columns) > 1:
                    df = retry
                    break
    renames = {c: c.strip() for c in df.columns if c != c.strip()}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    # Canonical string typing for CSV/Excel-born frames.
    if ext not in {".parquet", ".json", ".jsonl", ".ndjson"}:
        df = df.select([F.col(c).cast("string").alias(c) for c in df.columns])
    return df
