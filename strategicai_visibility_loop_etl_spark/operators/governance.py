"""Run / autodetect governance logs (reference etl_merge.py:222-247,
986-1004).

These are run-level metadata — one row per pipeline run — so a
driver-side CSV append is the correct design even on a cluster: the
data plane never touches them, and an append-only audit file is what
the reference's consumers tail. Both are env-gated exactly like the
reference (``ETL_RUN_LOG`` / ``ETL_AUTODETECT_LOG`` with ``*_PATH``
overrides).
"""

from __future__ import annotations

import csv
import os
from datetime import datetime, timezone


def _env_bool(name: str, default: bool) -> bool:
    raw = os.getenv(name)
    if raw is None or not raw.strip():
        return default
    return raw.strip().lower() in {"1", "true", "yes", "on"}


def _append_csv(path: str, header: list[str], row: list) -> None:
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(path, "a", newline="") as fh:
        writer = csv.writer(fh)
        if fh.tell() == 0:
            writer.writerow(header)
        writer.writerow(row)


def write_autodetect_log(
    source_name: str,
    mapping: dict[str, str | None],
    autodetected: str | None,
    df_rows: int,
) -> str | None:
    """Append one autodetect-outcome row; returns the path written (or
    None when disabled). Mirrors reference etl_merge.py:222-247."""
    if not _env_bool("ETL_AUTODETECT_LOG", True):
        return None
    path = os.getenv("ETL_AUTODETECT_LOG_PATH", "logs/etl_autodetect.csv")
    present = [k for k, v in mapping.items() if v is not None]
    missing = [k for k, v in mapping.items() if v is None]
    _append_csv(
        path,
        ["timestamp_utc", "source", "rows", "autodetected_url_col", "mapped_fields", "missing_fields"],
        [
            datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ"),
            source_name,
            df_rows,
            autodetected or "",
            ";".join(present),
            ";".join(missing),
        ],
    )
    return path


def append_run_log(
    run_id: str,
    run_ts: int,
    rows_merged: int,
    frog_path: str,
    gsc_path: str,
    ga4_path: str,
    out_path: str,
) -> str | None:
    """Append one run row; returns the path written (or None when
    disabled). Mirrors reference etl_merge.py:986-1004."""
    if not _env_bool("ETL_RUN_LOG", True):
        return None
    path = os.getenv("ETL_RUN_LOG_PATH", "logs/runs.csv")
    _append_csv(
        path,
        ["run_id", "run_timestamp", "rows_merged", "frog_csv", "gsc_csv", "ga4_csv", "merged_csv"],
        [
            run_id,
            run_ts,
            rows_merged,
            os.path.basename(frog_path),
            os.path.basename(gsc_path),
            os.path.basename(ga4_path),
            out_path,
        ],
    )
    return path
