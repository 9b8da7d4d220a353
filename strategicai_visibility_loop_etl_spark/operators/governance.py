"""Run / autodetect governance logs (reference etl_merge.py:222-247,
986-1004).

These are run-level metadata — one row per pipeline run — so a
driver-side CSV append is the correct design even on a cluster: the
data plane never touches them, and an append-only audit file is what
the reference's consumers tail. Both are env-gated exactly like the
reference (``ETL_RUN_LOG`` / ``ETL_AUTODETECT_LOG`` with ``*_PATH``
overrides).

The log path contract is DRIVER-LOCAL by design (append semantics
don't exist on object stores); a path with a remote scheme raises
loudly instead of writing to a surprising driver-local location.
"""

from __future__ import annotations

import csv
import os
import re
from datetime import datetime, timezone

_REMOTE_SCHEME = re.compile(r"^(?!file:)[a-zA-Z][a-zA-Z0-9+.-]*://")


def _env_bool(name: str, default: bool) -> bool:
    raw = os.getenv(name)
    if raw is None or not raw.strip():
        return default
    return raw.strip().lower() in {"1", "true", "yes", "on"}


def _append_csv(path: str, header: list[str], row: list) -> None:
    if _REMOTE_SCHEME.match(path):
        raise ValueError(
            f"governance logs are driver-local append-only CSV; got remote path {path!r}. "
            "Point ETL_RUN_LOG_PATH / ETL_AUTODETECT_LOG_PATH at local driver "
            "storage (or a mounted filesystem) and ship the file from there."
        )
    path = path[len("file://"):] if path.startswith("file://") else path
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
