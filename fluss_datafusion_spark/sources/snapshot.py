"""Snapshot-bounded scans over log-table storage.

Reference parity: FlussScanExec reads a log table *up to the latest
offset snapshot taken at plan time* (src/provider.rs:336-345 —
``list_offsets(.., OffsetSpec::Latest)`` before subscribing), so a query
sees a consistent prefix of the log even while writers keep appending.

On file-backed log tables the offset snapshot becomes a *file-list
snapshot*: enumerate the data files once at plan time and bind the scan
to exactly those files.  Files appended after ``snapshot_scan`` returns
are not visible to the returned DataFrame, even if the action runs
later — the same isolation the reference gets from its offset pin.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def list_snapshot_files(path: str) -> List[str]:
    """Enumerate the parquet data files under ``path`` right now —
    the file-level analog of ``list_offsets(OffsetSpec::Latest)``."""
    if os.path.isfile(path):
        return [path]
    found: List[str] = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet") and not f.startswith("_"):
                found.append(os.path.join(root, f))
    return sorted(found)


def snapshot_scan(
    spark: SparkSession,
    path: str,
    columns: Optional[List[str]] = None,
    limit: Optional[int] = None,
) -> DataFrame:
    """Bounded read of a log table pinned to the plan-time snapshot.

    ``columns`` mirrors the server-side projection of FlussScanExec
    (scan.project, src/provider.rs:349-351); ``limit`` mirrors its
    limit pushdown (src/provider.rs:81,373-392).  Unlike the reference,
    no LIMIT is *required* — a full scan is a legitimate distributed
    read here (SURVEY.md §2 quirk 1, deliberately fixed).
    """
    files = list_snapshot_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    df = spark.read.parquet(*files)
    if columns:
        df = df.select(*columns)
    if limit is not None:
        df = df.limit(limit)
    return df


def incremental_scan(
    spark: SparkSession,
    path: str,
    since_files: List[str],
) -> DataFrame:
    """Read only the files that appeared after a previous snapshot —
    the offsets-delta read a follow-up bounded consumption would do.
    Returns an empty DataFrame (correct schema) when nothing is new."""
    current = list_snapshot_files(path)
    prev = set(since_files)
    new_files = [f for f in current if f not in prev]
    if not new_files:
        base = current or since_files
        if not base:
            raise FileNotFoundError(f"no parquet files under {path}")
        return spark.read.parquet(*base).limit(0)
    return spark.read.parquet(*new_files)
