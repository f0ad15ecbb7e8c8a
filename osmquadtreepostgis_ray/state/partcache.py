"""Hive-partitioned materialization cache — the file-level partition
prune behind the IVF ANN probe and the cell-ring kNN.

At cluster scale the pattern is: pay ONE key-partitioned write (hive
layout, one directory per key value), then every probe/round reads only
the partitions it needs — a storage-path prune, not a row filter over a
full scan.  This is the engine's stand-in for a partitioned table layout
(Lance/Iceberg bucket-by); the reference gets the same effect from its
quadtree block index (/root/reference/src/sortblocks.cpp group tree).

The cache commits via a _SUCCESS marker written after the data: a killed
build leaves no marker and is rebuilt from scratch (the parquet write
itself is not resumable here — use state/checkpoint.py for exports whose
build cost warrants per-partition resume).
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import ray.data

_MARKER = "_SUCCESS"


def cache_partitioned(ds: ray.data.Dataset, path: str, part_col: str) -> str:
    """Materialize `ds` hive-partitioned by `part_col` at `path` (no-op
    if already committed).  Returns `path`."""
    if os.path.exists(os.path.join(path, _MARKER)):
        return path
    if os.path.isdir(path):
        shutil.rmtree(path)
    # sort = the one-time co-locating shuffle: without it every write
    # task emits its own file into every partition it touches (measured
    # 16k files for 256 partitions at sf0.1 — read planning then
    # dominates every probe); sorted, each partition lands in ~1 file
    ds.sort(part_col).write_parquet(path, partition_cols=[part_col])
    with open(os.path.join(path, _MARKER), "w") as fh:
        fh.write("ok")
    return path


def partition_values(path: str, part_col: str) -> np.ndarray:
    """The key values present in a committed cache (sorted int64)."""
    pre = f"{part_col}="
    vals = [int(d[len(pre):]) for d in os.listdir(path)
            if d.startswith(pre) and os.path.isdir(os.path.join(path, d))]
    return np.sort(np.array(vals, dtype=np.int64))


def read_partitions(path: str, part_col: str, values) -> ray.data.Dataset | None:
    """Dataset over ONLY the given partition values' files (the prune:
    unselected partitions never leave storage).  None if no partition
    matches."""
    files: list[str] = []
    for v in values:
        files.extend(sorted(glob.glob(os.path.join(path, f"{part_col}={int(v)}", "*.parquet"))))
    if not files:
        return None
    return ray.data.read_parquet(files)


def partition_rows(path: str, part_col: str, values) -> int:
    """Row count across the given partitions from parquet metadata only
    (used by tests to prove the prune scans less than the corpus)."""
    import pyarrow.parquet as pq
    n = 0
    for v in values:
        for f in glob.glob(os.path.join(path, f"{part_col}={int(v)}", "*.parquet")):
            n += pq.read_metadata(f).num_rows
    return n
