"""Parquet table readers with column pruning — the engine's S1.

The reference's merge reader (read_blocks_merge, src/processpostgis.cpp:143)
reads quadtree-tiled pbf + diff files; here the input is parquet (Lance-
shaped at production), and the diff-merge semantic is `merge_latest`:
union of base + change datasets with per-key latest-wins dedup.
"""

from __future__ import annotations

import os

import ray.data

from osmquadtreepostgis_ray.util import shard_apply


def read_table(sf_dir: str, name: str, columns: list[str] | None = None,
               repeat: int = 1, parallelism: int | None = None,
               filter=None) -> ray.data.Dataset:
    """Pruned read — only requested columns leave storage, and a
    ``filter`` (a pyarrow.dataset expression) pushes row predicates
    into the parquet scan (row-group statistics prune before rows are
    materialized).  ``repeat`` lists the file N times (independent read
    tasks) to scale the stream for throughput benchmarking on
    fixed-size sample data.  ``parallelism`` overrides the block count
    (EngineParams.read_parallelism; leave None to let Ray size blocks —
    overriding to tiny blocks adds per-task overhead, see BASELINE.md)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    lance_path = os.path.join(sf_dir, f"{name}.lance")
    if os.path.exists(lance_path):
        return read_lance_table(lance_path, columns=columns)
    kw = {"override_num_blocks": parallelism} if parallelism else {}
    if not parallelism and repeat == 1:
        # repeat mode (throughput benching) keeps one task per listing /
        # the caller's explicit packing — its scaling captures were
        # tuned against that plan shape (BASELINE.md listing packing)
        blocks = _small_read_blocks(path, repeat)
        if blocks:
            kw["override_num_blocks"] = blocks
    if filter is not None:
        kw["filter"] = filter
    return ray.data.read_parquet([path] * repeat if repeat > 1 else path,
                                 columns=columns, **kw)


SMALL_READ_BYTES = 256 << 20  # under this, block count = CPU count


def _small_read_blocks(path: str, repeat: int) -> int | None:
    """Size-aware default block count: Ray's parallelism heuristic
    (2 x CPUs, 64 blocks here) prices every downstream sort shuffle at
    64 map tasks even when the whole table is a few MB — measured
    25-45% of wall across the shuffle-bearing sf0.1 suite.  For small
    inputs one block per CPU keeps map_batches fully parallel while
    halving shuffle task counts; big inputs keep Ray's own sizing
    (block count must scale with data, not cluster, at 100 TB)."""
    try:
        total = os.path.getsize(path) * max(repeat, 1)
    except OSError:
        return None
    if total > SMALL_READ_BYTES or not ray.is_initialized():
        return None
    cpus = int(ray.cluster_resources().get("CPU", 0))
    return max(4, cpus) if cpus else None


def read_lance_table(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Lance read path (the production input format per BASELINE.json).
    `lance` is not installed in this sandbox, so the gate raises with a
    clear message there; with the wheel present this is a zero-code-change
    swap for the parquet reader."""
    try:
        import lance  # noqa: F401
    except ImportError as ex:  # pragma: no cover - sandbox has no lance
        raise NotImplementedError(
            "lance is not installed in this environment; "
            "the parquet reader is the tested equivalent") from ex
    return ray.data.read_lance(path, columns=columns)


def merge_latest(base: ray.data.Dataset, changes: ray.data.Dataset,
                 key: str, version: str) -> ray.data.Dataset:
    """Latest-wins merge of a base table and change sets (S1 diff-merge).

    One hash-shard shuffle on `key` (util.shard_apply — keys are
    unique-ish, so a raw groupby(key) would pay a Python task per
    ~1-row group); the latest-wins pick inside each shard is a single
    vectorized sort + groupby.tail(1).

    Equal (key, version) across the two inputs resolves to the CHANGE
    row, via an explicit side marker — intra-shard row order is not
    deterministic (the shuffle orders only by shard), so relying on
    arrival order would make the winner vary run to run, violating
    bit-stability.  Duplicate (key, version) WITHIN one side remains
    caller-undefined; feed unique versions per side.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def mark(side: int):
        def _m(t: pa.Table) -> pa.Table:
            return t.append_column(
                "__src", pa.array(np.full(t.num_rows, side, np.int8),
                                  pa.int8()))
        return _m

    u = base.map_batches(mark(0), batch_format="pyarrow").union(
        changes.map_batches(mark(1), batch_format="pyarrow"))

    def last_per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([version, "__src"], kind="stable")
        return g.groupby(key, sort=False).tail(1).drop(columns="__src")

    return shard_apply(u, [key], last_per_key)
