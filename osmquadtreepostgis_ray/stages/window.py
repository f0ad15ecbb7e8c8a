"""Global window ranks over a distributed sort.

``keyed_row_number`` is the sequence-packing prefix-sum shape
(stages/textstats.sequence_packing) generalized to PER-GROUP offsets:
Ray's range-partitioned sort orders the data once; each sorted block
ships only its per-group row counts to the driver (a ~#groups-row
table per block, never rows); the driver exclusive-scans those tiny
partials into per-block starting offsets and each block finishes its
ranks in a remote task.  Driver state is O(blocks x groups-per-block)
— at 100 TB the scan state is the group-count table, not the data.

NTILE sits on top as pure arithmetic on (rank, group total); DuckDB
semantics (first N%T tiles get the extra row) reproduced exactly.
Reference analog: none (the reference has no window functions —
SURVEY.md §2.6); this is a beyond-reference training-data operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _keep_nonempty(refs, partials):
    """Skip zero-row blocks when assembling the finished output: a
    zero-row block can arrive with an EMPTY schema (the CLAUDE.md
    to_arrow_refs hazard) and finish() would give it the {out_col}-only
    schema, diverging from the other blocks and breaking downstream
    select_columns (ADVICE r2).  A block is empty iff its per-group
    partial is empty."""
    return [i for i, df in enumerate(partials) if len(df)]


def _empty_with(ds, sorted_ds, extra_col: str) -> "ray.data.Dataset":
    """All-blocks-empty fallback: one empty block with the full output
    schema (input schema + the appended int64 column).  The sorted
    dataset's schema can be None when every block is empty — fall back
    to the pre-sort input's schema."""
    sch = sorted_ds.schema() or ds.schema()

    def atype(t):  # pandas blocks report numpy dtypes
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except Exception:
            return pa.string()

    cols = {}
    if sch is not None:
        cols = {n: pa.array([], atype(t)) for n, t in zip(sch.names, sch.types)}
    cols[extra_col] = pa.array([], pa.int64())
    return ray.data.from_arrow(pa.table(cols))


def _group_key(tab: pa.Table, group_cols: list[str]) -> np.ndarray:
    """Row -> group ordinal within one sorted block (groups contiguous)."""
    parts = [tab.column(c).to_numpy(zero_copy_only=False) for c in group_cols]
    new = np.zeros(tab.num_rows, bool)
    if tab.num_rows:
        new[0] = True
        for p in parts:
            new[1:] |= p[1:] != p[:-1]
    return np.cumsum(new) - 1


WINDOW_MAX_GROUPS = 1_000_000


def _scan_starts(partials, max_groups: int, op: str):
    """Driver exclusive-scan of per-block per-group partials, with a
    CARDINALITY GUARD: the scan dict is keyed by distinct group, so a
    data-scaled key (doc_id, content hash) would silently grow driver
    state with the data — raise past ``max_groups`` and point the
    caller at the sharded alternatives.  All current callers (ntile by
    event_type, curriculum 3 buckets, running_total/epoch_shuffle 1
    global key) are orders of magnitude under the default bound."""
    running: dict[tuple, int] = {}
    starts: list[dict[tuple, int]] = []
    for df in partials:
        block_start = {}
        for row in df.itertuples(index=False):
            key = tuple(row[:-1])
            block_start[key] = running.get(key, 0)
            running[key] = block_start[key] + int(row[-1])
        starts.append(block_start)
        if len(running) > max_groups:
            raise RuntimeError(
                f"{op}: > {max_groups} distinct groups — the driver "
                "prefix-scan only admits cardinality-BOUNDED keys; for "
                "data-scaled keys use util.shard_apply (per-key local "
                "window) or raise max_groups deliberately")
    return starts, dict(running)


def keyed_row_number(ds: ray.data.Dataset, group_cols: list[str],
                     order_cols: list[str],
                     rank_col: str = "rank",
                     max_groups: int = WINDOW_MAX_GROUPS) -> ray.data.Dataset:
    """Append a 0-based global row number per group in (group_cols,
    order_cols) order.  One distributed sort; per-block group counts
    scanned on the driver; ranks finished block-locally."""
    sorted_ds = ds.sort(list(group_cols) + list(order_cols))
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def gcounts(tab: pa.Table) -> pd.DataFrame:
        if tab.num_rows == 0:
            return pd.DataFrame(columns=[*group_cols, "n"])
        gid = _group_key(tab, group_cols)
        firsts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        n = np.diff(np.r_[firsts, len(gid)])
        out = {c: tab.column(c).to_numpy(zero_copy_only=False)[firsts]
               for c in group_cols}
        out["n"] = n.astype(np.int64)
        return pd.DataFrame(out)

    partials = ray.get([gcounts.remote(r) for r in refs])

    starts, totals = _scan_starts(partials, max_groups, "keyed_row_number")

    @ray.remote
    def finish(tab: pa.Table, start: dict) -> pa.Table:
        if tab.num_rows == 0:
            return tab.append_column(rank_col, pa.array([], pa.int64()))
        gid = _group_key(tab, group_cols)
        firsts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        keys = list(zip(*[tab.column(c).to_numpy(zero_copy_only=False)[firsts]
                          for c in group_cols]))
        base = np.array([start[tuple(k)] for k in keys], np.int64)[gid]
        local = np.arange(len(gid), dtype=np.int64) - firsts[gid]
        return tab.append_column(rank_col, pa.array(base + local, pa.int64()))

    keep = _keep_nonempty(refs, partials)
    if not keep:
        return _empty_with(ds, sorted_ds, rank_col), totals
    out = [finish.remote(refs[i], starts[i]) for i in keep]
    return ray.data.from_arrow_refs(out), totals


def ntile_of(rank: np.ndarray, total: np.ndarray, tiles: int) -> np.ndarray:
    """DuckDB/ANSI NTILE: the first total % tiles tiles hold
    ceil(total/tiles) rows, the rest floor(total/tiles).  1-based."""
    q, r = total // tiles, total % tiles
    boundary = r * (q + 1)
    small = np.maximum(q, 1)  # q == 0: every rank sits below boundary
    return np.where(rank < boundary, rank // (q + 1),
                    r + (rank - boundary) // small) + 1


def keyed_prefix_sum(ds: ray.data.Dataset, group_cols: list[str],
                     order_cols: list[str], val_col: str,
                     out_col: str = "run_sum",
                     max_groups: int = WINDOW_MAX_GROUPS) -> ray.data.Dataset:
    """Append the INCLUSIVE per-group running sum of ``val_col`` in
    (group_cols, order_cols) order — SUM(...) OVER (PARTITION BY g
    ORDER BY o ROWS UNBOUNDED PRECEDING).  Same machinery as
    keyed_row_number: one range-partitioned sort; blocks ship per-group
    VALUE SUMS to the driver (a ~#groups-row partial per block, never
    rows); the driver exclusive-scans them into per-block bases; blocks
    finish with a local cumsum.  Exact int64 — callers pass integer
    units (cents), per the repo's parity discipline."""
    sorted_ds = ds.sort(list(group_cols) + list(order_cols))
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def gsums(tab: pa.Table) -> pd.DataFrame:
        if tab.num_rows == 0:
            return pd.DataFrame(columns=[*group_cols, "s"])
        gid = _group_key(tab, group_cols)
        v = tab.column(val_col).to_numpy().astype(np.int64)
        firsts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        s = np.add.reduceat(v, firsts)
        out = {c: tab.column(c).to_numpy(zero_copy_only=False)[firsts]
               for c in group_cols}
        out["s"] = s.astype(np.int64)
        return pd.DataFrame(out)

    partials = ray.get([gsums.remote(r) for r in refs])

    starts, _ = _scan_starts(partials, max_groups, "keyed_prefix_sum")

    @ray.remote
    def finish(tab: pa.Table, start: dict) -> pa.Table:
        if tab.num_rows == 0:
            return tab.append_column(out_col, pa.array([], pa.int64()))
        gid = _group_key(tab, group_cols)
        v = tab.column(val_col).to_numpy().astype(np.int64)
        firsts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        keys = list(zip(*[tab.column(c).to_numpy(zero_copy_only=False)[firsts]
                          for c in group_cols]))
        base = np.array([start[tuple(k)] for k in keys], np.int64)[gid]
        cs = np.cumsum(v)
        seg0 = (cs[firsts] - v[firsts])[gid]     # cumsum before group start
        return tab.append_column(out_col, pa.array(base + cs - seg0, pa.int64()))

    keep = _keep_nonempty(refs, partials)
    if not keep:
        return _empty_with(ds, sorted_ds, out_col)
    out = [finish.remote(refs[i], starts[i]) for i in keep]
    return ray.data.from_arrow_refs(out)
