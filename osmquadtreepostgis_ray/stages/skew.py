"""Skew-aware repartitioning — the engine's fix for the reference's
worst bottleneck (serial MultiPolygons stalling on giant coastline
tiles, /root/reference/docs/output.txt:75; SURVEY.md §4 'skew: none').

Two tools, both producing keys that stay PURE FUNCTIONS of the row
(bit-stability requirement, SURVEY.md §7.3):

- split_hot_cells: cells whose row count exceeds `max_rows` are replaced
  by their child cell `depth_delta` levels deeper (quadtree subdivision,
  exactly how the reference's oqt splits crowded tiles when building the
  block index).  Two passes: a cheap combiner count (partial per batch →
  tiny groupby) finds the hot set, which is broadcast via ray.put; the
  second pass rewrites only hot rows' keys from their own lon/lat.

- salt_keys: generic fallback for non-spatial keys — hot keys get a
  deterministic salt derived from the row id, bounding any one group at
  ~1/salt_mod of the hot key's rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from osmquadtreepostgis_ray.functions import geotag, quadtree


def cell_counts(ds: ray.data.Dataset, cell_col: str = "cell") -> ray.data.Dataset:
    """Combiner-style per-cell counts: partial inside each batch, then a
    groupby over (cell, partial) rows only — the shuffle carries one row
    per distinct cell per batch, never data rows."""
    def partial(batch: pa.Table) -> pa.Table:
        cells, counts = np.unique(batch.column(cell_col).to_numpy(), return_counts=True)
        return pa.table({cell_col: pa.array(cells, pa.int64()),
                         "n": pa.array(counts.astype(np.int64), pa.int64())})

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(cell_col).aggregate(Sum("n", alias_name="n")))


def hot_cells(ds: ray.data.Dataset, max_rows: int, cell_col: str = "cell") -> np.ndarray:
    counts = cell_counts(ds, cell_col)
    # vectorized prefilter (Dataset.filter(row_fn) is Python-per-row
    # over the DATA-SCALED cell table); only the bounded hot set
    # reaches the driver
    import pyarrow.compute as pc
    empty = pa.table({cell_col: pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    hot = counts.map_batches(
        lambda t, _m=max_rows, _e=empty: (
            _e if "n" not in t.column_names  # zero-row empty-schema block
            else t.filter(pc.greater(t.column("n"), _m))),
        batch_format="pyarrow")
    out = [t.column(cell_col).to_numpy()
           for t in hot.iter_batches(batch_format="pyarrow")
           if t.num_rows]
    return (np.sort(np.concatenate(out)).astype(np.int64)
            if out else np.empty(0, np.int64))


def split_hot_cells(ds: ray.data.Dataset, max_rows: int, depth_delta: int = 2,
                    cell_col: str = "cell", out_col: str = "group_cell",
                    lon_col: str = "lon_milli", lat_col: str = "lat_milli") -> ray.data.Dataset:
    """Append `out_col`: the cell id, except rows in hot cells carry the
    child cell `depth_delta` deeper (recomputed from the row's own
    fixed-point coords, so the result is executor-independent)."""
    hot = hot_cells(ds, max_rows, cell_col)
    hot_ref = ray.put(np.sort(hot))

    class Rewrite:
        def __init__(self):
            self.hot = ray.get(hot_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cells = batch.column(cell_col).to_numpy()
            out = cells.copy()
            if len(self.hot):
                mask = np.isin(cells, self.hot)
                if mask.any():
                    # per-ROW depth: hot cells at different depths can
                    # co-occur in one batch (e.g. a second split pass) —
                    # taking the first row's depth would rewrite the rest
                    # at the wrong level, a silent bit-stability break
                    depths = (cells[mask] & np.int64(63)) + depth_delta
                    lon_f, lat_f = geotag.milli_to_fixed(
                        batch.column(lon_col).to_numpy()[mask],
                        batch.column(lat_col).to_numpy()[mask])
                    new = np.empty(int(mask.sum()), np.int64)
                    for d in np.unique(depths):
                        sub = depths == d
                        ix, iy = quadtree.fixed_to_ixy(lon_f[sub], lat_f[sub], int(d))
                        new[sub] = quadtree.encode_ixy(ix, iy, int(d))
                    out[mask] = new
            return batch.append_column(out_col, pa.array(out, pa.int64()))

    from osmquadtreepostgis_ray.util import worker_cached
    return ds.map_batches(worker_cached(Rewrite), batch_format="pyarrow")


def salt_keys(keys: np.ndarray, ids: np.ndarray, hot: np.ndarray,
              salt_mod: int = 16) -> np.ndarray:
    """Deterministic salted key: hot keys spread over salt_mod shards by
    the row id (key*salt_mod + salt fits int64 for key < 2^59)."""
    keys = np.asarray(keys, dtype=np.int64)
    out = keys * salt_mod
    if len(hot):
        mask = np.isin(keys, np.asarray(hot, dtype=np.int64))
        out[mask] += (np.asarray(ids, dtype=np.int64)[mask] % salt_mod)
    return out
