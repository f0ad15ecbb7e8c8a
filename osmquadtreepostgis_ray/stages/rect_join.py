"""Rectangle-overlap spatial join (PBSM / partition-based spatial merge).

The reference resolves "which polygons touch this object" with a serial
in-process quadtree walk per object (src/postgiswriter.cpp:417-420 —
each object already carries its quadtree cell).  The distributed form
for two LARGE rectangle sets is grid fanout + one co-partitioned
exchange:

1. fanout — each rectangle is replicated to every coarse grid cell it
   overlaps (vectorized ``np.repeat``; replication factor is bounded by
   rect size / cell size, ~1-4 for point-ish footprints);
2. one bucket hash join keyed on the cell id pairs up co-located rects
   (the single all-to-all exchange);
3. an overlap filter keeps real intersections, and the *canonical-cell*
   rule — a pair is reported only by the cell containing the top-left
   corner of the intersection — dedupes multi-cell pairs without a
   second shuffle.  The canonical cell is a pure function of the two
   rows (CLAUDE.md bit-stability invariant), never of block boundaries.

Boxes are half-open integer intervals [x0,x1) x [y0,y1); ``inter_area``
is the exact int64 intersection area.  Contrast stages/pip_join.py: that
is the broadcast form (small polygon side); this is the both-sides-large
form where a broadcast would not fit — at 100 TB the only driver-visible
data is the job graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.stages.joins import bucket_hash_join

_CID_SHIFT = 1 << 20   # cid = cx * 2^20 + cy; pure function of the rect


def _fanout(box: tuple[str, str, str, str], cell_w: int, cell_h: int):
    x0c, y0c, x1c, y1c = box

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__cid", pa.array([], pa.int64()))
        x0 = t.column(x0c).to_numpy().astype(np.int64)
        y0 = t.column(y0c).to_numpy().astype(np.int64)
        x1 = t.column(x1c).to_numpy().astype(np.int64)
        y1 = t.column(y1c).to_numpy().astype(np.int64)
        cx0, cx1 = x0 // cell_w, (x1 - 1) // cell_w
        cy0, cy1 = y0 // cell_h, (y1 - 1) // cell_h
        nx, ny = cx1 - cx0 + 1, cy1 - cy0 + 1
        n = nx * ny
        total = int(n.sum())
        idx = np.repeat(np.arange(len(x0)), n)
        off = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
        nyr = np.repeat(ny, n)
        cx = np.repeat(cx0, n) + off // nyr
        cy = np.repeat(cy0, n) + off % nyr
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column(
            "__cid", pa.array(cx * _CID_SHIFT + cy, pa.int64()))

    return f


def rect_overlap_join(left: ray.data.Dataset, right: ray.data.Dataset,
                      lbox: tuple[str, str, str, str],
                      rbox: tuple[str, str, str, str],
                      cell_w: int, cell_h: int,
                      int_cols: list[str] | None = None,
                      buckets: int | None = None) -> ray.data.Dataset:
    """All (left, right) pairs whose half-open boxes intersect, each pair
    exactly once, with an exact ``inter_area`` column appended.  Column
    names must be disjoint across the two sides (callers rename).
    ``int_cols`` are cast back to int64 after the typed-union merge
    (the CLAUDE.md null-pad float64 gotcha)."""
    lx0, ly0, lx1, ly1 = lbox
    rx0, ry0, rx1, ry1 = rbox
    casts = list(int_cols or []) + [c for b in (lbox, rbox) for c in b]

    lf = left.map_batches(_fanout(lbox, cell_w, cell_h), batch_format="pyarrow")
    rf = right.map_batches(_fanout(rbox, cell_w, cell_h), batch_format="pyarrow")
    j = bucket_hash_join(lf, rf, on="__cid", buckets=buckets)

    def flt(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            df = df.assign(inter_area=pd.Series([], dtype=np.int64))
            return df.drop(columns=["__cid"])
        ax0 = df[lx0].to_numpy(np.int64)
        ay0 = df[ly0].to_numpy(np.int64)
        ax1 = df[lx1].to_numpy(np.int64)
        ay1 = df[ly1].to_numpy(np.int64)
        bx0 = df[rx0].to_numpy(np.int64)
        by0 = df[ry0].to_numpy(np.int64)
        bx1 = df[rx1].to_numpy(np.int64)
        by1 = df[ry1].to_numpy(np.int64)
        ov = (ax0 < bx1) & (bx0 < ax1) & (ay0 < by1) & (by0 < ay1)
        ix0, iy0 = np.maximum(ax0, bx0), np.maximum(ay0, by0)
        canon = (ix0 // cell_w) * _CID_SHIFT + iy0 // cell_h
        keep = ov & (canon == df["__cid"].to_numpy(np.int64))
        out = df.loc[keep].copy()
        for c in casts:
            out[c] = out[c].astype(np.int64)
        out["inter_area"] = ((np.minimum(ax1, bx1) - ix0)
                             * (np.minimum(ay1, by1) - iy0))[keep]
        return out.drop(columns=["__cid"])

    return j.map_batches(flt, batch_format="pandas")
