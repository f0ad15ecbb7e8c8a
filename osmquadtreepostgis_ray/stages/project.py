"""Row projection — the engine's M4/M5: compute each output column from
its ColumnSource, per batch, vectorized.  This is the Ray-Data
re-expression of the reference's populate_* switch over ColumnSource
(src/postgiswriter.cpp:320-604); Arrow *is* the binary format, so the
separate pg-binary path (M5) collapses into this one stage.

Geometry per routed kind (image-footprint transposition, SURVEY.md §7.0):
  point   -> mercator point EWKB at the geotag
  line    -> footprint diagonal linestring EWKB (length = milli perimeter/2)
  polygon -> footprint box EWKB; way_point = center; way_exterior = ring
Relation-analog rows (boundary fanout) negate osm_id (M9,
src/postgiswriter.cpp:525).  length/area are exact integer milli-degree
measures (SQL-replicable); mercator float measures live in the geometry
kernels for the non-oracle path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from osmquadtreepostgis_ray.config import DEFAULT_FEATURE_KEYS, EngineParams
from osmquadtreepostgis_ray.functions import ewkb, geotag, mercator
from osmquadtreepostgis_ray.functions.tags import count_word, hstore_leftover
from osmquadtreepostgis_ray.spec import ColumnSource, TableSpec


def _footprint_mercator(batch: pa.Table):
    lon_m = batch.column("lon_milli").to_numpy()
    lat_m = batch.column("lat_milli").to_numpy()
    w = batch.column("w").to_numpy().astype(np.int64)
    h = batch.column("h").to_numpy().astype(np.int64)
    x0m, y0m, x1m, y1m = geotag.footprint_milli(lon_m, lat_m, w, h)
    lo0, la0 = geotag.milli_to_degrees(x0m, y0m)
    lo1, la1 = geotag.milli_to_degrees(x1m, y1m)
    x0, y0 = mercator.forward(lo0, la0)
    x1, y1 = mercator.forward(lo1, la1)
    return (x0, y0, x1, y1), (x0m, y0m, x1m, y1m)


def project_table(batch: pa.Table, spec: TableSpec, negate_ids: bool = False,
                  round_geometry: bool = False) -> pa.Table:
    """Routed+cell-encoded rows -> the spec's output schema.
    ``round_geometry`` rounds length/area to 0.1 (F5, the reference's
    binary-path `round_geometry`, src/postgiswriter.cpp:893, :943)."""
    n = batch.num_rows
    ids = batch.column("doc_id").to_numpy()
    _cap_cache: list = []

    def cap() -> pd.Series:  # lazy: only materialized on fallback paths
        if not _cap_cache:
            _cap_cache.append(pd.Series(batch.column("caption").to_pylist()))
        return _cap_cache[0]
    (mx0, my0, mx1, my1), (fx0, fy0, fx1, fy1) = _footprint_mercator(batch) if n else ((np.zeros(0),) * 4, (np.zeros(0, dtype=np.int64),) * 4)
    cx, cy = mercator.forward(batch.column("lon").to_numpy(), batch.column("lat").to_numpy()) if n else (np.zeros(0), np.zeros(0))

    arrays, names = [], []
    for col in spec.columns:
        s = col.source
        if s is ColumnSource.OSM_ID:
            a = pa.array(-ids if negate_ids else ids, pa.int64())
        elif s is ColumnSource.PART:
            a = pa.array(np.ones(n, dtype=np.int64), pa.int64())
        elif s is ColumnSource.OBJECT_QUADTREE:
            a = batch.column("cell")
        elif s is ColumnSource.BLOCK_QUADTREE:
            a = batch.column("tile")
        elif s is ColumnSource.TAG:
            # routing precomputes kv_<key> in one tokenize pass; fall
            # back to the regex kernel for standalone use
            pre = f"kv_{col.tag_key}"
            a = (batch.column(pre) if pre in batch.column_names
                 else pa.array(count_word(cap(), col.tag_key), pa.int64()))
        elif s is ColumnSource.OTHER_TAGS:
            a = (batch.column("tags") if "tags" in batch.column_names
                 else pa.array(hstore_leftover(cap(), set(DEFAULT_FEATURE_KEYS)).to_numpy(), pa.string()))
        elif s is ColumnSource.LAYER:
            a = batch.column("layer")
        elif s is ColumnSource.Z_ORDER:
            a = batch.column("z_order")
        elif s is ColumnSource.MIN_ZOOM:
            a = batch.column("minzoom")
        elif s is ColumnSource.LENGTH:
            # diagonal line: milli-degree L1 half-perimeter (exact int)
            v = ((fx1 - fx0) + (fy1 - fy0)).astype(np.float64)
            a = pa.array(np.round(v, 1) if round_geometry else v, pa.float64())
        elif s is ColumnSource.AREA:
            v = ((fx1 - fx0) * (fy1 - fy0)).astype(np.float64)
            a = pa.array(np.round(v, 1) if round_geometry else v, pa.float64())
        elif s is ColumnSource.GEOMETRY:
            # fully vectorized, mask-merged per kind (no per-row loop)
            kind = batch.column("kind").to_numpy() if "kind" in batch.column_names else np.full(n, -1)
            out = np.empty(n, dtype=object)
            for kv, enc in (
                (0, lambda m: ewkb.points_vectorized(cx[m], cy[m])),
                (1, lambda m: ewkb.lines_vectorized(np.stack(
                    [np.stack([mx0[m], my0[m]], axis=1),
                     np.stack([mx1[m], my1[m]], axis=1)], axis=1))),
                (2, lambda m: ewkb.box_polygons_vectorized(mx0[m], my0[m], mx1[m], my1[m])),
            ):
                m = kind == kv
                if m.any():
                    tmp = np.empty(int(m.sum()), dtype=object)
                    tmp[:] = enc(m)
                    out[m] = tmp
            a = pa.array(out.tolist(), pa.binary())
        elif s is ColumnSource.REPRESENTATIVE_POINT_GEOMETRY:
            a = pa.array(ewkb.points_vectorized(cx, cy) if n else [], pa.binary())
        elif s is ColumnSource.BOUNDARY_LINE_GEOMETRY:
            ring = np.empty((n, 5, 2), dtype=np.float64)
            ring[:, 0, 0] = mx0; ring[:, 0, 1] = my0
            ring[:, 1, 0] = mx1; ring[:, 1, 1] = my0
            ring[:, 2, 0] = mx1; ring[:, 2, 1] = my1
            ring[:, 3, 0] = mx0; ring[:, 3, 1] = my1
            ring[:, 4, 0] = mx0; ring[:, 4, 1] = my0
            a = pa.array(ewkb.lines_vectorized(ring) if n else [], pa.binary())
        else:
            raise KeyError(s)
        arrays.append(a)
        names.append(col.name)
    return pa.table(dict(zip(names, arrays)))


class ProjectTable:
    """Actor-pool stage: spec resolved once per actor (the analog of the
    reference building its PackCsvBlocksTable per writer thread)."""

    def __init__(self, spec: TableSpec, negate_ids: bool = False,
                 params: EngineParams | None = None):
        self.spec = spec
        self.negate_ids = negate_ids
        self.params = params or EngineParams()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return project_table(batch, self.spec, self.negate_ids,
                             round_geometry=self.params.round_geometry)
