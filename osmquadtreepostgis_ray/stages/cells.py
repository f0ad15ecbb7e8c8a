"""Cell-encoding stage — assigns every row its object quadtree cell and
its block quadtree tile (the reference's two quadtree columns,
src/postgiswriter.cpp:417-420), plus lon/lat, from the phash geotag.

Stateless vectorized `map_batches` kernel: a cell is a pure function of
the row, never of block boundaries (SURVEY.md §7.3 bit-stability)."""

from __future__ import annotations

import pyarrow as pa

from osmquadtreepostgis_ray.config import EngineParams
from osmquadtreepostgis_ray.functions import geotag, quadtree


def encode_cells_batch(batch: pa.Table, params: EngineParams | None = None,
                       id_col: str = "phash") -> pa.Table:
    p = params or EngineParams()
    phash = batch.column(id_col).to_numpy()
    lon_m, lat_m = geotag.lonlat_milli_from_phash(phash)
    lon_f, lat_f = geotag.milli_to_fixed(lon_m, lat_m)
    ix, iy = quadtree.fixed_to_ixy(lon_f, lat_f, p.cell_depth)
    cell = quadtree.encode_ixy(ix, iy, p.cell_depth)
    tile = quadtree.at_depth(cell, p.tile_depth)
    lon, lat = geotag.milli_to_degrees(lon_m, lat_m)
    for name, arr, typ in (
        ("lon_milli", lon_m, pa.int64()), ("lat_milli", lat_m, pa.int64()),
        ("lon", lon, pa.float64()), ("lat", lat, pa.float64()),
        ("cell", cell, pa.int64()), ("tile", tile, pa.int64()),
    ):
        batch = batch.append_column(name, pa.array(arr, typ))
    return batch


class CellEncoder:
    """Actor-pool form (params held per actor) for large fleets; the
    plain-function form above is used single-stage."""

    def __init__(self, params: EngineParams | None = None, id_col: str = "phash"):
        self.params = params or EngineParams()
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return encode_cells_batch(batch, self.params, self.id_col)
