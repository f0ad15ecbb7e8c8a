"""Schema system — TableSpec / ColumnSpec / ColumnSource, the analog of
the reference's schema model (src/postgiswriter.hpp:83-126) and of
postgis_columns (osmquadtreepostgis/__init__.py:39-131).

A ColumnSource names *where a cell's value comes from*; the projection
stage (stages/project.py) maps each source to a vectorized kernel — the
Ray-Data re-expression of the reference's populate_* switch
(src/postgiswriter.cpp:411-438).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import pyarrow as pa


class ColumnType(enum.Enum):
    TEXT = "text"
    BIGINT = "bigint"
    INTEGER = "integer"
    DOUBLE = "double"
    HSTORE = "hstore"          # rendered text literal (oracle-comparable)
    JSON = "json"
    GEOMETRY = "geometry"      # EWKB bytes
    POINT_GEOMETRY = "point_geometry"
    LINE_GEOMETRY = "line_geometry"
    POLYGON_GEOMETRY = "polygon_geometry"


class ColumnSource(enum.Enum):
    OSM_ID = "osm_id"                     # image/doc id (negated for relation-derived polys, M9)
    PART = "part"                         # multipolygon part ordinal (M8)
    OBJECT_QUADTREE = "object_quadtree"   # per-row cell
    BLOCK_QUADTREE = "block_quadtree"     # tile
    TAG = "tag"                           # projected caption keyword count
    OTHER_TAGS = "other_tags"             # hstore leftover
    LAYER = "layer"
    Z_ORDER = "z_order"
    MIN_ZOOM = "min_zoom"
    LENGTH = "length"
    AREA = "area"
    GEOMETRY = "geometry"
    REPRESENTATIVE_POINT_GEOMETRY = "rep_point"
    BOUNDARY_LINE_GEOMETRY = "boundary_line"


_ARROW_TYPES = {
    ColumnType.TEXT: pa.string(),
    ColumnType.BIGINT: pa.int64(),
    ColumnType.INTEGER: pa.int32(),
    ColumnType.DOUBLE: pa.float64(),
    ColumnType.HSTORE: pa.string(),
    ColumnType.JSON: pa.string(),
    ColumnType.GEOMETRY: pa.binary(),
    ColumnType.POINT_GEOMETRY: pa.binary(),
    ColumnType.LINE_GEOMETRY: pa.binary(),
    ColumnType.POLYGON_GEOMETRY: pa.binary(),
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    col_type: ColumnType
    source: ColumnSource
    tag_key: str | None = None  # for source == TAG


@dataclass(frozen=True)
class TableSpec:
    name: str
    columns: tuple[ColumnSpec, ...]

    def arrow_schema(self) -> pa.Schema:
        return pa.schema([pa.field(c.name, _ARROW_TYPES[c.col_type]) for c in self.columns])


def build_table_specs(style, extended: bool = True, add_min_zoom: bool = True) -> dict[str, TableSpec]:
    """The postgis_columns analog: 3 default tables (point/line/polygon)
    or 6 extended (+highway/building/boundary), column sets driven by the
    style's feature keys."""

    def base(geom: ColumnType) -> list[ColumnSpec]:
        cols = [
            ColumnSpec("osm_id", ColumnType.BIGINT, ColumnSource.OSM_ID),
            ColumnSpec("quadtree", ColumnType.BIGINT, ColumnSource.OBJECT_QUADTREE),
            ColumnSpec("tile", ColumnType.BIGINT, ColumnSource.BLOCK_QUADTREE),
        ]
        cols += [ColumnSpec(f"kv_{k}", ColumnType.BIGINT, ColumnSource.TAG, tag_key=k)
                 for k in style.feature_keys]
        # postgis_columns parity (osmquadtreepostgis/__init__.py:44-65,
        # :100-101): other_keys=None -> an hstore catch-all column;
        # other_keys set -> those keys get dedicated columns, NO hstore
        if getattr(style, "other_keys", None) is None:
            cols.append(ColumnSpec("tags", ColumnType.HSTORE, ColumnSource.OTHER_TAGS))
        else:
            cols += [ColumnSpec(f"kv_{k}", ColumnType.BIGINT, ColumnSource.TAG, tag_key=k)
                     for k in style.other_keys]
        if add_min_zoom:
            cols.append(ColumnSpec("minzoom", ColumnType.BIGINT, ColumnSource.MIN_ZOOM))
        cols.append(ColumnSpec("way", geom, ColumnSource.GEOMETRY))
        return cols

    point = TableSpec("point", tuple(base(ColumnType.POINT_GEOMETRY)))

    line_cols = base(ColumnType.LINE_GEOMETRY)
    line_cols.insert(3, ColumnSpec("z_order", ColumnType.BIGINT, ColumnSource.Z_ORDER))
    line_cols.insert(4, ColumnSpec("length", ColumnType.DOUBLE, ColumnSource.LENGTH))
    line = TableSpec("line", tuple(line_cols))

    poly_cols = base(ColumnType.POLYGON_GEOMETRY)
    poly_cols.insert(3, ColumnSpec("part", ColumnType.BIGINT, ColumnSource.PART))
    poly_cols.insert(4, ColumnSpec("area", ColumnType.DOUBLE, ColumnSource.AREA))
    poly_cols.append(ColumnSpec("way_point", ColumnType.POINT_GEOMETRY,
                                ColumnSource.REPRESENTATIVE_POINT_GEOMETRY))
    polygon = TableSpec("polygon", tuple(poly_cols))

    specs = {"point": point, "line": line, "polygon": polygon}
    if extended:
        specs["highway"] = TableSpec("highway", line.columns)
        specs["building"] = TableSpec("building", polygon.columns)
        bnd_cols = list(polygon.columns)
        bnd_cols.append(ColumnSpec("way_exterior", ColumnType.LINE_GEOMETRY,
                                   ColumnSource.BOUNDARY_LINE_GEOMETRY))
        specs["boundary"] = TableSpec("boundary", tuple(bnd_cols))
    return specs
