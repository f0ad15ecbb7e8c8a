"""Engine configuration — the analog of the reference's PostgisParameters
(src/processpostgis.hpp:33-48) and style resolution
(osmquadtreepostgis/__init__.py:465-470).

A Style drives the schema builder and the tag-projection kernels exactly
as the reference's style file drives postgis_columns
(osmquadtreepostgis/__init__.py:39-131).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Fixed keyword vocabulary of the synthetic caption corpus (the analog of
# OSM tag keys).  feature_keys get dedicated projected columns; everything
# else lands in the hstore-style catch-all `tags` column — mirroring
# style.feature_keys / other_keys=None (osmquadtreepostgis/__init__.py:42-65).
DEFAULT_FEATURE_KEYS: tuple[str, ...] = (
    "the", "data", "query", "table", "join", "index", "row", "scan",
    "sort", "merge", "filter", "group",
)

# parent_tags analog (osmquadtreepostgis/__init__.py:59): keys propagated
# from a "parent" grouping onto members.
DEFAULT_PARENT_KEYS: tuple[str, ...] = ("fast", "slow")


@dataclass(frozen=True)
class Style:
    """Analog of the reference's style object."""

    feature_keys: tuple[str, ...] = DEFAULT_FEATURE_KEYS
    parent_keys: tuple[str, ...] = DEFAULT_PARENT_KEYS
    other_keys: tuple[str, ...] | None = None  # None => hstore catch-all
    add_min_zoom: bool = True


@dataclass(frozen=True)
class EngineParams:
    """Analog of PostgisParameters (src/processpostgis.hpp:33-48)."""

    style: Style = field(default_factory=Style)
    extended: bool = True             # 6-table routing (M2) vs 3-table (M1)
    split_multipolygons: bool = True  # M8: one row per polygon part
    validate_geometry: bool = True    # F7: repair invalid rings
    round_geometry: bool = False      # F5: 1-dp rounding of length/area
    cell_depth: int = 12              # object-quadtree depth (per-row cell)
    tile_depth: int = 8               # block-quadtree depth ("tile" column)
    min_zoom_cap: int = 20

    # Ray-side knobs (scale levers; defaults tested single-node, sized so
    # batch x concurrency stays well under a worker heap at 100 TB widths)
    batch_size: int = 16384
    read_parallelism: int | None = None
    collect_metrics: bool = False     # G3: per-stage wait/exec records
    metrics_flush_every: int = 8      # batches per worker-side flush
