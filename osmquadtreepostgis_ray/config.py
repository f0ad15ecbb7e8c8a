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


def load_style(path: str) -> Style:
    """Parse a style FILE into a Style — the analog of the reference's
    ``stylefn`` resolution (write_to_postgis passes a filename through
    prep_geometry_params, osmquadtreepostgis/__init__.py:465-470), so a
    user with an existing style JSON can drive the engine from it.

    Two accepted JSON shapes:

    1. explicit lists (this engine's native form)::

         {"feature_keys": ["join", ...],
          "parent_keys":  ["fast"],          # alias: "parent_tags"
          "other_keys":   ["scan", ...] | null,   # null => hstore catch-all
          "add_min_zoom": true}

    2. the oqt-style key->flags mapping the reference's commented
       coltags line implies (``(k, v.IsNode, v.IsWay, ...)``,
       osmquadtreepostgis/__init__.py:476)::

         {"join": {"IsFeature": true}, "scan": {}, ...}

       flagged keys become feature_keys; unflagged keys become
       other_keys (sorted, deterministic).
    """
    import json

    with open(path) as f:
        doc = json.load(f)
    if not isinstance(doc, dict):
        raise ValueError(f"style file {path!r}: expected a JSON object")

    if "feature_keys" in doc:
        other = doc.get("other_keys")
        return Style(
            feature_keys=tuple(doc["feature_keys"]),
            parent_keys=tuple(doc.get("parent_keys",
                                      doc.get("parent_tags",
                                              DEFAULT_PARENT_KEYS))),
            other_keys=None if other is None else tuple(other),
            add_min_zoom=bool(doc.get("add_min_zoom", True)),
        )

    # oqt key->flags mapping
    feature, other = [], []
    for k, v in doc.items():
        flags = v if isinstance(v, dict) else {}
        (feature if flags.get("IsFeature", bool(flags)) else other).append(k)
    return Style(feature_keys=tuple(sorted(feature)),
                 other_keys=tuple(sorted(other)) if other else None)


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
