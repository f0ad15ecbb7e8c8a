"""Table routing — the engine's M1/M2/M3.

Reference semantics: geometry type picks the output table
(default_table_alloc, src/postgiswriter.cpp:285-292); extended routing
adds predicate routes — z_order lines -> highway, building-tagged
polygons -> building, boundary relations -> polygon AND boundary (1->2
fanout) (extended_table_alloc, src/postgis_python.cpp:219-269).

Transposed to the image corpus (all rules pure functions of the row and
SQL-replicable):

- geometry kind  : phash % 3 -> 0 point, 1 line, 2 polygon
- z_order        : 10 * count_word(caption, 'fast')          (lines)
- layer          : count_word(caption, 'slow')
- building if    : kind==polygon and count_word(caption,'row') > 0
- boundary fanout: kind==polygon and count_word(caption,'merge') > 0
                   -> routed to polygon AND boundary; osm_id negated in
                   both (M9, src/postgiswriter.cpp:525)
- minzoom        : 20 - least(total feature-key hits, 14)    (A5 analog)

Routing emits a `tables` assignment per row via one vectorized
`map_batches` that appends routing columns; the per-table branch is a
zero-copy Arrow filter.  The 1->2 fanout is handled by the boundary
branch re-reading the same rows (no row duplication in the main stream —
cheaper than a flat_map explode and equivalent to the reference's
multi-table CsvBlock routing)."""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from osmquadtreepostgis_ray.config import EngineParams
from osmquadtreepostgis_ray.functions.tags import count_word

KINDS = ("point", "line", "polygon")

# words driving the predicate routes
W_ZORDER, W_LAYER, W_BUILDING, W_BOUNDARY = "fast", "slow", "row", "merge"


def kind_of(phash: np.ndarray) -> np.ndarray:
    return np.asarray(phash, dtype=np.int64) % 3


def route_batch(batch: pa.Table, params: EngineParams | None = None) -> pa.Table:
    """Append kind/z_order/layer/minzoom/route flags. Vectorized."""
    p = params or EngineParams()
    phash = batch.column("phash").to_numpy()
    cap = pd.Series(batch.column("caption").to_pylist())
    kind = kind_of(phash)
    z_order = 10 * count_word(cap, W_ZORDER)
    layer = count_word(cap, W_LAYER)
    feature_hits = np.zeros(len(cap), dtype=np.int64)
    for k in p.style.feature_keys:
        feature_hits += count_word(cap, k)
    minzoom = 20 - np.minimum(feature_hits, 14)
    is_building = (kind == 2) & (count_word(cap, W_BUILDING) > 0)
    is_boundary = (kind == 2) & (count_word(cap, W_BOUNDARY) > 0)
    is_highway = (kind == 1) & (z_order > 0)
    for name, arr, typ in (
        ("kind", kind, pa.int64()), ("z_order", z_order, pa.int64()),
        ("layer", layer, pa.int64()), ("minzoom", minzoom, pa.int64()),
        ("is_building", is_building, pa.bool_()),
        ("is_boundary", is_boundary, pa.bool_()),
        ("is_highway", is_highway, pa.bool_()),
    ):
        batch = batch.append_column(name, pa.array(arr, typ))
    return batch


def table_filter(table_name: str, extended: bool = True) -> Callable[[pa.Table], pa.Table]:
    """Zero-copy Arrow predicate selecting the rows routed to a table."""

    def _f(t: pa.Table) -> pa.Table:
        kind = t.column("kind")
        if table_name == "point":
            mask = pc.equal(kind, 0)
        elif table_name == "line":
            mask = pc.equal(kind, 1)
            if extended:
                mask = pc.and_(mask, pc.invert(t.column("is_highway")))
        elif table_name == "highway":
            mask = t.column("is_highway")
        elif table_name == "polygon":
            mask = pc.equal(kind, 2)
            if extended:
                mask = pc.and_(mask, pc.invert(t.column("is_building")))
        elif table_name == "building":
            mask = t.column("is_building")
        elif table_name == "boundary":
            mask = t.column("is_boundary")
        else:
            raise KeyError(table_name)
        return t.filter(mask)

    return _f


def route_sql_exprs(caption_expr: str = "text", phash_expr: str = "phash") -> dict[str, str]:
    """DuckDB twins of every routing column (oracle parity)."""
    from osmquadtreepostgis_ray.config import DEFAULT_FEATURE_KEYS
    from osmquadtreepostgis_ray.functions.tags import count_word_sql

    feats = " + ".join(count_word_sql(caption_expr, k) for k in DEFAULT_FEATURE_KEYS)
    kind = f"(({phash_expr}) % 3)"
    z = f"(10 * {count_word_sql(caption_expr, W_ZORDER)})"
    return {
        "kind": kind,
        "z_order": z,
        "layer": count_word_sql(caption_expr, W_LAYER),
        "minzoom": f"(20 - least({feats}, 14))",
        "is_building": f"({kind} = 2 AND {count_word_sql(caption_expr, W_BUILDING)} > 0)",
        "is_boundary": f"({kind} = 2 AND {count_word_sql(caption_expr, W_BOUNDARY)} > 0)",
        "is_highway": f"({kind} = 1 AND {z} > 0)",
    }
