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
from osmquadtreepostgis_ray.functions.tags import caption_word_stats, count_word

KINDS = ("point", "line", "polygon")

# words driving the predicate routes
W_ZORDER, W_LAYER, W_BUILDING, W_BOUNDARY = "fast", "slow", "row", "merge"


def kind_of(phash: np.ndarray) -> np.ndarray:
    return np.asarray(phash, dtype=np.int64) % 3


def route_batch(batch: pa.Table, params: EngineParams | None = None) -> pa.Table:
    """Append kind/z_order/layer/minzoom/route flags + per-feature-key
    counts + the hstore leftover — ONE tokenize pass for all of them
    (count_words_multi), computed once here so the per-table projection
    never re-scans the caption."""
    p = params or EngineParams()
    phash = batch.column("phash").to_numpy()
    cap_arr = batch.column("caption")
    if cap_arr.num_chunks == 1:
        cap_arr = cap_arr.chunk(0)
    else:
        cap_arr = pa.concat_arrays([c for c in cap_arr.chunks]) if cap_arr.num_chunks else pa.array([], pa.string())
    # dedupe: routing words may also be feature keys; index_in maps each
    # token to ONE slot, so count unique words once and look up by name
    uniq = tuple(dict.fromkeys(
        (W_ZORDER, W_LAYER, W_BUILDING, W_BOUNDARY) + tuple(p.style.feature_keys)))
    counts, tags = caption_word_stats(cap_arr, uniq, set(p.style.feature_keys))
    col = {k: counts[:, i] for i, k in enumerate(uniq)}
    kind = kind_of(phash)
    z_order = 10 * col[W_ZORDER]
    layer = col[W_LAYER]
    feature_hits = np.sum([col[k] for k in p.style.feature_keys], axis=0)
    minzoom = 20 - np.minimum(feature_hits, 14)
    is_building = (kind == 2) & (col[W_BUILDING] > 0)
    is_boundary = (kind == 2) & (col[W_BOUNDARY] > 0)
    is_highway = (kind == 1) & (z_order > 0)
    for k in p.style.feature_keys:
        batch = batch.append_column(f"kv_{k}", pa.array(col[k], pa.int64()))
    batch = batch.append_column("tags", pa.array(tags, pa.string()))
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


def resolve_alloc(alloc) -> Callable[[str, bool], Callable[[pa.Table], pa.Table]]:
    """M3 pluggable routing (the reference's settable alloc_func,
    src/postgis_python.cpp:271-296): 'default' -> 3-table geometry-kind
    routing (M1), 'extended' -> predicate routing (M2), or a user
    callable ``(table_name, batch) -> boolean mask`` applied after the
    routing columns are appended."""
    if alloc in (None, "extended"):
        return lambda name, ext=True: table_filter(name, extended=True)
    if alloc == "default":
        return lambda name, ext=False: table_filter(name, extended=False)
    if callable(alloc):
        def wrap(name, ext=True):
            def _f(t: pa.Table) -> pa.Table:
                return t.filter(pa.array(np.asarray(alloc(name, t), dtype=bool)))
            return _f
        return wrap
    raise ValueError(f"alloc must be 'default', 'extended' or callable, got {alloc!r}")


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
