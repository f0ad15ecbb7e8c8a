"""Geometry assembly — the Ray-Data re-expression of the reference's
stateful oqt assembly stages (SURVEY.md §2.4):

  A1 MakeGeometries : member rows -> way linestrings (nodes-in-sequence)
  A2 MultiPolygons  : closed member groups -> multipolygon rings via
                      endpoint stitching, one part per ring (M8 split),
                      relation-derived ids negated (M9)
  A3 HandleRelations: route-relation refs string-agg'd onto members
  A4 AddParentTags  : parent-group tag maxima propagated onto members

Domain transposition (SURVEY.md §7.0): a "way/relation group" is the
run of 8 consecutive images ``group_id = doc_id // 8``; the group's
nodes are its members' phash geotag points ordered by doc_id; a group is
*closed* (relation/multipolygon analog) iff any member caption contains
'merge' and it has >= 3 members.  Groups of >= 6 members form TWO rings
(members below/above the median seq) — a 2-part ComplicatedPolygon.

Everything the oracle compares is exact int64: doubled shoelace area
(`area2_milli`), L1 length (`len_l1_milli`), node counts — so DuckDB
window SQL reproduces it bit-for-bit.

The assembly itself is ONE shuffle: ``groupby(group_id).map_groups`` —
the same key the reference uses (relation id), with the skew levers of
stages/skew.py available for giant groups.  Edges are stitched with
functions.geometry.stitch_chains from deliberately phash-shuffled edge
order, so correctness never depends on arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.functions import geotag
from osmquadtreepostgis_ray.functions.geometry import stitch_chains
from osmquadtreepostgis_ray.functions.tags import (count_word,
                                                   count_words_multi)
from osmquadtreepostgis_ray.stages.joins import dim_join

GROUP_SIZE = 8
W_CLOSE = "merge"  # caption word marking a relation/multipolygon group


def member_table(ds: ray.data.Dataset) -> ray.data.Dataset:
    """documents -> assembly members: group id, geotag node coords, and
    the close-marker hit count (vectorized; no payloads)."""

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        phash = geotag.phash_of(ids)
        lon_m, lat_m = geotag.lonlat_milli_from_phash(phash)
        cap = pd.Series(batch.column("text").to_pylist())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "group_id": pa.array(ids // GROUP_SIZE, pa.int64()),
            "lon_milli": pa.array(lon_m, pa.int64()),
            "lat_milli": pa.array(lat_m, pa.int64()),
            "close_hit": pa.array(count_word(cap, W_CLOSE), pa.int64()),
            "phash": pa.array(phash, pa.int64()),
        })

    return ds.map_batches(prep, batch_format="pyarrow")


def _ring_area2(xs: np.ndarray, ys: np.ndarray) -> int:
    """|doubled shoelace| over a closed node cycle (exact int64)."""
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    return int(abs(np.sum(xs * y2 - x2 * ys)))


def ring_split(k: int) -> int:
    """A2 ring split point: a closed group of k >= 6 nodes splits into
    outer ring [0, m) and second ring [m, k); smaller groups are one
    ring.  Shared with q_pip_holes — the two sites must stay
    bit-identical (drift between them is silent: each has its own
    oracle twin)."""
    return k // 2 if k >= 6 else k


def hole_shrink(ax: np.ndarray, ay: np.ndarray,
                hx: np.ndarray, hy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """A2 hole shrink: pull the second ring 3/4 toward the outer
    ring's integer centroid, clipped into the outer bbox.  (3*c + v)//4
    keeps every operand non-negative so numpy floor division equals
    DuckDB's truncating `//` (CLAUDE.md).  Shared with q_pip_holes."""
    cx, cy = int(ax.sum()) // len(ax), int(ay.sum()) // len(ay)
    return (np.clip((3 * cx + hx) // 4, ax.min(), ax.max()),
            np.clip((3 * cy + hy) // 4, ay.min(), ay.max()))


def _assemble_group(g: pd.DataFrame, split_parts: bool = True) -> pd.DataFrame:
    g = g.sort_values("doc_id").reset_index(drop=True)
    k = len(g)
    gid = int(g["group_id"].iloc[0])
    xs = g["lon_milli"].to_numpy(np.int64)
    ys = g["lat_milli"].to_numpy(np.int64)
    closed = bool((g["close_hit"] > 0).any()) and k >= 3

    def row(kind, part, n_points, measure2, osm_id):
        return {"group_id": gid, "osm_id": osm_id, "kind": kind, "part": part,
                "n_points": n_points, "measure2": measure2}

    if k == 1:
        return pd.DataFrame([row("point", 1, 1, 0, gid)])

    if not closed:
        # A1: open way — L1 polyline length over seq order
        length = int(np.abs(np.diff(xs)).sum() + np.abs(np.diff(ys)).sum())
        return pd.DataFrame([row("line", 1, k, length, gid)])

    # A2: ring edges per sub-ring, stitched from phash-shuffled order
    m = ring_split(k)
    rings = [np.arange(0, m)] if m == k else [np.arange(0, m), np.arange(m, k)]
    edges = []  # (edge_id=member seq-shuffled, a, b) node ids = seq
    for ring_nodes in rings:
        rk = len(ring_nodes)
        for j in range(rk):
            a, b = int(ring_nodes[j]), int(ring_nodes[(j + 1) % rk])
            edges.append((int(g["phash"].iloc[a]), a, b))
    edges.sort()  # phash order — decorrelated from seq order on purpose
    chains = stitch_chains(edges)
    out = []
    ring_nodes_of: dict[int, np.ndarray] = {}
    for is_closed, path in chains:
        if not is_closed:
            # G2 error channel (mperrorvec analog, /root/reference
            # src/processpostgis.cpp:121-146): a ring that failed to
            # close becomes an error row, filtered to the side dataset
            # by assemble(); never occurs for well-formed groups.
            out.append(row("error", 0, len(path), 0, -gid))
            continue
        nodes = np.array(path[:-1], dtype=np.int64)
        part = 1 if 0 in nodes else 2
        ring_nodes_of[part] = nodes
        out.append(row("polygon", part, len(nodes) + 1,
                       _ring_area2(xs[nodes], ys[nodes]), -gid))
    # A2 hole assignment (PolygonPart{outer, inners, area}, /root/reference
    # src/validategeoms.cpp:173-200; part area minus holes,
    # src/postgiswriter.cpp:561-602): groups whose second ring winds as an
    # INNER ring (transposed: even group_id) shrink it toward the outer
    # ring's integer centroid, clip into the outer bbox, verify bbox
    # containment, and emit ONE part — n_points spans both rings' closures,
    # doubled area = outer - hole.
    if {1, 2} <= set(ring_nodes_of) and gid % 2 == 0 \
            and sum(1 for r in out if r["kind"] == "polygon") == 2:
        a, b = ring_nodes_of[1], ring_nodes_of[2]
        ax, ay = xs[a], ys[a]
        hx, hy = hole_shrink(ax, ay, xs[b], ys[b])
        # containment in the outer bbox holds BY the clip above (the
        # oracle's CTE merges unconditionally for the same reason) —
        # no conditional branch, or the twin semantics would fork
        area2 = _ring_area2(ax, ay) - _ring_area2(hx, hy)
        out = [r for r in out if r["kind"] != "polygon"]
        out.append(row("polygon", 1, len(a) + len(b) + 2, area2, -gid))
    out.sort(key=lambda r: r["part"])
    if not split_parts:
        # M8 off-mode: one row per multipolygon (parts merged; the
        # reference's !split_multipolygons path, src/postgiswriter.cpp:1125)
        polys = [r for r in out if r["kind"] == "polygon"]
        rest = [r for r in out if r["kind"] != "polygon"]
        if polys:
            merged = dict(polys[0], part=1,
                          n_points=sum(r["n_points"] for r in polys),
                          measure2=sum(r["measure2"] for r in polys))
            out = rest + [merged]
    return pd.DataFrame(out)


_ASSEMBLE_COLS = ("group_id", "osm_id", "kind", "part", "n_points",
                  "measure2")


def _assemble_shard(g: pd.DataFrame, split_parts: bool) -> pd.DataFrame:
    """Whole-shard assembly: points and open ways (the overwhelming
    majority) are fully vectorized with segmented numpy; only CLOSED
    groups (close-marker hit AND k >= 3) fall back to the per-group
    Python stitcher — groupby(group_id).map_groups paid a Python task
    per corpus/8-row group, the exact per-tiny-group tax
    util.shard_apply exists to remove."""
    if not len(g):
        return pd.DataFrame({"group_id": pd.Series([], dtype=np.int64),
                             "osm_id": pd.Series([], dtype=np.int64),
                             "kind": pd.Series([], dtype=object),
                             "part": pd.Series([], dtype=np.int64),
                             "n_points": pd.Series([], dtype=np.int64),
                             "measure2": pd.Series([], dtype=np.int64)})
    g = g.sort_values(["group_id", "doc_id"], kind="mergesort") \
         .reset_index(drop=True)
    gid_arr = g["group_id"].to_numpy(np.int64)
    starts = np.flatnonzero(np.r_[True, gid_arr[1:] != gid_arr[:-1]])
    counts = np.diff(np.r_[starts, len(gid_arr)])
    gids = gid_arr[starts]
    xs = g["lon_milli"].to_numpy(np.int64)
    ys = g["lat_milli"].to_numpy(np.int64)
    closed = np.logical_or.reduceat(
        g["close_hit"].to_numpy() > 0, starts) & (counts >= 3)

    frames = []
    pm = counts == 1
    if pm.any():
        n1 = int(pm.sum())
        frames.append(pd.DataFrame({
            "group_id": gids[pm], "osm_id": gids[pm],
            "kind": np.full(n1, "point", object),
            "part": np.ones(n1, np.int64),
            "n_points": np.ones(n1, np.int64),
            "measure2": np.zeros(n1, np.int64)}))
    lm = (counts > 1) & ~closed
    if lm.any():
        # segmented L1 polyline length: per-row leg |dx|+|dy| where the
        # previous row is the same group, summed per group (reduceat)
        same = gid_arr[1:] == gid_arr[:-1]
        leg = np.r_[np.int64(0),
                    np.where(same, np.abs(np.diff(xs)) + np.abs(np.diff(ys)),
                             np.int64(0))]
        glen = np.add.reduceat(leg, starts)
        nl = int(lm.sum())
        frames.append(pd.DataFrame({
            "group_id": gids[lm], "osm_id": gids[lm],
            "kind": np.full(nl, "line", object),
            "part": np.ones(nl, np.int64),
            "n_points": counts[lm].astype(np.int64),
            "measure2": glen[lm].astype(np.int64)}))
    for i in np.flatnonzero(closed):
        s = starts[i]
        frames.append(_assemble_group(g.iloc[s:s + counts[i]], split_parts))
    out = pd.concat(frames, ignore_index=True) if frames else None
    if out is None:
        return _assemble_shard(g.iloc[:0], split_parts)
    return out[list(_ASSEMBLE_COLS)]


def assemble(ds: ray.data.Dataset, split_parts: bool = True) -> ray.data.Dataset:
    """The A1/A2 stage: one hash-shard shuffle on group_id
    (util.shard_apply; see _assemble_shard for the vectorized/Python
    split).  Rows with kind='error' (unclosed rings) are the G2 error
    channel — use `assembly_errors` to branch them off, and MATERIALIZE
    the returned dataset first when consuming both channels (a lazy
    fork re-executes the whole grouped shuffle per consumer —
    CLAUDE.md).  ``split_parts=False`` mirrors the reference's
    `split_multipolygons=False` (one row per whole multipolygon)."""
    from osmquadtreepostgis_ray.util import shard_apply

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        return _assemble_shard(g, split_parts)

    return shard_apply(member_table(ds), ["group_id"], fn)


def assembly_errors(assembled: ray.data.Dataset) -> ray.data.Dataset:
    """The error side-channel of assemble() (G2 mperrorvec analog)."""
    import pyarrow.compute as pc
    return assembled.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "error")),
        batch_format="pyarrow")


# ------------------------------------------------------------------ A3/A4

N_ROUTES = 16
ROUTE_STEP = 7


def route_membership(ds: ray.data.Dataset) -> ray.data.Dataset:
    """A3 member table: doc -> each route relation containing it
    (route r contains doc iff (doc_id + r) % ROUTE_STEP == 0) — the
    flat_map explode of relation member lists."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        r = np.arange(N_ROUTES, dtype=np.int64)
        hit = ((ids[:, None] + r[None, :]) % ROUTE_STEP) == 0
        di, ri = np.nonzero(hit)
        return pa.table({"doc_id": pa.array(ids[di], pa.int64()),
                         "route": pa.array(r[ri], pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow")


def relation_tags(ds: ray.data.Dataset) -> ray.data.Dataset:
    """A3: per-doc comma-joined sorted route refs (bus_routes analog,
    /root/reference docs/output.txt:6 columns).

    Distributed string-agg WITHOUT per-tiny-group task overhead:
    util.shard_apply groups by a doc-hash shard (DATA-scaled count,
    plus the zero-row/null-key guards — this used to hand-roll the
    same pattern with a fixed 64), and inside each shard the per-doc
    join is one vectorized pass — sort by (doc, route), segment
    offsets, Arrow binary_join over a list array.  A raw
    groupby(doc_id).map_groups would pay a Python task per ~1-row
    group on the highest-cardinality key in the repo."""
    import pyarrow.compute as pc

    from osmquadtreepostgis_ray.util import shard_apply

    def join_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "route"], kind="stable")
        ids = g["doc_id"].to_numpy()
        routes = g["route"].to_numpy()
        if not len(ids):
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "routes": pd.Series([], dtype=object)})
        new = np.r_[True, ids[1:] != ids[:-1]]
        counts = np.diff(np.r_[np.flatnonzero(new), len(ids)])
        lst = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(counts)], pa.int32()),
            pc.cast(pa.array(routes, pa.int64()), pa.string()))
        joined = pc.binary_join(lst, ",")
        return pd.DataFrame({"doc_id": ids[new],
                             "routes": joined.to_pylist()})

    return shard_apply(route_membership(ds), ["doc_id"], join_shard)


N_BOUNDARY = 12
ADMIN_STEP = 13


def admin_levels(ds: ray.data.Dataset) -> ray.data.Dataset:
    """A3 detail: ``min_admin_level`` / ``max_admin_level`` text columns —
    the per-way min/max of the parent boundary relations' admin_level
    (reference line/highway output schema, /root/reference
    docs/output.txt:6, :59; computed by oqt's HandleRelations alongside
    the bus_routes string-agg).

    Synthetic membership: boundary relation ``b in [0, N_BOUNDARY)``
    contains doc iff ``(doc_id + b*b) % ADMIN_STEP == 0`` (quadratic so
    ~46% of docs lie outside every boundary — the NULL path is real),
    and carries ``admin_level = 2 + b % 10``.  Because membership
    is a pure function of the row, the min/max fold happens INSIDE the
    batch kernel — zero shuffles; when relations arrive as a separate
    member table the same fold is parent_tags' grouped-Max machinery.
    Docs with no boundary parent get NULL (reference leaves the column
    empty for ways outside every boundary)."""
    import pyarrow.compute as pc

    b = np.arange(N_BOUNDARY, dtype=np.int64)
    lvl = 2 + (b % 10)

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        hit = ((ids[:, None] + (b * b)[None, :]) % ADMIN_STEP) == 0
        any_ = hit.any(axis=1)
        mn = np.where(hit, lvl[None, :], np.int64(999)).min(axis=1)
        mx = np.where(hit, lvl[None, :], np.int64(-1)).max(axis=1)
        valid = pa.array(any_)
        mn_s = pc.if_else(valid, pc.cast(pa.array(mn, pa.int64()), pa.string()), None)
        mx_s = pc.if_else(valid, pc.cast(pa.array(mx, pa.int64()), pa.string()), None)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "min_admin_level": mn_s,
                         "max_admin_level": mx_s})

    return ds.map_batches(kernel, batch_format="pyarrow")


def parent_tags(ds: ray.data.Dataset, keys: tuple[str, ...] = ("fast", "slow")) -> ray.data.Dataset:
    """A4: propagate the group-max of each parent key onto every member —
    combiner aggregate per group, then a size-guarded join back.

    The parent table has one row per GROUP (corpus/GROUP_SIZE rows — it
    scales with the data), so it must never transit the driver: dim_join
    broadcasts its blocks via to_arrow_refs while they fit a worker heap
    and falls back to the partitioned bucket join beyond that
    (VERDICT r2 'What's wrong' #3)."""
    from ray.data.aggregate import Max

    def prep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        # ONE fused tokenize pass for all keys (count_words_multi is
        # byte-identical to per-key count_word on the whitespace-
        # separated caption corpus — test_text_tags.py) instead of a
        # full regex scan of the corpus per key
        counts = count_words_multi(batch.column("text"), tuple(keys))
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "group_id": pa.array(ids // GROUP_SIZE, pa.int64())}
        for j, key in enumerate(keys):
            cols[f"hit_{key}"] = pa.array(counts[:, j], pa.int64())
        return pa.table(cols)

    # materialize: members feeds BOTH the aggregate and the join-back —
    # a lazy fork would re-execute the read+prep chain twice
    members = ds.map_batches(prep, batch_format="pyarrow").materialize()
    parents = members.groupby("group_id").aggregate(
        *[Max(f"hit_{k}", alias_name=f"parent_{k}") for k in keys])
    return dim_join(members, parents, on="group_id", how="left")
