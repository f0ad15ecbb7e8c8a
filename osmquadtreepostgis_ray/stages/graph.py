"""Iterative graph computation on Ray Data: integer-exact PageRank.

Two execution plans behind one API, picked by NODE-table size (the
vertex-cut broadcast rule every distributed graph engine applies):

- broadcast scores (node table fits a worker / the driver): the edge
  list is materialized once; each iteration maps the SAME edge block
  refs with the (node -> contribution) vector shipped via one ray.put,
  per-block inboxes pre-aggregated by destination, and the node-scale
  partials summed on the driver.  Per iteration: one embarrassingly
  parallel edge pass, ZERO shuffles.
- bucket join (node table is itself data-scaled): each round is one
  bucket join (scores onto out-edges by source) + one sharded sum
  (messages by destination) — degree-annotated edges materialized once
  and reused.

All arithmetic is non-negative integer (score scaled by SCALE; damping
85/100 and degree splits via //, where truncation == floor == DuckDB's
`//` — the CLAUDE.md shared-division rule), so the DuckDB twin compares
bit-for-bit and BOTH plans produce identical tables (asserted in
tests/test_shard_apply.py).

Reference analog: none (SURVEY.md §2 has no iterative ops); this is a
beyond-reference operator in the training-data family (graph-based
dedup/quality propagation run exactly this shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from osmquadtreepostgis_ray.stages.joins import bucket_hash_join
from osmquadtreepostgis_ray.util import sharded_agg

PR_SCALE = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100


def pagerank(edges: ray.data.Dataset, iters: int = 2,
             scale: int = PR_SCALE,
             broadcast_nodes_max: int = 1_000_000) -> ray.data.Dataset:
    """(src, dst) int64 edge Dataset with BOTH directions present for
    undirected graphs (so in-degree >= 1 everywhere) -> (node, pr)
    after ``iters`` damped power iterations from a uniform integer
    start.  Nodes are edge sources; dangling mass is dropped (none
    exists for symmetric input)."""
    # materialize the edge list first: every consumer below would
    # otherwise re-execute the caller's whole edge-construction chain —
    # bucket_hash_join's schema() probe alone runs a lazy all-to-all
    edges = edges.materialize()
    deg = sharded_agg(edges, ["src"], {"d": ("src", "count")}).materialize()
    base = (scale * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN

    if deg.count() <= broadcast_nodes_max:
        return _pagerank_broadcast(edges, deg, iters, scale, base)
    return _pagerank_bucketed(edges, deg, iters, scale, base)


def _pagerank_broadcast(edges, deg, iters: int, scale: int,
                        base: int) -> ray.data.Dataset:
    tabs = [t for t in ray.get(deg.to_arrow_refs()) if t.num_rows]
    dd = pa.concat_tables([t.select(["src", "d"]) for t in tabs])
    ids = dd.column("src").to_numpy()
    d = dd.column("d").to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids, d = np.ascontiguousarray(ids[order]), np.ascontiguousarray(d[order])
    pr = np.full(len(ids), scale, np.int64)
    erefs = edges.to_arrow_refs()

    @ray.remote
    def inbox_of(tab: pa.Table, contrib) -> tuple:
        sids, cv = contrib  # ref arg auto-dereferenced (object store, not driver)
        # Ray can propagate a zero-row block without running upstream
        # UDFs on it, so its schema may be empty — skip, don't .column()
        if tab.num_rows == 0 or "src" not in tab.column_names:
            return np.array([], np.int64), np.array([], np.int64)
        src = tab.column("src").to_numpy()
        dst = tab.column("dst").to_numpy()
        c = cv[np.searchsorted(sids, src)]
        u, inv = np.unique(dst, return_inverse=True)
        acc = np.zeros(len(u), np.int64)
        np.add.at(acc, inv, c)
        return u, acc

    for _ in range(iters):
        cref = ray.put((ids, pr // d))
        parts = ray.get([inbox_of.remote(r, cref) for r in erefs])
        inbox = np.zeros(len(ids), np.int64)
        for u, acc in parts:
            inbox[np.searchsorted(ids, u)] += acc
        pr = base + (PR_DAMP_NUM * inbox) // PR_DAMP_DEN

    return ray.data.from_arrow(pa.table({"node": pa.array(ids, pa.int64()),
                                         "pr": pa.array(pr, pa.int64())}))


def _pagerank_bucketed(edges, deg, iters: int, scale: int,
                       base: int) -> ray.data.Dataset:
    ed = bucket_hash_join(edges, deg, on="src").materialize()
    pr = deg.map_batches(
        lambda t: pa.table({"src": t.column("src"),
                            "pr": pa.array(np.full(t.num_rows, scale,
                                                   np.int64), pa.int64())}),
        batch_format="pyarrow")

    for _ in range(iters):
        scored = bucket_hash_join(ed, pr, on="src")

        def contrib(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            c = df["pr"].to_numpy(np.int64) // df["d"].to_numpy(np.int64)
            g = pd.DataFrame({"dst": df["dst"].to_numpy(np.int64), "c": c})
            out = g.groupby("dst", sort=False)["c"].sum().reset_index(name="inbox")
            out["inbox"] = out["inbox"].astype(np.int64)
            return pa.Table.from_pandas(out, preserve_index=False)

        inbox = sharded_agg(scored.map_batches(contrib, batch_format="pyarrow"),
                            ["dst"], {"inbox": ("inbox", "sum")})

        # symmetric input: the inbox names every node, no left join back
        def next_pr(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            npr = base + (PR_DAMP_NUM * df["inbox"].to_numpy(np.int64)) // PR_DAMP_DEN
            return pa.table({"src": pa.array(df["dst"].to_numpy(np.int64), pa.int64()),
                             "pr": pa.array(npr, pa.int64())})

        pr = inbox.map_batches(next_pr, batch_format="pyarrow").materialize()

    return pr.map_batches(
        lambda t: pa.table({"node": t.column("src"), "pr": t.column("pr")}),
        batch_format="pyarrow")


@ray.remote
def _alive_degree_of(tab: pa.Table, alive_ref) -> tuple:
    """Per-edge-block degree partial counting only edges whose BOTH
    endpoints are alive.  Sparse (nodes, counts) output — node-scale
    arrays ship through the object store, never rows."""
    sids, alive = alive_ref
    if tab.num_rows == 0 or "src" not in tab.column_names:
        return np.array([], np.int64), np.array([], np.int64)
    src = tab.column("src").to_numpy()
    dst = tab.column("dst").to_numpy()
    ok = alive[np.searchsorted(sids, src)] & alive[np.searchsorted(sids, dst)]
    u, inv = np.unique(src[ok], return_inverse=True)
    acc = np.zeros(len(u), np.int64)
    np.add.at(acc, inv, 1)
    return u, acc


def kcore_peel(edges: ray.data.Dataset, k: int = 2,
               max_rounds: int = 8) -> ray.data.Dataset:
    """Iterative k-core decomposition (the degeneracy peel behind graph
    dedup/community screens): repeatedly drop nodes whose degree within
    the remaining subgraph is < k; return survivors with their final
    in-core degree.

    Same broadcast plan as _pagerank_broadcast: the SYMMETRIC (src,
    dst) edge list is materialized once; each round ships one alive
    bitvector via ray.put and runs one embarrassingly parallel edge
    pass (zero shuffles per round).  Convergence must land within
    ``max_rounds`` — the caller picks a graph-structural bound (peel
    depth, not diameter) and the SQL twin unrolls the same count; a
    non-converged peel raises rather than returning a wrong core."""
    edges = edges.materialize()
    tabs = [t for t in ray.get(edges.to_arrow_refs())
            if t.num_rows and "src" in t.column_names]
    ids = np.unique(np.concatenate(
        [t.column("src").to_numpy() for t in tabs] or [np.empty(0, np.int64)]))
    alive = np.ones(len(ids), bool)
    erefs = edges.to_arrow_refs()

    deg = np.zeros(len(ids), np.int64)
    for _ in range(max_rounds):
        aref = ray.put((ids, alive))
        parts = ray.get([_alive_degree_of.remote(r, aref) for r in erefs])
        deg = np.zeros(len(ids), np.int64)
        for u, acc in parts:
            deg[np.searchsorted(ids, u)] += acc
        new_alive = alive & (deg >= k)
        if (new_alive == alive).all():
            break
        alive = new_alive
    else:
        raise RuntimeError(f"k-core peel did not converge in {max_rounds} "
                           f"rounds; raise max_rounds (and the SQL unroll)")
    return ray.data.from_arrow(pa.table({
        "node": pa.array(ids[alive], pa.int64()),
        "deg": pa.array(deg[alive], pa.int64())}))


BFS_INF = np.int64(1) << 40


@ray.remote
def _relax_of(tab: pa.Table, state_ref) -> tuple:
    """Per-edge-block BFS relaxation partial: candidate dist[dst] =
    dist[src] + 1 for finite sources, min-reduced sparsely per block —
    node-scale arrays ship, never edge rows."""
    ids, dist = state_ref
    if tab.num_rows == 0 or "src" not in tab.column_names:
        return np.array([], np.int64), np.array([], np.int64)
    src = tab.column("src").to_numpy()
    dst = tab.column("dst").to_numpy()
    ds = dist[np.searchsorted(ids, src)]
    fin = ds < BFS_INF
    if not fin.any():
        return np.array([], np.int64), np.array([], np.int64)
    u, inv = np.unique(dst[fin], return_inverse=True)
    acc = np.full(len(u), BFS_INF, np.int64)
    np.minimum.at(acc, inv, ds[fin] + 1)
    return u, acc


def bfs_hops(edges: ray.data.Dataset, src_mod: int,
             max_rounds: int) -> ray.data.Dataset:
    """Multi-source BFS hop distance (the isochrone / nearest-depot
    primitive): dist(v) = hops to the nearest node with id % src_mod
    == 0, over the node universe of the SYMMETRIC edge list.

    kcore_peel's broadcast plan: edges materialized once; each round
    ships the (ids, dist) state via ray.put and runs one
    embarrassingly parallel edge pass (zero shuffles per round).
    Driver state is node-table-sized — the same admission condition as
    the pagerank broadcast plan.  Convergence must land within
    ``max_rounds`` (a graph-structural bound the SQL twin unrolls);
    otherwise this raises.  Unreached nodes are dropped."""
    edges = edges.materialize()
    tabs = [t for t in ray.get(edges.to_arrow_refs())
            if t.num_rows and "src" in t.column_names]
    ids = np.unique(np.concatenate(
        [t.column("src").to_numpy() for t in tabs] or [np.empty(0, np.int64)]))
    dist = np.where(ids % src_mod == 0, np.int64(0), BFS_INF)
    erefs = edges.to_arrow_refs()

    for _ in range(max_rounds):
        sref = ray.put((ids, dist))
        parts = ray.get([_relax_of.remote(r, sref) for r in erefs])
        nd = dist.copy()
        for u, acc in parts:
            np.minimum.at(nd, np.searchsorted(ids, u), acc)
        if (nd == dist).all():
            break
        dist = nd
    else:
        raise RuntimeError(f"BFS did not converge in {max_rounds} rounds; "
                           f"raise max_rounds (and the SQL unroll)")
    keep = dist < BFS_INF
    return ray.data.from_arrow(pa.table({
        "node": pa.array(ids[keep], pa.int64()),
        "dist": pa.array(dist[keep], pa.int64())}))
