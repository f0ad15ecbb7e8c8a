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
import pyarrow.compute as pc
import ray
import ray.data

from osmquadtreepostgis_ray.stages.joins import bucket_hash_join
from osmquadtreepostgis_ray.util import shard_apply, sharded_agg

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
               max_rounds: int = 8,
               broadcast_nodes_max: int = 1_000_000) -> ray.data.Dataset:
    """Iterative k-core decomposition (the degeneracy peel behind graph
    dedup/community screens): repeatedly drop nodes whose degree within
    the remaining subgraph is < k; return survivors with their final
    in-core degree.

    Two plans behind one API, the pagerank admission rule: while the
    node table fits a worker (``broadcast_nodes_max``) each round ships
    one alive bitvector via ray.put and runs one embarrassingly
    parallel edge pass (zero shuffles per round); past that bound each
    round is two bucket semi-joins (alive endpoints) + one sharded
    degree count — per-worker state stays block-sized, only scalars
    (the survivor count) reach the driver.  Both plans produce
    identical tables (tests/test_shard_apply.py plan-equivalence).
    Convergence must land within ``max_rounds`` — the caller picks a
    graph-structural bound (peel depth, not diameter) and the SQL twin
    unrolls the same count; a non-converged peel raises rather than
    returning a wrong core."""
    edges = edges.materialize()
    # admission: edge rows bound node count from above, and count() on
    # a materialized dataset is metadata — only graphs that might
    # exceed the bound pay the distinct-node shuffle
    if k >= 1 and edges.count() > broadcast_nodes_max:
        n_nodes = sharded_agg(edges, ["src"],
                              {"d": ("src", "count")}).count()
        if n_nodes > broadcast_nodes_max:
            return _kcore_bucketed(edges, k, max_rounds)
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


def _kcore_bucketed(edges, k: int, max_rounds: int) -> ray.data.Dataset:
    """Data-scaled peel plan (k >= 1): the alive set is a Dataset, each
    round two bucket semi-joins keep only alive-alive edges and a
    sharded count yields the in-core degree.  Alive only shrinks and
    survivors are a subset, so survivor-count equality IS set equality
    — the convergence test costs one scalar per round."""
    alive = sharded_agg(edges, ["src"],
                        {"d": ("src", "count")}).materialize()
    n_alive = alive.count()
    deg = alive  # (src, d) of the current alive set

    # zero-row blocks can carry an EMPTY schema (CLAUDE.md) — every
    # lambda guards column access with a typed empty table, matching
    # hot_cells / the snm fanout
    _e_src = pa.table({"src": pa.array([], pa.int64())})
    _e_dst = pa.table({"dst": pa.array([], pa.int64())})
    _e_deg = pa.table({"src": pa.array([], pa.int64()),
                       "d": pa.array([], pa.int64())})
    for _ in range(max_rounds):
        ids_src = deg.map_batches(
            lambda t, _e=_e_src: (t.select(["src"])
                                  if "src" in t.column_names else _e),
            batch_format="pyarrow")
        ids_dst = deg.map_batches(
            lambda t, _e=_e_dst: (pa.table({"dst": t.column("src")})
                                  if "src" in t.column_names else _e),
            batch_format="pyarrow")
        ea = bucket_hash_join(
            bucket_hash_join(edges, ids_src, on="src"), ids_dst, on="dst")
        deg = sharded_agg(ea, ["src"], {"d": ("src", "count")})
        # typed-union join floats int key columns (CLAUDE.md) — cast back
        deg = deg.map_batches(
            lambda t, _k=k, _e=_e_deg: (
                _e if "d" not in t.column_names
                else (lambda f: pa.table({
                    "src": f.column("src").cast(pa.int64()),
                    "d": f.column("d").cast(pa.int64())}))(
                    t.filter(pc.greater_equal(t.column("d"), _k)))),
            batch_format="pyarrow").materialize()
        n_new = deg.count()
        if n_new == n_alive:
            break
        n_alive = n_new
    else:
        raise RuntimeError(f"k-core peel did not converge in {max_rounds} "
                           f"rounds; raise max_rounds (and the SQL unroll)")
    return deg.map_batches(
        lambda t: pa.table({"node": t.column("src"), "deg": t.column("d")}),
        batch_format="pyarrow")


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
             max_rounds: int,
             broadcast_nodes_max: int = 1_000_000) -> ray.data.Dataset:
    """Multi-source BFS hop distance (the isochrone / nearest-depot
    primitive): dist(v) = hops to the nearest node with id % src_mod
    == 0, over the node universe of the SYMMETRIC edge list.

    Two plans, the pagerank admission rule: while the node table fits
    a worker (``broadcast_nodes_max``) each round ships the (ids,
    dist) state via ray.put and runs one embarrassingly parallel edge
    pass (zero shuffles per round); past that bound the reached set is
    a Dataset and each round is one bucket join (dist onto out-edges)
    + one sharded min over reached ∪ candidates — per-worker state
    stays block-sized, only two scalars (reached count + dist sum)
    reach the driver per round.  Both plans produce identical tables
    (tests/test_shard_apply.py plan-equivalence).  Convergence must
    land within ``max_rounds`` (a graph-structural bound the SQL twin
    unrolls); otherwise this raises.  Unreached nodes are dropped."""
    edges = edges.materialize()
    # same cheap admission as kcore_peel: edge rows bound node count
    if edges.count() > broadcast_nodes_max:
        n_nodes = sharded_agg(edges, ["src"],
                              {"d": ("src", "count")}).count()
        if n_nodes > broadcast_nodes_max:
            return _bfs_bucketed(edges, src_mod, max_rounds)
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


def _bfs_bucketed(edges, src_mod: int, max_rounds: int) -> ray.data.Dataset:
    """Data-scaled BFS plan: the reached set (node, dist) is a Dataset;
    each round one bucket join attaches dist to out-edges, candidates
    (dst, dist+1) union the reached set, and one sharded min reduces
    per node.  dist values only decrease and the reached set only
    grows, so (count, sum-of-dist) unchanged IS a fixpoint — two
    scalars per round, never node-scale driver state."""
    # typed empty tables for the zero-row empty-schema block case
    # (CLAUDE.md) — these plans only engage past broadcast_nodes_max,
    # exactly where a stray KeyError would surface mid-run
    _e_nd = pa.table({"node": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    nodes = sharded_agg(edges, ["src"], {"d": ("src", "count")})
    reached = nodes.map_batches(
        lambda t, _m=src_mod, _e=_e_nd: (
            _e if "src" not in t.column_names
            else (lambda src: pa.table({
                "node": pa.array(src[src % _m == 0], pa.int64()),
                "dist": pa.array(np.zeros(int((src % _m == 0).sum()),
                                          np.int64),
                                 pa.int64())}))(
                t.column("src").to_numpy())),
        batch_format="pyarrow").materialize()
    n_reached = reached.count()
    if n_reached == 0:
        return reached
    s_reached = 0

    _e_sd = pa.table({"src": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})
    for _ in range(max_rounds):
        as_src = reached.map_batches(
            lambda t, _e=_e_sd: (
                _e if "node" not in t.column_names
                else pa.table({"src": t.column("node"),
                               "dist": t.column("dist")})),
            batch_format="pyarrow")
        # typed-union join floats int columns (CLAUDE.md) — cast back
        cand = bucket_hash_join(edges, as_src, on="src").map_batches(
            lambda t, _e=_e_nd: (
                _e if "dst" not in t.column_names
                else pa.table({
                    "node": t.column("dst").cast(pa.int64()),
                    "dist": pc.add(t.column("dist").cast(pa.int64()), 1)})),
            batch_format="pyarrow")
        reached = sharded_agg(reached.union(cand), ["node"],
                              {"dist": ("dist", "min")}).materialize()
        stats = reached.map_batches(
            lambda t: pa.table({
                "n": pa.array([t.num_rows], pa.int64()),
                "s": pa.array([int((pc.sum(t.column("dist")).as_py() or 0)
                                   if "dist" in t.column_names else 0)],
                              pa.int64())}),
            batch_format="pyarrow").to_pandas()
        n_new, s_new = int(stats["n"].sum()), int(stats["s"].sum())
        if (n_new, s_new) == (n_reached, s_reached):
            break
        n_reached, s_reached = n_new, s_new
    else:
        raise RuntimeError(f"BFS did not converge in {max_rounds} rounds; "
                           f"raise max_rounds (and the SQL unroll)")
    return reached


WEDGE_CHUNK = 8192


def wedge_pairs(und: ray.data.Dataset,
                chunk: int = WEDGE_CHUNK) -> ray.data.Dataset:
    """Hub-guarded EXACT wedge expansion: undirected adjacency rows
    (u, v) -> per-shard partial common-neighbor counts (v1, v2, c)
    with v1 < v2 (caller sums partials per pair).

    A center's deg^2 pair fanout is inherent output, but it must not
    land in ONE shard (the q_link_jaccard hub finding): pass 1 shards
    by center and computes deg in-shard (no degree join); centers with
    deg <= chunk expand DIRECTLY there (the common case — no second
    data-scale exchange), while over-chunk hubs split into nch =
    ceil(deg/chunk) chunks (cv = v % nch — a pure function of the row
    + the center's degree, bit-stable) and fan each row into its nch
    (c1, c2) chunk-pair groups; pass 2 shards ONLY those hub rows by
    (u, c1, c2) and expands per group, so no shard sees more than
    ~chunk^2 pairs from any one hub.  Copy overhead is deg * nch =
    output/chunk rows, paid only by hubs.  Exact — no top-M cap,
    unlike the covisit sibling."""

    def fan(df: pd.DataFrame) -> pd.DataFrame:
        return _wedge_fan_split(df, chunk)

    mixed = shard_apply(und, ["u"], fan).materialize()
    direct = mixed.map_batches(
        lambda t: (lambda f: pa.table({
            "v1": f.column("x1"), "v2": f.column("x2"),
            "c": f.column("x3")}))(
            t.filter(pc.equal(t.column("kind"), 0))),
        batch_format="pyarrow")
    fanned = mixed.map_batches(
        lambda t: (lambda f: pa.table({
            "u": f.column("x1"), "v": f.column("x2"),
            "cv": f.column("x3"), "c1": f.column("x4"),
            "c2": f.column("x5")}))(
            t.filter(pc.equal(t.column("kind"), 1))),
        batch_format="pyarrow").materialize()
    # ^ pinned: the count guard below plus shard_apply would otherwise
    # consume the lazy filter chain twice (CLAUDE.md lazy-fork hazard)
    # a sort shuffle costs seconds of coordination even on zero rows
    # (CLAUDE.md) — skip the hub exchange entirely when nothing fanned
    if fanned.count() == 0:
        return direct
    expanded = shard_apply(fanned, ["u", "c1", "c2"], _wedge_expand)
    return direct.union(expanded)


def _wedge_fan_split(df: pd.DataFrame, chunk: int) -> pd.DataFrame:
    """Pass-1 kernel (module-level for the property/star tests): small
    centers (deg <= chunk) expand to pair partials in place (kind 0:
    x1=v1, x2=v2, x3=c); hub rows fan into chunk-pair groups (kind 1:
    x1=u, x2=v, x3=cv, x4=c1, x5=c2)."""
    cols = ("x1", "x2", "x3", "x4", "x5", "kind")
    if not len(df):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    u = df["u"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    _, cnt = np.unique(u, return_counts=True)
    big_row = np.repeat(cnt > chunk, cnt)
    out = []

    if (~big_row).any():
        sm = pd.DataFrame({"u": u[~big_row], "v": v[~big_row]})
        m = sm.merge(sm, on="u", suffixes=("_1", "_2"))
        m = m[m["v_1"] < m["v_2"]]
        g = (pd.DataFrame({"x1": m["v_1"].to_numpy(np.int64),
                           "x2": m["v_2"].to_numpy(np.int64)})
             .groupby(["x1", "x2"], as_index=False)
             .size().rename(columns={"size": "x3"}))
        g["x3"] = g["x3"].astype(np.int64)
        g["x4"] = np.int64(0)
        g["x5"] = np.int64(0)
        g["kind"] = np.int64(0)
        out.append(g)

    if big_row.any():
        ub, vb = u[big_row], v[big_row]
        _, cntb = np.unique(ub, return_counts=True)
        nch = -(-cntb // chunk)  # ceil, >= 2 by construction
        nch_row = np.repeat(nch, cntb)
        cv = vb % nch_row
        rep_u = np.repeat(ub, nch_row)
        rep_v = np.repeat(vb, nch_row)
        rep_cv = np.repeat(cv, nch_row)
        tot = int(nch_row.sum())
        starts = np.repeat(np.cumsum(nch_row) - nch_row, nch_row)
        cj = np.arange(tot, dtype=np.int64) - starts
        out.append(pd.DataFrame({
            "x1": rep_u, "x2": rep_v, "x3": rep_cv,
            "x4": np.minimum(rep_cv, cj), "x5": np.maximum(rep_cv, cj),
            "kind": np.int64(1)}))

    res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {c: pd.Series([], dtype=np.int64) for c in cols})
    return res[list(cols)]


def _wedge_expand(df: pd.DataFrame) -> pd.DataFrame:
    """Pass-2 kernel: per-(u, c1, c2) pair expansion over HUB fan rows,
    each unordered pair counted exactly once (same-chunk: v1 < v2;
    cross-chunk: the single orientation whose sides match their own
    chunks)."""
    cols = ("v1", "v2", "c")
    if not len(df):
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in cols})
    m = df.merge(df, on=["u", "c1", "c2"], suffixes=("_1", "_2"))
    same = m["c1"].to_numpy() == m["c2"].to_numpy()
    a = m["v_1"].to_numpy(np.int64)
    b = m["v_2"].to_numpy(np.int64)
    keep = np.where(
        same, a < b,
        (m["cv_1"].to_numpy() == m["c1"].to_numpy())
        & (m["cv_2"].to_numpy() == m["c2"].to_numpy()))
    a, b = a[keep], b[keep]
    g = (pd.DataFrame({"v1": np.minimum(a, b), "v2": np.maximum(a, b)})
         .groupby(["v1", "v2"], as_index=False, sort=False)
         .size().rename(columns={"size": "c"}))
    g["c"] = g["c"].astype(np.int64)
    return g
