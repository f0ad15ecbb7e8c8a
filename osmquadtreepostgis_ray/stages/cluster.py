"""Connected components over a near-dup edge list — the clustering step
of a dedup pipeline (pairs from minhash / ngram / embedding / ahash
near-dup become per-document cluster ids; one representative per
cluster survives).

Algorithm: two-level CONTRACTION (Boruvka-style), diameter-independent
— a fixed number of shuffles instead of one round per graph hop:

1. block-local union-find: each edge block contracts to a (node ->
   local root) mapping in one map_batches pass; every edge lives in
   exactly one block, so all within-block connectivity collapses.
2. induced root graph: a node that appears in several blocks carries
   different local roots — those roots are connected.  One hash shuffle
   of the mapping on node, then per node a STAR (min root -> each other
   root), vectorized per bucket.  Star, not clique: output is linear in
   node occurrences (k-1 edges for a node seen in k blocks), and
   within-bucket dedup collapses repeats, so the induced graph is
   bounded by cross-block node occurrences — never by the input edge
   count, and never quadratic per node.
3. solve: the contracted graph is grouped to one task and solved with
   union-find there (a worker, never the driver).  Near-dup cluster
   forests contract geometrically, so this fits; the guard raises with
   the measured size if it does not (the scale path repeats step 1-2 on
   the contracted graph until it fits — same operators, recursion depth
   log of the reduction ratio).
4. label join-back: (node, root) x (root, component) — the label table
   is bounded by the solve ceiling, so it broadcasts (ray.put once,
   Arrow join per batch) instead of shuffling; a grouped min collapses
   a node's duplicate rows (its roots all carry the same component).

Every id column stays a pure function of the row (CLAUDE.md
bit-stability): roots are min-ids within their block partition, and the
final component is the min node id of the component regardless of how
edges were blocked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from osmquadtreepostgis_ray.functions import geotag, quadtree
from osmquadtreepostgis_ray.util import shard_apply, sharded_agg
from osmquadtreepostgis_ray.stages.joins import (_HASH_MULT, broadcast_join,
                                                 default_buckets)

SOLVE_LIMIT = 5_000_000  # contracted-edge ceiling for the one-task solve
# block-contracted mappings at or below this row count skip the
# star-contract shuffles and solve in one pass (≈3 MB driver-held max —
# the same order as the broadcast the staged path ships anyway)
FASTPATH_LIMIT = 200_000


def _union_find(a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """Min-id union-find over an edge list -> {node: component_min}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
        parent.setdefault(x, find(x))
        parent.setdefault(y, find(y))
    return {x: find(x) for x in parent}


def _local_contract(a_col: str, b_col: str):
    def fn(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy().astype(np.int64)
        b = batch.column(b_col).to_numpy().astype(np.int64)
        lab = _union_find(a, b)
        nodes = np.fromiter(lab.keys(), dtype=np.int64, count=len(lab))
        roots = np.fromiter(lab.values(), dtype=np.int64, count=len(lab))
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "root": pa.array(roots, pa.int64())})
    return fn


def connected_components(edges: ray.data.Dataset, a_col: str = "a",
                         b_col: str = "b") -> ray.data.Dataset:
    """(a, b) edge Dataset -> (node, component) with component = min
    node id in the node's connected component.  Nodes are the edge
    endpoints (an isolated document simply keeps its own id — callers
    union it in if they need every row labelled)."""
    # _local_contract emits one (node, root) row per distinct node per
    # BLOCK: many tiny edge blocks (e.g. a 256-shard upstream) duplicate
    # every shared node ~blocks times, inflating the mapping past the
    # one-task fastpath for graphs that easily fit it.  Coalesce small
    # edge inputs to ~1 block/CPU first (repartition without sort keys —
    # a split/merge, not a key exchange); big inputs keep their blocks.
    from osmquadtreepostgis_ray.util import estimate_bytes, pool_size
    est = estimate_bytes(edges)
    if est is not None and est <= 256 << 20:
        edges = edges.repartition(pool_size())
    mapping = edges.map_batches(_local_contract(a_col, b_col),
                                batch_format="pyarrow",
                                batch_size=None).materialize()
    n_map = mapping.count()
    if n_map == 0:
        # no edges at all (every node isolated): a typed empty result so
        # downstream joins still see the (node, component) schema
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "component": pa.array([], pa.int64())}))

    if n_map <= FASTPATH_LIMIT:
        # the block-contracted mapping already fits ONE solve (a far
        # tighter bound than SOLVE_LIMIT): solving it directly skips the
        # star-contract + solve + join-back shuffles — three stage
        # launches that dominate wall time on small/medium graphs.  The
        # (node, root) rows ARE edges of the induced graph, so one
        # union-find yields the same min-id components the staged path
        # produces (bit-identical: component = min node id either way).
        mt = pa.concat_tables(
            b for b in mapping.iter_batches(batch_format="pyarrow"))
        lab = _union_find(mt.column("node").to_numpy(),
                          mt.column("root").to_numpy())
        nodes = np.fromiter(lab.keys(), dtype=np.int64, count=len(lab))
        comps = np.fromiter(lab.values(), dtype=np.int64, count=len(lab))
        return ray.data.from_arrow(pa.table(
            {"node": pa.array(nodes, pa.int64()),
             "component": pa.array(comps, pa.int64())}))

    # induced root edges: shuffle the mapping on node; per node emit the
    # STAR (min root, other root) — self-pairs included so every root
    # reaches the solver and the final join covers single-block
    # components.  All per-bucket work is vectorized numpy.
    nbuckets = default_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        b = (batch.column("node").to_numpy() * _HASH_MULT) % nbuckets
        return batch.append_column("__bucket", pa.array(b, pa.int64()))

    def star(g) -> pa.Table:
        import pandas as pd
        if isinstance(g, pd.DataFrame):
            nodes = g["node"].to_numpy(np.int64)
            roots = g["root"].to_numpy(np.int64)
        else:
            nodes = g.column("node").to_numpy()
            roots = g.column("root").to_numpy()
        order = np.lexsort((roots, nodes))
        nodes, roots = nodes[order], roots[order]
        new = np.r_[True, nodes[1:] != nodes[:-1]]
        gid = np.cumsum(new) - 1
        minroot = roots[np.flatnonzero(new)][gid]  # sorted: first = min
        pairs = np.unique(np.stack([minroot, roots], axis=1), axis=0)
        return pa.table({"ra": pa.array(pairs[:, 0], pa.int64()),
                         "rb": pa.array(pairs[:, 1], pa.int64()),
                         "one": pa.array(np.zeros(len(pairs), np.int8), pa.int8())})

    contracted = (mapping.map_batches(tag, batch_format="pyarrow")
                  .groupby("__bucket").map_groups(star, batch_format="pyarrow"))

    def solve(g) -> "pa.Table":
        import pandas as pd
        if isinstance(g, pd.DataFrame):
            a = g["ra"].to_numpy(np.int64)
            b = g["rb"].to_numpy(np.int64)
        else:
            a = g.column("ra").to_numpy()
            b = g.column("rb").to_numpy()
        if len(a) > SOLVE_LIMIT:
            raise RuntimeError(
                f"contracted graph has {len(a)} edges > SOLVE_LIMIT; "
                "re-contract (repeat steps 1-2) before solving")
        lab = _union_find(a, b)
        nodes = np.fromiter(lab.keys(), dtype=np.int64, count=len(lab))
        roots = np.fromiter(lab.values(), dtype=np.int64, count=len(lab))
        return pa.table({"root": pa.array(nodes, pa.int64()),
                         "component": pa.array(roots, pa.int64())})

    # materialize: to_arrow_refs below executes the chain, and a lazy
    # schema probe on the sort output would re-execute it (CLAUDE.md)
    root_labels = contracted.groupby("one").map_groups(
        solve, batch_format="pyarrow").materialize()

    # label join-back: root_labels is the CONTRACTED table (bounded by
    # SOLVE_LIMIT — the same bound the solve step already requires), so
    # a broadcast join beats a second shuffle; its blocks broadcast as
    # object-store refs (never through the driver).  Then collapse a
    # node's duplicate rows (one per block it appeared in).
    labelled = broadcast_join(mapping, root_labels, on="root")
    # node cardinality scales with the graph: sharded C-level min,
    # not Dataset.aggregate's per-key reduce (util.sharded_agg)
    return sharded_agg(labelled.select_columns(["node", "component"]),
                       ["node"], {"component": ("component", "min")})


# -------------------------------------------------- distributed k-means
# Semantic-dedup / corpus-bucketing clustering over the embedding
# column.  Integer-exact Lloyd so the DuckDB oracle (unrolled-CTE twin)
# compares full assignments: embeddings quantized with floor(x*1024)
# (floor, not round — round's half-tie resolves differently in numpy
# [half-even] vs DuckDB [half-away], and float32 values of form odd/16
# DO land exactly on .5 after scaling), centroid update is the
# non-negative integer mean sum // count.

KM_SCALE = 1024
KM_SHIFT = 1024  # input values in (-1, 1) -> quantized strictly positive


def _quantize(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    emb = t.column("embedding")
    n = len(t)
    flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
    d = len(flat) // max(n, 1)
    q = np.floor(flat * KM_SCALE).astype(np.int64) + KM_SHIFT
    return pa.table({"vec_id": t.column("vec_id"),
                     "q": pa.FixedSizeListArray.from_arrays(pa.array(q, pa.int64()), d)})


def _qmat(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = t.column("vec_id").to_numpy()
    col = t.column("q")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return ids, flat.reshape(len(ids), -1)


def kmeans_assign(ds: ray.data.Dataset, k: int = 4, iters: int = 3,
                  return_centroids: bool = False,
                  return_corpus: bool = False):
    """Distributed Lloyd over (vec_id, embedding) rows: `iters` assign
    passes with `iters - 1` integer-mean centroid updates between them.

    Scale shape: the quantized projection is materialized ONCE as the
    iterative working set (at 100 TB this would be a partcache parquet
    checkpoint instead — same contract: no re-read of the raw input per
    round).  Each round ships only (k x dim) centroid ints via ray.put
    and returns (k x dim+1) partial sums per batch — the shuffle-free
    combiner topology; empty clusters keep their previous centroid."""
    corpus = ds.map_batches(_quantize, batch_format="pyarrow").materialize()
    init = corpus.filter(expr=f"vec_id < {k}").to_pandas().sort_values("vec_id")
    cents = np.stack(init["q"].to_numpy())[:k].astype(np.int64)

    for it in range(iters - 1):
        cref = ray.put(cents)

        def part(t: pa.Table, cref=cref) -> pa.Table:
            C = ray.get(cref)
            ids, Q = _qmat(t)
            d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)  # ties -> smallest cluster, like ORDER BY d2, j
            kk, dd = C.shape
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            sums = np.zeros((kk, dd), dtype=np.int64)
            np.add.at(sums, a, Q)
            return pa.table({"cluster": pa.array(np.arange(kk), pa.int64()),
                             "cnt": pa.array(cnt, pa.int64()),
                             "sums": pa.FixedSizeListArray.from_arrays(
                                 pa.array(sums.ravel(), pa.int64()), dd)})

        parts = corpus.map_batches(part, batch_format="pyarrow").to_pandas()
        cnt = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        for _, row in parts.iterrows():
            cnt[row["cluster"]] += row["cnt"]
            sums[row["cluster"]] += np.asarray(row["sums"], dtype=np.int64)
        nz = cnt > 0
        cents = cents.copy()
        cents[nz] = sums[nz] // cnt[nz, None]  # non-negative: floor == trunc

    cref = ray.put(cents)

    def assign(t: pa.Table, cref=cref) -> pa.Table:
        C = ray.get(cref)
        ids, Q = _qmat(t)
        d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(a.astype(np.int64), pa.int64()),
                         "d2": pa.array(d2[np.arange(len(a)), a], pa.int64())})

    out = corpus.map_batches(assign, batch_format="pyarrow")
    if return_centroids and return_corpus:
        # corpus = the materialized quantized projection this function
        # already built — callers that need another pass over (vec_id,
        # q) rows (semantic_dedup's tag stage) reuse it instead of
        # paying a second raw read + quantize of the input
        return out, cents, corpus
    if return_centroids:
        # the (k x dim) int codebook the assign pass used — what a PQ
        # encoder stores alongside the codes (tiny, driver-held)
        return out, cents
    return out


def pq_train(ds: ray.data.Dataset, m: int = 4, kc: int = 4, iters: int = 3):
    """Train all m product-quantization codebooks in ONE pass per Lloyd
    round (vs m sequential kmeans_assign runs = m materializations and
    m x (iters-1) combiner rounds): the quantized corpus materializes
    once, each round's map_batches emits (subspace, cluster, cnt, sums)
    partials for EVERY subspace, and the driver combines the bounded
    m x kc x sd int table.  Per-subspace math is bit-identical to
    kmeans_assign over the sliced corpus (same vec_id < kc init, same
    argmin tie, same integer-mean update with empty-cluster carry-over)
    — pinned by the embed_pq oracle.  Returns (materialized quantized
    corpus, [m x (kc, sd) centroid arrays])."""
    corpus = ds.map_batches(_quantize, batch_format="pyarrow").materialize()
    init = corpus.filter(expr=f"vec_id < {kc}").to_pandas().sort_values("vec_id")
    Q0 = np.stack(init["q"].to_numpy())[:kc].astype(np.int64)
    d = Q0.shape[1]
    sd = d // m
    cents = [Q0[:, s * sd:(s + 1) * sd].copy() for s in range(m)]

    for _it in range(iters - 1):
        cref = ray.put(np.stack(cents))          # (m, kc, sd)

        def part(t: pa.Table, cref=cref) -> pa.Table:
            C = ray.get(cref)
            _ids, Qf = _qmat(t)
            ss, jj, cc, sums_l = [], [], [], []
            for s in range(m):
                Qs = Qf[:, s * sd:(s + 1) * sd]
                a = ((Qs[:, None, :] - C[s][None, :, :]) ** 2).sum(axis=2) \
                    .argmin(axis=1)
                cnt = np.bincount(a, minlength=kc).astype(np.int64)
                sums = np.zeros((kc, sd), dtype=np.int64)
                np.add.at(sums, a, Qs)           # int64-exact (CLAUDE.md)
                ss.append(np.full(kc, s, np.int64))
                jj.append(np.arange(kc, dtype=np.int64))
                cc.append(cnt)
                sums_l.append(sums)
            return pa.table({
                "subspace": pa.array(np.concatenate(ss), pa.int64()),
                "cluster": pa.array(np.concatenate(jj), pa.int64()),
                "cnt": pa.array(np.concatenate(cc), pa.int64()),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(np.concatenate(sums_l).ravel(), pa.int64()), sd),
            })

        parts = corpus.map_batches(part, batch_format="pyarrow").to_pandas()
        cnt = np.zeros((m, kc), dtype=np.int64)
        sums = np.zeros((m, kc, sd), dtype=np.int64)
        for _, row in parts.iterrows():
            cnt[row["subspace"], row["cluster"]] += row["cnt"]
            sums[row["subspace"], row["cluster"]] += np.asarray(
                row["sums"], dtype=np.int64)
        for s in range(m):
            nz = cnt[s] > 0
            cents[s][nz] = sums[s][nz] // cnt[s][nz, None]
    return corpus, cents


def pq_assign(corpus: ray.data.Dataset, cents: list, m: int) -> ray.data.Dataset:
    """One streaming pass emitting ALL m PQ codes per vector:
    (vec_id, subspace, cluster, d2) rows — the q_embed_pq output shape."""
    C = np.stack(cents)
    sd = C.shape[2]
    cref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        Cs = ray.get(cref)
        ids, Qf = _qmat(t)
        n = len(ids)
        out_s, out_j, out_d = [], [], []
        for s in range(m):
            Qs = Qf[:, s * sd:(s + 1) * sd]
            d2 = ((Qs[:, None, :] - Cs[s][None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            out_s.append(np.full(n, s, np.int64))
            out_j.append(a.astype(np.int64))
            out_d.append(d2[np.arange(n), a])
        return pa.table({
            "vec_id": pa.array(np.tile(ids, m), pa.int64()),
            "subspace": pa.array(np.concatenate(out_s), pa.int64()),
            "cluster": pa.array(np.concatenate(out_j), pa.int64()),
            "d2": pa.array(np.concatenate(out_d), pa.int64()),
        })

    return corpus.map_batches(assign, batch_format="pyarrow")


# ------------------------------------------------------------------ DBSCAN

def dbscan(points: ray.data.Dataset, eps_milli: int = 1500, min_pts: int = 4,
           depth: int = 6) -> ray.data.Dataset:
    """Grid-based distributed DBSCAN over exact integer milli-degree
    points — the density analog of the reference's fixed-depth quadtree
    grouping (src/sortblocks groups by cell; here groups emerge from
    spatial density).  Returns ``(event_id, label)``: label = the MIN
    core event_id of the cluster, ``-1`` for noise; a border point takes
    the MIN label among its eps-reachable cores (deterministic and
    scan-order-free, unlike classic DBSCAN's first-reached rule — the
    CLAUDE.md bit-stability invariant).

    Plan — pair volume = n x avg eps-degree (the inherent DBSCAN cost);
    no data-scaled driver state at any stage:

    1. ONE groupby(cell) exchange at ``depth`` (requires eps <= cell
       width, so an eps-disk bbox covers <= 3x3 cells): each point lands
       once as OWNER in its home cell and fans as CANDIDATE to every
       cell its eps-bbox overlaps.  Every eps-neighbor of an owner
       appears in the owner's home group exactly once, so the per-owner
       neighbor count (core flag) is complete locally and each ordered
       pair is emitted exactly once.
    2. each unordered pair's TWO directed emissions (one from each
       end's home group) co-locate in one shard keyed by (lo, hi) —
       a vectorized merge combines both core flags with no join stage.
    3. core-core edges + one self edge per core -> connected_components
       (block contraction, worker-side solve; self edges keep isolated
       cores labelled).
    4. border rows shard with comp on the core id (one shard_apply
       replaces the bucket join), emitting per-border candidate labels.
    5. final labelling: ONE shard_apply on event_id over the typed
       union [owner rows | core labels | border labels] — min label per
       point, -1 when none (noise).  Owner rows double as the base
       point list, so the input is consumed exactly once.

    Partitioning assumption (SURVEY §2 custom-operator rule): cell
    population is bounded by spatial density x cell area, never by
    dataset size; hot cells split by raising ``depth`` (and lowering
    eps accordingly).
    """
    cell_w = min(geotag.LON_MOD, 180_000) >> depth
    if eps_milli > cell_w:
        raise ValueError(f"eps {eps_milli} > cell width {cell_w} at depth {depth}")
    eps2 = eps_milli * eps_milli

    def fan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "side": pa.array([], pa.int8()),
                             "id": pa.array([], pa.int64()),
                             "x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        eid = t.column("event_id").to_numpy()
        x = t.column("lon_milli").to_numpy()
        y = t.column("lat_milli").to_numpy()
        fx, fy = geotag.milli_to_fixed(x, y)
        ix, iy = quadtree.fixed_to_ixy(fx, fy, depth)
        own = quadtree.encode_ixy(ix, iy, depth)
        # candidate fanout: the full cell rectangle of the eps-disk bbox
        # (corner-only enumeration misses middle cells when 2*eps spans
        # more than two cell boundaries — same rule as radius_join)
        lo_x = np.clip(x - eps_milli, 0, geotag.LON_MOD - 1)
        lo_y = np.clip(y - eps_milli, 0, geotag.LAT_MOD - 1)
        hi_x = np.clip(x + eps_milli, 0, geotag.LON_MOD - 1)
        hi_y = np.clip(y + eps_milli, 0, geotag.LAT_MOD - 1)
        fx0, fy0 = geotag.milli_to_fixed(lo_x, lo_y)
        fx1, fy1 = geotag.milli_to_fixed(hi_x, hi_y)
        ix0, iy0 = quadtree.fixed_to_ixy(fx0, fy0, depth)
        ix1, iy1 = quadtree.fixed_to_ixy(fx1, fy1, depth)
        nx, ny = ix1 - ix0 + 1, iy1 - iy0 + 1
        reps = nx * ny
        total = int(reps.sum())
        local = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        ny_r = np.repeat(ny, reps)
        cix = np.repeat(ix0, reps) + local // ny_r
        ciy = np.repeat(iy0, reps) + local % ny_r
        cells = np.concatenate([own, quadtree.encode_ixy(cix, ciy, depth)])
        side = np.concatenate([np.zeros(len(eid), np.int8),
                               np.ones(total, np.int8)])
        ids = np.concatenate([eid, np.repeat(eid, reps)])
        xs = np.concatenate([x, np.repeat(x, reps)])
        ys = np.concatenate([y, np.repeat(y, reps)])
        return pa.table({"cell": pa.array(cells, pa.int64()),
                         "side": pa.array(side, pa.int8()),
                         "id": pa.array(ids, pa.int64()),
                         "x": pa.array(xs, pa.int64()),
                         "y": pa.array(ys, pa.int64())})

    def grp(g: pd.DataFrame) -> pd.DataFrame:
        own = g[g["side"] == 0]
        cand = g[g["side"] == 1]
        oid = own["id"].to_numpy(np.int64)
        if not len(oid) or not len(cand):
            z = np.empty(0, np.int64)
            return pd.DataFrame({"a": z, "b": z,
                                 "a_core": np.empty(0, np.int8),
                                 "f": np.empty(0, np.int8)})
        cid = cand["id"].to_numpy(np.int64)
        dx = cand["x"].to_numpy(np.int64)[None, :] - own["x"].to_numpy(np.int64)[:, None]
        dy = cand["y"].to_numpy(np.int64)[None, :] - own["y"].to_numpy(np.int64)[:, None]
        m = (dx * dx + dy * dy <= eps2) & (cid[None, :] != oid[:, None])
        deg = m.sum(1)
        core = (deg + 1 >= min_pts).astype(np.int8)
        oi, ci = np.nonzero(m)
        return pd.DataFrame({
            "a": np.concatenate([oid[oi], oid]),
            "b": np.concatenate([cid[ci], np.full(len(oid), -1, np.int64)]),
            "a_core": np.concatenate([core[oi], core]),
            "f": np.concatenate([np.zeros(len(oi), np.int8),
                                 np.ones(len(oid), np.int8)])})

    def _typed(t: pa.Table) -> bool:
        return t.num_rows > 0 and "f" in t.column_names

    def to_dirpairs(t: pa.Table) -> pa.Table:
        """Directed pair rows keyed by the unordered pair (lo, hi)."""
        if not _typed(t):
            z = pa.array([], pa.int64())
            return pa.table({"lo": z, "hi": z,
                             "src_lo": pa.array([], pa.int8()),
                             "core": pa.array([], pa.int8())})
        t = t.filter(pc.equal(t.column("f"), 0))
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        lo = np.minimum(a, b)
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(np.maximum(a, b), pa.int64()),
                         "src_lo": pa.array((a == lo).astype(np.int8), pa.int8()),
                         "core": t.column("a_core").cast(pa.int8())})

    def merge_pair(g: pd.DataFrame) -> pd.DataFrame:
        """Both directed emissions of an unordered pair co-locate here
        (symmetric distance guarantees exactly one per end): a
        vectorized merge combines the two core flags; emits CC edges
        (kind 0: both core) and border rows (kind 1: u = the non-core
        end, v = the core end)."""
        left = g[g["src_lo"] == 1]
        right = g[g["src_lo"] == 0]
        m = left.merge(right, on=["lo", "hi"], suffixes=("_l", "_r"))
        lo = m["lo"].to_numpy(np.int64)
        hi = m["hi"].to_numpy(np.int64)
        cl = m["core_l"].to_numpy(np.int8)
        cr = m["core_r"].to_numpy(np.int8)
        both = (cl == 1) & (cr == 1)
        blo = (cl == 0) & (cr == 1)   # lo is the border end
        bhi = (cl == 1) & (cr == 0)   # hi is the border end
        return pd.DataFrame({
            "kind": np.concatenate([np.zeros(int(both.sum()), np.int8),
                                    np.ones(int(blo.sum() + bhi.sum()), np.int8)]),
            "u": np.concatenate([lo[both], lo[blo], hi[bhi]]),
            "v": np.concatenate([hi[both], hi[blo], lo[bhi]])})

    raw = (points.map_batches(fan, batch_format="pyarrow")
           .groupby("cell").map_groups(grp, batch_format="pandas")
           .materialize())  # forked: pair stream / owner stream (x2)
    merged = shard_apply(raw.map_batches(to_dirpairs, batch_format="pyarrow"),
                         ["lo", "hi"], merge_pair) \
        .materialize()      # forked: CC edges / border rows

    def _merged_ok(t: pa.Table) -> bool:
        return t.num_rows > 0 and "kind" in t.column_names

    def to_edges(t: pa.Table) -> pa.Table:
        if not _merged_ok(t):
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z})
        t = t.filter(pc.equal(t.column("kind"), 0))
        return pa.table({"a": t.column("u"), "b": t.column("v")})

    def self_edges(t: pa.Table) -> pa.Table:
        if not _typed(t):
            z = pa.array([], pa.int64())
            return pa.table({"a": z, "b": z})
        t = t.filter(pc.and_(pc.equal(t.column("f"), 1),
                             pc.equal(t.column("a_core"), 1)))
        return pa.table({"a": t.column("a"), "b": t.column("a")})

    # typed anchor: zero-row blocks propagate with an EMPTY schema and a
    # union of all-empty streams would have schema None (CLAUDE.md)
    edges = ray.data.from_arrow(pa.table(
        {"a": pa.array([], pa.int64()),
         "b": pa.array([], pa.int64())})).union(
        merged.map_batches(to_edges, batch_format="pyarrow"),
        raw.map_batches(self_edges, batch_format="pyarrow"))
    comp = connected_components(edges, "a", "b").materialize()  # forked

    # stage 4: border rows + comp co-shard on the core id; vectorized
    # positional lookup attaches the component (every core is in comp
    # via its self edge, so a miss is a hard error, not a fill)
    _S1 = {"k": pa.int64(), "a": pa.int64(), "component": pa.int64(),
           "s": pa.int8()}

    def _s1_empty() -> pa.Table:
        return pa.table({n: pa.array([], t) for n, t in _S1.items()})

    def border_keyed(t: pa.Table) -> pa.Table:
        if not _merged_ok(t):
            return _s1_empty()
        t = t.filter(pc.equal(t.column("kind"), 1))
        n = t.num_rows
        return pa.table({"k": t.column("v"), "a": t.column("u"),
                         "component": pa.array(np.zeros(n, np.int64), pa.int64()),
                         "s": pa.array(np.zeros(n, np.int8), pa.int8())})

    def comp_keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _s1_empty()
        n = t.num_rows
        return pa.table({"k": t.column("node"),
                         "a": pa.array(np.zeros(n, np.int64), pa.int64()),
                         "component": t.column("component"),
                         "s": pa.array(np.ones(n, np.int8), pa.int8())})

    def border_label(g: pd.DataFrame) -> pd.DataFrame:
        cm = g[g["s"] == 1]
        bd = g[g["s"] == 0]
        pos = pd.Index(cm["k"].to_numpy(np.int64)).get_indexer(
            bd["k"].to_numpy(np.int64))
        assert (pos >= 0).all(), "border core missing from components"
        return pd.DataFrame({
            "event_id": bd["a"].to_numpy(np.int64),
            "label": cm["component"].to_numpy(np.int64)[pos]})

    s1_in = ray.data.from_arrow(_s1_empty()).union(
        merged.map_batches(border_keyed, batch_format="pyarrow"),
        comp.map_batches(comp_keyed, batch_format="pyarrow"))
    border_lab = shard_apply(s1_in, ["k"], border_label)

    # stage 5: one shard on event_id over [owner rows | core labels |
    # border labels]; exactly one owner row exists per input point, so
    # the owner stream IS the base point list (points read only once)
    _S2 = {"event_id": pa.int64(), "label": pa.int64(), "has": pa.int8()}

    def _s2_empty() -> pa.Table:
        return pa.table({n: pa.array([], t) for n, t in _S2.items()})

    def owner_base(t: pa.Table) -> pa.Table:
        if not _typed(t):
            return _s2_empty()
        t = t.filter(pc.equal(t.column("f"), 1))
        n = t.num_rows
        return pa.table({"event_id": t.column("a"),
                         "label": pa.array(np.zeros(n, np.int64), pa.int64()),
                         "has": pa.array(np.zeros(n, np.int8), pa.int8())})

    def comp_lab(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _s2_empty()
        n = t.num_rows
        return pa.table({"event_id": t.column("node"),
                         "label": t.column("component"),
                         "has": pa.array(np.ones(n, np.int8), pa.int8())})

    def border_as_s2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "event_id" not in t.column_names:
            return _s2_empty()
        n = t.num_rows
        return pa.table({"event_id": t.column("event_id"),
                         "label": t.column("label"),
                         "has": pa.array(np.ones(n, np.int8), pa.int8())})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        base = g[g["has"] == 0]
        lab = g[g["has"] == 1]
        ids = base["event_id"].to_numpy(np.int64)
        mn = lab.groupby("event_id", sort=False)["label"].min()
        vals = mn.to_numpy(np.int64)
        if not len(vals):  # all-noise shard
            return pd.DataFrame({"event_id": ids,
                                 "label": np.full(len(ids), -1, np.int64)})
        # exact int64 end-to-end: positional lookup, no NaN/float fill
        pos = pd.Index(mn.index.to_numpy(np.int64)).get_indexer(ids)
        out = np.where(pos >= 0, vals[np.maximum(pos, 0)], np.int64(-1))
        return pd.DataFrame({"event_id": ids, "label": out})

    s2_in = ray.data.from_arrow(_s2_empty()).union(
        raw.map_batches(owner_base, batch_format="pyarrow"),
        comp.map_batches(comp_lab, batch_format="pyarrow"),
        border_lab.map_batches(border_as_s2, batch_format="pyarrow"))
    return shard_apply(s2_in, ["event_id"], finish)
