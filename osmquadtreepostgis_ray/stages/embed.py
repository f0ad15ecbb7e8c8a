"""Embedding similarity operators: brute-force cosine top-k (baseline),
IVF-bucketed approximate ANN (scale path), LSH near-dup pairs.

Patterns: the query matrix is broadcast (ray.put once, read in actor
__init__), the corpus streams through map_batches in Arrow batches with
a numpy matmul per batch — never materialized.  All math float64 for
cross-engine determinism; outputs carry (id, rank) not raw floats.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from osmquadtreepostgis_ray.functions import text as T
from osmquadtreepostgis_ray.util import pool_size, topk_per_key, worker_cached


def embed_documents(ds: ray.data.Dataset, dim: int = 32,
                    id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Embedding GENERATION stage: deterministic feature-hashing embedder
    (token -> hashed slot, +-1 sign, L2-normalized) — the sandbox stand-in
    for batched model inference; a real encoder slots into the same
    map_batches signature with an actor pool holding the model.
    Emits (id, embedding list<float>)."""
    import pyarrow.compute as pc

    def emb(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        n = len(texts)
        out = np.zeros((n, dim), dtype=np.float64)
        if n:
            lists = pc.utf8_split_whitespace(texts.combine_chunks())
            lens = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
            flat = pc.list_flatten(lists)
            d = flat.dictionary_encode()
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            words = d.dictionary.to_pylist()
            # FNV-ish per distinct word, vectorized over the dictionary
            wh = np.array([T.hash_str(w) for w in words], dtype=np.uint64)
            slot = (wh % np.uint64(dim)).astype(np.int64)[codes]
            sign = np.where((wh >> np.uint64(32)) % np.uint64(2) == 0, 1.0, -1.0)[codes]
            rows = np.repeat(np.arange(n, dtype=np.int64), lens)
            # weighted bincount == add.at but C-speed; ±1.0 sums are
            # exact in float64, so the result is bit-identical
            out = np.bincount(rows * dim + slot, weights=sign,
                              minlength=n * dim).reshape(n, dim)
            norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-30)
            out = out / norms
        return pa.table({
            id_col: batch.column(id_col),
            "embedding": pa.array(list(out.astype(np.float32)), pa.list_(pa.float32())),
        })

    return ds.map_batches(emb, batch_format="pyarrow")


def _mat(batch_col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy-ish."""
    arr = batch_col.combine_chunks() if hasattr(batch_col, "combine_chunks") else batch_col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


class CosineTopK:
    """Partial top-k per batch against a broadcast query matrix."""

    def __init__(self, queries_ref, k: int = 5, id_col: str = "vec_id"):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qid = np.asarray(q["ids"], dtype=np.int64)
        qm = np.asarray(q["mat"], dtype=np.float64)
        self.qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        m = _mat(batch.column("embedding"))
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sim = self.qm @ m.T                                   # (nq, nb)
        sim[ids[None, :] == self.qid[:, None]] = -2.0         # exclude self
        k = min(self.k, sim.shape[1])
        part = np.argpartition(-sim, k - 1, axis=1)[:, :k]
        return pa.table({
            "query_id": pa.array(np.repeat(self.qid, k), pa.int64()),
            "neighbor_id": pa.array(ids[part.ravel()], pa.int64()),
            "sim": pa.array(np.take_along_axis(sim, part, axis=1).ravel(), pa.float64()),
        })


def knn_embeddings(corpus: ray.data.Dataset, query_ids: np.ndarray, query_mat: np.ndarray,
                   k: int = 5, id_col: str = "vec_id") -> pa.Table:
    """Exact brute-force cosine top-k; ranked by (-sim, neighbor_id).

    The FINAL reduce is distributed (util.topk_per_key shards partials by
    query_id): the driver receives only nq x k rows, never the
    nq x k x num_blocks partial set — block-count-independent."""
    qref = ray.put({"ids": query_ids, "mat": query_mat})
    partials = corpus.map_batches(worker_cached(lambda: CosineTopK(qref, k, id_col)),
                                  batch_format="pyarrow", batch_size=8192)
    merged = topk_per_key(partials, "query_id", ["query_id", "sim", "neighbor_id"],
                          [True, False, True], k, ["query_id", "neighbor_id"])
    if merged is None:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    return merged


def ivf_assign(corpus: ray.data.Dataset, centroids: np.ndarray,
               id_col: str = "vec_id") -> ray.data.Dataset:
    """IVF coarse quantizer: assign each vector to its nearest centroid
    (the bucket column a scale ANN probes by).  Centroids broadcast."""
    cref = ray.put(centroids / np.linalg.norm(centroids, axis=1, keepdims=True))

    class Assign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _mat(batch.column("embedding"))
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            lst = np.argmax(self.c @ m.T, axis=0).astype(np.int64)
            return batch.append_column("ivf_bucket", pa.array(lst, pa.int64()))

    return corpus.map_batches(worker_cached(Assign), batch_format="pyarrow")


def ivf_build(corpus: ray.data.Dataset, centroids: np.ndarray, index_path: str,
              id_col: str = "vec_id") -> str:
    """One-time IVF index build: assign every vector to its nearest
    centroid and MATERIALIZE the corpus hive-partitioned by ivf_bucket
    (state/partcache.py).  The bucket is thereby a storage partition
    key — the probe below reads only selected partitions' files, never
    scanning (or even listing) the rest.  Idempotent per path."""
    from osmquadtreepostgis_ray.state.partcache import cache_partitioned
    assigned = ivf_assign(corpus, centroids, id_col)
    return cache_partitioned(assigned, index_path, "ivf_bucket")


def ivf_probe_buckets(centroids: np.ndarray, query_mat: np.ndarray,
                      nprobe: int) -> list[int]:
    """The nprobe nearest buckets per query (union over queries)."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qn = np.asarray(query_mat, dtype=np.float64)
    qn = qn / np.linalg.norm(qn, axis=1, keepdims=True)
    probe = np.argsort(-(qn @ cn.T), axis=1)[:, :nprobe]
    return sorted({int(b) for row in probe for b in row})


def ivf_knn(corpus: ray.data.Dataset, centroids: np.ndarray, query_ids, query_mat,
            k: int = 5, nprobe: int = 4, id_col: str = "vec_id",
            index_path: str | None = None) -> pa.Table:
    """Approximate top-k probing only the nprobe nearest IVF buckets.

    The probe is a FILE-LEVEL partition prune: the corpus is (once)
    materialized bucketed by ivf_bucket (`ivf_build`), and each query
    batch reads only the probed buckets' parquet files — unprobed
    partitions are never opened.  `index_path=None` builds a throwaway
    index for this call; pass a stable path to amortize the build
    across calls (the 100 TB deployment always does)."""
    import tempfile

    from osmquadtreepostgis_ray.state.partcache import read_partitions
    path = index_path or tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
    ivf_build(corpus, centroids, path, id_col)
    wanted = ivf_probe_buckets(centroids, query_mat, nprobe)
    sub = read_partitions(path, "ivf_bucket", wanted)
    if sub is None:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    return knn_embeddings(sub, np.asarray(query_ids, dtype=np.int64), query_mat, k, id_col)


LSH_SEED = 777


def _hyperplanes(planes: int, d: int) -> np.ndarray:
    return np.random.RandomState(LSH_SEED).standard_normal((planes, d))


def _lsh_bucket_of(mat: np.ndarray, H: np.ndarray) -> np.ndarray:
    bits = (H @ mat.T > 0).astype(np.uint64)
    key = np.zeros(bits.shape[1], dtype=np.uint64)
    for b in range(H.shape[0]):
        key |= bits[b] << np.uint64(b)
    return key.astype(np.int64)


def lsh_build(corpus: ray.data.Dataset, index_path: str, planes: int = 6,
              dim: int | None = None, id_col: str = "vec_id") -> str:
    """LSH-bucketed ANN index build (the brief's 'LSH-bucketed variant
    as the scale path' for similarity search): sign bits of `planes`
    random hyperplanes bucket the corpus; materialized hive-partitioned
    by bucket (state/partcache.py) so probes are file-level prunes.
    Hyperplanes derive from a fixed seed — pure function of dim."""
    from osmquadtreepostgis_ray.state.partcache import cache_partitioned
    if dim is None:
        dim = len(corpus.take(1)[0]["embedding"])
    href = ray.put(_hyperplanes(planes, dim))

    class Assign:
        def __init__(self):
            self.H = ray.get(href)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _mat(batch.column("embedding"))
            return batch.append_column(
                "lsh_bucket", pa.array(_lsh_bucket_of(m, self.H), pa.int64()))

    assigned = corpus.map_batches(worker_cached(Assign), batch_format="pyarrow")
    return cache_partitioned(assigned, index_path, "lsh_bucket")


def lsh_probe_buckets(query_mat: np.ndarray, planes: int = 6,
                      max_hamming: int = 1) -> list[int]:
    """Each query's own bucket plus every bucket within `max_hamming`
    bit flips (multi-probe LSH) — union over queries."""
    import itertools
    H = _hyperplanes(planes, np.asarray(query_mat).shape[1])
    base = _lsh_bucket_of(np.asarray(query_mat, dtype=np.float64), H)
    out: set[int] = set()
    flips = [0]
    for r in range(1, max_hamming + 1):
        flips += [int(np.bitwise_or.reduce(np.array([1 << c for c in combo])))
                  for combo in itertools.combinations(range(planes), r)]
    for b in base:
        for f in flips:
            out.add(int(b) ^ f)
    return sorted(out)


def lsh_knn(corpus: ray.data.Dataset, query_ids, query_mat, k: int = 5,
            planes: int = 6, max_hamming: int = 1, id_col: str = "vec_id",
            index_path: str | None = None) -> pa.Table:
    """Approximate top-k over the multi-probed LSH buckets only — the
    file-prune sibling of ivf_knn (recall grows with max_hamming; exact
    within the probed set).  A probed bucket that does not exist on disk
    costs nothing (no file to open)."""
    import tempfile

    from osmquadtreepostgis_ray.state.partcache import read_partitions
    qm = np.asarray(query_mat, dtype=np.float64)
    path = index_path or tempfile.mkdtemp(prefix="lshknn_", dir="/tmp")
    lsh_build(corpus, path, planes=planes, dim=qm.shape[1], id_col=id_col)
    wanted = lsh_probe_buckets(qm, planes=planes, max_hamming=max_hamming)
    sub = read_partitions(path, "lsh_bucket", wanted)
    if sub is None:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    return knn_embeddings(sub, np.asarray(query_ids, dtype=np.int64), qm, k, id_col)


def cosine_neardup_pairs(corpus: ray.data.Dataset, threshold: float = 0.95,
                         planes: int = 16, id_col: str = "vec_id",
                         bucket_cap: int = 4096) -> ray.data.Dataset:
    """Near-dup pairs via random-hyperplane LSH blocking + exact verify
    within buckets (groupby shuffle carries only (bucket, id, vec)).

    Returns a DATASET: the pair table never transits the driver (it is
    data-scaled on a near-dup-heavy corpus — the exact case this op
    targets).  Two bounds keep the per-bucket n^2 verify safe:

    - hot-bucket SPLIT: a bucket larger than `bucket_cap` is split by
      the sign bits of extra hyperplanes (deterministic seeds per round)
      until every sub-bucket fits.  Identical vectors share every sign
      bit, so exact dups are never separated; near-identical vectors
      separate with probability angle/pi per plane (standard SimHash
      bound) — the price of bounding the quadratic verify.
    - identical-signature RESIDUE (vectors so close no plane splits
      them, after 24 extra planes): verified star-wise against the
      sub-bucket's min id — linear output, full connectivity for
      dedup-clustering, mirroring images.ahash_neardup's bounded form.

    Dedup to canonical (a, b) rows via shard_apply — no driver pandas."""
    from osmquadtreepostgis_ray.util import shard_apply

    first = corpus.take(1)
    d = len(first[0]["embedding"])
    H = np.random.RandomState(777).standard_normal((planes, d))
    href = ray.put(H)

    class Sig:
        def __init__(self):
            self.H = ray.get(href)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _mat(batch.column("embedding"))
            bits = (self.H @ m.T > 0).astype(np.uint64)
            key = np.zeros(m.shape[0], dtype=np.uint64)
            for b in range(self.H.shape[0]):
                key |= bits[b] << np.uint64(b)
            return batch.append_column("lsh_bucket", pa.array(key.astype(np.int64), pa.int64()))

    bucketed = corpus.map_batches(worker_cached(Sig), batch_format="pyarrow")

    EMPTY = pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                          "b": pd.Series([], dtype=np.int64),
                          "sim_permille": pd.Series([], dtype=np.int64)})
    MAX_SPLIT_ROUNDS = 24

    def _emit(ids: np.ndarray, m: np.ndarray, star: bool) -> pd.DataFrame:
        if star:
            # residue of near-identical vectors: verify vs the min id only
            root = int(np.argmin(ids))
            sim = m @ m[root]
            keep = (sim >= threshold) & (np.arange(len(ids)) != root)
            other = ids[keep]
            return pd.DataFrame({
                "a": np.minimum(other, ids[root]),
                "b": np.maximum(other, ids[root]),
                "sim_permille": np.round(sim[keep] * 1000).astype(np.int64)})
        sim = m @ m.T
        ii, jj = np.triu_indices(len(ids), 1)
        keep = sim[ii, jj] >= threshold
        return pd.DataFrame({
            "a": np.minimum(ids[ii[keep]], ids[jj[keep]]),
            "b": np.maximum(ids[ii[keep]], ids[jj[keep]]),
            "sim_permille": np.round(sim[ii, jj][keep] * 1000).astype(np.int64)})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return EMPTY
        ids = g[id_col].to_numpy().astype(np.int64)
        m = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        labels = np.zeros(len(ids), dtype=np.int64)
        rnd = 0
        while rnd < MAX_SPLIT_ROUNDS:
            _, inv, cnts = np.unique(labels, return_inverse=True, return_counts=True)
            hot = cnts[inv] > bucket_cap
            if not hot.any():
                break
            h = np.random.RandomState(1000 + rnd).standard_normal(m.shape[1])
            bit = (m @ h > 0).astype(np.int64)
            labels = labels * 2 + np.where(hot, bit, 0)
            rnd += 1
        out = []
        for lab in np.unique(labels):
            sel = labels == lab
            if sel.sum() < 2:
                continue
            out.append(_emit(ids[sel], m[sel], star=bool(sel.sum() > bucket_cap)))
        return pd.concat(out, ignore_index=True) if out else EMPTY

    pairs = bucketed.groupby("lsh_bucket").map_groups(verify, batch_format="pandas")

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).sort_values(["a", "b"], kind="stable")

    return shard_apply(pairs, ["a"], dedupe)
