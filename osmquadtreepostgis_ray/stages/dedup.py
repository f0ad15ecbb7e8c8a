"""Deduplication operators for the training-data pipeline: exact,
MinHash+LSH, SimHash, n-gram Jaccard.  (Embedding-cosine near-dup lives
in stages/embed.py.)

Scale notes (the part the sandbox can't show): the exact path is
hash-partitioned — only (hash, id) pairs ride the shuffle, never
payloads; the MinHash path shuffles (band, bucket, id, signature) rows
(signature = 64*8 bytes) and verifies candidates per bucket group, so no
stage ever needs the full corpus in one place.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.functions import text as T
from osmquadtreepostgis_ray.util import pool_size, shard_apply, sharded_agg


def add_fingerprint(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def fp(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(text_col).to_pylist())
        return batch.append_column("fingerprint", pa.array(T.fingerprint(s), pa.int64()))
    return ds.map_batches(fp, batch_format="pyarrow")


def dedup_exact(ds: ray.data.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> ray.data.Dataset:
    """Keep the min-id representative of each identical text.

    Pre-aggregates (hash -> min id, count) inside each batch before the
    groupby so the shuffle carries one row per distinct hash per batch,
    then a tiny grouped min — the partial/combiner pattern."""
    def partial(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(text_col).to_pylist())
        df = pd.DataFrame({"fingerprint": T.fingerprint(s),
                           id_col: batch.column(id_col).to_numpy()})
        g = df.groupby("fingerprint", sort=False)[id_col].agg(["min", "count"]).reset_index()
        return pa.table({"fingerprint": g["fingerprint"].to_numpy(),
                         "keep_id": g["min"].to_numpy(),
                         "n": g["count"].to_numpy().astype(np.int64)})

    part = ds.map_batches(partial, batch_format="pyarrow")
    # content-hash cardinality ~= corpus size: sharded C-level groupby,
    # not Dataset.aggregate's per-key reduce (util.sharded_agg)
    return sharded_agg(part, ["fingerprint"],
                       {"keep_id": ("keep_id", "min"), "n_dups": ("n", "sum")})


class MinHasher:
    """Actor stage: caption/text -> minhash signature + LSH band rows
    (1 row per band per doc).  Coefficients compiled once per actor."""

    def __init__(self, num_hashes: int = 64, bands: int = 16, ngram: int = 9,
                 id_col: str = "doc_id", text_col: str = "text"):
        T._minhash_coeffs(num_hashes)  # warm
        self.num_hashes, self.bands, self.ngram = num_hashes, bands, ngram
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        # whole-batch vectorized: one shingle pass over every doc, one
        # (shingles x hashes) matmul-style min-reduce, one band hash —
        # no per-row Python (functions/text.py batch kernels, proven
        # byte-identical to the per-doc forms in test_text_tags.py)
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        texts = batch.column(self.text_col).to_pylist()
        n = len(ids)
        sh, seg = T.char_shingles_batch(texts, self.ngram)
        sigs = T.minhash_signatures_batch(sh, seg, n, self.num_hashes)
        keys = T.lsh_band_keys_batch(sigs, self.bands)          # (n, bands)
        sig_flat = sigs.tobytes()
        stride = self.num_hashes * 8
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(stride), n, [None, pa.py_buffer(sig_flat)])
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, self.bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int64), n), pa.int64()),
            "band_key": pa.array(keys.reshape(-1).astype(np.int64), pa.int64()),
            "sig": sig_arr.take(pa.array(np.repeat(np.arange(n), self.bands))).cast(pa.binary()),
        })


def minhash_candidates(ds: ray.data.Dataset, num_hashes: int = 64, bands: int = 16,
                       ngram: int = 9, sim_threshold: float = 0.5,
                       id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """shingle -> minhash -> band -> bucket groupby -> candidate pairs
    with estimated Jaccard (signature agreement) >= threshold.
    Pairs are (a < b), deduped across bands by a final distinct."""
    from osmquadtreepostgis_ray.util import worker_cached
    banded = ds.map_batches(
        worker_cached(lambda: MinHasher(num_hashes=num_hashes, bands=bands, ngram=ngram,
                                        id_col=id_col, text_col=text_col)),
        batch_format="pyarrow")

    # bucket the (band, band_key) space so one Ray group holds many LSH
    # buckets — the inner exact grouping is vectorized pandas (avoids
    # per-tiny-group task overhead; same results)
    def bucketize(batch: pa.Table) -> pa.Table:
        b = (batch.column("band").to_numpy() * 1000003
             + batch.column("band_key").to_numpy()) % 512
        return batch.append_column("shard", pa.array(b, pa.int64()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # numpy bucket segmentation first: only buckets with >= 2 docs
        # survive to the (rare) pairwise comparison — iterating every
        # pandas sub-group was the hot spot (50k+ singleton iterations
        # per run at sf0.1)
        g = g.sort_values(["band", "band_key", "doc_id"], kind="stable")
        b = g["band"].to_numpy()
        k = g["band_key"].to_numpy()
        new = np.r_[True, (b[1:] != b[:-1]) | (k[1:] != k[:-1])]
        gid = np.cumsum(new) - 1
        cnt = np.bincount(gid)
        hot = cnt[gid] >= 2
        if not hot.any():
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "est_jaccard": pd.Series([], dtype=np.float64)})
        sub = g[hot]
        gid = gid[hot]
        ids = sub["doc_id"].to_numpy()
        sigs = np.frombuffer(b"".join(sub["sig"]), dtype=np.uint64).reshape(len(sub), -1)
        out_a, out_b, out_j = [], [], []
        for start in np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]]):
            end = start
            while end < len(gid) and gid[end] == gid[start]:
                end += 1
            for i in range(start, end):
                agree = (sigs[i + 1:end] == sigs[i]).mean(axis=1)
                hit = np.flatnonzero(agree >= sim_threshold)
                out_a.extend([ids[i]] * len(hit))
                out_b.extend(ids[i + 1 + hit].tolist())
                out_j.extend(agree[hit].tolist())
        df = pd.DataFrame({"a": np.array(out_a, dtype=np.int64),
                           "b": np.array(out_b, dtype=np.int64),
                           "est_jaccard": np.array(out_j, dtype=np.float64)})
        return df.drop_duplicates(["a", "b"])

    cand = (banded.map_batches(bucketize, batch_format="pyarrow")
                  .groupby("shard").map_groups(pairs, batch_format="pandas"))

    def final_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        # sharded on a (duplicates of a pair share it) — not per-key
        return g.drop_duplicates(["a", "b"])

    return shard_apply(cand, ["a"], final_dedupe)


def simhash_buckets(ds: ray.data.Dataset, ngram: int = 9, prefix_bits: int = 12,
                    id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """SimHash each doc; bucket by the top prefix_bits for near-dup
    blocking (rotation-probing is the scale extension)."""
    def sh(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        shingles, seg = T.char_shingles_batch(texts, ngram)
        vals = T.simhash_batch(shingles, seg, len(ids))  # vectorized per batch
        bucket = (vals.astype(np.uint64) >> np.uint64(64 - prefix_bits)).astype(np.int64)
        return pa.table({id_col: pa.array(ids), "simhash": pa.array(vals, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})
    return ds.map_batches(sh, batch_format="pyarrow")


NGRAM_SHARDS = 512


def ngram_jaccard_pairs(ds: ray.data.Dataset, n: int = 3, threshold: float = 0.6,
                        id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Exact word-n-gram Jaccard near-dup pairs via PREFIX FILTERING
    (the PPJoin family), fully distributed — nothing corpus-sized ever
    lands on the driver or in a broadcast:

    1. document frequency: per-batch (gram, partial df) combiner ->
       tiny groupby(gram) — the shuffle carries distinct grams only.
       The aggregated (gram -> df) table (vocabulary-sized, orders of
       magnitude smaller than the corpus) is the one broadcast.
    2. prefix explode: every doc re-derives its sorted-unique gram set
       (one vectorized batch pass), orders it rarest-first by (df,
       gram) — any consistent total order preserves the PPJoin
       guarantee: J(a,b) >= t implies the two prefixes of length
       ``|d| - ceil(t*|d|) + 1`` share a gram — and emits its prefix
       rows, each CARRYING the doc's full gram array as a list column.
    3. candidates + verify co-grouped: groupby(gram shard); inside a
       group both sides' gram arrays are present, so the exact Jaccard
       verification is local — no lookup table, no second join.  The
       per-pair cost rides the shuffle as O(prefix x |grams|) ints per
       doc; for very long documents the alternative is a hash join of
       gram sets back onto the candidate pair key (two shuffles).
    4. a pair can surface in two shards (one per side's prefix):
       final groupby(a) dedup.

    All thresholds compared in exact integer permille (hash-stable vs
    the DuckDB oracle).  Returns (a, b, jac_permille)."""
    from ray.data.aggregate import Sum

    t_permille = int(round(threshold * 1000))

    def gram_partial(batch: pa.Table) -> pa.Table:
        gh, _seg = T.word_ngram_hash_batch(batch.column(text_col), n)
        u, c = np.unique(gh.astype(np.int64), return_counts=True)
        return pa.table({"gram": pa.array(u, pa.int64()),
                         "df": pa.array(c.astype(np.int64), pa.int64())})

    df_tab = (ds.map_batches(gram_partial, batch_format="pyarrow")
                .groupby("gram").aggregate(Sum("df", alias_name="df"))).to_pandas()
    u = df_tab["gram"].to_numpy(np.int64)
    order = np.argsort(u, kind="stable")
    u = u[order]
    dfv = df_tab["df"].to_numpy(np.int64)[order]
    df_ref = ray.put((u, dfv))

    def prefix_rows(batch: pa.Table) -> pa.Table:
        uu, dd = ray.get(df_ref)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        gh, seg = T.word_ngram_hash_batch(batch.column(text_col), n)
        gi = gh.astype(np.int64)
        sizes = np.bincount(seg, minlength=len(ids)).astype(np.int64)
        if not len(gi):
            return pa.table({"gram": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "size": pa.array([], pa.int64()),
                             "grams": pa.array([], pa.list_(pa.int64()))})
        # full per-doc gram sets as a list column (value-sorted per doc)
        doc_lists = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(sizes)], pa.int32()), pa.array(gi, pa.int64()))
        # rarest-first within each doc: lexsort (doc, df, gram)
        d = dd[np.searchsorted(uu, gi)]
        so = np.lexsort((gi, d, seg))
        # prefix length: p = size - ceil(t*size) + 1, exact integer ceil
        p = sizes - (t_permille * sizes + 999) // 1000 + 1
        within = T._ranges(sizes)                      # rank within doc, sorted
        sel = within < np.repeat(p, sizes)
        doc_idx = seg[so][sel]
        return pa.table({
            "gram": pa.array(gi[so][sel], pa.int64()),
            id_col: pa.array(ids[doc_idx], pa.int64()),
            "size": pa.array(sizes[doc_idx], pa.int64()),
            "grams": doc_lists.take(pa.array(doc_idx)),
        })

    prefixed = ds.map_batches(prefix_rows, batch_format="pyarrow")

    def bucketize(batch: pa.Table) -> pa.Table:
        b = batch.column("gram").to_numpy() % NGRAM_SHARDS
        return batch.append_column("shard", pa.array(b, pa.int64()))

    def pairs_and_verify(g: pd.DataFrame) -> pd.DataFrame:
        # numpy segmentation: only grams shared by >= 2 docs reach the
        # pairwise loop (the overwhelming majority of prefix grams are
        # singletons in their shard)
        g = g.sort_values(["gram", id_col], kind="stable") \
             .drop_duplicates(["gram", id_col])
        gv = g["gram"].to_numpy()
        new = np.r_[True, gv[1:] != gv[:-1]]
        gid = np.cumsum(new) - 1
        cnt = np.bincount(gid)
        hotm = cnt[gid] >= 2
        seen: set[tuple[int, int]] = set()
        out_a, out_b, out_j = [], [], []
        if not hotm.any():
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "jac_permille": pd.Series([], dtype=np.int64)})
        sub_all = g[hotm]
        gid = gid[hotm]
        ids_all = sub_all[id_col].to_numpy()
        sizes_all = sub_all["size"].to_numpy()
        grams_all = sub_all["grams"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]]).tolist() + [len(gid)]
        for bi in range(len(bounds) - 1):
            lo, hi = bounds[bi], bounds[bi + 1]
            ids = ids_all[lo:hi]
            sizes = sizes_all[lo:hi]
            grams = grams_all[lo:hi]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    # length filter: 1000*min >= t_permille*max for J >= t
                    if 1000 * min(sizes[i], sizes[j]) < t_permille * max(sizes[i], sizes[j]):
                        continue
                    key = (int(ids[i]), int(ids[j]))
                    if key in seen:
                        continue
                    seen.add(key)
                    ga = np.asarray(grams[i], dtype=np.int64)
                    gb = np.asarray(grams[j], dtype=np.int64)
                    inter = len(np.intersect1d(ga, gb, assume_unique=True))
                    union = len(ga) + len(gb) - inter
                    if 1000 * inter >= t_permille * union:
                        out_a.append(key[0]); out_b.append(key[1])
                        out_j.append((1000 * inter) // union)
        return pd.DataFrame({"a": np.array(out_a, dtype=np.int64),
                             "b": np.array(out_b, dtype=np.int64),
                             "jac_permille": np.array(out_j, dtype=np.int64)})

    verified = (prefixed.map_batches(bucketize, batch_format="pyarrow")
                .groupby("shard").map_groups(pairs_and_verify, batch_format="pandas"))

    def final_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        # sharded on a (duplicates of a pair share it) — not per-key
        return g.drop_duplicates(["a", "b"])

    return shard_apply(verified, ["a"], final_dedupe)
