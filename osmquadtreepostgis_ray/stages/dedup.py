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
from osmquadtreepostgis_ray.util import pool_size


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

    from ray.data.aggregate import Min, Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("fingerprint")
              .aggregate(Min("keep_id", alias_name="keep_id"), Sum("n", alias_name="n_dups")))


class MinHasher:
    """Actor stage: caption/text -> minhash signature + LSH band rows
    (1 row per band per doc).  Coefficients compiled once per actor."""

    def __init__(self, num_hashes: int = 64, bands: int = 16, ngram: int = 9,
                 id_col: str = "doc_id", text_col: str = "text"):
        T._minhash_coeffs(num_hashes)  # warm
        self.num_hashes, self.bands, self.ngram = num_hashes, bands, ngram
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_key, out_sig = [], [], [], []
        for i, txt in enumerate(texts):
            sh = T.char_shingles(txt, self.ngram)
            sig = T.minhash_signature(sh, self.num_hashes)
            keys = T.lsh_band_keys(sig, self.bands)
            sig_bytes = sig.tobytes()
            for b, key in enumerate(keys):
                out_id.append(int(ids[i])); out_band.append(b)
                out_key.append(np.int64(key.astype(np.int64))); out_sig.append(sig_bytes)
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "band": pa.array(out_band, pa.int64()),
            "band_key": pa.array(out_key, pa.int64()),
            "sig": pa.array(out_sig, pa.binary()),
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
        out_a, out_b, out_j = [], [], []
        for (_, _), sub in g.groupby(["band", "band_key"], sort=False):
            if len(sub) < 2:
                continue
            sub = sub.sort_values("doc_id")
            ids = sub["doc_id"].to_numpy()
            sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in sub["sig"]])
            for i in range(len(ids)):
                agree = (sigs[i + 1:] == sigs[i]).mean(axis=1)
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
        return g.drop_duplicates(["a", "b"])

    return cand.groupby("a").map_groups(final_dedupe, batch_format="pandas")


def simhash_buckets(ds: ray.data.Dataset, ngram: int = 9, prefix_bits: int = 12,
                    id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """SimHash each doc; bucket by the top prefix_bits for near-dup
    blocking (rotation-probing is the scale extension)."""
    def sh(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        vals = np.array([T.simhash(T.char_shingles(t, ngram))
                         for t in batch.column(text_col).to_pylist()], dtype=np.int64)
        bucket = (vals.astype(np.uint64) >> np.uint64(64 - prefix_bits)).astype(np.int64)
        return pa.table({id_col: pa.array(ids), "simhash": pa.array(vals, pa.int64()),
                         "bucket": pa.array(bucket, pa.int64())})
    return ds.map_batches(sh, batch_format="pyarrow")


def ngram_jaccard_pairs(ds: ray.data.Dataset, n: int = 3, threshold: float = 0.6,
                        id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    """Exact word-n-gram Jaccard near-dup pairs via PREFIX FILTERING
    (the PPJoin family): order each doc's gram set rarest-first (global
    document frequency); a pair with Jaccard >= t must share a gram in
    each side's first ``|d| - ceil(t*|d|) + 1`` grams, so only prefix
    grams are exploded, and candidate pairs are verified exactly.

    Naive one-shared-gram blocking is quadratic in document frequency —
    at sf0.1 it generates ~10M candidates; the prefix filter keeps only
    genuinely-rare co-occurrences.

    Sandbox scale note: per-doc gram arrays are collected once and
    broadcast (ray.put) for the verify stage; at 100 TB that lookup
    becomes a hash join of gram sets on the pair key, and the df table a
    groupby — both already expressed here as the dataset-side stages.

    Returns a Dataset of (a, b, jac_permille) — integer permille to stay
    hash-stable."""
    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        out_id, out_g = [], []
        for i, t in enumerate(batch.column(text_col).to_pylist()):
            gs = np.unique(T.word_ngrams(t, n))
            out_id.append(np.full(len(gs), ids[i], dtype=np.int64))
            out_g.append(gs.astype(np.int64))
        return pa.table({id_col: pa.array(np.concatenate(out_id) if out_id else [], pa.int64()),
                         "gram": pa.array(np.concatenate(out_g) if out_g else [], pa.int64())})

    exploded = ds.map_batches(gram_rows, batch_format="pyarrow")

    # one streaming pass: per-doc gram arrays (verify side) + global df
    doc_grams: dict[int, np.ndarray] = {}
    for b in exploded.iter_batches(batch_format="pyarrow", batch_size=1 << 18):
        df_b = pd.DataFrame({"id": b.column(id_col).to_numpy(), "g": b.column("gram").to_numpy()})
        for did, sub in df_b.groupby("id", sort=False):
            arr = sub["g"].to_numpy()
            doc_grams[int(did)] = (np.concatenate([doc_grams[int(did)], arr])
                                   if int(did) in doc_grams else arr)
    doc_grams = {d: np.unique(g) for d, g in doc_grams.items()}
    all_g = np.concatenate(list(doc_grams.values())) if doc_grams else np.empty(0, np.int64)
    uniq, df_counts = np.unique(all_g, return_counts=True)
    # total order rarest-first: (df, gram); rank = position in lexsort
    order = np.lexsort((uniq, df_counts))
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order] = np.arange(len(uniq))
    rank_ref = ray.put((uniq, rank))
    grams_ref = ray.put(doc_grams)

    def prefix_rows(batch: pa.Table) -> pa.Table:
        u, r = ray.get(rank_ref)
        dg = ray.get(grams_ref)
        out_g, out_d, out_sz = [], [], []
        for did in batch.column(id_col).to_numpy():
            gs = dg.get(int(did))
            if gs is None or not len(gs):
                continue
            rk = r[np.searchsorted(u, gs)]
            p = len(gs) - int(np.ceil(threshold * len(gs))) + 1
            pref = gs[np.argsort(rk)][:p]
            out_g.append(pref)
            out_d.append(np.full(len(pref), did, dtype=np.int64))
            out_sz.append(np.full(len(pref), len(gs), dtype=np.int64))
        cat = (lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64))
        return pa.table({"gram": pa.array(cat(out_g), pa.int64()),
                         id_col: pa.array(cat(out_d), pa.int64()),
                         "size": pa.array(cat(out_sz), pa.int64())})

    prefixed = ds.select_columns([id_col]).map_batches(prefix_rows, batch_format="pyarrow")

    def bucketize(batch: pa.Table) -> pa.Table:
        b = batch.column("gram").to_numpy() % 512
        return batch.append_column("shard", pa.array(b, pa.int64()))

    def pairs_and_verify(g: pd.DataFrame) -> pd.DataFrame:
        dg = ray.get(grams_ref)
        seen: set[tuple[int, int]] = set()
        out_a, out_b, out_j = [], [], []
        for _, sub in g.groupby("gram", sort=False):
            if len(sub) < 2:
                continue
            sub = sub.drop_duplicates(id_col).sort_values(id_col)
            ids = sub[id_col].to_numpy()
            sizes = sub["size"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    # length filter: min size >= t * max size for J >= t
                    if min(sizes[i], sizes[j]) < threshold * max(sizes[i], sizes[j]):
                        continue
                    key = (int(ids[i]), int(ids[j]))
                    if key in seen:
                        continue
                    seen.add(key)
                    ga, gb = dg[key[0]], dg[key[1]]
                    inter = len(np.intersect1d(ga, gb, assume_unique=True))
                    union = len(ga) + len(gb) - inter
                    # integer-exact: 1000*i >= t_permille*u, floor permille
                    if 1000 * inter >= int(round(threshold * 1000)) * union:
                        out_a.append(key[0]); out_b.append(key[1])
                        out_j.append((1000 * inter) // union)
        return pd.DataFrame({"a": np.array(out_a, dtype=np.int64),
                             "b": np.array(out_b, dtype=np.int64),
                             "jac_permille": np.array(out_j, dtype=np.int64)})

    verified = (prefixed.map_batches(bucketize, batch_format="pyarrow")
                .groupby("shard").map_groups(pairs_and_verify, batch_format="pandas"))

    # a pair can surface in two shards (one per side's prefix): final dedup
    def final_dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    return verified.groupby("a").map_groups(final_dedupe, batch_format="pandas")
