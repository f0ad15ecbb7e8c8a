"""Text-analysis stages over the documents/caption corpus: language-ID,
quality scoring, token counting, fingerprinting — thin vectorized
map_batches wrappers over functions/text.py kernels."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.functions import text as T


def add_text_stats(ds: ray.data.Dataset, text_col: str = "text") -> ray.data.Dataset:
    def stats(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(text_col).to_pylist())
        q = T.quality_stats(s)
        batch = batch.append_column("n_tokens", pa.array(q["n_tokens"], pa.int64()))
        batch = batch.append_column("stop_hits", pa.array(q["stop_hits"], pa.int64()))
        batch = batch.append_column("stop_permille", pa.array(q["stop_permille"], pa.int64()))
        batch = batch.append_column("lang_pred", pa.array(T.lang_id(s).to_numpy(), pa.string()))
        return batch
    return ds.map_batches(stats, batch_format="pyarrow")


def chunk_documents(ds: ray.data.Dataset, chunk_tokens: int = 32,
                    overlap: int = 8, id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """Fixed-token chunking with overlap — the standard LLM-training
    1->N document transform.  Chunk k covers whitespace tokens
    [k*stride, k*stride + chunk_tokens) with stride = chunk_tokens -
    overlap; chunk count = ceil(n_tokens / stride) (every token starts
    at least one chunk).  Fully Arrow-native: split_pattern +
    list_slice + binary_join kernels, one pass per chunk ordinal (the
    ordinal loop is over the max chunks per batch, not rows)."""
    import numpy as np
    import pyarrow.compute as pc

    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")

    def chunks(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col), " ")
        n = pc.list_value_length(toks).to_numpy().astype(np.int64)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        nchunks = (n + stride - 1) // stride
        out_id, out_k, out_n, out_t = [], [], [], []
        for k in range(int(nchunks.max()) if len(n) else 0):
            m = nchunks > k
            sliced = pc.list_slice(toks, k * stride, k * stride + chunk_tokens)
            joined = pc.binary_join(sliced, " ")
            sel = pa.array(m)
            out_id.append(ids[m])
            out_k.append(np.full(int(m.sum()), k, np.int64))
            out_n.append(np.minimum(chunk_tokens, n[m] - k * stride))
            j = joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined
            out_t.append(j.filter(sel))
        if not out_id:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string())})
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "chunk_idx": pa.array(np.concatenate(out_k), pa.int64()),
            "n_tokens": pa.array(np.concatenate(out_n), pa.int64()),
            "chunk_text": pa.concat_arrays([a.cast(pa.string()) for a in out_t]),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


def sequence_packing(chunks: ray.data.Dataset, capacity: int = 64,
                     order_cols: tuple = ("doc_id", "chunk_idx"),
                     tok_col: str = "n_tokens") -> ray.data.Dataset:
    """Sequence packing (the LLM-training batcher): assign each chunk a
    bin id by contiguous fill in global `order_cols` order — bin =
    (running token total before the chunk) // capacity, offset = that
    total % capacity.

    This needs a global PREFIX SUM, which the Dataset API cannot
    express, so this is the repo's one documented drop to raw Ray
    tasks (the brief's escape hatch): sort once, take the sorted
    blocks' refs, run a tiny remote partial-sum per block (returns one
    scalar each), exclusive-scan the ~#blocks scalars on the driver,
    and finish each block with its offset in a remote task.  Nothing
    row-sized ever lands on the driver; the scan state is one int64
    per block."""
    import ray

    sorted_ds = chunks.sort(list(order_cols))
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_sum(tab: pa.Table) -> int:
        return int(np.sum(tab.column(tok_col).to_numpy())) if tab.num_rows else 0

    sums = ray.get([block_sum.remote(r) for r in refs])
    offsets = np.r_[0, np.cumsum(sums)[:-1]]

    @ray.remote
    def pack(tab: pa.Table, start: int) -> pa.Table:
        n = tab.column(tok_col).to_numpy().astype(np.int64)
        before = start + np.r_[0, np.cumsum(n)[:-1]]
        return (tab.append_column("bin_id", pa.array(before // capacity, pa.int64()))
                   .append_column("offset_in_bin",
                                  pa.array(before % capacity, pa.int64())))

    out = [pack.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out)
