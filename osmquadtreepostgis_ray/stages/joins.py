"""Join operators.

- broadcast_join: small side shipped once via ray.put, looked up per
  batch with a pandas merge — no shuffle (the A3/A4 parent-tag pattern).
- bucket_hash_join: both sides large — add bucket = hash(key) % B to
  both, co-group by bucket, pandas merge per bucket (an explicit
  partitioned hash join; B and hot-key salting are the scale levers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from osmquadtreepostgis_ray.util import pool_size


def broadcast_join(big: ray.data.Dataset, small_df: pd.DataFrame, on: str,
                   how: str = "inner") -> ray.data.Dataset:
    ref = ray.put(small_df)

    class Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return big.map_batches(Join, batch_format="pandas", concurrency=pool_size())


BUCKETS = 32
_HASH_MULT = 2654435761


def _bucket(keys: np.ndarray, buckets: int) -> np.ndarray:
    return (np.asarray(keys, dtype=np.int64) * _HASH_MULT) % buckets


def bucket_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                     buckets: int = BUCKETS) -> ray.data.Dataset:
    """Partitioned hash join on an int64 key.  Each side is tagged with
    its bucket and a side marker, unioned, grouped by bucket once (a
    single shuffle), and merged per bucket."""

    def tag(side: str):
        def _t(batch: pa.Table) -> pa.Table:
            b = _bucket(batch.column(on).to_numpy(), buckets)
            batch = batch.append_column("__bucket", pa.array(b, pa.int64()))
            return batch.append_column("__side", pa.array([side] * batch.num_rows, pa.string()))
        return _t

    lt = left.map_batches(tag("l"), batch_format="pyarrow")
    rt = right.map_batches(tag("r"), batch_format="pyarrow")
    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][[c for c in lcols if c in g.columns]]
        rg = g[g["__side"] == "r"][[c for c in rcols if c in g.columns]]
        out = lg.merge(rg, on=on, how="inner")
        return out

    # union of mismatched schemas: align by adding missing cols as null
    def align(batch: pd.DataFrame) -> pd.DataFrame:
        for c in set(lcols) | set(rcols):
            if c not in batch.columns:
                batch[c] = pd.NA
        return batch

    u = lt.map_batches(align, batch_format="pandas").union(
        rt.map_batches(align, batch_format="pandas"))
    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")
