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
from osmquadtreepostgis_ray.util import pool_size, worker_cached


def broadcast_join(big: ray.data.Dataset, small_df: pd.DataFrame, on: str,
                   how: str = "inner") -> ray.data.Dataset:
    ref = ray.put(small_df)

    class Join:
        def __init__(self):
            self.small = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.small, on=on, how=how)

    return big.map_batches(worker_cached(Join), batch_format="pandas")


BUCKETS = 32
_HASH_MULT = 2654435761


def _bucket(keys: np.ndarray, buckets: int) -> np.ndarray:
    return (np.asarray(keys, dtype=np.int64) * _HASH_MULT) % buckets


def bucket_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                     buckets: int = BUCKETS) -> ray.data.Dataset:
    """Partitioned hash join on an int64 key.  Each side is tagged with
    its bucket and a side marker, aligned to the TYPED union schema
    (Arrow nulls, never pandas object columns), unioned, grouped by
    bucket once (a single shuffle), and merged per bucket."""
    import pyarrow as _pa

    lschema = _pa.schema(list(zip(left.schema().names, left.schema().types)))
    rschema = _pa.schema(list(zip(right.schema().names, right.schema().types)))
    union_fields: dict[str, _pa.DataType] = {}
    for sch in (lschema, rschema):
        for f in sch:
            union_fields.setdefault(f.name, f.type)
    names = list(union_fields)
    lcols, rcols = set(lschema.names), set(rschema.names)

    def tag_align(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            b = _bucket(batch.column(on).to_numpy(), buckets)
            arrays = [batch.column(c) if c in batch.column_names
                      else pa.nulls(batch.num_rows, union_fields[c]) for c in names]
            arrays.append(pa.array(b, pa.int64()))
            arrays.append(pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()))
            return pa.Table.from_arrays(arrays, names=names + ["__bucket", "__side"])
        return _t

    u = left.map_batches(tag_align(0), batch_format="pyarrow").union(
        right.map_batches(tag_align(1), batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][[c for c in names if c in lcols]]
        rg = g[g["__side"] == 1][[c for c in names if c in rcols]]
        return lg.merge(rg, on=on, how="inner")

    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")
