"""Text-analysis stages over the documents/caption corpus: language-ID,
quality scoring, token counting, fingerprinting — thin vectorized
map_batches wrappers over functions/text.py kernels."""

from __future__ import annotations

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
