"""V3 JSON property views — the analog of the reference's
`jsonb_strip_nulls(row_to_json(t) - 'id' - 'quadtree' - 'tile' - 'way')
|| tags` views (osmquadtreepostgis/__init__.py:261-265, :283-285):
each row rendered as a JSON object of its non-null projected properties.

Deterministic construction (feature keys in style order, only keys with
hits, integer values) so the DuckDB oracle reproduces the exact string.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from osmquadtreepostgis_ray.config import DEFAULT_FEATURE_KEYS
from osmquadtreepostgis_ray.functions.tags import count_word, count_word_sql


def json_props(ds: ray.data.Dataset, keys: tuple[str, ...] = DEFAULT_FEATURE_KEYS,
               id_col: str = "doc_id", text_col: str = "text") -> ray.data.Dataset:
    def render(batch: pa.Table) -> pa.Table:
        cap = pd.Series(batch.column(text_col).to_pylist())
        n = len(cap)
        body = np.full(n, "", dtype=object)
        for k in keys:
            c = count_word(cap, k)
            frag = np.char.add(f'"{k}":', c.astype(str))
            has = c > 0
            body = np.where(has & (body == ""), frag,
                            np.where(has, np.char.add(np.char.add(body.astype(str), ","), frag),
                                     body))
        props = np.char.add(np.char.add("{", body.astype(str)), "}")
        return pa.table({id_col: batch.column(id_col),
                         "props_json": pa.array(props, pa.string())})

    return ds.map_batches(render, batch_format="pyarrow")


def json_props_sql(table: str = "documents", keys: tuple[str, ...] = DEFAULT_FEATURE_KEYS,
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    frags = ",\n        ".join(
        f"CASE WHEN {count_word_sql(text_col, k)} > 0 THEN "
        f"'\"{k}\":' || CAST({count_word_sql(text_col, k)} AS VARCHAR) END"
        for k in keys)
    return f"""
    SELECT {id_col}, '{{' || concat_ws(',',
        {frags}) || '}}' AS props_json
    FROM {table}
    """
