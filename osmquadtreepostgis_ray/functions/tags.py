"""Tag projection + leftover-tag rendering — the engine's M6/F2/F3.

Reference semantics: known tag keys fill dedicated columns, the rest go
to an hstore/json catch-all (add_tags, src/postgiswriter.cpp:393-407;
hstore/json renderers bound at src/postgis_python.cpp:346-348).

Here "tags" are the words of the caption column: each distinct word is a
key whose value is its occurrence count.  Feature keys (Style.feature_keys)
become int columns `kv_<word>`; the leftover words render to an hstore
literal `"word"=>"count", ...` sorted by word — a format DuckDB can
reproduce with unnest + string_agg, which keeps this oracle-checkable.

All kernels are vectorized (pandas str ops / numpy groupby), no Python
loop over rows.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def count_word(texts: pd.Series, word: str) -> np.ndarray:
    """Occurrences of `word` as a whole word, per row (vectorized regex).
    DuckDB twin: (length(text) - length(regexp_replace(text, pat, '', 'g'))) / len."""
    pat = r"\b" + re.escape(word) + r"\b"
    return texts.str.count(pat).to_numpy(dtype=np.int64)


def count_word_sql(text_expr: str, word: str) -> str:
    pat = r"\b" + re.escape(word) + r"\b"
    return (f"((length({text_expr}) - length(regexp_replace({text_expr}, '{pat}', '', 'g'))) / {len(word)})::BIGINT"
            )


def _exploded_word_counts(texts: pd.Series) -> pd.DataFrame:
    """(row, word, count) via explode + groupby — vectorized."""
    toks = texts.str.split()
    ex = toks.explode().dropna()
    df = pd.DataFrame({"row": ex.index, "word": ex.to_numpy()})
    return df.groupby(["row", "word"], sort=False).size().reset_index(name="cnt")


def hstore_leftover(texts: pd.Series, feature_keys: set[str]) -> pd.Series:
    """Leftover words -> hstore literal, keys sorted.  Empty -> ''.
    DuckDB twin: see `hstore_leftover_sql`."""
    wc = _exploded_word_counts(texts)
    wc = wc[~wc["word"].isin(feature_keys)]
    wc = wc.sort_values(["row", "word"], kind="stable")
    wc["kv"] = '"' + wc["word"] + '"=>"' + wc["cnt"].astype(str) + '"'
    agg = wc.groupby("row", sort=False)["kv"].agg(", ".join)
    return agg.reindex(texts.index, fill_value="")


def hstore_leftover_sql(table: str, id_col: str, text_col: str, feature_keys: tuple[str, ...]) -> str:
    """DuckDB subquery producing ({id_col}, tags) identical to
    hstore_leftover over the same table."""
    keys = ", ".join(f"'{k}'" for k in feature_keys)
    return f"""
    SELECT t.{id_col},
           coalesce(w.tags, '') AS tags
    FROM {table} t
    LEFT JOIN (
        SELECT {id_col},
               string_agg('"' || word || '"=>"' || cnt || '"', ', ' ORDER BY word) AS tags
        FROM (
            SELECT {id_col}, word, count(*)::BIGINT AS cnt
            FROM (SELECT {id_col}, unnest(string_split(trim({text_col}), ' ')) AS word
                  FROM {table}) u
            WHERE word <> '' AND word NOT IN ({keys})
            GROUP BY {id_col}, word
        ) g GROUP BY {id_col}
    ) w USING ({id_col})
    """


def json_tags(texts: pd.Series) -> pd.Series:
    """All words -> compact JSON object (F2 analog, pack_jsontags
    src/postgiswriter.cpp:111-146), keys sorted."""
    wc = _exploded_word_counts(texts)
    wc = wc.sort_values(["row", "word"], kind="stable")
    wc["kv"] = '"' + wc["word"] + '": ' + wc["cnt"].astype(str)
    agg = "{" + wc.groupby("row", sort=False)["kv"].agg(", ".join) + "}"
    return agg.reindex(texts.index, fill_value="{}")
