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


def count_words_multi(texts, keys: tuple[str, ...]) -> np.ndarray:
    """Per-row occurrence counts for MANY whole words in one pass:
    returns an (n_rows, n_keys) int64 matrix.

    Tokenize once (pyarrow C kernel), map tokens to key indices
    (pc.index_in), scatter-add.  Identical to count_word for the
    whitespace-separated alphanumeric caption corpus (a token equals the
    word iff the \\b-regex matches), at ~1/len(keys) the cost — this is
    the hot kernel of routing + tag projection.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, pa.Array) else pa.array(
        texts.to_numpy() if hasattr(texts, "to_numpy") else texts, pa.string())
    n = len(arr)
    out = np.zeros((n, len(keys)), dtype=np.int64)
    if n == 0:
        return out
    lists = pc.utf8_split_whitespace(arr)
    lens = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    codes = pc.index_in(flat, value_set=pa.array(list(keys))).fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    hit = codes >= 0
    np.add.at(out, (rows[hit], codes[hit]), 1)
    return out


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


def hstore_leftover_arrow(texts, feature_keys: set[str]) -> np.ndarray:
    """Arrow/numpy fast path of hstore_leftover (identical output):
    tokenize once, dictionary-encode tokens, run-length count (row,word)
    pairs on sorted int codes, render per-pair kv strings vectorized,
    join per row.  No per-token Python objects until the reduced unique
    pairs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, pa.Array) else pa.array(
        texts.to_numpy() if hasattr(texts, "to_numpy") else texts, pa.string())
    n = len(arr)
    out = np.full(n, "", dtype=object)
    if n == 0:
        return out
    lists = pc.utf8_split_whitespace(arr)
    lens = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return out
    d = flat.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    words = np.asarray(d.dictionary.to_pylist(), dtype=object)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    # utf8_split_whitespace("") yields one empty token; drop those too
    keep = ~np.isin(words, list(feature_keys) + [""])[codes]
    rows, codes = rows[keep], codes[keep]
    if not len(rows):
        return out
    order = np.lexsort((codes, rows))
    r, c = rows[order], codes[order]
    bound = np.r_[True, (r[1:] != r[:-1]) | (c[1:] != c[:-1])]
    idx = np.flatnonzero(bound)
    ur, uc = r[idx], c[idx]
    cnt = np.diff(np.r_[idx, len(r)])
    # hstore keys sorted by word per row — integer word-rank lexsort
    # (no object-dtype comparisons), then the whole render is Arrow:
    # element-wise kv concat + per-row list join (C kernels; the
    # previous object-array concat + per-row str.join was the flagship
    # routing hotspot at ~26us/row)
    wrank = np.empty(len(words), np.int64)
    wrank[np.argsort(words, kind="stable")] = np.arange(len(words))
    order2 = np.lexsort((wrank[uc], ur))
    ur, uc, cnt = ur[order2], uc[order2], cnt[order2]
    uw_arr = d.dictionary.take(pa.array(uc))
    cnt_arr = pc.cast(pa.array(cnt), pa.string())
    kv = pc.binary_join_element_wise('"', uw_arr, '"=>"', cnt_arr, '"', "")
    per_row = np.bincount(ur, minlength=n)
    offsets = pa.array(np.r_[0, np.cumsum(per_row)], pa.int32())
    joined = pc.binary_join(pa.ListArray.from_arrays(offsets, kv), ", ")
    return joined.to_numpy(zero_copy_only=False).astype(object)


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
