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
    counts = texts.str.count(pat)
    if counts.isna().any():
        # a null text would cast NaN -> INT64_MIN silently (numpy
        # emits only a RuntimeWarning); the oracle's NULL semantics
        # differ, so fail loudly instead of emitting garbage
        raise ValueError("count_word: null text row (fill or filter "
                         "nulls before counting)")
    return counts.to_numpy(dtype=np.int64)


def _tokens_of(texts):
    """Shared tokenize + dictionary-encode: (n, rows, dict_array).
    rows[i] is the source row of token i; dict_array.indices are the
    per-token vocabulary codes.  dict_array is None when there are no
    tokens at all."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, pa.Array) else pa.array(
        texts.to_numpy() if hasattr(texts, "to_numpy") else texts, pa.string())
    n = len(arr)
    if n == 0:
        return 0, np.empty(0, np.int64), None
    lists = pc.utf8_split_whitespace(arr)
    lens = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return n, np.empty(0, np.int64), None
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    return n, rows, flat.dictionary_encode()


# Above this many cells the dense (rows x vocab) count matrix would cost
# more than the tokens themselves — fall back to the sort path.  128 MiB
# of int64 at the cap; real caption corpora have tiny vocabularies so the
# dense path is the norm, open-web text hits the fallback.
_DENSE_CELLS = 1 << 24


def caption_word_stats(texts, uniq_keys: tuple[str, ...],
                       feature_keys: set[str]) -> tuple[np.ndarray, np.ndarray]:
    """Fused routing kernel: per-row counts for `uniq_keys` AND the
    hstore leftover literal, from ONE tokenize + dictionary-encode pass.

    Dense path (vocab small, the caption corpus): one np.bincount over
    row*V+code builds the full (rows x vocab) count matrix; counts are
    column gathers and the hstore pairs fall out of np.nonzero on
    word-rank-ordered columns already in render order — no per-token
    sort at all.  Sparse path (big vocab): one lexsort by (row,
    word-rank) + run-length encode serves both outputs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n, rows, d = _tokens_of(texts)
    counts = np.zeros((n, len(uniq_keys)), dtype=np.int64)
    tags = np.full(n, "", dtype=object)
    if d is None:
        return counts, tags
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    words = np.asarray(d.dictionary.to_pylist(), dtype=object)
    V = len(words)
    slots = pc.index_in(pa.array(list(uniq_keys), pa.string()),
                        value_set=d.dictionary).fill_null(-1) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    drop = np.isin(words, list(feature_keys) + [""])
    if n * V <= max(_DENSE_CELLS, len(codes)):
        mat = np.bincount(rows * V + codes, minlength=n * V).reshape(n, V)
        for i, c in enumerate(slots):
            if c >= 0:
                counts[:, i] = mat[:, c]
        keep_cols = np.flatnonzero(~drop)
        keep_cols = keep_cols[np.argsort(words[keep_cols], kind="stable")]
        if len(keep_cols):
            sub = mat[:, keep_cols]
            ur, uci = np.nonzero(sub)   # row-major: per row, word-sorted
            cnt = sub[ur, uci]
            uc = keep_cols[uci]
        else:
            ur = uc = cnt = np.empty(0, np.int64)
    else:
        inv = np.full(V, -1, np.int64)
        ok = slots >= 0
        inv[slots[ok]] = np.flatnonzero(ok)
        tok_slot = inv[codes]
        m = tok_slot >= 0
        np.add.at(counts, (rows[m], tok_slot[m]), 1)
        # hstore: single (row, word-rank) sort + run-length
        keepm = ~drop[codes]
        r, c = rows[keepm], codes[keepm]
        if len(r):
            wrank = np.empty(V, np.int64)
            wrank[np.argsort(words, kind="stable")] = np.arange(V)
            order = np.lexsort((wrank[c], r))
            r, c = r[order], c[order]
            bound = np.r_[True, (r[1:] != r[:-1]) | (c[1:] != c[:-1])]
            idx = np.flatnonzero(bound)
            ur, uc = r[idx], c[idx]
            cnt = np.diff(np.r_[idx, len(r)])
        else:
            ur = uc = cnt = np.empty(0, np.int64)
    if len(ur):
        uw_arr = d.dictionary.take(pa.array(uc, pa.int64()))
        cnt_arr = pc.cast(pa.array(cnt), pa.string())
        kv = pc.binary_join_element_wise('"', uw_arr, '"=>"', cnt_arr, '"', "")
        per_row = np.bincount(ur, minlength=n)
        offsets = pa.array(np.r_[0, np.cumsum(per_row)], pa.int64())
        joined = pc.binary_join(pa.LargeListArray.from_arrays(offsets, kv), ", ")
        tags = joined.to_numpy(zero_copy_only=False).astype(object)
    return counts, tags


def count_words_multi(texts, keys: tuple[str, ...]) -> np.ndarray:
    """Per-row occurrence counts for MANY whole words in one pass:
    returns an (n_rows, n_keys) int64 matrix.  Identical to count_word
    for the whitespace-separated alphanumeric caption corpus (a token
    equals the word iff the \\b-regex matches).  Thin wrapper over the
    fused caption_word_stats kernel."""
    counts, _ = caption_word_stats(texts, tuple(keys), set())
    return counts


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
    """Arrow/numpy fast path of hstore_leftover (identical output).
    Thin wrapper over the fused caption_word_stats kernel (dense
    bincount matrix for small vocabularies, single (row, word-rank)
    lexsort + run-length for big ones; render is pure Arrow C kernels —
    element-wise kv concat + per-row list join)."""
    _, tags = caption_word_stats(texts, (), feature_keys)
    return tags


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
