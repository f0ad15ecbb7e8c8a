"""Text-analysis kernels for the training-data pipeline operators:
language-ID, quality scoring, token counting, fingerprinting, shingling,
MinHash, SimHash.  All vectorized per batch (numpy / pandas str ops);
per-document inner loops only where the structure is ragged (shingle
sets), and those operate on numpy arrays.

Integer outputs wherever the DuckDB oracle compares values (no float
hash hazards).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmquadtreepostgis_ray.functions.tags import count_word, count_word_sql

TOKEN_RE = r"\S+"

# deterministic "language marker" table for the synthetic corpus: the
# heuristic scores a document by marker-word counts; ties break by
# language order.  SQL-replicable via CASE + the same counts.
LANG_MARKERS: tuple[tuple[str, str], ...] = (
    ("en", "the"),
    ("es", "data"),
    ("de", "query"),
    ("fr", "table"),
)


def token_count(texts: pd.Series) -> np.ndarray:
    return texts.str.count(TOKEN_RE).to_numpy(dtype=np.int64)


# BPE-ish pre-tokenizer (the GPT-2 pattern family, restricted to ASCII
# classes so Python re and DuckDB RE2 agree): letter runs, digit runs,
# runs of other non-space symbols.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """Token count under the BPE-ish pre-tokenizer (vectorized regex)."""
    return texts.str.count(BPE_TOKEN_RE).to_numpy(dtype=np.int64)


def bpe_token_count_sql(text_expr: str) -> str:
    return f"len(regexp_extract_all({text_expr}, '{BPE_TOKEN_RE}'))::BIGINT"


def lang_id(texts: pd.Series) -> pd.Series:
    """Argmax over marker-word counts; 'und' when all zero."""
    counts = np.stack([count_word(texts, w) for _, w in LANG_MARKERS])
    best = counts.argmax(axis=0)
    langs = np.array([l for l, _ in LANG_MARKERS])
    out = langs[best]
    out = np.where(counts.max(axis=0) == 0, "und", out)
    return pd.Series(out, index=texts.index)


def lang_id_sql(text_expr: str) -> str:
    cols = [(lang, count_word_sql(text_expr, w)) for lang, w in LANG_MARKERS]
    maxexpr = "greatest(" + ", ".join(c for _, c in cols) + ")"
    whens = "".join(f" WHEN {c} = {maxexpr} THEN '{lang}'" for lang, c in cols)
    return f"CASE WHEN {maxexpr} = 0 THEN 'und'{whens} END"


def quality_stats(texts: pd.Series) -> dict[str, np.ndarray]:
    """Integer quality signals: n_tokens, n_chars, stopword hits, and
    stop_permille = 1000*stop/ n_tokens (integer division — SQL-exact)."""
    n_tokens = token_count(texts)
    n_chars = texts.str.len().to_numpy(dtype=np.int64)
    stop = sum(count_word(texts, w) for w in ("the", "a", "of", "and"))
    stop = np.asarray(stop, dtype=np.int64)
    permille = np.where(n_tokens > 0, (1000 * stop) // np.maximum(n_tokens, 1), 0)
    return {"n_tokens": n_tokens, "n_chars": n_chars,
            "stop_hits": stop, "stop_permille": permille.astype(np.int64)}


FP_MOD = 2305843009213693951  # 2^61 - 1
FP_BASE = 257


def fingerprint(texts: pd.Series) -> np.ndarray:
    """Polynomial rolling hash of the utf-8 bytes mod 2^61-1 — the
    document-fingerprint operator.  Vectorized with a Horner scan over a
    padded byte matrix."""
    enc = texts.str.encode("utf-8")
    lens = enc.str.len().to_numpy(dtype=np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    if maxlen == 0:
        return np.zeros(len(texts), dtype=np.int64)
    mat = np.zeros((len(texts), maxlen), dtype=np.int64)
    for i, b in enumerate(enc.to_numpy()):  # fill only; arithmetic below is vectorized
        if b:
            mat[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(len(texts), dtype=np.object_)  # python ints: exact mod-mul
    hv = np.zeros(len(texts), dtype=np.int64)
    # Horner over columns, masked by length; (h*257 + c) mod p with int64-safe
    # split multiply (p < 2^61, 257 * p < 2^70 -> use python int fallback per column batch)
    for j in range(maxlen):
        active = lens > j
        col = mat[:, j]
        hv[active] = ((hv[active] % FP_MOD).astype(object) * FP_BASE % FP_MOD + col[active]).astype(np.int64) % FP_MOD
    h = hv
    return h


def char_shingles(text: str, k: int = 9) -> np.ndarray:
    """Hashed k-char shingles (sorted unique), via a strided byte view."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        if not len(b):
            return np.empty(0, dtype=np.uint64)
        b = np.pad(b, (0, k - len(b)))
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    mult = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    h = (win * mult[None, :]).sum(axis=1)  # wraps mod 2^64 — deterministic
    return np.unique(h)


_MH_A = None
_MH_B = None


def _minhash_coeffs(num: int) -> tuple[np.ndarray, np.ndarray]:
    global _MH_A, _MH_B
    if _MH_A is None or len(_MH_A) < num:
        rs = np.random.RandomState(1234567)
        _MH_A = rs.randint(1, 1 << 61, size=num).astype(np.uint64) | np.uint64(1)
        _MH_B = rs.randint(0, 1 << 61, size=num).astype(np.uint64)
    return _MH_A[:num], _MH_B[:num]


def minhash_signature(shingles: np.ndarray, num_hashes: int = 64) -> np.ndarray:
    """(a*x + b) mod 2^64 min over shingles, per permutation."""
    a, b = _minhash_coeffs(num_hashes)
    if not len(shingles):
        return np.full(num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    vals = shingles[:, None] * a[None, :] + b[None, :]  # wraps mod 2^64
    return vals.min(axis=0)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> np.ndarray:
    """Hash each band of the signature to one uint64 bucket key."""
    rows = len(sig) // bands
    view = sig[: bands * rows].reshape(bands, rows)
    mult = np.uint64(0x9E3779B97F4A7C15) ** np.arange(1, rows + 1, dtype=np.uint64)
    return (view * mult[None, :]).sum(axis=1)


def simhash(shingles: np.ndarray, bits: int = 64) -> np.int64:
    if not len(shingles):
        return np.int64(0)
    bitmat = ((shingles[:, None] >> np.arange(bits, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bitmat - 1).sum(axis=0)
    bitsset = np.flatnonzero(votes > 0).astype(np.uint64)
    out = np.uint64(0)
    for b in bitsset:
        out |= np.uint64(1) << b
    return out.astype(np.int64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if not len(a) and not len(b):
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def word_ngrams(text: str, n: int = 3) -> np.ndarray:
    """Hashed word n-grams (unique) for n-gram-Jaccard dedup."""
    words = text.split()
    if len(words) < n:
        words = words + [""] * (n - len(words))
    h = np.array([hash_str(" ".join(words[i:i + n])) for i in range(max(1, len(words) - n + 1))],
                 dtype=np.uint64)
    return np.unique(h)


def hash_str(s: str) -> int:
    """FNV-1a 64-bit — deterministic across processes (unlike hash())."""
    h = np.uint64(0xCBF29CE484222325)
    for c in s.encode("utf-8"):
        h = np.uint64((int(h) ^ c) * 0x100000001B3 % (1 << 64))
    return int(h)


# ------------------------------------------------------- batch (whole-batch)
# Vectorized twins of the per-document kernels above: one numpy pass over
# ALL documents of a batch (shingles concatenated, per-doc boundaries as
# segment offsets).  Outputs are byte-identical to looping the per-doc
# functions (tested in test_text_tags.py) — the per-doc forms remain as
# the executable spec.

def _segment_unique(vals: np.ndarray, segs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-unique values WITHIN each segment id (both returned
    flattened, segment-major)."""
    order = np.lexsort((vals, segs))
    v, s = vals[order], segs[order]
    if not len(v):
        return v, s
    keep = np.r_[True, (v[1:] != v[:-1]) | (s[1:] != s[:-1])]
    return v[keep], s[keep]


def char_shingles_batch(texts: list[str], k: int = 9) -> tuple[np.ndarray, np.ndarray]:
    """All docs' hashed k-char shingles in one pass.

    Returns (shingles, seg): `shingles` is every doc's sorted-unique
    shingle hashes concatenated doc-major; `seg[i]` is the doc index of
    shingles[i].  Matches char_shingles() per doc exactly (incl. the
    zero-pad of texts shorter than k; empty text -> no shingles)."""
    n = len(texts)
    if not n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    bufs = [t.encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    pad_lens = np.where((lens > 0) & (lens < k), k, lens)  # empty stays empty
    total = int(pad_lens.sum())
    flat = np.zeros(total, dtype=np.uint8)
    offs = np.r_[0, np.cumsum(pad_lens)]
    for i, b in enumerate(bufs):  # fill-only loop; all math below vectorized
        if b:
            flat[offs[i]:offs[i] + lens[i]] = np.frombuffer(b, dtype=np.uint8)
    nwin = np.maximum(pad_lens - k + 1, 0)
    if total < k or not nwin.sum():
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    # hash EVERY window of the concatenated bytes with k shifted
    # contiguous passes (SIMD-friendly), then one gather of the valid
    # (non-boundary-crossing) start positions — ~10x faster than
    # fancy-indexing a strided window view per shingle
    mult = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    fu = flat.astype(np.uint64)
    h_full = np.zeros(total - k + 1, dtype=np.uint64)
    for j in range(k):
        h_full += fu[j: total - k + 1 + j] * mult[j]
    starts = np.repeat(offs[:-1], nwin) + _ranges(nwin)
    h = h_full[starts]
    seg = np.repeat(np.arange(n, dtype=np.int64), nwin)
    return _segment_unique(h, seg)


def char_shingles_positional_batch(
        texts: list[str], k: int = 9
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Every k-char window hash with its 1-BASED start position — NO
    per-doc uniquing (the suffix-window duplicate-span machinery needs
    every occurrence in document order).  Docs shorter than k emit
    nothing (mirrors the SQL twin's length filter; no zero-pad).
    Returns (hashes uint64, seg doc-index int64, pos int64)."""
    n = len(texts)
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
             np.empty(0, np.int64))
    if not n:
        return empty
    bufs = [t.encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    nwin = np.maximum(lens - k + 1, 0)
    if not nwin.sum():
        return empty
    total = int(lens.sum())
    flat = np.zeros(total, dtype=np.uint8)
    offs = np.r_[0, np.cumsum(lens)]
    for i, b in enumerate(bufs):  # fill-only loop, as char_shingles_batch
        if b:
            flat[offs[i]:offs[i] + lens[i]] = np.frombuffer(b, dtype=np.uint8)
    mult = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    fu = flat.astype(np.uint64)
    m = total - k + 1
    h_full = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h_full += fu[j: m + j] * mult[j]
    pos = _ranges(nwin)
    starts = np.repeat(offs[:-1], nwin) + pos
    h = h_full[starts]
    seg = np.repeat(np.arange(n, dtype=np.int64), nwin)
    return h, seg, pos + 1


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concatenate([arange(c) for c in counts]) without the loop."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if not total:
        return np.empty(0, np.int64)
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(counts)
    out[0] = 0
    nz = counts > 0
    first = ends[nz][:-1]
    out[first] = 1 - counts[nz][:-1]
    return np.cumsum(out)


def minhash_signatures_batch(shingles: np.ndarray, seg: np.ndarray, n_docs: int,
                             num_hashes: int = 64) -> np.ndarray:
    """(n_docs, num_hashes) uint64 signatures from batch shingles.
    Docs with no shingles get the all-max signature (empty-set spec of
    minhash_signature)."""
    a, b = _minhash_coeffs(num_hashes)
    out = np.full((n_docs, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    if not len(shingles):
        return out
    starts_mask = np.r_[True, seg[1:] != seg[:-1]]
    starts = np.flatnonzero(starts_mask)
    doc_of = seg[starts_mask]
    # per-hash pass: O(total_shingles) working set per iteration, never
    # the (shingles x hashes) matrix (300 MB/batch at sf0.1 — measured
    # 2x slower than this loop from allocation + memory traffic alone)
    for h in range(num_hashes):
        vals = shingles * a[h] + b[h]                          # wraps mod 2^64
        out[doc_of, h] = np.minimum.reduceat(vals, starts)
    return out


def lsh_band_keys_batch(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """(n_docs, bands) band bucket keys — vectorized lsh_band_keys."""
    n_docs, num = sigs.shape
    rows = num // bands
    view = sigs[:, : bands * rows].reshape(n_docs, bands, rows)
    mult = np.uint64(0x9E3779B97F4A7C15) ** np.arange(1, rows + 1, dtype=np.uint64)
    return (view * mult[None, None, :]).sum(axis=2)


def simhash_batch(shingles: np.ndarray, seg: np.ndarray, n_docs: int,
                  bits: int = 64) -> np.ndarray:
    """(n_docs,) int64 simhash values — vectorized simhash() per doc
    (empty docs -> 0)."""
    out = np.zeros(n_docs, dtype=np.uint64)
    if not len(shingles):
        return out.astype(np.int64)
    starts_mask = np.r_[True, seg[1:] != seg[:-1]]
    starts = np.flatnonzero(starts_mask)
    doc_of = seg[starts_mask]
    seg_len = np.diff(np.r_[starts, len(seg)])
    acc = np.zeros(len(starts), dtype=np.uint64)
    for b in range(bits):  # per-bit pass (see minhash note on memory)
        ones = np.add.reduceat((shingles >> np.uint64(b)) & np.uint64(1), starts)
        acc |= (2 * ones > seg_len).astype(np.uint64) << np.uint64(b)
    out[doc_of] = acc
    return out.astype(np.int64)


_GRAM_P = np.uint64(0x100000001B3)


def _token_hash_segments(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """FNV hash of every whitespace token of every doc of a batch.

    `texts` is a pyarrow string Array/ChunkedArray.  Returns
    (tok_h, tok_counts, offs): `tok_h` is each doc's token hashes
    concatenated doc-major, `tok_counts[i]` is doc i's token count, and
    `offs` is the length-(n_docs+1) prefix-sum of tok_counts.  Empty
    tokens from boundary whitespace are dropped (str.split semantics)."""
    import pyarrow.compute as pc
    arr = texts.combine_chunks() if hasattr(texts, "combine_chunks") else texts
    n_docs = len(arr)
    if not n_docs:
        return np.empty(0, np.uint64), np.empty(0, np.int64), np.zeros(1, np.int64)
    lists = pc.utf8_split_whitespace(arr)
    lens0 = pc.list_value_length(lists).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    keep = pc.not_equal(flat, "")  # Arrow keeps boundary empties; str.split() doesn't
    doc_of_tok = np.repeat(np.arange(n_docs, dtype=np.int64), lens0)[
        keep.to_numpy(zero_copy_only=False)]
    toks = flat.filter(keep)
    d = toks.dictionary_encode()
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    wh = np.array([hash_str(w) for w in d.dictionary.to_pylist()], dtype=np.uint64)
    tok_h = wh[codes] if len(codes) else np.empty(0, np.uint64)
    tok_counts = np.bincount(doc_of_tok, minlength=n_docs).astype(np.int64)
    return tok_h, tok_counts, np.r_[0, np.cumsum(tok_counts)]


def word_ngram_hash_batch(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Hashed word n-grams for every doc of a batch in one pass.

    `texts` is a pyarrow string Array/ChunkedArray.  Gram identity is a
    polynomial combination of per-word FNV hashes (equal word sequences
    -> equal hash; collisions negligible at 64 bit) — only pairwise SET
    EQUALITY feeds the n-gram-Jaccard operator, so this hashes-of-hashes
    identity is interchangeable with hashing the joined string (the
    DuckDB oracle joins strings; parity is on the output pairs).
    Docs with < n words emit ONE gram over the empty-padded word list,
    matching word_ngrams().  Returns (gram_hashes, doc_seg) with grams
    sorted-unique per doc."""
    arr = texts.combine_chunks() if hasattr(texts, "combine_chunks") else texts
    n_docs = len(arr)
    if not n_docs:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    tok_h, tok_counts, offs = _token_hash_segments(arr)

    # long docs: all windows of n consecutive tokens (within-doc only)
    ngrams_per_doc = np.maximum(tok_counts - n + 1, 0)
    starts = np.repeat(offs[:-1], ngrams_per_doc) + _ranges(ngrams_per_doc)
    gh = np.zeros(len(starts), dtype=np.uint64)
    for j in range(n):  # n is tiny (3): the polynomial unrolls
        gh = gh * _GRAM_P + tok_h[starts + j]
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), ngrams_per_doc)

    # short docs (< n words, incl. empty): one gram over the padded list
    short = np.flatnonzero((tok_counts < n))
    if len(short):
        empty_h = np.uint64(hash_str(""))
        sh = np.zeros(len(short), dtype=np.uint64)
        for j in range(n):
            has = tok_counts[short] > j
            hj = np.full(len(short), empty_h, dtype=np.uint64)
            if has.any():
                hj[has] = tok_h[offs[short[has]] + j]
            sh = sh * _GRAM_P + hj
        gh = np.concatenate([gh, sh])
        seg = np.concatenate([seg, short.astype(np.int64)])
    return _segment_unique(gh, seg)


# ------------------------------------------------- repetition / contamination

def word_ngram_segments_nopad_batch(texts, n: int = 2) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All word-n-gram hashes of a batch WITHOUT the short-doc padding of
    word_ngrams(): a doc with < n tokens emits zero grams (the clean
    semantic for repetition/decontamination counting, and the one the
    SQL twin's consecutive-ordinal self-join produces naturally).

    Returns (gram_hashes, doc_seg, n_grams_per_doc) with grams in text
    order (NOT deduplicated) so callers can count totals and distincts."""
    arr = texts.combine_chunks() if hasattr(texts, "combine_chunks") else texts
    n_docs = len(arr)
    if not n_docs:
        return np.empty(0, np.uint64), np.empty(0, np.int64), np.empty(0, np.int64)
    tok_h, tok_counts, offs = _token_hash_segments(arr)
    per_doc = np.maximum(tok_counts - n + 1, 0)
    starts = np.repeat(offs[:-1], per_doc) + _ranges(per_doc)
    gh = np.zeros(len(starts), dtype=np.uint64)
    for j in range(n):  # n is tiny (2-3): the polynomial unrolls
        gh = gh * _GRAM_P + tok_h[starts + j]
    seg = np.repeat(np.arange(n_docs, dtype=np.int64), per_doc)
    return gh, seg, per_doc


def repetition_stats_batch(texts, n: int = 2) -> dict[str, np.ndarray]:
    """Gopher-style repetition signals per doc: total word-n-grams,
    distinct word-n-grams, and dup_permille = 1000*(total-distinct)//total
    (0 for docs with no grams).  All exact int64 — the SQL twin uses the
    same non-negative integer division."""
    gh, seg, per_doc = word_ngram_segments_nopad_batch(texts, n=n)
    n_docs = len(per_doc)
    _, us = _segment_unique(gh, seg)
    distinct = np.bincount(us, minlength=n_docs).astype(np.int64)
    total = per_doc.astype(np.int64)
    dup = np.where(total > 0, (1000 * (total - distinct)) // np.maximum(total, 1), 0)
    return {"n_grams": total, "n_distinct": distinct,
            "dup_permille": dup.astype(np.int64)}


def overlap_counts_batch(texts, bench_grams: np.ndarray, n: int = 3) -> np.ndarray:
    """Per-doc count of DISTINCT word-n-grams that also appear in the
    (sorted unique) benchmark gram-hash array — the decontamination
    membership kernel.  One searchsorted over the broadcast array."""
    gh, seg, per_doc = word_ngram_segments_nopad_batch(texts, n=n)
    n_docs = len(per_doc)
    uv, us = _segment_unique(gh, seg)
    if not len(uv) or not len(bench_grams):
        return np.zeros(n_docs, dtype=np.int64)
    pos = np.searchsorted(bench_grams, uv)
    pos = np.minimum(pos, len(bench_grams) - 1)
    hit = bench_grams[pos] == uv
    return np.bincount(us[hit], minlength=n_docs).astype(np.int64)


# ------------------------------------------------------------- PII redaction
# The synthetic corpus carries no PII, so the operator injects
# deterministic synthetic PII (pure function of doc_id, replicated
# exactly in the SQL twin) and then scrubs it — the redaction kernel is
# the real operator; the injection is the fixture.

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"555-[0-9]+"


def pii_inject(doc_ids: np.ndarray, texts: pd.Series) -> pd.Series:
    """Docs with doc_id % 7 == 0 get a synthetic email + phone appended."""
    ids = np.asarray(doc_ids, dtype=np.int64)
    suffix = (" contact u" + pd.Series(ids, index=texts.index).astype(str)
              + "@example.com call 555-"
              + pd.Series((ids * 7) % 10000, index=texts.index).astype(str))
    return texts.where(ids % 7 != 0, texts + suffix)


def pii_inject_sql(id_expr: str = "doc_id", text_expr: str = "text") -> str:
    return (f"CASE WHEN ({id_expr}) % 7 = 0 THEN ({text_expr}) || ' contact u' || ({id_expr}) "
            f"|| '@example.com call 555-' || ((({id_expr}) * 7) % 10000) ELSE ({text_expr}) END")


def pii_redact(texts: pd.Series) -> dict[str, object]:
    """Count + scrub email/phone patterns (compiled-regex pandas pass).
    Patterns restricted to the RE2-compatible subset so Python re and
    DuckDB regexp_replace(..., 'g') agree byte-for-byte."""
    n_emails = texts.str.count(PII_EMAIL_RE).to_numpy(dtype=np.int64)
    n_phones = texts.str.count(PII_PHONE_RE).to_numpy(dtype=np.int64)
    clean = (texts.str.replace(PII_EMAIL_RE, "<EMAIL>", regex=True)
                  .str.replace(PII_PHONE_RE, "<PHONE>", regex=True))
    return {"n_emails": n_emails, "n_phones": n_phones, "clean_text": clean}
