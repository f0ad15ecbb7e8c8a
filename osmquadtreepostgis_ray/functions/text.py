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
