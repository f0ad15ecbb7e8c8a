"""Sketch kernels: HyperLogLog registers over a 64-bit splitmix hash.

The sketch state is the register table itself — (group, register,
max_rho) rows — which is what a distributed HLL actually shuffles: one
m-register partial per group per batch, mergeable by max.  Everything is
exact integer arithmetic so the DuckDB oracle (same splitmix in HUGEINT
mod 2^64, same register split) compares full values; the float
cardinality estimate is a trivial driver-side epilogue on ~m rows and
deliberately not part of the compared operator output.

Reference analog: the reference has no sketches (SURVEY.md §2.6 "no
approximate aggregates") — this is one of the beyond-reference
training-data operators (distinct counting at 100 TB can't afford the
exact distinct shuffle that q_distinct_users does).
"""

from __future__ import annotations

import numpy as np

from osmquadtreepostgis_ray.functions.codecs import _splitmix

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 64 - HLL_P         # 58 value bits; rho in [1, 59]

_C1 = 0x9E3779B97F4A7C15
_C2 = 0xBF58476D1CE4E5B9
_C3 = 0x94D049BB133111EB


def bitlen_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized integer bit length (position of highest set bit + 1;
    0 for 0).  Pure shift cascade — float log2 misrounds near 2^k
    boundaries for values wider than the 52-bit mantissa."""
    v = np.asarray(v, dtype=np.uint64).copy()
    out = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= np.uint64(1) << np.uint64(s)
        out[m] += s
        v[m] >>= np.uint64(s)
    out[v > 0] += 1
    return out


def hll_register_rho(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int64 keys -> (register in [0, 64), rho in [1, 59]).

    h = splitmix64(key); top HLL_P bits pick the register; rho is the
    1-based position of the highest set bit counted from the top of the
    remaining HLL_WBITS bits (all-zero remainder -> HLL_WBITS + 1)."""
    h = _splitmix(np.asarray(keys, dtype=np.int64).astype(np.uint64))
    reg = (h >> np.uint64(HLL_WBITS)).astype(np.int64)
    w = h & np.uint64((1 << HLL_WBITS) - 1)
    rho = HLL_WBITS - bitlen_u64(w) + 1
    return reg, rho.astype(np.int64)


def hll_estimate(rhos_by_register: np.ndarray) -> float:
    """Standard HLL estimate from a FULL m-length register vector
    (absent registers as 0).  Driver-side epilogue, float by nature."""
    m = HLL_M
    z = float(np.sum(np.power(2.0, -rhos_by_register.astype(np.float64))))
    alpha = 0.709  # alpha_64
    e = alpha * m * m / z
    zeros = int(np.sum(rhos_by_register == 0))
    if e <= 2.5 * m and zeros:
        e = m * np.log(m / zeros)  # linear counting for the small range
    return float(e)


def splitmix_sql_ctes(src: str, key_expr: str, mulmod64, prefix: str = "sm",
                      carry: str = "") -> tuple[str, str]:
    """CTE chain computing h = splitmix64(key_expr) over rows of `src`
    (chained CTEs, not nested expressions — mulmod64 triplicates its
    argument, so inlining is exponential).  `carry` is extra columns to
    thread through.  Returns (cte_sql, final_cte_name); the final CTE
    has columns (carry..., h)."""
    m64 = 1 << 64
    cols = f"{carry}, " if carry else ""
    return (f"""
    {prefix}1 AS (SELECT {cols}(CAST({key_expr} AS HUGEINT) + {_C1}) % {m64} AS v1 FROM {src}),
    {prefix}2 AS (SELECT {cols}{mulmod64(f'xor(v1, v1 // {1 << 30})', _C2)} AS v2 FROM {prefix}1),
    {prefix}3 AS (SELECT {cols}{mulmod64(f'xor(v2, v2 // {1 << 27})', _C3)} AS v3 FROM {prefix}2),
    {prefix}4 AS (SELECT {cols}xor(v3, v3 // {1 << 31}) AS h FROM {prefix}3)""",
            f"{prefix}4")


# ------------------------------------------------------------- count-min

CM_D = 4                       # sketch depth (independent hash rows)
CM_W = 2048                    # sketch width (slots per row)


def cm_positions(keys: np.ndarray, d: int = CM_D, w: int = CM_W) -> np.ndarray:
    """(d, n) count-min slot positions: splitmix64 of key xor a per-row
    odd constant, mod width — pure function of the key, so candidacy
    decided against a broadcast sketch is identical in every task."""
    x = np.asarray(keys, dtype=np.uint64)
    out = np.empty((d, len(x)), np.int64)
    for r in range(d):
        seed = np.uint64((_C1 * (2 * r + 1)) & 0xFFFFFFFFFFFFFFFF)
        h = _splitmix(x ^ seed)
        out[r] = (h % np.uint64(w)).astype(np.int64)
    return out


def kmv_estimate(kth_hash: int, k: int) -> float:
    """Distinct-count estimate from the k-th smallest mod-2^63 hash:
    (k-1) * 2^63 / kth.  Driver-side epilogue on one row per group;
    float by nature and deliberately outside the compared output."""
    return (k - 1) * float(1 << 63) / float(kth_hash)
