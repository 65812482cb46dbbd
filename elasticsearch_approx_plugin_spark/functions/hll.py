"""Pure-numpy HyperLogLog over 64-bit hashes.

Mergeable-by-max register arrays — the commutative-monoid property the
reference leans on when reducing shard facets
(``CountThenEstimateBytes.java:392-405`` in /root/reference merges
clearspring HLL estimators the same way). Values are hashed once,
JVM-side, with ``xxhash64`` before they ever reach Python; this module
only sees uint64 hashes, so every operation is a vectorized array op.

Precision: ``p`` register-index bits, m=2^p uint8 registers,
rsd ≈ 1.04/sqrt(m). The reference hardcodes rsd=0.0025
(``DistinctCountPayload.java:18``) ⇒ p=18 here; we default the same
but keep it a parameter.
"""

from __future__ import annotations

import numpy as np

HLL_DEFAULT_RSD = 0.0025

# _CLZ8[x] = leading zeros of x within 8 bits
_CLZ8 = np.array([8 - int(x).bit_length() for x in range(256)], dtype=np.uint8)


def p_for_rsd(rsd: float) -> int:
    p = int(np.ceil(np.log2((1.04 / rsd) ** 2)))
    return min(max(p, 4), 18)


HLL_DEFAULT_P = p_for_rsd(HLL_DEFAULT_RSD)


def hll_new(p: int = HLL_DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def _rho(w: np.ndarray, width: int) -> np.ndarray:
    """1 + leading-zero count of ``w`` restricted to ``width`` bits."""
    b = w.byteswap().view(np.uint8).reshape(-1, 8)  # big-endian bytes
    clz = _CLZ8[b]
    nz = clz < 8
    first = np.where(nz.any(axis=1), nz.argmax(axis=1), 8)
    total = np.where(
        first < 8,
        first.astype(np.uint32) * 8 + clz[np.arange(len(w)), np.minimum(first, 7)],
        64,
    )
    return np.minimum(total, width).astype(np.uint8) + 1


def hll_add_hashes(regs: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold uint64 hashes into the register array (in place, returned)."""
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    if h.size == 0:
        return regs
    p = int(regs.size).bit_length() - 1
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)
    rho = _rho(w, 64 - p)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    np.maximum(a, b, out=a)
    return a


def hll_estimate(regs: np.ndarray) -> int:
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else (0.673 if m == 16 else 0.697 if m == 32 else 0.709)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return int(round(est))
