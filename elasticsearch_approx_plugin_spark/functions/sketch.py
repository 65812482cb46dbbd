"""CountThenEstimate — exact-below-threshold / HLL-above distinct state.

Re-expresses the reference's headline feature
(``CountThenEstimateBytes.java:166-185`` offer, ``216-231`` tip,
``362-412`` merge; threshold sentinels ``DateFacetParser.java:188-189``
— all in /root/reference) as a small mergeable Python state carried
through Spark aggregation as ``BinaryType``:

- ``threshold = -1`` → never tip (always exact);
- ``threshold = 0``  → always sketch (tips on construction);
- otherwise exact until the distinct set exceeds ``threshold``, then
  tip into HyperLogLog and stay tipped; merging two exact states whose
  union exceeds the threshold also tips (reference merge: untipped
  path ``:377-390``, all-tipped ``:392-398``, mixed ``:400-405``).

Divergence from the reference (documented, deliberate): the exact set
stores 64-bit xxhash64 hashes of the values, not raw bytes — at the
default threshold of 1000 the collision probability is ~2.7e-14, and
it keeps the state fixed-width and Arrow-friendly. The reference
likewise offers *hashes* to its sketch (Lucene MurmurHash2,
``CountThenEstimateBytes.java:48,170``), only its exact set is raw.

``count`` tracks total occurrences offered (the reference's
``DistinctCountPayload`` pairing, ``DistinctCountPayload.java:16-27``).
"""

from __future__ import annotations

import struct

import numpy as np

from .hll import HLL_DEFAULT_RSD, hll_add_hashes, hll_estimate, hll_merge, hll_new, p_for_rsd

_NEVER = np.iinfo(np.int64).max  # threshold<0 sentinel resolves to "never"

_HDR = struct.Struct("<BqqB")  # tipped, count, threshold, p


class CountThenEstimate:
    __slots__ = ("threshold", "p", "count", "tipped", "exact", "regs")

    def __init__(self, threshold: int = 1000, rsd: float = HLL_DEFAULT_RSD, p: int | None = None):
        # ANY negative threshold = never tip, matching the reference
        # (DateFacetParser: exactThreshold < 0 → Integer.MAX_VALUE)
        self.threshold = _NEVER if threshold < 0 else int(threshold)
        self.p = p if p is not None else p_for_rsd(rsd)
        self.count = 0
        self.tipped = self.threshold == 0
        self.exact: np.ndarray | None = None if self.tipped else np.empty(0, dtype=np.uint64)
        self.regs: np.ndarray | None = hll_new(self.p) if self.tipped else None

    # -- updates ---------------------------------------------------------
    def offer_hashes(self, hashes: np.ndarray) -> None:
        """Offer a batch of uint64 value-hashes (occurrences, with repeats)."""
        h = np.ascontiguousarray(hashes, dtype=np.uint64)
        self.count += int(h.size)
        if self.tipped:
            hll_add_hashes(self.regs, h)
            return
        self.exact = np.union1d(self.exact, h)  # sorted unique union
        if self.exact.size > self.threshold:
            self._tip()

    def _tip(self) -> None:
        self.regs = hll_new(self.p)
        hll_add_hashes(self.regs, self.exact)
        self.exact = None
        self.tipped = True

    def merge(self, other: "CountThenEstimate") -> "CountThenEstimate":
        self.count += other.count
        if not self.tipped and not other.tipped:
            self.exact = np.union1d(self.exact, other.exact)
            if self.exact.size > self.threshold:
                self._tip()
            return self
        if not self.tipped:
            self._tip()
        if other.tipped:
            hll_merge(self.regs, other.regs)
        else:
            hll_add_hashes(self.regs, other.exact)
        return self

    # -- results ---------------------------------------------------------
    def cardinality(self) -> int:
        if self.tipped:
            return hll_estimate(self.regs)
        return int(self.exact.size)

    # -- wire ------------------------------------------------------------
    def to_bytes(self) -> bytes:
        hdr = _HDR.pack(int(self.tipped), self.count, self.threshold, self.p)
        body = self.regs.tobytes() if self.tipped else self.exact.tobytes()
        return hdr + body

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountThenEstimate":
        tipped, count, threshold, p = _HDR.unpack_from(buf)
        st = cls.__new__(cls)
        st.threshold, st.p, st.count, st.tipped = threshold, p, count, bool(tipped)
        body = np.frombuffer(buf, dtype=np.uint8, offset=_HDR.size)
        if st.tipped:
            st.regs, st.exact = body.copy(), None
        else:
            st.exact, st.regs = body.view(np.uint64).copy(), None
        return st
