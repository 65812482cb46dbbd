"""Vectorized (numpy) varint / delta-varint codecs for posting lists.

The reference wire-encodes shard facets as ES VLong/VInt streams
(``InternalCountingFacet.java:196-222`` in /root/reference); here the
same idea compresses posting lists at rest: docIDs are stored as
varint-coded deltas of a sorted sequence, term frequencies as plain
varints. Everything is numpy-vectorized — no per-value Python loops —
so encode/decode runs at memory bandwidth inside Arrow batches.
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # 64-bit varint worst case


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    shifts = (np.arange(_MAX_BYTES, dtype=np.uint64) * np.uint64(7))[None, :]
    chunks = ((v[:, None] >> shifts) & np.uint64(0x7F)).astype(np.uint8)
    # byte k is needed iff value >= 2^(7k) (k==0 always needed)
    needed = (v[:, None] >> shifts) != 0
    needed[:, 0] = True
    # continuation bit on every needed byte except the last per value
    last = needed & ~np.roll(needed, -1, axis=1)
    last[:, -1] = needed[:, -1]
    chunks |= np.where(needed & ~last, np.uint8(0x80), np.uint8(0))
    return chunks[needed].tobytes()


def varint_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a LEB128 byte stream into a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    group = np.zeros(b.size, dtype=np.int64)
    group[1:] = np.cumsum(ends[:-1])
    n = int(ends.sum())
    # position of each byte within its group
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.flatnonzero(ends)[:-1] + 1
    pos = np.arange(b.size, dtype=np.int64) - starts[group]
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, group, (b & np.uint8(0x7F)).astype(np.uint64) << (pos.astype(np.uint64) * np.uint64(7)))
    return out


def _varint_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized)."""
    v = values.astype(np.uint64, copy=False)
    n = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        n += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    return n


def varint_encode_grouped(values: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """Encode MANY concatenated groups in one vectorized pass.

    ``starts`` are the row indexes where each group begins (sorted,
    starts[0] == 0). The whole value array is LEB128-encoded once; the
    flat buffer is then sliced at per-group byte boundaries — no
    per-group numpy calls, which is what makes million-group posting
    encodes run at memory bandwidth.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return []
    buf = varint_encode(v)
    offs = np.zeros(v.size + 1, dtype=np.int64)
    np.cumsum(_varint_lengths(v), out=offs[1:])
    bounds = offs[np.append(starts, v.size)]
    mv = memoryview(buf)
    return [bytes(mv[bounds[i] : bounds[i + 1]]) for i in range(len(starts))]


def delta_varint_encode(sorted_values: np.ndarray) -> bytes:
    """Delta-then-varint encode a sorted uint64 array (first value absolute)."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return b""
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    np.subtract(v[1:], v[:-1], out=deltas[1:])
    return varint_encode(deltas)


def delta_varint_decode(buf: bytes) -> np.ndarray:
    d = varint_decode(buf)
    return np.cumsum(d, dtype=np.uint64)
