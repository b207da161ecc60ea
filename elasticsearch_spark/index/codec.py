"""Posting-list codec: delta + variable-byte, numpy-vectorized.

Mirrors the *capability* of the Lucene87 postings format the reference
selects (index/codec/CodecService.java:39-45): doc ids stored as deltas
in blocks of 128 with per-block skip metadata, freqs as small varints.
This is a fresh implementation on numpy (not FOR/PackedInts): classic
VByte — 7 data bits per byte, high bit = continuation.

All encode/decode paths are array-at-a-time numpy; no per-value Python
in the hot loop beyond a bounded (<=10) pass over byte-width classes.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # docs per block, mirroring Lucene's FOR block size


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int64 array as VByte (little-endian 7-bit
    groups, high bit set on all but the terminal byte of each value)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value in ONE searchsorted pass (7-bit groups)
    nbytes = 1 + np.searchsorted(_VB_THRESHOLDS, v, side="right")
    if nbytes.max() == 1:
        return v.astype(np.uint8).tobytes()
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    total = int(offsets[-1])
    out = np.empty(total, dtype=np.uint8)
    # fill byte position j (j-th 7-bit group) for every value wide enough
    max_w = int(nbytes.max())
    for j in range(max_w):
        mask = nbytes > j
        idx = offsets[:-1][mask] + j
        group = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > j
        out[idx] = group.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


# byte-width thresholds: value v needs 1 + (#thresholds <= v) bytes
_VB_THRESHOLDS = np.array(
    [1 << (7 * k) for k in range(1, 10)], dtype=np.uint64
)


def vbyte_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """VByte-encode an array and return (buffer, start_offsets) where
    start_offsets has len(values)+1 entries; the encoding of value i is
    buffer[start_offsets[i]:start_offsets[i+1]]. Because VByte is
    per-value, any contiguous slice of values maps to a contiguous byte
    slice — one encode pass serves every posting block of a group.

    Fast paths: all-small arrays (tf/delta streams are overwhelmingly
    single-byte) are a plain uint8 cast; the generic path computes byte
    widths with ONE searchsorted pass instead of a shift loop."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = 1 + np.searchsorted(_VB_THRESHOLDS, v, side="right")
    if nbytes.max() == 1:
        return v.astype(np.uint8).tobytes(), np.arange(n + 1, dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)))
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    max_w = int(nbytes.max())
    for j in range(max_w):
        mask = nbytes > j
        idx = offsets[:-1][mask] + j
        group = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1) > j
        out[idx] = group.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes(), offsets


def vbyte_decode(buf: bytes) -> np.ndarray:
    """Decode a VByte buffer to an int64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.flatnonzero(b < 128)  # terminal byte of each value
    starts = np.concatenate(([0], ends[:-1] + 1))
    widths = ends - starts + 1
    n = ends.size
    vals = np.zeros(n, dtype=np.uint64)
    max_w = int(widths.max())
    for j in range(max_w):
        mask = widths > j
        byte = b[starts[mask] + j].astype(np.uint64)
        vals[mask] |= (byte & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals.astype(np.int64)


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """first value kept, then gaps (strictly sorted input -> gaps>=0)."""
    a = np.asarray(sorted_values, dtype=np.int64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.int64))


def encode_positions(positions_per_doc: list[np.ndarray]) -> bytes:
    """Per-doc position lists -> one VByte stream:
    [len, delta-positions...] per doc, concatenated."""
    parts: list[np.ndarray] = []
    for pos in positions_per_doc:
        p = np.asarray(pos, dtype=np.int64)
        parts.append(np.array([p.size], dtype=np.int64))
        if p.size:
            parts.append(delta_encode(p))
    if not parts:
        return b""
    return vbyte_encode(np.concatenate(parts))


def decode_positions(buf: bytes, n_docs: int) -> list[np.ndarray]:
    flat = vbyte_decode(buf)
    out: list[np.ndarray] = []
    i = 0
    for _ in range(n_docs):
        ln = int(flat[i])
        i += 1
        out.append(delta_decode(flat[i : i + ln]))
        i += ln
    return out


def split_blocks(n: int, block_size: int = BLOCK_SIZE) -> list[tuple[int, int]]:
    return [(i, min(i + block_size, n)) for i in range(0, n, block_size)]
