"""Vectorized delta + varint codec for posting blocks.

The reference stores one PostgreSQL row per posting
(``model/Index.java:12-23``).  At 10^12 docs that is the storage
bottleneck, so the rebuild packs doc-id gaps as LEB128 varints inside
Arrow ``BinaryType`` blocks (SURVEY.md §7.0 storage layout).

Everything here is NumPy-vectorized over whole arrays: encode loops over
*byte positions* (<= 10 for uint64), never over values; decode uses
``np.add.reduceat`` over continuation-bit group boundaries.  Round-trip
is property-tested in tests/test_codec.py.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # ceil(64 / 7)


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte count per value.  Vectorized.

    bit_length via log2 is unsafe at 2^53, so shift-loop over the 10
    possible byte counts (constant trip count, vectorized body).
    """
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    tmp = vals.copy()
    nbytes = np.ones(vals.shape, dtype=np.int64)
    for _ in range(_MAX_VARINT_BYTES - 1):
        tmp >>= np.uint64(7)
        nbytes += (tmp > 0).astype(np.int64)
    return nbytes


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array -> bytes.  Vectorized.

    Per value: 7 payload bits per byte, high bit = continuation.
    """
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    nbytes = varint_byte_lengths(vals)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # start offset of each value's byte run
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    shifted = vals.copy()
    for byte_idx in range(_MAX_VARINT_BYTES):
        mask = nbytes > byte_idx
        if not mask.any():
            break
        pos = starts[mask] + byte_idx
        payload = (shifted[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > byte_idx + 1).astype(np.uint8) << 7
        out[pos] = payload | cont
        shifted >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array.  Vectorized via reduceat."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    # group id of each byte: 0-based index of the value it belongs to
    group_starts = np.concatenate(([0], np.flatnonzero(is_last)[:-1] + 1))
    # position of each byte within its group -> payload shift
    byte_pos = np.arange(raw.size, dtype=np.int64)
    byte_pos -= np.repeat(group_starts, np.diff(np.concatenate((group_starts, [raw.size]))))
    payload = (raw & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * byte_pos.astype(np.uint64)
    )
    vals = np.add.reduceat(payload, group_starts)
    if count is not None and vals.size != count:
        raise ValueError(f"varint_decode: expected {count} values, got {vals.size}")
    return vals.astype(np.uint64)


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """Strictly-increasing uint64 array -> gaps (first value verbatim).

    Sortedness is validated here because a corrupt order would silently
    break searchsorted-based intersection at query time.
    """
    v = np.ascontiguousarray(sorted_vals, dtype=np.uint64)
    if v.size == 0:
        return v
    d = np.empty_like(v)
    d[0] = v[0]
    np.subtract(v[1:], v[:-1], out=d[1:])
    if v.size > 1 and not (v[1:] > v[:-1]).all():
        raise ValueError("delta_encode: input not strictly increasing")
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode` (cumsum)."""
    d = np.ascontiguousarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray) -> bytes:
    """doc-id list (sorted, unique) -> delta+varint bytes."""
    return varint_encode(delta_encode(doc_ids))


def decode_postings(buf: bytes, count: int | None = None) -> np.ndarray:
    """Inverse of :func:`encode_postings` -> uint64 doc ids."""
    return delta_decode(varint_decode(buf, count))
