"""Delta + VByte (varint) frame-of-reference codecs, NumPy-vectorized.

VByte: 7 data bits per byte, MSB=1 means "more bytes follow", little-
endian 7-bit groups — the classic postings-list byte-aligned codec
(Scholer et al., SIGIR 2002; used with delta gaps as in the block-max
WAND literature, Ding & Suel SIGIR 2011).

Both encode and decode are fully vectorized (no per-element Python
loop) so a pandas-UDF block encoder stays Arrow-speed. At real cluster
scale this codec runs inside the grouped encode/decode UDFs over
columnar batches, so its throughput is on the build/query hot path.
"""

from __future__ import annotations

import numpy as np

_POW7 = [1 << (7 * k) for k in range(1, 10)]


def vbyte_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a 1-D array of non-negative ints (< 2^63) to VByte bytes,
    returning ``(buf, per_value_byte_lengths)``.

    The lengths array lets a caller encode MANY runs in one vectorized
    call and slice out each run's byte range afterwards (the batch block
    encoder does exactly this — one encode per Arrow batch instead of
    one per posting-list block)."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b"", np.array([], dtype=np.int64)
    if arr.ndim != 1:
        raise ValueError("vbyte_encode expects a 1-D array")
    nb = np.ones(arr.size, dtype=np.int64)
    for p in _POW7:
        nb += arr >= np.uint64(p)
    offs = np.zeros(arr.size, dtype=np.int64)
    np.cumsum(nb[:-1], out=offs[1:])
    total = int(offs[-1] + nb[-1])
    out = np.zeros(total, dtype=np.uint8)
    max_nb = int(nb.max())
    for k in range(max_nb):
        sel = nb > k
        pos = offs[sel] + k
        vals = (arr[sel] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = ((nb[sel] - 1) > k).astype(np.uint8) << np.uint8(7)
        out[pos] = vals.astype(np.uint8) | cont
    return out.tobytes(), nb


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a 1-D array of non-negative ints (< 2^63) to VByte bytes."""
    return vbyte_encode_with_lengths(values)[0]


def vbyte_decode(buf: bytes) -> np.ndarray:
    """Decode VByte bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.array([], dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    # position of each byte within its value
    off = np.arange(b.size, dtype=np.int64) - np.repeat(starts, lengths)
    vals7 = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * off.astype(np.uint64))
    return np.add.reduceat(vals7, starts)


def delta_encode(sorted_vals: np.ndarray) -> tuple[int, np.ndarray]:
    """(first_value, gaps) for a strictly/weakly increasing int64 array.

    doc_ids are signed int64 hashes; we bias to unsigned space so gaps
    stay non-negative and small for dense blocks.
    """
    a = np.asarray(sorted_vals, dtype=np.int64).astype(np.uint64)
    a = a + np.uint64(1 << 63)  # bias signed → unsigned, order-preserving
    if a.size == 0:
        return 0, np.array([], dtype=np.uint64)
    gaps = np.empty(a.size - 1, dtype=np.uint64)
    np.subtract(a[1:], a[:-1], out=gaps)
    return int(a[0]), gaps


def delta_decode(first: int, gaps: np.ndarray) -> np.ndarray:
    """Inverse of delta_encode → signed int64 array."""
    n = gaps.size + 1
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(first)
    if gaps.size:
        np.cumsum(gaps, out=out[1:])
        out[1:] += np.uint64(first)
    return (out - np.uint64(1 << 63)).view(np.int64).astype(np.int64)


def encode_doc_gaps(sorted_doc_ids: np.ndarray) -> tuple[int, bytes]:
    """Delta+VByte a sorted doc_id run → (first_doc, gap_bytes).

    ``first_doc`` is the original SIGNED first doc_id, stored out-of-band
    (a BIGINT column — it doubles as the block's min for pruning); every
    VByte value is a gap < 2^64 in the bias-shifted unsigned space.
    """
    a = np.asarray(sorted_doc_ids, dtype=np.int64)
    _, gaps = delta_encode(a)
    return int(a[0]), vbyte_encode(gaps)


def decode_doc_gaps(first: int, gap_bytes: bytes, n: int) -> np.ndarray:
    """Inverse of encode_doc_gaps; ``n`` = number of doc_ids in the run."""
    gaps = vbyte_decode(gap_bytes)
    if gaps.size != max(n - 1, 0):
        raise ValueError(f"corrupt block: expected {n - 1} gaps, got {gaps.size}")
    if n == 0:
        return np.array([], dtype=np.int64)
    biased_first = (first + (1 << 63)) % (1 << 64)
    return delta_decode(biased_first, gaps)
