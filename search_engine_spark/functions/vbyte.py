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


# --------------------------------------------------------- framed dual codec
#
# A 1-byte frame header in front of each encoded run lets VByte and
# fixed-width packing coexist per value run (per block, per column)
# with no schema change and no segment-wide codec flag: header 0x00 =
# VByte payload, 0x01..0x40 = WORD-ALIGNED packed payload of that bit
# width — k = 64//w values per little-endian uint64 word, LSB-first
# (the PackedInts/Simple-8b family: Anh & Moffat, Inf. Retr. 2010;
# Lemire & Boytsov, SPE 2015). Word alignment wastes 64 mod w bits per
# word (≤6%) vs tight packing but keeps BOTH codecs O(n) in scratch
# memory: tight packing needs an n×w bit matrix (a 40× blowup for wide
# runs) which measurably collapses scaling on memory-bandwidth-bound
# hosts, while word packing is one reshape + shift + OR-reduce. "auto"
# picks whichever is analytically smaller per run — Zipf tf runs pack
# to 1-3 bits, dense doc-gap runs to ~log2(gap) bits, and VByte keeps
# winning where the run is wide or skewed (one huge outlier forces the
# packed width up, exactly where PForDelta would patch exceptions —
# Zukowski et al., ICDE 2006; the auto pick IS the exception fallback).

_VBYTE_FRAME = 0x00


def _bit_width(values: np.ndarray) -> int:
    """Max bit length over a non-empty uint64 array (≥1)."""
    m = int(values.max())
    return max(m.bit_length(), 1)


def _packed_nbytes(n, w):
    """Payload bytes for word-aligned packing: ceil(n / (64//w)) words.
    Works elementwise on arrays (int64) and on Python ints."""
    k = 64 // w
    return ((n + k - 1) // k) * 8


def packed_encode(values: np.ndarray, width: int | None = None) -> bytes:
    """Word-aligned-pack a uint64 array at a fixed bit width (default:
    minimal), framed with the width header byte: k = 64//w values per
    little-endian uint64 word, LSB-first; the last word zero-padded."""
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    w = width or _bit_width(arr)
    k = 64 // w
    m = (arr.size + k - 1) // k
    padded = np.zeros(m * k, dtype=np.uint64)
    padded[: arr.size] = arr
    shifts = (np.uint64(w) * np.arange(k, dtype=np.uint64))
    words = np.bitwise_or.reduce(padded.reshape(m, k) << shifts, axis=1)
    return bytes([w]) + words.astype("<u8").tobytes()


def _packed_decode_payload(buf: np.ndarray, w: int, n: int) -> np.ndarray:
    words = np.frombuffer(buf.tobytes(), dtype="<u8").astype(np.uint64)
    k = 64 // w
    mask = np.uint64((1 << w) - 1) if w < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    shifts = (np.uint64(w) * np.arange(k, dtype=np.uint64))
    vals = (words[:, None] >> shifts) & mask
    return vals.reshape(-1)[:n].copy()


def encode_ints(values: np.ndarray, codec: str = "auto") -> bytes:
    """Encode a uint64 run as a framed byte string.

    codec: "vbyte" | "packed" | "auto" (pick the smaller of the two —
    the sizes are computed analytically, nothing is encoded twice).
    """
    arr = np.asarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    if codec == "packed":
        return packed_encode(arr)
    if codec == "vbyte":
        return bytes([_VBYTE_FRAME]) + vbyte_encode(arr)
    nb = np.ones(arr.size, dtype=np.int64)
    for p in _POW7:
        nb += arr >= np.uint64(p)
    vb_size = int(nb.sum())
    w = _bit_width(arr)
    packed_size = _packed_nbytes(arr.size, w)
    if packed_size < vb_size:
        return packed_encode(arr, w)
    return bytes([_VBYTE_FRAME]) + vbyte_encode(arr)


def decode_ints(buf: bytes, n: int) -> np.ndarray:
    """Decode a framed run back to uint64; ``n`` = expected count."""
    if len(buf) == 0:
        return np.array([], dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    w = int(b[0])
    if w == _VBYTE_FRAME:
        out = vbyte_decode(b[1:].tobytes())
    else:
        out = _packed_decode_payload(b[1:], w, n)
    if out.size != n:
        raise ValueError(f"corrupt run: expected {n} values, got {out.size}")
    return out


def encode_runs_framed(values: np.ndarray, starts: np.ndarray,
                       ends: np.ndarray, codec: str = "auto") -> list[bytes]:
    """Encode MANY value runs (``values[starts[i]:ends[i]]``) to framed
    byte strings in vectorized passes — the many-groups twin of
    :func:`encode_ints`, guaranteed to produce byte-identical output
    run-for-run (the per-run codec pick uses the same analytic rule).

    VByte payloads come from ONE whole-array VByte pass sliced per run;
    packed payloads are built per *width class* (one scatter + reshape
    + OR-reduce per distinct width, each run padded to its own word
    boundary so slices stay aligned and match the single-run encoder
    byte-for-byte). Python-level work is O(runs) slicing only; scratch
    memory is O(values), never O(values × width).
    """
    arr = np.asarray(values, dtype=np.uint64)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    n_runs = starts.size
    out: list[bytes] = [b""] * n_runs
    lens = ends - starts
    nonempty = np.flatnonzero(lens > 0)
    if nonempty.size == 0:
        return out

    # per-run VByte size (exact, nothing encoded yet)
    nb = np.ones(arr.size, dtype=np.int64)
    for p in _POW7:
        nb += arr >= np.uint64(p)
    cum_nb = np.zeros(arr.size + 1, dtype=np.int64)
    np.cumsum(nb, out=cum_nb[1:])
    vb_size = cum_nb[ends] - cum_nb[starts]

    # per-run width → packed size (+1 header byte on both sides cancels)
    widths = np.zeros(n_runs, dtype=np.int64)
    run_max = np.maximum.reduceat(arr, starts[nonempty])
    # exact bit length (no float log2 — must match encode_ints'
    # int.bit_length rule bit-for-bit): 1 + #{k : max >= 2^k}
    bl = np.ones(nonempty.size, dtype=np.int64)
    for k in range(1, 64):
        bl += run_max >= np.uint64(1 << k)
    widths[nonempty] = bl
    packed_size = np.zeros(n_runs, dtype=np.int64)
    packed_size[nonempty] = _packed_nbytes(lens[nonempty], widths[nonempty])

    if codec == "vbyte":
        use_packed = np.zeros(n_runs, dtype=bool)
    elif codec == "packed":
        use_packed = lens > 0
    else:
        use_packed = (packed_size < vb_size) & (lens > 0)

    vb_runs = np.flatnonzero(~use_packed & (lens > 0))
    if vb_runs.size:
        buf, _ = vbyte_encode_with_lengths(arr)
        mv = memoryview(buf)
        hdr = bytes([_VBYTE_FRAME])
        for i in vb_runs:
            out[i] = hdr + bytes(mv[cum_nb[starts[i]]:cum_nb[ends[i]]])

    pk_runs = np.flatnonzero(use_packed)
    for w in np.unique(widths[pk_runs]) if pk_runs.size else []:
        w = int(w)
        k = 64 // w
        sel = pk_runs[widths[pk_runs] == w]
        ls = lens[sel]
        wpr = (ls + k - 1) // k  # words per run (each run word-padded)
        word_off = np.zeros(sel.size + 1, dtype=np.int64)
        np.cumsum(wpr, out=word_off[1:])
        # vectorized gather: value index + within-run position per value
        cum = np.zeros(sel.size + 1, dtype=np.int64)
        np.cumsum(ls, out=cum[1:])
        j = np.arange(int(cum[-1]), dtype=np.int64) - np.repeat(cum[:-1], ls)
        idx = np.repeat(starts[sel], ls) + j
        # scatter into word-aligned slots, then one shift + OR-reduce
        slots = np.repeat(word_off[:-1] * k, ls) + j
        m = int(word_off[-1])
        padded = np.zeros(m * k, dtype=np.uint64)
        padded[slots] = arr[idx]
        shifts = np.uint64(w) * np.arange(k, dtype=np.uint64)
        words = np.bitwise_or.reduce(padded.reshape(m, k) << shifts, axis=1)
        pmv = memoryview(words.astype("<u8").tobytes())
        hdr = bytes([w])
        for t, i in enumerate(sel):
            out[i] = hdr + bytes(pmv[word_off[t] * 8:word_off[t + 1] * 8])
    return out


def encode_doc_gaps(sorted_doc_ids: np.ndarray,
                    codec: str = "auto") -> tuple[int, bytes]:
    """Delta-encode a sorted doc_id run → (first_doc, framed gap_bytes).

    ``first_doc`` is the original SIGNED first doc_id, stored out-of-band
    (a BIGINT column — it doubles as the block's min for pruning); every
    VByte value is a gap < 2^64 in the bias-shifted unsigned space.
    """
    a = np.asarray(sorted_doc_ids, dtype=np.int64)
    _, gaps = delta_encode(a)
    return int(a[0]), encode_ints(gaps, codec)


def decode_doc_gaps(first: int, gap_bytes: bytes, n: int) -> np.ndarray:
    """Inverse of encode_doc_gaps; ``n`` = number of doc_ids in the run."""
    gaps = decode_ints(gap_bytes, max(n - 1, 0))
    if gaps.size != max(n - 1, 0):
        raise ValueError(f"corrupt block: expected {n - 1} gaps, got {gaps.size}")
    if n == 0:
        return np.array([], dtype=np.int64)
    biased_first = (first + (1 << 63)) % (1 << 64)
    return delta_decode(biased_first, gaps)
