"""Baseline-JPEG grayscale codec — pure stdlib + NumPy, no libjpeg.

Closes the last documented multimodal decode stub: a REAL ITU T.81
baseline decoder for single-component (grayscale) JPEGs — marker walk,
DQT/DHT table parsing, canonical Huffman decode with 0xFF00
byte-unstuffing, differential-DC reconstruction, run-length AC
expansion (ZRL/EOB), dequantization, inverse zigzag, 2-D IDCT, level
shift and clamp — plus the matching encoder used to synthesize
deterministic fixtures (no external data enters the repo).

Ground truth is NOT the encoder (a shared bug would hide): fixtures are
piecewise-constant images whose decoded pixels have an integer closed
form — a constant 8×8 block's DCT is DC-only, so decoded px =
2·round((g−128)/2) + 128 with the Annex K q00=16 table — which the
DuckDB oracle computes independently; and the coefficient round-trip
property test (tests/test_jpeg_codec.py) drives the full AC Huffman
path with random blocks against an independent IDCT.

All rounding is explicit floor(x+0.5) (round-half-up) on both the
encode and decode side so the closed form is engine-exact (NumPy's
default rint is half-to-even and would diverge at .5 boundaries).

Reference: ITU-T T.81 (JPEG), Annex K tables; the decoder reads the
tables from the stream's own DQT/DHT segments, so it is general for
baseline grayscale, not fixture-specific.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- Annex K luminance tables (public constants) ----------------------

QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Flat indices of an 8×8 block in JPEG zigzag order (generated,
    not transcribed — no typo surface)."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            ij = ij[::-1]  # even diagonals run bottom-left → top-right
        order.extend(i * 8 + j for i, j in ij)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()          # natural index at zigzag position k
UNZIGZAG = np.argsort(ZIGZAG)     # zigzag position of natural index


def _round_half_up(x):
    return np.floor(x + 0.5)


def _idct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.where(k == 0, 1.0 / np.sqrt(2.0), 1.0)
    return 0.5 * c * np.cos((2 * x + 1) * k * np.pi / 16.0)


_C = _idct_matrix()


def idct2(coeffs: np.ndarray) -> np.ndarray:
    """2-D type-III DCT (the JPEG inverse transform) of an 8×8 block."""
    return _C.T @ coeffs @ _C


def dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# ---- canonical Huffman -------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) per T.81 Annex C code assignment."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value lookup for the decoder."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing (T.81 §B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:               # unstuff 0xFF00
            nxt = self.data[self.pos]
            if nxt != 0x00:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received bits back to a signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---- encoder (fixture synthesis) ---------------------------------------


def encode_jpeg_gray_qblocks(
    qblocks: np.ndarray, width: int, height: int,
    quant: np.ndarray | None = None,
) -> bytes:
    """Assemble a baseline grayscale JPEG from already-QUANTIZED
    coefficient blocks (natural order, shape (n_blocks, 8, 8), row-major
    block layout). Full DC-differential + AC run-length/ZRL/EOB Huffman
    encoding — the property tests drive arbitrary coefficient patterns
    through this."""
    quant = QUANT_LUMA if quant is None else quant
    assert width % 8 == 0 and height % 8 == 0
    n_blocks = (width // 8) * (height // 8)
    assert qblocks.shape == (n_blocks, 8, 8)

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in qblocks:
        zz = blk.reshape(64)[ZIGZAG]
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        s = _category(diff)
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
    scan = bw.flush()

    zz_quant = quant.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
    dqt = b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + zz_quant
    sof = (
        b"\xff\xc0" + struct.pack(">H", 2 + 6 + 3)
        + struct.pack(">BHHB", 8, height, width, 1)
        + bytes([1, 0x11, 0])
    )
    dht = (
        b"\xff\xc4"
        + struct.pack(">H", 2 + (1 + 16 + len(DC_VALS)) + (1 + 16 + len(AC_VALS)))
        + b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
        + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)
    )
    sos = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + bytes([1, 1, 0x00, 0, 63, 0])
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


def make_jpeg_gray_blocks(width: int, height: int,
                          block_grays: list[int]) -> bytes:
    """Piecewise-constant grayscale JPEG: block b uniformly
    ``block_grays[b]``. Constant blocks are DC-only after the DCT, so
    the decoded pixels have the integer closed form the oracle uses:
    px_b = 2·round_half_up((g_b − 128)/2) + 128 (q00 = 16)."""
    q00 = int(QUANT_LUMA[0, 0])
    qblocks = np.zeros((len(block_grays), 8, 8), dtype=np.int64)
    for b, g in enumerate(block_grays):
        # DCT of a constant block: DC = 8·(g−128), AC = 0
        qblocks[b, 0, 0] = int(_round_half_up(8.0 * (g - 128) / q00))
    return encode_jpeg_gray_qblocks(qblocks, width, height)


# ---- decoder ------------------------------------------------------------


def decode_jpeg_gray(payload: bytes, return_coeffs: bool = False):
    """Decode a baseline grayscale JPEG → dict(width, height, pixels
    uint8 (h, w)); with ``return_coeffs`` also the quantized coefficient
    blocks (n_blocks, 8, 8) for round-trip tests. Tables are read from
    the stream's own DQT/DHT segments."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant = None
    dc_tbl = ac_tbl = None
    width = height = None
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + ln]
        if marker == 0xDB:  # DQT (8-bit tables only, baseline)
            if seg[0] & 0xF0:
                raise ValueError("16-bit quant tables unsupported")
            zz = np.frombuffer(seg[1:65], dtype=np.uint8).astype(np.int32)
            quant = np.zeros(64, dtype=np.int32)
            quant[ZIGZAG] = zz
            quant = quant.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                tclass, tid = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1:off + 17])
                nv = sum(bits)
                vals = list(seg[off + 17:off + 17 + nv])
                tbl = _decode_table(bits, vals)
                if tclass == 0 and tid == 0:
                    dc_tbl = tbl
                elif tclass == 1 and tid == 0:
                    ac_tbl = tbl
                off += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit grayscale baseline supported")
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDA:  # SOS
            scan_start = pos + 2 + ln
            break
        pos += 2 + ln
    if any(x is None for x in (quant, dc_tbl, ac_tbl, width, scan_start)):
        raise ValueError("missing DQT/DHT/SOF0/SOS before scan")

    eoi = payload.rfind(b"\xff\xd9")
    br = _BitReader(payload[scan_start:eoi])
    bw_, bh_ = width // 8, height // 8
    n_blocks = bw_ * bh_
    coeffs = np.zeros((n_blocks, 64), dtype=np.int64)
    prev_dc = 0
    for b in range(n_blocks):
        s = br.read_code(dc_tbl)
        diff = _extend(br.read(s), s) if s else 0
        prev_dc += diff
        coeffs[b, 0] = prev_dc
        k = 1
        while k < 64:
            rs = br.read_code(ac_tbl)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            run, s = rs >> 4, rs & 0x0F
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            coeffs[b, k] = _extend(br.read(s), s)
            k += 1

    natural = np.zeros_like(coeffs)
    natural[:, ZIGZAG] = coeffs
    qblocks = natural.reshape(n_blocks, 8, 8)
    pixels = np.zeros((height, width), dtype=np.uint8)
    for b in range(n_blocks):
        block = idct2((qblocks[b] * quant).astype(np.float64))
        px = np.clip(_round_half_up(block + 128.0), 0, 255).astype(np.uint8)
        r, c = divmod(b, bw_)
        pixels[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = px
    out = {"width": int(width), "height": int(height), "pixels": pixels}
    if return_coeffs:
        out["qblocks"] = qblocks
    return out
