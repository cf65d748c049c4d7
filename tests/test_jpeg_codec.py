"""Baseline-JPEG grayscale codec (ops/jpegcodec.py): coefficient
round-trips pin the full Huffman path (differential DC, AC run-length,
ZRL, EOB, byte stuffing); pixels are checked against an INDEPENDENT
direct-formula IDCT, and the DC closed form the DuckDB oracle uses is
re-derived here. Gate parity runs in test_ops_parity (mm_jpeg_pixels)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.ops.jpegcodec import (
    QUANT_LUMA,
    decode_jpeg_gray,
    encode_jpeg_gray_qblocks,
    make_jpeg_gray_blocks,
)


def _idct_direct(coeffs: np.ndarray) -> np.ndarray:
    """Textbook O(n^4) inverse DCT — written independently of the
    codec's matrix formulation."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coeffs[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_coefficient_roundtrip(data):
    """encode(qblocks) → decode == qblocks exactly, for arbitrary
    sparse signed coefficients (drives every AC code class)."""
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    nb = int(rng.integers(1, 7))
    q = rng.integers(-255, 256, (nb, 8, 8)).astype(np.int64)
    q[rng.random((nb, 8, 8)) < float(rng.uniform(0.5, 0.98))] = 0
    buf = encode_jpeg_gray_qblocks(q, 8 * nb, 8)
    d = decode_jpeg_gray(buf, return_coeffs=True)
    assert (d["qblocks"] == q).all()


def test_pixels_match_independent_idct():
    rng = np.random.default_rng(11)
    q = rng.integers(-20, 21, (2, 8, 8)).astype(np.int64)
    q[rng.random((2, 8, 8)) < 0.8] = 0
    buf = encode_jpeg_gray_qblocks(q, 16, 8)
    px = decode_jpeg_gray(buf)["pixels"]
    for b in range(2):
        ref = _idct_direct((q[b] * QUANT_LUMA).astype(np.float64))
        want = np.clip(np.floor(ref + 128.0 + 0.5), 0, 255).astype(np.uint8)
        assert (px[:, b * 8:(b + 1) * 8] == want).all()


def test_dc_closed_form_matches_oracle_formula():
    grays = list(range(8, 248, 17))
    w = 8 * len(grays)
    buf = make_jpeg_gray_blocks(w, 8, grays)
    px = decode_jpeg_gray(buf)["pixels"]
    for b, g in enumerate(grays):
        blk = px[:, b * 8:(b + 1) * 8]
        assert (blk == blk[0, 0]).all()
        # the oracle's integer form: 2*floor((g-127)/2) + 128
        assert int(blk[0, 0]) == 2 * ((g - 127) // 2) + 128


def test_zrl_and_long_runs():
    """A lone coefficient at the last zigzag position forces ZRL
    emission (runs > 15)."""
    q = np.zeros((1, 8, 8), dtype=np.int64)
    q[0, 7, 7] = 3   # zigzag position 63 → three ZRLs + run-15 code
    buf = encode_jpeg_gray_qblocks(q, 8, 8)
    d = decode_jpeg_gray(buf, return_coeffs=True)
    assert (d["qblocks"] == q).all()


def test_rejects_non_baseline():
    from search_engine_spark.ops.multimodal import make_jpeg_shell

    import pytest

    with pytest.raises(ValueError):
        decode_jpeg_gray(make_jpeg_shell(16, 8, 1))  # no scan/tables
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x89PNG")
