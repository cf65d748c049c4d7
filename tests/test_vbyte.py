"""VByte / delta codec property tests."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.vbyte import (
    decode_doc_gaps,
    delta_decode,
    delta_encode,
    encode_doc_gaps,
    vbyte_decode,
    vbyte_encode,
)


def test_empty():
    assert vbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert vbyte_decode(b"").size == 0


def test_known_values():
    # 0 → 0x00; 127 → 0x7F; 128 → 0x80 0x01 (little-endian 7-bit groups)
    assert vbyte_encode(np.array([0])) == b"\x00"
    assert vbyte_encode(np.array([127])) == b"\x7f"
    assert vbyte_encode(np.array([128])) == b"\x80\x01"
    assert list(vbyte_decode(b"\x80\x01")) == [128]


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
def test_vbyte_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(vbyte_decode(vbyte_encode(arr))) == vals


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=200, unique=True,
    )
)
def test_doc_gap_roundtrip(doc_ids):
    doc_ids = sorted(doc_ids)
    arr = np.array(doc_ids, dtype=np.int64)
    first, buf = encode_doc_gaps(arr)
    back = decode_doc_gaps(first, buf, len(doc_ids))
    assert list(back) == doc_ids


def test_delta_monotone_bias():
    a = np.array([-5, -1, 0, 3, 2**62], dtype=np.int64)
    first, gaps = delta_encode(a)
    assert (gaps >= 0).all()
    assert list(delta_decode(first, gaps)) == list(a)


# ---------------------------------------------------- framed dual codec

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.functions.vbyte import (
    decode_ints,
    encode_ints,
    encode_runs_framed,
    packed_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1),
                max_size=300),
       st.sampled_from(["auto", "vbyte", "packed"]))
@settings(max_examples=60, deadline=None)
def test_framed_roundtrip(vals, codec):
    arr = np.array(vals, dtype=np.uint64)
    buf = encode_ints(arr, codec)
    assert list(decode_ints(buf, len(vals))) == vals
    if vals and codec == "auto":
        # auto is never larger than either explicit codec
        assert len(buf) <= len(encode_ints(arr, "vbyte"))
        assert len(buf) <= len(encode_ints(arr, "packed"))


def test_packed_width_boundaries():
    for w in (1, 7, 8, 9, 31, 32, 33, 63, 64):
        vals = np.array([0, 1, (1 << w) - 1, (1 << (w - 1))],
                        dtype=np.uint64)
        buf = packed_encode(vals)
        assert buf[0] == w
        assert list(decode_ints(buf, 4)) == [int(v) for v in vals]


@given(st.lists(st.lists(st.integers(min_value=0,
                                     max_value=(1 << 63) - 1),
                         max_size=40),
                max_size=25),
       st.sampled_from(["auto", "vbyte", "packed"]))
@settings(max_examples=60, deadline=None)
def test_runs_framed_identical_to_per_run(runs, codec):
    """Many-runs vectorized encoder ≡ per-run encode_ints, byte for
    byte — the invariant that keeps the grouped and batch block
    kernels producing identical indexes."""
    flat = np.array([v for r in runs for v in r], dtype=np.uint64)
    lens = np.array([len(r) for r in runs], dtype=np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens
    got = encode_runs_framed(flat, starts, ends, codec)
    want = [encode_ints(np.array(r, dtype=np.uint64), codec) for r in runs]
    assert got == want
