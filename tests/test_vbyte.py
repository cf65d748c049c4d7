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
