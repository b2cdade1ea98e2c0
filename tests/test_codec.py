"""Round-trip and block-access tests for the posting-list codec."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_ingest_ray.codec import (
    BLOCK, decode_block, decode_postings, decode_varint, encode_postings,
    encode_varint,
)


def test_varint_roundtrip_edges():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**63 - 1, 2**64 - 1],
                 dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(v)), v)


def test_varint_empty():
    assert encode_varint(np.empty(0, dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(decode_varint(encode_varint(v)), v)


def _random_list(n, seed=0):
    rng = np.random.default_rng(seed)
    d = np.unique(rng.integers(0, 2**40, size=n, dtype=np.uint64))
    tf = rng.integers(1, 1000, size=d.size, dtype=np.uint64)
    sc = rng.random(d.size).astype(np.float32)
    return d, tf, sc


@pytest.mark.parametrize("n", [1, 2, BLOCK - 1, BLOCK, BLOCK + 1, 5000])
def test_postings_roundtrip(n):
    d, tf, sc = _random_list(n, seed=n)
    enc = encode_postings(d, tf, dls=None, scores=sc)
    dd, tt = decode_postings(enc["doc_blob"], enc["tf_blob"], enc["df"])
    assert np.array_equal(dd, d)
    assert np.array_equal(tt, tf)


def test_block_access_matches_full_decode():
    d, tf, sc = _random_list(1000, seed=7)
    enc = encode_postings(d, tf, dls=None, scores=sc)
    nblocks = len(enc["skip_doc_off"])
    for b in range(nblocks):
        bd, bt = decode_block(enc["doc_blob"], enc["tf_blob"], enc["df"], b,
                              enc["skip_last"], enc["skip_doc_off"], enc["skip_tf_off"])
        lo, hi = b * BLOCK, min((b + 1) * BLOCK, d.size)
        assert np.array_equal(bd, d[lo:hi])
        assert np.array_equal(bt, tf[lo:hi])
        assert enc["skip_last"][b] == d[hi - 1]
        assert enc["skip_max_score"][b] == sc[lo:hi].max()


def test_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 1], dtype=np.uint64),
                        np.array([1, 1], dtype=np.uint64))
    with pytest.raises(ValueError):
        encode_postings(np.array([1, 1], dtype=np.uint64),
                        np.array([1, 1], dtype=np.uint64))
