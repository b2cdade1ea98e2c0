"""Reciprocal-rank fusion kernel (query/fusion.py)."""
import numpy as np

from search_ingest_ray.query.fusion import rrf_fuse


def c(rank, K=60):
    return 1_000_000 // (K + rank)


def test_rrf_hand_example():
    lex = np.array([5, 3, 9], dtype=np.int64)      # ranks 1,2,3
    vec = np.array([3, 7], dtype=np.int64)         # ranks 1,2
    out = rrf_fuse([lex, vec], k=10)
    got = dict(zip(out["doc_id"].to_pylist(), out["rrf_micro"].to_pylist()))
    assert got == {5: c(1), 3: c(2) + c(1), 9: c(3), 7: c(2)}
    # doc 3 appears in both lists → outranks every single-list doc
    assert out["doc_id"][0].as_py() == 3


def test_rrf_tie_breaks_by_id_and_k_cuts():
    a = np.array([10, 20], dtype=np.int64)
    b = np.array([20, 10], dtype=np.int64)
    out = rrf_fuse([a, b], k=1)
    # both score c(1)+c(2); tie → lower id wins, k=1 cuts the other
    assert out["doc_id"].to_pylist() == [10]
    assert out["rrf_micro"].to_pylist() == [c(1) + c(2)]


def test_rrf_empty_and_single_list():
    out = rrf_fuse([], k=5)
    assert out.num_rows == 0
    out = rrf_fuse([np.array([], dtype=np.int64)], k=5)
    assert out.num_rows == 0
    out = rrf_fuse([np.array([4, 2], dtype=np.int64)], k=5)
    assert out["doc_id"].to_pylist() == [4, 2]
    assert out["rrf_micro"].to_pylist() == [c(1), c(2)]


def test_rrf_rank_constant():
    out = rrf_fuse([np.array([1], dtype=np.int64)], k=1, rank_constant=0)
    assert out["rrf_micro"].to_pylist() == [1_000_000]
