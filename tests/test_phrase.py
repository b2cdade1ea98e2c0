"""Positional index + phrase queries (roadmap item landed in round 1).

Oracle: regex over the raw text (the documents are space-separated simple
tokens, so word adjacency == substring ' a b ')."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.index.build import build_index
from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.util import doc_id_hash

TEXTS = [
    "alpha beta gamma delta",
    "beta alpha beta gamma",
    "gamma beta alpha",
    "alpha beta alpha beta gamma",
    "delta epsilon alpha",
    "beta gamma alpha beta",
]


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("posidx")
    t = pa.table({
        "url": [f"d{i}" for i in range(len(TEXTS))],
        "text": TEXTS,
    })
    pq.write_table(t, str(d / "docs.parquet"))
    root = str(d / "idx")
    build_index([str(d / "docs.parquet")], root, analyzer="simple",
                num_term_partitions=2, with_positions=True)
    return root


def _oracle_phrase(phrase: str) -> set:
    words = phrase.split()
    out = set()
    for i, txt in enumerate(TEXTS):
        toks = txt.split()
        for j in range(len(toks) - len(words) + 1):
            if toks[j:j + len(words)] == words:
                out.add(doc_id_hash(f"d{i}"))
                break
    return out


@pytest.mark.parametrize("phrase", [
    "alpha beta", "beta gamma", "alpha beta gamma", "gamma delta",
    "beta alpha beta", "delta epsilon alpha", "epsilon beta",
])
def test_phrase_matches_oracle(pos_index, phrase):
    s = Searcher(pos_index)
    d, sc = s.match_phrase(phrase, k=10)
    assert set(d.tolist()) == _oracle_phrase(phrase), phrase
    # deterministic ordering
    assert np.all(np.diff(sc) <= 1e-12)


def test_phrase_single_term(pos_index):
    s = Searcher(pos_index)
    d, _ = s.match_phrase("alpha", k=10)
    assert set(d.tolist()) == _oracle_phrase("alpha")


def test_term_queries_still_exact_with_positions(pos_index):
    # positions must not disturb the term-query path
    s = Searcher(pos_index)
    d, sc = s.search_terms(["alpha"], k=10)
    assert set(d.tolist()) == _oracle_phrase("alpha")
    assert len(sc) == len(d)


def _oracle_slop(phrase: str, slop: int) -> set:
    """Brute force: exists strictly increasing positions, one per term in
    order, with total gap ≤ slop."""
    import itertools
    words = phrase.split()
    out = set()
    for i, txt in enumerate(TEXTS):
        toks = txt.split()
        pos = [[j for j, w in enumerate(toks) if w == t] for t in words]
        if any(not p for p in pos):
            continue
        for combo in itertools.product(*pos):
            if all(combo[a + 1] > combo[a] for a in range(len(combo) - 1)) \
                    and sum(combo[a + 1] - combo[a] - 1
                            for a in range(len(combo) - 1)) <= slop:
                out.add(doc_id_hash(f"d{i}"))
                break
    return out


@pytest.mark.parametrize("phrase,slop", [
    ("alpha gamma", 1), ("alpha gamma", 0), ("beta delta", 2),
    ("alpha beta gamma", 1), ("delta alpha", 1), ("beta alpha gamma", 3),
    ("alpha alpha", 2),
])
def test_sloppy_phrase_matches_oracle(pos_index, phrase, slop):
    s = Searcher(pos_index)
    d, _ = s.match_phrase(phrase, k=10, slop=slop)
    assert set(d.tolist()) == _oracle_slop(phrase, slop), (phrase, slop)


def test_slop_zero_equals_exact(pos_index):
    s = Searcher(pos_index)
    for phrase in ("alpha beta", "beta gamma", "alpha beta gamma"):
        d0, _ = s.match_phrase(phrase, k=10)
        d1, _ = s.match_phrase(phrase, k=10, slop=0)
        assert d0.tolist() == d1.tolist()


def test_phrase_exact_under_preserve_original(ray_session, tmp_path):
    """standard analyzer stacks preserved originals at posInc=0: the folded
    query term must still be ADJACENT to the following source token
    ('strasse merge' matches 'straße merge')."""
    t = pa.table({"url": ["a", "b"],
                  "text": ["die straße merge ist", "merge straße x"]})
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="standard",
                num_term_partitions=2, with_positions=True)
    s = Searcher(root)
    d, _ = s.match_phrase(["strasse", "merge"], k=10)
    assert set(d.tolist()) == {doc_id_hash("a")}
    # the preserved original form matches at the same position too
    d2, _ = s.match_phrase(["straße", "merge"], k=10)
    assert set(d2.tolist()) == {doc_id_hash("a")}
    d3, _ = s.match_phrase(["merge", "strasse"], k=10)
    assert set(d3.tolist()) == {doc_id_hash("b")}


def test_phrase_requires_positions(ray_session, tmp_path):
    t = pa.table({"url": ["x"], "text": ["a b c"]})
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=2)  # no positions
    with pytest.raises(ValueError, match="without positions"):
        Searcher(root).match_phrase("a b")
