"""Lineage correctness under resume (ADVICE round-1 fixes):

1. duplicate (term, salt, docid) rows with positions keep a consistent
   (tf, dl, positions) triple — phrase queries must not crash/misdecode;
2. a resumed build whose input files changed invalidates completed
   segments (no silent stale postings / unsound block-max bounds).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from search_ingest_ray.index.build import build_index
from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.util import doc_id_hash


def test_duplicate_ids_with_positions_fold_consistent(ray_session, tmp_path):
    """Same url ingested twice (duplicate source keys) with different text:
    the fold keeps ONE row whose tf matches its kept position list, so
    phrase decoding (count == sum(tf)) cannot raise, and the winning list
    is internally consistent."""
    t = pa.table({
        # d0 appears twice with different token counts for 'alpha'
        "url": ["d0", "d0", "d1"],
        "text": ["alpha beta alpha gamma",      # tf(alpha)=2
                 "alpha beta",                  # tf(alpha)=1 (loser)
                 "beta alpha beta"],
    })
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "docs.parquet")], root, analyzer="simple",
                num_term_partitions=2, with_positions=True)
    s = Searcher(root)
    # phrase decode must not raise ValueError (positions count == sum(tf))
    d, _ = s.match_phrase("alpha beta", k=10)
    assert doc_id_hash("d0") in set(d.tolist())
    d2, _ = s.match_phrase("alpha gamma", k=10)
    # winner row is the max-tf one ("alpha beta alpha gamma"): its positions
    # contain the alpha-gamma adjacency
    assert doc_id_hash("d0") in set(d2.tolist())


def test_duplicate_triple_run_keeps_single_max_tf(ray_session, tmp_path):
    """A 3-row duplicate run folds to exactly one posting with the max tf."""
    t = pa.table({
        "url": ["x", "x", "x"],
        "text": ["w w w", "w", "w w"],
    })
    pq.write_table(t, str(tmp_path / "docs.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "docs.parquet")], root, analyzer="simple",
                num_term_partitions=1, with_positions=True)
    s = Searcher(root)
    d, sc = s.search_terms(["w"], k=10)
    assert len(d) == 1


def _write_files(d, texts_per_file):
    files = []
    for i, texts in enumerate(texts_per_file):
        p = os.path.join(d, f"f{i}.parquet")
        pq.write_table(pa.table({
            "url": [f"f{i}-d{j}" for j in range(len(texts))],
            "text": texts,
        }), p)
        files.append(p)
    return files


def test_resume_with_changed_inputs_invalidates_segments(ray_session, tmp_path):
    """Adding an input file to a completed build and resuming must rebuild
    the segments (same results as a from-scratch build) — the old manifest's
    done term partitions may not be silently kept."""
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    files = _write_files(data_dir, [
        ["alpha beta gamma", "beta gamma"],
        ["alpha alpha beta", "gamma delta"],
    ])
    root = str(tmp_path / "idx")
    build_index(files, root, analyzer="simple", num_term_partitions=2,
                chunk_files=1)
    # new input file appears (e.g. a late-arriving shard)
    newf = os.path.join(data_dir, "f9.parquet")
    pq.write_table(pa.table({"url": ["new-doc"],
                             "text": ["delta epsilon alpha"]}), newf)
    files2 = files + [newf]
    build_index(files2, root, analyzer="simple", num_term_partitions=2,
                chunk_files=1, resume=True)

    fresh_root = str(tmp_path / "idx_fresh")
    build_index(files2, fresh_root, analyzer="simple", num_term_partitions=2,
                chunk_files=1)

    s_res = Searcher(root)
    s_new = Searcher(fresh_root)
    for q in (["alpha"], ["delta"], ["epsilon"], ["beta", "gamma"]):
        d1, sc1 = s_res.search_terms(q, k=10)
        d2, sc2 = s_new.search_terms(q, k=10)
        assert d1.tolist() == d2.tolist(), q
        assert np.allclose(sc1, sc2)
    # the new doc is findable
    d, _ = s_res.search_terms(["epsilon"], k=10)
    assert doc_id_hash("new-doc") in set(d.tolist())


def test_resume_with_dropped_file_removes_stale_chunk(ray_session, tmp_path):
    """Removing an input file and resuming must drop its postings too."""
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    files = _write_files(data_dir, [
        ["alpha beta", "beta gamma"],
        ["uniquezeta only here"],
    ])
    root = str(tmp_path / "idx")
    build_index(files, root, analyzer="simple", num_term_partitions=2,
                chunk_files=1)
    s = Searcher(root)
    assert len(s.search_terms(["uniquezeta"], k=5)[0]) == 1
    # rebuild with the second file removed
    build_index(files[:1], root, analyzer="simple", num_term_partitions=2,
                chunk_files=1, resume=True)
    s2 = Searcher(root)
    assert len(s2.search_terms(["uniquezeta"], k=5)[0]) == 0
    assert len(s2.search_terms(["alpha"], k=5)[0]) == 1
