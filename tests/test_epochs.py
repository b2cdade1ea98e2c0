"""Incremental epoch tests: upsert/delete reflected in queries, replay
idempotency, resume — the analog of /root/reference/spec/table_spec.cr
(changefeed create→doc appears; delete→doc gone; backfill counts)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.pipelines.epochs import apply_delta_epoch, latest_epoch
from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.util import doc_id_hash


@pytest.fixture(scope="module")
def base_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("epochbase")
    t = pa.table({
        "url": [f"u{i}" for i in range(20)],
        "text": [f"alpha doc{i} common" for i in range(20)],
    })
    pq.write_table(t, str(d / "base.parquet"))
    return str(d)


def _build_e0(root, base_corpus):
    return apply_delta_epoch(root, None, 0,
                             base_paths=[os.path.join(base_corpus, "base.parquet")],
                             id_col="url", analyzer="simple",
                             num_term_partitions=2, chunk_files=4)


def test_epoch_update_and_delete(ray_session, base_corpus, tmp_path):
    root = str(tmp_path / "idx")
    _build_e0(root, base_corpus)
    s0 = Searcher(root, epoch=0)
    d0, _ = s0.search_terms(["alpha"], k=50)
    assert len(d0) == 20

    # epoch 1: update u3 (now contains 'bravo' not 'alpha'), delete u5,
    # create u99
    delta = pa.table({
        "url": ["u3", "u5", "u99"],
        "text": ["bravo doc3 common", "", "alpha doc99 common"],
        "epoch": pa.array([1, 1, 1], pa.int64()),
        "action": ["updated", "deleted", "created"],
    })
    dd = str(tmp_path / "delta1")
    os.makedirs(dd)
    pq.write_table(delta, os.path.join(dd, "d.parquet"))
    apply_delta_epoch(root, [os.path.join(dd, "d.parquet")], 1,
                      id_col="url", analyzer="simple",
                      num_term_partitions=2, chunk_files=4)
    assert latest_epoch(root) == 1

    s1 = Searcher(root, epoch=1)
    d1, _ = s1.search_terms(["alpha"], k=50)
    ids = set(d1.tolist())
    assert doc_id_hash("u3") not in ids      # updated away from 'alpha'
    assert doc_id_hash("u5") not in ids      # deleted
    assert doc_id_hash("u99") in ids         # created
    assert len(d1) == 19                     # 20 - updated - deleted + created
    db, _ = s1.search_terms(["bravo"], k=5)
    assert set(db.tolist()) == {doc_id_hash("u3")}
    # docid stability: unchanged doc keeps its id across epochs
    assert doc_id_hash("u7") in ids and doc_id_hash("u7") in set(d0.tolist())


def test_epoch_replay_idempotent(ray_session, base_corpus, tmp_path):
    root = str(tmp_path / "idx2")
    _build_e0(root, base_corpus)
    delta = pa.table({
        "url": ["u1"], "text": ["charlie common"],
        "epoch": pa.array([1], pa.int64()), "action": ["updated"],
    })
    dd = str(tmp_path / "delta")
    os.makedirs(dd)
    pq.write_table(delta, os.path.join(dd, "d.parquet"))
    m1 = apply_delta_epoch(root, [os.path.join(dd, "d.parquet")], 1,
                           id_col="url", analyzer="simple",
                           num_term_partitions=2, chunk_files=4)
    # replay: snapshot marker + manifest make this a no-op resume
    m2 = apply_delta_epoch(root, [os.path.join(dd, "d.parquet")], 1,
                           id_col="url", analyzer="simple",
                           num_term_partitions=2, chunk_files=4)
    assert m1["chunks"] == m2["chunks"]
    s = Searcher(root, epoch=1)
    d, _ = s.search_terms(["charlie"], k=5)
    assert set(d.tolist()) == {doc_id_hash("u1")}
