"""Incremental bucketed epochs (VERDICT round-1 item 5): a small-delta epoch
must re-tokenize ONLY the buckets touched by the delta (manifest lineage
shows every other chunk reused via hard links) while producing query results
IDENTICAL to a from-scratch build of the folded state."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.pipelines.epochs import apply_delta_epoch, snapshot_dir
from search_ingest_ray.index.build import build_index
from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.util import doc_id_hash, read_json

N_DOCS = 200
NB = 8


@pytest.fixture(scope="module")
def base_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("incbase")
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(8, 25)))
             for _ in range(N_DOCS)]
    pq.write_table(pa.table({
        "url": [f"u{i}" for i in range(N_DOCS)],
        "text": texts,
    }), str(d / "base.parquet"))
    return str(d)


def test_small_delta_retokenizes_only_touched_buckets(ray_session, base_dir,
                                                      tmp_path):
    root = str(tmp_path / "idx")
    kw = dict(id_col="url", analyzer="simple", num_term_partitions=2,
              num_buckets=NB, hot_df_threshold=10**9)
    apply_delta_epoch(root, None, 0,
                      base_paths=[os.path.join(base_dir, "base.parquet")], **kw)

    # 1% delta: update 2 docs
    delta = pa.table({
        "url": ["u3", "u17"],
        "text": ["freshword alpha", "freshword beta"],
        "epoch": pa.array([1, 1], pa.int64()),
        "action": ["updated", "updated"],
    })
    dd = str(tmp_path / "delta")
    os.makedirs(dd)
    pq.write_table(delta, os.path.join(dd, "d.parquet"))
    m1 = apply_delta_epoch(root, [os.path.join(dd, "d.parquet")], 1, **kw)

    # lineage: only the touched buckets were re-tokenized
    from search_ingest_ray.util import stable_partition_column
    touched = set(stable_partition_column(
        pa.array(["u3", "u17"]), NB).tolist())
    reused = {cid for cid, rec in m1["chunks"].items()
              if rec.get("reused_from_epoch") == 0}
    rebuilt = {cid for cid, rec in m1["chunks"].items()
               if "reused_from_epoch" not in rec}
    assert rebuilt == {f"{b:05d}" for b in touched}
    assert len(reused) == NB - len(touched)
    # reused postings are hard links (same inode) — zero re-tokenize IO
    for cid in sorted(reused):
        pdir = os.path.join(root, "epochs/e0001/postings", f"chunk={cid}")
        if not os.path.isdir(pdir):
            continue
        for f in os.listdir(pdir):
            st = os.stat(os.path.join(pdir, f))
            assert st.st_nlink >= 2

    # results identical to a from-scratch build over the same folded state
    snap_files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(snapshot_dir(root, 1))
        for f in fs if f.endswith(".parquet"))
    fresh = str(tmp_path / "fresh")
    build_index(snap_files, fresh, id_col="url", analyzer="simple",
                num_term_partitions=2, hot_df_threshold=10**9)
    s_inc = Searcher(root, epoch=1)
    s_ref = Searcher(fresh)
    assert s_inc.stats["n_docs"] == s_ref.stats["n_docs"] == N_DOCS
    assert abs(s_inc.stats["avgdl"] - s_ref.stats["avgdl"]) < 1e-12
    for q in (["freshword"], ["tok1", "tok2"], ["tok11"], ["alpha"]):
        d1, sc1 = s_inc.search_terms(q, k=30)
        d2, sc2 = s_ref.search_terms(q, k=30)
        assert d1.tolist() == d2.tolist(), q
        assert np.allclose(sc1, sc2)
    d, _ = s_inc.search_terms(["freshword"], k=5)
    assert set(d.tolist()) == {doc_id_hash("u3"), doc_id_hash("u17")}


def test_delta_chain_with_delete(ray_session, base_dir, tmp_path):
    """Two chained deltas: tombstone in epoch 2 removes the doc; untouched
    buckets keep flowing through via links."""
    root = str(tmp_path / "idx2")
    kw = dict(id_col="url", analyzer="simple", num_term_partitions=2,
              num_buckets=NB, hot_df_threshold=10**9)
    apply_delta_epoch(root, None, 0,
                      base_paths=[os.path.join(base_dir, "base.parquet")], **kw)
    d1 = pa.table({"url": ["u0"], "text": ["zulu only"],
                   "epoch": pa.array([1], pa.int64()), "action": ["updated"]})
    d2 = pa.table({"url": ["u0"], "text": [""],
                   "epoch": pa.array([2], pa.int64()), "action": ["deleted"]})
    for e, t in ((1, d1), (2, d2)):
        dd = str(tmp_path / f"delta{e}")
        os.makedirs(dd)
        pq.write_table(t, os.path.join(dd, "d.parquet"))
        apply_delta_epoch(root, [os.path.join(dd, "d.parquet")], e, **kw)
    s1 = Searcher(root, epoch=1)
    assert set(s1.search_terms(["zulu"], k=5)[0].tolist()) == {doc_id_hash("u0")}
    s2 = Searcher(root, epoch=2)
    assert len(s2.search_terms(["zulu"], k=5)[0]) == 0
    assert s2.stats["n_docs"] == N_DOCS - 1
    # version lineage recorded per bucket
    meta = read_json(os.path.join(root, "snapshot_meta.json"))
    b0 = str(int(__import__("search_ingest_ray.util", fromlist=["x"])
                 .stable_partition_column(pa.array(["u0"]), NB)[0]))
    assert meta["epochs"]["2"][b0] == 2
