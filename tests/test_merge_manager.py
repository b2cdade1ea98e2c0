"""Segment merge (E7) + multi-table orchestration (G6) tests.

Merge invariant: an index merged from two disjoint halves is rank- AND
score-identical to an index built over the whole corpus in one shot."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.corpus import generate_pages, query_set
from search_ingest_ray.index.build import build_index
from search_ingest_ray.index.merge import merge_indexes
from search_ingest_ray.pipelines.manager import ManagedTable, TableManager
from search_ingest_ray.query.searcher import Searcher


def _write(dirpath, table):
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(table, os.path.join(dirpath, "part.parquet"))
    return dirpath


def test_merge_equals_single_shot(ray_session, tmp_path):
    a = generate_pages(150, seed=5, start=0)
    b = generate_pages(150, seed=5, start=150)
    full_dir = str(tmp_path / "full")
    os.makedirs(full_dir)
    pq.write_table(a, os.path.join(full_dir, "a.parquet"))
    pq.write_table(b, os.path.join(full_dir, "b.parquet"))
    kw = dict(html_col="html", chunk_files=4, num_term_partitions=4,
              hot_df_threshold=10**9)  # salting disabled for merge scope
    root_full = str(tmp_path / "ifull")
    build_index(full_dir, root_full, **kw)
    root_a = str(tmp_path / "ia")
    root_b = str(tmp_path / "ib")
    build_index(_write(str(tmp_path / "da"), a), root_a, **kw)
    build_index(_write(str(tmp_path / "db"), b), root_b, **kw)

    root_m = str(tmp_path / "imerged")
    m = merge_indexes([root_a, root_b], root_m, concurrency=2)
    assert m["status"] == "done"

    s_full, s_m = Searcher(root_full), Searcher(root_m)
    assert s_m.stats["n_docs"] == 300
    checked = 0
    for terms in query_set(seed=9, n=12):
        d1, sc1 = s_full.search_terms(terms, k=10)
        d2, sc2 = s_m.search_terms(terms, k=10)
        assert np.array_equal(d1, d2), terms
        assert np.allclose(sc1, sc2, rtol=1e-9), terms
        checked += bool(len(d1))
    assert checked >= 5


def test_merge_salted_inputs_equals_single_shot(ray_session, tmp_path):
    """Hot-term (salted) inputs: the merger's cross-partition gather must
    reassemble each hot term's sub-lists into one score-exact list."""
    a = generate_pages(150, seed=7, start=0)
    b = generate_pages(150, seed=7, start=150)
    # low threshold: common terms go hot and get salted in the sub-indexes
    kw = dict(html_col="html", chunk_files=4, num_term_partitions=4,
              hot_df_threshold=60, hot_salt=2)
    root_a, root_b = str(tmp_path / "sa"), str(tmp_path / "sb")
    build_index(_write(str(tmp_path / "da"), a), root_a, **kw)
    build_index(_write(str(tmp_path / "db"), b), root_b, **kw)
    from search_ingest_ray.util import read_json
    import os as _os
    sa = read_json(_os.path.join(root_a, "epochs/e0000/stats.json"))
    assert sa["hot_terms"], "fixture must actually produce salted terms"

    # reference: single-shot UNSALTED build over the union (the merged
    # output is unsalted by design)
    full_dir = str(tmp_path / "full")
    os.makedirs(full_dir)
    pq.write_table(a, os.path.join(full_dir, "a.parquet"))
    pq.write_table(b, os.path.join(full_dir, "b.parquet"))
    root_full = str(tmp_path / "ifull")
    build_index(full_dir, root_full, html_col="html", chunk_files=4,
                num_term_partitions=4, hot_df_threshold=10**9)

    root_m = str(tmp_path / "im")
    m = merge_indexes([root_a, root_b], root_m, concurrency=2)
    assert m["stats"]["n_postings"] > 0
    # hot terms stay hot in the MERGED index (re-salted output): membership
    # recorded in stats and sub-lists carry salt > 0 somewhere
    assert m["stats"]["hot_terms"], "merged hot set must not be empty"
    import pyarrow.parquet as _pq
    salts_seen = set()
    seg_base = os.path.join(root_m, "epochs", "e0000", "segments")
    for dn in sorted(os.listdir(seg_base)):
        sp = os.path.join(seg_base, dn, "segment.parquet")
        if os.path.exists(sp):
            salts_seen |= set(_pq.read_table(sp, columns=["salt"])["salt"].to_pylist())
    assert any(s > 0 for s in salts_seen), "expected re-salted sub-lists"

    s_full, s_m = Searcher(root_full), Searcher(root_m)
    hot_term = sorted(sa["hot_terms"])[0]
    queries = [[hot_term]] + list(query_set(seed=3, n=10))
    checked = 0
    for terms in queries:
        d1, sc1 = s_full.search_terms(terms, k=10)
        d2, sc2 = s_m.search_terms(terms, k=10)
        assert np.array_equal(d1, d2), terms
        assert np.allclose(sc1, sc2, rtol=1e-9), terms
        checked += bool(len(d1))
    assert checked >= 5


def test_merge_positional_inputs_phrase_works(ray_session, tmp_path):
    import pyarrow as pa
    from search_ingest_ray.util import doc_id_hash
    t1 = pa.table({"url": ["a1", "a2"],
                   "text": ["alpha beta gamma", "gamma beta"]})
    t2 = pa.table({"url": ["b1", "b2"],
                   "text": ["alpha beta delta", "beta alpha"]})
    kw = dict(analyzer="simple", num_term_partitions=2,
              hot_df_threshold=10**9, with_positions=True)
    r1, r2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    build_index(_write(str(tmp_path / "d1"), t1), r1, **kw)
    build_index(_write(str(tmp_path / "d2"), t2), r2, **kw)
    root_m = str(tmp_path / "pm")
    merge_indexes([r1, r2], root_m, concurrency=2)
    s = Searcher(root_m)
    d, _ = s.match_phrase("alpha beta", k=10)
    assert set(d.tolist()) == {doc_id_hash("a1"), doc_id_hash("b1")}
    d2_, _ = s.match_phrase("beta alpha", k=10)
    assert set(d2_.tolist()) == {doc_id_hash("b2")}


def test_merge_rejects_mismatched_config(ray_session, tmp_path):
    a = generate_pages(50, seed=6)
    da = _write(str(tmp_path / "d"), a)
    r1, r2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(da, r1, html_col="html", num_term_partitions=2,
                hot_df_threshold=10**9)
    build_index(da, r2, html_col="html", num_term_partitions=4,
                hot_df_threshold=10**9)
    with pytest.raises(ValueError):
        merge_indexes([r1, r2], str(tmp_path / "out"))


def test_table_manager_backfill_all(ray_session, corpus_dir, tmp_path):
    kw = dict(html_col="html", chunk_files=4, num_term_partitions=2)
    mgr = TableManager(str(tmp_path / "base"), [
        ManagedTable("pages_a", corpus_dir, kw),
        ManagedTable("pages_b", corpus_dir, kw),
    ], max_concurrent=2)
    assert not mgr.consistent_indices()
    results = mgr.backfill_all()
    assert set(results) == {"pages_a", "pages_b"}
    assert mgr.load_success()
    assert mgr.consistent_indices()
    # reindex_all empties (G4/S8 analog)
    mgr.reindex_all()
    assert not mgr.consistent_indices()
