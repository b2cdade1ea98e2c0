"""End-to-end index build + BM25 query vs the brute-force oracle —
rank- and score-identity (the north-rule correctness gate), plus
resumability and hot-term salting."""

import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.corpus import query_set
from search_ingest_ray.index.build import build_index, reindex
from search_ingest_ray.query.bm25 import oracle_topk
from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.util import hash_ids


@pytest.fixture(scope="module")
def built(ray_session, corpus_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index"))
    manifest = build_index(corpus_dir, root, html_col="html",
                           chunk_files=2, num_term_partitions=4,
                           hot_df_threshold=150, hot_salt=2)
    return root, manifest, corpus_dir


def _load_corpus(corpus_dir):
    import pyarrow.parquet as pq
    tables = [pq.read_table(os.path.join(corpus_dir, f))
              for f in sorted(os.listdir(corpus_dir)) if f.endswith(".parquet")]
    import pyarrow as pa
    t = pa.concat_tables(tables)
    return t["text"].to_pylist(), hash_ids(t["url"].to_pylist())


def test_manifest_and_stats(built):
    root, manifest, corpus_dir = built
    assert manifest["status"] == "done"
    assert sum(c["rows"] for c in manifest["chunks"].values()) == 400
    st = manifest["stats"]
    assert st["n_docs"] == 400
    assert st["avgdl"] > 0
    assert len(manifest["segments"]) >= 1
    # hot terms exist at this threshold (base vocab in most docs)
    assert len(st["hot_terms"]) > 0


def test_rank_and_score_identity_vs_oracle(built):
    root, manifest, corpus_dir = built
    texts, ids = _load_corpus(corpus_dir)
    s = Searcher(root)
    checked = 0
    for terms in query_set(seed=42, n=24):
        d_eng, sc_eng = s.search_terms(terms, k=10)
        d_or, sc_or = oracle_topk(texts, ids, terms, k=10)
        assert np.array_equal(d_eng, d_or), f"docids differ for {terms}"
        assert np.allclose(sc_eng, sc_or, rtol=1e-9, atol=1e-12), \
            f"scores differ for {terms}"
        checked += 1 if len(d_eng) else 0
    assert checked >= 10  # most queries must actually match docs


def test_free_text_search_analyzed(built):
    root, _, corpus_dir = built
    s = Searcher(root)
    # non-ASCII query term matches via preserve_original; folded query term
    # matches folded form of the same docs
    d1, _ = s.search("straße", k=5)
    d2, _ = s.search("strasse", k=5)
    assert len(d1) > 0 and len(d2) > 0


def test_hot_term_salted_lists_agree_with_oracle(built):
    root, manifest, corpus_dir = built
    hot = list(manifest["stats"]["hot_terms"])
    assert hot
    texts, ids = _load_corpus(corpus_dir)
    s = Searcher(root)
    term = hot[0]
    d_eng, sc_eng = s.search_terms([term], k=20)
    d_or, sc_or = oracle_topk(texts, ids, [term], k=20)
    assert np.array_equal(d_eng, d_or)
    assert np.allclose(sc_eng, sc_or, rtol=1e-9)


def test_hot_candidate_cap_bounds_driver_set(ray_session, corpus_dir,
                                             tmp_path):
    """A pathological threshold floods the candidate pass; the cap must
    trim the set DISTRIBUTED (≤ cap terms ever reach the driver) without
    changing any query result — trimmed terms just lose salting."""
    root = str(tmp_path / "idx_capped")
    m = build_index(corpus_dir, root, html_col="html", chunk_files=2,
                    num_term_partitions=4, hot_df_threshold=2, hot_salt=2,
                    hot_candidate_cap=3)
    # bounded: only the top-3 candidates by partial count survived, so at
    # most 3 terms can be salted/hot
    assert len(m["stats"]["hot_terms"]) <= 3
    texts, ids = _load_corpus(corpus_dir)
    s = Searcher(root)
    for terms in query_set(seed=5, n=8):
        d_eng, sc_eng = s.search_terms(terms, k=10)
        d_or, sc_or = oracle_topk(texts, ids, terms, k=10)
        assert np.array_equal(d_eng, d_or)
        assert np.allclose(sc_eng, sc_or, rtol=1e-9, atol=1e-12)


def test_resume_skips_done_chunks(built, tmp_path):
    root, manifest, corpus_dir = built
    # simulate crash: wipe segments + stage-2 manifest state, keep chunks
    ed = os.path.join(root, "epochs", "e0000")
    mpath = os.path.join(ed, "manifest.json")
    m = json.load(open(mpath))
    m["segments"] = {}
    m["status"] = "building"
    json.dump(m, open(mpath, "w"))
    shutil.rmtree(os.path.join(ed, "segments"))
    m2 = build_index(corpus_dir, root, html_col="html",
                     chunk_files=2, num_term_partitions=4,
                     hot_df_threshold=150, hot_salt=2)
    # chunk records unchanged (not re-tokenized), wall_s values identical
    assert m2["chunks"] == manifest["chunks"]
    assert m2["status"] == "done"
    # and the index still answers correctly
    texts, ids = _load_corpus(corpus_dir)
    s = Searcher(root)
    terms = query_set(seed=1, n=1)[0]
    d_eng, _ = s.search_terms(terms, k=5)
    d_or, _ = oracle_topk(texts, ids, terms, k=5)
    assert np.array_equal(d_eng, d_or)


def test_meta_change_forces_rebuild(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "idx")
    build_index(corpus_dir, root, html_col="html", chunk_files=4,
                num_term_partitions=2)
    # different analyzer → meta mismatch → epoch dropped and rebuilt
    m = build_index(corpus_dir, root, html_col="html", chunk_files=4,
                    num_term_partitions=2, analyzer="simple")
    assert m["stats"]["analyzer"] == "simple"
    meta = json.load(open(os.path.join(root, "index_meta.json")))
    assert meta["analyzer"] == "simple"


def test_reindex_empties_epoch_keeps_meta(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "idx2")
    build_index(corpus_dir, root, html_col="html", chunk_files=4,
                num_term_partitions=2)
    reindex(root)
    assert os.path.exists(os.path.join(root, "index_meta.json"))
    assert not os.path.exists(os.path.join(root, "epochs", "e0000"))


def test_hot_df_sidecar_resume_identity(built, tmp_path):
    """The salted-set df sidecar (hot_df.json): written by the build,
    values = exact global df counted during the spill pass, and a resumed
    build (one segment invalidated) reuses the recorded set instead of
    re-sampling — hot_terms and the rebuilt segment stay identical."""
    root, manifest, corpus_dir = built
    from search_ingest_ray.index.build import epoch_dir
    ed = epoch_dir(root, 0)
    sidecar = json.load(open(os.path.join(ed, "hot_df.json")))
    assert sidecar["hot_terms"] == manifest["stats"]["hot_terms"]
    assert sidecar["hot_terms"], "fixture must salt something"

    # exact-df invariant: every salted term's recorded df == true df
    texts, _ = _load_corpus(corpus_dir)
    from search_ingest_ray.analyzer import get_analyzer
    an = get_analyzer(manifest["stats"]["analyzer"])
    true_df: dict = {}
    for tx in texts:
        for t in set(an(tx)):
            true_df[t] = true_df.get(t, 0) + 1
    for t, c in sidecar["hot_terms"].items():
        assert true_df[t] == c, t

    # invalidate one completed segment, resume, compare logically: the
    # salt layout and per-term metadata must be identical (postings.bin
    # BYTE order may differ — it follows spill concatenation order)
    m2 = json.load(open(os.path.join(ed, "manifest.json")))
    tp = sorted(m2["segments"])[0]
    seg_dir = os.path.join(ed, "segments", f"tpart={int(tp):05d}")
    meta_cols = ["term", "salt", "df", "n", "max_score"]
    before = pq.read_table(os.path.join(seg_dir, "segment.parquet"),
                           columns=meta_cols)
    del m2["segments"][tp]
    with open(os.path.join(ed, "manifest.json"), "w") as f:
        json.dump(m2, f)
    shutil.rmtree(seg_dir)
    m3 = build_index(corpus_dir, root, html_col="html",
                     chunk_files=2, num_term_partitions=4,
                     hot_df_threshold=150, hot_salt=2)
    assert m3["stats"]["hot_terms"] == manifest["stats"]["hot_terms"]
    after = pq.read_table(os.path.join(seg_dir, "segment.parquet"),
                          columns=meta_cols)
    assert after.equals(before)
    # and the resumed index answers queries identically to brute force
    texts2, ids2 = _load_corpus(corpus_dir)
    s = Searcher(root)
    for terms in query_set(seed=11, n=6):
        d, sc = s.search_terms(terms, k=10)
        od, osc = oracle_topk(texts2, ids2, terms, k=10,
                              analyzer=manifest["stats"]["analyzer"])
        assert d.tolist() == od.tolist()
        assert np.allclose(sc, osc, rtol=1e-6)


def test_bucketed_segment_build_identity(ray_session, corpus_dir, tmp_path,
                                         monkeypatch):
    """The cache-blocked segment builder (SI_BUCKET_ROWS term-range
    buckets) must produce the same term dictionary (modulo byte offsets,
    which are layout) and bit-identical query results at any bucket
    size — including the degenerate 1-row-per-bucket and single-bucket
    extremes."""
    import pyarrow.parquet as pq_

    from search_ingest_ray.corpus import query_set as qs

    roots = {}
    for label, rows in (("tiny", "1"), ("one", "1000000000")):
        monkeypatch.setenv("SI_BUCKET_ROWS", rows)
        root = str(tmp_path / f"idx_{label}")
        build_index(corpus_dir, root, html_col="html", chunk_files=2,
                    num_term_partitions=3, hot_df_threshold=150, hot_salt=2)
        roots[label] = root
    monkeypatch.delenv("SI_BUCKET_ROWS")

    # seg tables agree on everything except file offsets (layout)
    layout_cols = {"doc_off", "tf_off", "dl_off", "pos_off",
                   "skip_doc_off", "skip_tf_off", "skip_dl_off"}
    for tp in range(3):
        a = pq_.read_table(os.path.join(
            roots["tiny"], "epochs", "e0000", "segments",
            f"tpart={tp:05d}", "segment.parquet"))
        b = pq_.read_table(os.path.join(
            roots["one"], "epochs", "e0000", "segments",
            f"tpart={tp:05d}", "segment.parquet"))
        keep = [c for c in a.column_names if c not in layout_cols]
        assert a.select(keep).equals(b.select(keep))

    # queries are bit-identical across layouts
    s_a, s_b = Searcher(roots["tiny"]), Searcher(roots["one"])
    for terms in qs():
        da, sa = s_a.search_terms(terms, k=20)
        db, sb = s_b.search_terms(terms, k=20)
        assert list(da) == list(db)
        assert list(sa) == list(sb)


def test_index_stats_counters_match_corpus(built):
    """index_stats must stay exact on a SALTED index: salted sub-lists of
    one hot term (spread across partitions and duplicated within one)
    count once in n_terms, and n_postings counts distinct (term, doc)
    pairs — verified against a from-scratch analyze of the raw corpus."""
    root, manifest, corpus_dir = built
    assert manifest["stats"]["hot_terms"]  # the salted path is exercised
    texts, ids = _load_corpus(corpus_dir)
    s = Searcher(root)
    terms = set()
    pairs = set()
    for text, i in zip(texts, ids):
        toks = set(s.analyze(text))
        terms |= toks
        pairs.update((tok, i) for tok in toks)
    st = s.index_stats()
    assert st["n_docs"][0].as_py() == len(texts)
    assert st["n_terms"][0].as_py() == len(terms)
    assert st["n_postings"][0].as_py() == len(pairs)
