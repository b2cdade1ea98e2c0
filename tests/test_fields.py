"""Structured-field indexing (docvalues sidecar), filtered BM25, docstore
retrieval, and T6 wiring (order-insensitive mapping equivalence drives
resume-vs-rebuild).

Reference parity targets: every column of a managed table is queryable by
typed exact/range match (/root/reference/src/search-ingest/schemas.cr:211-222,
spec/schemas_spec.cr:47-89); filters restrict candidates without changing
scoring statistics (ES filter-context semantics)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.index.build import build_index
from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.schemas import TableConfig
from search_ingest_ray.util import read_json, atomic_write_json

TEXTS = [
    ("d0", "alpha beta gamma", "en", 10),
    ("d1", "alpha alpha beta", "de", 20),
    ("d2", "beta gamma delta", "de", 30),
    ("d3", "alpha delta",      "fr", 40),
    ("d4", "alpha beta beta",  "en", 50),
    ("d5", "gamma gamma alpha", "de", 60),
]


@pytest.fixture(scope="module")
def fields_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("fieldsidx")
    t = pa.table({
        "url": [r[0] for r in TEXTS],
        "text": [r[1] for r in TEXTS],
        "lang": [r[2] for r in TEXTS],
        "stars": pa.array([r[3] for r in TEXTS], pa.int64()),
    })
    pq.write_table(t, str(d / "docs.parquet"))
    root = str(d / "idx")
    build_index([str(d / "docs.parquet")], root, analyzer="simple",
                num_term_partitions=2, store_fields=["lang", "stars"])
    return root


def _brute(terms, flt):
    """Brute-force filtered BM25 oracle over TEXTS."""
    from search_ingest_ray.query.bm25 import BM25Params, term_scores
    from search_ingest_ray.util import doc_id_hash
    docs = {doc_id_hash(u): (t.split(), lang, stars)
            for u, t, lang, stars in TEXTS}
    n = len(docs)
    avgdl = sum(len(v[0]) for v in docs.values()) / n
    p = BM25Params(k1=1.2, b=0.75, n_docs=n, avgdl=avgdl)
    out = []
    for did, (toks, lang, stars) in docs.items():
        if not flt(lang, stars):
            continue
        s = 0.0
        for term in terms:
            tf = toks.count(term)
            if tf:
                df = sum(1 for v in docs.values() if term in v[0])
                s += float(term_scores(np.array([tf]), np.array([len(toks)]),
                                       df, p)[0])
        if s > 0:
            out.append((did, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def test_filter_equality(fields_index):
    s = Searcher(fields_index)
    d, sc = s.search_terms(["alpha", "beta"], k=10, filters={"lang": "de"})
    expect = _brute(["alpha", "beta"], lambda l, st: l == "de")
    assert d.tolist() == [x[0] for x in expect]
    assert np.allclose(sc, [x[1] for x in expect])


def test_filter_range_and_in(fields_index):
    s = Searcher(fields_index)
    d, _ = s.search_terms(["alpha"], k=10,
                          filters={"stars": ("range", 20, 50)})
    expect = _brute(["alpha"], lambda l, st: 20 <= st <= 50)
    assert d.tolist() == [x[0] for x in expect]

    d2, _ = s.search_terms(["alpha"], k=10,
                           filters={"lang": ("in", ["en", "fr"])})
    expect2 = _brute(["alpha"], lambda l, st: l in ("en", "fr"))
    assert d2.tolist() == [x[0] for x in expect2]


def test_filter_combined_and_unfiltered_matches(fields_index):
    s = Searcher(fields_index)
    d, _ = s.search_terms(["alpha"], k=10,
                          filters={"lang": "de", "stars": ("range", None, 25)})
    expect = _brute(["alpha"], lambda l, st: l == "de" and st <= 25)
    assert d.tolist() == [x[0] for x in expect]
    # filters=None path unchanged
    d0, _ = s.search_terms(["alpha"], k=10)
    assert d0.tolist() == [x[0] for x in _brute(["alpha"], lambda l, st: True)]


def test_small_k_filtered_pruning_exact(fields_index):
    """k smaller than the match count: θ-seeded pruning must stay exact
    under filtering."""
    s = Searcher(fields_index)
    d, sc = s.search_terms(["alpha", "beta"], k=2, filters={"lang": "de"})
    expect = _brute(["alpha", "beta"], lambda l, st: l == "de")[:2]
    assert d.tolist() == [x[0] for x in expect]


def test_search_docs_returns_fields(fields_index):
    s = Searcher(fields_index)
    t = s.search_docs(["alpha"], k=3, return_fields=["lang", "stars"])
    assert t.column_names == ["doc_id", "rank", "score", "lang", "stars"]
    assert t.num_rows == 3
    from search_ingest_ray.util import doc_id_hash
    by_id = {doc_id_hash(u): (lang, stars) for u, _, lang, stars in TEXTS}
    for r in t.to_pylist():
        assert (r["lang"], r["stars"]) == by_id[r["doc_id"]]


def test_phrase_with_filter(ray_session, tmp_path):
    t = pa.table({
        "url": ["a", "b"],
        "text": ["x y z", "x y w"],
        "lang": ["en", "de"],
    })
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=1, with_positions=True,
                store_fields=["lang"])
    s = Searcher(root)
    from search_ingest_ray.util import doc_id_hash
    d, _ = s.match_phrase("x y", k=10, filters={"lang": "de"})
    assert set(d.tolist()) == {doc_id_hash("b")}


def test_t6_equivalent_mapping_resumes(ray_session, tmp_path):
    """An order-permuted-but-equivalent stored mapping must NOT force a
    rebuild (schemas.equivalent_schema drives the consistency check)."""
    t = pa.table({"url": ["a", "b"], "text": ["p q", "q r"],
                  "lang": ["en", "en"]})
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    cfg = TableConfig("docs", id_field="url", field_types={"text": "text"})
    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=1, table_config=cfg,
                store_fields=["lang"])
    seg = os.path.join(root, "epochs", "e0000", "segments", "tpart=00000",
                       "segment.parquet")
    mtime = os.path.getmtime(seg)

    # permute the stored meta into an equivalent form: reorder dict keys
    meta_path = os.path.join(root, "index_meta.json")
    meta = read_json(meta_path)
    props = meta["mapping"]["mappings"]["properties"]
    meta["mapping"]["mappings"]["properties"] = dict(reversed(list(props.items())))
    permuted = {k: meta[k] for k in reversed(list(meta))}
    with open(meta_path, "w") as f:
        json.dump(permuted, f)

    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=1, table_config=cfg,
                store_fields=["lang"], resume=True)
    assert os.path.getmtime(seg) == mtime  # untouched → resumed, no rebuild

    # a REAL change (different analyzer) still forces the rebuild
    build_index([str(tmp_path / "d.parquet")], root, analyzer="standard",
                num_term_partitions=1, table_config=cfg,
                store_fields=["lang"], resume=True)
    assert os.path.getmtime(seg) > mtime


def test_docstore_returns_source_key(ray_session, tmp_path):
    """Storing the id column itself gives ES-style hits carrying the
    document key (docid → url)."""
    t = pa.table({"url": ["https://a", "https://b"],
                  "text": ["alpha beta", "alpha gamma"]})
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=1, store_fields=["url"])
    s = Searcher(root)
    out = s.search_docs(["alpha"], k=2, return_fields=["url"])
    from search_ingest_ray.util import doc_id_hash
    got = {r["doc_id"]: r["url"] for r in out.to_pylist()}
    assert got[doc_id_hash("https://a")] == "https://a"
    assert got[doc_id_hash("https://b")] == "https://b"


def test_duplicate_ids_fieldstore_keeps_one(ray_session, tmp_path):
    t = pa.table({"url": ["a", "a"], "text": ["p q", "p q r"],
                  "lang": ["en", "de"]})
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=1, store_fields=["lang"])
    s = Searcher(root)
    assert s.fields.count_rows() == 1


def test_sharded_fieldstore_loads_only_touched_shards(ray_session, tmp_path):
    """Docid-range sharding: a filtered query must load strictly fewer
    shards than exist, with results identical to an unsharded build."""
    import shutil
    n = 40
    t = pa.table({
        "url": [f"u{i}" for i in range(n)],
        "text": [("alpha beta" if i % 4 == 0 else "gamma delta")
                 for i in range(n)],
        "lang": [("en" if i % 2 == 0 else "de") for i in range(n)],
        "stars": pa.array(list(range(n)), pa.int64()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    root_s = str(tmp_path / "idx_sharded")
    root_u = str(tmp_path / "idx_unsharded")
    build_index([src], root_s, analyzer="simple", num_term_partitions=2,
                store_fields=["lang", "stars"], field_shards=8)
    build_index([src], root_u, analyzer="simple", num_term_partitions=2,
                store_fields=["lang", "stars"], field_shards=1)
    ss, su = Searcher(root_s), Searcher(root_u)
    d_s, sc_s = ss.search_terms(["alpha"], k=5, filters={"lang": "en"})
    d_u, sc_u = su.search_terms(["alpha"], k=5, filters={"lang": "en"})
    assert np.array_equal(d_s, d_u)
    assert np.allclose(sc_s, sc_u, rtol=1e-12)
    fs = ss.fields
    assert fs.nshards == 8
    # candidates = docs matching "alpha" (n/4 docs) — their docids touch
    # some but not all shards on this tiny corpus
    assert 0 < fs.shards_loaded < 8
    # docstore retrieval equality too
    got_s = fs.get(d_s.astype(np.int64), ["lang", "stars"])
    got_u = su.fields.get(d_u.astype(np.int64), ["lang", "stars"])
    assert got_s["lang"].to_pylist() == got_u["lang"].to_pylist()
    assert got_s["stars"].to_pylist() == got_u["stars"].to_pylist()
    # LRU cap bounds residency
    from search_ingest_ray.query.fields import FieldStore
    from search_ingest_ray.index.build import epoch_dir
    capped = FieldStore(epoch_dir(root_s, 0), max_loaded=2)
    capped.mask(d_s.astype(np.int64), {"lang": "en"})
    assert len(capped._loaded) <= 2


def test_text_keyword_subfield_exact_match(ray_session, tmp_path):
    """The mapping's text+keyword multi-field promise (T2, ref
    schemas.cr:313-322): storing the text column itself gives exact-match
    on the VERBATIM value — docs that ANALYZE identically (folded umlaut)
    but differ verbatim must not cross-match."""
    from search_ingest_ray.util import doc_id_hash
    t = pa.table({
        "url": ["a", "b", "c"],
        "text": ["Straße kern", "Strasse kern", "andere sache"],
    })
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="standard",
                num_term_partitions=1, store_fields=["text"])
    s = Searcher(root)
    # analyzed forms collide: a match query for "strasse" hits both docs
    d_match, _ = s.search("strasse", k=10)
    assert set(d_match.tolist()) == {doc_id_hash("a"), doc_id_hash("b")}
    # keyword-subfield exact match separates them
    assert s.filter_docs({"text": "Straße kern"}).tolist() == \
        [doc_id_hash("a")]
    assert s.filter_docs({"text": "Strasse kern"}).tolist() == \
        [doc_id_hash("b")]
    assert s.filter_docs({"text": "strasse kern"}).size == 0  # verbatim only
    # and composes with BM25 filters (filter-context on the subfield)
    d, _ = s.search_terms(["kern"], k=10, filters={"text": "Straße kern"})
    assert d.tolist() == [doc_id_hash("a")]


def test_ip_cidr_filter(ray_session, tmp_path):
    """Typed `ip` semantics (ref schemas.cr:211-222 maps ip → ES ip type):
    CIDR block membership as a filter spec."""
    from search_ingest_ray.util import doc_id_hash
    t = pa.table({
        "url": ["a", "b", "c", "d"],
        "text": ["host alpha", "host beta", "host gamma", "host delta"],
        "ip": ["10.1.2.3", "10.1.9.9", "10.2.0.1", "not-an-ip"],
    })
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=1, store_fields=["ip"])
    s = Searcher(root)
    d, _ = s.search_terms(["host"], k=10,
                          filters={"ip": ("cidr", "10.1.0.0/16")})
    assert set(d.tolist()) == {doc_id_hash("a"), doc_id_hash("b")}
    d2 = s.filter_docs({"ip": ("cidr", "10.0.0.0/8")})
    assert set(d2.tolist()) == {doc_id_hash("a"), doc_id_hash("b"),
                                doc_id_hash("c")}  # bad ip never matches


def test_prefix_completion(ray_session, tmp_path):
    """Completion analog: prefix suggest over the term dictionary, ranked
    by global df."""
    t = pa.table({
        "url": ["a", "b", "c"],
        "text": ["merge merger merged", "merge scan", "scan scanner"],
    })
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=2)
    s = Searcher(root)
    got = s.suggest("merge", k=10)
    assert got[0] == ("merge", 2)            # df 2 beats the df-1 variants
    assert {t for t, _ in got} == {"merge", "merged", "merger"}
    assert s.suggest("sc", k=1) == [("scan", 2)]
    assert s.suggest("zz") == []


def test_meta_change_rebuild_keeps_shard_meta(ray_session, tmp_path):
    """Regression: a mapping change rmtree's the epoch dir — fields/meta.json
    must be (re)written AFTER that, or the rebuilt sidecar silently loses
    shard pruning and incremental reuse."""
    t = pa.table({"url": ["a", "b"], "text": ["x y", "y z"],
                  "lang": ["en", "de"]})
    pq.write_table(t, str(tmp_path / "d.parquet"))
    root = str(tmp_path / "idx")
    build_index([str(tmp_path / "d.parquet")], root, analyzer="simple",
                num_term_partitions=1, store_fields=["lang"], field_shards=4)
    # analyzer change → meta mismatch → epoch dir dropped and rebuilt
    build_index([str(tmp_path / "d.parquet")], root, analyzer="standard",
                num_term_partitions=1, store_fields=["lang"], field_shards=4)
    meta = os.path.join(root, "epochs", "e0000", "fields", "meta.json")
    assert os.path.isfile(meta)
    assert read_json(meta)["field_shards"] == 4
    s = Searcher(root)
    assert s.fields.nshards == 4   # sharded mode, not legacy load-all
    d, _ = s.search_terms(["y"], k=5, filters={"lang": "de"})
    from search_ingest_ray.util import doc_id_hash
    assert d.tolist() == [doc_id_hash("b")]


def test_geo_filters(ray_session, tmp_path):
    """geo_point semantics: geo_distance (haversine) + geo_bounding_box
    over the (geo_lat, geo_lon) docvalue pair, both via filtered search
    and full-scan filter_docs; null coordinates never match."""
    import numpy as np
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["near point", "far point", "inside box", "null point"],
        "geo_lat": pa.array([37.8, -33.9, 48.85, None], pa.float64()),
        "geo_lon": pa.array([-122.3, 151.2, 2.35, None], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "g.parquet"))
    root = str(tmp_path / "gidx")
    build_index([str(tmp_path / "g.parquet")], root, id_col="doc_id",
                id_is_int=True, analyzer="simple", num_term_partitions=1,
                store_fields=["geo_lat", "geo_lon"])
    s = Searcher(root)
    # ~13 km from (37.7749, -122.4194): doc 1 only; Sydney/Paris far away
    near = s.filter_docs(
        {"geo": ("geo_distance", 37.7749, -122.4194, 20_000.0)})
    assert near.tolist() == [1]
    # Paris bbox
    box = s.filter_docs({"geo": ("geo_bbox", 49.0, 2.0, 48.0, 3.0)})
    assert box.tolist() == [3]
    # candidate-path mask (scored search with geo filter)
    d, _ = s.search_terms(["point"], k=10,
                          filters={"geo": ("geo_bbox", 90.0, -180.0,
                                           -90.0, 180.0)})
    assert sorted(d.tolist()) == [1, 2]   # doc 4 matches but has null coords
    # haversine sanity: SF→Sydney ≈ 11,940 km
    from search_ingest_ray.query.fields import FieldStore
    m = FieldStore._geo_mask(np.array([-33.9]), np.array([151.2]),
                             ("geo_distance", 37.7749, -122.4194,
                              12_000_000.0))
    assert m.tolist() == [True]
    m2 = FieldStore._geo_mask(np.array([-33.9]), np.array([151.2]),
                              ("geo_distance", 37.7749, -122.4194,
                               11_800_000.0))
    assert m2.tolist() == [False]


def test_geo_sql_mirrors_match():
    """__ray_entry__'s oracle constants must equal the engine's."""
    import __ray_entry__ as e
    from search_ingest_ray.pipelines.flagship import (GEO_LAT_SQL,
                                                      GEO_LON_SQL)
    assert e._GEO_LAT == GEO_LAT_SQL
    assert e._GEO_LON == GEO_LON_SQL


def test_geo_polygon_nonconvex():
    """geo_polygon even-odd ray casting: a U-shaped (non-convex) ring must
    EXCLUDE points in the notch that its convex hull contains, include
    points in both prongs, treat nulls as non-matching, and handle
    horizontal edges without spurious crossings."""
    import numpy as np

    from search_ingest_ray.query.fields import FieldStore
    # U shape: prongs at lon [0,2] and [8,10], notch lon (2,8) above lat 2
    ring = [(10.0, 0.0), (10.0, 2.0), (2.0, 2.0), (2.0, 8.0), (10.0, 8.0),
            (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]
    lat = np.array([5.0, 5.0, 5.0, 1.0, 11.0, np.nan])
    lon = np.array([1.0, 5.0, 9.0, 5.0, 5.0, 5.0])
    m = FieldStore._geo_mask(lat, lon, ("geo_polygon", ring))
    #                 left prong, NOTCH, right prong, base, outside, null
    assert m.tolist() == [True, False, True, True, False, False]
    # same points through the generic filter-spec path
    cols = {"geo_lat": lat, "geo_lon": lon}
    fs = FieldStore.__new__(FieldStore)
    m2 = fs._eval_filter(cols, "geo", ("geo_polygon", ring))
    assert m2.tolist() == m.tolist()


def test_geo_shape_envelope_relations():
    """geo_shape envelope semantics: all four ES relations against a probe
    rect, null envelopes never match (not even disjoint)."""
    import numpy as np

    from search_ingest_ray.query.fields import FieldStore
    # probe rect: top=10, left=0, bottom=0, right=10
    rect = (10.0, 0.0, 0.0, 10.0)
    #          within, contains, overlap, disjoint, touch-edge, null
    a = np.array([2.0, -5.0, 5.0, 20.0, 10.0, np.nan])   # lat_min
    b = np.array([8.0, 15.0, 15.0, 25.0, 12.0, 5.0])     # lat_max
    c = np.array([2.0, -5.0, 5.0, 20.0, 5.0, 5.0])       # lon_min
    d = np.array([8.0, 15.0, 15.0, 25.0, 8.0, 5.0])      # lon_max
    cols = {"s_lat_min": a, "s_lat_max": b, "s_lon_min": c, "s_lon_max": d}
    fs = FieldStore.__new__(FieldStore)

    def rel(name):
        return fs._eval_filter(cols, "s", (f"geo_shape_{name}", *rect)) \
            .tolist()

    assert rel("intersects") == [True, True, True, False, True, False]
    assert rel("within") == [True, False, False, False, False, False]
    assert rel("contains") == [False, True, False, False, False, False]
    assert rel("disjoint") == [False, False, False, True, False, False]
