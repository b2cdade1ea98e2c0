"""Systematic null-robustness sweep over every docvalue-consuming query.

The round-3 and round-4 advisors each found a query whose docvalue fetch
mishandled missing values (terms_set/distance_feature misalignment,
composite null keys).  Instead of fixing those one at a time, this sweep
builds one index whose stored fields exercise ALL the missing-value
shapes at once —

- ``stars``: int64, nulls on some matched docs (the float64+NaN shard
  round-trip path),
- ``lang``:  string, nulls on some matched docs (object-dtype sort path),
- ``ghost``: int64, null on EVERY doc (the n=0 aggregate edge),
- ``ts``:    timestamp[us], partial nulls (the cast chain),

— and calls every field-parameterized Searcher method against each
type-appropriate field, asserting it returns rather than raising and
that all-null fields behave as an empty match (ES skips docs without
the field).  Any future docvalue consumer added to Searcher should be
appended to the sweep lists below.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.index.build import build_index
from search_ingest_ray.query.searcher import Searcher

ROWS = [
    # url, text, stars, lang, ts(us since epoch)
    ("n0", "alpha beta gamma",  5,    "en", 1_700_000_000_000_000),
    ("n1", "alpha alpha beta",  None, None, None),
    ("n2", "beta gamma delta",  7,    "de", 1_700_003_600_000_000),
    ("n3", "alpha delta",       None, "en", None),
    ("n4", "alpha beta beta",   1,    None, 1_700_007_200_000_000),
    ("n5", "gamma gamma alpha", None, "fr", 1_700_000_000_000_000),
]
TERMS = ["alpha", "beta"]  # matches every doc but n2... (n2 has beta) → all


@pytest.fixture(scope="module")
def sweep_searcher(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("nullsweep")
    t = pa.table({
        "url": [r[0] for r in ROWS],
        "text": [r[1] for r in ROWS],
        "stars": pa.array([r[2] for r in ROWS], pa.int64()),
        "lang": pa.array([r[3] for r in ROWS], pa.string()),
        "ghost": pa.array([None] * len(ROWS), pa.int64()),
        "ts": pa.array([r[4] for r in ROWS], pa.timestamp("us")),
    })
    pq.write_table(t, str(d / "docs.parquet"))
    root = str(d / "idx")
    build_index([str(d / "docs.parquet")], root, analyzer="simple",
                num_term_partitions=2,
                store_fields=["stars", "lang", "ghost", "ts"])
    return Searcher(root)


INT_FIELDS = ["stars", "ghost"]
STR_FIELDS = ["lang"]


def _int_field_calls(s, field):
    return [
        lambda: s.search_sort_by(TERMS, field),
        lambda: s.agg_stats(TERMS, field),
        lambda: s.agg_histogram(TERMS, field, 2),
        lambda: s.agg_cardinality(TERMS, field),
        lambda: s.agg_extended_stats(TERMS, field),
        lambda: s.agg_composite(TERMS, [field], size=3),
        lambda: s.function_score_linear(TERMS, field, origin=3, scale=4),
        lambda: s.rank_feature_saturation(TERMS, field, pivot=3),
        lambda: s.agg_cumulative_histogram(TERMS, field, 2),
        lambda: s.agg_multi_terms(TERMS, [field]),
        lambda: s.agg_range(TERMS, field, [2, 5]),
        lambda: s.agg_percentiles(TERMS, field, [50, 99]),
        lambda: s.terms_set(TERMS, field),
        lambda: s.distance_feature(TERMS, field, origin=3, pivot=2),
        lambda: s.agg_percentile_ranks(TERMS, field, [3]),
        lambda: s.facet_stats(TERMS, "lang", field),
        lambda: s.facet_stats(TERMS, field, "stars"),
        # round-5 consumers
        lambda: s.agg_weighted_avg(TERMS, field, "stars"),
        lambda: s.agg_weighted_avg(TERMS, "stars", field),
        lambda: s.function_score_gauss(TERMS, field, origin=3, scale=4),
        lambda: s.agg_date_range(TERMS, field, [2, 5]),
        lambda: s.agg_cumulative_cardinality(TERMS, "ts", field,
                                             3_600_000_000),
    ]


def _str_field_calls(s, field):
    return [
        lambda: s.facet_counts(TERMS, field),
        lambda: s.agg_top_hits(TERMS, field),
        lambda: s.collapse_top(TERMS, field),
        lambda: s.agg_composite(TERMS, [field], size=3),
        lambda: s.agg_multi_terms(TERMS, [field]),
        lambda: s.facet_stats(TERMS, field, "stars"),
    ]


def _ts_field_calls(s):
    H = 3_600_000_000
    return [
        lambda: s.agg_date_histogram(TERMS, "ts", H),
        lambda: s.agg_moving_selected(TERMS, "ts", H, window=2, min_n=1),
        lambda: s.search_sort_by(TERMS, "ts"),
        # round-5 pipeline-agg consumers (partial-null ts)
        lambda: s.agg_auto_date_histogram(TERMS, "ts", 10),
        lambda: s.agg_stats_bucket(TERMS, "ts", H),
        lambda: s.agg_normalize(TERMS, "ts", H),
        lambda: s.agg_bucket_script(TERMS, TERMS, "ts", H),
        lambda: s.agg_percentiles_bucket(TERMS, "ts", H, [50, 99]),
        lambda: s.agg_bucket_sort(TERMS, "ts", H, size=3),
        lambda: s.agg_moving_percentile(TERMS, "ts", H, window=2),
        lambda: s.agg_date_range(TERMS, "ts", [1_700_003_600_000_000]),
        lambda: s.agg_cumulative_cardinality(TERMS, "ts", "stars", H),
    ]


def test_every_docvalue_query_survives_partial_and_full_nulls(
        sweep_searcher):
    s = sweep_searcher
    calls = []
    for f in INT_FIELDS:
        calls += [(f, c) for c in _int_field_calls(s, f)]
    for f in STR_FIELDS:
        calls += [(f, c) for c in _str_field_calls(s, f)]
    calls += [("ts", c) for c in _ts_field_calls(s)]
    failures = []
    for field, call in calls:
        try:
            out = call()
        except Exception as e:  # noqa: BLE001 — collect, report all
            failures.append((field, call, repr(e)))
            continue
        assert out is not None
    assert not failures, "\n".join(
        f"field={f}: {err}" for f, _, err in failures)


def test_all_null_field_aggregates_as_empty(sweep_searcher):
    s = sweep_searcher
    st = s.agg_stats(TERMS, "ghost")
    assert st["n"][0].as_py() == 0
    assert st["sum"][0].as_py() == 0
    assert st["min"][0].as_py() is None
    hist = s.agg_histogram(TERMS, "ghost", 2)
    assert hist.num_rows == 0
    card = s.agg_cardinality(TERMS, "ghost")
    assert card["cardinality"][0].as_py() == 0
    ts = s.terms_set(TERMS, "ghost")
    assert ts.num_rows == 0  # every doc misses the msm field → none match
    df = s.distance_feature(TERMS, "ghost", origin=1, pivot=1)
    assert df.num_rows == 0
    pct = s.agg_percentiles(TERMS, "ghost", [50])
    assert pct["value"][0].as_py() is None or pct.num_rows >= 1


def test_agg_range_excludes_missing_values(sweep_searcher):
    # stars = {5, 7, 1, null×3}; a raw NaN→int64 cast would send the 3
    # nulls to INT64_MIN and count them in the open low bucket
    out = sweep_searcher.agg_range(TERMS, "stars", [2, 5])
    assert out["n"].to_pylist() == [1, 0, 2]


def test_facet_stats_skips_nan_and_null_keys_and_values(sweep_searcher):
    s = sweep_searcher
    # group=lang ('en':n0,n3  'de':n2  'fr':n5  null:n1,n4): null bucket
    # dropped; n counts docs WITH the stat field (n3 misses stars)
    out = s.facet_stats(TERMS, "lang", "stars")
    rows = {r["lang"]: r for r in out.to_pylist()}
    assert set(rows) == {"en", "de", "fr"}
    assert rows["en"]["n"] == 1 and rows["en"]["sum"] == 5
    assert rows["de"]["n"] == 1 and rows["de"]["sum"] == 7
    assert rows["fr"]["n"] == 0 and rows["fr"]["sum"] == 0
    assert rows["fr"]["min"] is None and rows["fr"]["avg_micro"] is None
    # int group keys come back typed int64, null keys dropped
    out2 = s.facet_stats(TERMS, "stars", "stars")
    assert out2[ "stars"].type == pa.int64()
    assert out2.num_rows == 3  # values 1, 5, 7 — no NaN bucket


def test_multi_terms_drops_missing_key_docs(sweep_searcher):
    out = sweep_searcher.agg_multi_terms(TERMS, ["stars"])
    keys = out["stars"].to_pylist()
    assert None not in keys and out["stars"].type == pa.int64()
    assert sorted(keys) == [1, 5, 7]


def test_serve_returns_json_null_for_missing_docvalue(sweep_searcher):
    # json.dumps(float('nan')) emits bare NaN — invalid JSON a strict
    # client rejects; a hit decorated with a missing int field must come
    # back as JSON null instead
    import json
    from search_ingest_ray.serve import ServeSession
    sess = ServeSession(sweep_searcher.index_root)
    resp = sess.handle({"op": "query", "id": 1, "query": "alpha beta",
                        "k": 10, "fields": ["stars"]})
    assert resp["ok"], resp
    wire = json.dumps(resp)  # must not raise / emit NaN
    back = json.loads(wire)
    stars = [h["stars"] for h in back["hits"]]
    assert None in stars and all(
        v is None or isinstance(v, int) for v in stars)


def test_partial_null_sort_places_every_matched_doc(sweep_searcher):
    # sort-by-field must not LOSE docs whose field is null (ES sorts
    # missing last by default); we assert the full match set is returned
    s = sweep_searcher
    out = s.search_sort_by(TERMS, "stars", k=100)
    assert out.num_rows == 6  # every doc matches alpha|beta
    vals = out["stars"].to_pylist()
    assert sum(v is None for v in vals) == 3
    # missing sorts LAST regardless of direction (ES ``missing: _last``)
    assert vals[:3] == [7, 5, 1] and vals[3:] == [None, None, None]
    asc = s.search_sort_by(TERMS, "stars", k=100, descending=False)
    avals = asc["stars"].to_pylist()
    assert avals[:3] == [1, 5, 7] and avals[3:] == [None, None, None]
