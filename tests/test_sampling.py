"""Deterministic sampling / mixture operators vs DuckDB reference."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from search_ingest_ray.functions.sampling import (
    hash_sample, mixture_repeat, stratified_quota)


def _docs(n=400, langs=("en", "de", "fr", "zh")):
    rng = np.random.default_rng(7)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64) * 13 + 5),
        "lang": pa.array([langs[i] for i in rng.integers(0, len(langs), n)]),
        "n_chars": pa.array(rng.integers(1, 9999, n).astype(np.int64)),
    })


def _ds(tbl, blocks=7):
    return rd.from_arrow(tbl).repartition(blocks)


def test_hash_sample_matches_sql_and_is_block_invariant(ray_session):
    tbl = _docs()
    want = duckdb.sql(
        "SELECT doc_id FROM tbl WHERE "
        "md5_number_lower('s1' || CAST(doc_id AS VARCHAR)) % 1000000 < 314159 "
        "ORDER BY doc_id").fetchall()
    want = [r[0] for r in want]
    for blocks in (1, 7):
        got = sorted(r["doc_id"] for r in hash_sample(
            _ds(tbl, blocks), 314159, key_col="doc_id", salt="s1")
            .take_all())
        assert got == want
    assert 0 < len(want) < tbl.num_rows  # non-degenerate rate


def test_hash_sample_extremes(ray_session):
    tbl = _docs(50)
    assert hash_sample(_ds(tbl), 0).count() == 0
    assert hash_sample(_ds(tbl), 1_000_000).count() == 50
    with pytest.raises(ValueError):
        hash_sample(_ds(tbl), 1_000_001)


def test_stratified_quota_matches_qualify_oracle(ray_session):
    tbl = _docs()
    quota = {"en": 30, "de": 10, "zh": 10_000}  # fr absent -> dropped
    out = stratified_quota(_ds(tbl), quota, strata_col="lang",
                           key_col="doc_id", salt="q1",
                           num_partitions=5).take_all()
    got = sorted((r["lang"], r["doc_id"]) for r in out)
    want = duckdb.sql("""
        SELECT lang, doc_id FROM tbl
        WHERE lang IN ('en', 'de', 'zh')
        QUALIFY row_number() OVER (PARTITION BY lang ORDER BY
            md5_number_lower('q1' || CAST(doc_id AS VARCHAR)) % 1000000,
            doc_id) <= CASE lang WHEN 'en' THEN 30 WHEN 'de' THEN 10
                                 ELSE 10000 END
        ORDER BY lang, doc_id""").fetchall()
    assert got == [tuple(r) for r in want]
    # oversized quota keeps the whole stratum
    n_zh = sum(1 for l, _ in got if l == "zh")
    assert n_zh == duckdb.sql(
        "SELECT count(*) FROM tbl WHERE lang='zh'").fetchone()[0]
    # schema passthrough: helper columns stripped
    assert set(out[0].keys()) == {"doc_id", "lang", "n_chars"}


def test_mixture_repeat_matches_unnest_oracle(ray_session):
    tbl = _docs()
    w = {"en": 1_700_000, "de": 2_000_000, "fr": 400_000}  # zh -> 0
    out = mixture_repeat(_ds(tbl), w, strata_col="lang",
                         key_col="doc_id", salt="m1").take_all()
    got = sorted((r["doc_id"], r["copy"]) for r in out)
    want = duckdb.sql("""
        WITH r AS (
          SELECT doc_id,
                 CASE lang WHEN 'en' THEN 1700000 WHEN 'de' THEN 2000000
                           WHEN 'fr' THEN 400000 ELSE 0 END AS w,
                 md5_number_lower('m1' || CAST(doc_id AS VARCHAR)) % 1000000
                   AS gate
          FROM tbl)
        SELECT doc_id, unnest(range(w // 1000000
                                    + CAST(gate < w % 1000000 AS BIGINT)))
          AS copy
        FROM r ORDER BY doc_id, copy""").fetchall()
    assert got == [tuple(r) for r in want]
    # integer weight 2.0 repeats every de row exactly twice
    de_ids = set(tbl.filter(
        pa.compute.equal(tbl["lang"], "de"))["doc_id"].to_pylist())
    de_copies = [c for d, c in got if d in de_ids]
    assert de_copies.count(0) == de_copies.count(1) == len(de_ids)
    assert all(c in (0, 1) for c in de_copies)


def test_mixture_repeat_expected_multiplicity(ray_session):
    # the fractional gate hits ~frac(w) of rows: 0.25 +- tolerance
    tbl = _docs(2000, langs=("en",))
    out = mixture_repeat(_ds(tbl), {"en": 250_000}, strata_col="lang",
                         key_col="doc_id", salt="m2")
    frac = out.count() / 2000
    assert 0.2 < frac < 0.3


def test_grouped_topk_matches_sql(ray_session):
    from search_ingest_ray.functions.sampling import grouped_topk
    tbl = _docs(500)
    out = grouped_topk(_ds(tbl, 6), 7, group_col="lang",
                       order_cols=["n_chars"], key_col="doc_id",
                       num_partitions=3).take_all()
    got = sorted((r["lang"], r["doc_id"]) for r in out)
    want = duckdb.sql("""
        SELECT lang, doc_id FROM tbl
        QUALIFY row_number() OVER (PARTITION BY lang
            ORDER BY n_chars DESC, doc_id) <= 7
        ORDER BY lang, doc_id""").fetchall()
    assert got == [tuple(r) for r in want]
    assert set(out[0].keys()) == {"doc_id", "lang", "n_chars"}


def test_grouped_topk_ascending_and_small_groups(ray_session):
    from search_ingest_ray.functions.sampling import grouped_topk
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "lang": pa.array(["a", "a", "a", "b", "b"]),
        "n_chars": pa.array([30, 10, 20, 5, 5], pa.int64()),
    })
    out = grouped_topk(_ds(tbl, 2), 2, group_col="lang",
                       order_cols=["n_chars"], descending=[False],
                       key_col="doc_id").take_all()
    got = sorted((r["lang"], r["doc_id"]) for r in out)
    # ascending: a keeps 10(id2),20(id3); b keeps both (tie -> id order)
    assert got == [("a", 2), ("a", 3), ("b", 4), ("b", 5)]


def test_weighted_sample_matches_sql_and_block_invariant(ray_session):
    from search_ingest_ray.functions.sampling import weighted_sample
    tbl = _docs(400)
    want = duckdb.sql("""
        SELECT doc_id FROM tbl WHERE n_chars > 0
        ORDER BY md5_number_lower('w1' || CAST(doc_id AS VARCHAR))
                 % 9223372036854775808 // n_chars, doc_id
        LIMIT 25""").fetchall()
    want = sorted(r[0] for r in want)
    for blocks in (1, 11):
        got = sorted(r["doc_id"] for r in weighted_sample(
            _ds(tbl, blocks), 25, weight_col="n_chars", salt="w1")
            .take_all())
        assert got == want, blocks


def test_weighted_sample_prefers_heavy_rows(ray_session):
    from search_ingest_ray.functions.sampling import weighted_sample
    n = 4000
    w = np.where(np.arange(n) < 200, 10_000, 10).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "n_chars": pa.array(w)})
    got = [r["doc_id"] for r in weighted_sample(
        _ds(tbl, 5), 100, weight_col="n_chars", salt="w2").take_all()]
    heavy = sum(1 for d in got if d < 200)
    # heavy rows are 1000x likelier per unit; expect the sample dominated
    assert heavy > 60
    # zero/negative weights never drawn
    tbl0 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "n_chars": pa.array([0, 5], pa.int64())})
    got0 = [r["doc_id"] for r in weighted_sample(
        _ds(tbl0, 1), 5, weight_col="n_chars").take_all()]
    assert got0 == [2]
