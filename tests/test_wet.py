"""WET/WARC source: framing round-trips byte-exactly, the reader is
tolerant of real-corpus damage (truncation, \n-only framing), and the
parsed Dataset feeds the standard index build."""

import gzip
import os

import pyarrow as pa
import pytest

from search_ingest_ray.sources.wet import (parse_warc, read_wet, wet_bytes,
                                           write_wet)

URLS = [f"http://ex.org/{i}" for i in range(5)]
TEXTS = ["hello world", "héllo wörld ☃", "", "a" * 5000,
         "multi\nline\r\npayload"]


def test_round_trip_exact():
    rec = parse_warc(wet_bytes(URLS, TEXTS))
    assert rec["url"] == URLS
    assert rec["text"] == TEXTS
    assert all(d == "2020-01-01T00:00:00Z" for d in rec["date"])


def test_warcinfo_skipped_and_record_types():
    blob = wet_bytes(URLS, TEXTS)
    assert parse_warc(blob, record_types=None)["url"] == URLS  # warcinfo has no URI
    assert parse_warc(blob, record_types=("request",))["url"] == []


def test_gzip_and_concatenated_members():
    a = gzip.compress(wet_bytes(URLS[:2], TEXTS[:2]))
    b = gzip.compress(wet_bytes(URLS[2:], TEXTS[2:], warcinfo=False))
    rec = parse_warc(a + b)
    assert rec["url"] == URLS
    assert rec["text"] == TEXTS


def test_lf_only_framing():
    blob = wet_bytes(URLS, TEXTS).replace(b"\r\n", b"\n")
    # payload bytes shrink when the payload itself held \r\n — recompute
    # lengths by reframing through the writer with LF payloads instead
    texts = [t.replace("\r\n", "\n") for t in TEXTS]
    blob = wet_bytes(URLS, texts).replace(b"\r\n", b"\n")
    rec = parse_warc(blob)
    assert rec["url"] == URLS
    assert rec["text"] == texts


def test_truncated_tail_keeps_complete_records():
    blob = wet_bytes(URLS, TEXTS, warcinfo=False)
    cut = blob[:blob.rfind(b"WARC/1.0") + 40]  # last record torn mid-header
    rec = parse_warc(cut)
    assert rec["url"] == URLS[:-1]
    assert rec["text"] == TEXTS[:-1]
    with pytest.raises(ValueError):
        parse_warc(cut, strict=True)


def test_missing_content_length_stops_tolerant_raises_strict():
    blob = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://x/\r\n\r\nbody\r\n\r\n")
    assert parse_warc(blob)["url"] == []
    with pytest.raises(ValueError):
        parse_warc(blob, strict=True)


def test_read_wet_dataset_and_index_build(ray_session, tmp_path):
    paths = []
    for i in range(3):
        lo = i * 30
        urls = [f"http://shard{i}.ex/{j}" for j in range(lo, lo + 30)]
        texts = [f"tok{j % 7} tok{j % 11} shard{i} common" for j in
                 range(lo, lo + 30)]
        suffix = ".warc.wet.gz" if i % 2 else ".warc.wet"
        paths.append(write_wet(str(tmp_path / f"s{i}{suffix}"), urls, texts))
    ds = read_wet(paths, include_path=True)
    # read_binary_files can emit an extra zero-row block that bypasses the
    # UDF (empty schema) — every real consumer (write_parquet, map_batches)
    # skips empty blocks, so the gather does too
    t = pa.concat_tables(t for t in ray_session.get(ds.to_arrow_refs())
                         if t.num_rows)
    assert t.num_rows == 90
    assert t.schema.field("text").type == pa.large_string()
    assert sorted(set(os.path.basename(p) for p in t["path"].to_pylist())) \
        == sorted(os.path.basename(p) for p in paths)

    # the parsed Dataset feeds the standard pipeline: normalize → build
    docs_dir = str(tmp_path / "docs")
    read_wet(paths).write_parquet(docs_dir)
    from search_ingest_ray.index.build import build_index
    from search_ingest_ray.query.searcher import Searcher
    files = sorted(os.path.join(docs_dir, f) for f in os.listdir(docs_dir)
                   if f.endswith(".parquet"))
    root = str(tmp_path / "idx")
    build_index(files, root, id_col="url", analyzer="simple",
                num_term_partitions=2, hot_df_threshold=10**9)
    s = Searcher(root)
    assert s.index_stats()["n_docs"][0].as_py() == 90
    d, sc = s.search_terms(["shard1"], k=40)
    assert len(d) == 30
