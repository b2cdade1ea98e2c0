"""Corpus fixture invariants: determinism + byte-identical extraction."""

import pyarrow.parquet as pq

from search_ingest_ray.corpus import (
    extract_text, generate_pages, query_set, wrap_html, write_corpus,
)


def test_deterministic():
    assert generate_pages(50, seed=1).equals(generate_pages(50, seed=1))
    assert not generate_pages(50, seed=1).equals(generate_pages(50, seed=2))


def test_schema_matches_input_hint():
    t = generate_pages(5)
    assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert str(t.schema.field("html").type) == "binary"
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"


def test_extraction_byte_identical():
    t = generate_pages(50, seed=3)
    for i in range(t.num_rows):
        assert extract_text(t["html"][i].as_py()) == t["text"][i].as_py()


def test_extraction_handles_html_entities():
    s = "a < b & c > d \"quoted\""
    assert extract_text(wrap_html(s)) == s


def test_write_corpus_idempotent(tmp_path):
    d = str(tmp_path / "c")
    p1 = write_corpus(d, 40, num_files=2, seed=9)
    t1 = pq.read_table(p1[0])
    p2 = write_corpus(d, 40, num_files=2, seed=9)
    assert p1 == p2
    assert pq.read_table(p2[0]).equals(t1)


def test_urls_unique():
    t = generate_pages(200)
    urls = t["url"].to_pylist()
    assert len(set(urls)) == len(urls)


def test_query_set_seeded():
    assert query_set(seed=5) == query_set(seed=5)
    assert all(1 <= len(q) <= 3 for q in query_set())
