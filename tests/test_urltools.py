"""URL canonicalization + host operators (functions/urltools.py): the
documented canonical contract case-by-case, null/garbage tolerance, the
broadcast blocklist filter, and canonical-URL dedup vs a brute-force
expectation."""

import pyarrow as pa
import pytest

from search_ingest_ray.functions.urltools import (add_canonical_columns,
                                                  canonical_url_dedup,
                                                  canonicalize_urls,
                                                  host_blocklist_filter,
                                                  host_of,
                                                  registered_domain_of)

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM:443//a//b/?utm_source=x&q=1&fbclid=z#f",
     "https://www.example.com/a/b/?q=1"),
    ("http://Host.example.com:80/p/123?gclid=a&utm_campaign=c",
     "http://host.example.com/p/123"),
    ("https://example.org/path/", "https://example.org/path"),
    ("http://example.org/?utm_a=1", "http://example.org"),
    ("https://example.org", "https://example.org"),
    ("https://example.org:8443/x", "https://example.org:8443/x"),  # non-default port kept
    ("http://example.org:443/x", "http://example.org:443/x"),  # wrong-scheme port kept
    ("HTTP://A.B/./x//y///z", "http://a.b/./x/y/z"),
    ("ftp://Files.example.org:21/pub/", "ftp://files.example.org:21/pub"),
    ("not a url at all#frag", "not a url at all"),  # step-1-only passthrough
    ("/relative/path?utm_source=x&k=v", "/relative/path?k=v"),
]


def test_canonical_contract():
    raw = pa.array([r for r, _ in CASES])
    got = canonicalize_urls(raw).to_pylist()
    assert got == [c for _, c in CASES]


def test_canonicalize_idempotent():
    once = canonicalize_urls(pa.array([r for r, _ in CASES]))
    twice = canonicalize_urls(once)
    assert once.to_pylist() == twice.to_pylist()


def test_null_propagates():
    got = canonicalize_urls(pa.array(["http://a.b/x", None]))
    assert got.to_pylist() == ["http://a.b/x", None]


def test_host_and_domain():
    urls = pa.array([
        "https://news.example.co.uk:8443/a",
        "http://sub.deep.example.com/b",
        "http://localhost/c",
        "garbage",
    ])
    assert host_of(urls).to_pylist() == [
        "news.example.co.uk", "sub.deep.example.com", "localhost", ""]
    # documented two-label simplification (no PSL data file)
    assert registered_domain_of(urls).to_pylist() == [
        "co.uk", "example.com", "localhost", ""]


def test_add_canonical_columns():
    batch = pa.table({"url": pa.array(["HTTP://A.B:80/x/", "https://c.d#f"]),
                      "v": pa.array([1, 2])})
    out = add_canonical_columns(batch)
    assert out["canon_url"].to_pylist() == ["http://a.b/x", "https://c.d"]
    assert out["host"].to_pylist() == ["a.b", "c.d"]
    assert out.column_names == ["url", "v", "canon_url", "host"]


def test_host_blocklist_filter(ray_session):
    import ray.data as rd
    rows = [{"url": f"http://site{i % 3}.example.com/p/{i}", "i": i}
            for i in range(30)]
    ds = rd.from_items(rows)
    kept = host_blocklist_filter(
        ds, ["site0.example.com"], url_col="url").take_all()
    assert sorted(r["i"] for r in kept) == [i for i in range(30) if i % 3]
    blocked = host_blocklist_filter(
        ds, ["site0.example.com"], url_col="url",
        keep_blocked=True).take_all()
    assert sorted(r["i"] for r in blocked) == [i for i in range(30) if i % 3 == 0]


def test_canonical_url_dedup_keeps_newest(ray_session):
    import ray.data as rd
    # three alias classes, several crawls each, newest crawl_ts wins
    rows = []
    for i in range(24):
        k = i % 3
        noise = "#frag" if i % 2 else "?utm_source=x"
        rows.append({"url": f"HTTP://Site{k}.EX.com:80/p/{k}{noise}",
                     "crawl_ts": 1000 + i, "doc_id": i})
    out = canonical_url_dedup(rd.from_items(rows), url_col="url",
                              ts_col="crawl_ts",
                              tiebreak_cols=("doc_id",)).take_all()
    got = {r["canon_url"]: (r["crawl_ts"], r["doc_id"]) for r in out}
    assert got == {
        "http://site0.ex.com/p/0": (1021, 21),
        "http://site1.ex.com/p/1": (1022, 22),
        "http://site2.ex.com/p/2": (1023, 23),
    }
