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


# --- SQL-mirror property: the DuckDB oracle replays the SAME RE2 op
# sequence; prove byte-equality on arbitrary adversarial URLs, not just the
# synthetic generators in __ray_entry__.py.

from hypothesis import given, settings
from hypothesis import strategies as st

_url_chars = st.text(
    alphabet="abcXYZ019-._~:/?#[]@!$&'()*+,;=%é中 ",
    min_size=0, max_size=40)
_urls = st.one_of(
    _url_chars,
    st.builds(
        lambda sch, host, port, path, q, f: f"{sch}://{host}{port}{path}{q}{f}",
        st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", "hTTpS"]),
        st.from_regex(r"[A-Za-z0-9.\-]{1,12}", fullmatch=True),
        st.sampled_from(["", ":80", ":443", ":8080", ":0080"]),
        st.from_regex(r"(/[A-Za-z0-9._~%/]{0,10}){0,3}/?", fullmatch=True),
        st.sampled_from(["", "?utm_source=a", "?a=1&utm_b=2&b=2",
                         "?utm_x=1&utm_y=2", "?&&a=1&", "?fbclid=x",
                         "?gclid=1&msclkid=2&mc_eid=3"]),
        st.sampled_from(["", "#f", "#a#b", "#utm_source=keep"])))


def _sql_canon(urls: list[str]) -> list[str]:
    import duckdb
    import __ray_entry__ as e
    con = duckdb.connect()
    con.register("messy_in", pa.table({
        "doc_id": pa.array(range(len(urls)), pa.int64()),
        "url": pa.array(urls, pa.string())}))
    rows = con.execute(
        "WITH messy AS (SELECT * FROM messy_in)," + e._CANON_SQL_CTE +
        """
        SELECT m.doc_id,
               CASE WHEN regexp_matches(n.s, """ + e._URL_PARTS_SQL + """)
                    THEN c.canon_url ELSE n.s END AS canon_url
        FROM messy m JOIN noise n USING (doc_id) JOIN curl c USING (doc_id)
        ORDER BY m.doc_id""").fetchall()
    con.close()
    return [r[1] for r in rows]


@settings(max_examples=60, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=8))
def test_sql_mirror_byte_equal(urls):
    got = canonicalize_urls(pa.array(urls, pa.string())).to_pylist()
    assert got == _sql_canon(urls)
