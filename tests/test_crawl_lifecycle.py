"""End-to-end crawl lifecycle — the Common-Crawl analog of the reference's
whole job (changefeed watch → mirror → query, spec/table_spec.cr) chained
through every ingestion piece this engine adds:

WET shards → read_wet → URL canonicalization + within-crawl alias dedup →
epoch-0 backfill keyed on canonical URL → a second crawl as a delta epoch
(update + new page) → BM25 queries reflect exactly the newest crawl →
snapshot → total index loss → restore → bit-identical answers.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.functions.urltools import canonical_url_dedup
from search_ingest_ray.pipelines.epochs import apply_delta_epoch, latest_epoch
from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.snapshot import restore, snapshot
from search_ingest_ray.sources.wet import read_wet, write_wet
from search_ingest_ray.util import doc_id_hash

BUILD_KW = dict(id_col="canon_url", analyzer="simple",
                num_term_partitions=2, chunk_files=2)


def _ingest_crawl(wet_paths, out_dir):
    """One crawl: parse WET shards, canonicalize URLs, keep the newest
    record per canonical URL (alias fold), land a parquet snapshot."""
    ds = read_wet(wet_paths)
    deduped = canonical_url_dedup(ds, url_col="url", ts_col="date",
                                  tiebreak_cols=("url",))
    os.makedirs(out_dir, exist_ok=True)
    deduped.select_columns(["canon_url", "text"]).write_parquet(out_dir)
    return [os.path.join(out_dir, f) for f in sorted(os.listdir(out_dir))
            if f.endswith(".parquet")]


def test_crawl_day(ray_session, tmp_path):
    # --- crawl 1: two WET shards; page2 appears twice under alias URLs
    # (tracking param / explicit default port) — the fold must keep one
    shard1 = write_wet(
        str(tmp_path / "c1a.warc.wet"),
        ["http://SiteA.example.com/p/1?utm_source=feed",
         "http://sitea.example.com/p/2"],
        ["alpine ridge common", "boreal forest common"],
        dates=["2020-01-01T00:00:00Z"] * 2)
    shard2 = write_wet(
        str(tmp_path / "c1b.warc.wet"),
        ["HTTP://SiteA.Example.COM:80/p/2#frag",
         "http://siteb.example.com/p/3"],
        ["boreal forest common", "coastal dunes common"],
        dates=["2020-01-02T00:00:00Z"] * 2)
    crawl1 = _ingest_crawl([shard1, shard2], str(tmp_path / "snap1"))

    root = str(tmp_path / "idx")
    apply_delta_epoch(root, None, 0, base_paths=crawl1, **BUILD_KW)

    id1 = doc_id_hash("http://sitea.example.com/p/1")
    id2 = doc_id_hash("http://sitea.example.com/p/2")
    id3 = doc_id_hash("http://siteb.example.com/p/3")

    s0 = Searcher(root, epoch=0)
    d, _ = s0.search_terms(["common"], k=10)
    assert set(d.tolist()) == {id1, id2, id3}   # aliases folded to one doc
    d, _ = s0.search_terms(["boreal"], k=10)
    assert set(d.tolist()) == {id2}

    # --- crawl 2: page1 re-crawled with new content, page4 discovered
    shard3 = write_wet(
        str(tmp_path / "c2.warc.wet"),
        ["https://sitea.example.com/p/1",   # scheme change = NEW canonical
         "http://sitea.example.com/p/1",    # true re-crawl of page1
         "http://siteb.example.com/p/4"],
        ["glacier valley common", "glacier meadow common",
         "desert mesa common"],
        dates=["2020-02-01T00:00:00Z"] * 3)
    crawl2 = _ingest_crawl([shard3], str(tmp_path / "snap2"))
    delta = pa.concat_tables([pq.read_table(f) for f in crawl2])
    delta = delta.append_column(
        "epoch", pa.array([1] * delta.num_rows, pa.int64()))
    delta = delta.append_column(
        "action", pa.array(["updated"] * delta.num_rows))
    dd = str(tmp_path / "delta1")
    os.makedirs(dd)
    pq.write_table(delta, os.path.join(dd, "d.parquet"))
    apply_delta_epoch(root, [os.path.join(dd, "d.parquet")], 1, **BUILD_KW)
    assert latest_epoch(root) == 1

    s1 = Searcher(root, epoch=1)
    d, _ = s1.search_terms(["alpine"], k=10)
    assert d.tolist() == []                      # page1's old text is gone
    d, _ = s1.search_terms(["meadow"], k=10)
    assert set(d.tolist()) == {id1}              # …replaced by crawl 2's
    d, _ = s1.search_terms(["common"], k=10)
    assert set(d.tolist()) == {
        id1, id2, id3,
        doc_id_hash("https://sitea.example.com/p/1"),
        doc_id_hash("http://siteb.example.com/p/4")}

    # --- snapshot, lose everything, restore: answers bit-identical
    def topk(r):
        s = Searcher(r, epoch=1)
        dd, sc = s.search_terms(["common", "glacier"], k=10)
        return list(zip(dd.tolist(), sc.tolist()))

    before = topk(root)
    repo = str(tmp_path / "snaprepo")
    snapshot(root, repo, "day1")
    import shutil
    shutil.rmtree(root)
    restore(repo, "day1", root)
    assert topk(root) == before
