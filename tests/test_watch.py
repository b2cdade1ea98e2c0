"""Changefeed watch loop: the directory-tailing daemon applies epochs in
order as the producer publishes them, resumes where it stopped, and the
resulting chain queries identically to direct epoch application."""

import os
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from search_ingest_ray.pipelines.epochs import (apply_delta_epoch,
                                                watch_deltas)
from search_ingest_ray.query.multi import MultiEpochSearcher

KW = dict(id_col="url", analyzer="simple", num_term_partitions=2,
          num_buckets=8, hot_df_threshold=10**9)
N = 60


def _base_table():
    rng = np.random.default_rng(33)
    vocab = [f"w{i}" for i in range(20)]
    return pa.table({
        "url": [f"u{i}" for i in range(N)],
        "text": [" ".join(rng.choice(vocab, size=rng.integers(5, 15)))
                 for _ in range(N)],
    })


def _delta_table(rows, epoch):
    urls, texts, actions = zip(*rows)
    return pa.table({"url": list(urls), "text": list(texts),
                     "epoch": pa.array([epoch] * len(rows), pa.int64()),
                     "action": list(actions)})


D1 = [("u3", "fresh alpha w1", "updated"), ("u5", "", "deleted"),
      ("u90", "fresh beta w2 w2", "created")]
D2 = [("u90", "fresh gamma w3", "updated"), ("u0", "", "deleted")]


def test_watch_applies_feed_in_order(ray_session, tmp_path):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    root = str(tmp_path / "idx")

    def produce():
        # atomic publish: write tmp, then rename — the watcher contract
        for i, tbl in enumerate((_base_table(),
                                 _delta_table(D1, 1),
                                 _delta_table(D2, 2))):
            p = os.path.join(feed, f"delta-e{i:04d}.parquet")
            pq.write_table(tbl, p + ".tmp")
            os.rename(p + ".tmp", p)
            time.sleep(0.3)

    t = threading.Thread(target=produce)
    t.start()
    applied = watch_deltas(root, feed, poll_sec=0.1, max_epochs=3,
                           mode="delta", **KW)
    t.join()
    assert [m["status"] for m in applied] == ["done"] * 3

    # reference: the same feed applied directly
    ref_root = str(tmp_path / "ref")
    apply_delta_epoch(ref_root, None, 0,
                      base_paths=[os.path.join(feed, "delta-e0000.parquet")],
                      **KW)
    for ep, rows in ((1, D1), (2, D2)):
        apply_delta_epoch(ref_root,
                          [os.path.join(feed, f"delta-e{ep:04d}.parquet")],
                          ep, mode="delta", **KW)
    got = MultiEpochSearcher(root).search_terms(["fresh", "w2"], k=10)
    want = MultiEpochSearcher(ref_root).search_terms(["fresh", "w2"], k=10)
    assert got[0].tolist() == want[0].tolist()
    assert got[1].tolist() == want[1].tolist()

    # resumability: a restarted watcher with nothing new stops immediately
    stop = {"n": 0}

    def stop_when():
        stop["n"] += 1
        return stop["n"] > 2
    again = watch_deltas(root, feed, poll_sec=0.05, stop_when=stop_when,
                         mode="delta", **KW)
    assert again == []


def test_cli_watch_drains_feed(ray_session, tmp_path, capsys):
    from search_ingest_ray.cli import main
    feed = str(tmp_path / "feedcli")
    os.makedirs(feed)
    pq.write_table(_base_table(),
                   os.path.join(feed, "delta-e0000.parquet"))
    pq.write_table(_delta_table(D1, 1),
                   os.path.join(feed, "delta-e0001.parquet"))
    root = str(tmp_path / "idxcli")
    rc = main(["watch", root, feed, "--poll-sec", "0.05",
               "--max-epochs", "2", "--mode", "delta",
               "--analyzer", "simple"])
    assert rc == 0
    assert '"applied": 2' in capsys.readouterr().out
