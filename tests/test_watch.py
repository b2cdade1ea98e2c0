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


def test_manager_watch_all_three_tables_across_restart(ray_session, tmp_path):
    """Verdict-r3 #9: one feed dir per managed table driven by
    TableManager.watch_all, producers publishing through the
    fsync+rename barrier (publish_epoch), epochs applied in per-table
    order across a simulated restart of the whole watch fan-out."""
    from search_ingest_ray.pipelines.epochs import publish_epoch
    from search_ingest_ray.pipelines.manager import ManagedTable, TableManager

    feed_base = str(tmp_path / "feeds")
    tables = ["alpha", "beta", "gamma"]
    # per-table distinct content so cross-table mixups would be caught
    deltas = {
        name: [(f"{name}-u1", f"fresh {name} one w{i}", "created"),
               (f"{name}-u2", f"fresh {name} two w{i} w{i}", "created")]
        for i, name in enumerate(tables)
    }

    def base_for(name):
        t = _base_table()
        return t.set_column(0, "url",
                            pa.array([f"{name}-{u}" for u in
                                      t["url"].to_pylist()]))

    mgr = TableManager(str(tmp_path / "indices"),
                       [ManagedTable(n, None) for n in tables])
    kw = {n: KW for n in tables}

    # --- first run: every producer publishes epochs 0..1, watchers drain
    def produce_first():
        for name in tables:
            publish_epoch(os.path.join(feed_base, name), 0, base_for(name))
        time.sleep(0.2)
        for name in tables:
            publish_epoch(os.path.join(feed_base, name), 1,
                          _delta_table(deltas[name], 1))

    t = threading.Thread(target=produce_first)
    t.start()
    applied = mgr.watch_all(feed_base, poll_sec=0.05, max_epochs=2,
                            mode="delta", table_kwargs=kw)
    t.join()
    for name in tables:
        assert [m["status"] for m in applied[name]] == ["done", "done"]
        assert [m["epoch"] for m in applied[name]] == [0, 1]

    # --- simulated restart: a FRESH manager resumes each table after its
    # committed chain head and applies only the new epoch 2
    for name in tables:
        publish_epoch(os.path.join(feed_base, name), 2,
                      _delta_table([(f"{name}-u1", "", "deleted")], 2))
    mgr2 = TableManager(str(tmp_path / "indices"),
                        [ManagedTable(n, None) for n in tables])
    applied2 = mgr2.watch_all(feed_base, poll_sec=0.05, max_epochs=1,
                              mode="delta", table_kwargs=kw)
    for name in tables:
        assert [m["epoch"] for m in applied2[name]] == [2]
        # per-table results: u2 alive with its own table's tokens, u1 dead
        s = MultiEpochSearcher(mgr2.index_root(name))
        docs, _ = s.search_terms(["fresh", name], k=10)
        assert len(docs) == 1


def test_publish_epoch_is_torn_file_safe(ray_session, tmp_path):
    """The watcher's footer barrier: a half-written (non-atomic) file in
    the feed makes the watcher WAIT, not crash; once the producer finishes
    (atomic rename), the epoch applies."""
    from search_ingest_ray.pipelines.epochs import publish_epoch
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    root = str(tmp_path / "idx")

    # torn file: valid parquet truncated to half — readable magic, broken
    # footer, published non-atomically under the FINAL name
    buf = pa.BufferOutputStream()
    pq.write_table(_base_table(), buf)
    raw = buf.getvalue().to_pybytes()
    torn = os.path.join(feed, "delta-e0000.parquet")
    with open(torn, "wb") as f:
        f.write(raw[:len(raw) // 2])

    def finish_producer():
        time.sleep(0.4)
        publish_epoch(feed, 0, _base_table())   # overwrites the torn file

    t = threading.Thread(target=finish_producer)
    t.start()
    applied = watch_deltas(root, feed, poll_sec=0.05, max_epochs=1, **KW)
    t.join()
    assert [m["epoch"] for m in applied] == [0]
