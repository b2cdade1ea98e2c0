"""Incremental index epochs — the Ray-native analogue of the reference's
changefeed-driven sync (/root/reference/src/search-ingest/table.cr:25-46).

Model: the live table is a sequence of epoch snapshots kept in a
HASH-BUCKETED layout (``snapshots/eNNNN/__bucket=B/``).  Applying a delta:

1. compute the touched buckets (the distinct ``hash(id) % NB`` of delta
   rows — a tiny driver-side set);
2. fold ONLY the touched buckets (previous bucket rows ∪ delta rows,
   last-write-wins + tombstones, vectorized partitioned fold) and write
   them, hard-linking every untouched bucket's files from the previous
   snapshot (content-identical, zero IO).

Two index-maintenance modes per epoch:

- ``mode="full"`` (snapshot rebuild, default): build the epoch's index
  over the whole snapshot with one chunk per bucket and an
  epoch-independent chunk fingerprint ``b<bucket>:v<version>`` — unchanged
  buckets RE-LINK the previous epoch's postings instead of re-tokenizing,
  so stage 1 is O(delta); stage 2 (exchange + segments) rebuilds from the
  full postings, keeping stored block-max bounds exact.
- ``mode="delta"`` (Lucene-style delta segments): the epoch indexes ONLY
  the delta's surviving docs and records a DEAD-docid set (old versions of
  updated/deleted docs) plus exact cumulative stats (N, total tokens —
  the old versions' token counts are recomputed by tokenizing just those
  O(delta) rows from the previous snapshot).  Queries go through
  :class:`~search_ingest_ray.query.multi.MultiEpochSearcher`, which
  suppresses dead docids and scores with the exact CURRENT global stats —
  results are identical to a full rebuild.  Per-epoch cost is O(delta)
  end-to-end.  Each delta epoch also writes a DEAD-TERM PATCH
  (``df_patch/``, from the same O(delta) old-version retokenize), which
  lets the multi-searcher compute exact chain-wide df from metadata and
  prune posting blocks with stat-drift-corrected block-max bounds
  (see ``query/multi.py``).

Properties preserved from the reference:

- at-least-once deltas are idempotent (upsert keyed on id — doc_as_upsert,
  elastic.cr:431-449): replaying an epoch is a no-op resume;
- deletes are tombstones that remove the doc (elastic.cr:452-464);
- docids are stable content-key hashes (util.doc_id_hash), so an unchanged
  document keeps its docid across epochs;
- a crashed epoch build resumes from the manifest without re-tokenizing
  completed (or reusable) chunks.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..index.build import build_index, epoch_dir
from ..stages.fold import apply_epoch, fold_last_write_wins
from ..util import (atomic_write_json, chaos_kill_once, read_json,
                    stable_partition_column)

_BUCKET_COL = "__bucket"


def snapshot_dir(index_root: str, epoch: int) -> str:
    return os.path.join(index_root, "snapshots", f"e{epoch:04d}")


def _bucket_files(sd: str, b: int) -> list[str]:
    d = os.path.join(sd, f"{_BUCKET_COL}={b}")
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith(".parquet"))


def _tag_bucket(batch: pa.Table, *, id_col: str, num_buckets: int) -> pa.Table:
    part = stable_partition_column(batch[id_col], num_buckets)
    return batch.append_column(_BUCKET_COL, pa.array(part.astype(np.int64)))


def _touched_buckets(delta_ds, id_col: str, num_buckets: int) -> set[int]:
    """Distinct delta buckets via tiny per-batch partials (no shuffle)."""
    def distinct(batch: pa.Table) -> pa.Table:
        part = stable_partition_column(batch[id_col], num_buckets)
        return pa.table({"b": pa.array(np.unique(part).astype(np.int64))})
    rows = delta_ds.map_batches(distinct, batch_format="pyarrow").take_all()
    return {int(r["b"]) for r in rows}


def _link_file(src: str, dst: str) -> None:
    import shutil
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _update_snapshot(index_root: str, delta_paths, epoch: int, *,
                     id_col: str, num_buckets: int,
                     base_paths=None) -> tuple[str, dict]:
    """Maintain the bucketed snapshot for ``epoch`` (idempotent via the
    _SNAPSHOT_DONE marker).  Returns (snapshot dir, bucket versions)."""
    sd = snapshot_dir(index_root, epoch)
    done_marker = os.path.join(sd, "_SNAPSHOT_DONE")
    meta_path = os.path.join(index_root, "snapshot_meta.json")
    meta = read_json(meta_path) if os.path.exists(meta_path) else \
        {"num_buckets": num_buckets, "epochs": {}}
    num_buckets = int(meta["num_buckets"])

    if not os.path.exists(done_marker):
        import shutil
        shutil.rmtree(sd, ignore_errors=True)  # clear partial snapshot
        os.makedirs(sd, exist_ok=True)
        if epoch == 0 or base_paths is not None:
            base = rd.read_parquet(base_paths)
            if delta_paths is not None:
                folded = apply_epoch(base, rd.read_parquet(delta_paths), id_col)
                drop = [c for c in ("epoch", "action")
                        if c in folded.schema().names]
                if drop:
                    folded = folded.drop_columns(drop)
            else:
                folded = base
            tagged = folded.map_batches(
                _tag_bucket, batch_format="pyarrow",
                fn_kwargs=dict(id_col=id_col, num_buckets=num_buckets))
            tagged.write_parquet(sd, partition_cols=[_BUCKET_COL])
            # a (re-)backfill bumps EVERY bucket past the previous epoch's
            # version — fingerprints must never collide with older content,
            # or build_index would re-link stale postings
            prev_versions = meta["epochs"].get(str(epoch - 1), {})
            versions = {str(b): int(prev_versions.get(str(b), -1)) + 1
                        for b in range(num_buckets)}
        elif delta_paths is None:
            # compaction epoch: no new rows — hard-link EVERY bucket from
            # the previous snapshot with versions UNCHANGED, so the full
            # build's chunk fingerprints still match the last full epoch's
            # and untouched buckets re-link their postings
            prev_sd = snapshot_dir(index_root, epoch - 1)
            prev_versions = meta["epochs"][str(epoch - 1)]
            versions = {str(b): int(prev_versions[str(b)])
                        for b in range(num_buckets)}
            for b in range(num_buckets):
                files = _bucket_files(prev_sd, b)
                if files:
                    dstd = os.path.join(sd, f"{_BUCKET_COL}={b}")
                    os.makedirs(dstd, exist_ok=True)
                    for f in files:
                        _link_file(f, os.path.join(dstd, os.path.basename(f)))
        else:
            prev_sd = snapshot_dir(index_root, epoch - 1)
            prev_versions = meta["epochs"][str(epoch - 1)]
            delta = rd.read_parquet(delta_paths)
            touched = _touched_buckets(delta, id_col, num_buckets)
            # untouched buckets: hard-link the previous snapshot's files
            versions = {}
            for b in range(num_buckets):
                if b in touched:
                    versions[str(b)] = int(prev_versions[str(b)]) + 1
                    continue
                versions[str(b)] = int(prev_versions[str(b)])
                files = _bucket_files(prev_sd, b)
                if files:
                    dstd = os.path.join(sd, f"{_BUCKET_COL}={b}")
                    os.makedirs(dstd, exist_ok=True)
                    for f in files:
                        _link_file(f, os.path.join(dstd, os.path.basename(f)))
            # touched buckets: fold prev ∪ delta, one Ray job, partitioned
            # write back into the snapshot
            prev_files = [f for b in sorted(touched)
                          for f in _bucket_files(prev_sd, b)]
            base = rd.read_parquet(prev_files) if prev_files else None
            if base is not None:
                base = base.drop_columns([_BUCKET_COL]) \
                    if _BUCKET_COL in base.schema().names else base
                folded = apply_epoch(base, delta, id_col)
            else:
                folded = fold_last_write_wins(delta, id_col, ["epoch"],
                                              action_col="action")
            drop = [c for c in ("epoch", "action") if c in folded.schema().names]
            if drop:
                folded = folded.drop_columns(drop)
            tagged = folded.map_batches(
                _tag_bucket, batch_format="pyarrow",
                fn_kwargs=dict(id_col=id_col, num_buckets=num_buckets))
            tagged.write_parquet(sd, partition_cols=[_BUCKET_COL])
        # chaos point: driver dies with the snapshot files written but no
        # done marker — the rerun must rmtree the partial snapshot and
        # redo it (tests/test_chaos.py::test_epoch_apply_driver_crashes)
        chaos_kill_once(f"snapshot_e{epoch}")
        meta["epochs"][str(epoch)] = versions
        atomic_write_json(meta_path, meta)
        with open(done_marker, "w") as f:
            f.write("ok")

    meta = read_json(meta_path)
    return sd, meta["epochs"][str(epoch)]


def _record_chain(index_root: str, epoch: int, mode: str) -> None:
    chain_path = os.path.join(index_root, "epochs.json")
    chain = read_json(chain_path) if os.path.exists(chain_path) else \
        {"epochs": [], "modes": {}}
    chain.setdefault("modes", {})
    if epoch not in chain["epochs"]:
        chain["epochs"].append(epoch)
        chain["epochs"].sort()
    chain["modes"][str(epoch)] = mode
    chain["latest"] = max(chain["epochs"])
    atomic_write_json(chain_path, chain)


def apply_delta_epoch(index_root: str, delta_paths, epoch: int, *,
                      id_col: str = "url", text_col: str = "text",
                      html_col: str | None = None, id_is_int: bool = False,
                      analyzer: str = "standard",
                      base_paths=None, num_buckets: int = 16,
                      mode: str = "full", reuse_from: int | None = None,
                      **build_kwargs) -> dict:
    """Fold a delta onto the previous snapshot and build the epoch's index.

    ``base_paths``: input for epoch 0 (the backfill); later epochs read the
    previous bucketed snapshot.  ``mode``: "full" (snapshot rebuild,
    O(delta) tokenize + full stage 2) or "delta" (delta segments + dead-set
    suppression, O(delta) end-to-end — query via MultiEpochSearcher).
    Returns the epoch build manifest.
    """
    if mode not in ("full", "delta"):
        raise ValueError(f"unknown epoch mode {mode!r}")
    if mode == "delta" and (epoch == 0 or base_paths is not None):
        mode = "full"  # a backfill is by definition a full build

    if mode == "delta":
        return _apply_delta_segments(
            index_root, delta_paths, epoch, id_col=id_col, text_col=text_col,
            html_col=html_col, id_is_int=id_is_int, analyzer=analyzer,
            num_buckets=num_buckets, **build_kwargs)

    sd, versions = _update_snapshot(index_root, delta_paths, epoch,
                                    id_col=id_col, num_buckets=num_buckets,
                                    base_paths=base_paths)
    # chaos point: driver dies with the snapshot committed but no index —
    # the rerun must take the done-marker fast path and build from the
    # SAME bucket versions (stale fingerprints would re-link old postings)
    chaos_kill_once(f"epoch_prebuild_e{epoch}")
    meta = read_json(os.path.join(index_root, "snapshot_meta.json"))
    num_buckets = int(meta["num_buckets"])
    chunks = [_bucket_files(sd, b) for b in range(num_buckets)]
    fps = [f"b{b}:v{versions[str(b)]}" for b in range(num_buckets)]
    build_kwargs.pop("chunk_files", None)  # chunking is per bucket here
    manifest = build_index(
        chunks, index_root, epoch=epoch, id_col=id_col, text_col=text_col,
        html_col=html_col, id_is_int=id_is_int, analyzer=analyzer,
        chunk_fingerprints=fps,
        reuse_from_epoch=(reuse_from if reuse_from is not None
                          else (epoch - 1 if epoch > 0 else None)),
        **build_kwargs)
    _record_chain(index_root, epoch, "full")
    return manifest


# ---------------------------------------------------------------------------
# delta-segment mode


def _delta_ids(delta_ds, id_col: str):
    """Distinct delta ids: per-batch partial distinct, final set on the
    driver (a delta is O(changed docs) by definition)."""
    def distinct(batch: pa.Table) -> pa.Table:
        col = batch[id_col]
        return pa.table({id_col: pc.unique(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)})
    parts = delta_ds.map_batches(distinct, batch_format="pyarrow").take_all()
    return sorted({r[id_col] for r in parts})


def _old_version_stats(prev_files, delta_ids, *, id_col, text_col, html_col,
                       analyzer, id_is_int, patch_dir=None):
    """Tokenize ONLY the previous versions of changed docs (O(delta)):
    returns (dead_docids sorted int64, n_old, sum_dl_old).

    When ``patch_dir`` is given, also writes the DEAD-TERM PATCH — one row
    per distinct term of the old versions with the count of dead docs
    containing it.  Summed over the chain this gives the exact number of
    postings a term loses to dead-docid suppression, so
    :class:`~search_ingest_ray.query.multi.MultiEpochSearcher` can compute
    the exact chain-wide df from term-dictionary metadata alone (no posting
    decode) and restore block-max pruning on delta chains.  The patch is
    O(delta vocabulary) and aggregated with a native groupby (never
    materialized on the driver)."""
    from ..stages.analyze import DoclenEmitter, PostingEmitter, extract_batch
    if patch_dir is not None:
        import shutil
        shutil.rmtree(patch_dir, ignore_errors=True)
        os.makedirs(patch_dir, exist_ok=True)
    if not prev_files:
        if patch_dir is not None:
            _mark_done(patch_dir)
        return np.empty(0, dtype=np.int64), 0, 0
    ids_arr = pa.array(delta_ids)
    ids_ref = ray.put(ids_arr)

    def pick(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=ray.get(ids_ref)))

    ds = rd.read_parquet(prev_files).map_batches(pick, batch_format="pyarrow")
    if html_col:
        ds = ds.map_batches(extract_batch, batch_format="pyarrow")
    if patch_dir is not None:
        ds = ds.materialize()  # consumed twice below; O(delta) rows
    emitter = DoclenEmitter(text_col, id_col, id_is_int, analyzer)

    def emit_dl(t: pa.Table) -> pa.Table:
        # chaos point: a WORKER dies mid old-version retokenize (delta
        # epochs only) — Ray task retry must reproduce identical stats
        chaos_kill_once("old_dl")
        return emitter(t)

    rows = ds.map_batches(emit_dl, batch_format="pyarrow").take_all()
    docids = np.array(sorted(int(r["docid"]) for r in rows), dtype=np.int64)
    sum_dl = int(sum(int(r["dl"]) for r in rows))
    if patch_dir is not None:
        pe = PostingEmitter(text_col, id_col, id_is_int, analyzer)

        def partial_counts(t: pa.Table) -> pa.Table:
            # chaos point: a WORKER dies mid dead-term-patch counting —
            # the retried task must leave the groupby-sum patch exact
            chaos_kill_once("df_patch")
            # one posting row per distinct (term, doc) → rows-per-term is
            # the batch-partial dead-doc count
            posts = pe(t)
            if posts.num_rows == 0:
                return pa.table({"term": pa.array([], pa.string()),
                                 "cnt": pa.array([], pa.int64())})
            vc = pc.value_counts(posts["term"])
            return pa.table({"term": vc.field("values"),
                             "cnt": pc.cast(vc.field("counts"), pa.int64())})

        counted = ds.map_batches(partial_counts, batch_format="pyarrow")
        counted.groupby("term").sum("cnt").write_parquet(patch_dir)
        _mark_done(patch_dir)
    return docids, len(rows), sum_dl


def _mark_done(d: str) -> None:
    with open(os.path.join(d, "_DONE"), "w") as f:
        f.write("ok")


def _prev_cum_stats(index_root: str, epoch: int) -> dict:
    """Exact cumulative (n_docs, total_tokens) after ``epoch``."""
    ed = epoch_dir(index_root, epoch)
    cp = os.path.join(ed, "cum_stats.json")
    if os.path.exists(cp):
        return read_json(cp)
    st = read_json(os.path.join(ed, "stats.json"))
    return {"n_docs": st["n_docs"], "total_tokens": st["total_tokens"],
            "k1": st["k1"], "b": st["b"]}


def _apply_delta_segments(index_root: str, delta_paths, epoch: int, *,
                          id_col, text_col, html_col, id_is_int, analyzer,
                          num_buckets, **build_kwargs) -> dict:
    ed = epoch_dir(index_root, epoch)
    os.makedirs(ed, exist_ok=True)
    prev_sd = snapshot_dir(index_root, epoch - 1)

    # delta artifacts (idempotent via their own marker): dead set + old-dl
    # sums computed BEFORE the snapshot advances
    dmeta_path = os.path.join(ed, "delta_meta.json")
    dead_path = os.path.join(ed, "dead_docids.npy")
    if not os.path.exists(dmeta_path):
        delta = rd.read_parquet(delta_paths)
        ids = _delta_ids(delta, id_col)
        meta_path = os.path.join(index_root, "snapshot_meta.json")
        nb = int(read_json(meta_path)["num_buckets"]) \
            if os.path.exists(meta_path) else num_buckets
        touched = set(stable_partition_column(pa.array(ids), nb).tolist())
        prev_files = [f for b in sorted(touched)
                      for f in _bucket_files(prev_sd, b)]
        dead, n_old, sum_dl_old = _old_version_stats(
            prev_files, ids, id_col=id_col, text_col=text_col,
            html_col=html_col, analyzer=analyzer, id_is_int=id_is_int,
            patch_dir=os.path.join(ed, "df_patch"))
        np.save(dead_path, dead)
        atomic_write_json(dmeta_path, {
            "mode": "delta", "n_changed_ids": len(ids),
            "n_old": int(n_old), "sum_dl_old": int(sum_dl_old),
        })

    # chaos point: driver dies with the dead-set/df-patch committed but
    # before the snapshot advance — the rerun must skip the (idempotent)
    # delta-meta block and continue from the snapshot
    chaos_kill_once(f"delta_meta_e{epoch}")

    # advance the bucketed snapshot (compaction fallback + next-delta base)
    _update_snapshot(index_root, delta_paths, epoch,
                     id_col=id_col, num_buckets=num_buckets)

    # surviving delta docs → the epoch's own small index
    live_dir = os.path.join(ed, "delta_docs")
    live_marker = os.path.join(live_dir, "_DONE")
    if not os.path.exists(live_marker):
        import shutil
        shutil.rmtree(live_dir, ignore_errors=True)
        os.makedirs(live_dir, exist_ok=True)
        delta = rd.read_parquet(delta_paths)
        live = fold_last_write_wins(delta, id_col, ["epoch"],
                                    action_col="action")
        drop = [c for c in ("epoch", "action") if c in live.schema().names]
        if drop:
            live = live.drop_columns(drop)
        live.write_parquet(live_dir)
        with open(live_marker, "w") as f:
            f.write("ok")
    live_files = sorted(os.path.join(live_dir, f)
                        for f in os.listdir(live_dir)
                        if f.endswith(".parquet"))

    build_kwargs.pop("chunk_files", None)
    if live_files:
        manifest = build_index(live_files, index_root, epoch=epoch,
                               id_col=id_col, text_col=text_col,
                               html_col=html_col, id_is_int=id_is_int,
                               analyzer=analyzer, chunk_files=8,
                               **build_kwargs)
        ep_stats = manifest["stats"]
    else:  # delete-only delta: no new docs, only suppression
        st_path = os.path.join(ed, "stats.json")
        k1 = build_kwargs.get("k1", 1.2)
        b = build_kwargs.get("b", 0.75)
        stub = {"n_docs": 0, "n_postings": 0, "total_tokens": 0,
                "avgdl": 1.0, "k1": k1, "b": b, "analyzer": analyzer,
                "num_term_partitions": 1, "hot_salt": 1,
                "hot_df_threshold": 0, "hot_terms": {}}
        atomic_write_json(st_path, stub)
        manifest = {"epoch": epoch, "status": "done", "chunks": {},
                    "segments": {}, "stats": stub}
        atomic_write_json(os.path.join(ed, "manifest.json"), manifest)
        ep_stats = stub

    # exact cumulative stats: prev − old versions + new versions
    dmeta = read_json(dmeta_path)
    prev = _prev_cum_stats(index_root, epoch - 1)
    cum = {
        "n_docs": int(prev["n_docs"]) - dmeta["n_old"] + int(ep_stats["n_docs"]),
        "total_tokens": (int(prev["total_tokens"]) - dmeta["sum_dl_old"]
                         + int(ep_stats["total_tokens"])),
        "k1": ep_stats["k1"], "b": ep_stats["b"],
    }
    cum["avgdl"] = (cum["total_tokens"] / cum["n_docs"]) if cum["n_docs"] \
        else 1.0
    atomic_write_json(os.path.join(ed, "cum_stats.json"), cum)

    _record_chain(index_root, epoch, "delta")
    return manifest


def latest_epoch(index_root: str) -> int:
    chain_path = os.path.join(index_root, "epochs.json")
    if os.path.exists(chain_path):
        return int(read_json(chain_path)["latest"])
    return 0


def epoch_chain(index_root: str) -> list[tuple[int, str]]:
    """Ordered (epoch, mode) pairs starting at the LAST full epoch — the
    set a multi-epoch query must consult."""
    chain_path = os.path.join(index_root, "epochs.json")
    if not os.path.exists(chain_path):
        return [(0, "full")]
    chain = read_json(chain_path)
    modes = chain.get("modes", {})
    epochs = sorted(chain["epochs"])
    out = [(e, modes.get(str(e), "full")) for e in epochs]
    last_full = max((i for i, (_, m) in enumerate(out) if m == "full"),
                    default=0)
    return out[last_full:]


def compact_chain(index_root: str, *, id_col: str = "url",
                  text_col: str = "text", html_col: str | None = None,
                  id_is_int: bool = False, analyzer: str = "standard",
                  **build_kwargs) -> dict:
    """Roll the current delta chain into a NEW full epoch — the ES
    force-merge analog (the reference delegates segment merging to ES;
    /root/reference/src/search-ingest/elastic.cr keeps one live index per
    table and lets ES compact it).

    The latest bucketed snapshot already holds the folded logical state
    (every delta epoch advances it), so compaction is a no-delta full
    apply at ``latest + 1``: all buckets hard-link from the previous
    snapshot with their versions UNCHANGED, and the full build re-links
    postings for every bucket untouched since the LAST FULL epoch
    (``reuse_from``) — stage 1 is O(rows changed since the last full
    build), stage 2 rebuilds segments with exact stored block-max bounds
    and NO dead-docid suppression.  After compaction
    :func:`epoch_chain` starts at the new epoch, so
    :class:`~search_ingest_ray.query.multi.MultiEpochSearcher` collapses
    to single-epoch serving (no per-query dead-set masks or df patches).
    Idempotent/resumable through the same snapshot + manifest markers as
    any full epoch.  No-op (returns the latest manifest) when the chain
    is already a single full epoch."""
    chain = epoch_chain(index_root)
    last_full, latest = chain[0][0], chain[-1][0]
    if latest == last_full:
        return read_json(os.path.join(epoch_dir(index_root, latest),
                                      "manifest.json"))
    return apply_delta_epoch(
        index_root, None, latest + 1, id_col=id_col, text_col=text_col,
        html_col=html_col, id_is_int=id_is_int, analyzer=analyzer,
        mode="full", reuse_from=last_full, **build_kwargs)


def watch_deltas(index_root: str, feed_dir: str, *, poll_sec: float = 1.0,
                 max_epochs: int | None = None, stop_when=None,
                 mode: str = "delta", **delta_kwargs) -> list[dict]:
    """Tail a changefeed directory — the engine-native analog of the
    reference's RethinkDB changefeed watch loop (table.cr:25-46, which
    re-subscribes and applies each change as it arrives).

    Contract: the feed publishes one parquet per epoch named
    ``delta-e{N:04d}.parquet`` (atomic rename by the producer).  The
    watcher applies epochs strictly in order starting after the highest
    committed epoch, so it is RESUMABLE: restarting it re-scans the chain
    and continues where the last run stopped; a replayed epoch is
    idempotent (``apply_delta_epoch`` short-circuits on a committed
    manifest).  ``stop_when`` (callable → bool, checked each poll) and
    ``max_epochs`` bound the loop for tests/one-shot drains; by default
    it runs until stopped.  Returns the applied epoch manifests."""
    import time as _time

    applied: list[dict] = []
    chain_path = os.path.join(index_root, "epochs.json")
    while True:
        if stop_when is not None and stop_when():
            return applied
        nxt = (read_json(chain_path)["latest"] + 1
               if os.path.exists(chain_path) else 0)
        path = os.path.join(feed_dir, f"delta-e{nxt:04d}.parquet")
        if not os.path.exists(path):
            _time.sleep(poll_sec)
            continue
        try:
            # Footer barrier: a producer that renames atomically
            # (publish_epoch) always passes; a non-atomic producer
            # mid-write just makes the watcher wait one poll instead of
            # crashing the daemon on a truncated file.
            pq.read_metadata(path)
        except Exception:
            _time.sleep(poll_sec)
            continue
        if nxt == 0:
            # epoch 0 in the feed is the backfill table itself
            applied.append(apply_delta_epoch(index_root, None, 0,
                                             base_paths=[path],
                                             **delta_kwargs))
        else:
            applied.append(apply_delta_epoch(index_root, [path], nxt,
                                             mode=mode, **delta_kwargs))
        if max_epochs is not None and len(applied) >= max_epochs:
            return applied


def publish_epoch(feed_dir: str, epoch: int, table: pa.Table) -> str:
    """Producer-side durable atomic publish — the feed-contract barrier.

    Write the epoch parquet under a temp name, fsync the FILE, rename to
    its final ``delta-e{N:04d}.parquet`` name, then fsync the DIRECTORY:
    after a producer crash at any point, watchers either see the complete
    durable epoch or nothing — never a half-visible file.  (rename alone
    is atomic in the namespace but not durable: without the two fsyncs a
    power cut can surface a named file with missing tail pages.)"""
    os.makedirs(feed_dir, exist_ok=True)
    final = os.path.join(feed_dir, f"delta-e{epoch:04d}.parquet")
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    with open(tmp, "rb+") as f:
        os.fsync(f.fileno())
    os.rename(tmp, final)
    dfd = os.open(feed_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    return final
