"""Incremental index epochs — the Ray-native analogue of the reference's
changefeed-driven sync (/root/reference/src/search-ingest/table.cr:25-46).

Model: the live table is a sequence of epoch snapshots kept in a
HASH-BUCKETED layout (``snapshots/eNNNN/__bucket=B/``).  Applying a delta:

1. compute the touched buckets (the distinct ``hash(id) % NB`` of delta
   rows — a tiny driver-side set);
2. fold ONLY the touched buckets (previous bucket rows ∪ delta rows,
   last-write-wins + tombstones, vectorized partitioned fold) and write
   them, hard-linking every untouched bucket's files from the previous
   snapshot (content-identical, zero IO);
3. build the epoch's index with one chunk per bucket and an
   epoch-independent chunk fingerprint ``b<bucket>:v<version>`` — unchanged
   buckets RE-LINK the previous epoch's postings instead of re-tokenizing,
   so stage-1 work is O(delta).  Stage 2 (term exchange + segments) rebuilds
   from the full postings set, which keeps global stats, df and block-max
   bounds exact — query results are identical to a from-scratch build.

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

import ray.data as rd

from ..index.build import build_index
from ..stages.fold import apply_epoch
from ..util import atomic_write_json, read_json, stable_partition_column

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


def apply_delta_epoch(index_root: str, delta_paths, epoch: int, *,
                      id_col: str = "url", text_col: str = "text",
                      html_col: str | None = None, id_is_int: bool = False,
                      analyzer: str = "standard",
                      base_paths=None, num_buckets: int = 16,
                      **build_kwargs) -> dict:
    """Fold a delta onto the previous snapshot and build the epoch's index.

    ``base_paths``: input for epoch 0 (the backfill); later epochs read the
    previous bucketed snapshot.  Returns the epoch build manifest.
    """
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
            versions = {str(b): 0 for b in range(num_buckets)}
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
                from ..stages.fold import fold_last_write_wins
                folded = fold_last_write_wins(delta, id_col, ["epoch"],
                                              action_col="action")
            drop = [c for c in ("epoch", "action") if c in folded.schema().names]
            if drop:
                folded = folded.drop_columns(drop)
            tagged = folded.map_batches(
                _tag_bucket, batch_format="pyarrow",
                fn_kwargs=dict(id_col=id_col, num_buckets=num_buckets))
            tagged.write_parquet(sd, partition_cols=[_BUCKET_COL])
        meta["epochs"][str(epoch)] = versions
        atomic_write_json(meta_path, meta)
        with open(done_marker, "w") as f:
            f.write("ok")

    versions = meta["epochs"][str(epoch)]
    chunks = [_bucket_files(sd, b) for b in range(num_buckets)]
    fps = [f"b{b}:v{versions[str(b)]}" for b in range(num_buckets)]
    build_kwargs.pop("chunk_files", None)  # chunking is per bucket here
    manifest = build_index(
        chunks, index_root, epoch=epoch, id_col=id_col, text_col=text_col,
        html_col=html_col, id_is_int=id_is_int, analyzer=analyzer,
        chunk_fingerprints=fps,
        reuse_from_epoch=epoch - 1 if epoch > 0 else None,
        **build_kwargs)
    # record the epoch chain
    chain_path = os.path.join(index_root, "epochs.json")
    chain = read_json(chain_path) if os.path.exists(chain_path) else {"epochs": []}
    if epoch not in chain["epochs"]:
        chain["epochs"].append(epoch)
        chain["epochs"].sort()
    chain["latest"] = max(chain["epochs"])
    atomic_write_json(chain_path, chain)
    return manifest


def latest_epoch(index_root: str) -> int:
    chain_path = os.path.join(index_root, "epochs.json")
    if os.path.exists(chain_path):
        return int(read_json(chain_path)["latest"])
    return 0
