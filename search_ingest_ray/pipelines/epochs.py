"""Incremental index epochs — the Ray-native analogue of the reference's
changefeed-driven sync (/root/reference/src/search-ingest/table.cr:25-46).

Model: the live table is a sequence of epoch snapshots.  Epoch e applies a
delta partition (rows carrying ``action ∈ {created,updated,deleted}`` and
``epoch``) onto the previous snapshot with a last-write-wins fold (E9),
writes the folded snapshot, and (re)builds the index for epoch e with full
per-chunk / per-term-partition lineage (E11).  Properties preserved from
the reference:

- at-least-once deltas are idempotent (upsert keyed on id — doc_as_upsert,
  elastic.cr:431-449): replaying an epoch yields a byte-identical snapshot;
- deletes are tombstones that remove the doc (elastic.cr:452-464);
- docids are stable content-key hashes (util.doc_id_hash), so an unchanged
  document keeps its docid across epochs — queries and dedup state survive;
- a crashed epoch build resumes from the manifest without re-tokenizing
  completed chunks.

A fully segmented multi-epoch index (new segments per epoch + dead-doc
suppression at query time, Lucene-style) is the planned scale path; the
snapshot-rebuild model here is the correctness baseline for it.
"""

from __future__ import annotations

import os

import ray.data as rd

from ..index.build import build_index
from ..stages.fold import apply_epoch
from ..util import atomic_write_json, read_json


def snapshot_dir(index_root: str, epoch: int) -> str:
    return os.path.join(index_root, "snapshots", f"e{epoch:04d}")


def apply_delta_epoch(index_root: str, delta_paths, epoch: int, *,
                      id_col: str = "url", text_col: str = "text",
                      html_col: str | None = None, id_is_int: bool = False,
                      analyzer: str = "standard",
                      base_paths=None, **build_kwargs) -> dict:
    """Fold a delta onto the previous snapshot and build the epoch's index.

    ``base_paths``: input for epoch 0 (the backfill); later epochs read the
    previous snapshot directory.  Returns the epoch build manifest.
    """
    sd = snapshot_dir(index_root, epoch)
    done_marker = os.path.join(sd, "_SNAPSHOT_DONE")
    if not os.path.exists(done_marker):
        if epoch == 0 and delta_paths is None:
            base = rd.read_parquet(base_paths)
            folded = base
        else:
            prev = snapshot_dir(index_root, epoch - 1) if base_paths is None \
                else None
            base = rd.read_parquet(prev if prev else base_paths)
            delta = rd.read_parquet(delta_paths)
            folded = apply_epoch(base, delta, id_col)
            keep = [c for c in folded.schema().names
                    if c not in ("epoch", "action")]
            folded = folded.select_columns(keep)
        os.makedirs(sd, exist_ok=True)
        folded.write_parquet(sd)
        with open(done_marker, "w") as f:
            f.write("ok")
    files = sorted(os.path.join(sd, f) for f in os.listdir(sd)
                   if f.endswith(".parquet"))
    manifest = build_index(files, index_root, epoch=epoch, id_col=id_col,
                           text_col=text_col, html_col=html_col,
                           id_is_int=id_is_int, analyzer=analyzer,
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
