"""Python client facade — the analog of the reference's typed service
client (/root/reference/src/search-ingest/client.cr:41-59): reindex,
backfill, status, plus native query since the engine owns scoring.

Assumes a live Ray session (the caller/driver owns it)."""

from __future__ import annotations

import os

from .index.build import build_index, reindex as _reindex
from .query.searcher import Searcher
from .util import read_json


class SearchIngest:
    def __init__(self, index_root: str):
        self.index_root = index_root
        self._searchers: dict[int, Searcher] = {}

    # -- ingest lifecycle (client.cr reindex/backfill analogs) --------------

    def backfill(self, input_paths, epoch: int = 0, **kwargs) -> dict:
        """Build/refresh the index for an epoch (resumable)."""
        return build_index(input_paths, self.index_root, epoch=epoch, **kwargs)

    def reindex(self, epoch: int = 0) -> None:
        """Drop epoch data, keep the mapping."""
        _reindex(self.index_root, epoch=epoch)
        self._searchers.pop(epoch, None)

    def apply_epoch(self, delta_paths, epoch: int, **kwargs) -> dict:
        from .pipelines.epochs import apply_delta_epoch
        self._searchers.pop(epoch, None)
        return apply_delta_epoch(self.index_root, delta_paths, epoch, **kwargs)

    # -- query ---------------------------------------------------------------

    def searcher(self, epoch: int = 0) -> Searcher:
        s = self._searchers.get(epoch)
        if s is None:
            s = self._searchers[epoch] = Searcher(self.index_root, epoch)
        return s

    def query(self, text: str, k: int = 10, epoch: int = 0):
        return self.searcher(epoch).search(text, k=k)

    # -- health (client.cr healthcheck analog) -------------------------------

    def ready(self, epoch: int = 0) -> bool:
        mp = os.path.join(self.index_root, "epochs", f"e{epoch:04d}",
                          "manifest.json")
        return os.path.exists(mp) and read_json(mp).get("status") == "done"
