"""Python client facade — the analog of the reference's typed service
client (/root/reference/src/search-ingest/client.cr:41-59): reindex,
backfill, status, plus native query since the engine owns scoring.

Assumes a live Ray session (the caller/driver owns it)."""

from __future__ import annotations

import json
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


class HttpClient:
    """HTTP client for the service in :mod:`search_ingest_ray.http` — the
    analog of the reference's HTTP service client
    (/root/reference/src/search-ingest/client.cr:41-59): healthcheck,
    version, reindex, backfill, ready — plus engine-native query/phrase
    since this engine owns scoring."""

    def __init__(self, base_url: str):
        from .http import BASE
        self.base = base_url.rstrip("/") + BASE

    def _req(self, method: str, path: str, body: dict | None = None):
        import urllib.error
        import urllib.request
        data = None if body is None else json.dumps(body).encode()
        req = urllib.request.Request(
            self.base + path, data=data, method=method,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read() or b"{}")
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read() or b"{}")

    # -- client.cr parity ----------------------------------------------------

    def healthcheck(self) -> bool:
        return self._req("GET", "/")[0] == 200

    def version(self) -> dict:
        return self._req("GET", "/version")[1]

    def ready(self) -> bool:
        return self._req("GET", "/ready")[0] == 200

    def reindex(self, backfill: bool = False) -> bool:
        return self._req(
            "POST", f"/reindex?backfill={str(backfill).lower()}")[0] == 200

    def backfill(self) -> bool:
        return self._req("POST", "/backfill")[0] == 200

    # -- engine-native query -------------------------------------------------

    def query(self, table: str, query: str, k: int = 10,
              filters: dict | None = None,
              fields: list[str] | None = None) -> dict:
        body = {"query": query, "k": k}
        if filters:
            body["filters"] = filters
        if fields:
            body["fields"] = fields
        return self._req("POST", f"/query/{table}", body)[1]

    def phrase(self, table: str, phrase: str, k: int = 10, slop: int = 0,
               filters: dict | None = None) -> dict:
        body = {"phrase": phrase, "k": k, "slop": slop}
        if filters:
            body["filters"] = filters
        return self._req("POST", f"/phrase/{table}", body)[1]
