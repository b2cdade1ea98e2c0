"""Long-lived query serving daemon — the Ray-native analog of the
reference's always-on HTTP service (/root/reference/src/api.cr:25-90).

The reference keeps a pooled ES client alive for the process lifetime; the
round-1 CLI built a fresh Searcher per invocation.  This daemon holds ONE
warmed :class:`Searcher` (term dictionaries + mmapped postings resident)
and answers a JSON-lines protocol on a stream pair — stdin/stdout from the
CLI (``python -m search_ingest_ray.cli serve <root>``), or any file-like
pair in-process (tests drive it with StringIO).

Request (one JSON object per line)::

    {"op": "query",  "id": 1, "query": "merge scan", "k": 10,
     "filters": {"lang": "de"}, "fields": ["lang"]}
    {"op": "phrase", "id": 2, "phrase": "merge scan", "k": 10}
    {"op": "status", "id": 3}
    {"op": "quit"}

Response: ``{"id":..., "ok": true, "hits": [{"doc_id":..., "score":...,
"rank":...}, ...]}`` or ``{"id":..., "ok": false, "error": "..."}``.

Filters use the FieldStore grammar; JSON lists ``["range", lo, hi]`` /
``["in", [...]]`` are accepted and normalized to the tuple forms.
"""

from __future__ import annotations

import json
import time

from .query.searcher import Searcher


def _norm_filters(filters: dict | None) -> dict | None:
    if not filters:
        return None
    out = {}
    for col, spec in filters.items():
        if isinstance(spec, list) and spec and spec[0] in ("range", "in"):
            out[col] = (spec[0], *spec[1:]) if spec[0] == "range" \
                else ("in", spec[1])
        else:
            out[col] = spec
    return out


class ServeSession:
    """One daemon session: a warmed Searcher + request dispatch."""

    def __init__(self, index_root: str, epoch: int | None = None,
                 warm: bool = True):
        if epoch is None:
            from .pipelines.epochs import latest_epoch
            epoch = latest_epoch(index_root)
        self.epoch = epoch
        self.searcher = Searcher(index_root, epoch=epoch)
        if warm:
            self.searcher.warm()
        self.n_queries = 0
        self.started = time.monotonic()

    def handle(self, req: dict) -> dict | None:
        op = req.get("op", "query")
        rid = req.get("id")
        try:
            if op == "quit":
                return None
            if op == "status":
                st = self.searcher.stats
                return {"id": rid, "ok": True, "epoch": self.epoch,
                        "n_docs": st["n_docs"],
                        "n_queries": self.n_queries,
                        "uptime_s": round(time.monotonic() - self.started, 3)}
            k = int(req.get("k", 10))
            filters = _norm_filters(req.get("filters"))
            if op == "query":
                self.n_queries += 1
                fields = req.get("fields")
                if fields:
                    t = self.searcher.search_docs(
                        self.searcher.analyze(req["query"]), k=k,
                        filters=filters, return_fields=fields)
                    hits = t.to_pylist()
                else:
                    d, sc = self.searcher.search(req["query"], k=k,
                                                 filters=filters)
                    hits = [{"doc_id": int(x), "rank": i + 1,
                             "score": float(s)}
                            for i, (x, s) in enumerate(zip(d, sc))]
                return {"id": rid, "ok": True, "hits": hits}
            if op == "phrase":
                self.n_queries += 1
                d, sc = self.searcher.match_phrase(req["phrase"], k=k,
                                                   filters=filters)
                hits = [{"doc_id": int(x), "rank": i + 1, "score": float(s)}
                        for i, (x, s) in enumerate(zip(d, sc))]
                return {"id": rid, "ok": True, "hits": hits}
            return {"id": rid, "ok": False, "error": f"unknown op {op!r}"}
        except Exception as e:  # noqa: BLE001 — daemon must not die per-request
            return {"id": rid, "ok": False, "error": repr(e)[:500]}


def serve_loop(index_root: str, in_stream, out_stream,
               epoch: int | None = None, warm: bool = True) -> int:
    """Blocking request loop; returns the number of requests served."""
    sess = ServeSession(index_root, epoch=epoch, warm=warm)
    served = 0
    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            out_stream.write(json.dumps({"ok": False,
                                         "error": f"bad json: {e}"}) + "\n")
            out_stream.flush()
            continue
        resp = sess.handle(req)
        if resp is None:  # quit
            break
        out_stream.write(json.dumps(resp) + "\n")
        out_stream.flush()
        served += 1
    return served
