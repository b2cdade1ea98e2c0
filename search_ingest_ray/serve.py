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

from .query.searcher import Searcher, _renull_int


def _norm_filters(filters: dict | None) -> dict | None:
    if not filters:
        return None
    out = {}
    for col, spec in filters.items():
        if isinstance(spec, list) and spec and spec[0] in ("range", "in",
                                                           "cidr"):
            if spec[0] == "in":
                out[col] = ("in", spec[1])
            else:  # range / cidr keep their positional args
                out[col] = (spec[0], *spec[1:])
        else:
            out[col] = spec
    return out


class ServeSession:
    """One daemon session: a warmed Searcher + request dispatch.

    When the index has a delta-segment epoch chain (``mode="delta"``
    epochs after the last full epoch), queries go through
    :class:`MultiEpochSearcher` — a single-epoch Searcher on the latest
    (tiny, delta-only) epoch would silently serve only the delta docs.
    Filters, phrase/slop queries and field retrieval all work on the chain
    (per-live-epoch docvalues / positional matching, current global
    stats)."""

    def __init__(self, index_root: str, epoch: int | None = None,
                 warm: bool = True):
        from .aliases import resolve as _resolve_alias
        index_root = _resolve_alias(index_root)  # accepts "alias:NAME";
        # resolved BEFORE chain detection so an aliased delta chain routes
        # through MultiEpochSearcher instead of silently missing epochs.json
        self.multi = None
        if epoch is None:
            from .pipelines.epochs import epoch_chain, latest_epoch
            chain = epoch_chain(index_root)
            if any(m == "delta" for _, m in chain):
                from .query.multi import MultiEpochSearcher
                self.multi = MultiEpochSearcher(index_root)
                epoch = chain[-1][0]
            else:
                epoch = latest_epoch(index_root)
        self.epoch = epoch
        if self.multi is None:
            self.searcher = Searcher(index_root, epoch=epoch)
            if warm:
                self.searcher.warm()
        else:
            self.searcher = None
        self.n_queries = 0
        self.started = time.monotonic()

    def handle(self, req: dict) -> dict | None:
        op = req.get("op", "query")
        rid = req.get("id")
        try:
            if op == "quit":
                return None
            if op == "status":
                st = (self.multi.stats if self.multi is not None
                      else self.searcher.stats)
                return {"id": rid, "ok": True, "epoch": self.epoch,
                        "mode": "delta-chain" if self.multi else "single",
                        "n_docs": st["n_docs"],
                        "n_queries": self.n_queries,
                        "uptime_s": round(time.monotonic() - self.started, 3)}
            k = int(req.get("k", 10))
            filters = _norm_filters(req.get("filters"))
            if self.multi is not None and op in ("query", "phrase"):
                self.n_queries += 1
                if op == "phrase":
                    d, sc = self.multi.match_phrase(
                        req["phrase"], k=k, filters=filters,
                        slop=int(req.get("slop", 0)))
                else:
                    d, sc = self.multi.search(req["query"], k=k,
                                              filters=filters)
                hits = [{"doc_id": int(x), "rank": i + 1, "score": float(s)}
                        for i, (x, s) in enumerate(zip(d, sc))]
                fields = req.get("fields")
                if fields and len(d):
                    # re-null: a missing int docvalue arrives float64+NaN
                    # from the shard, and json.dumps(NaN) is invalid JSON
                    fv = {c: _renull_int(v)
                          for c, v in self.multi.get_fields(d, fields).items()}
                    for i, h in enumerate(hits):
                        for c in fields:
                            h[c] = fv[c][i].as_py()
                return {"id": rid, "ok": True, "hits": hits}
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
                d, sc = self.searcher.match_phrase(
                    req["phrase"], k=k, filters=filters,
                    slop=int(req.get("slop", 0)))
                hits = [{"doc_id": int(x), "rank": i + 1, "score": float(s)}
                        for i, (x, s) in enumerate(zip(d, sc))]
                fields = req.get("fields")
                if fields and len(d):
                    fv = {c: _renull_int(v) for c, v in
                          self.searcher.fields.get(d, fields).items()}
                    for i, h in enumerate(hits):
                        for c in fields:
                            h[c] = fv[c][i].as_py()
                return {"id": rid, "ok": True, "hits": hits}
            return {"id": rid, "ok": False, "error": f"unknown op {op!r}"}
        except Exception as e:  # noqa: BLE001 — daemon must not die per-request
            return {"id": rid, "ok": False, "error": repr(e)[:500]}


_ACTOR_CLS = None


def _serve_actor_cls():
    global _ACTOR_CLS
    if _ACTOR_CLS is None:
        import ray

        class _ServeActor:
            def __init__(self, index_root: str, epoch, warm: bool):
                self.sess = ServeSession(index_root, epoch=epoch, warm=warm)

            def ping(self) -> bool:
                return True

            def handle_line(self, line: str):
                line = line.strip()
                if not line:
                    return ""
                try:
                    req = json.loads(line)
                except json.JSONDecodeError as e:
                    return json.dumps({"ok": False, "error": f"bad json: {e}"})
                if req.get("op") == "quit":
                    return None
                return json.dumps(self.sess.handle(req))

        # pure readers of an immutable index: a lost actor (node failure)
        # rebuilds its warmed session and the in-flight call retries —
        # the daemon self-heals instead of dropping requests.
        _ACTOR_CLS = ray.remote(num_cpus=1, max_restarts=4,
                                max_task_retries=4)(_ServeActor)
    return _ACTOR_CLS


class ServePool:
    """Daemon state: warmed sessions constructed at STARTUP (warm cost
    never lands on the first requests), reusable across request streams —
    the daemon analog of the reference's pooled ES clients
    (elastic.cr:62-93).

    - ``pool=1`` (default): serve inline, one warmed Searcher.
    - ``pool>1``: a thread pool of sessions; modest gains only (per-query
      Python dominates small-index queries, GIL-bound).
    - ``actors>0``: the throughput path — N Ray actors each holding a
      warmed Searcher; requests round-robin across actors with pipelined
      dispatch, responses stay in request order.  Requires a Ray session.
    """

    def __init__(self, index_root: str, epoch: int | None = None,
                 warm: bool = True, pool: int = 1, actors: int = 0):
        import queue as _queue
        self._actors = []
        self.pool = max(1, pool)
        if actors:
            import ray
            cls = _serve_actor_cls()
            self._actors = [cls.remote(index_root, epoch, warm)
                            for _ in range(actors)]
            ray.get([a.ping.remote() for a in self._actors])  # warm barrier
            return
        self._free: _queue.SimpleQueue = _queue.SimpleQueue()
        for _ in range(self.pool):
            self._free.put(ServeSession(index_root, epoch=epoch, warm=warm))

    def _one(self, line: str):
        line = line.strip()
        if not line:
            return ""
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            return json.dumps({"ok": False, "error": f"bad json: {e}"})
        if req.get("op") == "quit":
            return None
        s = self._free.get()
        try:
            resp = s.handle(req)
        finally:
            self._free.put(s)
        return json.dumps(resp)

    @staticmethod
    def _truncate_at_quit(chunk: list[str]) -> tuple[list[str], bool]:
        """Cut a chunk at the first quit request so nothing past it is ever
        dispatched (same semantics as the inline path)."""
        for i, line in enumerate(chunk):
            line = line.strip()
            if not line:
                continue
            try:
                if json.loads(line).get("op") == "quit":
                    return chunk[:i], True
            except json.JSONDecodeError:
                continue
        return chunk, False

    def run(self, in_stream, out_stream) -> int:
        served = 0
        if self._actors:
            import itertools
            import ray
            n = len(self._actors)
            lines = iter(in_stream)
            stop = False
            while not stop:
                chunk = list(itertools.islice(lines, 16 * n))
                if not chunk:
                    break
                chunk, stop = self._truncate_at_quit(chunk)
                futs = [self._actors[i % n].handle_line.remote(line)
                        for i, line in enumerate(chunk)]
                for out in ray.get(futs):
                    if out:
                        out_stream.write(out + "\n")
                        served += 1
                out_stream.flush()
            return served
        if self.pool == 1:
            for line in in_stream:
                out = self._one(line)
                if out is None:
                    break
                if out:
                    out_stream.write(out + "\n")
                    out_stream.flush()
                    served += 1
            return served
        import itertools
        from concurrent.futures import ThreadPoolExecutor
        stop = False
        with ThreadPoolExecutor(max_workers=self.pool) as ex:
            lines = iter(in_stream)
            while not stop:
                chunk = list(itertools.islice(lines, 4 * self.pool))
                if not chunk:
                    break
                chunk, stop = self._truncate_at_quit(chunk)
                for out in ex.map(self._one, chunk):
                    if out:
                        out_stream.write(out + "\n")
                        served += 1
                out_stream.flush()
        return served


def serve_loop(index_root: str, in_stream, out_stream,
               epoch: int | None = None, warm: bool = True,
               pool: int = 1) -> int:
    """Blocking request loop; returns the number of requests served."""
    return ServePool(index_root, epoch=epoch, warm=warm,
                     pool=pool).run(in_stream, out_stream)
