"""HTTP service surface — the reference's management-over-HTTP shape
(/root/reference/src/api.cr:25-90, OPENAPI_DOC.yml:8-55) over the Ray
engine: reindex / backfill / readiness / health as remote calls, plus the
query protocol of :mod:`serve` as POST routes.

Routes (base ``/api/search-ingest/v1``, mirroring api.cr):

- ``POST /reindex[?backfill=true]`` — drop every managed table's epoch
  data (keep mappings), then backfill unless ``backfill=false``
  (api.cr:25-35).
- ``POST /backfill`` — backfill all managed tables (api.cr:37-40).
- ``GET  /version`` — service build info (api.cr:42-51).
- ``GET  /ready`` — 200 once startup load completed, else 503
  (api.cr:57-61).
- ``GET  /`` — health check; on the first healthy response after a failure
  it spawns a background heal-backfill of the sick tables, mirroring the
  reference's failed→healed recovery (api.cr:73-89 / G10).
- ``POST /query/<table>`` / ``POST /phrase/<table>`` — engine-native BM25 /
  phrase top-k over a managed table's index (body = the
  :class:`~search_ingest_ray.serve.ServeSession` request JSON).  The
  reference delegates queries to Elasticsearch; here the engine owns
  scoring, so the service exposes them directly.

Built on the stdlib ``ThreadingHTTPServer`` — one warmed
:class:`ServeSession` per table (created lazily, reused across requests,
invalidated by reindex/backfill), management calls drive the
:class:`~search_ingest_ray.pipelines.manager.TableManager`.  Ray must
already be initialised by the process that owns the server (the CLI
``http`` command or the tests' session fixture) — this module never calls
``ray.init``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .pipelines.manager import TableManager
from .serve import ServeSession

BASE = "/api/search-ingest/v1"
VERSION = "1.0.0"


class SearchIngestService:
    """Service state shared across request threads."""

    def __init__(self, manager: TableManager):
        self.manager = manager
        self.failed_healthcheck = False
        self._sessions: dict[str, ServeSession] = {}
        self._lock = threading.Lock()

    # -- sessions ------------------------------------------------------------

    def session(self, table: str) -> ServeSession:
        with self._lock:
            s = self._sessions.get(table)
        if s is not None:
            return s
        if table not in self.manager.tables:
            raise KeyError(f"unknown table {table!r}")
        # build (warm) the session OUTSIDE the lock — a cold multi-second
        # load must not block other tables' cached-session queries; a
        # concurrent duplicate load just loses the install race harmlessly
        s = ServeSession(self.manager.index_root(table))
        with self._lock:
            return self._sessions.setdefault(table, s)

    def invalidate_sessions(self) -> None:
        with self._lock:
            self._sessions.clear()

    # -- management (api.cr analogs) -----------------------------------------

    def reindex(self, backfill: bool = True) -> None:
        self.manager.reindex_all()
        if backfill:
            self.manager.backfill_all()
        self.invalidate_sessions()

    def backfill(self) -> None:
        self.manager.backfill_all()
        self.invalidate_sessions()

    def ready(self) -> bool:
        return self.manager.load_success()

    def healthy(self) -> bool:
        return all(h["healthy"] for h in self.manager.health().values())

    def health_index(self) -> tuple[int, dict]:
        """GET / semantics (api.cr:73-89): 200 while still loading; on the
        first healthy check after a failure, heal asynchronously."""
        if not self.manager.load_success():
            return 200, {"status": "loading"}
        if self.healthy():
            if self.failed_healthcheck:
                self.failed_healthcheck = False
                t = threading.Thread(target=self._heal, daemon=True)
                t.start()
            return 200, {"status": "ok"}
        self.failed_healthcheck = True
        return 500, {"status": "unhealthy",
                     "tables": self.manager.health()}

    def _heal(self) -> None:
        try:
            self.manager.heal()
            self.invalidate_sessions()
        except Exception:  # noqa: BLE001 — async heal is best-effort
            pass


class _Handler(BaseHTTPRequestHandler):
    service: SearchIngestService  # set by make_server

    # quiet request logging (daemon)
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    def _send(self, code: int, payload: dict | None = None) -> None:
        body = json.dumps(payload if payload is not None else {}).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _route(self, path: str) -> str | None:
        if path == BASE or path == BASE + "/":
            return "/"
        if path.startswith(BASE + "/"):
            return path[len(BASE):]
        return None

    def do_GET(self):  # noqa: N802 — http.server API
        u = urlparse(self.path)
        route = self._route(u.path)
        svc = self.service
        try:
            if route == "/":
                code, payload = svc.health_index()
                self._send(code, payload)
            elif route == "/ready":
                if svc.ready():
                    self._send(200, {"ready": True})
                else:
                    self._send(503, {"ready": False,
                                     "error": "startup has not completed"})
            elif route == "/version":
                self._send(200, {"version": VERSION, "service":
                                 "search-ingest-ray", "build_time": "",
                                 "commit": ""})
            else:
                self._send(404, {"error": "not found"})
        except Exception as e:  # noqa: BLE001 — service must not die
            self._send(500, {"error": repr(e)[:500]})

    def do_POST(self):  # noqa: N802 — http.server API
        u = urlparse(self.path)
        route = self._route(u.path)
        qs = parse_qs(u.query)
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        svc = self.service
        try:
            body = json.loads(raw) if raw else {}
        except json.JSONDecodeError:
            self._send(400, {"error": "invalid JSON body"})
            return
        try:
            if route == "/reindex":
                backfill = qs.get("backfill", ["true"])[0].lower() != "false"
                svc.reindex(backfill=backfill)
                self._send(200, {"ok": True})
            elif route == "/backfill":
                svc.backfill()
                self._send(200, {"ok": True})
            elif route and (route.startswith("/query/")
                            or route.startswith("/phrase/")):
                op, _, table = route[1:].partition("/")
                try:
                    sess = svc.session(table)
                except KeyError as e:
                    # ONLY the unknown-table lookup is a routing 404 — a
                    # KeyError from handler internals must surface as 500
                    self._send(404, {"error": str(e)})
                    return
                resp = sess.handle({**body, "op": op})
                self._send(200 if resp.get("ok") else 400, resp)
            else:
                self._send(404, {"error": "not found"})
        except Exception as e:  # noqa: BLE001 — service must not die
            self._send(500, {"error": repr(e)[:500]})


def make_server(manager: TableManager, host: str = "127.0.0.1",
                port: int = 0) -> tuple[ThreadingHTTPServer,
                                        SearchIngestService]:
    """Build (but do not start) the HTTP server; ``port=0`` picks a free
    port (``server.server_address[1]``).  Call ``serve_forever()`` in a
    thread, ``shutdown()`` to stop."""
    svc = SearchIngestService(manager)
    handler = type("_BoundHandler", (_Handler,), {"service": svc})
    srv = ThreadingHTTPServer((host, port), handler)
    return srv, svc
