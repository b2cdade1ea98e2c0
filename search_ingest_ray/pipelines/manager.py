"""Multi-table orchestration — the analog of the reference's TableManager
(/root/reference/src/search-ingest/table_manager.cr).

The reference runs one ``Table`` per managed model and fans work out with
``Promise.map(tables, &.backfill/reindex)`` (table_manager.cr:75-94), with a
startup state machine (initialise_indices → watch → load_complete,
table_manager.cr:31-61) and a consistency check that triggers reindex-all
when any mapping drifts (table_manager.cr:66-73).

Ray-native: each table is an independent Dataset pipeline; concurrent
tables are driven from a thread pool (each thread drives its own streaming
execution; Ray schedules them jointly with backpressure).  Consistency =
the per-index ``index_meta.json`` fingerprint check inside build_index.
"""

from __future__ import annotations

import importlib
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from ..index.build import build_index, reindex
from ..util import read_json

# -- lazy-import warm-up -----------------------------------------------------
# Concurrent first-builds used to race Ray Data's lazily-imported reader
# machinery (fsspec / pyarrow.fs / the parquet datasource): thread A begins
# importing a module, thread B observes the partially-initialised module in
# sys.modules and raises ImportError.  CPython's per-module import locks do
# not protect attribute access on a module mid-initialisation via lazy
# `__getattr__` hooks.  Root-cause fix: import the whole reader dependency
# chain ONCE, serialized behind a lock, before any thread pool fans out.

_WARM_LOCK = threading.Lock()
_WARMED = False

_LAZY_MODULES = (
    "fsspec",
    "fsspec.implementations.local",
    "pyarrow.fs",
    "pyarrow.dataset",
    "pyarrow.parquet",
    "pandas",
    "ray.data",
    "ray.data._internal.datasource.parquet_datasource",
    "ray.data._internal.datasource.parquet_datasink",
    "ray.data._internal.arrow_block",
    "ray.data._internal.planner",
)


def warm_lazy_imports() -> None:
    """Eagerly import every module the build path touches lazily, once per
    process.  Safe to call from any thread; idempotent."""
    global _WARMED
    if _WARMED:
        return
    with _WARM_LOCK:
        if _WARMED:
            return
        for mod in _LAZY_MODULES:
            try:
                importlib.import_module(mod)
            except ImportError:
                # module path moved between Ray versions — the ones that
                # exist still cover the chain; missing ones are harmless
                pass
        # fsspec.implementations.http cannot import in this env (no
        # aiohttp), and a FAILED import is evicted from sys.modules — so
        # Ray's per-read `_is_http_filesystem` probe re-executes the module
        # import every time, and two threads doing it concurrently can
        # surface a partially-initialised module as a plain ImportError
        # ("cannot import name HTTPFileSystem"), which Ray's
        # ModuleNotFoundError handler does not catch.  Pin a stub with a
        # never-instantiated HTTPFileSystem class so the probe import
        # succeeds deterministically and its isinstance() is always False.
        try:
            importlib.import_module("fsspec.implementations.http")
        except ImportError:
            import sys
            import types

            class _NoHTTPFileSystem:   # never instantiated in-process
                pass

            stub = types.ModuleType("fsspec.implementations.http")
            stub.HTTPFileSystem = _NoHTTPFileSystem
            sys.modules["fsspec.implementations.http"] = stub
        _WARMED = True


@dataclass
class ManagedTable:
    """One managed table → one index (the MANAGED_TABLES entry analog,
    /root/reference/src/config.cr:10-41)."""
    name: str
    input_paths: object           # str dir or list of parquet files
    build_kwargs: dict = field(default_factory=dict)


class TableManager:
    def __init__(self, index_base: str, tables: list[ManagedTable],
                 max_concurrent: int = 4):
        self.index_base = index_base
        self.tables = {t.name: t for t in tables}
        self.max_concurrent = max_concurrent
        self.load_state: str = "pending"   # pending → loading → complete/error
        self.load_error: Exception | None = None

    def index_root(self, table: str) -> str:
        return os.path.join(self.index_base, table)

    # -- lifecycle (table_manager.cr:75-94 analogs) --------------------------

    def backfill_all(self, epoch: int = 0) -> dict[str, dict]:
        """All tables concurrently; all-success aggregation — a failed table
        raises after the others finish (vs the reference's boolean)."""
        self.load_state = "loading"
        warm_lazy_imports()   # serialize lazy reader imports BEFORE fan-out
        results: dict[str, dict] = {}
        errors: dict[str, Exception] = {}

        def one(t: ManagedTable):
            # warm_lazy_imports() removes the known import race; keep a
            # belt-and-braces retry for any residual lazy import, serialized
            # behind the warm lock and preserving the real exception
            last: Exception | None = None
            for attempt in range(3):
                try:
                    results[t.name] = build_index(
                        t.input_paths, self.index_root(t.name), epoch=epoch,
                        **t.build_kwargs)
                    return
                except ImportError as e:
                    last = e
                    with _WARM_LOCK:     # let any in-flight import settle
                        time.sleep(0.2 * (attempt + 1))
                except Exception as e:  # noqa: BLE001 — aggregated below
                    errors[t.name] = e
                    return
            errors[t.name] = last if last is not None else RuntimeError(
                "backfill retries exhausted")

        with ThreadPoolExecutor(max_workers=self.max_concurrent) as ex:
            list(ex.map(one, self.tables.values()))
        if errors:
            self.load_state = "error"
            self.load_error = next(iter(errors.values()))
            raise RuntimeError(
                f"backfill failed for {sorted(errors)}: "
                f"{ {k: repr(v)[:300] for k, v in errors.items()} }"
            ) from self.load_error
        self.load_state = "complete"
        return results

    def reindex_all(self, epoch: int = 0) -> None:
        for name in self.tables:
            reindex(self.index_root(name), epoch=epoch)

    def watch_all(self, feed_base: str, *, poll_sec: float = 0.2,
                  max_epochs: int | None = None, stop_when=None,
                  mode: str = "delta",
                  table_kwargs: dict | None = None) -> dict[str, list[dict]]:
        """Tail one changefeed directory PER managed table, concurrently —
        the engine analog of the reference's per-table watch fan-out
        (table_manager.cr:31-61 spawns one watch fiber per Table over its
        own RethinkDB changefeed).

        Layout: ``feed_base/<table>/delta-eNNNN.parquet`` (producers
        should publish via :func:`..pipelines.epochs.publish_epoch`, whose
        fsync+rename barrier guarantees watchers never see a torn file).
        Each table's epochs apply strictly in per-table order; cross-table
        order is unconstrained (matching the reference, where feeds are
        independent).  The fan-out is RESUMABLE per table: each watcher
        resumes after its own committed chain head, so a restart — of one
        table's watcher or the whole manager — continues exactly where it
        stopped.  ``max_epochs``/``stop_when`` apply per table.

        Returns {table: applied epoch manifests}; a failed table raises
        after the others stop (all-success aggregation, as backfill_all)."""
        from .epochs import watch_deltas
        warm_lazy_imports()
        table_kwargs = table_kwargs or {}
        results: dict[str, list] = {}
        errors: dict[str, Exception] = {}

        def one(name: str):
            try:
                results[name] = watch_deltas(
                    self.index_root(name), os.path.join(feed_base, name),
                    poll_sec=poll_sec, max_epochs=max_epochs,
                    stop_when=stop_when, mode=mode,
                    **table_kwargs.get(name, {}))
            except Exception as e:  # noqa: BLE001 — aggregated below
                errors[name] = e

        with ThreadPoolExecutor(
                max_workers=max(len(self.tables), 1)) as ex:
            list(ex.map(one, self.tables))
        if errors:
            raise RuntimeError(
                f"watch failed for {sorted(errors)}: "
                f"{ {k: repr(v)[:300] for k, v in errors.items()} }"
            ) from next(iter(errors.values()))
        return results

    def consistent_indices(self) -> bool:
        """True when every table has a committed epoch manifest — the
        rebuild-vs-resume decision input (table.cr:190-204 analog; mapping
        drift itself is detected inside build_index via the meta
        fingerprint)."""
        for name in self.tables:
            mp = os.path.join(self.index_root(name), "epochs", "e0000",
                              "manifest.json")
            if not (os.path.exists(mp)
                    and read_json(mp).get("status") == "done"):
                return False
        return True

    def load_success(self) -> bool:
        return self.load_state == "complete"

    # -- health / heal (G10: failed→healed auto-backfill, api.cr:74-115) -----

    def health(self) -> dict[str, dict]:
        """Per-table health: does a committed epoch manifest exist?"""
        out = {}
        for name in self.tables:
            mp = os.path.join(self.index_root(name), "epochs", "e0000",
                              "manifest.json")
            ok = os.path.exists(mp) and read_json(mp).get("status") == "done"
            out[name] = {"healthy": bool(ok)}
        return out

    def heal(self, epoch: int = 0) -> list[str]:
        """Backfill ONLY the unhealthy tables (the reference's healthcheck
        re-creates missing/failed indices then backfills them,
        api.cr:74-115).  Returns the healed table names."""
        sick = [n for n, h in self.health().items() if not h["healthy"]]
        if not sick:
            return []
        sub = TableManager(self.index_base,
                           [self.tables[n] for n in sick],
                           max_concurrent=self.max_concurrent)
        sub.backfill_all(epoch=epoch)
        return sick
