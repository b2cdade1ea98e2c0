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
