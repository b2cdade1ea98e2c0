"""Index aliases: atomic name → index-root indirection (ES aliases).

The reference's reindex flow (rebuild, then cut clients over) maps to
ES's zero-downtime pattern: clients address an ALIAS, a rebuild lands in
a fresh index root, and one atomic alias flip moves all traffic — no
client ever sees a half-built index (/root/reference/src/search-ingest/
elastic.cr reindex + the ES alias-swap idiom it leans on).

Storage is one JSON file per registry (``aliases.json`` under a registry
dir), written atomically (``util.atomic_write_json``: temp file +
rename), so a reader either sees the old mapping or the new one.  Every
entry point that takes an ``index_root`` also accepts ``alias:NAME``
(optionally ``alias:NAME@/registry/dir``) and resolves it here at open
time — a long-lived server re-resolves on reopen, which is exactly the
swap boundary ES gives.
"""

from __future__ import annotations

import fcntl
import os
from contextlib import contextmanager

from .util import atomic_write_json, read_json

_DEFAULT_REGISTRY = "/tmp/search_ingest_ray_cache"
_PREFIX = "alias:"


def _path(registry_dir: str | None) -> str:
    return os.path.join(registry_dir or _DEFAULT_REGISTRY, "aliases.json")


def list_aliases(registry_dir: str | None = None) -> dict[str, str]:
    p = _path(registry_dir)
    return read_json(p) if os.path.exists(p) else {}


@contextmanager
def _locked(registry_dir: str | None):
    """Exclusive writer lock for the registry's read-modify-write.

    The temp-file+rename in ``atomic_write_json`` protects READERS (they
    see old-or-new, never partial); two concurrent writers would still
    each read the same snapshot and the last rename would drop the other
    writer's change.  An flock on a sidecar keeps set/drop serialized —
    readers never take the lock, so resolution stays lock-free."""
    d = registry_dir or _DEFAULT_REGISTRY
    os.makedirs(d, exist_ok=True)
    fd = os.open(os.path.join(d, "aliases.lock"), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        os.close(fd)  # closing releases the flock


def set_alias(alias: str, index_root: str,
              registry_dir: str | None = None) -> None:
    """Point ``alias`` at ``index_root`` (atomic swap: readers see either
    the previous target or this one, never a partial state; concurrent
    writers serialize on the registry lock)."""
    if alias.startswith(_PREFIX):
        raise ValueError("alias name must not carry the 'alias:' prefix")
    with _locked(registry_dir):
        cur = list_aliases(registry_dir)
        cur[alias] = os.path.abspath(index_root)
        atomic_write_json(_path(registry_dir), cur)


def drop_alias(alias: str, registry_dir: str | None = None) -> None:
    with _locked(registry_dir):
        cur = list_aliases(registry_dir)
        if alias in cur:
            del cur[alias]
            atomic_write_json(_path(registry_dir), cur)


def resolve(index_root_or_alias: str) -> str:
    """Resolve ``alias:NAME`` (or ``alias:NAME@/registry/dir``) to its
    index root; plain paths pass through unchanged.  Raises KeyError for
    an unknown alias — callers treat that like a missing index."""
    s = index_root_or_alias
    if not s.startswith(_PREFIX):
        return s
    name = s[len(_PREFIX):]
    registry = None
    if "@" in name:
        name, registry = name.split("@", 1)
    table = list_aliases(registry)
    if name not in table:
        raise KeyError(
            f"unknown index alias {name!r} in {_path(registry)}")
    return table[name]
