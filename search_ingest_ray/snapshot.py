"""Index snapshot / restore — the ES ``_snapshot`` repository API analog.

A snapshot copies one committed epoch's on-disk state (segments, docvalues
sidecar, stats/manifest) plus the index's ``index_meta.json`` into a
repository directory, recording every file with size + blake2b-128
checksum in a snapshot manifest.  Restore verifies every checksum while
copying back, then the restored index serves queries bit-identically
(proven in ``tests/test_snapshot.py``).

Layout::

    <repo>/<name>/snapshot.json      # manifest: files, checksums, stats
    <repo>/<name>/files/<relpath>    # verbatim epoch + meta files

Write is atomic (temp dir + rename), so a crashed snapshot never leaves a
listable half-snapshot.  At scale the per-file copy fans out trivially
(one Ray task per term partition — files are independent); kept
sequential here where indexes are MBs.  The reference delegates backup to
Elasticsearch itself; this is the engine-native equivalent.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from .util import read_json

_BUF = 1 << 20


def _file_hash(path: str) -> str:
    h = hashlib.blake2b(digest_size=16)
    with open(path, "rb") as f:
        while True:
            b = f.read(_BUF)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _epoch_dir(index_root: str, epoch: int) -> str:
    return os.path.join(index_root, "epochs", f"e{epoch:04d}")


def _committed_epochs(index_root: str) -> list[int]:
    """Every epoch with a committed manifest, ascending."""
    base = os.path.join(index_root, "epochs")
    out = []
    if not os.path.isdir(base):
        return out
    for d in sorted(os.listdir(base)):
        mp = os.path.join(base, d, "manifest.json")
        if (d.startswith("e") and os.path.exists(mp)
                and read_json(mp).get("status") == "done"):
            out.append(int(d[1:]))
    return out


def snapshot(index_root: str, repo_dir: str, name: str,
             epoch: int | None = None) -> dict:
    """Copy committed epochs + index meta into ``repo_dir/name``.  By
    default EVERY committed epoch is captured (a delta-chain index is a
    chain — restoring only its head would silently drop history);
    ``epoch`` pins a single one.  Refuses uncommitted epochs and
    duplicate names."""
    epochs = [epoch] if epoch is not None else _committed_epochs(index_root)
    if not epochs:
        raise RuntimeError("no committed epochs to snapshot")
    for ep in epochs:
        man = read_json(os.path.join(_epoch_dir(index_root, ep),
                                     "manifest.json"))
        if man.get("status") != "done":
            raise RuntimeError(f"epoch {ep} not committed; cannot snapshot")
    dest = os.path.join(repo_dir, name)
    if os.path.exists(dest):
        raise FileExistsError(f"snapshot {name!r} already exists")
    tmp = dest + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    files = {}
    # every file under each epoch dir, plus the index-level meta
    for ep in epochs:
        ed = _epoch_dir(index_root, ep)
        for dirpath, _dirs, names in sorted(os.walk(ed)):
            for fn in sorted(names):
                src = os.path.join(dirpath, fn)
                rel = os.path.join(f"epochs/e{ep:04d}",
                                   os.path.relpath(src, ed))
                files[rel] = src
    meta_src = os.path.join(index_root, "index_meta.json")
    if os.path.exists(meta_src):
        files["index_meta.json"] = meta_src
    manifest = {"name": name, "epochs": epochs, "files": {}}
    for rel, src in files.items():
        out = os.path.join(tmp, "files", rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copyfile(src, out)
        manifest["files"][rel] = {"bytes": os.path.getsize(out),
                                  "blake2b": _file_hash(out)}
    with open(os.path.join(tmp, "snapshot.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.makedirs(repo_dir, exist_ok=True)
    os.rename(tmp, dest)
    return manifest


def list_snapshots(repo_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(repo_dir):
        return out
    for name in sorted(os.listdir(repo_dir)):
        mp = os.path.join(repo_dir, name, "snapshot.json")
        if os.path.exists(mp):
            m = read_json(mp)
            out.append({"name": m["name"],
                        "epochs": m.get("epochs", [m.get("epoch", 0)]),
                        "n_files": len(m["files"]),
                        "bytes": sum(f["bytes"]
                                     for f in m["files"].values())})
    return out


def restore(repo_dir: str, name: str, index_root: str) -> dict:
    """Rebuild ``index_root`` from a snapshot, verifying every file's
    checksum; raises on any corruption, restoring nothing partial (stage
    to a temp dir first)."""
    src_root = os.path.join(repo_dir, name)
    manifest = read_json(os.path.join(src_root, "snapshot.json"))
    tmp = index_root + ".restore-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for rel, info in manifest["files"].items():
        src = os.path.join(src_root, "files", rel)
        got = _file_hash(src)
        if got != info["blake2b"]:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"snapshot {name!r} corrupt: {rel} checksum "
                f"{got} != {info['blake2b']}")
        out = os.path.join(tmp, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copyfile(src, out)
    shutil.rmtree(index_root, ignore_errors=True)
    os.rename(tmp, index_root)
    return manifest
