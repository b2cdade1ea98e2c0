"""Snapshot/restore: bit-identical query results after delete + restore,
checksum verification catches corruption, atomicity of half-snapshots."""

import os
import shutil

import pytest

from search_ingest_ray.corpus import query_set
from search_ingest_ray.index.build import build_index
from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.snapshot import list_snapshots, restore, snapshot


@pytest.fixture(scope="module")
def snap_index(ray_session, corpus_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("snapidx"))
    build_index(corpus_dir, root, html_col="html", chunk_files=2,
                num_term_partitions=4)
    return root


def _topk(root, k=10):
    s = Searcher(root)
    out = []
    for terms in query_set(seed=5, n=8):
        d, sc = s.search_terms(list(terms), k=k)
        out.append((list(map(int, d)), list(map(float, sc))))
    return out


def test_snapshot_restore_bit_identical(snap_index, tmp_path):
    repo = str(tmp_path / "repo")
    before = _topk(snap_index)
    man = snapshot(snap_index, repo, "s1")
    assert man["files"] and all(v["bytes"] >= 0
                                for v in man["files"].values())
    ls = list_snapshots(repo)
    assert [s["name"] for s in ls] == ["s1"] and ls[0]["n_files"] > 3
    shutil.rmtree(snap_index)               # simulate total index loss
    restore(repo, "s1", snap_index)
    assert _topk(snap_index) == before      # scores bit-identical


def test_snapshot_refuses_duplicate_and_lists(snap_index, tmp_path):
    repo = str(tmp_path / "repo2")
    snapshot(snap_index, repo, "a")
    with pytest.raises(FileExistsError):
        snapshot(snap_index, repo, "a")


def test_restore_detects_corruption(snap_index, tmp_path):
    repo = str(tmp_path / "repo3")
    man = snapshot(snap_index, repo, "c")
    victim = next(r for r in man["files"] if r.endswith("postings.bin"))
    vpath = os.path.join(repo, "c", "files", victim)
    with open(vpath, "r+b") as f:
        f.seek(0)
        b = f.read(1)
        f.seek(0)
        f.write(bytes([b[0] ^ 0xFF]))
    dest = str(tmp_path / "restored")
    with pytest.raises(RuntimeError, match="corrupt"):
        restore(repo, "c", dest)
    assert not os.path.exists(dest)         # nothing partial left behind


def test_cli_snapshot_roundtrip(snap_index, tmp_path, capsys):
    from search_ingest_ray.cli import main
    repo = str(tmp_path / "repocli")
    assert main(["snapshot", "create", repo, "cliSnap", snap_index]) == 0
    assert main(["snapshot", "list", repo]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert '"cliSnap"' in out[0] and "cliSnap" in out[1]
    dest = str(tmp_path / "restored_cli")
    assert main(["snapshot", "restore", repo, "cliSnap", dest]) == 0
    assert _topk(dest) == _topk(snap_index)
    assert main(["snapshot", "create", repo]) == 2   # missing operands


def test_snapshot_captures_whole_epoch_chain(snap_index, tmp_path):
    import json
    # simulate a committed second epoch (delta-chain head)
    e0 = os.path.join(snap_index, "epochs", "e0000")
    e1 = os.path.join(snap_index, "epochs", "e0001")
    shutil.copytree(e0, e1)
    repo = str(tmp_path / "repo4")
    man = snapshot(snap_index, repo, "chain")
    assert man["epochs"] == [0, 1]
    assert any(r.startswith("epochs/e0001/") for r in man["files"])
    dest = str(tmp_path / "chainrestored")
    restore(repo, "chain", dest)
    assert os.path.exists(os.path.join(dest, "epochs", "e0001",
                                       "manifest.json"))
    assert _topk(dest) == _topk(snap_index)
    shutil.rmtree(e1)   # leave the module-scoped fixture as it was
