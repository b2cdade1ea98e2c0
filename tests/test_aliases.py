"""Index aliases: atomic name→root indirection + zero-downtime flip."""

import json
import os

import pytest

from search_ingest_ray import aliases
from search_ingest_ray.cli import main as cli_main
from search_ingest_ray.query.searcher import Searcher


@pytest.fixture()
def registry(tmp_path):
    return str(tmp_path / "reg")


def test_set_resolve_flip_drop(registry, tmp_path):
    a = str(tmp_path / "index_a")
    b = str(tmp_path / "index_b")
    aliases.set_alias("docs", a, registry_dir=registry)
    assert aliases.resolve(f"alias:docs@{registry}") == os.path.abspath(a)
    # atomic flip: same alias now points at b
    aliases.set_alias("docs", b, registry_dir=registry)
    assert aliases.resolve(f"alias:docs@{registry}") == os.path.abspath(b)
    assert aliases.list_aliases(registry) == {"docs": os.path.abspath(b)}
    aliases.drop_alias("docs", registry_dir=registry)
    with pytest.raises(KeyError):
        aliases.resolve(f"alias:docs@{registry}")
    # plain paths pass through untouched
    assert aliases.resolve("/some/real/path") == "/some/real/path"


def test_searcher_opens_via_alias_and_sees_flip(ray_session, sf_dir,
                                                registry):
    from search_ingest_ray.pipelines.flagship import documents_index
    root = documents_index(sf_dir, analyzer="simple")
    aliases.set_alias("flag", root, registry_dir=registry)
    via_alias = Searcher(f"alias:flag@{registry}")
    direct = Searcher(root)
    d1, s1 = via_alias.search_terms(["merge", "scan"], k=5)
    d2, s2 = direct.search_terms(["merge", "scan"], k=5)
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    assert via_alias.index_root == root
    # flip to a second (positional) build of the same corpus: a NEW open
    # resolves the new target; the old handle keeps serving the old root
    root2 = documents_index(sf_dir, analyzer="simple", with_positions=True)
    aliases.set_alias("flag", root2, registry_dir=registry)
    reopened = Searcher(f"alias:flag@{registry}")
    assert reopened.index_root == root2
    assert via_alias.index_root == root


def test_cli_alias_roundtrip(registry, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    assert cli_main(["alias", "set", "docs", idx,
                     "--registry", registry]) == 0
    assert cli_main(["alias", "list", "--registry", registry]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {"docs": os.path.abspath(idx)}
    assert cli_main(["alias", "drop", "docs", "--registry", registry]) == 0
    assert cli_main(["alias", "list", "--registry", registry]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {}
