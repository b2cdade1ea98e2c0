"""Upsert/delete fold (E9) + parent-child replication (E8) tests —
mirroring /root/reference/spec/elastic_spec.cr and table_spec.cr semantics."""

import pandas as pd
import pyarrow as pa
import pytest

from search_ingest_ray.schemas import ParentRelation, TableConfig
from search_ingest_ray.stages.fold import apply_epoch, fold_last_write_wins
from search_ingest_ray.stages.replicate import make_replicator, replicate


@pytest.fixture
def rd(ray_session):
    import ray.data as rd
    return rd


def test_fold_last_write_wins(rd):
    ds = rd.from_items([
        {"id": "a", "epoch": 0, "v": 1, "action": "created"},
        {"id": "a", "epoch": 2, "v": 3, "action": "updated"},
        {"id": "a", "epoch": 1, "v": 2, "action": "updated"},
        {"id": "b", "epoch": 0, "v": 9, "action": "created"},
    ])
    out = fold_last_write_wins(ds, "id", ["epoch"], "action").to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    assert out["v"].tolist() == [3, 9]


def test_fold_tombstone_drops_doc(rd):
    ds = rd.from_items([
        {"id": "a", "epoch": 0, "action": "created"},
        {"id": "a", "epoch": 1, "action": "deleted"},
        {"id": "b", "epoch": 0, "action": "created"},
    ])
    out = fold_last_write_wins(ds, "id", ["epoch"], "action").to_pandas()
    assert out["id"].tolist() == ["b"]


def test_apply_epoch_idempotent(rd):
    """Replaying an epoch changes nothing (doc_as_upsert analog,
    /root/reference/src/search-ingest/elastic.cr:431-449)."""
    base = rd.from_items([{"id": "a", "v": 1}, {"id": "b", "v": 2}])
    delta = rd.from_items([
        {"id": "a", "v": 10, "epoch": 0, "action": "updated"},
        {"id": "c", "v": 30, "epoch": 0, "action": "created"},
    ])
    once = apply_epoch(base, delta, "id").to_pandas().sort_values("id")
    base2 = rd.from_items(once[["id", "v"]].to_dict("records"))
    twice = apply_epoch(base2, delta, "id").to_pandas().sort_values("id")
    assert once[["id", "v"]].values.tolist() == twice[["id", "v"]].values.tolist()
    assert once["v"].tolist() == [10, 2, 30]


COFFEE_CFG = TableConfig(
    "coffee", id_field="id", doc_type="Coffee",
    parents=[ParentRelation("Programmer", "programmer", "programmer_id")])

SELFREF_CFG = TableConfig(
    "selfref", id_field="id", doc_type="SelfRef",
    parents=[ParentRelation("SelfRef", "selfref", "parent_id")])


def test_child_replicated_to_parent_index():
    """Child doc → own index routed by own id (no join) + parent index
    routed by parent id with join (spec/elastic_spec.cr:79-135)."""
    batch = pa.table({"id": ["c1"], "programmer_id": ["p9"]})
    out = make_replicator(COFFEE_CFG)(batch).to_pylist()
    assert len(out) == 2
    own = next(r for r in out if r["target_index"] == "coffee")
    rep = next(r for r in out if r["target_index"] == "programmer")
    assert own["route"] == "c1" and own["join_name"] is None
    assert rep["route"] == "p9" and rep["join_name"] == "Coffee"
    assert rep["join_parent"] == "p9" and rep["doc_type"] == "Coffee"


def test_empty_parent_id_skips_replication():
    # elastic.cr:263, 322
    batch = pa.table({"id": ["c1", "c2"], "programmer_id": ["", None]})
    out = make_replicator(COFFEE_CFG)(batch).to_pylist()
    assert {r["target_index"] for r in out} == {"coffee"}
    assert len(out) == 2


def test_self_referential_single_write():
    """Docs with a parent in a self-referential table are written ONCE
    (routed by parent), not twice (skip_replication?, elastic.cr:214-218,
    spec/elastic_spec.cr:25-77)."""
    batch = pa.table({"id": ["r", "k"], "parent_id": [None, "r"]})
    out = make_replicator(SELFREF_CFG)(batch).to_pylist()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r)
    # root: one plain copy routed by own id
    assert len(by_id["r"]) == 1 and by_id["r"][0]["route"] == "r"
    assert by_id["r"][0]["join_name"] is None
    # child: exactly one copy, routed by parent, with join
    assert len(by_id["k"]) == 1
    assert by_id["k"][0]["route"] == "r"
    assert by_id["k"][0]["join_name"] == "SelfRef"


def test_replicate_dataset_counts(rd):
    ds = rd.from_items([{"id": str(i), "programmer_id": f"p{i % 3}"}
                        for i in range(30)])
    out = replicate(ds, COFFEE_CFG)
    assert out.count() == 60  # every row fans out to own + parent
