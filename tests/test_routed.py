"""Queryable parent-child routed indexes: build + has_child/has_parent.

Mirrors the reference's join-field integration coverage
(/root/reference/spec/elastic_spec.cr:79-135): children replicated into the
parent index are queryable by parent predicate and vice versa."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from search_ingest_ray.pipelines.routed import (
    build_routed_indexes, has_child, has_parent,
)
from search_ingest_ray.schemas import ParentRelation, TableConfig


@pytest.fixture(scope="module")
def routed_root(ray_session, tmp_path_factory):
    import ray.data as rd
    root = str(tmp_path_factory.mktemp("routed"))
    parents = rd.from_arrow(pa.table({
        "p_id": pa.array([1, 2, 3], pa.int64()),
        "segment": ["gold", "silver", "gold"],
    }))
    children = rd.from_arrow(pa.table({
        "c_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "parent_id": pa.array([1, 1, 2, 3, None], pa.int64()),
        "amount": pa.array([5.0, 50.0, 70.0, 10.0, 99.0]),
    }))
    build_routed_indexes({
        "parents": (parents, TableConfig("parents", id_field="p_id",
                                         doc_type="Parent")),
        "children": (children, TableConfig(
            "children", id_field="c_id", doc_type="Child",
            parents=[ParentRelation("Parent", "parents", "parent_id")])),
    }, root)
    return root


def test_has_child_all(routed_root):
    out = has_child(routed_root, "parents", "Child")
    routes = sorted(r["route"] for r in out.take_all())
    assert routes == ["1", "2", "3"]  # c14 has no parent → not replicated


def test_has_child_filtered(routed_root):
    out = has_child(routed_root, "parents", "Child",
                    child_filter=lambda t: pc.greater(t["amount"],
                                                      pa.scalar(40.0)))
    routes = sorted(r["route"] for r in out.take_all())
    assert routes == ["1", "2"]


def test_has_parent_broadcast(routed_root):
    out = has_parent(routed_root, "parents", "Parent", "Child",
                     parent_filter=lambda t: pc.equal(t["segment"],
                                                      pa.scalar("gold")))
    rows = sorted(r["c_id"] for r in out.take_all())
    assert rows == [10, 11, 13]  # children of parents 1 and 3


def test_has_parent_join_equals_broadcast(routed_root):
    flt = lambda t: pc.equal(t["segment"], pa.scalar("gold"))  # noqa: E731
    b = sorted(r["c_id"] for r in has_parent(
        routed_root, "parents", "Parent", "Child",
        parent_filter=flt, broadcast=True).take_all())
    j = sorted(r["c_id"] for r in has_parent(
        routed_root, "parents", "Parent", "Child",
        parent_filter=flt, broadcast=False).take_all())
    assert b == j == [10, 11, 13]


def test_has_parent_no_filter_returns_all_children(routed_root):
    out = has_parent(routed_root, "parents", "Parent", "Child")
    rows = sorted(r["c_id"] for r in out.take_all())
    assert rows == [10, 11, 12, 13]
