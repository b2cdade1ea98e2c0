"""Changed-fields (partial-row) delta fold — the batch analog of the
reference's changed_json + ES doc_as_upsert merge
(/root/reference/src/search-ingest/elastic.cr:231-232, 420): per id, each
column independently takes its newest non-null value; tombstones clear the
document and suppress older partials."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from search_ingest_ray.stages.fold import fold_changed_fields


@pytest.fixture
def rd(ray_session):
    import ray.data as rd
    return rd


def _merge_oracle(rows, with_action=False):
    """Per-id Python reference: newest-first scan, first non-null per
    column, tombstone cuts older history."""
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    out = {}
    for i, rs in by_id.items():
        rs = sorted(rs, key=lambda r: (r["seq"],
                                       r.get("a") or "", r.get("b") or -1),
                    reverse=True)
        if with_action:
            # newest tombstone cuts everything at/after it (older)
            cut = next((j for j, r in enumerate(rs)
                        if r.get("action") == "deleted"), None)
            if cut == 0:
                continue
            if cut is not None:
                rs = rs[:cut]
        merged = {"id": i, "seq": rs[0]["seq"]}
        if with_action:
            merged["action"] = rs[0]["action"]
        for col in ("a", "b"):
            merged[col] = next((r[col] for r in rs if r[col] is not None),
                               None)
        out[i] = merged
    return out


def test_changed_fields_basic(rd):
    rows = [
        {"id": 1, "seq": 1, "a": "x", "b": 10},
        {"id": 1, "seq": 2, "a": None, "b": 20},   # touches only b
        {"id": 1, "seq": 3, "a": "y", "b": None},  # touches only a
        {"id": 2, "seq": 1, "a": None, "b": 5},
    ]
    out = fold_changed_fields(rd.from_items(rows), "id", ["seq"],
                              num_partitions=4).to_pandas()
    got = {int(r.id): r for _, r in out.iterrows()}
    assert got[1].a == "y" and got[1].b == 20 and got[1].seq == 3
    assert got[2].a is None and got[2].b == 5


def test_changed_fields_tombstone_cuts_history(rd):
    rows = [
        {"id": 1, "seq": 1, "a": "old", "b": 1, "action": "updated"},
        {"id": 1, "seq": 2, "a": None, "b": None, "action": "deleted"},
        {"id": 1, "seq": 3, "a": None, "b": 7, "action": "updated"},
        {"id": 2, "seq": 1, "a": "z", "b": 2, "action": "updated"},
        {"id": 2, "seq": 9, "a": None, "b": None, "action": "deleted"},
    ]
    out = fold_changed_fields(rd.from_items(rows), "id", ["seq"],
                              action_col="action",
                              num_partitions=4).to_pandas()
    got = {int(r.id): r for _, r in out.iterrows()}
    # id 2's newest row is the tombstone → gone entirely
    assert set(got) == {1}
    # id 1 was deleted at seq 2, then partially re-created at seq 3:
    # pre-delete 'a'/'b' must NOT leak through the tombstone
    assert got[1].a is None and got[1].b == 7


@settings(max_examples=20, deadline=None)
@given(st.lists(
    st.fixed_dictionaries({
        "id": st.integers(0, 5),
        "seq": st.integers(0, 6),
        "a": st.one_of(st.none(), st.sampled_from(["p", "q", "r"])),
        "b": st.one_of(st.none(), st.integers(0, 99)),
        "action": st.sampled_from(["created", "updated", "updated",
                                   "deleted"]),
    }), min_size=1, max_size=40))
def test_changed_fields_matches_oracle(ray_session, rows):
    # unique (id, seq) so the order is total (ties are degenerate input)
    seen = set()
    uniq = []
    for r in rows:
        if (r["id"], r["seq"]) not in seen:
            seen.add((r["id"], r["seq"]))
            uniq.append(r)
    rows = uniq
    import ray.data as rd
    out = fold_changed_fields(rd.from_items(rows), "id", ["seq"],
                              action_col="action",
                              num_partitions=3).to_pandas()
    oracle = _merge_oracle(rows, with_action=True)
    assert len(out) == len(oracle)
    for _, r in out.iterrows():
        o = oracle[int(r.id)]
        assert r.seq == o["seq"]
        assert (r.a if isinstance(r.a, str) else None) == o["a"]
        got_b = None if r.b is None or (isinstance(r.b, float)
                                        and np.isnan(r.b)) else int(r.b)
        assert got_b == o["b"]
