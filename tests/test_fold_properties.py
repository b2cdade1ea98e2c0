"""Property-based tests (hypothesis) for the hash-partitioned vectorized
fold — the operator every upsert/dedup path now rests on.  Oracle: the
straightforward pandas groupby fold it replaced."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_ingest_ray.stages.fold import _fold_partition, _PART_COL
from search_ingest_ray.codec import encode_positions, decode_positions


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),        # id
        st.integers(min_value=0, max_value=5),         # epoch (order col)
        st.integers(min_value=0, max_value=10**6),     # seq (order col, uniq-ish)
        st.sampled_from(["created", "updated", "deleted"]),
        st.text(alphabet="abcdef", min_size=0, max_size=6),
    ),
    min_size=1, max_size=60,
)


def _pandas_oracle(rows, keep, action):
    df = pd.DataFrame(rows, columns=["id", "epoch", "seq", "action", "val"])
    df = df.sort_values(["id", "epoch", "seq"], kind="mergesort")
    g = df.groupby("id", as_index=False).tail(1) if keep == "last" else \
        df.groupby("id", as_index=False).head(1)
    if action:
        g = g[g["action"] != "deleted"]
    return g.sort_values("id").reset_index(drop=True)


@settings(max_examples=60, deadline=None)
@given(rows=rows_strategy, keep=st.sampled_from(["last", "first"]),
       action=st.booleans())
def test_fold_partition_matches_pandas(rows, keep, action):
    # make (epoch, seq) a total order per id — the documented contract
    seen = {}
    uniq_rows = []
    for r in rows:
        key = (r[0], r[1], r[2])
        if key in seen:
            continue
        seen[key] = True
        uniq_rows.append(r)
    t = pa.table({
        "id": pa.array([r[0] for r in uniq_rows], pa.int64()),
        "epoch": pa.array([r[1] for r in uniq_rows], pa.int64()),
        "seq": pa.array([r[2] for r in uniq_rows], pa.int64()),
        "action": pa.array([r[3] for r in uniq_rows], pa.string()),
        "val": pa.array([r[4] for r in uniq_rows], pa.string()),
        _PART_COL: pa.array([0] * len(uniq_rows), pa.int32()),
    })
    out = _fold_partition(t, key_cols=["id"], order_cols=["epoch", "seq"],
                          keep=keep,
                          action_col="action" if action else None)
    got = out.to_pandas().sort_values("id").reset_index(drop=True)
    want = _pandas_oracle(uniq_rows, keep, action)
    assert got["id"].tolist() == want["id"].tolist()
    assert got["epoch"].tolist() == want["epoch"].tolist()
    assert got["seq"].tolist() == want["seq"].tolist()
    assert got["val"].tolist() == want["val"].tolist()


@settings(max_examples=60, deadline=None)
@given(plists=st.lists(
    st.lists(st.integers(min_value=0, max_value=5000),
             min_size=1, max_size=20),
    min_size=0, max_size=15))
def test_positions_roundtrip(plists):
    """encode_positions/decode_positions round-trip for any per-posting
    sorted position lists (the merge path depends on this)."""
    plists = [np.array(sorted(p), dtype=np.int64) for p in plists]
    blob = encode_positions(plists)
    tfs = np.array([len(p) for p in plists], dtype=np.int64)
    if tfs.sum() == 0:
        return
    back = decode_positions(blob, tfs)
    assert len(back) == len(plists)
    for a, b in zip(plists, back):
        assert a.tolist() == b.tolist()
