"""Property tests for the docvalue re-nulling helpers.

`_renull_int` must be the exact inverse of FieldStore's float64+NaN
encoding of nulled int columns, and `_drop_null_key_rows` must keep
exactly the rows where every source is present, regardless of which
null encoding each column uses.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from search_ingest_ray.query.searcher import (_drop_null_key_rows,
                                              _renull_int)

ints_or_none = st.lists(
    st.one_of(st.none(), st.integers(min_value=-2**52, max_value=2**52)),
    min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(vals=ints_or_none)
def test_renull_roundtrips_float64_nan_encoding(vals):
    # the shard encoding: int column with nulls -> float64 with NaN
    enc = pa.array([float(v) if v is not None else np.nan for v in vals],
                   pa.float64())
    out = _renull_int(enc)
    assert out.type == pa.int64()
    assert out.to_pylist() == vals


@settings(max_examples=100, deadline=None)
@given(vals=ints_or_none)
def test_renull_passthrough_on_proper_int_columns(vals):
    col = pa.array(vals, pa.int64())
    out = _renull_int(col)
    assert out.to_pylist() == vals


@settings(max_examples=150, deadline=None)
@given(a=ints_or_none, data=st.data())
def test_drop_null_key_rows_keeps_exactly_fully_present(a, data):
    n = len(a)
    b = data.draw(st.lists(
        st.one_of(st.none(), st.text(max_size=4)), min_size=n, max_size=n))
    # column "x" in the shard float64+NaN encoding, "y" a proper string
    tbl = pa.table({
        "x": pa.array([float(v) if v is not None else np.nan for v in a],
                      pa.float64()),
        "y": pa.array(b, pa.string()),
    })
    out = _drop_null_key_rows(tbl, ["x", "y"])
    expect = [(av, bv) for av, bv in zip(a, b)
              if av is not None and bv is not None]
    assert out["x"].type == pa.int64()
    assert list(zip(out["x"].to_pylist(), out["y"].to_pylist())) == expect
