"""Edge-case tests for the relational operators (as-of join, range join,
tumbling window, session windows) — the sf-scale value parity against the
DuckDB oracles is covered by tools/check_entry.py."""

import numpy as np
import pyarrow as pa
import pytest

from search_ingest_ray.functions.relational import (
    asof_join, range_join_broadcast, session_windows, sliding_window,
    tumbling_window)


def _ds(tbl):
    import ray.data as rd
    return rd.from_arrow(tbl)


@pytest.fixture()
def asof_out(ray_session):
    left = pa.table({
        "k": pa.array([1, 1, 1, 2, 3, 4], pa.int64()),
        "lts": pa.array([10, 5, 2, 7, 100, 1], pa.int64()),
        "lid": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    })
    right = pa.table({
        "rk": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "rts": pa.array([3, 5, 5, 8, 6, 50], pa.int64()),
        "rid": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
    })
    out = asof_join(_ds(left), _ds(right), on="k", right_on="rk",
                    left_ts="lts", right_ts="rts",
                    left_cols=["lid"], right_cols=["rid"],
                    tie_col="rid", num_partitions=4).take_all()
    return {r["lid"]: r["rid"] for r in out}


def test_asof_exact_semantics(asof_out):
    # k=1, lts=10 -> rts=5 twice (rid 11,12): inclusive max-tie pick = 12
    assert asof_out[0] == 12
    # k=1, lts=5 -> equal-ts match is INCLUSIVE, tie-break max rid = 12
    assert asof_out[1] == 12
    # k=1, lts=2 -> no right row at or before 2 (earliest rts=3): dropped
    assert 2 not in asof_out
    # k=2, lts=7 -> rts in {6,8}: only 6 qualifies -> rid=14
    assert asof_out[3] == 14
    # k=3, lts=100 -> rts=50 -> rid=15
    assert asof_out[4] == 15
    # k=4 has no right rows at all: dropped
    assert 5 not in asof_out


def test_asof_null_tie_sorts_smallest(ray_session):
    # a null-tie right row must lose to any real tie at equal (key, ts)
    left = pa.table({"k": pa.array([1], pa.int64()),
                     "lts": pa.array([10], pa.int64()),
                     "lid": pa.array([0], pa.int64())})
    right = pa.table({"rk": pa.array([1, 1], pa.int64()),
                      "rts": pa.array([5, 5], pa.int64()),
                      "rid": pa.array([None, 3], pa.int64())})
    out = asof_join(_ds(left), _ds(right), on="k", right_on="rk",
                    left_ts="lts", right_ts="rts",
                    left_cols=["lid"], right_cols=["rid"],
                    tie_col="rid", num_partitions=2).take_all()
    assert out[0]["rid"] == 3


def test_asof_passthrough_floats_bit_exact(ray_session):
    left = pa.table({"k": pa.array([7], pa.int64()),
                     "lts": pa.array([9], pa.int64()),
                     "lid": pa.array([1], pa.int64())})
    price = 123.4567890123
    right = pa.table({"rk": pa.array([7], pa.int64()),
                      "rts": pa.array([4], pa.int64()),
                      "price": pa.array([price], pa.float64())})
    out = asof_join(_ds(left), _ds(right), on="k", right_on="rk",
                    left_ts="lts", right_ts="rts",
                    left_cols=["lid"], right_cols=["price"],
                    num_partitions=2).take_all()
    assert out[0]["price"] == price


def test_range_join_boundaries(ray_session):
    tbl = pa.table({"id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                    "v": pa.array([-1.0, 0.0, 9.999, 10.0, 25.0])})
    bands = [(100, 0.0, 10.0), (200, 10.0, 20.0)]
    out = range_join_broadcast(_ds(tbl), bands, value_col="v",
                               out_col="band").take_all()
    got = {r["id"]: r["band"] for r in out}
    # lo inclusive, hi exclusive; out-of-range rows dropped
    assert got == {1: 100, 2: 100, 3: 200}


def test_range_join_rejects_overlap(ray_session):
    with pytest.raises(ValueError):
        range_join_broadcast(_ds(pa.table({"v": pa.array([1.0])})),
                             [(0, 0.0, 10.0), (1, 5.0, 15.0)], value_col="v")


def test_tumbling_window_counts_and_micro_sums(ray_session):
    ts = pa.array([0, 5, 10, 15, 20], pa.timestamp("us"))
    tbl = pa.table({"ts": ts,
                    "key": pa.array(["a", "a", "b", "a", "a"]),
                    "value": pa.array([1.5, 2.25, 10.0, -0.5, 3.0])})
    out = tumbling_window(_ds(tbl), ts_col="ts", width_us=10,
                          key_col="key", value_col="value").take_all()
    got = {(r["window_us"], r["key"]): (r["n_events"], r["sum_value_micro"])
           for r in out}
    assert got == {
        (0, "a"): (2, 3_750_000),
        (10, "b"): (1, 10_000_000),
        (10, "a"): (1, -500_000),
        (20, "a"): (1, 3_000_000),
    }


def test_sliding_window_covers_and_degenerates(ray_session):
    ts = pa.array([0, 5, 10, 15, 20], pa.timestamp("us"))
    tbl = pa.table({"ts": ts,
                    "key": pa.array(["a", "a", "b", "a", "a"])})
    # size=10, hop=5: event t covers starts in (t-10, t] aligned to 5
    out = sliding_window(_ds(tbl), ts_col="ts", size_us=10, hop_us=5,
                         key_col="key").take_all()
    got = {(r["window_us"], r["key"]): r["n_events"] for r in out}
    ref: dict = {}
    for t, k in [(0, "a"), (5, "a"), (10, "b"), (15, "a"), (20, "a")]:
        s = (t - 10) // 5 * 5 + 5
        while s <= t:
            ref[(s, k)] = ref.get((s, k), 0) + 1
            s += 5
    assert got == ref
    # hop == size degenerates to the tumbling window's counts
    tbl2 = tbl.append_column("value",
                             pa.array([1.0] * 5, pa.float64()))
    slid = sliding_window(_ds(tbl2), ts_col="ts", size_us=10, hop_us=10,
                          key_col="key").take_all()
    tumb = tumbling_window(_ds(tbl2), ts_col="ts", width_us=10,
                           key_col="key", value_col="value").take_all()
    assert {(r["window_us"], r["key"]): r["n_events"] for r in slid} == \
        {(r["window_us"], r["key"]): r["n_events"] for r in tumb}
    with pytest.raises(ValueError):
        sliding_window(_ds(tbl), ts_col="ts", size_us=10, hop_us=3,
                       key_col="key")


def test_session_gap_boundary(ray_session):
    # gap == gap_us stays in-session; gap > gap_us breaks
    t = [0, 100, 200, 301]  # deltas 100, 100, 101 with gap_us=100
    tbl = pa.table({"u": pa.array([1, 1, 1, 1], pa.int64()),
                    "ts": pa.array(t, pa.timestamp("us"))})
    out = session_windows(_ds(tbl), user_col="u", ts_col="ts",
                          gap_us=100, num_partitions=2).take_all()
    sessions = sorted((r["session_start_us"], r["session_end_us"],
                       r["n_events"]) for r in out)
    assert sessions == [(0, 200, 3), (301, 301, 1)]


def test_sessions_never_cross_users(ray_session):
    tbl = pa.table({"u": pa.array([1, 2], pa.int64()),
                    "ts": pa.array([0, 1], pa.timestamp("us"))})
    out = session_windows(_ds(tbl), user_col="u", ts_col="ts",
                          gap_us=10**9, num_partitions=2).take_all()
    assert sorted(r["u"] for r in out) == [1, 2]
    assert all(r["n_events"] == 1 for r in out)


def test_windows_skip_null_timestamps(ray_session):
    """Events missing the timestamp can't join any window (ES
    date_histogram filter-context semantics); an unguarded to_numpy
    would NaN-garbage the bucket keys instead."""
    import pyarrow as pa
    import ray.data as rd

    from search_ingest_ray.functions.relational import (session_windows,
                                                        tumbling_window)
    t = pa.table({
        "ts": pa.array([1_000_000, None, 3_000_000, None, 5_000_000],
                       pa.timestamp("us")),
        "user": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "value": pa.array([1.5, 2.0, 3.0, 4.0, 5.0], pa.float64()),
    })
    w = tumbling_window(rd.from_arrow(t), ts_col="ts", width_us=2_000_000,
                        key_col="user", value_col="value").take_all()
    assert sorted((r["window_us"], r["user"], r["n_events"]) for r in w) == \
        [(0, 1, 1), (2_000_000, 2, 1), (4_000_000, 2, 1)]
    s = session_windows(rd.from_arrow(t), user_col="user", ts_col="ts",
                        gap_us=10_000_000).take_all()
    assert sorted((r["user"], r["n_events"]) for r in s) == [(1, 1), (2, 2)]


# -- distributed interval join -------------------------------------------------

def _brute_pairs(pts, ivs):
    """(pid, iid) reference pairs: lo <= v < hi, nulls never match."""
    out = []
    for pid, v in pts:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        for iid, lo, hi in ivs:
            if lo is None or hi is None or hi <= lo:
                continue
            if lo <= v < hi:
                out.append((pid, iid))
    return sorted(out)


def test_interval_join_overlapping_matches_bruteforce(ray_session):
    """Overlapping intervals, boundary inclusion/exclusion, null values,
    empty intervals, and intervals spanning many bins all agree with the
    nested-loop reference — across bin widths (replication geometry) and
    partition counts (bin → partition collisions)."""
    from search_ingest_ray.functions.relational import interval_join
    rng = np.random.default_rng(11)
    pts = [(i, float(rng.uniform(0, 100))) for i in range(80)]
    pts += [(100, None), (101, 0.0), (102, 50.0)]
    ivs = []
    for j in range(25):
        lo = float(rng.uniform(0, 95))
        ivs.append((j, lo, lo + float(rng.uniform(0.5, 30))))
    ivs += [(90, 50.0, 50.0),          # empty: matches nothing
            (91, 0.0, 100.0),          # giant: spans every bin
            (92, 50.0, 50.0 + 1e-9)]   # sliver containing exactly v=50.0
    want = _brute_pairs(pts, ivs)
    p_tbl = pa.table({"pid": pa.array([p[0] for p in pts], pa.int64()),
                      "v": pa.array([p[1] for p in pts], pa.float64())})
    i_tbl = pa.table({"iid": pa.array([i[0] for i in ivs], pa.int64()),
                      "lo": pa.array([i[1] for i in ivs], pa.float64()),
                      "hi": pa.array([i[2] for i in ivs], pa.float64())})
    for bw, nparts in ((2.0, 8), (17.3, 4), (None, 16)):
        out = interval_join(_ds(p_tbl), _ds(i_tbl), value_col="v",
                            lo_col="lo", hi_col="hi", point_cols=["pid"],
                            interval_cols=["iid"], bin_width=bw,
                            num_partitions=nparts).take_all()
        got = sorted((r["pid"], r["iid"]) for r in out)
        assert got == want, (bw, nparts)


def test_interval_join_agrees_with_broadcast_on_disjoint_bands(ray_session):
    from search_ingest_ray.functions.relational import interval_join
    bands = [(0, 0.0, 10.0), (1, 10.0, 20.0), (2, 25.0, 40.0)]
    tbl = pa.table({"pid": pa.array(list(range(9)), pa.int64()),
                    "v": pa.array([0.0, 5.0, 9.999, 10.0, 19.0, 22.0,
                                   25.0, 39.999, 40.0], pa.float64())})
    bc = range_join_broadcast(_ds(tbl), bands, value_col="v",
                              out_col="iid").take_all()
    i_tbl = pa.table({"iid": pa.array([b[0] for b in bands], pa.int64()),
                      "lo": pa.array([b[1] for b in bands], pa.float64()),
                      "hi": pa.array([b[2] for b in bands], pa.float64())})
    ij = interval_join(_ds(tbl), _ds(i_tbl), value_col="v", lo_col="lo",
                       hi_col="hi", point_cols=["pid"],
                       interval_cols=["iid"], bin_width=7.0,
                       num_partitions=4).take_all()
    assert sorted((r["pid"], r["iid"]) for r in bc) == \
        sorted((r["pid"], r["iid"]) for r in ij)
