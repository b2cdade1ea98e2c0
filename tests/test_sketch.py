"""Exact-integer HyperLogLog: determinism, mergeability, accuracy."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from search_ingest_ray.functions.sketch import _bitlen64, hll_cardinality


def test_bitlen64_exact_everywhere():
    # float log2 rounds UP near 2^k - 1 for k > 53 — the exact reason
    # this helper exists; sweep the danger zone and a random spread
    vals = [0, 1, 2, 3, 255, 256, (1 << 53) - 1, 1 << 53, (1 << 55) - 1,
            (1 << 55), (1 << 62) - 1, (1 << 62)]
    rng = np.random.default_rng(9)
    vals += [int(x) for x in rng.integers(1, 1 << 62, 50)]
    got = _bitlen64(np.array(vals, dtype=np.int64))
    assert [int(g) for g in got] == [v.bit_length() for v in map(int, vals)]


def test_hll_block_invariant_and_duplicate_insensitive(ray_session):
    base = pa.table({"doc_id": pa.array(np.arange(1000, dtype=np.int64))})
    dup = pa.concat_tables([base, base, base])  # duplicates can't move it
    outs = []
    for tbl, blocks in ((base, 1), (base, 13), (dup, 7)):
        r = hll_cardinality(rd.from_arrow(tbl).repartition(blocks),
                            key_col="doc_id").to_pylist()[0]
        outs.append((r["est"], r["n_zero"]))
    assert outs[0] == outs[1] == outs[2]
    est = outs[0][0]
    assert abs(est - 1000) / 1000 < 0.25  # raw HLL, m=256 → ~6.5% stderr


def test_hll_accuracy_at_scale(ray_session):
    n = 50_000
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
    r = hll_cardinality(rd.from_arrow(tbl).repartition(8),
                        key_col="doc_id").to_pylist()[0]
    assert r["n_zero"] == 0
    assert abs(r["est"] - n) / n < 0.2
