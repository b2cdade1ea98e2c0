"""Distributed cardinality sketch: HyperLogLog in EXACT integer
arithmetic (Flajolet et al. 2007), md5-keyed so the estimate is a pure
function of the key set — bit-identical across runs, shards, resumes,
and (the point) reproducible by a SQL oracle.

Why a sketch when ``cardinality`` is exact: the exact count-distinct is
a full shuffle of every distinct key; the sketch ships ≤ m=2^p rows per
batch and merges with a 2^p-group max — a constant-size exchange at any
corpus size, mergeable across partitions/epochs by design (register-wise
max), the right tool for dashboard-grade distinct counts over 100 TB.

Exactness contract: everything stays in integers —
``h = md5_63(salt||key)``, ``bucket = h mod 2^p``, ``rho = (63-p+1) −
bitlen(h >> p)``, register = max rho per bucket, and the RAW estimate
``E = (alpha_ppm · m² · 2^(W+1)) // Σ_b 2^(W+1−M_b) // 10^6`` with W = 63−p
and alpha_ppm the fixed integer constant 718273 (⌊10^6·0.7213/(1 +
1.079/256)⌋, m=256).  No floats anywhere, so DuckDB reproduces E
exactly (hugeint arithmetic; bit length via ``length(printf('%b', w))``).
The small/large-range CORRECTIONS of the paper need ln() — deliberately
left to the consumer (``n_zero`` is emitted for it); the raw estimate is
the deterministic, testable quantity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .packing import _key_h63

ALPHA_PPM = {256: 718273}   # floor(1e6 * 0.7213 / (1 + 1.079/m))


def _bitlen64(w: np.ndarray) -> np.ndarray:
    """Exact bit length of non-negative int64 values — vectorized binary
    search (float log2 rounds up near 2^k−1 for k > 53, so it is NOT
    usable here)."""
    w = w.astype(np.uint64)
    out = np.zeros(len(w), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(shift))
        out[big] += shift
        w = np.where(big, w >> np.uint64(shift), w)
    out[w > 0] += 1
    return out


def _hll_partial(batch: pa.Table, *, key_col: str, salt: str,
                 p: int) -> pa.Table:
    h = _key_h63(batch[key_col], salt)
    if len(h) == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "rho": pa.array([], pa.int64())})
    m = 1 << p
    bucket = h % m
    w = h >> p                      # 63-p significant bits
    rho = (63 - p + 1) - _bitlen64(w)   # w==0 → rho = 64-p
    # per-batch register fold: ≤ m rows leave the task
    reg = np.zeros(m, dtype=np.int64)
    np.maximum.at(reg, bucket, rho)
    nz = np.flatnonzero(reg)
    return pa.table({"bucket": pa.array(nz, pa.int64()),
                     "rho": pa.array(reg[nz], pa.int64())})


def hll_cardinality(ds, *, key_col: str = "doc_id", salt: str = "hll",
                    p: int = 8) -> pa.Table:
    """One-row exact-integer raw-HLL estimate over ``key_col``:
    (est, n_zero, m).  Constant-size exchange: per-batch register
    partials (≤ 2^p rows) → one 2^p-group max → driver-side integer
    formula over 2^p register values."""
    m = 1 << p
    alpha_ppm = ALPHA_PPM[m]
    regs = (ds.map_batches(_hll_partial, batch_format="pyarrow",
                           fn_kwargs=dict(key_col=key_col, salt=salt, p=p))
              .groupby("bucket").max("rho").take_all())
    M = np.zeros(m, dtype=np.int64)
    for r in regs:
        M[r["bucket"]] = r["max(rho)"]
    # rho ranges [1, W+1] (w==0 → W+1), so scale Σ2^-M by 2^(W+1) to keep
    # every exponent non-negative: S = Σ_b 2^(W+1-M_b), Z = 2^(W+1)/S
    W = 63 - p
    S = sum(1 << (W + 1 - int(x)) for x in M)   # exact python ints
    est = (alpha_ppm * m * m * (1 << (W + 1))) // S // 1_000_000
    return pa.table({"est": pa.array([est], pa.int64()),
                     "n_zero": pa.array([int((M == 0).sum())], pa.int64()),
                     "m": pa.array([m], pa.int64())})
