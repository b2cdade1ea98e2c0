"""Deterministic corpus sampling / epoch-mixing operators.

The three operators a training-data pipeline composes its data mixture
from (cf. GPT-3 §2.2 / The Pile §1 mixture weights, Gopher/MassiveText
subsampling): a hash-gated Bernoulli SAMPLE, a per-stratum exact QUOTA
sample, and fractional REPETITION (upsampling) of whole strata.  All
three are keyed on a stable md5-low64 hash of ``salt || key`` — the same
hash family as the rest of the engine (``md5_number_lower``) — so

* the sample is REPRODUCIBLE: re-running the pipeline, resuming a failed
  run, or re-sharding the input selects the exact same rows (no RNG
  state, no dependence on block boundaries or visit order); and
* every operator here is SQL-expressible, hence exactly DuckDB-oracled.

Scale shape: ``hash_sample`` and ``mixture_repeat`` are pure per-batch
map/flat-map stages — ZERO shuffle at any corpus size.  ``stratified_quota``
needs per-stratum rank, so it hash-partitions on the stratum (ONE
exchange of only the needed columns) and ranks inside each partition
vectorized; skewed strata degrade to a sort of that stratum's rows in
one task, bounded by quota ≪ stratum size for the head it keeps.

No reference anchor: the reference (PlaceOS/search-ingest) has no
sampling surface; these belong to the builder brief's training-data
operator family.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.fold import _PART_COL
from ..util import stable_partition_column

_PPM = 1_000_000


@functools.lru_cache(maxsize=1)
def _con():
    import duckdb
    return duckdb.connect()


def _key_ppm(col: pa.ChunkedArray | pa.Array, salt: str) -> np.ndarray:
    """md5_number_lower(salt || key) % 1e6 for a key column — the
    deterministic uniform-in-[0, 1e6) gate every operator here shares.
    DuckDB's vectorized C++ md5 kernel over the zero-copy-registered
    column (same pattern as dedup.content_hash_batch); NULL keys gate at
    the salt alone, so they sample consistently too."""
    con = _con()
    src = pa.table({"k": col})
    con.register("_smp_src", src)
    try:
        out = con.execute(
            "SELECT (md5_number_lower($salt || coalesce(CAST(k AS VARCHAR), ''))"
            "        % 1000000)::BIGINT AS g FROM _smp_src",
            {"salt": salt},
        ).arrow()["g"]
    finally:
        con.unregister("_smp_src")
    return out.combine_chunks().to_numpy()


def hash_sample(ds, rate_ppm: int, *, key_col: str = "doc_id",
                salt: str = "sample"):
    """Deterministic Bernoulli sample: keep a row iff
    ``md5_low64(salt || key) % 1e6 < rate_ppm``.

    A pure filter stage — no shuffle, no state, no RNG; the same
    (salt, key) is kept or dropped identically in every run, shard and
    resume, which is what makes held-out splits and ablation subsets
    stable across pipeline versions.  Exactly SQL:
    ``WHERE md5_number_lower(salt || CAST(key AS VARCHAR)) % 1e6 < ppm``.
    """
    if not (0 <= rate_ppm <= _PPM):
        raise ValueError("rate_ppm must be in [0, 1e6]")

    def _keep(batch: pa.Table) -> pa.Table:
        g = _key_ppm(batch[key_col], salt)
        return batch.filter(pa.array(g < rate_ppm))

    return ds.map_batches(_keep, batch_format="pyarrow")


def _quota_kernel(g: pa.Table, *, strata_col, quota, gate_col,
                  key_col) -> pa.Table:
    """Per-partition exact quota: rank rows within each stratum by
    (gate, key) and keep rank < quota[stratum].  One lexsort + one
    segmented cumcount — no per-stratum Python loop."""
    g = g.combine_chunks()
    if g.num_rows == 0:
        return g.drop_columns([_PART_COL, gate_col])
    import pandas as pd
    s_codes, uniques = pd.factorize(
        g[strata_col].to_numpy(zero_copy_only=False), sort=True)
    gate = g[gate_col].to_numpy()
    key = g[key_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((key, gate, s_codes))
    sc = s_codes[order]
    # rank within stratum = position - start-of-stratum-run
    starts = np.zeros(len(sc), dtype=np.int64)
    new = np.flatnonzero(np.diff(sc)) + 1
    starts[new] = new
    np.maximum.accumulate(starts, out=starts)
    rank = np.arange(len(sc), dtype=np.int64) - starts
    qs = np.array([quota.get(u, 0) for u in uniques], dtype=np.int64)
    keep = order[rank < qs[sc]]
    return (g.take(pa.array(np.sort(keep)))
            .drop_columns([_PART_COL, gate_col]))


def stratified_quota(ds, quota: dict, *, strata_col: str = "lang",
                     key_col: str = "doc_id", salt: str = "strat",
                     num_partitions: int = 32):
    """Exact per-stratum uniform sample WITHOUT replacement: for each
    stratum ``s``, keep the ``quota[s]`` rows with the smallest
    ``(md5_low64(salt||key) % 1e6, key)`` — i.e. a deterministic
    size-capped uniform draw (strata smaller than their quota keep every
    row; strata absent from ``quota`` are dropped).

    Shape: tag the gate per batch (map), hash-partition on the STRATUM
    (one exchange), rank vectorized per partition.  SQL oracle:
    ``QUALIFY row_number() OVER (PARTITION BY s ORDER BY gate, key) <= q``.
    """
    strata = list(quota.keys())

    def _tag(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        batch = batch.filter(pc.is_in(
            batch[strata_col],
            value_set=pa.array(strata, batch.schema.field(strata_col).type)))
        if batch.num_rows == 0:
            batch = batch.append_column("__gate", pa.array([], pa.int64()))
            return batch.append_column(_PART_COL,
                                       pa.array([], pa.int32()))
        g = _key_ppm(batch[key_col], salt)
        batch = batch.append_column("__gate", pa.array(g, pa.int64()))
        part = stable_partition_column(batch[strata_col], num_partitions)
        return batch.append_column(_PART_COL, pa.array(part))

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return tagged.groupby(_PART_COL).map_groups(
        functools.partial(_quota_kernel, strata_col=strata_col, quota=quota,
                          gate_col="__gate", key_col=key_col),
        batch_format="pyarrow")


def mixture_repeat(ds, weights_ppm: dict, *, strata_col: str = "lang",
                   key_col: str = "doc_id", salt: str = "mix",
                   copy_col: str = "copy"):
    """Fractional epoch mixing (corpus-weighting by repetition): a row in
    stratum ``s`` with weight ``w = weights_ppm[s] / 1e6`` is emitted
    ``floor(w)`` times, plus one more iff its hash gate
    ``md5_low64(salt||key) % 1e6 < frac(w)·1e6`` — so the EXPECTED
    multiplicity is exactly ``w`` per row and every emitted copy carries
    a ``copy`` index (0-based) for downstream shard-stable shuffling.
    Strata absent from ``weights_ppm`` get weight 0 (dropped).

    GPT-3/Pile-style mixture weighting as a pure flat-map: zero shuffle,
    deterministic, resume-stable.  SQL oracle: per-row
    ``reps = w//1e6 + (gate < w%1e6)`` then ``unnest(range(reps))``.
    """
    def _emit(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        if batch.num_rows == 0:
            return batch.append_column(copy_col, pa.array([], pa.int64()))
        sv = batch[strata_col].to_numpy(zero_copy_only=False)
        w = np.array([weights_ppm.get(s, 0) for s in sv], dtype=np.int64)
        gate = _key_ppm(batch[key_col], salt)
        reps = w // _PPM + (gate < (w % _PPM))
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), reps)
        # 0-based copy index inside each row's run (cumsum-offset arange)
        copy = (np.arange(int(reps.sum()), dtype=np.int64)
                - np.repeat(np.cumsum(reps) - reps, reps))
        return (batch.take(pa.array(idx))
                .append_column(copy_col, pa.array(copy, pa.int64())))

    return ds.map_batches(_emit, batch_format="pyarrow")


def _topk_kernel(g: pa.Table, *, group_col, order_cols, descending, k,
                 key_col) -> pa.Table:
    """Per-partition group-wise top-k: one lexsort + segmented rank —
    the same shape as _quota_kernel but ordered by VALUE columns
    (ties → key ascending) instead of the hash gate."""
    g = g.combine_chunks()
    if g.num_rows == 0:
        return g.drop_columns([_PART_COL])
    import pandas as pd
    s_codes, _ = pd.factorize(
        g[group_col].to_numpy(zero_copy_only=False), sort=True)
    keys = [g[key_col].to_numpy(zero_copy_only=False)]
    for c, desc in zip(reversed(order_cols), reversed(descending)):
        v = g[c].to_numpy(zero_copy_only=False)
        keys.append(-v if desc else v)
    keys.append(s_codes)
    order = np.lexsort(keys)
    sc = s_codes[order]
    starts = np.zeros(len(sc), dtype=np.int64)
    new = np.flatnonzero(np.diff(sc)) + 1
    starts[new] = new
    np.maximum.accumulate(starts, out=starts)
    rank = np.arange(len(sc), dtype=np.int64) - starts
    keep = order[rank < k]
    return g.take(pa.array(np.sort(keep))).drop_columns([_PART_COL])


def grouped_topk(ds, k: int, *, group_col: str, order_cols: list[str],
                 descending: list[bool] | None = None,
                 key_col: str = "doc_id", num_partitions: int = 32):
    """Per-group top-k selection ("best k docs per domain/language by
    quality"): rows ranked within each group by ``order_cols`` (ties →
    ``key_col`` ascending), rank < k kept.  One group-keyed exchange +
    vectorized per-partition rank; a skewed group costs one sort of its
    rows in one task — bounded further upstream by pre-filtering, since
    only candidates that can beat a local top-k matter (callers may
    pre-prune with a per-batch local top-k when k ≪ batch).  SQL:
    ``row_number() OVER (PARTITION BY g ORDER BY v DESC, key) <= k``.

    Note: numeric order columns only (descending negates vectorized).
    """
    if descending is None:
        descending = [True] * len(order_cols)

    def _tag(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        part = stable_partition_column(batch[group_col], num_partitions)
        return batch.append_column(_PART_COL, pa.array(part))

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    return tagged.groupby(_PART_COL).map_groups(
        functools.partial(_topk_kernel, group_col=group_col,
                          order_cols=order_cols, descending=descending,
                          k=k, key_col=key_col),
        batch_format="pyarrow")


def weighted_sample(ds, k: int, *, weight_col: str,
                    key_col: str = "doc_id", salt: str = "wsamp"):
    """Deterministic weighted sample WITHOUT replacement (sequential
    Poisson sampling, Ohlsson 1998; the order-sampling flavor of
    priority sampling): keep the ``k`` rows with the smallest
    ``rank = md5_63(salt||key) // w`` — inclusion probability ≈ ∝ w for
    k ≪ n, reproducible across runs/shards/resumes, and EXACT integer
    arithmetic so the SQL oracle matches bit-for-bit
    (``ORDER BY h // w, key LIMIT k``).  Rows with w ≤ 0 or NULL are
    excluded (zero weight can never be drawn).

    Scale shape: per-batch local top-k (argpartition) shrinks each block
    to ≤ k rows, then ONE tiny sort+limit over ≤ k·blocks survivors —
    the knn_cosine reduce shape, no full-corpus shuffle."""
    from .packing import _key_h63   # late import (packing imports _con)

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        ok = np.isfinite(w.astype(np.float64)) & (w > 0)
        if not ok.all():
            batch = batch.filter(pa.array(ok))
            w = w[ok]
        if batch.num_rows == 0:
            return batch.append_column("__rank", pa.array([], pa.int64()))
        h = _key_h63(batch[key_col], salt)
        rank = h // w.astype(np.int64)
        batch = batch.append_column("__rank", pa.array(rank, pa.int64()))
        if batch.num_rows > k:
            keep = np.argpartition(rank, k)[:k]
            batch = batch.take(pa.array(np.sort(keep)))
        return batch

    out = (ds.map_batches(_partial, batch_format="pyarrow")
             .sort(["__rank", key_col]).limit(k))
    return out.drop_columns(["__rank"])
