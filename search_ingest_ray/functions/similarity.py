"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: the query matrix is broadcast once via
  ``ray.put``; every batch does one numpy matmul and emits only its local
  top-k candidates, so the final exact reduce sees ≤ k×num_blocks rows —
  never the full corpus (the "broadcast small side, never shuffle the big
  side" join pattern).
- LSH-bucketed variant (scale path): random-hyperplane signatures bucket
  vectors; queries probe only their own bucket (+ optional multiprobe),
  trading recall for a ~num_buckets× read reduction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(m, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    return m / nrm


_QCACHE: dict = {}


def _topk_partial(batch: pa.Table, *, q_ref, k: int, id_col: str,
                  vec_col: str, round_to: int | None) -> pa.Table:
    key = q_ref.hex() if hasattr(q_ref, "hex") else id(q_ref)
    qn = _QCACHE.get(key)
    if qn is None:
        if len(_QCACHE) > 64:  # ref-keyed; long-lived workers must not grow unboundedly
            _QCACHE.clear()
        q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
        qn = _QCACHE[key] = _normalize(np.atleast_2d(np.asarray(q, dtype=np.float64)))
    m = _normalize(_as_matrix(batch[vec_col]))
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    sims = qn @ m.T  # (Q, B)
    if round_to is not None:
        sims = np.round(sims, round_to)
    qids_out, ids_out, cos_out = [], [], []
    kk = min(k, sims.shape[1])
    for qi in range(sims.shape[0]):
        row = sims[qi]
        # local top-k with deterministic (-cos, id) order
        idx = np.lexsort((ids, -row))[:kk]
        qids_out.append(np.full(kk, qi, dtype=np.int64))
        ids_out.append(ids[idx])
        cos_out.append(row[idx])
    return pa.table({
        "query_id": pa.array(np.concatenate(qids_out)),
        "vec_id": pa.array(np.concatenate(ids_out)),
        "cos": pa.array(np.concatenate(cos_out)),
    })


def knn_cosine(ds, query_vecs, k: int = 10, id_col: str = "vec_id",
               vec_col: str = "embedding", round_to: int | None = None):
    """Exact cosine top-k per query vector.  Returns a Dataset with columns
    (query_id, vec_id, cos) — k rows per query, sorted by (-cos, vec_id)."""
    q = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    q_ref = ray.put(q)
    partial = ds.map_batches(
        _topk_partial, batch_format="pyarrow", batch_size=4096,
        fn_kwargs=dict(q_ref=q_ref, k=k, id_col=id_col, vec_col=vec_col,
                       round_to=round_to))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def embedding_near_dup(ds, threshold: float = 0.95, id_col: str = "vec_id",
                       vec_col: str = "embedding", nbits: int = 6, seed: int = 11):
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ threshold).

    Scale shape: LSH-bucket the vectors (random hyperplanes), compute exact
    pairwise cosines only within buckets.  High-threshold near-dups almost
    always share a bucket (few sign flips across hyperplanes); recall-vs-
    cost is tuned by nbits.  The per-bucket work is one numpy gram matrix.
    """
    dim = len(ds.take(1)[0][vec_col])
    planes = _hyperplanes(dim, nbits, seed)
    bucketed = ds.map_batches(lsh_bucket_batch, batch_format="pyarrow",
                              fn_kwargs=dict(planes=planes, vec_col=vec_col))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cos": []})
        ids = g[id_col].to_numpy()
        m = _normalize(np.stack([np.asarray(v, dtype=np.float64)
                                 for v in g[vec_col]]))
        sims = m @ m.T
        iu = np.triu_indices(len(g), k=1)
        mask = sims[iu] >= threshold
        a = np.minimum(ids[iu[0][mask]], ids[iu[1][mask]])
        b = np.maximum(ids[iu[0][mask]], ids[iu[1][mask]])
        return pd.DataFrame({"a": a, "b": b, "cos": sims[iu][mask]})

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")


# -- LSH-bucketed ANN (scale path) ------------------------------------------


def _hyperplanes(dim: int, nbits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim))


def lsh_bucket_batch(batch: pa.Table, *, planes: np.ndarray,
                     vec_col: str = "embedding") -> pa.Table:
    """Random-hyperplane signature → bucket id column."""
    m = _as_matrix(batch[vec_col])
    bits = (m @ planes.T) > 0  # (B, nbits)
    buckets = np.zeros(len(m), dtype=np.int64)
    for i in range(planes.shape[0]):
        buckets |= bits[:, i].astype(np.int64) << i
    return batch.append_column("bucket", pa.array(buckets))


# -- IVF ANN (coarse-quantizer scale path) -----------------------------------


def kmeans_fit(vecs: np.ndarray, nlist: int, iters: int = 10,
               seed: int = 13) -> np.ndarray:
    """Deterministic spherical k-means (seeded init, fixed iterations) —
    the coarse quantizer for IVF.  Vectors and centroids are L2-normalized
    (cosine assignment)."""
    v = _normalize(np.asarray(vecs, dtype=np.float64))
    rng = np.random.default_rng(seed)
    n = len(v)
    cent = v[rng.choice(n, size=min(nlist, n), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(v @ cent.T, axis=1)
        new = np.zeros_like(cent)
        np.add.at(new, assign, v)
        counts = np.bincount(assign, minlength=len(cent))
        empty = counts == 0
        new[empty] = cent[empty]  # keep empty clusters stable
        cent = _normalize(new)
    return cent


def ivf_fit(ds, nlist: int = 16, sample: int = 4096,
            vec_col: str = "embedding", iters: int = 10,
            seed: int = 13) -> np.ndarray:
    """Fit the coarse quantizer on a bounded sample (the 10^12-scale path
    trains on a sample, never the full corpus)."""
    rows = ds.limit(sample).take_all()
    vecs = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    return kmeans_fit(vecs, nlist, iters=iters, seed=seed)


_CENT_CACHE: dict = {}


def _ivf_assign_batch(batch: pa.Table, *, cent_ref,
                      vec_col: str) -> pa.Table:
    key = cent_ref.hex() if hasattr(cent_ref, "hex") else id(cent_ref)
    cent = _CENT_CACHE.get(key)
    if cent is None:
        if len(_CENT_CACHE) > 64:
            _CENT_CACHE.clear()
        cent = _CENT_CACHE[key] = ray.get(cent_ref) \
            if not isinstance(cent_ref, np.ndarray) else cent_ref
    m = _normalize(_as_matrix(batch[vec_col]))
    assign = np.argmax(m @ cent.T, axis=1).astype(np.int32)
    return batch.append_column("ivf_list", pa.array(assign))


def ivf_assign(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Add the ``ivf_list`` column (nearest centroid per vector).  Persist
    with ``write_parquet(..., partition_cols=['ivf_list'])`` to make probes
    a partition-pruned read at scale."""
    cent_ref = ray.put(centroids)
    return ds.map_batches(_ivf_assign_batch, batch_format="pyarrow",
                          fn_kwargs=dict(cent_ref=cent_ref, vec_col=vec_col))


def _ivf_topk_partial(batch: pa.Table, *, q_ref, probe_ref, k: int,
                      id_col: str, vec_col: str) -> pa.Table:
    """Per-batch partial top-k with PER-QUERY probe masks: a query scores a
    row only if the row's ivf_list is among that query's probed lists."""
    key = (q_ref.hex() if hasattr(q_ref, "hex") else id(q_ref))
    ent = _QCACHE.get(("ivf", key))
    if ent is None:
        if len(_QCACHE) > 64:
            _QCACHE.clear()
        qn = _normalize(np.atleast_2d(np.asarray(ray.get(q_ref), np.float64)))
        probes = ray.get(probe_ref)  # (Q, nprobe) int32
        ent = _QCACHE[("ivf", key)] = (qn, probes)
    qn, probes = ent
    m = _normalize(_as_matrix(batch[vec_col]))
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    lists = batch["ivf_list"].to_numpy()
    sims = qn @ m.T  # (Q, B)
    # mask out rows not in the query's probe set
    allowed = (probes[:, :, None] == lists[None, None, :]).any(axis=1)
    sims = np.where(allowed, sims, -np.inf)
    qids_out, ids_out, cos_out = [], [], []
    for qi in range(sims.shape[0]):
        row = sims[qi]
        ok = np.flatnonzero(row > -np.inf)
        if ok.size == 0:
            continue
        kk = min(k, ok.size)
        idx = ok[np.lexsort((ids[ok], -row[ok]))[:kk]]
        qids_out.append(np.full(kk, qi, dtype=np.int64))
        ids_out.append(ids[idx])
        cos_out.append(row[idx])
    if not qids_out:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cos": pa.array([], pa.float64())})
    return pa.table({
        "query_id": pa.array(np.concatenate(qids_out)),
        "vec_id": pa.array(np.concatenate(ids_out)),
        "cos": pa.array(np.concatenate(cos_out)),
    })


def ann_ivf(ds, query_vecs, k: int = 10, nlist: int = 16, nprobe: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding",
            sample: int = 4096, iters: int = 10, seed: int = 13,
            centroids: np.ndarray | None = None):
    """IVF approximate top-k: train a spherical-k-means coarse quantizer on
    a sample, assign vectors to inverted lists, probe only each query's
    ``nprobe`` nearest lists with exact cosine inside.

    ``nprobe == nlist`` degrades to EXACT brute force (verified against
    ``knn_cosine`` in tests) — recall is tuned by nprobe.  Scale shape: at
    10^12 vectors the assigned dataset is written partitioned by
    ``ivf_list`` so a probe reads only ~nprobe/nlist of the data; here the
    probe filter is an ``is_in`` mask over the streamed batches."""
    q = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    cent = centroids if centroids is not None else \
        ivf_fit(ds, nlist=nlist, sample=sample, vec_col=vec_col,
                iters=iters, seed=seed)
    assigned = ivf_assign(ds, cent, vec_col=vec_col)
    qn = _normalize(q)
    order = np.argsort(-(qn @ cent.T), axis=1, kind="stable")
    probes = order[:, :min(nprobe, len(cent))].astype(np.int32)
    wanted = pa.array(sorted(set(probes.ravel().tolist())), pa.int32())

    def keep_probed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t["ivf_list"], value_set=wanted))

    cand = assigned.map_batches(keep_probed, batch_format="pyarrow")
    q_ref = ray.put(q)
    probe_ref = ray.put(probes)
    partial = cand.map_batches(
        _ivf_topk_partial, batch_format="pyarrow", batch_size=4096,
        fn_kwargs=dict(q_ref=q_ref, probe_ref=probe_ref, k=k,
                       id_col=id_col, vec_col=vec_col))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True],
                          kind="mergesort").head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(final, batch_format="pandas")


def ann_lsh(ds, query_vecs, k: int = 10, nbits: int = 8, id_col: str = "vec_id",
            vec_col: str = "embedding", seed: int = 11):
    """Approximate top-k: probe only each query's LSH bucket.

    Partitioning assumption (documented per SURVEY §2.2 custom-operator
    rule): vectors are grouped by ``bucket``; recall depends on nbits and
    data distribution — this is the 10^12-scale path where brute force is
    infeasible; the brute-force `knn_cosine` is the correctness baseline."""
    q = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    planes = _hyperplanes(q.shape[1], nbits, seed)
    bucketed = ds.map_batches(lsh_bucket_batch, batch_format="pyarrow",
                              fn_kwargs=dict(planes=planes, vec_col=vec_col))
    qbits = (q @ planes.T) > 0
    qbuckets = np.zeros(len(q), dtype=np.int64)
    for i in range(nbits):
        qbuckets |= qbits[:, i].astype(np.int64) << i
    wanted = pa.array(sorted(set(qbuckets.tolist())), pa.int64())

    def keep_wanted(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.is_in(t["bucket"], value_set=wanted))

    cand = bucketed.map_batches(keep_wanted, batch_format="pyarrow")
    qn = _normalize(q)

    def score(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        qidx = [i for i, qb in enumerate(qbuckets.tolist()) if qb == b]
        if not qidx:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cos": []})
        m = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]]))
        sims = qn[qidx] @ m.T
        out_q, out_v, out_c = [], [], []
        ids = g[id_col].to_numpy()
        for row_i, qi in enumerate(qidx):
            row = sims[row_i]
            idx = np.lexsort((ids, -row))[:k]
            out_q.extend([qi] * len(idx))
            out_v.extend(ids[idx])
            out_c.extend(row[idx])
        return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "cos": out_c})

    return cand.groupby("bucket").map_groups(score, batch_format="pandas")
