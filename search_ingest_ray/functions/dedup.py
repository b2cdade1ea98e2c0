"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Ray Data shapes (all shuffle on a SMALL derived key, never on raw text):

- exact:   content hash in map_batches → groupby(hash).map_groups(first)
- minhash: shingle→minhash per batch (vectorized) → explode to
           (band, band_hash, id) rows → groupby(band, band_hash) → candidate
           pairs → optional exact-Jaccard verification
- simhash: 64-bit weighted token-hash signature; near-dup candidates via
           banding on 16-bit chunks (any equal chunk ⇒ hamming ≤ 48 filter,
           verified by exact hamming distance)

The reference's dedup surface is upsert-by-id + skip-replication
(/root/reference/src/search-ingest/elastic.cr:431-449, 214-218); these
operators extend it to content-level dedup for training corpora.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..analyzer import tokenize_simple

# -- exact dedup -------------------------------------------------------------


def content_hash_batch(batch: pa.Table, *, text_col: str = "text",
                       out_col: str = "content_hash") -> pa.Table:
    """Stable 63-bit content hash (blake2b) of the raw text."""
    hs = np.empty(batch.num_rows, dtype=np.int64)
    for i, t in enumerate(batch[text_col].to_pylist()):
        d = hashlib.blake2b((t or "").encode(), digest_size=8).digest()
        hs[i] = int.from_bytes(d, "big") & 0x7FFFFFFFFFFFFFFF
    return batch.append_column(out_col, pa.array(hs))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the lowest-id row per identical text (hash-partitioned
    first-wins).  Returns the deduplicated Dataset (original columns)."""
    hashed = ds.map_batches(content_hash_batch, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    out = hashed.groupby("content_hash").map_groups(first, batch_format="pandas")
    return out.select_columns(ds.schema().names)


# -- MinHash + LSH -----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of word k-shingles (simple-analyzed)."""
    toks = tokenize_simple(text or "")
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    out = np.empty(max(1, len(toks) - k + 1), dtype=np.uint64)
    for i in range(len(out)):
        s = " ".join(toks[i:i + k])
        out[i] = int.from_bytes(
            hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
    return out


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    """num_perm MinHash values via universal hashing over shingle hashes
    (vectorized outer product: perms × shingles)."""
    sh = _shingle_hashes(text, k) % _MERSENNE
    # (P, S) matrix of (a*x + b) mod p, min over shingles
    vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHashEmitter:
    """map_batches stage: doc → ``bands`` rows (band, band_hash, id).

    Permutation parameters are built once per actor (stateful setup)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 seed: int = 7):
        assert num_perm % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_band, out_hash, out_id = [], [], []
        for i, t in enumerate(texts):
            sig = minhash_signature(t, self.a, self.b, self.k)
            bandsig = sig.reshape(self.bands, self.rows_per_band)
            for bi in range(self.bands):
                h = hashlib.blake2b(bandsig[bi].tobytes(), digest_size=8).digest()
                out_band.append(bi)
                out_hash.append(int.from_bytes(h, "big") & 0x7FFFFFFFFFFFFFFF)
                out_id.append(ids[i])
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.int64()),
            "id": pa.array(out_id),
        })


def minhash_candidate_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                            num_perm: int = 64, bands: int = 16,
                            shingle_k: int = 3, seed: int = 7,
                            concurrency: int | None = None):
    """LSH candidate duplicate pairs (a < b), deduplicated across bands."""
    emitted = ds.map_batches(
        MinHashEmitter, batch_format="pyarrow",
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_perm=num_perm, bands=bands,
                                   shingle_k=shingle_k, seed=seed),
        concurrency=concurrency or 4)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["id"].tolist())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i]); b.append(ids[j])
        return pd.DataFrame({"a": a, "b": b})

    cand = emitted.groupby(["band", "band_hash"]).map_groups(
        pairs, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["a", "b"]).map_groups(dedup_pairs, batch_format="pandas")


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact n-gram (word k-shingle) Jaccard similarity — the verification
    step after LSH candidate generation."""
    sa = set(map(int, _shingle_hashes(text_a, k)))
    sb = set(map(int, _shingle_hashes(text_b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# -- SimHash -----------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over simple-analyzed tokens weighted by tf."""
    from collections import Counter
    acc = np.zeros(64, dtype=np.int64)
    for tok, tf in Counter(tokenize_simple(text or "")).items():
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits == 1, tf, -tf)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table, *, text_col: str = "text",
                  out_col: str = "simhash") -> pa.Table:
    vals = [simhash64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(np.array(vals, dtype=np.uint64).astype(np.int64)))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def simhash_candidates(ds, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 7, chunks: int = 8):
    """Near-dup candidate pairs by SimHash banding: ``chunks`` equal bit
    slices of the 64-bit signature — any pair within hamming < ``chunks``
    shares at least one slice (pigeonhole), so recall is complete for
    ``max_hamming`` ≤ chunks-1; candidates verified by exact hamming."""
    assert 64 % chunks == 0
    bits = 64 // chunks
    mask = np.uint64((1 << bits) - 1)
    hashed = ds.map_batches(simhash_batch, batch_format="pyarrow",
                            fn_kwargs={"text_col": text_col})

    def explode(batch: pa.Table) -> pa.Table:
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(sh)
        chunk = np.repeat(np.arange(chunks, dtype=np.int32), n)
        chunk_val = np.concatenate(
            [((sh >> np.uint64(bits * c)) & mask).astype(np.int64)
             for c in range(chunks)])
        return pa.table({
            "chunk": pa.array(chunk),
            "chunk_val": pa.array(chunk_val),
            "id": pa.array(np.tile(ids, chunks)),
            "simhash": pa.array(np.tile(sh.astype(np.int64), chunks)),
        })

    exploded = hashed.map_batches(explode, batch_format="pyarrow")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("id")
        ids = g["id"].tolist()
        shs = g["simhash"].tolist()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        a, b, hd = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = hamming64(shs[i], shs[j])
                if d <= max_hamming:
                    a.append(ids[i]); b.append(ids[j]); hd.append(d)
        return pd.DataFrame({"a": a, "b": b, "hamming": hd})

    cand = exploded.groupby(["chunk", "chunk_val"]).map_groups(
        pairs, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["a", "b"]).map_groups(dedup_pairs, batch_format="pandas")
