"""Reciprocal-rank fusion (RRF) — hybrid lexical + vector retrieval.

Modern Elasticsearch serves hybrid search by running a lexical (BM25)
retriever and a vector (kNN) retriever independently and fusing the two
rankings with reciprocal-rank fusion (Cormack et al., SIGIR 2009):

    score(d) = sum over rankings r containing d of  1 / (K + rank_r(d))

with K = 60 by default.  The reference delegates all retrieval to ES
(`/root/reference/src/search-ingest/elastic.cr` — the service builds the
index, ES serves queries); this module is the engine-native analog of the
ES `rrf` retriever over our own BM25 searcher + `knn_cosine`.

Scores are kept in exact integer micro-units — ``1_000_000 // (K + rank)``
— so a DuckDB oracle reproduces the fused ranking bit-for-bit (floats
would hash-mismatch).  The fusion itself is a driver-side kernel over at
most ``len(rankings) × depth`` ids (tens of rows): the heavy work is the
two retrievers, each already distributed; fusing their top-N never
touches the corpus again, which is exactly why RRF is the
multi-retriever shape that scales — no score calibration, no joint
re-scoring pass.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

RRF_K = 60  # ES default rank_constant


def rrf_fuse(rankings: list[np.ndarray], k: int = 10,
             rank_constant: int = RRF_K) -> pa.Table:
    """Fuse ranked id lists by reciprocal rank.

    ``rankings`` — one int64 array per retriever, ids in rank order
    (position 0 = rank 1); each list's ids must be unique (every sane
    retriever's top-N is).  Returns ``(doc_id, rrf_micro)``, the top ``k``
    by ``(-rrf_micro, doc_id)`` where
    ``rrf_micro = Σ_lists 1_000_000 // (rank_constant + rank)``.
    """
    parts, contribs = [], []
    for ids in rankings:
        ids = np.asarray(ids, dtype=np.int64)
        parts.append(ids)
        contribs.append(1_000_000 // (rank_constant
                                      + np.arange(1, ids.size + 1,
                                                  dtype=np.int64)))
    if not parts or not sum(p.size for p in parts):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rrf_micro": pa.array([], pa.int64())})
    all_ids = np.concatenate(parts)
    all_c = np.concatenate(contribs)
    uniq, inv = np.unique(all_ids, return_inverse=True)
    score = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(score, inv, all_c)
    top = np.lexsort((uniq, -score))[:k]
    return pa.table({"doc_id": pa.array(uniq[top], pa.int64()),
                     "rrf_micro": pa.array(score[top], pa.int64())})
