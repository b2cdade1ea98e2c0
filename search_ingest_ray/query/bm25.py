"""BM25 scoring — the native replacement for the scoring the reference
delegates to Elasticsearch.

Classic BM25 (the (k1+1)-normalized form ES documents for its ``BM25``
similarity), with Lucene's idf:

    idf(t)       = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(f,dl) = f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))
    score(d, q)  = Σ_{t ∈ q} idf(t) * tfnorm(tf_{t,d}, dl_d)

Defaults k1=1.2, b=0.75 (recorded in the index manifest; an index and its
queries always use the manifest's values).  All math is float32-upcast-to-
float64 numpy so the brute-force oracle and the engine share bit-identical
formulas — rank-identity (north rule) depends on this.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


@dataclass(frozen=True)
class BM25Params:
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    n_docs: int = 0
    avgdl: float = 1.0


def idf(df: float | np.ndarray, n_docs: int) -> np.ndarray:
    return np.log1p((n_docs - np.asarray(df, dtype=np.float64) + 0.5)
                    / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_norm(tf: np.ndarray, dl: np.ndarray, p: BM25Params) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    denom = tf + p.k1 * (1.0 - p.b + p.b * dl / p.avgdl)
    return tf * (p.k1 + 1.0) / denom


def term_scores(tf: np.ndarray, dl: np.ndarray, df: int, p: BM25Params) -> np.ndarray:
    """Exact per-posting score contributions of one term (used both at
    segment-build time for block maxes and at query time)."""
    return idf(df, p.n_docs) * tf_norm(tf, dl, p)


def similarity_scores(tf: np.ndarray, dl: np.ndarray, df: float, ttf: float,
                      n_docs: float, total_tokens: float, similarity: str,
                      mu: float = 2000.0, lam: float = 0.1) -> np.ndarray:
    """Per-posting score contributions of one term under a non-BM25
    similarity module (ES per-field ``similarity`` setting; Lucene's
    formulas).  Shared by ``Searcher.search_similarity`` and
    ``MultiEpochSearcher.search_similarity`` so single-epoch and chain
    serving are op-for-op identical — and the op ORDER is mirrored by the
    DuckDB oracles in ``__ray_entry__``, so keep it stable:

    - ``lmd``   p(t|C) = (ttf+1)/(T+1);
                s = max(0, ln(1 + tf/(mu·p)) + ln(mu/(dl+mu)))
    - ``lmjm``  s = ln(1 + ((1−lam)·tf/dl) / (lam·p(t|C)))
    - ``classic`` idf = 1 + ln((N+1)/(df+1));  s = √tf · idf² / √dl
    - ``boolean`` s = 1
    """
    import math
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    if similarity == "lmd":
        p_c = (ttf + 1.0) / (total_tokens + 1.0)
        s = np.log(1.0 + tf / (mu * p_c)) + np.log(mu / (dl + mu))
        np.maximum(s, 0.0, out=s)
        return s
    if similarity == "lmjm":
        p_c = (ttf + 1.0) / (total_tokens + 1.0)
        return np.log(1.0 + ((1.0 - lam) * tf / dl) / (lam * p_c))
    if similarity == "classic":
        idf_c = 1.0 + math.log((n_docs + 1.0) / (df + 1.0))
        return np.sqrt(tf) * (idf_c * idf_c) / np.sqrt(dl)
    if similarity == "boolean":
        return np.ones_like(tf)
    raise ValueError(f"unknown similarity {similarity!r}")


def oracle_topk(texts, ids, query_terms, k: int, p_k1: float = K1_DEFAULT,
                b: float = B_DEFAULT, analyzer: str = "standard"):
    """Brute-force in-memory BM25 oracle (the test reference the engine must
    be rank- and score-identical to — analog of the reference's exact-count /
    exact-routing spec assertions).

    Returns (ids, scores) sorted by (-score, id); ties broken by ascending id.
    """
    from collections import Counter

    from ..analyzer import get_analyzer
    an = get_analyzer(analyzer)
    toks = [an(t) if t else [] for t in texts]
    dls = np.array([len(t) for t in toks], dtype=np.float64)
    n = len(texts)
    avgdl = float(dls.mean()) if n else 1.0
    p = BM25Params(k1=p_k1, b=b, n_docs=n, avgdl=avgdl)
    counters = [Counter(t) for t in toks]
    scores = np.zeros(n, dtype=np.float64)
    for term in query_terms:
        tf = np.array([c.get(term, 0) for c in counters], dtype=np.float64)
        df = int((tf > 0).sum())
        if df == 0:
            continue
        contrib = term_scores(tf, dls, df, p)
        contrib[tf == 0] = 0.0
        scores += contrib
    ids_arr = np.asarray(ids)
    hit = scores > 0
    order = np.lexsort((ids_arr[hit], -scores[hit]))
    top = order[:k]
    return ids_arr[hit][top], scores[hit][top]
