"""Text analysis operators for large-scale training-data pipelines:
language ID (n-gram heuristic), quality scoring, token counting, document
fingerprinting.  All are vectorized ``map_batches`` stages; the SQL-parity
variants (token counts, quality ratios over the ``simple`` analyzer) have
DuckDB oracles in ``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..analyzer import tokenize_simple

STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "it", "for", "on")

_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

# Per-language function-word profiles for the language-ID heuristic
# (deterministic, no external models).  These are the standard most-frequent
# closed-class words of each language — NOT drawn from any test corpus.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was",
           "are", "this", "but", "not", "have"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "von", "zu",
           "den", "dem", "ein", "eine", "auf", "für"},
    "fr": {"le", "les", "et", "est", "pas", "pour", "dans", "que", "qui",
           "des", "une", "du", "au", "sur", "avec"},
    "es": {"el", "los", "las", "y", "es", "no", "por", "para", "con", "una",
           "del", "se", "lo", "como", "más"},
}


def token_count_batch(batch: pa.Table, *, text_col: str = "text",
                      out_col: str = "n_tokens") -> pa.Table:
    """Token count per doc with the ``simple`` analyzer (SQL-parity:
    ``len(regexp_extract_all(lower(text), '[a-z0-9]+'))``)."""
    counts = np.array([len(tokenize_simple(t)) if t else 0
                       for t in batch[text_col].to_pylist()], dtype=np.int64)
    return batch.append_column(out_col, pa.array(counts))


def quality_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Quality signals: text length, token count, stopword ratio, mean
    token length.  Ratios are emitted as integer micro-units
    (``floor(ratio * 1e6)``): float division + multiply + floor is
    bit-deterministic IEEE, so the DuckDB oracle reproduces the values
    exactly (decimal ROUND would diverge on half-way cases — Python/numpy
    round half-even, SQL rounds half away from zero)."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    text_len = np.empty(n, dtype=np.int64)
    n_tokens = np.empty(n, dtype=np.int64)
    stop_micro = np.empty(n, dtype=np.int64)
    mtl_micro = np.empty(n, dtype=np.int64)
    stops = set(STOPWORDS)
    for i, t in enumerate(texts):
        t = t or ""
        toks = tokenize_simple(t)
        text_len[i] = len(t)
        n_tokens[i] = len(toks)
        denom = max(1, len(toks))
        stop_micro[i] = int(np.floor(sum(1 for x in toks if x in stops) / denom * 1e6))
        mtl_micro[i] = int(np.floor(sum(map(len, toks)) / denom * 1e6))
    return (batch.append_column("text_len", pa.array(text_len))
                 .append_column("n_tokens", pa.array(n_tokens))
                 .append_column("stopword_ratio_micro", pa.array(stop_micro))
                 .append_column("mean_token_len_micro", pa.array(mtl_micro)))


class LangId:
    """Actor-pool language-ID stage: profile tables built once per actor.

    Scores each doc against per-language frequent-word profiles; ties break
    deterministically by language code order.  Heuristic (not a model) —
    suitable as a filter signal, mirrored by no SQL oracle (rows-only)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.profiles = sorted(_LANG_PROFILES.items())  # deterministic order

    def predict(self, tok_lists: list) -> list[str]:
        preds = []
        for tl in tok_lists:
            toks = set(tl)
            best, best_score = "und", 0
            for lang, prof in self.profiles:
                s = len(toks & prof)
                if s > best_score:
                    best, best_score = lang, s
            preds.append(best)
        return preds

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = self.predict([tokenize_simple(t or "")
                              for t in batch[self.text_col].to_pylist()])
        return batch.append_column(self.out_col, pa.array(preds, pa.string()))


# Gopher rule 7's required words (Rae et al. 2021, table A1): a doc must
# contain at least 2 of these to pass.
GOPHER_REQUIRED = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLETS = ("-", "*", "•")


def gopher_rules_batch(batch: pa.Table, *, text_col: str = "text",
                       min_words: int = 50, max_words: int = 100_000,
                       min_required: int = 2) -> pa.Table:
    """Full Gopher quality-rule signals (Rae et al. 2021 §A1.1) per doc,
    in exact integers / floor-micro ratios so the DuckDB oracle reproduces
    values bit-exactly:

    - ``n_words`` in [min_words, max_words]   (rule: word count 50..100k)
    - ``mean_word_len_micro`` in [3e6, 10e6]  (mean word length 3..10)
    - ``symbol_word_micro`` < 1e5             (#/ellipsis-to-word < 0.1)
    - ``bullet_line_micro`` < 9e5             (<90% lines bullet-started)
    - ``ellipsis_line_micro`` < 3e5           (<30% lines ellipsis-ended)
    - ``alpha_word_micro`` >= 8e5             (>=80% words have a letter)
    - ``n_required_hits`` >= 2                (>=2 of GOPHER_REQUIRED)

    ``pass_gopher`` is the conjunction (int64 0/1).  Words are the simple
    analyzer's tokens (SQL parity: ``regexp_extract_all(lower(text),
    '[a-z0-9]+')``); symbol/line stats come from the RAW text."""
    texts = batch[text_col].to_pylist()
    n = len(texts)
    n_words = np.empty(n, np.int64)
    mean_micro = np.empty(n, np.int64)
    alpha_micro = np.empty(n, np.int64)
    req_hits = np.empty(n, np.int64)
    sym_micro = np.empty(n, np.int64)
    bullet_micro = np.empty(n, np.int64)
    ellipsis_micro = np.empty(n, np.int64)
    required = set(GOPHER_REQUIRED)
    for i, t in enumerate(texts):
        t = t or ""
        toks = tokenize_simple(t)
        nw = len(toks)
        denom = max(1, nw)
        n_words[i] = nw
        mean_micro[i] = int(np.floor(sum(map(len, toks)) / denom * 1e6))
        alpha_micro[i] = int(np.floor(
            sum(1 for x in toks if any(c.isalpha() for c in x))
            / denom * 1e6))
        req_hits[i] = len(set(toks) & required)
        syms = t.count("#") + t.count("...") + t.count("…")
        sym_micro[i] = int(np.floor(syms / denom * 1e6))
        lines = t.split("\n")
        nl = max(1, len(lines))
        bullet_micro[i] = int(np.floor(
            sum(1 for ln in lines if ln.startswith(_BULLETS)) / nl * 1e6))
        ellipsis_micro[i] = int(np.floor(
            sum(1 for ln in lines
                if ln.endswith("...") or ln.endswith("…")) / nl * 1e6))
    ok = ((n_words >= min_words) & (n_words <= max_words)
          & (mean_micro >= 3_000_000) & (mean_micro <= 10_000_000)
          & (sym_micro < 100_000) & (bullet_micro < 900_000)
          & (ellipsis_micro < 300_000) & (alpha_micro >= 800_000)
          & (req_hits >= min_required))
    return (batch.append_column("n_words", pa.array(n_words))
                 .append_column("mean_word_len_micro", pa.array(mean_micro))
                 .append_column("alpha_word_micro", pa.array(alpha_micro))
                 .append_column("n_required_hits", pa.array(req_hits))
                 .append_column("symbol_word_micro", pa.array(sym_micro))
                 .append_column("bullet_line_micro", pa.array(bullet_micro))
                 .append_column("ellipsis_line_micro", pa.array(ellipsis_micro))
                 .append_column("pass_gopher",
                                pa.array(ok.astype(np.int64))))


_FP_BASE = np.uint64(1099511628211)   # odd → invertible mod 2^64
_FP_SEED = np.uint64(14695981039346656037)


class Fingerprinter:
    """Actor-pool document-fingerprint stage: 63-bit order-sensitive
    polynomial hash of the simple-analyzed token sequence — a
    whitespace/punct-insensitive exact-duplicate key.

    fp(doc) = seed + Σ_i h(tok_i) · B^i  (mod 2^64), masked to 63 bits.
    Per-token md5-low64 hashes (SQL parity: ``md5_number_lower``) are
    cached across batches; the polynomial accumulation is one flattened
    numpy reduceat per batch (no per-byte or per-token Python arithmetic
    in the hot path) — reproducible by a pure-SQL DuckDB oracle via a
    recursive-CTE power table."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col, self.out_col = text_col, out_col
        self._cache: dict[str, int] = {}
        self._pows = np.array([1], dtype=np.uint64)

    def _ensure_pows(self, n: int) -> None:
        if len(self._pows) < n:
            k = max(n, 2 * len(self._pows))
            ext = np.empty(k, dtype=np.uint64)
            ext[0] = 1
            ext[1:] = _FP_BASE
            np.cumprod(ext, out=ext)  # wraps mod 2^64 by uint64 overflow
            self._pows = ext

    def _tok_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            from ..util import tok_hash_sql
            h = tok_hash_sql(tok)  # SQL-parity: md5_number_lower(tok)
            if len(self._cache) < 2_000_000:
                self._cache[tok] = h
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        tok_lists = [tokenize_simple(t or "") for t in texts]
        lens = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
        total = int(lens.sum())
        fps = np.full(n, int(_FP_SEED), dtype=np.uint64)
        if total:
            self._ensure_pows(int(lens.max()))
            th = self._tok_hash
            flat = np.fromiter(
                (th(t) for tl in tok_lists for t in tl),
                dtype=np.uint64, count=total)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            terms = flat * self._pows[pos]
            nz = lens > 0
            sums = np.add.reduceat(terms, starts[nz])
            fps[nz] += sums
        return batch.append_column(
            self.out_col,
            pa.array((fps & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)))


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                      out_col: str = "fingerprint") -> pa.Table:
    """Stateless function form — prefer passing :class:`Fingerprinter` to
    map_batches for cross-batch token-hash caching."""
    return Fingerprinter(text_col=text_col, out_col=out_col)(batch)


def top_bigram_stats(tok_lists: list) -> tuple[np.ndarray, np.ndarray]:
    """(n_bigrams, top_bigram_micro) for pre-tokenized docs — the
    vectorized Gopher repetitiveness core, shared by
    :func:`repetition_batch` and the fused corpus-filter signal stage
    (one batch-wide token factorize, adjacent-pair bigram codes with
    doc-boundary pairs masked, a single lexsort + run-length count +
    per-doc max — no per-doc Python in the hot path)."""
    n = len(tok_lists)
    lens = np.array([len(tl) for tl in tok_lists], dtype=np.int64)
    total = int(lens.sum())
    nbg = np.maximum(lens - 1, 0)
    top = np.zeros(n, dtype=np.int64)
    if total >= 2:
        flat = np.array([t for tl in tok_lists for t in tl], dtype=object)
        _, inv = np.unique(flat, return_inverse=True)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        d = doc_idx[:-1]
        same = doc_idx[1:] == d  # drop pairs that straddle a doc boundary
        d = d[same]
        a, b = inv[:-1][same], inv[1:][same]
        if d.size:
            # count identical (doc, bigram) runs without building d*V²+b
            # keys (which could overflow int64 on huge batches)
            order = np.lexsort((b, a, d))
            ds, as_, bs = d[order], a[order], b[order]
            new = np.empty(ds.size, dtype=bool)
            new[0] = True
            new[1:] = ((ds[1:] != ds[:-1]) | (as_[1:] != as_[:-1])
                       | (bs[1:] != bs[:-1]))
            gid = np.cumsum(new) - 1
            counts = np.bincount(gid)
            np.maximum.at(top, ds[new], counts)
    micro = (top * 1_000_000) // np.maximum(nbg, 1)
    return nbg, micro


def repetition_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Gopher-style repetitiveness signal: the fraction of a doc's token
    bigrams taken by its single most frequent bigram, as exact integer
    micro-units — ``top_bigram_micro = (max_count · 10⁶) // n_bigrams``
    (0 when the doc has < 2 tokens).  High values flag boilerplate /
    degenerate pages a training-data pipeline drops.  Appends
    (n_bigrams, top_bigram_micro); core in :func:`top_bigram_stats`."""
    texts = batch[text_col].to_pylist()
    nbg, micro = top_bigram_stats([tokenize_simple(t or "") for t in texts])
    return (batch.append_column("n_bigrams", pa.array(nbg))
                 .append_column("top_bigram_micro", pa.array(micro)))


def weighted_partial_batch(batch: pa.Table, *, group_col: str,
                           val_col: str, weight_col: str) -> pa.Table:
    """In-batch partial aggregation for a weighted average: collapse a
    batch to one row per group carrying (Σ weight, Σ value·weight) as
    exact int64 — the combiner half of the pre-aggregate-then-tiny-groupby
    pattern (the downstream ``groupby(group).sum`` shuffles one row per
    (block, group), never per doc)."""
    v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
    w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
    t = pa.table({group_col: batch[group_col],
                  "w_sum": pa.array(w, pa.int64()),
                  "wv_sum": pa.array(v * w, pa.int64())})
    return (t.group_by(group_col)
             .aggregate([("w_sum", "sum"), ("wv_sum", "sum")])
             .rename_columns([group_col, "w_sum", "wv_sum"]))


# -- out-of-vocabulary rate ----------------------------------------------------

def oov_rate(ds, *, text_col: str = "text", id_col: str = "doc_id",
             vocab_k: int = 10_000):
    """Rare-word-ratio quality signal (CCNet-style vocabulary coverage):
    per doc, the fraction of tokens OUTSIDE the corpus's top-``vocab_k``
    vocabulary by collection frequency (ties → term ascending), in exact
    integer ppm — ``n_oov · 1e6 // n_tokens``.

    Scale shape: one word-count pass (per-batch partial combine → small
    groupby-sum → sort+limit over DISTINCT words only), then the K-term
    vocabulary is broadcast via ``ray.put`` ONCE and every scoring batch
    reads it from the local object store — no shuffle of the corpus
    itself, same pattern as decontaminate's eval-set probe.  Exactly
    SQL-oracled (integer arithmetic end to end)."""
    import ray

    from .bpe import word_counts

    top = (word_counts(ds, text_col=text_col)
           .sort(["c", "word"], descending=[True, False])
           .limit(vocab_k).take_all())
    vocab_ref = ray.put(frozenset(r["word"] for r in top))

    class _Score:
        def __init__(self):
            self.vocab = ray.get(vocab_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vocab = self.vocab
            ids = batch[id_col]
            nt = np.empty(len(batch), dtype=np.int64)
            no = np.empty(len(batch), dtype=np.int64)
            for i, t in enumerate(batch[text_col].to_pylist()):
                toks = tokenize_simple(t or "")
                nt[i] = len(toks)
                no[i] = sum(1 for x in toks if x not in vocab)
            ppm = np.where(nt > 0, no * 1_000_000 // np.maximum(nt, 1), 0)
            return pa.table({id_col: ids,
                             "n_tokens": pa.array(nt),
                             "n_oov": pa.array(no),
                             "oov_ppm": pa.array(ppm.astype(np.int64))})

    return ds.map_batches(_Score, batch_format="pyarrow", batch_size=512,
                          concurrency=2)


# -- unigram-LM perplexity (CCNet-style quality filter) -------------------------

def unigram_ppl(ds, *, text_col: str = "text", id_col: str = "doc_id",
                vocab_k: int = 10_000):
    """CCNet-style language-model quality score (Wenzek et al. 2020 §3.3
    score documents by the perplexity of an LM trained on the target
    domain): per doc, the cross-entropy of its tokens under an
    add-one-smoothed UNIGRAM model of the corpus's top-``vocab_k``
    vocabulary (ties → term ascending), in exact integer micro-nats per
    token.

    Model: ``surprisal(tok) = ln(total + V + 1) − ln(c_tok + 1)`` with
    ``c_tok = 0`` for OOV tokens (``V`` = vocabulary size, ``total`` = Σ
    vocab counts).  Each token's surprisal is floored to integer
    micro-nats BEFORE the per-doc sum, so the arithmetic is
    association-order-free and a DuckDB oracle reproduces it bit-for-bit
    (a float sum over thousands of tokens would not); ``ce_micro`` is the
    integer mean ``Σ surprisal_micro // n_tokens`` (ppl = exp(ce)).

    Scale shape: identical to :func:`oov_rate` — one word-count pass
    (per-batch partial combine, groupby-sum over DISTINCT words only,
    sort+limit to K), then the (term → surprisal_micro) table broadcasts
    via ``ray.put`` once and scoring is a pure map stage with ZERO
    corpus shuffle."""
    import ray

    from .bpe import word_counts

    top = (word_counts(ds, text_col=text_col)
           .sort(["c", "word"], descending=[True, False])
           .limit(vocab_k).take_all())
    words = np.array(sorted(r["word"] for r in top), dtype=str)
    counts = {r["word"]: int(r["c"]) for r in top}
    c_sorted = np.array([counts[w] for w in words], dtype=np.int64)
    total = int(c_sorted.sum())
    v = len(words)
    ln_norm = np.log(float(total + v + 1))
    surp = np.floor((ln_norm - np.log(c_sorted + 1.0)) * 1e6).astype(np.int64)
    s_oov = int(np.floor(ln_norm * 1e6))  # ln(0 + 1) = 0
    model_ref = ray.put((words, surp, s_oov))

    class _Score:
        def __init__(self):
            self.words, self.surp, self.s_oov = ray.get(model_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[id_col]
            nt = np.empty(len(batch), dtype=np.int64)
            toks_all: list[str] = []
            for i, t in enumerate(batch[text_col].to_pylist()):
                toks = tokenize_simple(t or "")
                nt[i] = len(toks)
                toks_all.extend(toks)
            if toks_all:
                arr = np.array(toks_all)
                if len(self.words):
                    pos = np.searchsorted(self.words, arr)
                    pos_c = np.minimum(pos, len(self.words) - 1)
                    hit = self.words[pos_c] == arr
                    s = np.where(hit, self.surp[pos_c], self.s_oov)
                else:
                    s = np.full(len(arr), self.s_oov, dtype=np.int64)
                bounds = np.concatenate([[0], np.cumsum(nt)[:-1]])
                ssum = np.add.reduceat(
                    np.concatenate([s, [0]]), bounds)
                ssum = np.where(nt > 0, ssum, 0)
            else:
                ssum = np.zeros(len(batch), dtype=np.int64)
            ce = np.where(nt > 0, ssum // np.maximum(nt, 1), 0)
            return pa.table({id_col: ids,
                             "n_tokens": pa.array(nt),
                             "ce_micro": pa.array(ce.astype(np.int64))})

    return ds.map_batches(_Score, batch_format="pyarrow", batch_size=512,
                          concurrency=2)


# -- hashed linear quality classifier (fastText-style filter) ------------------

CLS_DIM = 4096          # hashed bag-of-words feature buckets
CLS_MIX = 2654435761    # Knuth multiplicative constant for the weight table


def hashed_linear_score(ds, *, text_col: str = "text",
                        id_col: str = "doc_id", concurrency: int = 2):
    """fastText-style hashed bag-of-words linear classifier scoring — the
    quality-filter shape of GPT-3/LLaMA-class data pipelines (train a
    small linear model on curated-vs-crawl text, score every crawl doc,
    keep the positives).  Per doc:

        bucket(tok)  = md5_low64(tok) % CLS_DIM       (util.tok_hash_sql)
        w(bucket)    = (bucket * CLS_MIX) % 2001 − 1000   (milli-units)
        score_milli  = Σ_tokens w(bucket(tok))        (exact int64)
        keep         = score_milli > 0

    The weight table here is a deterministic function of the bucket index
    (no image/text models ship in this container), which keeps the DuckDB
    oracle pure-SQL and bit-exact; a TRAINED weight vector would flow
    through the identical plumbing — built once on the driver, broadcast
    via ``ray.put``, fetched in each actor's ``__init__``.

    Scale shape: broadcast model + pure map stage, ZERO corpus shuffle at
    any size; per-actor token→bucket md5 cache so each distinct token
    hashes once per actor (the ShingleHasher pattern); scoring is one
    np.take + segment reduceat per batch.  Emits one row per input doc
    (token-less docs score 0 / keep=False)."""
    import ray

    from ..util import tok_hash_sql

    weights = ((np.arange(CLS_DIM, dtype=np.int64) * CLS_MIX) % 2001
               - 1000).astype(np.int64)
    model_ref = ray.put(weights)

    class _Score:
        def __init__(self):
            self.w = ray.get(model_ref)
            self._bucket_cache: dict[str, int] = {}

        def _buckets(self, uniq_toks: np.ndarray) -> np.ndarray:
            cache = self._bucket_cache
            out = np.empty(uniq_toks.size, dtype=np.int64)
            for i, t in enumerate(uniq_toks.tolist()):
                b = cache.get(t)
                if b is None:
                    if len(cache) > 2_000_000:   # bound actor memory
                        cache.clear()
                    b = cache[t] = tok_hash_sql(t) % CLS_DIM
                out[i] = b
            return out

        def __call__(self, batch: pa.Table) -> pa.Table:
            nt = np.empty(len(batch), dtype=np.int64)
            toks_all: list[str] = []
            for i, t in enumerate(batch[text_col].to_pylist()):
                toks = tokenize_simple(t or "")
                nt[i] = len(toks)
                toks_all.extend(toks)
            if toks_all:
                arr = np.asarray(toks_all)
                uniq, inv = np.unique(arr, return_inverse=True)
                w_tok = self.w[self._buckets(uniq)][inv]
                bounds = np.concatenate([[0], np.cumsum(nt)[:-1]])
                ssum = np.add.reduceat(np.concatenate([w_tok, [0]]), bounds)
                ssum = np.where(nt > 0, ssum, 0).astype(np.int64)
            else:
                ssum = np.zeros(len(batch), dtype=np.int64)
            return pa.table({id_col: batch[id_col],
                             "n_tokens": pa.array(nt),
                             "score_milli": pa.array(ssum),
                             "keep": pa.array(ssum > 0)})

    return ds.map_batches(_Score, batch_format="pyarrow", batch_size=512,
                          concurrency=concurrency)


# -- percolation (reverse search) ----------------------------------------------

class PercolateStage:
    """ES ``percolate`` analog: a REGISTERED QUERY SET is matched against
    a document stream (reverse search — the alerting/routing primitive;
    ref: ES percolator field type).  Each registered query is
    ``(query_id, terms, min_match)``: a doc matches when at least
    ``min_match`` of the query's distinct terms occur in it.

    Scale shape: the query set is small and broadcast (actor ``__init__``
    state, like DecontamScorer's eval hashes) — matching is a pure map
    stage, ZERO shuffle at any corpus size.  Per doc, tokens fold into a
    BITMASK over the union vocabulary of all query terms (one dict probe
    per token), then every query resolves with vectorized popcounts —
    O(tokens + n_queries) per doc, independent of per-query term counts.
    Emits one row per (doc, matching query)."""

    def __init__(self, queries: list[tuple], text_col: str = "text",
                 id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        vocab: dict[str, int] = {}
        qmasks, qmin, qids = [], [], []
        for qid, terms, min_match in queries:
            mask = 0
            for t in dict.fromkeys(terms):
                if t not in vocab:
                    vocab[t] = len(vocab)
                mask |= 1 << vocab[t]
            qmasks.append(mask)
            qmin.append(int(min_match))
            qids.append(qid)
        if len(vocab) > 512:
            raise ValueError("percolator vocabulary > 512 distinct terms; "
                             "shard the query set across stages")
        self.vocab = vocab
        self.qids = np.array(qids, dtype=np.int64)
        self.qmasks = qmasks          # python ints: arbitrary width
        self.qmin = np.array(qmin, dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vocab = self.vocab
        doc_out, qid_out, n_out = [], [], []
        for did, txt in zip(batch[self.id_col].to_pylist(),
                            batch[self.text_col].to_pylist()):
            mask = 0
            for t in tokenize_simple(txt or ""):
                b = vocab.get(t)
                if b is not None:
                    mask |= 1 << b
            if mask == 0 and self.qmin.min(initial=1) > 0:
                continue
            for qi, (qm, qn) in enumerate(zip(self.qmasks, self.qmin)):
                hits = (mask & qm).bit_count()
                if hits >= qn:
                    doc_out.append(did)
                    qid_out.append(self.qids[qi])
                    n_out.append(hits)
        return pa.table({
            self.id_col: pa.array(doc_out, pa.int64()),
            "query_id": pa.array(qid_out, pa.int64()),
            "n_matched": pa.array(n_out, pa.int64()),
        })


def percolate(ds, queries: list[tuple], *, text_col: str = "text",
              id_col: str = "doc_id", concurrency: int = 2):
    """Match every doc against the registered query set — one row per
    (doc, query) hit with the matched-term count.  Pure broadcast map."""
    return ds.map_batches(PercolateStage, batch_format="pyarrow",
                          batch_size=512, concurrency=concurrency,
                          fn_constructor_kwargs={"queries": queries,
                                                 "text_col": text_col,
                                                 "id_col": id_col})


def compression_ratio_batch(batch: pa.Table, *, text_col: str = "text",
                            level: int = 6) -> pa.Table:
    """Per-doc zlib compression ratio in integer micro-units —
    ``len(compress(utf8)) · 1e6 // max(len(utf8), 1)`` — the
    compressibility quality signal from web-corpus filtering (highly
    repetitive/boilerplate pages compress far below prose; random noise
    compresses above it).  Deterministic for a fixed zlib level; the
    compressor is C-speed so the Python loop is I/O shaping only, not
    the bottleneck.  No SQL analog (zlib), so the driver entry is
    rows-only; the pytest asserts the discriminative ordering
    repetitive < prose < noise."""
    import zlib
    ratios = []
    for t in batch[text_col].to_pylist():
        raw = (t or "").encode("utf-8")
        ratios.append(len(zlib.compress(raw, level)) * 1_000_000
                      // max(len(raw), 1))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_bytes": pa.array(
            [len((t or "").encode("utf-8"))
             for t in batch[text_col].to_pylist()], pa.int64()),
        "compression_micro": pa.array(ratios, pa.int64()),
    })


class KeywordExtractor:
    """Per-doc top-k TF-IDF keyword extraction with a BROADCAST global-df
    side table — the canonical broadcast-join shape: the (term → df) map
    is `ray.put` once and read in each actor's ``__init__`` (never
    re-shipped per batch); documents stream through embarrassingly
    parallel.  Vocabulary is Heaps-sublinear in corpus size, and a 100-TB
    deployment would cap the broadcast at the top-M terms by df (rare
    terms are always keywords; treat df_min as 1) — the synthetic vocab
    fits whole.

    Scoring mirrors :meth:`Searcher.more_like_this`'s tf·idf micro units
    op-for-op — ``floor(tf · ln(1 + (N − df + 0.5)/(df + 0.5)) · 1e6)``
    — so the DuckDB oracle is bit-identical.  Emits
    (doc_id, rank, term, score_micro), rank 1..top by (−score, term)."""

    def __init__(self, df_ref, n_docs: int, top: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray
        self.df = ray.get(df_ref) if not isinstance(df_ref, dict) else df_ref
        self.n = int(n_docs)
        self.top = top
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math
        from collections import Counter
        dids, ranks, terms, scores = [], [], [], []
        for did, txt in zip(batch[self.id_col].to_pylist(),
                            batch[self.text_col].to_pylist()):
            c = Counter(tokenize_simple(txt or ""))
            scored = sorted(
                (-math.floor(tf * math.log(
                    1 + (self.n - self.df.get(t, 1) + 0.5)
                    / (self.df.get(t, 1) + 0.5)) * 1_000_000), t)
                for t, tf in c.items())[:self.top]
            for r, (neg, t) in enumerate(scored, 1):
                dids.append(did)
                ranks.append(r)
                terms.append(t)
                scores.append(-neg)
        return pa.table({
            "doc_id": pa.array(dids, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "score_micro": pa.array(scores, pa.int64()),
        })
