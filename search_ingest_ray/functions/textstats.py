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

# Per-language frequent-word profiles for the n-gram/word language-ID
# heuristic (deterministic, no external models).
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "quick",
           "fox", "dog", "over"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "für", "über",
           "straße", "können", "schön", "fünf"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "dans", "être",
           "café", "déjà", "façon", "forêt"},
    "es": {"el", "la", "los", "y", "es", "no", "por", "para", "con", "niño",
           "señor", "mañana", "años"},
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch[self.text_col].to_pylist():
            toks = set(tokenize_simple(t or ""))
            best, best_score = "und", 0
            for lang, prof in self.profiles:
                s = len(toks & prof)
                if s > best_score:
                    best, best_score = lang, s
            preds.append(best)
        return batch.append_column(self.out_col, pa.array(preds, pa.string()))


_FP_BASE = 1099511628211
_FP_SEED = 14695981039346656037
_FP_MASK = (1 << 64) - 1


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text",
                      out_col: str = "fingerprint") -> pa.Table:
    """63-bit rolling (FNV-style) fingerprint of the simple-analyzed token
    sequence — whitespace/punct-insensitive exact-duplicate key."""
    fps = np.empty(batch.num_rows, dtype=np.int64)
    for i, t in enumerate(batch[text_col].to_pylist()):
        h = _FP_SEED
        for tok in tokenize_simple(t or ""):
            for byt in tok.encode():
                h = ((h ^ byt) * _FP_BASE) & _FP_MASK
            h = ((h ^ 0x20) * _FP_BASE) & _FP_MASK  # token separator
        fps[i] = h & 0x7FFFFFFFFFFFFFFF
    return batch.append_column(out_col, pa.array(fps))
