"""Multi-epoch query serving over delta-segment chains (Lucene model).

A chain is (last full epoch, delta epoch, delta epoch, ...) — see
``pipelines/epochs.py mode="delta"``.  Each delta epoch carries its own
small segments plus a DEAD-docid set (old versions of docs it
updated/deleted).  A query:

1. decodes each query term's posting lists in EVERY chain epoch (full
   decode — stored block maxes of older epochs were baked with stale
   global stats, so pruning with them would be unsound; lists are
   O(term df), not corpus-sized);
2. suppresses, per epoch, docids dead in any LATER epoch (vectorized
   searchsorted against the sorted union);
3. computes df exactly as the surviving posting count and scores with the
   exact CURRENT global stats (cum_stats.json — maintained by tokenizing
   only the O(delta) old versions at epoch build time).

Result: rank- AND score-identical to a from-scratch rebuild of the final
snapshot — verified by ``tests/test_delta_epochs.py``.  Compaction (a
``mode="full"`` epoch) collapses the chain and restores block-max pruning.
"""

from __future__ import annotations

import os

import numpy as np

from ..pipelines.epochs import epoch_chain, epoch_dir
from ..util import read_json
from .bm25 import BM25Params, term_scores
from .searcher import Searcher


def _isin_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    if sorted_arr.size == 0 or values.size == 0:
        return np.zeros(values.size, dtype=bool)
    idx = np.searchsorted(sorted_arr, values)
    idx = np.minimum(idx, sorted_arr.size - 1)
    return sorted_arr[idx] == values


class MultiEpochSearcher:
    def __init__(self, index_root: str):
        self.chain = epoch_chain(index_root)
        self.entries = []  # (epoch, Searcher|None, dead_after: sorted int64[])
        deads = {}
        for e, mode in self.chain:
            ed = epoch_dir(index_root, e)
            dp = os.path.join(ed, "dead_docids.npy")
            deads[e] = np.load(dp) if os.path.exists(dp) else \
                np.empty(0, dtype=np.int64)
        for i, (e, mode) in enumerate(self.chain):
            later = [deads[e2] for e2, _ in self.chain[i + 1:]]
            dead_after = np.unique(np.concatenate(later)) if later else \
                np.empty(0, dtype=np.int64)
            ed = epoch_dir(index_root, e)
            s = None
            if os.path.exists(os.path.join(ed, "stats.json")):
                st = read_json(os.path.join(ed, "stats.json"))
                s = Searcher(index_root, epoch=e) if st.get("n_docs") else None
            self.entries.append((e, s, dead_after))
        # exact current global stats
        last_e, last_mode = self.chain[-1]
        led = epoch_dir(index_root, last_e)
        cum_p = os.path.join(led, "cum_stats.json")
        cum = read_json(cum_p) if os.path.exists(cum_p) else \
            read_json(os.path.join(led, "stats.json"))
        self.stats = cum
        self.params = BM25Params(k1=cum["k1"], b=cum["b"],
                                 n_docs=cum["n_docs"],
                                 avgdl=cum.get("avgdl",
                                               (cum["total_tokens"]
                                                / max(1, cum["n_docs"]))))
        self.analyze = None
        for _, s, _ in self.entries:
            if s is not None:
                self.analyze = s.analyze
                break

    def _surviving_lists(self, term: str, filters: dict | None = None):
        """(docids, tfs, dls, df) of the term across the chain after
        dead-docid suppression — each docid appears at most once (its live
        version).  ``df`` is the SUPPRESSED-but-UNFILTERED count (ES filter
        semantics: filters restrict candidates, never the statistics);
        filter predicates evaluate against each doc's LIVE epoch's
        docvalues."""
        ds, tfs, dls = [], [], []
        df = 0
        for _, s, dead_after in self.entries:
            if s is None:
                continue
            for row in s._lookup([term]).get(term) or []:
                d, tf, dl = s._decode_list(row)  # full decode (no pruning)
                if d.size == 0:
                    continue
                if dead_after.size:
                    keep = ~_isin_sorted(d.astype(np.int64), dead_after)
                    if not keep.any():
                        continue
                    d, tf, dl = d[keep], tf[keep], dl[keep]
                df += int(d.size)
                if filters:
                    m = s.fields.mask(d.astype(np.int64), filters)
                    if not m.any():
                        continue
                    d, tf, dl = d[m], tf[m], dl[m]
                ds.append(d)
                tfs.append(tf)
                dls.append(dl)
        if not ds:
            e = np.empty(0, dtype=np.uint64)
            return e, e, e, df
        return (np.concatenate(ds), np.concatenate(tfs),
                np.concatenate(dls), df)

    def search_terms(self, terms: list[str], k: int = 10,
                     filters: dict | None = None):
        """Exact top-k over the epoch chain; identical semantics (and
        results) to ``Searcher.search_terms`` on a full rebuild."""
        mult: dict[str, int] = {}
        for t in terms:
            mult[t] = mult.get(t, 0) + 1
        all_d, all_s = [], []
        p = self.params
        for t, m in mult.items():
            d, tf, dl, df = self._surviving_lists(t, filters=filters)
            if d.size == 0 or df == 0:
                continue
            all_d.append(d)
            all_s.append(m * term_scores(tf, dl, df, p))
        if not all_d:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        docids = np.concatenate(all_d)
        scores = np.concatenate(all_s)
        uniq, inv = np.unique(docids, return_inverse=True)
        acc = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(acc, inv, scores)
        kk = min(k, uniq.size)
        top = np.lexsort((uniq, -acc))[:kk]
        return uniq[top].astype(np.int64), acc[top]

    def search(self, query: str, k: int = 10, filters: dict | None = None):
        if self.analyze is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        return self.search_terms(self.analyze(query), k=k, filters=filters)

    def match_phrase(self, phrase: str | list[str], k: int = 10,
                     filters: dict | None = None, slop: int = 0):
        """Phrase top-k over the chain: per-epoch positional matching
        (each doc's live version lives in exactly one epoch after
        suppression), scored by BM25 over the phrase terms with the exact
        CURRENT global stats — identical to a full-rebuild match_phrase."""
        if isinstance(phrase, str) and self.analyze is None:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        terms = (self.analyze(phrase) if isinstance(phrase, str)
                 else list(phrase))
        if not terms:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        matched = []
        for _, s, dead_after in self.entries:
            if s is None:
                continue
            d = s.phrase_match_docs(terms, slop=slop)
            if d.size and dead_after.size:
                d = d[~_isin_sorted(d, dead_after)]
            if d.size:
                matched.append(d)
        if not matched:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        md = np.unique(np.concatenate(matched))
        if filters:
            md = md[self.fields_mask(md, filters)]
            if md.size == 0:
                return (np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.float64))
        # score matched docs: Σ over UNIQUE phrase terms, current stats
        p = self.params
        acc = np.zeros(md.size, dtype=np.float64)
        for t in dict.fromkeys(terms):
            d, tf, dl, df = self._surviving_lists(t)
            if d.size == 0:
                continue
            idx = np.searchsorted(md, d.astype(np.int64))
            idx = np.minimum(idx, md.size - 1)
            hit = md[idx] == d.astype(np.int64)
            sc = term_scores(tf, dl, df, p)
            np.add.at(acc, idx[hit], sc[hit])
        top = np.lexsort((md, -acc))[:k]
        return md[top], acc[top]

    def _resolve_live(self, docids: np.ndarray) -> np.ndarray:
        """Per docid: the index (into self.entries) of its LIVE epoch, or
        -1.  A docid is live in the latest epoch whose docvalues contain it
        AND whose copy is not suppressed by a later epoch's dead set — a
        deleted doc therefore resolves nowhere (parity with a full
        rebuild, where it simply doesn't exist)."""
        src = np.full(docids.size, -1, dtype=np.int64)
        resolved = np.zeros(docids.size, dtype=bool)
        for i in range(len(self.entries) - 1, -1, -1):
            _, s, dead_after = self.entries[i]
            if s is None:
                continue
            fs = s.fields
            if fs.is_empty:
                continue
            found = fs.contains(docids)
            present = found & ~resolved
            if dead_after.size:
                present &= ~_isin_sorted(docids, dead_after)
            src[present] = i
            resolved |= present
        return src

    def fields_mask(self, docids: np.ndarray, filters: dict) -> np.ndarray:
        """Filter mask resolving each docid against its LIVE epoch's
        docvalues; suppressed/deleted docids never match."""
        docids = np.asarray(docids, dtype=np.int64)
        out = np.zeros(docids.size, dtype=bool)
        src = self._resolve_live(docids)
        for i in np.unique(src[src >= 0]):
            sel = src == i
            fs = self.entries[int(i)][1].fields
            out[sel] = fs.mask(docids[sel], filters)
        return out

    def get_fields(self, docids: np.ndarray, cols: list[str]) -> dict:
        """Docstore retrieval across the chain (live epoch wins);
        suppressed/deleted or unknown docids yield null."""
        import pyarrow as pa
        docids = np.asarray(docids, dtype=np.int64)
        vals: dict[str, list] = {c: [None] * docids.size for c in cols}
        src = self._resolve_live(docids)
        for i in np.unique(src[src >= 0]):
            sel = np.flatnonzero(src == i)
            fs = self.entries[int(i)][1].fields
            got = fs.get(docids[sel], cols)  # vectorized, null-masked
            for c in cols:
                pyvals = got[c].to_pylist()
                for j, v in zip(sel, pyvals):
                    vals[c][j] = v
        return {c: pa.array(v) for c, v in vals.items()}
