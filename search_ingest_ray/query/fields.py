"""Docvalues / docstore reader: typed per-document field columns keyed by
docid, powering filtered BM25 and document retrieval.

This is the query half of the reference's typed field mappings — every
non-text column of a managed table is queryable by exact term / range
(/root/reference/src/search-ingest/schemas.cr:211-222; the reference
delegates the storage to Elasticsearch doc_values, here it is a per-chunk
Parquet sidecar written by ``build_index(store_fields=...)``).

Load shape: all sidecar chunks concatenate into docid-sorted parallel
arrays; lookups are ``np.searchsorted`` — O(log n) per candidate docid,
vectorized over the whole candidate set.

Scale note (partitioning assumption, SURVEY §2.2 custom-operator rule): a
single FieldStore materializes the docvalues of ONE index partition.  At
10^12 docs the sidecar is docid-range partitioned and each query actor
holds only its range; this sandbox serves whole small indexes per actor, so
the store loads every chunk.  Filters are evaluated ONLY on candidate
docids produced by the term index — never as a full scan.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class FieldStore:
    def __init__(self, epoch_dir: str):
        fdir = os.path.join(epoch_dir, "fields")
        files = sorted(
            os.path.join(r, f) for r, _, fs in os.walk(fdir)
            for f in fs if f.endswith(".parquet")) if os.path.isdir(fdir) else []
        if not files:
            self.docids = np.empty(0, dtype=np.int64)
            self.columns: dict[str, np.ndarray] = {}
            return
        tbl = pa.concat_tables([pq.read_table(f) for f in files],
                               promote_options="default").combine_chunks()
        d = tbl["docid"].to_numpy()
        order = np.argsort(d, kind="stable")
        # duplicate source ids (same url twice) are degenerate input: keep
        # the last occurrence.  NOTE the posting fold resolves duplicates
        # per (term, docid) by max tf (build.py), so stored fields and
        # indexed text may come from different duplicate rows — dedupe
        # upstream (exact_dedup / fold) when attribution matters.
        d = d[order]
        keep = np.concatenate([d[1:] != d[:-1], [True]]) if d.size else \
            np.empty(0, dtype=bool)
        sel = order[keep] if d.size else order
        self.docids = d[keep] if d.size else d
        self.columns = {}
        for name in tbl.column_names:
            if name == "docid":
                continue
            col = tbl[name].combine_chunks().take(pa.array(sel, pa.int64()))
            self.columns[name] = col.to_numpy(zero_copy_only=False)

    @property
    def field_names(self) -> list[str]:
        return sorted(self.columns)

    def _locate(self, docids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        idx = np.searchsorted(self.docids, docids)
        idx = np.minimum(idx, max(0, len(self.docids) - 1))
        found = (self.docids[idx] == docids) if len(self.docids) else \
            np.zeros(len(docids), dtype=bool)
        return idx, found

    def mask(self, docids: np.ndarray, filters: dict) -> np.ndarray:
        """Vectorized predicate over candidate docids.

        ``filters``: {col: spec} where spec is
        - a scalar            → exact term match,
        - ``("in", [v, ...])``→ membership,
        - ``("range", lo, hi)``→ lo ≤ value ≤ hi (None = unbounded).
        Docids absent from the store never match.
        """
        docids = np.asarray(docids, dtype=np.int64)
        idx, ok = self._locate(docids)
        for col, spec in filters.items():
            vals = self.columns[col][idx]
            if isinstance(spec, tuple) and len(spec) and spec[0] == "in":
                m = np.isin(vals, np.asarray(list(spec[1]), dtype=vals.dtype)
                            if vals.dtype != object else list(spec[1]))
            elif isinstance(spec, tuple) and len(spec) == 3 and spec[0] == "range":
                _, lo, hi = spec
                m = np.ones(len(vals), dtype=bool)
                if lo is not None:
                    m &= vals >= lo
                if hi is not None:
                    m &= vals <= hi
            else:
                m = vals == spec
            ok &= np.asarray(m, dtype=bool)
        return ok

    def get(self, docids: np.ndarray, cols: list[str]) -> dict[str, pa.Array]:
        """Field values for docids (docstore retrieval) as Arrow arrays;
        docids absent from the store yield NULL (never a neighbor's
        values)."""
        docids = np.asarray(docids, dtype=np.int64)
        idx, found = self._locate(docids)
        missing = ~found
        return {c: pa.array(self.columns[c][idx].tolist(),
                            mask=missing if missing.any() else None)
                for c in cols}
