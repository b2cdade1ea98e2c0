"""Flagship pipeline: build the inverted index over a corpus and serve a
query set — the end-to-end path the reference covers with
reindex → backfill → (ES) query (/root/reference/src/search-ingest/table.cr).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa

from ..index.build import build_index
from ..query.searcher import Searcher

_CACHE_BASE = "/tmp/search_ingest_ray_cache"


def documents_index(sf_dir: str, analyzer: str = "simple",
                    cache_base: str = _CACHE_BASE,
                    with_positions: bool = False,
                    store_fields: tuple[str, ...] = ()) -> str:
    """Build (once, cached+resumable) the index for an sf documents table.

    The cache key includes path + analyzer + format + positions + stored
    fields; the _BUILT marker bypasses build_index (and its meta
    consistency check), so any spec change must land in a fresh directory."""
    doc_path = os.path.join(sf_dir, "documents.parquet")
    sf_key = ",".join(sorted(store_fields))
    key = hashlib.sha1(
        f"{doc_path}:{analyzer}:v2-termdict-bin:pos={with_positions}:f={sf_key}"
        .encode()).hexdigest()[:16]
    root = os.path.join(cache_base, f"documents-{key}")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        build_index([doc_path], root, text_col="text", id_col="doc_id",
                    id_is_int=True, analyzer=analyzer,
                    num_term_partitions=8, chunk_files=4,
                    with_positions=with_positions,
                    store_fields=list(store_fields) or None,
                    hot_df_threshold=10**9)  # no salting needed at sf scale
        with open(marker, "w") as f:
            f.write("ok")
    return root


def run_query_set(index_root: str, queries: list[list[str]], k: int = 10) -> pa.Table:
    """Serve a fixed query set; returns (query_id, rank, doc_id, score)."""
    s = Searcher(index_root)
    qids, ranks, docids, scores = [], [], [], []
    for qi, terms in enumerate(queries):
        d, sc = s.search_terms(terms, k=k)
        qids.extend([qi] * len(d))
        ranks.extend(range(1, len(d) + 1))
        docids.extend(d.tolist())
        scores.extend(sc.tolist())
    return pa.table({
        "query_id": pa.array(qids, pa.int64()),
        "rank": pa.array(ranks, pa.int32()),
        "doc_id": pa.array(docids, pa.int64()),
        "score": pa.array(scores, pa.float64()),
    })
