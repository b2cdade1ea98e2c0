"""search_ingest_ray — a Ray-Data-native full-text index & BM25 query engine.

From-scratch re-expression of the capabilities of PlaceOS/search-ingest
(reference at /root/reference, Crystal) on Ray Data:

- the reference's ingest/propagation/consistency semantics (schema mapping,
  parent-child replication with routing, upsert/delete changefeed folds,
  reindex/backfill lifecycle), and
- the indexing/scoring work the reference delegates to Elasticsearch
  (analysis chain, inverted-index build with delta+varint compression and
  block-max skip metadata, BM25 top-k via block-max WAND).

Everything is built on public Ray Data / pyarrow APIs only.
"""

__version__ = "0.1.0"
