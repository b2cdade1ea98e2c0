"""Ingestion sources beyond Parquet.

The engine's canonical storage is the bucketed Parquet snapshot
(pipelines/epochs.py) — these modules normalize external web-corpus
formats into Ray Datasets that feed it.  The reference's only sources
are a PostgreSQL backfill scan and a RethinkDB changefeed
(/root/reference/src/search-ingest/table.cr) — WET/WARC is the
webtext-corpus analogue this engine adds for Common Crawl-style inputs.
"""

from .wet import parse_warc, read_wet, wet_bytes, write_wet  # noqa: F401
