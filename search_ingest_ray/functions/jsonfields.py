"""Schema-on-read JSON field extraction — the ingest-time analog of the
reference's core job: RethinkDB documents are schemaless JSON, and
search-ingest projects them into typed Elasticsearch fields via the
per-table type mapping (``/root/reference/src/search-ingest/schemas.cr``
type_mapping).  Here a JSON payload column (e.g. ``events.props``) is
projected into typed Arrow columns with one vectorized pass.

Engine: polars' ``str.json_path_match`` (a Rust JSONPath kernel over the
Arrow buffer — no per-row Python, malformed JSON and missing paths become
nulls, matching SQL ``json_extract`` semantics).  The round-trip
pl.from_arrow / to_arrow is zero-copy for string columns.

Scale shape: a pure ``map_batches`` stage — no shuffle, no state; cost is
linear in payload bytes and identical per batch at any corpus size.
"""

from __future__ import annotations

import pyarrow as pa

_CASTS = {
    "int64": pa.int64(),
    "float64": pa.float64(),
    "string": pa.string(),
    "bool": pa.bool_(),
}


def extract_json_fields(batch: pa.Table, *, json_col: str,
                        fields: dict[str, tuple[str, str]]) -> pa.Table:
    """Append one typed column per ``fields`` entry.

    ``fields``: ``{out_col: (jsonpath, dtype)}`` with dtype one of
    ``int64|float64|string|bool``.  Missing paths / malformed JSON /
    uncastable values yield nulls (SQL ``json_extract`` semantics, so the
    DuckDB oracle matches row for row).
    """
    import polars as pl

    col = batch[json_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pl.from_arrow(col.cast(pa.large_string()))
    for out_col, (path, dtype) in fields.items():
        if dtype not in _CASTS:
            raise ValueError(f"unsupported dtype {dtype!r} for {out_col!r}")
        raw = s.str.json_path_match(path)
        if dtype == "bool":
            # JSONPath returns the literal text; accept true/false only
            typed = (raw.str.to_lowercase()
                     .replace_strict({"true": True, "false": False},
                                     default=None, return_dtype=pl.Boolean))
        elif dtype == "string":
            typed = raw
        else:
            typed = raw.cast(pl.Int64 if dtype == "int64" else pl.Float64,
                             strict=False)
        arr = typed.to_arrow().cast(_CASTS[dtype])
        batch = batch.append_column(out_col, arr)
    return batch


def json_fields_stage(ds, *, json_col: str,
                      fields: dict[str, tuple[str, str]],
                      drop_payload: bool = False):
    """Dataset-level wrapper: one vectorized projection pass; optionally
    drop the raw payload column afterwards (the typical ingest shape —
    at 100 TB the payload bytes should not ride through later stages)."""
    import functools

    def kern(batch: pa.Table) -> pa.Table:
        out = extract_json_fields(batch, json_col=json_col, fields=fields)
        return out.drop_columns([json_col]) if drop_payload else out

    return ds.map_batches(functools.partial(kern), batch_format="pyarrow")
