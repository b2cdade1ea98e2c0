"""WET / WARC source — Common Crawl-style web-text ingestion.

WARC 1.0 (ISO 28500) frames records as::

    WARC/1.0\r\n
    WARC-Type: conversion\r\n
    WARC-Target-URI: http://example.org/\r\n
    WARC-Date: 2020-01-01T00:00:00Z\r\n
    Content-Length: 12\r\n
    \r\n
    <12 payload bytes>\r\n
    \r\n

A WET file is a WARC file whose content records are ``WARC-Type:
conversion`` (extracted plain text), usually gzip-compressed, one file
per ~150 MB shard.  This module provides:

- :func:`parse_warc` — tolerant single-buffer record parser (pure
  stdlib; handles gzip members, ``\\n``-only framing, truncated tails);
- :func:`wet_bytes` / :func:`write_wet` — spec-framed writers (fixtures
  and round-trip proofs);
- :func:`read_wet` — the Ray Data reader: one task per WET file (the
  file IS the parallelism unit at corpus scale — Common Crawl publishes
  ~64k WET shards per crawl, far exceeding any cluster's slot count, so
  per-file tasks saturate a 256-node cluster without splitting inside a
  gzip stream, which is impossible anyway: .gz members are not
  seekable).

Scale notes: payload bytes move zero-copy from ``read_binary_files``
blocks into Arrow ``large_string`` columns; the per-record Python cost
is header parsing only (a few dozen bytes per ~10 KB document).  The
emitted Dataset feeds the same snapshot/index pipeline as Parquet
inputs (``pipelines.epochs.apply_delta_epoch`` via a ``write_parquet``
normalization, or ``index.build.build_index`` directly).
"""

from __future__ import annotations

import gzip

import pyarrow as pa

_GZ_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == _GZ_MAGIC:
        # concatenated gzip members (Common Crawl writes one member per
        # record in raw WARCs; WET shards are usually one member) — the
        # stdlib decompresses all members when using gzip.decompress
        return gzip.decompress(data)
    return data


def parse_warc(data: bytes, *, record_types: tuple[str, ...] | None =
               ("conversion",), strict: bool = False) -> dict[str, list]:
    """Parse a WARC/WET buffer into ``{"url": [...], "date": [...],
    "text": [...]}`` (payloads UTF-8-decoded with replacement).

    Tolerant by default: ``\\r\\n`` or ``\\n`` framing, case-insensitive
    header names, warcinfo/request/metadata records skipped (or all
    kept when ``record_types=None``), and a truncated tail (the common
    failure of an interrupted shard download) ends the parse cleanly
    with every complete record retained.  ``strict=True`` raises
    ``ValueError`` on any framing violation instead.
    """
    data = _maybe_gunzip(data)
    urls: list[str] = []
    dates: list[str] = []
    texts: list[str] = []
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            if strict:
                raise ValueError(f"expected WARC version line at byte {pos}")
            break
        # header block ends at the first blank line
        hdr_end = data.find(b"\n\n", pos)
        hdr_end_crlf = data.find(b"\r\n\r\n", pos)
        if hdr_end_crlf != -1 and (hdr_end == -1 or hdr_end_crlf < hdr_end):
            hdr_end, body = hdr_end_crlf, hdr_end_crlf + 4
        elif hdr_end != -1:
            body = hdr_end + 2
        else:
            if strict:
                raise ValueError("unterminated WARC header block")
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\n")[1:]:
            line = line.rstrip(b"\r")
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = \
                    v.strip().decode("utf-8", "replace")
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError("missing/invalid Content-Length "
                                 f"in record at byte {pos}")
            break
        if body + clen > n:
            if strict:
                raise ValueError("truncated payload in record "
                                 f"at byte {pos}")
            break
        rtype = headers.get("warc-type", "").lower()
        if record_types is None or rtype in record_types:
            uri = headers.get("warc-target-uri")
            if uri is not None:
                urls.append(uri)
                dates.append(headers.get("warc-date", ""))
                texts.append(data[body:body + clen]
                             .decode("utf-8", "replace"))
        pos = body + clen
    return {"url": urls, "date": dates, "text": texts}


_WARCINFO_PAYLOAD = b"software: search-ingest-ray\r\nformat: WARC File Format 1.0\r\n"


def wet_bytes(urls, texts, dates=None, *, warcinfo: bool = True) -> bytes:
    """Render parallel url/text sequences as a spec-framed WET buffer."""
    if dates is None:
        dates = ["2020-01-01T00:00:00Z"] * len(urls)
    out = bytearray()
    if warcinfo:
        out += (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Type: application/warc-fields\r\n"
                b"Content-Length: %d\r\n\r\n" % len(_WARCINFO_PAYLOAD))
        out += _WARCINFO_PAYLOAD + b"\r\n\r\n"
    for url, text, date in zip(urls, texts, dates):
        payload = text.encode("utf-8")
        out += (b"WARC/1.0\r\n"
                b"WARC-Type: conversion\r\n"
                b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
                b"WARC-Date: " + date.encode("ascii") + b"\r\n"
                b"Content-Type: text/plain\r\n"
                b"Content-Length: %d\r\n\r\n" % len(payload))
        out += payload + b"\r\n\r\n"
    return bytes(out)


def write_wet(path: str, urls, texts, dates=None) -> str:
    """Write a WET file; a ``.gz`` suffix selects gzip compression."""
    blob = wet_bytes(urls, texts, dates)
    if path.endswith(".gz"):
        blob = gzip.compress(blob, compresslevel=1)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    import os
    os.replace(tmp, path)
    return path


def _records_table(blob: bytes, path: str | None,
                   record_types, include_path: bool) -> pa.Table:
    rec = parse_warc(blob, record_types=record_types)
    cols = {
        "url": pa.array(rec["url"], pa.string()),
        "date": pa.array(rec["date"], pa.string()),
        "text": pa.array(rec["text"], pa.large_string()),
    }
    if include_path:
        cols["path"] = pa.array([path or ""] * len(rec["url"]), pa.string())
    return pa.table(cols)


def read_wet(paths, *, record_types: tuple[str, ...] | None = ("conversion",),
             include_path: bool = False, concurrency: int | None = None):
    """Read WET/WARC files (plain or .gz) as a Ray Dataset of
    ``(url, date, text[, path])`` conversion records.

    ``batch_size=1`` pins one FILE per parse task: a WET shard
    decompresses ~4-5× (150 MB → ~700 MB of text), so one shard per
    task bounds worker heap regardless of cluster size, and shard count
    (not file size) carries the parallelism.
    """
    import ray.data as rd

    def _parse(batch: pa.Table) -> pa.Table:
        tables = [
            _records_table(blob.as_py(), p, record_types, include_path)
            for blob, p in zip(batch["bytes"],
                               batch["path"] if "path" in
                               batch.column_names else [None] * len(batch))
        ]
        return pa.concat_tables(tables) if tables else _records_table(
            b"", None, record_types, include_path)

    ds = rd.read_binary_files(paths, include_paths=True)
    kw = {"concurrency": concurrency} if concurrency else {}
    return ds.map_batches(_parse, batch_format="pyarrow", batch_size=1, **kw)
