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
                    store_fields: tuple[str, ...] = (),
                    text_col: str = "text") -> str:
    """Build (once, cached+resumable) the index for an sf documents table.

    ``text_col`` selects WHICH column is the indexed text field — ES
    multi-field search is per-field inverted lists with per-field stats,
    so a multi_match over (text, source) is two of these indexes combined
    at query time (:func:`search_ingest_ray.query.searcher.multi_match`).

    The cache key includes path + analyzer + format + positions + stored
    fields (+ text_col when non-default); the _BUILT marker bypasses
    build_index (and its meta consistency check), so any spec change must
    land in a fresh directory."""
    doc_path = os.path.join(sf_dir, "documents.parquet")
    sf_key = ",".join(sorted(store_fields))
    tc_key = "" if text_col == "text" else f":tc={text_col}"
    key = hashlib.sha1(
        f"{doc_path}:{analyzer}:v2-termdict-bin:pos={with_positions}:f={sf_key}"
        f"{tc_key}".encode()).hexdigest()[:16]
    root = os.path.join(cache_base, f"documents-{key}")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        build_index([doc_path], root, text_col=text_col, id_col="doc_id",
                    id_is_int=True, analyzer=analyzer,
                    num_term_partitions=8, chunk_files=4,
                    with_positions=with_positions,
                    store_fields=list(store_fields) or None,
                    hot_df_threshold=10**9)  # no salting needed at sf scale
        with open(marker, "w") as f:
            f.write("ok")
    return root


def geo_coords(doc_id):
    """Deterministic synthetic geo_point per doc (no geo column exists in
    the test tables): lat ∈ [-60, 60], lon ∈ [-170, 170] derived from
    doc_id by modular hashing.  The reduce-before-multiply form keeps the
    intermediate < 2^31 so the identical expression runs overflow-free in
    both numpy int64 and the DuckDB BIGINT oracle."""
    import numpy as np
    did = np.asarray(doc_id, dtype=np.int64)
    lat = -60.0 + ((did % 120001) * 7919 % 120001) / 1000.0
    lon = -170.0 + ((did % 340001) * 104729 % 340001) / 1000.0
    return lat, lon


# the same derivation as ANSI SQL (keep bit-identical to geo_coords)
GEO_LAT_SQL = "(-60.0 + ((doc_id % 120001) * 7919 % 120001) / 1000.0)"
GEO_LON_SQL = "(-170.0 + ((doc_id % 340001) * 104729 % 340001) / 1000.0)"


def geo_envelope(doc_id):
    """Deterministic synthetic geo_shape ENVELOPE per doc: centered on
    geo_coords with half-extents 0.5 + (id%7)/2 lat, 0.5 + (id%11)/2 lon
    degrees.  Two additions/subtractions on the point derivation — keep
    bit-identical to GEO_ENV_SQL."""
    import numpy as np
    did = np.asarray(doc_id, dtype=np.int64)
    lat, lon = geo_coords(did)
    dlat = 0.5 + (did % 7) / 2.0
    dlon = 0.5 + (did % 11) / 2.0
    return lat - dlat, lat + dlat, lon - dlon, lon + dlon


GEO_ENV_SQL = {
    "lat_min": f"({GEO_LAT_SQL} - (0.5 + (doc_id % 7) / 2.0))",
    "lat_max": f"({GEO_LAT_SQL} + (0.5 + (doc_id % 7) / 2.0))",
    "lon_min": f"({GEO_LON_SQL} - (0.5 + (doc_id % 11) / 2.0))",
    "lon_max": f"({GEO_LON_SQL} + (0.5 + (doc_id % 11) / 2.0))",
}


def documents_geo_index(sf_dir: str, cache_base: str = _CACHE_BASE) -> str:
    """Build (once, cached) a documents index whose docvalues carry the
    synthetic geo_point pair (geo_lat, geo_lon) — the fixture behind the
    geo_distance / geo_bounding_box filter queries."""
    import glob

    import numpy as np
    import ray.data as rd

    doc_path = os.path.join(sf_dir, "documents.parquet")
    key = hashlib.sha1(
        f"{doc_path}:simple:v2-termdict-bin:geo-v4".encode()).hexdigest()[:16]
    root = os.path.join(cache_base, f"documents-geo-{key}")
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root

    src_dir = os.path.join(root, "geo_src")
    os.makedirs(src_dir, exist_ok=True)

    def add_geo(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = geo_coords(did)
        a, b, c, d = geo_envelope(did)
        # nullable altitude (exists-query fixture): null when id % 5 == 0
        alt = pa.array(np.where(did % 5 == 0, None,
                                (did % 9000 - 1000).astype(object)),
                       pa.int64())
        # deterministic synthetic IPv4 (ES `ip` type fixture): the cidr
        # filter's dotted-quad parse must reproduce these octets exactly,
        # so the SQL oracle can test the octet arithmetic directly
        ip = pa.array([f"10.{(i * 7) % 256}.{(i * 13) % 256}.{i % 256}"
                       for i in did.tolist()], pa.string())
        return (t.append_column("ip", ip)
                 .append_column("geo_lat", pa.array(lat, pa.float64()))
                 .append_column("geo_lon", pa.array(lon, pa.float64()))
                 .append_column("shape_lat_min", pa.array(a, pa.float64()))
                 .append_column("shape_lat_max", pa.array(b, pa.float64()))
                 .append_column("shape_lon_min", pa.array(c, pa.float64()))
                 .append_column("shape_lon_max", pa.array(d, pa.float64()))
                 .append_column("alt_m", alt))

    (rd.read_parquet(doc_path, columns=["doc_id", "text", "lang"])
       .map_batches(add_geo, batch_format="pyarrow")
       .write_parquet(src_dir))
    build_index(sorted(glob.glob(os.path.join(src_dir, "*.parquet"))), root,
                text_col="text", id_col="doc_id", id_is_int=True,
                analyzer="simple", num_term_partitions=4, chunk_files=2,
                store_fields=["geo_lat", "geo_lon", "lang", "alt_m", "ip",
                              "shape_lat_min", "shape_lat_max",
                              "shape_lon_min", "shape_lon_max"],
                hot_df_threshold=10**9)
    with open(marker, "w") as f:
        f.write("ok")
    return root


def events_index(sf_dir: str, cache_base: str = _CACHE_BASE) -> str:
    """Index over the sf events table: ``event_type`` is the (single-token)
    text field, ``ts``/``value``/``user_id`` are stored docvalues — the
    shape behind ES-style date_histogram / stats aggregations over an
    event stream (query = term filter on the type, aggs over docvalues)."""
    ev_path = os.path.join(sf_dir, "events.parquet")
    key = hashlib.sha1(
        f"{ev_path}:simple:v2-termdict-bin:events".encode()).hexdigest()[:16]
    root = os.path.join(cache_base, f"events-{key}")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        build_index([ev_path], root, text_col="event_type",
                    id_col="event_id", id_is_int=True, analyzer="simple",
                    num_term_partitions=4, chunk_files=2,
                    store_fields=["ts", "value", "user_id"],
                    hot_df_threshold=10**9)
        with open(marker, "w") as f:
            f.write("ok")
    return root


CHAIN_UPDATE_SUFFIX = " freshly updated merge scan notes"


def documents_chain_index(sf_dir: str, analyzer: str = "simple",
                          cache_base: str = _CACHE_BASE,
                          compact: bool = False) -> str:
    """Delta-chain index over the sf documents table (built once, cached):
    epoch 0 = full backfill of the base table; epoch 1 = a DETERMINISTIC
    synthetic delta applied in ``mode="delta"`` — every ``doc_id % 7 == 3``
    doc is updated (text + :data:`CHAIN_UPDATE_SUFFIX`), every
    ``doc_id % 13 == 5`` doc is deleted (delete wins on overlap).  Queries
    must go through MultiEpochSearcher; the driver's SQL oracle recomputes
    the same final corpus with a CASE/WHERE mirror of this rule."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    from .epochs import apply_delta_epoch

    doc_path = os.path.join(sf_dir, "documents.parquet")
    tag = "chain-v1-compacted" if compact else "chain-v1"
    key = hashlib.sha1(
        f"{doc_path}:{analyzer}:{tag}".encode()).hexdigest()[:16]
    root = os.path.join(cache_base, f"docchain-{key}")
    marker = os.path.join(root, "_BUILT")
    if os.path.exists(marker):
        return root

    import shutil
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    delta_dir = os.path.join(root, "delta_src")
    os.makedirs(delta_dir, exist_ok=True)

    def mk_delta(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        upd = t.take(pa.array(np.flatnonzero((did % 7 == 3) & (did % 13 != 5))))
        dele = t.take(pa.array(np.flatnonzero(did % 13 == 5)))
        new_text = pc.binary_join_element_wise(
            upd["text"].combine_chunks(), pa.scalar(CHAIN_UPDATE_SUFFIX),
            pa.scalar(""))
        upd = upd.set_column(upd.schema.get_field_index("text"), "text",
                             new_text)
        out = pa.concat_tables([upd, dele])
        return out.append_column(
            "epoch", pa.array(np.full(out.num_rows, 1), pa.int64())
        ).append_column(
            "action", pa.array(["updated"] * upd.num_rows
                               + ["deleted"] * dele.num_rows,
                               pa.string()))  # explicit: [] must not infer null type

    rd.read_parquet(doc_path).map_batches(
        mk_delta, batch_format="pyarrow").write_parquet(delta_dir)
    delta_files = sorted(os.path.join(delta_dir, f)
                         for f in os.listdir(delta_dir)
                         if f.endswith(".parquet"))
    kw = dict(id_col="doc_id", text_col="text", id_is_int=True,
              analyzer=analyzer, num_buckets=8, num_term_partitions=8,
              hot_df_threshold=10**9)
    apply_delta_epoch(root, None, 0, base_paths=[doc_path], **kw)
    apply_delta_epoch(root, delta_files, 1, mode="delta", **kw)
    if compact:
        from .epochs import compact_chain
        compact_chain(root, **{k: v for k, v in kw.items()
                               if k != "num_buckets"})
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
