"""Distributed inverted-index build (operators E3-E7, E11, E12).

Ray-Data-first restatement of the reference's backfill lifecycle
(/root/reference/src/search-ingest/table.cr:80-176) with the ES-side index
construction implemented natively:

  stage 1  (per resumable chunk of input files — the analog of the
           reference's batched full-table scan, table.cr:100):
           read_parquet → [extract html→text (E1)] → map_batches posting
           emission (E2+E4) → write postings/chunk=N/ Parquet
  stage 1.5 corpus stats (E6): N from input metadata, total tokens via a
           columnar Sum over the postings — no extra tokenize pass
  stage 2  (term shuffle, E5+E7+E12): df partial-aggregate → hot-term set →
           assign term partitions (hot terms salted across partitions) →
           groupby(tpart).map_groups building delta+varint posting lists with
           block-max metadata → one atomically-written segment file per
           term partition
  manifest (E11): per-chunk and per-term-partition lineage + metrics; a
           crashed build resumes skipping completed chunks AND completed
           term partitions (strictly better than the reference's
           all-or-nothing backfill, table.cr:105-126).

Design notes for 100 TB scale:
- the heavy ``html`` column never enters any shuffle (projected away in
  stage 1); only (term, docid, tf, dl) rows move in the one wide exchange;
- df aggregation is a partial (per-block combine) groupby-count, so only
  (term, partial_count) rows shuffle — not the postings;
- hot terms (df ≥ threshold) are salted into ``hot_salt`` sub-lists spread
  over distinct partitions, bounding the largest term partition (E12);
- term-partition count defaults to postings_rows / 4M, clamped — segment
  groups stay ~hundreds of MB regardless of corpus size.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..analyzer import get_analyzer
from ..codec import encode_postings
from ..corpus import EXTRACTOR_VERSION
from ..query.bm25 import B_DEFAULT, K1_DEFAULT, BM25Params, term_scores
from ..util import atomic_write_json, read_json, term_partition
from ..stages.analyze import PostingEmitter, extract_batch

log = logging.getLogger(__name__)

SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("salt", pa.int32()),
    ("df", pa.int64()),          # GLOBAL df (idf input; != n for salted lists)
    ("n", pa.int64()),           # postings in this (term, salt) list
    ("max_score", pa.float32()),
    ("doc_blob", pa.binary()),
    ("tf_blob", pa.binary()),
    ("dl_blob", pa.binary()),
    ("skip_last", pa.list_(pa.uint64())),
    ("skip_doc_off", pa.list_(pa.int32())),
    ("skip_tf_off", pa.list_(pa.int32())),
    ("skip_dl_off", pa.list_(pa.int32())),
    ("skip_max", pa.list_(pa.float32())),
])


def epoch_dir(index_root: str, epoch: int) -> str:
    return os.path.join(index_root, "epochs", f"e{epoch:04d}")


# ---------------------------------------------------------------------------
# stage-1 helpers

_EMITTERS: dict = {}


def _emit(batch: pa.Table, *, text_col, id_col, id_is_int, analyzer) -> pa.Table:
    key = (text_col, id_col, id_is_int, analyzer)
    em = _EMITTERS.get(key)
    if em is None:
        em = _EMITTERS[key] = PostingEmitter(text_col, id_col, id_is_int, analyzer)
    return em(batch)


# ---------------------------------------------------------------------------
# stage-2 helpers

_HOT_CACHE: dict = {}


def _assign_tpart(batch: pa.Table, *, num_partitions: int, hot_salt: int,
                  hot_ref) -> pa.Table:
    """Add (tpart, salt) columns.  Hot terms get salt = docid % S and a
    partition derived from (term, salt) so their postings spread over up to
    S distinct partitions (E12)."""
    key = hot_ref.hex() if hasattr(hot_ref, "hex") else id(hot_ref)
    hot = _HOT_CACHE.get(key)
    if hot is None:
        hot = _HOT_CACHE[key] = ray.get(hot_ref) if hot_ref is not None else {}
    terms = batch["term"].to_pylist()
    docids = batch["docid"].to_numpy()
    salts = np.zeros(len(terms), dtype=np.int32)
    tparts = np.empty(len(terms), dtype=np.int32)
    tp_cache: dict = {}
    for i, t in enumerate(terms):
        if t in hot:
            s = int(docids[i]) % hot_salt
            salts[i] = s
            ck = (t, s)
        else:
            ck = (t, 0)
        v = tp_cache.get(ck)
        if v is None:
            v = tp_cache[ck] = term_partition(t, num_partitions, salt=ck[1])
        tparts[i] = v
    return (batch.append_column("salt", pa.array(salts))
                 .append_column("tpart", pa.array(tparts)))


def build_segment_group(group: pa.Table, *, segments_dir: str,
                        params: BM25Params, hot_df: dict) -> pa.Table:
    """groupby(tpart).map_groups body: build all posting lists of one term
    partition and write the segment file atomically (tmp + rename, so task
    retries are idempotent); returns a one-row summary — the per-partition
    lineage record (E11)."""
    t0 = time.monotonic()
    tpart = int(group["tpart"][0].as_py())
    terms = np.asarray(group["term"].to_pylist(), dtype=object)
    salts = group["salt"].to_numpy()
    docids = group["docid"].to_numpy()
    tfs = group["tf"].to_numpy()
    dls = group["dl"].to_numpy()

    # order by (term, salt, docid); term via factorize for numeric lexsort
    uniq, codes = np.unique(terms, return_inverse=True)
    order = np.lexsort((docids, salts, codes))
    codes, salts, docids, tfs, dls = (codes[order], salts[order],
                                      docids[order], tfs[order], dls[order])
    # boundaries where (term, salt) changes
    change = np.flatnonzero((np.diff(codes) != 0) | (np.diff(salts) != 0))
    starts = np.concatenate([[0], change + 1])
    ends = np.concatenate([change + 1, [len(codes)]])

    # local df per term (sum over salts) for non-hot global df
    local_df = np.bincount(codes, minlength=len(uniq))

    rows = {k: [] for k in ("term", "salt", "df", "n", "max_score",
                             "doc_blob", "tf_blob", "dl_blob", "skip_last",
                             "skip_doc_off", "skip_tf_off", "skip_dl_off",
                             "skip_max")}
    p = params
    for lo, hi in zip(starts, ends):
        term = uniq[codes[lo]]
        salt = int(salts[lo])
        d, t, l = docids[lo:hi], tfs[lo:hi], dls[lo:hi]
        # guard against duplicate (term, docid) (docid hash collisions /
        # duplicate source keys): keep max tf
        if hi - lo > 1:
            dup = np.flatnonzero(np.diff(d) == 0)
            if dup.size:
                keep = np.ones(d.size, dtype=bool)
                for j in dup:
                    if t[j + 1] < t[j]:
                        t[j + 1] = t[j]
                    keep[j] = False
                d, t, l = d[keep], t[keep], l[keep]
        gdf = int(hot_df.get(term, local_df[codes[lo]]))
        scores = term_scores(t, l, gdf, p)
        enc = encode_postings(d.astype(np.uint64), t.astype(np.uint64),
                              dls=l.astype(np.uint64),
                              scores=scores.astype(np.float32))
        rows["term"].append(term)
        rows["salt"].append(salt)
        rows["df"].append(gdf)
        rows["n"].append(enc["df"])
        rows["max_score"].append(float(scores.max()))
        rows["doc_blob"].append(enc["doc_blob"])
        rows["tf_blob"].append(enc["tf_blob"])
        rows["dl_blob"].append(enc["dl_blob"])
        rows["skip_last"].append(enc["skip_last"])
        rows["skip_doc_off"].append(enc["skip_doc_off"])
        rows["skip_tf_off"].append(enc["skip_tf_off"])
        rows["skip_dl_off"].append(enc["skip_dl_off"])
        rows["skip_max"].append(enc["skip_max_score"])

    seg = pa.table({
        "term": pa.array(rows["term"], pa.string()),
        "salt": pa.array(rows["salt"], pa.int32()),
        "df": pa.array(rows["df"], pa.int64()),
        "n": pa.array(rows["n"], pa.int64()),
        "max_score": pa.array(rows["max_score"], pa.float32()),
        "doc_blob": pa.array(rows["doc_blob"], pa.binary()),
        "tf_blob": pa.array(rows["tf_blob"], pa.binary()),
        "dl_blob": pa.array(rows["dl_blob"], pa.binary()),
        "skip_last": pa.array([np.asarray(x) for x in rows["skip_last"]], pa.list_(pa.uint64())),
        "skip_doc_off": pa.array([np.asarray(x) for x in rows["skip_doc_off"]], pa.list_(pa.int32())),
        "skip_tf_off": pa.array([np.asarray(x) for x in rows["skip_tf_off"]], pa.list_(pa.int32())),
        "skip_dl_off": pa.array([np.asarray(x) for x in rows["skip_dl_off"]], pa.list_(pa.int32())),
        "skip_max": pa.array([np.asarray(x) for x in rows["skip_max"]], pa.list_(pa.float32())),
    })
    # rows already term-sorted → parquet row-group min/max stats prune
    # term lookups at query time
    out_dir = os.path.join(segments_dir, f"tpart={tpart:05d}")
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "segment.parquet.tmp")
    pq.write_table(seg, tmp, row_group_size=2048)
    os.replace(tmp, os.path.join(out_dir, "segment.parquet"))
    return pa.table({
        "tpart": pa.array([tpart], pa.int32()),
        "n_terms": pa.array([len(rows["term"])], pa.int64()),
        "n_postings": pa.array([int(len(codes))], pa.int64()),
        "bytes": pa.array([sum(map(len, rows["doc_blob"])) +
                           sum(map(len, rows["tf_blob"]))], pa.int64()),
        "wall_s": pa.array([time.monotonic() - t0], pa.float64()),
    })


# ---------------------------------------------------------------------------
# the build driver

def build_index(input_paths, index_root: str, *,
                text_col: str = "text", id_col: str = "url",
                id_is_int: bool = False, html_col: str | None = None,
                analyzer: str = "standard",
                num_term_partitions: int | None = None,
                chunk_files: int = 16,
                hot_df_threshold: int | None = None, hot_salt: int = 8,
                k1: float = K1_DEFAULT, b: float = B_DEFAULT,
                epoch: int = 0, resume: bool = True,
                batch_size: int = 1024, concurrency: int | None = None) -> dict:
    """Build (or resume building) the inverted index for one epoch.

    Returns the manifest dict.  ``input_paths``: list of Parquet files or a
    directory.  Ray must already be initialized by the caller.
    """
    if isinstance(input_paths, str):
        input_paths = sorted(
            os.path.join(input_paths, f) for f in os.listdir(input_paths)
            if f.endswith(".parquet"))
    input_paths = sorted(input_paths)
    if not input_paths:
        raise ValueError("no input files")

    ed = epoch_dir(index_root, epoch)
    postings_dir = os.path.join(ed, "postings")
    segments_dir = os.path.join(ed, "segments")
    os.makedirs(postings_dir, exist_ok=True)
    os.makedirs(segments_dir, exist_ok=True)
    manifest_path = os.path.join(ed, "manifest.json")

    # --- index meta / consistency check (G4/G5 analog) ---------------------
    meta_path = os.path.join(index_root, "index_meta.json")
    meta = {
        "analyzer": analyzer, "extractor": EXTRACTOR_VERSION,
        "text_col": text_col, "id_col": id_col, "id_is_int": id_is_int,
        "k1": k1, "b": b, "format": "v1",
    }
    if os.path.exists(meta_path):
        existing = read_json(meta_path)
        if existing != meta:
            # mapping changed → reindex semantics: epoch data invalid
            # (delete_index + create_index, /root/reference/src/search-ingest/table.cr:61-76)
            log.warning("index meta changed; dropping epoch data for rebuild")
            import shutil
            shutil.rmtree(ed, ignore_errors=True)
            os.makedirs(postings_dir, exist_ok=True)
            os.makedirs(segments_dir, exist_ok=True)
    atomic_write_json(meta_path, meta)

    manifest = read_json(manifest_path) if (resume and os.path.exists(manifest_path)) else {
        "epoch": epoch, "chunks": {}, "segments": {}, "stats": None,
        "status": "building",
    }

    # --- stage 1: resumable per-chunk tokenize ------------------------------
    chunks = [input_paths[i:i + chunk_files]
              for i in range(0, len(input_paths), chunk_files)]
    read_cols = [id_col] + ([html_col] if html_col else [text_col])
    for ci, files in enumerate(chunks):
        cid = f"{ci:05d}"
        rec = manifest["chunks"].get(cid)
        if rec and rec.get("status") == "done" and rec.get("files") == files:
            continue
        t0 = time.monotonic()
        n_rows = sum(pq.read_metadata(f).num_rows for f in files)
        ds = rd.read_parquet(files, columns=read_cols)
        if html_col:
            ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                                batch_size=batch_size)
        ds = ds.map_batches(
            _emit, batch_format="pyarrow", batch_size=batch_size,
            fn_kwargs=dict(text_col=text_col, id_col=id_col,
                           id_is_int=id_is_int, analyzer=analyzer))
        out = os.path.join(postings_dir, f"chunk={cid}")
        import shutil
        shutil.rmtree(out, ignore_errors=True)  # clear partial output
        ds.write_parquet(out)
        manifest["chunks"][cid] = {
            "files": files, "rows": int(n_rows), "status": "done",
            "wall_s": round(time.monotonic() - t0, 3),
        }
        atomic_write_json(manifest_path, manifest)

    n_docs = sum(c["rows"] for c in manifest["chunks"].values())

    # --- stage 1.5: corpus stats (E6) --------------------------------------
    postings = rd.read_parquet(postings_dir)
    n_postings = postings.count()
    total_tokens = postings.select_columns(["tf"]).sum("tf") if n_postings else 0
    avgdl = (total_tokens / n_docs) if n_docs else 1.0
    params = BM25Params(k1=k1, b=b, n_docs=n_docs, avgdl=avgdl)

    if num_term_partitions is None:
        num_term_partitions = int(min(256, max(8, n_postings // 4_000_000)))
    P = num_term_partitions

    # --- stage 2a: df partial-aggregate → hot terms (E12) ------------------
    if hot_df_threshold is None:
        hot_df_threshold = max(10_000, n_docs // 10)
    df_ds = postings.groupby("term").count()
    hot_tbl = df_ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["count()"], hot_df_threshold)),
        batch_format="pyarrow")
    hot_rows = hot_tbl.take_all()  # small by construction (df ≥ threshold)
    hot_df = {r["term"]: int(r["count()"]) for r in hot_rows}
    hot_ref = ray.put(hot_df)

    # --- stage 2b: partition assignment + segment build --------------------
    done_tparts = {int(k) for k, v in manifest["segments"].items()
                   if v.get("status") == "done"} if resume else set()

    with_parts = postings.map_batches(
        _assign_tpart, batch_format="pyarrow", batch_size=65536,
        fn_kwargs=dict(num_partitions=P, hot_salt=hot_salt, hot_ref=hot_ref))
    if done_tparts:
        done_arr = list(done_tparts)
        with_parts = with_parts.map_batches(
            lambda t, d=done_arr: t.filter(
                pc.invert(pc.is_in(t["tpart"], value_set=pa.array(d, pa.int32())))),
            batch_format="pyarrow")

    import functools
    builder = functools.partial(build_segment_group, segments_dir=segments_dir,
                                params=params, hot_df=hot_df)
    summaries = with_parts.groupby("tpart").map_groups(
        builder, batch_format="pyarrow").take_all()
    for s in summaries:
        manifest["segments"][str(int(s["tpart"]))] = {
            "status": "done", "n_terms": int(s["n_terms"]),
            "n_postings": int(s["n_postings"]), "bytes": int(s["bytes"]),
            "wall_s": round(float(s["wall_s"]), 3),
        }

    manifest["stats"] = {
        "n_docs": int(n_docs), "n_postings": int(n_postings),
        "total_tokens": int(total_tokens), "avgdl": float(avgdl),
        "k1": k1, "b": b, "analyzer": analyzer,
        "num_term_partitions": P, "hot_salt": hot_salt,
        "hot_df_threshold": int(hot_df_threshold),
        "hot_terms": hot_df,
    }
    manifest["status"] = "done"
    atomic_write_json(manifest_path, manifest)
    atomic_write_json(os.path.join(ed, "stats.json"), manifest["stats"])
    return manifest


def reindex(index_root: str, epoch: int = 0) -> None:
    """Drop epoch data, keep index meta — the analog of the reference's
    reindex (delete_index + apply mapping, table.cr:61-76) / empty_indices
    (elastic.cr:569-587)."""
    import shutil
    shutil.rmtree(epoch_dir(index_root, epoch), ignore_errors=True)
