"""Cross-index segment merge (operator E7): combine sub-indexes built over
disjoint document subsets into one index WITHOUT re-tokenizing.

This is the hierarchical-build path for 10^12-doc corpora: build K
sub-indexes in parallel (separate jobs / clusters / time windows), then
merge per term partition.  The merge is a stateful actor-pool stage
(``map_batches(SegmentMerger, concurrency=...)`` over the partition ids) —
each actor holds the open term dictionaries and mmapped posting files of
every input (the "merged across partitions by stateful actor pools" shape
from the north star).

Because BM25 scores depend on global stats, per-posting scores and block
maxes are RECOMPUTED from the stored (tf, dl) streams with the merged
(N, avgdl, df) — the merged index scores exactly as if built in one shot.

Current scope: inputs must share analyzer/meta and ``num_term_partitions``
and have no salted (hot) terms — hot-term layouts place a term's sub-lists
in input-specific partitions; merging those requires a cross-partition
gather, planned for the segmented-epoch work."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ..codec import decode_postings, encode_postings
from ..query.bm25 import BM25Params, term_scores
from ..util import atomic_write_json, read_json
from .build import epoch_dir


def _load_part(root: str, epoch: int, tpart: int):
    d = os.path.join(epoch_dir(root, epoch), "segments", f"tpart={tpart:05d}")
    mp = os.path.join(d, "segment.parquet")
    if not os.path.exists(mp):
        return None
    tbl = pq.read_table(mp)
    data = np.memmap(os.path.join(d, "postings.bin"), dtype=np.uint8, mode="r")
    return tbl, data


class SegmentMerger:
    """Actor: merge one term partition across all input indexes."""

    def __init__(self, roots: list[str], epochs: list[int], out_dir: str,
                 params: BM25Params):
        self.roots = roots
        self.epochs = epochs
        self.out_dir = out_dir
        self.params = params

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for tpart in batch["tpart"].to_pylist():
            out_rows.append(self._merge_one(int(tpart)))
        return pa.table({
            "tpart": pa.array([r[0] for r in out_rows], pa.int32()),
            "n_terms": pa.array([r[1] for r in out_rows], pa.int64()),
            "n_postings": pa.array([r[2] for r in out_rows], pa.int64()),
        })

    def _merge_one(self, tpart: int):
        inputs = [p for p in (_load_part(r, e, tpart)
                              for r, e in zip(self.roots, self.epochs))
                  if p is not None]
        lists: dict[str, list] = {}
        for tbl, data in inputs:
            terms = tbl["term"].to_pylist()
            for i, t in enumerate(terms):
                r = tbl.slice(i, 1).to_pylist()[0]
                if r["salt"] != 0:
                    raise NotImplementedError(
                        "merging salted (hot-term) layouts needs a "
                        "cross-partition gather; build sub-indexes with "
                        "salting disabled before merging")
                d, tf, dl = decode_postings(
                    bytes(data[r["doc_off"]:r["doc_off"] + r["doc_len"]]),
                    bytes(data[r["tf_off"]:r["tf_off"] + r["tf_len"]]),
                    r["n"],
                    bytes(data[r["dl_off"]:r["dl_off"] + r["dl_len"]]))
                lists.setdefault(t, []).append((d, tf, dl))

        p = self.params
        rows = {k: [] for k in ("term", "salt", "df", "n", "max_score",
                                 "doc_off", "doc_len", "tf_off", "tf_len",
                                 "dl_off", "dl_len", "skip_last",
                                 "skip_doc_off", "skip_tf_off", "skip_dl_off",
                                 "skip_max")}
        doc_stream, tf_stream, dl_stream = [], [], []
        doc_pos = tf_pos = dl_pos = 0
        n_postings = 0
        for term in sorted(lists):
            parts = lists[term]
            d = np.concatenate([x[0] for x in parts])
            tf = np.concatenate([x[1] for x in parts])
            dl = np.concatenate([x[2] for x in parts])
            order = np.argsort(d, kind="mergesort")
            d, tf, dl = d[order], tf[order], dl[order]
            # disjoint corpora expected; duplicate docids keep the last input
            if d.size > 1:
                keep = np.concatenate([d[1:] != d[:-1], [True]])
                d, tf, dl = d[keep], tf[keep], dl[keep]
            df = int(d.size)
            scores = term_scores(tf, dl, df, p)
            enc = encode_postings(d, tf, dls=dl,
                                  scores=scores.astype(np.float32))
            rows["term"].append(term)
            rows["salt"].append(0)
            rows["df"].append(df)
            rows["n"].append(df)
            rows["max_score"].append(float(scores.max()))
            rows["doc_off"].append(doc_pos)
            rows["doc_len"].append(len(enc["doc_blob"]))
            rows["tf_off"].append(tf_pos)
            rows["tf_len"].append(len(enc["tf_blob"]))
            rows["dl_off"].append(dl_pos)
            rows["dl_len"].append(len(enc["dl_blob"]))
            rows["skip_last"].append(enc["skip_last"])
            rows["skip_doc_off"].append(enc["skip_doc_off"])
            rows["skip_tf_off"].append(enc["skip_tf_off"])
            rows["skip_dl_off"].append(enc["skip_dl_off"])
            rows["skip_max"].append(enc["skip_max_score"])
            doc_stream.append(enc["doc_blob"])
            tf_stream.append(enc["tf_blob"])
            dl_stream.append(enc["dl_blob"])
            doc_pos += len(enc["doc_blob"])
            tf_pos += len(enc["tf_blob"])
            dl_pos += len(enc["dl_blob"])
            n_postings += df

        doc_all = b"".join(doc_stream)
        tf_all = b"".join(tf_stream)
        dl_all = b"".join(dl_stream)
        tf_base = len(doc_all)
        dl_base = tf_base + len(tf_all)
        seg = pa.table({
            "term": pa.array(rows["term"], pa.string()),
            "salt": pa.array(rows["salt"], pa.int32()),
            "df": pa.array(rows["df"], pa.int64()),
            "n": pa.array(rows["n"], pa.int64()),
            "max_score": pa.array(rows["max_score"], pa.float32()),
            "doc_off": pa.array(rows["doc_off"], pa.int64()),
            "doc_len": pa.array(rows["doc_len"], pa.int64()),
            "tf_off": pa.array([x + tf_base for x in rows["tf_off"]], pa.int64()),
            "tf_len": pa.array(rows["tf_len"], pa.int64()),
            "dl_off": pa.array([x + dl_base for x in rows["dl_off"]], pa.int64()),
            "dl_len": pa.array(rows["dl_len"], pa.int64()),
            "skip_last": pa.array([np.asarray(x) for x in rows["skip_last"]], pa.list_(pa.uint64())),
            "skip_doc_off": pa.array([np.asarray(x) for x in rows["skip_doc_off"]], pa.list_(pa.int32())),
            "skip_tf_off": pa.array([np.asarray(x) for x in rows["skip_tf_off"]], pa.list_(pa.int32())),
            "skip_dl_off": pa.array([np.asarray(x) for x in rows["skip_dl_off"]], pa.list_(pa.int32())),
            "skip_max": pa.array([np.asarray(x) for x in rows["skip_max"]], pa.list_(pa.float32())),
        })
        d_out = os.path.join(self.out_dir, f"tpart={tpart:05d}")
        os.makedirs(d_out, exist_ok=True)
        btmp = os.path.join(d_out, "postings.bin.tmp")
        with open(btmp, "wb") as f:
            f.write(doc_all)
            f.write(tf_all)
            f.write(dl_all)
        os.replace(btmp, os.path.join(d_out, "postings.bin"))
        stmp = os.path.join(d_out, "segment.parquet.tmp")
        pq.write_table(seg, stmp)
        os.replace(stmp, os.path.join(d_out, "segment.parquet"))
        return tpart, seg.num_rows, n_postings


def merge_indexes(roots: list[str], out_root: str, epochs: list[int] | None = None,
                  out_epoch: int = 0, concurrency: int = 4) -> dict:
    """Merge sub-indexes (disjoint doc subsets, same config) into out_root."""
    epochs = epochs or [0] * len(roots)
    statss = [read_json(os.path.join(epoch_dir(r, e), "stats.json"))
              for r, e in zip(roots, epochs)]
    metas = [read_json(os.path.join(r, "index_meta.json")) for r in roots]
    if any(m != metas[0] for m in metas[1:]):
        raise ValueError("cannot merge indexes with different index_meta")
    P = statss[0]["num_term_partitions"]
    if any(s["num_term_partitions"] != P for s in statss):
        raise ValueError("cannot merge indexes with different partition counts")
    if any(s["hot_terms"] for s in statss):
        raise NotImplementedError("merge requires salting-disabled inputs")
    if metas[0].get("with_positions"):
        # the merger re-encodes only the doc/tf/dl streams; silently dropping
        # the positional stream while keeping with_positions=true in the
        # copied meta would break phrase queries with a misleading error
        raise NotImplementedError(
            "merging positional indexes is not supported yet; build "
            "sub-indexes with with_positions=False before merging")

    n_docs = sum(s["n_docs"] for s in statss)
    total_tokens = sum(s["total_tokens"] for s in statss)
    avgdl = total_tokens / n_docs if n_docs else 1.0
    params = BM25Params(k1=statss[0]["k1"], b=statss[0]["b"],
                        n_docs=n_docs, avgdl=avgdl)

    ed = epoch_dir(out_root, out_epoch)
    seg_dir = os.path.join(ed, "segments")
    os.makedirs(seg_dir, exist_ok=True)

    parts = rd.from_items([{"tpart": i} for i in range(P)])
    summary = parts.map_batches(
        SegmentMerger, batch_format="pyarrow", batch_size=1,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=dict(roots=roots, epochs=epochs,
                                   out_dir=seg_dir, params=params)).take_all()

    stats = dict(statss[0])
    stats.update({"n_docs": n_docs, "total_tokens": total_tokens,
                  "avgdl": avgdl, "hot_terms": {},
                  "n_postings": sum(int(s["n_postings"]) for s in summary)})
    atomic_write_json(os.path.join(ed, "stats.json"), stats)
    atomic_write_json(os.path.join(out_root, "index_meta.json"), metas[0])
    manifest = {"epoch": out_epoch, "status": "done", "merged_from": roots,
                "chunks": {}, "stats": stats,
                "segments": {str(int(s["tpart"])): {
                    "status": "done", "n_terms": int(s["n_terms"]),
                    "n_postings": int(s["n_postings"])} for s in summary}}
    atomic_write_json(os.path.join(ed, "manifest.json"), manifest)
    return manifest
