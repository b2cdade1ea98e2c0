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

Salted (hot-term) inputs ARE supported: a hot term's sub-lists live in up
to S partitions of their input (build.py E12); the merger hosting a given
output location gathers every input (term, salt) sub-list across partitions
(a cross-partition gather over the actor's cached handles).  Hot-term skew
handling COMPOSES hierarchically: terms whose merged df crosses the hot
threshold (computed from the inputs' term dictionaries — metadata only)
are RE-SALTED in the output (sub-list s = docids ≡ s mod S at
``term_partition(t, P, s)``, global df stored on every sub-list), exactly
the layout the builder produces, so queries need no special casing and no
merged partition exceeds the salting budget.  Cold terms merge to one
unsalted list at their home partition; each input sub-list is consumed
exactly once per output location that needs it.  Known trade: each
merged-hot term's full list is gathered+deduped once per HOSTING output
partition (≤ out_salt×, only for the few hot terms, spread across actors)
— the exact global df stored on every sub-list requires the cross-class
dedup, and hot terms are precisely where exact idf matters.

Positional inputs are also carried through: the 4th (position) stream is
decoded per posting, reordered with the docid merge, and re-encoded, so
phrase queries work on merged indexes.

Inputs must share analyzer/meta and ``num_term_partitions``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..codec import (decode_positions, decode_postings, encode_positions,
                     encode_postings)
from ..query.bm25 import BM25Params, term_scores
from ..util import (atomic_write_json, chaos_kill_once, read_json,
                    term_partition)
from .build import _link_tree, epoch_dir


class SegmentMerger:
    """Actor: merge term partitions across all input indexes.

    Partition handles (term dict Table + postings mmap) are cached per
    actor — the hot-term gather re-visits partitions, and an actor serves
    many tparts over its lifetime."""

    def __init__(self, roots: list[str], epochs: list[int], out_dir: str,
                 params: BM25Params, num_partitions: int,
                 hot_terms: list[dict], hot_salts: list[int],
                 with_positions: bool = False,
                 merged_hot: dict | None = None, out_salt: int = 1):
        self.roots = roots
        self.epochs = epochs
        self.out_dir = out_dir
        self.params = params
        self.P = num_partitions
        self.hot = [set(h) for h in hot_terms]
        self.hot_salts = hot_salts
        self.with_positions = with_positions
        # terms whose MERGED df crosses the hot threshold get re-salted in
        # the output: sub-list s = postings with docid % out_salt == s,
        # living at term_partition(t, P, s) — the same layout the builder's
        # E12 salting produces, so queries need no special casing
        self.merged_hot = merged_hot or {}
        self.out_salt = max(1, out_salt)
        self._cache: dict[tuple[int, int], tuple | None] = {}

    def _part(self, i: int, tpart: int):
        key = (i, tpart)
        if key in self._cache:
            return self._cache[key]
        d = os.path.join(epoch_dir(self.roots[i], self.epochs[i]),
                         "segments", f"tpart={tpart:05d}")
        mp = os.path.join(d, "segment.parquet")
        ent = None
        if os.path.exists(mp):
            tbl = pq.read_table(mp)
            data = np.memmap(os.path.join(d, "postings.bin"),
                             dtype=np.uint8, mode="r")
            ent = (tbl, data)
        self._cache[key] = ent
        return ent

    def __call__(self, batch: pa.Table) -> pa.Table:
        # crash-recovery hook (inert in production): a merger actor lost
        # mid-partition leaves only .tmp litter (postings.bin/segment.parquet
        # publish via rename) — Ray restarts the actor and retries the task.
        chaos_kill_once("merge")
        out_rows = []
        for tpart in batch["tpart"].to_pylist():
            out_rows.append(self._merge_one(int(tpart)))
        return pa.table({
            "tpart": pa.array([r[0] for r in out_rows], pa.int32()),
            "n_terms": pa.array([r[1] for r in out_rows], pa.int64()),
            "n_postings": pa.array([r[2] for r in out_rows], pa.int64()),
        })

    def _decode_row(self, tbl: pa.Table, data, i: int):
        r = tbl.to_pylist()[0] if tbl.num_rows == 1 else None
        assert r is not None
        d, tf, dl = decode_postings(
            bytes(data[r["doc_off"]:r["doc_off"] + r["doc_len"]]),
            bytes(data[r["tf_off"]:r["tf_off"] + r["tf_len"]]),
            r["n"],
            bytes(data[r["dl_off"]:r["dl_off"] + r["dl_len"]]))
        plists = None
        if self.with_positions:
            pos = bytes(data[r["pos_off"]:r["pos_off"] + r["pos_len"]])
            plists = decode_positions(pos, tf)
        return d, tf, dl, plists

    def _rows_in_partition(self, i: int, p: int, t: str, s: int) -> list:
        """Decode input i's rows for (term t, salt s) in partition p."""
        ent = self._part(i, p)
        if ent is None:
            return []
        tbl, data = ent
        import pyarrow.compute as pc
        m = pc.and_(pc.equal(tbl["term"], pa.scalar(t)),
                    pc.equal(tbl["salt"], pa.scalar(s, pa.int32())))
        return [self._decode_row(tbl.slice(int(j), 1), data, i)
                for j in np.flatnonzero(m.to_numpy(zero_copy_only=False))]

    def _input_parts_for_term(self, t: str) -> list:
        """All of term t's input lists, across inputs and (salted) partitions."""
        out = []
        for i in range(len(self.roots)):
            if t in self.hot[i]:
                for s in range(self.hot_salts[i]):
                    out.extend(self._rows_in_partition(
                        i, term_partition(t, self.P, salt=s), t, s))
            else:
                out.extend(self._rows_in_partition(
                    i, term_partition(t, self.P), t, 0))
        return out

    def _gather_lists(self, tpart: int) -> dict[str, list]:
        """All (term → [(docids, tfs, dls, plists), ...]) of COLD merged
        terms whose home is ``tpart`` (merged-hot terms are handled
        separately, sub-list by sub-list)."""
        lists: dict[str, list] = {}
        for i in range(len(self.roots)):
            ent = self._part(i, tpart)
            hot_i = self.hot[i]
            if ent is not None:
                tbl, data = ent
                terms = tbl["term"].to_pylist()
                for j, t in enumerate(terms):
                    if t in hot_i or t in self.merged_hot:
                        continue  # input-salted / re-salted paths below
                    lists.setdefault(t, []).append(
                        self._decode_row(tbl.slice(j, 1), data, i))
            # input-hot but merged-cold (possible only with inconsistent
            # thresholds): gather at the home partition, unsalted output
            for t in sorted(hot_i):
                if t in self.merged_hot or term_partition(t, self.P) != tpart:
                    continue
                lists.setdefault(t, []).extend(
                    x for s in range(self.hot_salts[i])
                    for x in self._rows_in_partition(
                        i, term_partition(t, self.P, salt=s), t, s))
        return lists

    @staticmethod
    def _merge_parts(parts, wp):
        """Concatenate + docid-sort + dedup (keep last input) one term's
        input lists; returns (d, tf, dl, pl)."""
        d = np.concatenate([x[0] for x in parts])
        tf = np.concatenate([x[1] for x in parts])
        dl = np.concatenate([x[2] for x in parts])
        pl = None
        if wp:
            pl = np.empty(len(d), dtype=object)
            pl[:] = [arr for x in parts for arr in x[3]]
        order = np.argsort(d, kind="mergesort")
        d, tf, dl = d[order], tf[order], dl[order]
        if wp:
            pl = pl[order]
        if d.size > 1:
            keep = np.concatenate([d[1:] != d[:-1], [True]])
            d, tf, dl = d[keep], tf[keep], dl[keep]
            if wp:
                pl = pl[keep]
        return d, tf, dl, pl

    def _entries_for(self, tpart: int):
        """(term, salt_out, d, tf, dl, pl, global_df) entries this output
        partition owns: cold terms (salt 0, home partition) + the re-salted
        sub-lists of merged-hot terms hosted here."""
        wp = self.with_positions
        entries = []
        lists = self._gather_lists(tpart)
        for term in sorted(lists):
            d, tf, dl, pl = self._merge_parts(lists[term], wp)
            if d.size:
                entries.append((term, 0, d, tf, dl, pl, int(d.size)))
        S = self.out_salt
        for t in sorted(self.merged_hot):
            salts_here = [s for s in range(S)
                          if term_partition(t, self.P, salt=s) == tpart]
            if not salts_here:
                continue
            parts = self._input_parts_for_term(t)
            if not parts:
                continue
            d, tf, dl, pl = self._merge_parts(parts, wp)
            gdf = int(d.size)  # exact global df, stored on every sub-list
            for s in salts_here:
                m = (d % np.uint64(S)).astype(np.int64) == s
                if not m.any():
                    continue
                entries.append((t, s, d[m], tf[m], dl[m],
                                pl[m] if wp else None, gdf))
        entries.sort(key=lambda e: (e[0], e[1]))
        return entries

    def _merge_one(self, tpart: int):
        p = self.params
        wp = self.with_positions
        rows = {k: [] for k in ("term", "salt", "df", "n", "max_score",
                                 "doc_off", "doc_len", "tf_off", "tf_len",
                                 "dl_off", "dl_len", "skip_last",
                                 "skip_doc_off", "skip_tf_off", "skip_dl_off",
                                 "skip_max", "pos_off", "pos_len")}
        doc_stream, tf_stream, dl_stream, pos_stream = [], [], [], []
        doc_pos = tf_pos = dl_pos = pos_pos = 0
        n_postings = 0
        for term, salt_out, d, tf, dl, pl, df in self._entries_for(tpart):
            scores = term_scores(tf, dl, df, p)
            enc = encode_postings(d, tf, dls=dl,
                                  scores=scores.astype(np.float32))
            rows["term"].append(term)
            rows["salt"].append(salt_out)
            rows["df"].append(df)           # GLOBAL df (idf input)
            rows["n"].append(int(d.size))   # postings in THIS sub-list
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
            if wp:
                pblob = encode_positions(list(pl))
                rows["pos_off"].append(pos_pos)
                rows["pos_len"].append(len(pblob))
                pos_stream.append(pblob)
                pos_pos += len(pblob)
            n_postings += int(d.size)

        doc_all = b"".join(doc_stream)
        tf_all = b"".join(tf_stream)
        dl_all = b"".join(dl_stream)
        pos_all = b"".join(pos_stream)
        tf_base = len(doc_all)
        dl_base = tf_base + len(tf_all)
        pos_base = dl_base + len(dl_all)
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
        if wp:
            seg = (seg.append_column(
                       "pos_off",
                       pa.array([x + pos_base for x in rows["pos_off"]],
                                pa.int64()))
                      .append_column("pos_len",
                                     pa.array(rows["pos_len"], pa.int64())))
        d_out = os.path.join(self.out_dir, f"tpart={tpart:05d}")
        os.makedirs(d_out, exist_ok=True)
        btmp = os.path.join(d_out, "postings.bin.tmp")
        with open(btmp, "wb") as f:
            f.write(doc_all)
            f.write(tf_all)
            f.write(dl_all)
            if wp:
                f.write(pos_all)
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
    with_positions = bool(metas[0].get("with_positions"))

    n_docs = sum(s["n_docs"] for s in statss)
    total_tokens = sum(s["total_tokens"] for s in statss)
    avgdl = total_tokens / n_docs if n_docs else 1.0
    params = BM25Params(k1=statss[0]["k1"], b=statss[0]["b"],
                        n_docs=n_docs, avgdl=avgdl)

    ed = epoch_dir(out_root, out_epoch)
    seg_dir = os.path.join(ed, "segments")
    os.makedirs(seg_dir, exist_ok=True)

    # merged hot set (E12 survives the merge): per-term df sums from the
    # inputs' TERM DICTIONARIES only (metadata-sized — the postings never
    # move for this), thresholded like the builder; hot merged terms are
    # re-salted in the output so skew handling composes hierarchically
    hot_threshold = int(statss[0].get("hot_df_threshold", 0)) or None
    out_salt = int(statss[0].get("hot_salt", 1))
    merged_hot: dict = {}
    if hot_threshold:
        tbs = []
        for r, e in zip(roots, epochs):
            sdir = os.path.join(epoch_dir(r, e), "segments")
            if not os.path.isdir(sdir):
                continue
            for dname in sorted(os.listdir(sdir)):
                mp = os.path.join(sdir, dname, "segment.parquet")
                if os.path.exists(mp):
                    tbs.append(pq.read_table(mp, columns=["term", "n"]))
        merged_hot = {}
        if tbs:
            # vectorized group-by-sum + threshold filter: only the (few)
            # over-threshold terms ever become Python objects — the old
            # per-term dict held the full merged vocabulary on the driver
            agg = (pa.concat_tables(tbs).group_by("term")
                   .aggregate([("n", "sum")]))
            agg = agg.filter(pc.greater_equal(agg["n_sum"],
                                              pa.scalar(hot_threshold)))
            merged_hot = dict(zip(agg["term"].to_pylist(),
                                  (int(x) for x in agg["n_sum"].to_pylist())))

    parts = rd.from_items([{"tpart": i} for i in range(P)])
    summary = parts.map_batches(
        SegmentMerger, batch_format="pyarrow", batch_size=1,
        concurrency=concurrency, num_cpus=1,
        fn_constructor_kwargs=dict(
            roots=roots, epochs=epochs, out_dir=seg_dir, params=params,
            num_partitions=P,
            hot_terms=[s.get("hot_terms", {}) for s in statss],
            hot_salts=[int(s.get("hot_salt", 1)) for s in statss],
            with_positions=with_positions,
            merged_hot=merged_hot, out_salt=out_salt)).take_all()

    # merged docvalues/docstore sidecar: hard-link every input's field
    # chunks (disjoint docids → concatenation is the merged store)
    fields_out = os.path.join(ed, "fields")
    shard_counts = set()
    for i, (r, e) in enumerate(zip(roots, epochs)):
        src = os.path.join(epoch_dir(r, e), "fields")
        if not os.path.isdir(src):
            continue
        mp = os.path.join(src, "meta.json")
        shard_counts.add(read_json(mp).get("field_shards")
                         if os.path.isfile(mp) else None)
        # data files only — each input's meta.json is reconciled below,
        # never linked into the merged store
        _link_tree(src, os.path.join(fields_out, f"input={i}"),
                   suffixes=(".parquet",))
    # self-describing shard layout survives the merge only when every input
    # used the same field_shards; otherwise omit meta.json and FieldStore
    # degrades to the legacy load-all mode (correct, unpruned)
    if len(shard_counts) == 1 and None not in shard_counts:
        os.makedirs(fields_out, exist_ok=True)
        atomic_write_json(os.path.join(fields_out, "meta.json"),
                          {"field_shards": int(shard_counts.pop())})

    stats = dict(statss[0])
    stats.update({"n_docs": n_docs, "total_tokens": total_tokens,
                  "avgdl": avgdl, "hot_terms": merged_hot,
                  "hot_salt": out_salt,
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
