"""Parent-child replication fan-out (operators E8 / M2-M7).

The reference copies every child document into each parent model's index
with an ES ``join`` field and shard routing by parent id, so
``has_parent``/``has_child`` queries co-locate
(/root/reference/src/search-ingest/elastic.cr:259-283 single, 318-333 bulk):

- every document gets ``_document_type`` (elastic.cr:470-471) and an action
  routed by its own id by default (elastic.cr:396-405);
- for each parent relation, a copy targets the parent's index routed by the
  parent id, carrying ``join = {name: childType, parent: parentId}``
  (elastic.cr:426-428, 468-476);
- empty parent ids skip replication (elastic.cr:263, 322);
- self-associated documents with a parent skip the duplicate own-index copy
  (``skip_replication?``, elastic.cr:214-218) — the routed copy already
  lands in the same index.

Ray-native shape: a vectorized ``map_batches`` fan-out emitting 1+P rows per
input row with ``(target_index, route, doc_type, join_name, join_parent)``
columns; the downstream shuffle key is ``route`` — the exact analog of ES
shard routing (SURVEY §4 shuffle 3).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import TableConfig


def skip_replication(cfg: TableConfig, index: str) -> bool:
    """True when a doc should not ALSO be written plainly to ``index``
    because a self-referential routed copy covers it (elastic.cr:214-218).
    Evaluated per row against parent-id presence in :func:`replicate_batch`.
    """
    return any(p.index == cfg.name for p in cfg.parents) and index == cfg.name


def make_replicator(cfg: TableConfig):
    """Build the map_batches fan-out function for one table config."""
    own_index = cfg.name
    doc_type = cfg.document_type()
    self_rels = [p for p in cfg.parents if p.index == own_index]

    def replicate_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        id_str = pc.cast(batch[cfg.id_field], pa.string())
        parts: list[pa.Table] = []

        def with_cols(tbl: pa.Table, target, route, join_name, join_parent):
            m = tbl.num_rows
            return (tbl
                    .append_column("target_index", pa.array([target] * m, pa.string()))
                    .append_column("route", route)
                    .append_column("doc_type", pa.array([doc_type] * m, pa.string()))
                    .append_column("join_name", join_name)
                    .append_column("join_parent", join_parent))

        # own-index copy, routed by own id; suppressed for rows whose
        # self-referential parent id is present (M5)
        own_mask = pa.array([True] * n)
        for rel in self_rels:
            pid = pc.cast(batch[rel.routing_attr], pa.string())
            present = pc.and_(pid.is_valid(), pc.not_equal(pc.coalesce(pid, ""), ""))
            own_mask = pc.and_(own_mask, pc.invert(present))
        own = batch.filter(own_mask)
        if own.num_rows:
            oid = pc.cast(own[cfg.id_field], pa.string())
            nulls = pa.nulls(own.num_rows, pa.string())
            parts.append(with_cols(own, own_index, oid, nulls, nulls))

        # one replicated copy per parent relation, routed by parent id;
        # empty/null parent ids are skipped (M7)
        for rel in cfg.parents:
            pid = pc.cast(batch[rel.routing_attr], pa.string())
            present = pc.and_(pid.is_valid(), pc.not_equal(pc.coalesce(pid, ""), ""))
            rep = batch.filter(present)
            if rep.num_rows == 0:
                continue
            rpid = pc.cast(rep[rel.routing_attr], pa.string())
            jname = pa.array([doc_type] * rep.num_rows, pa.string())
            parts.append(with_cols(rep, rel.index, rpid, jname, rpid))

        if not parts:
            empty = batch.slice(0, 0)
            nulls0 = pa.nulls(0, pa.string())
            return with_cols(empty, own_index, nulls0, nulls0, nulls0)
        return pa.concat_tables(parts)

    return replicate_batch


def replicate(ds, cfg: TableConfig, batch_size: int = 4096):
    """Fan out a table Dataset into routed (own + parent) document copies."""
    return ds.map_batches(make_replicator(cfg), batch_format="pyarrow",
                          batch_size=batch_size)
