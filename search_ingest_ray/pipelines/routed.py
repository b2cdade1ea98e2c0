"""Queryable parent-child routed indexes (operators E8/M2-M7 end-to-end).

The reference replicates every child document into each parent model's index
with an ES ``join`` field and shard routing by parent id, making
``has_parent`` / ``has_child`` queries co-located single-shard operations
(/root/reference/src/search-ingest/elastic.cr:223-336; integration coverage
spec/elastic_spec.cr:79-135).  Round 1 stopped at emitting routed rows; this
module completes the pipeline:

- :func:`build_routed_indexes` fans every managed table out through
  ``stages.replicate`` and persists the copies PARTITIONED BY TARGET INDEX
  (hive layout, one directory per (table, target_index)) — the Ray-native
  analog of writing into per-index shards.  A registry json records which
  source tables contribute which document types to which index.
- :func:`has_child` / :func:`has_parent` answer the two join-field query
  shapes over the routed store as streaming Ray Dataset pipelines.

Scale notes: the routed copies are routed by parent id (``route``), so both
sides of a has_parent join are co-partitioned on the join key — the
broadcast path (`ray.put` of the matching parent-id set) is used when the
filtered parent side is small (the common case: a selective parent filter),
and a hash `Dataset.join` on ``join_parent == route`` is the fallback for
unselective filters.  Neither path ever ships the unfiltered child table to
the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..schemas import TableConfig
from ..stages.replicate import replicate
from ..util import atomic_write_json, read_json

_REGISTRY = "routed_registry.json"


def build_routed_indexes(tables: dict[str, tuple], out_root: str,
                         batch_size: int = 4096) -> dict:
    """Replicate every table's docs into their target indexes.

    ``tables``: {table_name: (Dataset, TableConfig)}.  Output layout::

        out_root/tables/<table>/target_index=<index>/*.parquet

    Returns the registry: {index: {table: doc_type}} — which source tables
    contribute documents (own or replicated) to each index.
    """
    registry: dict = {"indexes": {}}
    for name, (ds, cfg) in tables.items():
        routed = replicate(ds, cfg, batch_size=batch_size)
        tdir = os.path.join(out_root, "tables", name)
        routed.write_parquet(tdir, partition_cols=["target_index"])
        targets = {cfg.name} | {p.index for p in cfg.parents}
        for t in sorted(targets):
            registry["indexes"].setdefault(t, {})[name] = cfg.document_type()
    atomic_write_json(os.path.join(out_root, _REGISTRY), registry)
    return registry


def _index_table_dir(out_root: str, table: str, index: str) -> str:
    return os.path.join(out_root, "tables", table, f"target_index={index}")


def _read_docs(out_root: str, index: str, doc_type: str | None = None):
    """Stream one index's documents (optionally one doc_type) from the
    routed store — a column-pruned hive-partition read per source table."""
    reg = read_json(os.path.join(out_root, _REGISTRY))
    tables = reg["indexes"].get(index, {})
    out = []
    for table, dtype in sorted(tables.items()):
        if doc_type is not None and dtype != doc_type:
            continue
        d = _index_table_dir(out_root, table, index)
        if os.path.isdir(d):
            out.append(rd.read_parquet(d))
    return out


def has_child(out_root: str, index: str, child_type: str,
              child_filter=None):
    """Parents (routes) having ≥1 child of ``child_type`` matching
    ``child_filter`` — the ES ``has_child`` query shape
    (elastic.cr join-field queries; spec/elastic_spec.cr:100-118).

    ``child_filter``: optional ``f(pa.Table) -> BooleanArray`` evaluated
    per batch (vectorized).  Returns a Dataset with one ``route`` row per
    distinct matching parent id."""
    parts = []
    for ds in _read_docs(out_root, index, doc_type=child_type):
        def pick(t: pa.Table) -> pa.Table:
            m = pc.and_(t["join_name"].combine_chunks().is_valid()
                        if isinstance(t["join_name"], pa.ChunkedArray)
                        else t["join_name"].is_valid(),
                        pc.equal(pc.coalesce(t["doc_type"], pa.scalar("")),
                                 pa.scalar(child_type)))
            if child_filter is not None:
                m = pc.and_(m, child_filter(t))
            t = t.filter(m)
            return t.select(["join_parent"]).rename_columns(["route"])
        parts.append(ds.map_batches(pick, batch_format="pyarrow"))
    if not parts:
        return rd.from_arrow(pa.table({"route": pa.array([], pa.string())}))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.union(p)
    # distinct via a native vectorized aggregate (no per-group Python)
    return cand.groupby("route").count().select_columns(["route"])


def has_parent(out_root: str, index: str, parent_type: str, child_type: str,
               parent_filter=None, broadcast: bool = True,
               join_partitions: int = 8):
    """Children of ``child_type`` whose parent (of ``parent_type``) matches
    ``parent_filter`` — the ES ``has_parent`` query shape.

    ``parent_filter``: optional ``f(pa.Table) -> BooleanArray``.  With
    ``broadcast=True`` (default) the filtered parent-id set is collected and
    broadcast via ``ray.put`` — right when the parent filter is selective;
    ``broadcast=False`` uses a hash ``Dataset.join`` on the routing key
    instead (both sides are routed by parent id, so the join is
    co-partitioned by construction)."""
    parent_parts = []
    for ds in _read_docs(out_root, index, doc_type=parent_type):
        def pick_parent(t: pa.Table) -> pa.Table:
            # the parent's OWN copy: doc_type == parent_type, no join name
            m = pc.and_(pc.equal(pc.coalesce(t["doc_type"], pa.scalar("")),
                                 pa.scalar(parent_type)),
                        pc.invert((t["join_name"].combine_chunks()
                                   if isinstance(t["join_name"], pa.ChunkedArray)
                                   else t["join_name"]).is_valid()))
            if parent_filter is not None:
                m = pc.and_(m, parent_filter(t))
            return t.filter(m).select(["route"])
        parent_parts.append(ds.map_batches(pick_parent, batch_format="pyarrow"))
    children = _read_docs(out_root, index, doc_type=child_type)

    def child_mask(t: pa.Table):
        jn = (t["join_name"].combine_chunks()
              if isinstance(t["join_name"], pa.ChunkedArray) else t["join_name"])
        return pc.and_(jn.is_valid(),
                       pc.equal(pc.coalesce(t["doc_type"], pa.scalar("")),
                                pa.scalar(child_type)))

    if not parent_parts or not children:
        return rd.from_arrow(pa.table({}))
    parents = parent_parts[0]
    for p in parent_parts[1:]:
        parents = parents.union(p)
    child_ds = children[0]
    for c in children[1:]:
        child_ds = child_ds.union(c)

    if broadcast:
        routes = pa.array(sorted({r["route"] for r in parents.take_all()}),
                          pa.string())
        routes_ref = ray.put(routes)

        def semi(t: pa.Table) -> pa.Table:
            rts = ray.get(routes_ref)
            return t.filter(pc.and_(child_mask(t),
                                    pc.is_in(t["join_parent"],
                                             value_set=rts)))

        return child_ds.map_batches(semi, batch_format="pyarrow")

    parents = parents.map_batches(
        lambda t: t.rename_columns(["__parent_route"]),
        batch_format="pyarrow")
    filtered = child_ds.map_batches(lambda t: t.filter(child_mask(t)),
                                    batch_format="pyarrow")
    joined = filtered.join(parents, join_type="inner",
                           num_partitions=join_partitions,
                           on=("join_parent",), right_on=("__parent_route",))

    def _drop_key(t: pa.Table) -> pa.Table:
        # Ray's hash join may or may not retain the right key column
        return (t.drop_columns(["__parent_route"])
                if "__parent_route" in t.column_names else t)

    return joined.map_batches(_drop_key, batch_format="pyarrow")
