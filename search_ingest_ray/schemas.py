"""Schema / mapping generation — the Ray-native analog of the reference's
``Schemas`` (/root/reference/src/search-ingest/schemas.cr).

The reference infers an Elasticsearch index mapping per ORM model at compile
time (macros over model metadata, schemas.cr:355-387) honoring per-field tags
``es_type`` / ``es_subfield`` / ``es_ignore`` / ``parent``
(schemas.cr:149-168, 265-279).  Here the equivalent inputs are a
``pyarrow.Schema`` (read from the Parquet source) plus a declarative
:class:`TableConfig` (the analog of the tag annotations and of the
``MANAGED_TABLES`` registry at /root/reference/src/config.cr:10-41).

Outputs: an ``index_meta`` dict — ``{settings: {analysis...}, mappings:
{dynamic: false, properties: {...}}}`` exactly shaped like the reference's
(schemas.cr:50-83) — plus a stable fingerprint and an order-insensitive
equivalence check (schemas.cr:88-118) that drives rebuild-vs-resume.
"""

from __future__ import annotations

import hashlib
import json
import logging
from dataclasses import dataclass, field

import pyarrow as pa

log = logging.getLogger(__name__)

# Valid index field roles (ES_TYPES, /root/reference/src/search-ingest/schemas.cr:211-222)
ES_TYPES = {
    "text", "keyword", "long", "integer", "short", "byte", "double", "float",
    "half_float", "scaled_float", "boolean", "date", "binary", "object", "ip",
    "completion", "geo_point", "geo_shape",
}

# Document-type discriminator added to every mapping/document
# (TYPE_FIELD, schemas.cr:208; enrichment at elastic.cr:470-471)
TYPE_FIELD = "_document_type"

# The analysis block every index carries (schemas.cr:61-77): standard
# tokenizer + lowercase + asciifolding(preserve_original).  Implemented
# natively in analyzer.py.
DEFAULT_ANALYSIS = {
    "analysis": {
        "analyzer": {
            "default": {
                "tokenizer": "standard",
                "filter": ["lowercase", "preserved_ascii_folding"],
            }
        },
        "filter": {
            "preserved_ascii_folding": {
                "type": "asciifolding",
                "preserve_original": True,
            }
        },
    }
}


@dataclass(frozen=True)
class ParentRelation:
    """A child table's parent declaration (ref types.cr:2, schemas.cr:265-279)."""
    name: str          # parent document type name
    index: str         # parent index (= parent table name)
    routing_attr: str  # column on the child holding the parent id


@dataclass
class TableConfig:
    """Declarative per-table config — the analog of per-attribute tags.

    ``es_type`` tag → ``field_types``; ``es_subfield`` → ``subfields``;
    ``es_ignore`` → ``ignore``; ``parent:`` → ``parents``
    (schemas.cr:149-168).
    """
    name: str
    id_field: str = "id"
    field_types: dict[str, str] = field(default_factory=dict)
    subfields: dict[str, str] = field(default_factory=dict)
    ignore: set[str] = field(default_factory=set)
    parents: list[ParentRelation] = field(default_factory=list)
    analyzer: str = "standard"
    doc_type: str | None = None  # defaults to last segment of name

    def document_type(self) -> str:
        # class name → last :: segment (ref elastic.cr:412-414, schemas.cr:19-26)
        return self.doc_type or self.name.split("::")[-1].split(".")[-1]


def arrow_to_role(dtype: pa.DataType) -> str | None:
    """Arrow type → index field role (klass_to_es_type, schemas.cr:242-259).

    Collections map to their element's role (ES fields are implicitly
    multi-valued, schemas.cr:257-259); structs/maps → ``object``
    (schemas.cr:247-248); unknown types are dropped with a warning
    (schemas.cr:250-253).
    """
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype) or pa.types.is_fixed_size_list(dtype):
        return arrow_to_role(dtype.value_type)
    if pa.types.is_boolean(dtype):
        return "boolean"
    if pa.types.is_float32(dtype):
        return "float"
    if pa.types.is_float64(dtype):
        return "double"
    if pa.types.is_int8(dtype):
        return "byte"
    if pa.types.is_int16(dtype):
        return "short"
    if pa.types.is_int32(dtype):
        return "integer"
    if pa.types.is_int64(dtype):
        return "long"
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return "text"
    if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype):
        return "date"
    if pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
        return "binary"
    if pa.types.is_struct(dtype) or pa.types.is_map(dtype):
        return "object"
    if pa.types.is_dictionary(dtype):
        return arrow_to_role(dtype.value_type)
    log.warning("no index-role mapping for arrow type %s; dropping field", dtype)
    return None


def properties_for(schema: pa.Schema, cfg: TableConfig) -> dict[str, dict]:
    """Generate the mapping properties for one table (schemas.cr:149-168,
    186-191): honor type overrides / subfields / ignores, always append the
    ``_document_type`` keyword field, and map the id field to ``keyword``.
    """
    props: dict[str, dict] = {}
    for f in schema:
        if f.name in cfg.ignore:
            continue
        if f.name in cfg.field_types:
            role = cfg.field_types[f.name]
            if role not in ES_TYPES:
                raise ValueError(f"invalid es_type override {role!r} for {cfg.name}.{f.name}")
        elif f.name == cfg.id_field:
            role = "keyword"
        else:
            role = arrow_to_role(f.type)
            if role is None:
                continue
        entry: dict = {"type": role}
        if f.name in cfg.subfields:
            sub = cfg.subfields[f.name]
            if sub not in ES_TYPES:
                raise ValueError(f"invalid es_subfield {sub!r} for {cfg.name}.{f.name}")
            # multi-field subfield (schemas.cr:313-322): one stored column,
            # an extra exact-match index artifact
            entry["fields"] = {sub: {"type": sub}}
        props[f.name] = entry
    props[TYPE_FIELD] = {"type": "keyword"}
    return props


def collect_index_properties(parent_props: dict, *child_props: dict) -> dict:
    """Parent index mapping = union (dedup by name) of its own and all child
    models' fields (collect_index_properties, schemas.cr:171-183)."""
    merged = dict(parent_props)
    for cp in child_props:
        for k, v in cp.items():
            merged.setdefault(k, v)
    return merged


def join_field(parent_type: str, child_types: list[str]) -> dict:
    """ES ``join`` datatype entry for a parent index (schemas.cr:194-205)."""
    rel = child_types[0] if len(child_types) == 1 else sorted(child_types)
    return {"join": {"type": "join", "relations": {parent_type: rel}}}


def index_schema(schema: pa.Schema, cfg: TableConfig,
                 child_schemas: list[tuple[pa.Schema, TableConfig]] | None = None) -> dict:
    """Full index meta: settings(analysis) + mappings(dynamic:false,
    properties) (schemas.cr:50-83), with child fields merged and a join
    field when the table has children."""
    props = properties_for(schema, cfg)
    if child_schemas:
        props = collect_index_properties(props, *[properties_for(s, c) for s, c in child_schemas])
        props.update(join_field(cfg.document_type(), [c.document_type() for _, c in child_schemas]))
    return {
        "settings": dict(DEFAULT_ANALYSIS),
        "mappings": {"dynamic": False, "properties": props},
    }


def _normalize(node):
    """Canonicalize for order-insensitive comparison; join.relations values
    may be scalar-or-array and order-insensitive (schemas.cr:104-115)."""
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k == "relations" and isinstance(v, dict):
                out[k] = {
                    pk: sorted(pv) if isinstance(pv, list) else [pv]
                    for pk, pv in v.items()
                }
            else:
                out[k] = _normalize(v)
        return out
    if isinstance(node, list):
        return [_normalize(x) for x in node]
    return node


def equivalent_schema(a: dict, b: dict) -> bool:
    """Order-insensitive deep equality of two index metas
    (equivalent_schema?, schemas.cr:88-118)."""
    return _normalize(a) == _normalize(b)


def fingerprint(meta: dict) -> str:
    """Stable content hash of an index meta — drives rebuild-vs-resume
    (consistency check analog, table.cr:190-204)."""
    return hashlib.sha256(
        json.dumps(_normalize(meta), sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()


def child_relations(configs: dict[str, TableConfig]) -> dict[str, list[str]]:
    """Invert parent declarations: index name → child table names
    (children discovery, schemas.cr:282-293)."""
    out: dict[str, list[str]] = {}
    for t, cfg in configs.items():
        for p in cfg.parents:
            out.setdefault(p.index, []).append(t)
    return {k: sorted(v) for k, v in out.items()}
