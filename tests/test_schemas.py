"""Schema-mapping tests mirroring the reference spec suite
(/root/reference/spec/schemas_spec.cr) over the FIXTURES.md F1-F6 schemas."""

import pyarrow as pa

from search_ingest_ray.schemas import (
    TYPE_FIELD, ParentRelation, TableConfig, arrow_to_role, child_relations,
    collect_index_properties, equivalent_schema, fingerprint, index_schema,
    properties_for,
)

# F1 ray_gun — primitives + es_type override (spec_models.cr:17-23)
RAY_GUN = pa.schema([
    ("id", pa.string()), ("laser_colour", pa.string()),
    ("barrel_length", pa.float32()), ("rounds", pa.int32()),
    ("ip", pa.string()), ("last_shot", pa.timestamp("us")),
])
RAY_GUN_CFG = TableConfig("ray_gun", field_types={"ip": "ip"})

# F2 programmer — parent of coffee & ouch
PROGRAMMER = pa.schema([("id", pa.string()), ("name", pa.string())])
PROGRAMMER_CFG = TableConfig("programmer", doc_type="Programmer",
                             field_types={"name": "text"})

# F3 broke — subfield + object (spec_models.cr:29-33)
BROKE = pa.schema([
    ("id", pa.string()), ("breaks", pa.string()), ("status", pa.bool_()),
    ("hasho", pa.map_(pa.string(), pa.string())),
])
BROKE_CFG = TableConfig("broke", subfields={"breaks": "keyword"})

# F4 beverage_coffee — child of programmer
COFFEE = pa.schema([
    ("id", pa.string()), ("temperature", pa.int32()),
    ("created_at", pa.timestamp("us")), ("programmer_id", pa.string()),
])
COFFEE_CFG = TableConfig(
    "beverage_coffee", doc_type="Coffee",
    field_types={"programmer_id": "keyword"},
    parents=[ParentRelation("Programmer", "programmer", "programmer_id")])

# F5 ouch (Migraine) — custom table name, second child (spec_models.cr:42-47)
OUCH = pa.schema([
    ("id", pa.string()), ("duration", pa.timestamp("us")),
    ("programmer_id", pa.string()),
])
OUCH_CFG = TableConfig(
    "ouch", doc_type="Migraine",
    field_types={"programmer_id": "keyword"},
    parents=[ParentRelation("Programmer", "programmer", "programmer_id")])


def test_primitive_type_mapping():
    # exact type tables, spec/schemas_spec.cr:47-89
    props = properties_for(RAY_GUN, RAY_GUN_CFG)
    assert props["laser_colour"] == {"type": "text"}
    assert props["barrel_length"] == {"type": "float"}
    assert props["rounds"] == {"type": "integer"}
    assert props["last_shot"] == {"type": "date"}
    assert props["ip"] == {"type": "ip"}          # es_type tag honored
    assert props["id"] == {"type": "keyword"}      # id field → keyword


def test_document_type_always_present():
    # spec/schemas_spec.cr:35-45
    for schema, cfg in [(RAY_GUN, RAY_GUN_CFG), (BROKE, BROKE_CFG)]:
        assert properties_for(schema, cfg)[TYPE_FIELD] == {"type": "keyword"}


def test_subfield_and_object():
    props = properties_for(BROKE, BROKE_CFG)
    assert props["breaks"] == {"type": "text", "fields": {"keyword": {"type": "keyword"}}}
    assert props["status"] == {"type": "boolean"}
    assert props["hasho"] == {"type": "object"}


def test_collection_types_unwrap():
    assert arrow_to_role(pa.list_(pa.int64())) == "long"
    assert arrow_to_role(pa.list_(pa.string())) == "text"
    assert arrow_to_role(pa.struct([("a", pa.int32())])) == "object"


def test_ignore_and_unknown_dropped():
    schema = pa.schema([("id", pa.string()), ("secret", pa.string()),
                        ("weird", pa.decimal128(10, 2))])
    props = properties_for(schema, TableConfig("t", ignore={"secret"}))
    assert "secret" not in props
    assert "weird" not in props  # unknown type dropped with warning


def test_merged_parent_properties():
    # expected merged programmer index field set (spec/schemas_spec.cr:75-88)
    merged = collect_index_properties(
        properties_for(PROGRAMMER, PROGRAMMER_CFG),
        properties_for(COFFEE, COFFEE_CFG),
        properties_for(OUCH, OUCH_CFG))
    assert sorted(merged) == [TYPE_FIELD, "created_at", "duration", "id",
                              "name", "programmer_id", "temperature"]


def test_join_field_in_parent_schema():
    meta = index_schema(PROGRAMMER, PROGRAMMER_CFG,
                        [(COFFEE, COFFEE_CFG), (OUCH, OUCH_CFG)])
    props = meta["mappings"]["properties"]
    assert props["join"] == {"type": "join",
                             "relations": {"Programmer": ["Coffee", "Migraine"]}}
    assert meta["mappings"]["dynamic"] is False
    assert "analysis" in meta["settings"]


def test_equivalence_order_insensitive_and_relations():
    a = index_schema(PROGRAMMER, PROGRAMMER_CFG, [(COFFEE, COFFEE_CFG)])
    b = index_schema(PROGRAMMER, PROGRAMMER_CFG, [(COFFEE, COFFEE_CFG)])
    # scalar vs single-element array relations are equivalent (schemas.cr:104-115)
    b["mappings"]["properties"]["join"]["relations"]["Programmer"] = ["Coffee"]
    assert equivalent_schema(a, b)
    assert fingerprint(a) == fingerprint(b)
    c = index_schema(PROGRAMMER, PROGRAMMER_CFG)
    assert not equivalent_schema(a, c)
    assert fingerprint(a) != fingerprint(c)


def test_child_relations_discovery():
    rels = child_relations({
        "programmer": PROGRAMMER_CFG, "beverage_coffee": COFFEE_CFG,
        "ouch": OUCH_CFG, "ray_gun": RAY_GUN_CFG,
    })
    assert rels == {"programmer": ["beverage_coffee", "ouch"]}
