"""Schema-on-read JSON projection (functions/jsonfields.py): typed
extraction with SQL-null semantics for missing paths, malformed JSON and
uncastable values; Dataset-level stage incl. payload drop."""

import pyarrow as pa
import pytest

from search_ingest_ray.functions.jsonfields import (extract_json_fields,
                                                    json_fields_stage)

PAYLOADS = ['{"k": 87, "s": "x", "f": 1.5, "b": true}',
            '{"k": -3}',
            None,
            'garbage',
            '{"b": false, "k": "notint"}']


def test_typed_extraction_null_semantics():
    t = pa.table({"props": PAYLOADS})
    out = extract_json_fields(t, json_col="props", fields={
        "k": ("$.k", "int64"), "s": ("$.s", "string"),
        "f": ("$.f", "float64"), "b": ("$.b", "bool")})
    assert out["k"].to_pylist() == [87, -3, None, None, None]
    assert out["s"].to_pylist() == ["x", None, None, None, None]
    assert out["f"].to_pylist() == [1.5, None, None, None, None]
    assert out["b"].to_pylist() == [True, None, None, None, False]
    assert out.schema.field("k").type == pa.int64()
    assert out.schema.field("b").type == pa.bool_()


def test_unsupported_dtype_raises():
    t = pa.table({"props": ['{"k": 1}']})
    with pytest.raises(ValueError, match="unsupported dtype"):
        extract_json_fields(t, json_col="props",
                            fields={"k": ("$.k", "date32")})


def test_stage_drops_payload(ray_session):
    import ray.data as rd
    ds = rd.from_items([{"props": p or "null", "i": i}
                        for i, p in enumerate(PAYLOADS)])
    out = json_fields_stage(ds, json_col="props",
                            fields={"k": ("$.k", "int64")},
                            drop_payload=True)
    rows = sorted(out.take_all(), key=lambda r: r["i"])
    assert "props" not in rows[0]
    assert [r["k"] for r in rows] == [87, -3, None, None, None]
