"""DynamoDB-JSON codec as native Spark column expressions (SURVEY §2.2 T1).

The reference stores every attribute as a single-entry typed map
``{"S": "DEN"} / {"N": "160"} / {"BOOL": true} / {} (empty → dropped)``
(fixture shape: /root/reference/assets/dynamodb-data/table-data.json;
the OSIS ``dynamodb`` source selected at
/root/reference/assets/custom_resource.py:327-339 unmarshals it
implicitly). This module does the unmarshal Spark-first:

- ``from_json`` into a bounded-depth AttributeValue struct schema
  (Spark schemas are non-recursive, so ``M``/``L`` nesting is bounded
  by ``depth`` — 3 levels by default, enough for any observed data and
  configurable upward).
- Typed extraction is pure Column expressions → whole-stage codegen +
  column pruning keep working (a row-at-a-time UDF here would block
  both, SURVEY §4).
- A vectorized Pandas-UDF fallback (``unmarshal_json_udf``) renders the
  full plain-JSON document for arbitrary nesting depth — the slow path,
  used only for document emission parity, never in filters.

Scale note: unmarshal is a per-row map() — no shuffle, fully pipelined
into whatever scan/filter surrounds it.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# DynamoDB wire type codes (public data model): S N BOOL NULL B SS NS BS L M


def attribute_value_schema(depth: int = 3) -> T.StructType:
    """Struct with one field per DynamoDB type tag; M/L recurse to `depth`."""
    fields = [
        T.StructField("S", T.StringType()),
        T.StructField("N", T.StringType()),  # numbers ship as strings — keep raw
        T.StructField("BOOL", T.BooleanType()),
        T.StructField("NULL", T.BooleanType()),
        T.StructField("B", T.StringType()),  # base64 text in JSON form
        T.StructField("SS", T.ArrayType(T.StringType())),
        T.StructField("NS", T.ArrayType(T.StringType())),
        T.StructField("BS", T.ArrayType(T.StringType())),
    ]
    if depth > 0:
        inner = attribute_value_schema(depth - 1)
        fields.append(T.StructField("L", T.ArrayType(inner)))
        fields.append(T.StructField("M", T.MapType(T.StringType(), inner)))
    return T.StructType(fields)


def item_schema(depth: int = 3) -> T.MapType:
    """Schema of a whole DynamoDB-JSON item: attr name → AttributeValue."""
    return T.MapType(T.StringType(), attribute_value_schema(depth))


def parse_item(col: Column | str, depth: int = 3) -> Column:
    """DynamoDB-JSON text → map<string, AttributeValue struct>."""
    return F.from_json(col, item_schema(depth))


def av_scalar(av: Column, dtype: str) -> Column:
    """Collapse one AttributeValue struct to a typed scalar column.

    ``dtype`` is a Spark type string. ``"raw_string"`` keeps string
    fidelity for type-inconsistent attributes (SURVEY §1.3: ``number``
    is N on flights but S on assignments) by coalescing S and N.
    An empty ``{}`` attribute value (observed ``"__id": {}`` on every
    fixture item) has every tag NULL → yields NULL, i.e. the attribute
    is dropped exactly as the reference loader does
    (custom_resource.py:146-147).
    """
    if dtype == "raw_string":
        return F.coalesce(
            av.getField("S"),
            av.getField("N"),
            av.getField("BOOL").cast("string"),
        )
    if dtype == "string":
        return av.getField("S")
    if dtype == "boolean":
        return av.getField("BOOL")
    if dtype in ("timestamp", "date"):
        return av.getField("S").cast(dtype)
    if dtype == "binary":
        return F.unbase64(av.getField("B"))
    if dtype == "array<string>":
        return av.getField("SS")
    if dtype == "array<binary>":  # BS — must precede the generic array< branch
        return F.transform(av.getField("BS"), lambda x: F.unbase64(x))
    if dtype.startswith("array<"):  # numeric set, e.g. array<decimal(38,9)>
        elem = dtype[len("array<"):-1]
        return F.transform(av.getField("NS"), lambda x: x.cast(elem))
    # numeric scalars: N carries arbitrary-precision decimal as string
    return av.getField("N").cast(dtype)


def unmarshal(
    parsed_item: Column, attrs: dict[str, str], *, aliases: dict[str, str] | None = None
) -> list[Column]:
    """Typed columns for a superset schema: ``{attr_name: spark_type}``.

    Absent attributes are NULL — exactly how the 4 entity types coexist
    in one table (single-table design, SURVEY §1.1). ``aliases`` maps
    source attribute names to output column names (e.g. ``class`` →
    ``fare_class``).
    """
    aliases = aliases or {}
    cols = []
    for attr, dtype in attrs.items():
        out_name = aliases.get(attr, attr)
        cols.append(av_scalar(parsed_item.getItem(attr), dtype).alias(out_name))
    return cols


# --------------------------------------------------------------------------
# Full-fidelity fallback: arbitrary-depth unmarshal to plain JSON, as the
# OSIS dynamodb source emits documents. Vectorized (Arrow batches); used
# for document-emission parity and DLQ payloads, never in the filter path.
# --------------------------------------------------------------------------

def _unmarshal_value(av: dict):
    if not isinstance(av, dict) or not av:
        return None
    (tag, val), = av.items()
    if tag in ("S", "B"):
        return val
    if tag == "N":
        # preserve integer-ness; fall back to float
        try:
            return int(val)
        except ValueError:
            try:
                return float(val)
            except ValueError:
                return val
    if tag == "BOOL":
        return bool(val)
    if tag == "NULL":
        return None
    if tag in ("SS", "BS"):
        return list(val)
    if tag == "NS":
        return [_unmarshal_value({"N": v}) for v in val]
    if tag == "L":
        return [_unmarshal_value(v) for v in val]
    if tag == "M":
        return {k: _unmarshal_value(v) for k, v in val.items()}
    return None


def unmarshal_item_dict(item: dict) -> dict:
    """Python-side unmarshal of one DynamoDB-JSON item (test/fixture helper)."""
    out = {}
    for k, av in item.items():
        if not isinstance(av, dict) or not av:
            continue  # empty {} value → attribute dropped (loader parity)
        out[k] = _unmarshal_value(av)
    return out


@F.pandas_udf(T.StringType())
def unmarshal_json_udf(items: pd.Series) -> pd.Series:
    """DynamoDB-JSON item text → plain-JSON document text (any depth)."""

    def conv(s):
        if s is None:
            return None
        try:
            return json.dumps(
                unmarshal_item_dict(json.loads(s)), sort_keys=True, ensure_ascii=False
            )
        except (ValueError, TypeError):
            return None

    return items.map(conv)


# --------------------------------------------------------------------------
# Marshal (plain python value → DynamoDB-JSON) — fixture/CDC generators and
# round-trip tests. Mirrors the public DynamoDB data model.
# --------------------------------------------------------------------------

def marshal_value(v):
    if v is None:
        return {"NULL": True}
    if isinstance(v, bool):
        return {"BOOL": v}
    if isinstance(v, (int, float)):
        return {"N": repr(v) if isinstance(v, float) else str(v)}
    if isinstance(v, str):
        return {"S": v}
    if isinstance(v, bytes):
        import base64

        return {"B": base64.b64encode(v).decode()}
    if isinstance(v, (list, tuple)):
        return {"L": [marshal_value(x) for x in v]}
    if isinstance(v, set):
        if all(isinstance(x, str) for x in v):
            return {"SS": sorted(v)}
        return {"NS": sorted(str(x) for x in v)}
    if isinstance(v, dict):
        return {"M": {k: marshal_value(x) for k, x in v.items()}}
    raise TypeError(f"cannot marshal {type(v)}")


def marshal_item(d: dict) -> dict:
    return {k: marshal_value(v) for k, v in d.items()}
