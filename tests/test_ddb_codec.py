"""Codec unit tests: every DynamoDB type code + every SURVEY §1.3 dirty case."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from opensearch_dynamodb_etl_cdk_spark.functions.ddb import (
    marshal_item,
    marshal_value,
    parse_item,
    unmarshal,
    unmarshal_item_dict,
    unmarshal_json_udf,
)
from opensearch_dynamodb_etl_cdk_spark.sources.fixture_gen import (
    gen_corpus,
    probe_item,
)
from opensearch_dynamodb_etl_cdk_spark.sources.flights import unmarshal_items_df


def _df_from_items(spark, items: list[str]):
    return spark.createDataFrame([(s,) for s in items], "item_json string")


def test_scalar_types_roundtrip(spark):
    item = {
        "s": {"S": "hello"},
        "n_int": {"N": "160"},
        "n_dec": {"N": "12.5"},
        "b": {"BOOL": True},
        "nul": {"NULL": True},
        "bin": {"B": "aGVsbG8="},  # b"hello"
        "ss": {"SS": ["a", "b"]},
        "ns": {"NS": ["1", "2.5"]},
    }
    df = _df_from_items(spark, [json.dumps(item)])
    parsed = parse_item(F.col("item_json"))
    row = df.select(
        *unmarshal(
            parsed,
            {
                "s": "string",
                "n_int": "bigint",
                "n_dec": "double",
                "b": "boolean",
                "nul": "string",
                "bin": "binary",
                "ss": "array<string>",
                "ns": "array<double>",
            },
        )
    ).collect()[0]
    assert row.s == "hello"
    assert row.n_int == 160
    assert row.n_dec == 12.5
    assert row.b is True
    assert row.nul is None
    assert bytes(row.bin) == b"hello"
    assert row.ss == ["a", "b"]
    assert row.ns == [1.0, 2.5]


def test_binary_set_roundtrip(spark):
    """BS must decode via its own branch — the generic ``array<`` branch
    reads NS and would silently null every binary set."""
    item = {
        "bs": {"BS": ["aGVsbG8=", "d29ybGQ="]},  # b"hello", b"world"
        "ns": {"NS": ["1", "2"]},
    }
    df = _df_from_items(spark, [json.dumps(item)])
    parsed = parse_item(F.col("item_json"))
    row = df.select(
        *unmarshal(parsed, {"bs": "array<binary>", "ns": "array<bigint>"})
    ).collect()[0]
    assert [bytes(b) for b in row.bs] == [b"hello", b"world"]
    assert row.ns == [1, 2]


def test_nested_m_and_l(spark):
    item = {
        "m": {"M": {"inner": {"S": "x"}, "deep": {"M": {"k": {"N": "7"}}}}},
        "l": {"L": [{"S": "a"}, {"N": "2"}]},
    }
    df = _df_from_items(spark, [json.dumps(item)])
    parsed = parse_item(F.col("item_json"))
    row = df.select(
        parsed.getItem("m").getField("M").getItem("inner").getField("S").alias("inner"),
        parsed.getItem("m")
        .getField("M")
        .getItem("deep")
        .getField("M")
        .getItem("k")
        .getField("N")
        .cast("bigint")
        .alias("deep_k"),
        parsed.getItem("l").getField("L").getItem(1).getField("N").alias("l1"),
    ).collect()[0]
    assert row.inner == "x"
    assert row.deep_k == 7
    assert row.l1 == "2"


def test_empty_attribute_dropped(spark):
    """`"__id": {}` (observed on every reference fixture item) → NULL."""
    item = {"PK": {"S": "DEN"}, "__id": {}}
    df = _df_from_items(spark, [json.dumps(item)])
    parsed = parse_item(F.col("item_json"))
    row = df.select(
        *unmarshal(parsed, {"PK": "string", "__id": "raw_string"})
    ).collect()[0]
    assert row.PK == "DEN"
    assert row["__id"] is None
    # python-side twin drops it entirely
    assert "__id" not in unmarshal_item_dict(item)


def test_type_inconsistent_number_raw_fidelity(spark):
    """`number` N on flights vs S on assignments → raw_string keeps both."""
    items = [
        json.dumps({"number": {"N": "160"}, "type": {"S": "flight"}}),
        json.dumps({"number": {"S": "3"}, "type": {"S": "assignment"}}),
    ]
    df = _df_from_items(spark, items)
    parsed = parse_item(F.col("item_json"))
    rows = df.select(
        *unmarshal(parsed, {"number": "raw_string", "type": "string"})
    ).collect()
    got = {r.type: r.number for r in rows}
    assert got == {"flight": "160", "assignment": "3"}


def test_template_literal_passthrough(spark):
    """Un-substituted `"${number}"` must pass through verbatim."""
    df = _df_from_items(spark, [json.dumps({"GSI2PK": {"S": "${number}"}})])
    parsed = parse_item(F.col("item_json"))
    assert df.select(
        parsed.getItem("GSI2PK").getField("S").alias("g")
    ).collect()[0].g == "${number}"


def test_unmarshal_json_udf_full_fidelity(spark):
    item = {
        "PK": {"S": "DEN"},
        "n": {"N": "42"},
        "f": {"N": "1.5"},
        "flag": {"BOOL": False},
        "lst": {"L": [{"S": "a"}, {"M": {"x": {"N": "1"}}}]},
        "__id": {},
    }
    df = _df_from_items(spark, [json.dumps(item)])
    out = json.loads(df.select(unmarshal_json_udf("item_json").alias("doc")).collect()[0].doc)
    assert out == {"PK": "DEN", "n": 42, "f": 1.5, "flag": False, "lst": ["a", {"x": 1}]}


def test_marshal_unmarshal_roundtrip():
    src = {
        "s": "x",
        "i": 7,
        "f": 2.25,
        "b": True,
        "nil": None,
        "lst": ["a", 1, {"k": "v"}],
        "m": {"nested": [1, 2]},
    }
    assert unmarshal_item_dict(marshal_item(src)) == src
    assert marshal_value({"a", "b"}) == {"SS": ["a", "b"]}


def test_corpus_superset_schema(spark):
    """Generated corpus unmarshals to the F2 superset: 40 rows, 22/13/4/1."""
    df = unmarshal_items_df(_df_from_items(spark, gen_corpus()))
    counts = {r.type: r.n for r in df.groupBy("type").agg(F.count("*").alias("n")).collect()}
    assert counts == {"fare": 22, "flight": 13, "assignment": 4, "booking": 1}
    # _id = pk|sk identity, unique across the corpus
    assert df.select("_id").distinct().count() == 40
    # dirty cases survive with raw fidelity
    raw = df.filter(F.col("gsi2pk") == "${number}").count()
    assert raw == 2
    ssr = df.filter(F.col("ssr_raw") == "[wheelchair, vegan]").count()
    assert ssr == 2
    # segments: N on bookings ("2"), S-display on direct flights ("{X, Y}")
    segs = {r.type: r.segments_raw for r in df.filter(F.col("segments_raw").isNotNull()).select("type", "segments_raw").collect()}
    assert segs["booking"] == "2"
    assert segs["flight"].startswith("{")


def test_probe_item_shape(spark):
    df = unmarshal_items_df(_df_from_items(spark, [probe_item()]))
    r = df.collect()[0]
    assert (r.pk, r.dest, r.fare_class) == ("JFK", "DEN", "nonstop")
    assert r._id == "JFK|DEN#2021-12-12T00:00:00#nonstop"
