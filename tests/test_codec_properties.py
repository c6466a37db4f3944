"""Hypothesis property tests for the DynamoDB-JSON codec: arbitrary
nested documents must survive marshal → unmarshal (Python reference
path) and marshal → JSON → vectorized unmarshal UDF (the Spark path)
with identical results."""

from __future__ import annotations

import json
import math

from hypothesis import given, settings, strategies as st

from opensearch_dynamodb_etl_cdk_spark.functions.ddb import (
    marshal_item,
    unmarshal_item_dict,
)

# Values representable in both directions without loss:
# - floats: finite only (DynamoDB N has no NaN/Inf), repr-roundtrippable
# - no bytes (B roundtrips to base64 text by design, asymmetric)
# - no sets (SS/NS unmarshal to lists by design, asymmetric)
scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**18), max_value=10**18),
    st.floats(allow_nan=False, allow_infinity=False, width=64).filter(
        lambda x: not float(x).is_integer()  # integral floats unmarshal as int
    ),
    st.text(max_size=40),
)

values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=10), children, max_size=4),
    ),
    max_leaves=12,
)

items = st.dictionaries(st.text(min_size=1, max_size=12), values, max_size=6)


def _norm(v):
    """Tuples become lists through JSON; compare structurally."""
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


@settings(max_examples=200, deadline=None)
@given(items)
def test_marshal_unmarshal_roundtrip_property(item):
    assert _norm(unmarshal_item_dict(marshal_item(item))) == _norm(item)


@settings(max_examples=100, deadline=None)
@given(items)
def test_marshalled_form_is_valid_dynamodb_json(item):
    """Every attribute value is a single-entry {typeTag: payload} map
    with a known tag, recursively — the wire invariant the unmarshal
    expressions (attribute_value_schema) rely on."""
    KNOWN = {"S", "N", "BOOL", "NULL", "B", "SS", "NS", "BS", "L", "M"}

    def check(av):
        assert isinstance(av, dict) and len(av) == 1
        (tag, val), = av.items()
        assert tag in KNOWN
        if tag == "L":
            for x in val:
                check(x)
        if tag == "M":
            for x in val.values():
                check(x)

    m = marshal_item(item)
    json.dumps(m)  # must be JSON-serializable
    for av in m.values():
        check(av)


@settings(max_examples=100, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_number_fidelity(x):
    """N values: repr-marshal → unmarshal reproduces the exact float
    (or the exact int for integral values, per the codec's contract)."""
    out = unmarshal_item_dict(marshal_item({"v": x}))["v"]
    if float(x).is_integer():
        assert out == int(x)
    else:
        assert isinstance(out, float) and (out == x or (math.isnan(out) and math.isnan(x)))


@given(
    packets=st.lists(st.binary(min_size=0, max_size=700), min_size=1,
                     max_size=6),
    page_cap=st.integers(60, 900),
)
@settings(max_examples=40, deadline=None)
def test_ogg_packets_round_trip_any_sizes(packets, page_cap):
    """RFC 3533 transport: arbitrary packet sizes (incl. empty and
    255-multiples) survive paging at any page capacity."""
    from opensearch_dynamodb_etl_cdk_spark.operators import multimodal as M

    payload = M.encode_ogg(packets, max_page_data=page_cap)
    assert M._ogg_packets(payload) == packets


@given(
    pages=st.lists(
        st.text(st.characters(min_codepoint=0x20, max_codepoint=0x7E),
                min_size=0, max_size=200),
        min_size=1, max_size=4),
    compress=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_pdf_pages_round_trip_any_ascii(pages, compress):
    """Any printable-ASCII page set (parens, backslashes, spaces)
    survives encode → xref-validated parse → Tj tokenization."""
    from opensearch_dynamodb_etl_cdk_spark.operators import pdf as P

    payload = P.encode_pdf(pages, compress=compress)
    assert P.extract_pdf_pages(payload) == pages


@given(
    members=st.lists(
        st.tuples(
            st.text(st.sampled_from("abcdefgh_.-"), min_size=1,
                    max_size=24),
            st.binary(min_size=0, max_size=600),
        ),
        min_size=1, max_size=5),
    use_zip=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_archive_members_round_trip_any_bytes(members, use_zip):
    """tar and zip round-trip arbitrary member bytes (incl. empty,
    512-multiples, high bytes) and names."""
    import zlib

    from opensearch_dynamodb_etl_cdk_spark.operators import archive as A

    if use_zip:
        payload = A.encode_zip(members)
    else:
        payload = zlib.compress(A.encode_tar(members), wbits=31)
    assert A.extract_members(payload) == members


@given(data=st.binary(max_size=600))
@settings(max_examples=60, deadline=None)
def test_pdf_filter_codecs_round_trip_any_bytes(data):
    """Property: every PDF stream-filter codec is the exact inverse of
    its encoder on arbitrary bytes — including runs, zeros, and
    non-ASCII — and the ASCII forms emit only their legal alphabets."""
    from opensearch_dynamodb_etl_cdk_spark.operators import pdf as P

    hx = P._ascii_hex_encode(data)
    assert P._ascii_hex_decode(hx) == data
    a85 = P._ascii85_encode(data)
    assert P._ascii85_decode(a85) == data
    assert all(33 <= b <= 117 or b in b"z~>" for b in a85)
    rl = P._run_length_encode(data)
    assert P._run_length_decode(rl) == data
    assert P._lzw_decode(P._lzw_encode(data), b"") == data


@given(pages=st.lists(
    st.text(st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0, max_size=60), min_size=1, max_size=3),
    chain=st.sampled_from(["LZW", "AHx", "A85", "RL", "A85+Flate",
                           "RL+LZW"]))
@settings(max_examples=40, deadline=None)
def test_pdf_filter_chains_round_trip_any_text(pages, chain):
    """Property: any printable text survives encode_pdf → extract
    through every non-Flate filter and chain."""
    from opensearch_dynamodb_etl_cdk_spark.operators import pdf as P

    payload = P.encode_pdf(pages, content_filter=chain)
    assert P.extract_pdf_pages(payload) == pages
