"""WARC ingestion: framing round-trips (plain + per-record gzip),
Content-Length-authoritative record bodies, HTTP splitting, HTML text
extraction, precise boundaries, and the Spark fan-out."""

from __future__ import annotations

import pytest

from opensearch_dynamodb_etl_cdk_spark.operators import warc as W


def _response(uri, html: bytes, with_http_cl=True):
    cl = f"Content-Length: {len(html)}\r\n".encode() if with_http_cl else b""
    return {
        "type": "response", "uri": uri,
        "content": b"HTTP/1.1 200 OK\r\n" + cl + b"\r\n" + html,
        "content_type": "application/http; msgtype=response",
    }


@pytest.mark.parametrize("gz", [False, True])
def test_warc_round_trip_and_record_filtering(gz):
    recs = [
        {"type": "warcinfo", "uri": "", "content": b"software: x\r\n"},
        {"type": "request", "uri": "http://e/1",
         "content": b"GET / HTTP/1.1\r\n\r\n"},
        _response("http://e/1", b"<p>&quot;hi&quot; &amp; bye &#65;</p>"),
        _response("http://e/2", b"<body>two</body>"),
    ]
    payload = W.encode_warc(recs, gzip_per_record=gz)
    parsed = W.parse_warc(payload)
    assert [r["type"] for r in parsed] == [
        "warcinfo", "request", "response", "response"]
    pages = W.warc_page_texts(payload)
    assert pages == [
        {"uri": "http://e/1", "text": '"hi" & bye A', "error": None},
        {"uri": "http://e/2", "text": "two", "error": None},
    ]


def test_warc_body_containing_version_line_does_not_split():
    """Record bodies are arbitrary bytes — Content-Length is the only
    legal framing; a body containing 'WARC/1.0' must survive."""
    evil = b"HTTP/1.1 200 OK\r\n\r\n<p>WARC/1.0\r\n\r\nfake</p>"
    p = W.encode_warc([{"type": "response", "uri": "u", "content": evil}])
    assert W.warc_page_texts(p) == [
        {"uri": "u", "text": "WARC/1.0 fake", "error": None}]


def test_warc_http_content_length_is_honored():
    html = b"<p>real</p>"
    http = (b"HTTP/1.1 200 OK\r\nContent-Length: %d\r\n\r\n" % len(html)
            + html + b"TRAILING-GARBAGE")
    p = W.encode_warc([{"type": "response", "uri": "u", "content": http}])
    assert W.warc_page_texts(p) == [
        {"uri": "u", "text": "real", "error": None}]


def test_html_to_text_drops_script_style_comments_entities():
    html = ("<html><head><script>var s = '<p>no</p>';</script>"
            "<style>p{}</style></head><!-- c --><body>"
            "A&nbsp;&lt;b&gt; &#x43; d</body></html>")
    assert W.html_to_text(html) == "A <b> C d"
    # unknown entities pass through verbatim rather than corrupting
    assert W.html_to_text("&bogus; x") == "&bogus; x"


def test_warc_malformed_rejections():
    good = W.encode_warc(
        [_response("u", b"<p>x</p>")], gzip_per_record=False)
    with pytest.raises(ValueError):  # truncated: separator gone
        W.parse_warc(good[:-6])
    with pytest.raises(ValueError):  # not WARC
        W.parse_warc(b"NOTWARC")
    with pytest.raises(ValueError):  # damaged gzip member
        W.parse_warc(b"\x1f\x8b" + b"\x00" * 12)
    with pytest.raises(NotImplementedError):  # future version
        W.parse_warc(good.replace(b"WARC/1.0", b"WARC/9.9", 1))
    with pytest.raises(ValueError):  # response content must be HTTP
        W.warc_page_texts(W.encode_warc(
            [{"type": "response", "uri": "u", "content": b"not http"}]))


def test_warc_spark_fan_out_mixed_layouts(spark):
    """Odd ids gzip per record, even ids plain — one (uri, text) row
    per response either way."""
    df = spark.createDataFrame(
        [(i, f"doc {i} body words") for i in range(6)],
        "doc_id long, text string",
    )
    rows = W.extract_warc_text(W.synthesize_warcs(df)).collect()
    assert len(rows) == 6
    for r in sorted(rows, key=lambda r: r.doc_id):
        assert r.uri == f"http://example.com/doc/{r.doc_id}"
        assert r.text == f'"doc {r.doc_id} body words" & more'


def test_html_to_text_survives_malformed_entities():
    """Real web HTML contains malformed/out-of-range character refs —
    they pass through verbatim instead of killing the task."""
    assert W.html_to_text("&#ff; x") == "&#ff; x"
    assert W.html_to_text("&#9999999999; x") == "&#9999999999; x"
    assert W.html_to_text("&#1114112; ok &#120;") == "&#1114112; ok x"
    assert W.html_to_text("&#xD800; s") == "&#xD800; s"


def test_chunked_transfer_encoding_dechunks():
    """RFC 9112 §7.1: hex sizes (either case), chunk extensions,
    trailer fields — the body reassembles exactly and no size line
    leaks into the text."""
    html = b"<p>chunked body here</p>"
    body = (b"a;ext=v\r\n" + html[:10] + b"\r\n"
            + b"E\r\n" + html[10:] + b"\r\n"
            + b"0\r\nX-Trailer: t\r\n\r\n")
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            + body)
    p = W.encode_warc([{"type": "response", "uri": "u", "content": http}])
    assert W.warc_page_texts(p) == [
        {"uri": "u", "text": "chunked body here", "error": None}]


def test_chunked_overrides_content_length():
    """Transfer-Encoding wins over Content-Length (RFC 9112 §6.3) —
    a CL that matches the RAW chunked framing must not be honored."""
    body = b"4\r\nreal\r\n0\r\n\r\n"
    http = (b"HTTP/1.1 200 OK\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"Transfer-Encoding: chunked\r\n\r\n" + body)
    p = W.encode_warc([{"type": "response", "uri": "u", "content": http}])
    assert W.warc_page_texts(p) == [
        {"uri": "u", "text": "real", "error": None}]


def test_chunked_malformed_framing_raises():
    def resp(body):
        http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                + body)
        return W.encode_warc(
            [{"type": "response", "uri": "u", "content": http}])

    with pytest.raises(ValueError):  # non-hex size line
        W.warc_page_texts(resp(b"zz\r\nhi\r\n0\r\n\r\n"))
    with pytest.raises(ValueError):  # chunk data exceeds body
        W.warc_page_texts(resp(b"ff\r\nshort\r\n0\r\n\r\n"))
    with pytest.raises(ValueError):  # missing data CRLF
        W.warc_page_texts(resp(b"2\r\nhiX0\r\n\r\n"))
    with pytest.raises(ValueError):  # no terminal chunk
        W.warc_page_texts(resp(b"2\r\nhi\r\n"))
    with pytest.raises(ValueError):  # trailer unterminated
        W.warc_page_texts(resp(b"2\r\nhi\r\n0\r\nX-T: v\r\n"))
    with pytest.raises(NotImplementedError):  # gzip coding unsupported
        W.warc_page_texts(resp(b"")[:0] + W.encode_warc([{
            "type": "response", "uri": "u",
            "content": b"HTTP/1.1 200 OK\r\n"
                       b"Transfer-Encoding: gzip, chunked\r\n\r\nx"}]))


def test_synthesize_escapes_markup_significant_text(spark):
    """Corpus text containing & < > survives the HTML round-trip via
    escaping + entity decode — the direct-equality oracle's guarantee."""
    df = spark.createDataFrame(
        [(0, "a < b & c > d"), (3, "x &amp; literal")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.text
            for r in W.extract_warc_text(W.synthesize_warcs(df)).collect()}
    assert rows[0] == '"a < b & c > d" & more'
    assert rows[3] == '"x &amp; literal" & more'


def test_synthesize_rejects_whitespace_runs(spark):
    """The whitespace-collapse pass cannot round-trip runs/edges/tabs —
    synthesis asserts the precondition loudly instead of letting the
    equality oracle silently break."""
    from pyspark.errors.exceptions.captured import PythonException

    for bad in ("two  spaces", " lead", "trail ", "tab\there"):
        df = spark.createDataFrame([(1, bad)], "doc_id long, text string")
        with pytest.raises(PythonException, match="whitespace"):
            W.extract_warc_text(W.synthesize_warcs(df)).collect()


def test_synthesize_chunked_slice_round_trips(spark):
    """doc_id % 3 == 0 ships Transfer-Encoding: chunked; the slice must
    extract identically to the Content-Length rows."""
    df = spark.createDataFrame(
        [(i, f"body {i}") for i in range(9)], "doc_id long, text string")
    payload_rows = W.synthesize_warcs(df).collect()
    chunked = {r.doc_id for r in payload_rows
               if b"Transfer-Encoding: chunked" in
               (W.parse_warc(bytes(r.payload))[2]["content"])}
    assert chunked == {0, 3, 6}
    rows = {r.doc_id: r.text
            for r in W.extract_warc_text(W.synthesize_warcs(df)).collect()}
    assert rows == {i: f'"body {i}" & more' for i in range(9)}


def test_html_entities_full_html5_set():
    """Real pages use the full HTML5 named set, not the XML five —
    &mdash;/&hellip;/&rsquo; decode, case stays significant
    (&Aacute; != &aacute;), sloppy-case legacy forms fall back, and
    unknown names pass through verbatim."""
    assert W.html_to_text("a &mdash; b&hellip; &rsquo;") == "a — b… ’"
    assert W.html_to_text("&Aacute; &aacute;") == "Á á"
    assert W.html_to_text("&AMP; &QUOT;x") == '& "x'
    assert W.html_to_text("&notanentity; kept") == "&notanentity; kept"
    # entities decoding to exotic whitespace collapse like whitespace
    assert W.html_to_text("a&ensp;&emsp;b &nbsp;c") == "a b c"


def test_content_encoding_gzip_body_decodes():
    """RFC 9110 §8.4: gzip-encoded bodies (the dominant Common Crawl
    layout) decode after framing; x-gzip aliases; identity passes."""
    import zlib

    html = b"<p>compressed page text</p>"
    gz = zlib.compress(html, wbits=31)
    for name in (b"gzip", b"x-gzip", b"GZIP", b"identity, gzip"):
        http = (b"HTTP/1.1 200 OK\r\n"
                + f"Content-Length: {len(gz)}\r\n".encode()
                + b"Content-Encoding: " + name + b"\r\n\r\n" + gz)
        p = W.encode_warc(
            [{"type": "response", "uri": "u", "content": http}])
        assert W.warc_page_texts(p) == [
            {"uri": "u", "text": "compressed page text", "error": None}]
    http = (b"HTTP/1.1 200 OK\r\n"
            + f"Content-Length: {len(html)}\r\n".encode()
            + b"Content-Encoding: identity\r\n\r\n" + html)
    p = W.encode_warc([{"type": "response", "uri": "u", "content": http}])
    assert W.warc_page_texts(p) == [
        {"uri": "u", "text": "compressed page text", "error": None}]


def test_content_encoding_gzip_after_chunked():
    """Transfer coding is removed FIRST, content coding second — a
    chunked+gzip response (both halves of a gzip member in different
    chunks) must de-chunk then gunzip."""
    import zlib

    gz = zlib.compress(b"<p>both codings</p>", wbits=31)
    cut = len(gz) // 2
    body = (f"{cut:x}\r\n".encode() + gz[:cut] + b"\r\n"
            + f"{len(gz) - cut:x}\r\n".encode() + gz[cut:]
            + b"\r\n0\r\n\r\n")
    http = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + body)
    p = W.encode_warc([{"type": "response", "uri": "u", "content": http}])
    assert W.warc_page_texts(p) == [
        {"uri": "u", "text": "both codings", "error": None}]


def test_content_encoding_boundaries_raise():
    """Malformed gzip raises; br/deflate are loud boundaries; trailing
    bytes after the gzip stream are a framing violation."""
    import zlib

    def resp(body, coding=b"gzip"):
        http = (b"HTTP/1.1 200 OK\r\n"
                + f"Content-Length: {len(body)}\r\n".encode()
                + b"Content-Encoding: " + coding + b"\r\n\r\n" + body)
        return W.encode_warc(
            [{"type": "response", "uri": "u", "content": http}])

    with pytest.raises(ValueError, match="damaged gzip"):
        W.warc_page_texts(resp(b"\x1f\x8bnot really gzip data"))
    gz = zlib.compress(b"<p>x</p>", wbits=31)
    with pytest.raises(ValueError, match="truncated gzip"):
        W.warc_page_texts(resp(gz[:-4]))
    with pytest.raises(ValueError, match="trailing bytes"):
        W.warc_page_texts(resp(gz + b"EXTRA"))
    with pytest.raises(NotImplementedError, match="content coding"):
        W.warc_page_texts(resp(gz, coding=b"br"))
    with pytest.raises(ValueError, match="neither zlib-wrapped nor raw"):
        W.warc_page_texts(resp(b"\x00garbage deflate\xff", coding=b"deflate"))


def test_content_encoding_deflate_sniffs_both_framings():
    """RFC says deflate = zlib-wrapped, real servers ship raw — the
    decoder sniffs like every browser: both framings must extract."""
    import zlib

    html = b"<p>deflated page</p>"
    wrapped = zlib.compress(html)
    co = zlib.compressobj(wbits=-15)
    raw = co.compress(html) + co.flush()
    for body in (wrapped, raw):
        http = (b"HTTP/1.1 200 OK\r\n"
                + f"Content-Length: {len(body)}\r\n".encode()
                + b"Content-Encoding: deflate\r\n\r\n" + body)
        p = W.encode_warc(
            [{"type": "response", "uri": "u", "content": http}])
        assert W.warc_page_texts(p) == [
            {"uri": "u", "text": "deflated page", "error": None}]


def test_chunked_trailing_bytes_raise():
    """Bytes after the chunked trailer's final CRLF are a framing
    violation — same strictness as the Content-Length path."""
    http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"2\r\nhi\r\n0\r\n\r\nEXTRA")
    p = W.encode_warc([{"type": "response", "uri": "u", "content": http}])
    with pytest.raises(ValueError, match="trailing bytes"):
        W.warc_page_texts(p)


def test_synthesize_gzip_content_encoding_slice(spark):
    """doc_id % 5 == 0 ships Content-Encoding: gzip (doc 0 and 15 also
    chunked — the full chain); every row still extracts to the exact
    corpus text."""
    df = spark.createDataFrame(
        [(i, f"body {i}") for i in range(16)], "doc_id long, text string")
    payload_rows = W.synthesize_warcs(df).collect()
    enc = {r.doc_id for r in payload_rows
           if b"Content-Encoding: gzip" in
           (W.parse_warc(bytes(r.payload))[2]["content"])}
    assert enc == {0, 5, 10, 15}
    rows = {r.doc_id: r.text
            for r in W.extract_warc_text(W.synthesize_warcs(df)).collect()}
    assert rows == {i: f'"body {i}" & more' for i in range(16)}


def test_whitespace_entities_uniformly_map_to_space():
    """ALL pure-whitespace-valued entities (nbsp and its aliases,
    ensp/thinsp/...) decode to a plain space at the table level, not
    just via the collapse pass."""
    for name in ("nbsp", "NonBreakingSpace", "ensp", "emsp", "thinsp",
                 "Tab", "NewLine"):
        assert W._ENTITIES.get(name, " ") == " ", name
    assert W.html_to_text("a&NonBreakingSpace;b") == "a b"


def test_warc_br_record_side_outputs_in_dlq_mode(spark):
    """A mixed gzip+br capture: strict mode raises the precise
    boundary; DLQ mode extracts the good record exactly and routes the
    brotli record to the error column — one br response must not fail
    the batch."""
    df = spark.createDataFrame(
        [(i, f"doc {i} mixed coding") for i in range(8)],
        "doc_id long, text string")
    arcs = W.synthesize_warcs(df, with_br=True)
    with pytest.raises(Exception):  # strict fan-out fails the task
        W.extract_warc_text(arcs).collect()
    rows = W.extract_warc_text(arcs, on_error="dlq").collect()
    good = {r.doc_id: r for r in rows if r.error is None}
    bad = {r.doc_id: r for r in rows if r.error is not None}
    assert set(good) == set(bad) == set(range(8))
    for i in range(8):
        assert good[i].text == f'"doc {i} mixed coding" & more'
        assert bad[i].uri.endswith("/br") and bad[i].text is None
        assert "content coding b'br' not supported" in bad[i].error


def test_warc_dlq_also_routes_damaged_http_frames():
    """DLQ mode catches per-record ValueError too (damaged HTTP), while
    WARC-level framing damage still raises — whole-file corruption is
    not a per-record condition."""
    good_http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                 b"Content-Length: 5\r\n\r\n<p>x</p>"[:43])
    # content-length 5 but body '<p>x</p>' is 8 bytes -> take the real
    # simple route: a record whose content is not HTTP at all
    recs = [
        {"type": "response", "uri": "http://e/1", "content": b"not http",
         "content_type": "application/http; msgtype=response"},
        {"type": "response", "uri": "http://e/2",
         "content": (b"HTTP/1.1 200 OK\r\nContent-Length: 3\r\n\r\nhey"),
         "content_type": "application/http; msgtype=response"},
    ]
    payload = W.encode_warc(recs)
    rows = W.warc_page_texts(payload, on_error="dlq")
    assert rows[0]["error"] is not None and rows[0]["text"] is None
    assert rows[1] == {"uri": "http://e/2", "text": "hey", "error": None}
    # WARC-level damage still raises even in dlq mode
    with pytest.raises(ValueError, match="separator|version|Content-Length"):
        W.warc_page_texts(payload[:-2], on_error="dlq")


def test_wet_conversion_records_extract(spark):
    """WET files (conversion records with plain-text bodies) extract
    the exact corpus text; non-conversion records skip; both gzip and
    plain layouts."""
    df = spark.createDataFrame(
        [(i, f"wet doc {i} body — unicode €") for i in range(6)],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            W.extract_wet_text(W.synthesize_wets(df)).collect()}
    assert set(rows) == set(range(6))
    for i in range(6):
        assert rows[i].text == f"wet doc {i} body — unicode €"
        assert rows[i].uri == f"http://example.com/doc/{i}"
    # a WET payload yields nothing through the response-record reader
    payloads = W.synthesize_wets(df).collect()
    assert W.warc_page_texts(bytes(payloads[0].payload)) == []
