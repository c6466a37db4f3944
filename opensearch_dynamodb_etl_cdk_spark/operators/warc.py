"""WARC web-archive ingestion + HTML text extraction — the
Common-Crawl-shaped front door of a training-data pipeline (SURVEY
§2.10 extension family; charter: text analysis over real corpus
containers).

Real parsing of the public WARC format (ISO 28500 / the warc-specs
repo): version line, CRLF header block, ``Content-Length``-delimited
content (NEVER a delimiter scan — bodies are arbitrary bytes and may
contain ``WARC/1.0``), the two-CRLF record separator, and the
per-record-gzip layout Common Crawl actually ships (each record its
own gzip member; members parsed with a ``zlib`` streaming object so
concatenated members and plain files both read). HTTP response
records split status/headers/body at the header boundary, honoring
``Content-Length`` when present.

``html_to_text`` is the extraction step every web-corpus pipeline
runs: drops ``<script>``/``<style>`` blocks and comments, strips
tags, decodes the standard + numeric character references, and
collapses whitespace. It is deliberately regex-grade (the public
trafilatura/jusText tier is a model-quality concern, not an engine
concern) but exact on well-formed markup — which is what lets the
catalog row oracle be DIRECT string equality against the source text.

Scale shape: WARC files are the classic "many medium blobs" input —
one Arrow batch of payloads in, small (uri, text) rows out, payload
bytes never shuffle; downstream langid/quality/dedup operators
compose on the extracted column.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

def _entity_table() -> dict[str, str]:
    """The FULL HTML5 named-entity set (stdlib `html.entities.html5`,
    ~2k names — real web pages use &mdash;/&rsquo;/&hellip; far beyond
    the XML five), keyed lowercase-insensitively the way the decoder
    looks names up, with the spec-exact case kept where names differ
    only by case (e.g. &Aacute; vs &aacute;). EVERY entity whose value
    is pure Unicode whitespace (&nbsp;, &NonBreakingSpace;, &ensp;,
    &thinsp;, ...) maps to a plain space — uniformly, not just the
    nbsp spelling — so token boundaries are normalized at decode time
    rather than leaning on the later collapse pass."""
    from html.entities import html5

    table: dict[str, str] = {}
    for name, value in html5.items():
        if not name.endswith(";"):
            continue  # bare legacy forms; _ENT_RE requires the ';'
        table[name[:-1]] = " " if value and value.strip() == "" else value
    return table


_ENTITIES = _entity_table()


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the per-record-gzip
    WARC layout) to one plain byte string."""
    out = bytearray()
    data = payload
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data)
        except zlib.error as exc:
            raise ValueError(f"WARC: gzip member damaged: {exc}") from None
        out += d.flush()
        if not d.eof:
            raise ValueError("WARC: truncated gzip member")
        data = d.unused_data
    return bytes(out)


def encode_warc(records: list[dict], gzip_per_record: bool = False) -> bytes:
    """Write a real WARC file: one record per dict (``type``, ``uri``,
    ``content`` bytes, optional ``content_type``), spec CRLF framing,
    optionally one gzip member per record (the Common Crawl layout)."""
    out = bytearray()
    for i, r in enumerate(records):
        content = r["content"]
        hdr = [
            "WARC/1.0",
            f"WARC-Type: {r['type']}",
            f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{i:012d}>",
            "WARC-Date: 2026-01-01T00:00:00Z",
        ]
        if r.get("uri"):
            hdr.append(f"WARC-Target-URI: {r['uri']}")
        if r.get("content_type"):
            hdr.append(f"Content-Type: {r['content_type']}")
        hdr.append(f"Content-Length: {len(content)}")
        rec = ("\r\n".join(hdr) + "\r\n\r\n").encode("ascii") \
            + content + b"\r\n\r\n"
        out += zlib.compress(rec, wbits=31) if gzip_per_record else rec
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC file (plain or per-record-gzip) into records:
    ``{"type", "uri", "headers", "content"}``. Content length comes
    from ``Content-Length`` ONLY — record bodies are arbitrary bytes
    and may contain ``WARC/1.0`` themselves, so a delimiter scan would
    mis-split; framing violations raise."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    records = []
    pos = 0
    while pos < len(payload):
        if payload[pos:pos + 5] != b"WARC/":
            raise ValueError(
                f"WARC: expected a version line at offset {pos}")
        he = payload.find(b"\r\n\r\n", pos)
        if he < 0:
            raise ValueError("WARC: unterminated record header block")
        head_lines = payload[pos:he].decode("latin-1").split("\r\n")
        version = head_lines[0]
        if version not in ("WARC/1.0", "WARC/1.1"):
            raise NotImplementedError(
                f"WARC: unsupported version {version!r}")
        headers: dict[str, str] = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        if "content-length" not in headers:
            raise ValueError("WARC: record missing Content-Length")
        ln = int(headers["content-length"])
        body_at = he + 4
        if body_at + ln > len(payload):
            raise ValueError("WARC: Content-Length exceeds the file")
        content = payload[body_at:body_at + ln]
        sep = payload[body_at + ln:body_at + ln + 4]
        if sep != b"\r\n\r\n":
            raise ValueError("WARC: missing record separator")
        records.append({
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri", ""),
            "headers": headers,
            "content": content,
        })
        pos = body_at + ln + 4
    return records


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer coding (RFC 9112 §7.1):
    ``chunk-size [;ext] CRLF chunk-data CRLF`` repeated, a ``0`` last
    chunk, optional trailer fields, and a final CRLF. Malformed framing
    raises — un-deframed chunked bodies leak hex size lines into
    extracted corpus text, which is exactly the silent corruption the
    loud boundary prevents."""
    out = bytearray()
    pos = 0
    while True:
        le = body.find(b"\r\n", pos)
        if le < 0:
            raise ValueError("WARC: chunked body missing size-line CRLF")
        size_line = body[pos:le].split(b";", 1)[0].strip()
        if not re.fullmatch(rb"[0-9a-fA-F]+", size_line):
            raise ValueError(
                f"WARC: bad chunk size line {body[pos:le]!r}")
        n = int(size_line, 16)
        pos = le + 2
        if n == 0:
            break
        if pos + n + 2 > len(body):
            raise ValueError("WARC: chunk data exceeds body")
        out += body[pos:pos + n]
        if body[pos + n:pos + n + 2] != b"\r\n":
            raise ValueError("WARC: chunk data missing trailing CRLF")
        pos = pos + n + 2
    # trailer section: zero or more header lines, then a bare CRLF
    while True:
        le = body.find(b"\r\n", pos)
        if le < 0:
            raise ValueError("WARC: chunked trailer unterminated")
        if le == pos:  # the final bare CRLF
            break
        pos = le + 2
    # Same strictness as the Content-Length path: the WARC record's
    # Content-Length frames the whole HTTP message, so bytes after the
    # trailer's final CRLF are a framing violation, not padding.
    if le + 2 != len(body):
        raise ValueError(
            f"WARC: {len(body) - le - 2} trailing bytes after the "
            "chunked trailer")
    return bytes(out)


def _decode_content_encoding(body: bytes, encodings: bytes) -> bytes:
    """Apply HTTP ``Content-Encoding`` content codings (RFC 9110 §8.4)
    in reverse declaration order. ``gzip``/``x-gzip`` decode via stdlib
    zlib (wbits=47 auto-detects gzip and zlib wrappers — real servers
    mislabel raw-zlib as gzip often enough that tolerating both is the
    de-facto spec); ``identity`` is a passthrough. ``deflate`` is
    RFC-defined as zlib-wrapped but shipped RAW by enough real servers
    that every browser sniffs — so this decoder does what browsers do:
    try the zlib wrapper first, fall back to raw deflate, raise only
    when both fail. ``br`` (no stdlib decoder) stays a loud
    boundary."""
    for coding in reversed(
            [c.strip().lower() for c in encodings.split(b",")]):
        if coding in (b"identity", b""):
            continue
        if coding == b"deflate":
            for wbits in (15, -15):  # zlib-wrapped, then raw (browser sniff)
                d = zlib.decompressobj(wbits=wbits)
                try:
                    out = d.decompress(body) + d.flush()
                except zlib.error:
                    continue
                if not d.eof:
                    continue  # truncated under this framing; try the other
                if d.unused_data:
                    raise ValueError(
                        f"WARC: {len(d.unused_data)} trailing bytes "
                        "after the deflate content coding")
                body = out
                break
            else:
                raise ValueError(
                    "WARC: deflate content coding decodes under "
                    "neither zlib-wrapped nor raw framing")
            continue
        if coding in (b"gzip", b"x-gzip"):
            d = zlib.decompressobj(wbits=47)
            try:
                out = d.decompress(body) + d.flush()
            except zlib.error as exc:
                raise ValueError(
                    f"WARC: damaged gzip content coding: {exc}") from None
            if not d.eof:
                raise ValueError("WARC: truncated gzip content coding")
            if d.unused_data:
                raise ValueError(
                    f"WARC: {len(d.unused_data)} trailing bytes after "
                    "the gzip content coding")
            body = out
            continue
        raise NotImplementedError(
            f"WARC: content coding {coding!r} not supported "
            "(gzip/x-gzip/identity only)")
    return body


def http_response_body(content: bytes) -> bytes:
    """Split an HTTP response record's content at the header boundary.
    ``Transfer-Encoding: chunked`` bodies are de-framed per RFC 9112
    §7.1 (chunked responses are routine in real Common Crawl captures,
    and Transfer-Encoding overrides Content-Length per RFC 9112 §6.3);
    otherwise Content-Length is authoritative when present. After
    de-framing, ``Content-Encoding`` content codings are decoded —
    real Common Crawl responses are overwhelmingly gzip-encoded, so
    skipping this step would hand gzip bytes to the text extractor."""
    if not content.startswith(b"HTTP/"):
        raise ValueError("WARC: response record content is not HTTP")
    he = content.find(b"\r\n\r\n")
    if he < 0:
        raise ValueError("WARC: HTTP headers unterminated")
    head = content[:he + 2]
    body = content[he + 4:]
    te = re.search(rb"(?im)^transfer-encoding:\s*([^\r]*)\r$", head)
    if te:
        codings = [c.strip().lower() for c in te.group(1).split(b",")]
        if codings != [b"chunked"]:
            raise NotImplementedError(
                f"WARC: transfer coding {te.group(1)!r} not supported "
                "(only a lone 'chunked')")
        body = _dechunk(body)
    else:
        m = re.search(rb"(?im)^content-length:\s*(\d+)\r$", head)
        if m:
            ln = int(m.group(1))
            if ln > len(body):
                raise ValueError("WARC: HTTP Content-Length exceeds body")
            body = body[:ln]
    ce = re.search(rb"(?im)^content-encoding:\s*([^\r]*)\r$", head)
    if ce:
        body = _decode_content_encoding(body, ce.group(1))
    return body


_SCRIPT_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_ENT_RE = re.compile(r"&(#[0-9]+|#[xX][0-9a-fA-F]+|\w+);")


def _entity(m: re.Match) -> str:
    """Decode one character reference; malformed or out-of-range refs
    (overflow codepoints, surrogates — all present in real web HTML)
    pass through verbatim rather than killing the task."""
    name = m.group(1)
    try:
        if name[:2] in ("#x", "#X"):
            cp = int(name[2:], 16)
        elif name.startswith("#"):
            cp = int(name[1:])
        else:
            # exact case first (&Aacute; and &aacute; are DIFFERENT
            # glyphs in HTML5), lowercase as the legacy-sloppiness
            # fallback (&AMP; etc.), verbatim passthrough otherwise
            if name in _ENTITIES:
                return _ENTITIES[name]
            return _ENTITIES.get(name.lower(), m.group(0))
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return m.group(0)
        return chr(cp)
    except (ValueError, OverflowError):
        return m.group(0)


def html_to_text(html: str) -> str:
    """Regex-grade HTML → text: script/style/comment removal, tag
    strip, entity decode (named set + decimal/hex numeric), whitespace
    collapse. Exact on well-formed markup — the property the equality
    oracle leans on."""
    s = _COMMENT_RE.sub(" ", html)
    s = _SCRIPT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENT_RE.sub(_entity, s)
    return re.sub(r"\s+", " ", s).strip()


def warc_page_texts(payload: bytes, on_error: str = "raise") -> list[dict]:
    """The ingestion composition: WARC records → HTTP responses →
    HTML → text. Non-response records (warcinfo, request, metadata)
    are skipped — the Common Crawl reading pattern.

    ``on_error="dlq"`` makes PER-RECORD failures (an unsupported
    content coding like ``br``, a damaged HTTP frame) side-output as
    ``{"uri", "text": None, "error": <message>}`` rows instead of
    failing the whole file — one brotli response in a capture must
    not poison the batch. WARC-level structural damage (broken record
    framing) still raises: that is whole-file corruption, not a
    per-record condition."""
    if on_error not in ("raise", "dlq"):
        raise ValueError(f"on_error must be raise/dlq, got {on_error!r}")
    out = []
    for r in parse_warc(payload):
        if r["type"] != "response":
            continue
        try:
            body = http_response_body(r["content"])
            out.append({
                "uri": r["uri"],
                "text": html_to_text(body.decode("utf-8", "replace")),
                "error": None,
            })
        except (NotImplementedError, ValueError) as exc:
            if on_error == "raise":
                raise
            out.append({"uri": r["uri"], "text": None,
                        "error": str(exc)})
    return out


def extract_warc_text(df: DataFrame,
                      keep: tuple[str, ...] = (),
                      on_error: str = "raise") -> DataFrame:
    """Arrow-batched fan-out: one output row per HTTP response record
    (doc_id, uri, text); payload bytes never leave the UDF.
    ``on_error="dlq"`` adds an ``error`` column and routes per-record
    failures (unsupported content codings, damaged HTTP frames) to it
    instead of failing the batch — the DLQ-style side-output a 100 TB
    Common Crawl ingest needs, since some share of real captures is
    brotli-encoded or damaged."""
    dlq = on_error == "dlq"
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = "doc_id long, uri string, text string" + (
        ", error string" if dlq else "") + (
        ", " + keep_schema if keep else "")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                for rec in warc_page_texts(bytes(p), on_error=on_error):
                    rows.append((pdf["doc_id"].iloc[j], rec["uri"],
                                 rec["text"],
                                 *((rec["error"],) if dlq else ()),
                                 *[pdf[c].iloc[j] for c in keep]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "uri", "text",
                *(("error",) if dlq else ()), *keep])

    return df.mapInPandas(run, schema)


def extract_wet_text(df: DataFrame,
                     keep: tuple[str, ...] = ()) -> DataFrame:
    """Common Crawl WET reader: WET files are WARC containers whose
    ``conversion`` records carry ALREADY-EXTRACTED plain text (UTF-8
    bodies, no HTTP framing) — the corpus form most text pipelines
    actually ingest. One output row per conversion record
    (doc_id, uri, text); warcinfo/request/response records skip."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = "doc_id long, uri string, text string" + (
        ", " + keep_schema if keep else "")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                for r in parse_warc(bytes(p)):
                    if r["type"] != "conversion":
                        continue
                    rows.append((pdf["doc_id"].iloc[j], r["uri"],
                                 r["content"].decode("utf-8"),
                                 *[pdf[c].iloc[j] for c in keep]))
            yield pd.DataFrame(rows, columns=["doc_id", "uri", "text",
                                              *keep])

    return df.mapInPandas(run, schema)


def synthesize_wets(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One real WET file per row: a warcinfo record plus a
    ``conversion`` record holding the corpus text as a UTF-8 plain-
    text body (the Common Crawl *.warc.wet.gz layout; per-record gzip
    for odd ids)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d, t in zip(ids, pdf[text_col]):
                uri = f"http://example.com/doc/{d}"
                recs = [
                    {"type": "warcinfo", "uri": "",
                     "content": b"software: wet-synthesizer\r\n",
                     "content_type": "application/warc-fields"},
                    {"type": "conversion", "uri": uri,
                     "content": (t or "").encode("utf-8"),
                     "content_type": "text/plain"},
                ]
                payloads.append(
                    encode_warc(recs, gzip_per_record=bool(d % 2)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads,
                                "media_type": "application/warc"})

    return df.select(id_col, text_col).mapInPandas(
        run, "doc_id long, payload binary, media_type string")


def synthesize_warcs(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     with_br: bool = False) -> DataFrame:
    """Materialize a real WARC file per row: a warcinfo record, an
    HTTP request record (both of which extraction must SKIP), and an
    HTTP response whose HTML wraps the corpus text with entity-encoded
    punctuation — so extraction exercises record filtering, HTTP
    splitting, tag stripping, and entity decoding. The corpus text is
    HTML-escaped (& < >) on the way in and entity-decoded back out by
    ``html_to_text``, so the DIRECT string-equality oracle holds for
    any markup-significant characters the fixture may grow. Whitespace
    runs / non-space whitespace in the text would NOT survive the
    collapse pass — that precondition is asserted loudly rather than
    silently violated. Per-record gzip for odd ids (the Common Crawl
    layout), plain for even; ids divisible by 3 ship the body with
    ``Transfer-Encoding: chunked`` (multi-chunk, extension + trailer
    present) instead of Content-Length; ids divisible by 5 ship the
    HTML gzip-compressed under ``Content-Encoding: gzip`` (the
    dominant real Common Crawl layout), so ids divisible by 15
    exercise the full chain: de-chunk, then gunzip. ``with_br`` adds
    a SECOND response per document carrying an (opaque) brotli-coded
    body — the mixed-coding capture shape that pins the DLQ
    side-output path."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d, t in zip(ids, pdf[text_col]):
                t = t or ""
                if re.search(r"\s\s|^\s|\s$|[^\S ]", t):
                    raise ValueError(
                        "synthesize_warcs: text with whitespace runs / "
                        "edges / non-space whitespace cannot round-trip "
                        "the html_to_text collapse pass; direct-equality "
                        f"oracle would break (doc_id={d})")
                esc = (t.replace("&", "&amp;").replace("<", "&lt;")
                        .replace(">", "&gt;"))
                uri = f"http://example.com/doc/{d}"
                html = (
                    "<html><head><title></title>"
                    "<script>var x = '<p>not text</p>';</script>"
                    "<style>p { color: red }</style></head>"
                    "<!-- comment -->"
                    f"<body><p>&quot;{esc}&quot; &amp; more</p></body></html>"
                ).encode()
                ce_hdr = b""
                if d % 5 == 0:
                    html = zlib.compress(html, wbits=31)
                    ce_hdr = b"Content-Encoding: gzip\r\n"
                if d % 3 == 0:
                    # chunked layout: split the markup into two chunks,
                    # exercise a chunk extension and a trailer field
                    cut = max(1, len(html) // 2)
                    body = b"".join([
                        f"{cut:x};ext=1\r\n".encode(), html[:cut], b"\r\n",
                        f"{len(html) - cut:X}\r\n".encode(), html[cut:],
                        b"\r\n0\r\nX-Trailer: done\r\n\r\n",
                    ])
                    http = (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n" + ce_hdr
                            + b"Transfer-Encoding: chunked\r\n\r\n" + body)
                else:
                    http = (b"HTTP/1.1 200 OK\r\n"
                            b"Content-Type: text/html\r\n" + ce_hdr
                            + f"Content-Length: {len(html)}\r\n\r\n".encode()
                            + html)
                recs = [
                    {"type": "warcinfo", "uri": "",
                     "content": b"software: synthesizer\r\n",
                     "content_type": "application/warc-fields"},
                    {"type": "request", "uri": uri,
                     "content": b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n",
                     "content_type": "application/http; msgtype=request"},
                    {"type": "response", "uri": uri, "content": http,
                     "content_type": "application/http; msgtype=response"},
                ]
                if with_br:
                    # a second response whose body claims the brotli
                    # content coding (opaque bytes — no stdlib decoder
                    # exists): extraction must side-output it per
                    # record, not fail the file
                    blob = bytes((d * 31 + i) % 251 for i in range(24))
                    recs.append({
                        "type": "response", "uri": uri + "/br",
                        "content": (b"HTTP/1.1 200 OK\r\n"
                                    b"Content-Type: text/html\r\n"
                                    b"Content-Encoding: br\r\n"
                                    + b"Content-Length: %d\r\n\r\n"
                                    % len(blob) + blob),
                        "content_type":
                            "application/http; msgtype=response"})
                payloads.append(
                    encode_warc(recs, gzip_per_record=bool(d % 2)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads,
                                "media_type": "application/warc"})

    return df.select(id_col, text_col).mapInPandas(
        run, "doc_id long, payload binary, media_type string")
