"""PDF text extraction — the document-ingestion tier of a training-
data pipeline (SURVEY §2.10 extension family; charter: multimodal
columns with typed metadata).

Real parsing of the classic PDF 1.4 structure from the public spec
(ISO 32000 / Adobe PDF Reference): the cross-reference table located
via ``startxref``, indirect objects, the Catalog → Pages → Kids →
Page → Contents graph walked by reference (no content grepping),
FlateDecode content streams inflated with stdlib zlib, and the text
operators ``Tj`` / ``'`` / ``TJ`` tokenized with full literal-string
escape handling (nested parens, ``\\(``/``\\)``/``\\\\``, control
escapes, octal ``\\ddd``, line continuations). A companion encoder
writes spec-correct single-generation PDFs — including the xref
offsets the extractor cross-checks — so round-trip tests and the SQL
oracle can pin every layer.

Boundaries are loud and precise: encryption, object streams
(/ObjStm), and non-Flate filters raise ``NotImplementedError``; a
structurally broken file (bad xref offsets, missing trailer root,
dangling references) raises ``ValueError`` — corpus ingestion must
route those to the DLQ, not silently emit empty text.

Scale shape: extraction is per-document pure Python over an opaque
binary column — Arrow-batched ``mapInPandas`` fan-out (one row per
page), payload bytes never shuffle, downstream text operators (langid,
quality, dedup) compose on the extracted column.
"""

from __future__ import annotations

import re
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_NAME_RE = re.compile(rb"/(\w+)\s*/(\w+)")


def _escape_string(s: str) -> bytes:
    try:
        raw = s.encode("latin-1")
        # Latin-1 text that happens to START with þÿ would masquerade
        # as a UTF-16BE BOM at decode time — route it through the
        # UTF-16 path, where it round-trips unambiguously
        if raw[:2] == b"\xfe\xff":
            raise UnicodeEncodeError("latin-1", s, 0, 1, "BOM collision")
    except UnicodeEncodeError:
        # the spec's other text encoding: UTF-16BE with BOM — what real
        # writers emit for non-Latin-1 text. Never a lossy 'replace'.
        raw = b"\xfe\xff" + s.encode("utf-16-be")
    out = bytearray()
    for ch in raw:
        if ch in (0x28, 0x29, 0x5C):  # ( ) \
            out += b"\\" + bytes([ch])
        elif ch == 0x0A:
            out += b"\\n"
        elif ch == 0x0D:
            out += b"\\r"
        else:
            out.append(ch)
    return bytes(out)


def encode_pdf(pages: list[str], compress: bool = True) -> bytes:
    """Write a real PDF: catalog, pages tree, one content stream per
    page (each text line a ``Td``-positioned ``Tj``), shared Helvetica
    font, correct xref table and trailer. ``compress`` wraps content
    streams in FlateDecode — the dominant real-world layout."""
    objects: dict[int, bytes] = {}
    n_pages = len(pages)
    font_id = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                  ).encode()
    for i, text in enumerate(pages):
        page_id, content_id = 3 + 2 * i, 4 + 2 * i
        objects[page_id] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_id} 0 R >> >> "
            f"/Contents {content_id} 0 R >>"
        ).encode()
        ops = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for j, line in enumerate(text.split("\n")):
            if j:
                ops += b"T*\n"  # next line
            ops += b"(" + _escape_string(line) + b") Tj\n"
        ops += b"ET"
        stream = bytes(ops)
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        objects[content_id] = (
            b"<< " + filt + f"/Length {len(stream)} >>".encode()
            + b"\nstream\n" + stream + b"\nendstream"
        )
    objects[font_id] = (b"<< /Type /Font /Subtype /Type1 "
                        b"/BaseFont /Helvetica >>")
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for oid in sorted(objects):
        offsets[oid] = len(out)
        out += f"{oid} 0 obj\n".encode() + objects[oid] + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for oid in sorted(objects):
        out += f"{offsets[oid]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


def _parse_xref(payload: bytes) -> tuple[dict[int, int], bytes]:
    """startxref → xref table → ({object id: byte offset}, trailer
    dict source), validated. The trailer is located AFTER the xref
    table it follows — a first-match scan could be hijacked by the
    bytes of a content stream that happens to contain 'trailer <<'."""
    tail = payload[-256:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("PDF: no startxref/%%EOF trailer")
    at = int(m.group(1))
    if payload[at:at + 4] != b"xref":
        if payload[at:at + 1].isdigit():
            raise NotImplementedError(
                "PDF: cross-reference streams (1.5+ /ObjStm layout) "
                "are not supported")
        raise ValueError("PDF: startxref does not point at an xref table")
    pos = at + 4
    offsets: dict[int, int] = {}
    while True:
        m = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", payload[pos:pos + 64])
        if not m:
            break
        start, count = int(m.group(1)), int(m.group(2))
        pos += m.end()
        for i in range(count):
            entry = payload[pos:pos + 20]
            if len(entry) < 18:
                raise ValueError("PDF: truncated xref entry")
            off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
            if kind == b"n":
                offsets[start + i] = int(off)
            pos += 20
    if not offsets:
        raise ValueError("PDF: empty xref table")
    tm = re.compile(rb"trailer\s*<<(.*?)>>", re.DOTALL).search(payload, pos)
    if not tm:
        raise ValueError("PDF: no trailer dictionary after the xref table")
    return offsets, tm.group(1)


def _objects(payload: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """{id: (object source, raw stream bytes or None)}, with each used
    xref offset cross-checked against the object it claims to locate."""
    offsets, _ = _parse_xref(payload)
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    for oid, off in offsets.items():
        m = _OBJ_RE.match(payload, off)
        if not m or int(m.group(1)) != oid:
            raise ValueError(
                f"PDF: xref offset for object {oid} does not point at it")
        # the dict region ends at whichever of `stream` / `endobj`
        # comes FIRST — stream DATA may contain either keyword (zlib
        # output is arbitrary bytes, and corpus text can literally say
        # "endobj"), so keywords inside it must never terminate the
        # object: with a stream present, /Length is authoritative for
        # where the data ends
        sm = re.compile(rb"stream\r?\n").search(payload, m.end())
        eo = payload.find(b"endobj", m.end())
        stream = None
        if sm is not None and (eo < 0 or sm.start() < eo):
            body = payload[m.end():sm.start()]
            lm = re.search(rb"/Length\s+(\d+)", body)
            if not lm:
                raise NotImplementedError(
                    f"PDF: object {oid} stream has an indirect /Length "
                    "(not supported)")
            ln = int(lm.group(1))
            data_at = sm.end()
            if data_at + ln > len(payload):
                raise ValueError(
                    f"PDF: object {oid} /Length exceeds the file")
            stream = payload[data_at:data_at + ln]
            rest = payload[data_at + ln:data_at + ln + 64]
            em = re.match(rb"\s*endstream\s+endobj", rest)
            if not em:
                raise ValueError(
                    f"PDF: object {oid} stream unterminated "
                    "(/Length does not land on endstream)")
        else:
            if eo < 0:
                raise ValueError(f"PDF: object {oid} has no endobj")
            body = payload[m.end():eo]
        objs[oid] = (body, stream)
    return objs


def _ref(dict_src: bytes, key: str) -> int | None:
    m = re.search(rb"/" + key.encode() + rb"\s+(\d+)\s+\d+\s+R", dict_src)
    return int(m.group(1)) if m else None


def _refs_array(dict_src: bytes, key: str) -> list[int]:
    m = re.search(rb"/" + key.encode() + rb"\s*\[(.*?)\]", dict_src,
                  re.DOTALL)
    if not m:
        return []
    return [int(r) for r in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]


def _content_bytes(objs, oid: int) -> bytes:
    src, stream = objs[oid]
    if stream is None:
        raise ValueError(f"PDF: /Contents object {oid} has no stream")
    fm = re.search(rb"/Filter\s*(/\w+|\[[^\]]*\])", src)
    if fm:
        filters = re.findall(rb"/(\w+)", fm.group(1))
        if filters == [b"FlateDecode"]:
            try:
                stream = zlib.decompress(stream)
            except zlib.error as exc:
                raise ValueError(f"PDF: FlateDecode failed: {exc}") from None
        else:
            names = b",".join(filters).decode()
            raise NotImplementedError(
                f"PDF: stream filter(s) {names} need codecs "
                "(only FlateDecode decodes)")
    return stream


def _pdf_str(b: bytes) -> str:
    """Decode one literal string: BOM-marked UTF-16BE or Latin-1 (the
    spec's two text-string encodings)."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be")
    return b.decode("latin-1")


def _literal_strings_and_ops(content: bytes):
    """Tokenize a content stream into literal strings and operator
    tokens (enough for Tj/'/TJ extraction): yields ('str', bytes) and
    ('op', name)."""
    i, n = 0, len(content)
    while i < n:
        c = content[i:i + 1]
        if c == b"(":
            depth, i = 1, i + 1
            out = bytearray()
            while i < n and depth:
                ch = content[i]
                if ch == 0x5C:  # backslash escape
                    i += 1
                    if i >= n:
                        break
                    e = content[i:i + 1]
                    table = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
                             b"b": b"\b", b"f": b"\f", b"(": b"(",
                             b")": b")", b"\\": b"\\"}
                    if e in table:
                        out += table[e]
                        i += 1
                    elif e.isdigit():  # octal, up to 3 digits
                        oct_s = e
                        i += 1
                        while i < n and len(oct_s) < 3 \
                                and content[i:i + 1].isdigit():
                            oct_s += content[i:i + 1]
                            i += 1
                        out.append(int(oct_s, 8) & 0xFF)
                    elif e in (b"\n", b"\r"):  # line continuation
                        i += 1
                        if e == b"\r" and content[i:i + 1] == b"\n":
                            i += 1
                    else:  # unknown escape: the backslash drops
                        out += e
                        i += 1
                    continue
                if ch == 0x28:
                    depth += 1
                elif ch == 0x29:
                    depth -= 1
                    if not depth:
                        i += 1
                        break
                out.append(ch)
                i += 1
            else:
                if depth:
                    raise ValueError("PDF: unterminated literal string")
            yield ("str", bytes(out))
        elif c == b"[" or c == b"]":
            i += 1
        elif re.match(rb"[A-Za-z'\"*]", c):
            m = re.match(rb"[A-Za-z'\"*]+", content[i:i + 16])
            yield ("op", m.group(0))
            i += m.end()
        else:
            i += 1


def extract_pdf_pages(payload: bytes) -> list[str]:
    """Per-page extracted text, in pages-tree order. ``Tj`` and ``'``
    show one string; ``TJ`` shows each string element of its array
    (kerning numbers drop); ``'`` and ``T*`` imply line breaks."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF payload")
    if b"/Encrypt" in payload[-512:]:
        raise NotImplementedError("PDF: encrypted files are not supported")
    objs = _objects(payload)
    _, trailer = _parse_xref(payload)
    root = _ref(trailer, "Root")
    if root is None or root not in objs:
        raise ValueError("PDF: trailer /Root missing or dangling")
    pages_id = _ref(objs[root][0], "Pages")
    if pages_id is None or pages_id not in objs:
        raise ValueError("PDF: catalog /Pages missing or dangling")

    page_ids: list[int] = []

    def walk(nid: int) -> None:
        src = objs[nid][0]
        if b"/Type /Pages" in src or b"/Kids" in src:
            for kid in _refs_array(src, "Kids"):
                if kid not in objs:
                    raise ValueError(f"PDF: /Kids reference {kid} dangling")
                walk(kid)
        else:
            page_ids.append(nid)

    walk(pages_id)
    out = []
    for pid in page_ids:
        src = objs[pid][0]
        cid = _ref(src, "Contents")
        cids = [cid] if cid is not None else _refs_array(src, "Contents")
        content = b"\n".join(_content_bytes(objs, c) for c in cids)
        parts: list[str] = []
        pending: list[bytes] = []

        def flush() -> str:
            # decode PER STRING ELEMENT — TJ arrays may mix Latin-1 and
            # BOM-marked UTF-16BE strings, and the encodings are a
            # per-string property, not a per-operator one
            return "".join(_pdf_str(x) for x in pending)

        for kind, val in _literal_strings_and_ops(content):
            if kind == "str":
                pending.append(val)
            elif val in (b"Tj", b"TJ"):
                parts.append(flush())
                pending = []
            elif val in (b"'", b'"'):
                # '"' (show-with-word/char-spacing) shows its string
                # exactly like "'" after setting spacing params, which
                # text extraction ignores
                parts.append("\n" + flush())
                pending = []
            elif val == b"T*":
                parts.append("\n")
                pending = []
            else:
                if pending:
                    # loud-boundary discipline: no text-showing operator
                    # we know should ever leave a pending string to be
                    # silently discarded by an unrelated operator
                    raise NotImplementedError(
                        f"PDF: pending string discarded by operator "
                        f"{val!r} — unhandled text-showing form")
                pending = []
        out.append("".join(parts))
    return out


def decode_pdf(payload: bytes) -> dict:
    """Feature-dict form for the codec registry: page count, total
    extracted characters, mean characters per page."""
    pages = extract_pdf_pages(payload)
    total = sum(len(p) for p in pages)
    return {
        "media_kind": "document",
        "n_units": len(pages),
        "mean_value": (total / len(pages)) if pages else 0.0,
        "n_bytes": len(payload),
    }


def synthesize_pdfs(df: DataFrame, text_col: str = "text",
                    page_chars: int = 100,
                    id_col: str = "doc_id") -> DataFrame:
    """Materialize real PDF bytes per row from a text column (chunked
    into ``page_chars``-character pages; FlateDecode for odd ids, raw
    streams for even — both layouts occur in-corpus), Arrow-batched.
    The ingestion-side twin of ``synthesize_media``: payload bytes are
    built and stay on the executors."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d, t in zip(ids, pdf[text_col]):
                t = t or ""
                pages = ([t[i:i + page_chars]
                          for i in range(0, len(t), page_chars)] or [""])
                payloads.append(encode_pdf(pages, compress=bool(d % 2)))
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads,
                 "media_type": "application/pdf"})

    return df.select(id_col, text_col).mapInPandas(
        run, "doc_id long, payload binary, media_type string")


def extract_document_text(df: DataFrame,
                          keep: tuple[str, ...] = ()) -> DataFrame:
    """Arrow-batched page fan-out: one output row per PDF page
    (doc_id, page, text) — payload bytes never leave the UDF; the
    extracted text column feeds the text-analysis/dedup operators."""
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = "doc_id long, page int, text string" + (
        ", " + keep_schema if keep else "")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                for k, text in enumerate(extract_pdf_pages(bytes(p))):
                    rows.append((pdf["doc_id"].iloc[j], k, text,
                                 *[pdf[c].iloc[j] for c in keep]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "text", *keep])

    return df.mapInPandas(run, schema)
