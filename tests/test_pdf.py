"""PDF text extraction: round-trips through both stream layouts,
escape handling, structure validation, precise boundaries, and the
Spark page fan-out."""

from __future__ import annotations

import pytest

from opensearch_dynamodb_etl_cdk_spark.operators import multimodal as M
from opensearch_dynamodb_etl_cdk_spark.operators import pdf as P


PAGES = ["hello world\nsecond line", "page two (with) \\ parens",
         "tab\there \x07 bell", "brief"]


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_round_trip(compress):
    payload = P.encode_pdf(PAGES, compress=compress)
    assert payload[:5] == b"%PDF-"
    assert P.extract_pdf_pages(payload) == PAGES


def test_pdf_escape_torture():
    """Every literal-string escape class survives: nested parens,
    backslash forms, octal, and line continuations."""
    text = "a(b(c)d)e \\ ( ) \n mix \r\t"
    assert P.extract_pdf_pages(P.encode_pdf([text])) == [text]
    # hand-built content with octal + continuation escapes
    toks = list(P._literal_strings_and_ops(rb"(\101\102\
C) Tj"))
    assert toks == [("str", b"ABC"), ("op", b"Tj")]
    # TJ array: strings concatenate, kerning numbers drop
    toks = list(P._literal_strings_and_ops(b"[(ab) -120 (cd)] TJ"))
    assert [t for t in toks if t[0] == "str"] == [
        ("str", b"ab"), ("str", b"cd")]


def test_pdf_structure_validation():
    good = P.encode_pdf(["x"])
    # missing trailer
    with pytest.raises(ValueError):
        P.extract_pdf_pages(b"%PDF-1.4 garbage")
    # not a PDF
    with pytest.raises(ValueError):
        P.extract_pdf_pages(b"plain text")
    # dangling /Root
    with pytest.raises(ValueError):
        P.extract_pdf_pages(good.replace(b"/Root 1 0 R", b"/Root 9 0 R"))
    # shifted offsets: every xref entry now points mid-token
    with pytest.raises(ValueError):
        P.extract_pdf_pages(good.replace(b"%PDF-1.4\n", b"%PDF-1.40\n"))
    # a dangling /Encrypt reference is structural corruption
    enc = good.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 7 0 R")
    with pytest.raises(ValueError):
        P.extract_pdf_pages(enc)
    # unsupported filter is a precise boundary (equal-length swap so
    # the xref offsets stay valid and the FILTER check is what fires)
    dct = P.encode_pdf(["x"], compress=True).replace(
        b"/Filter /FlateDecode", b"/Filter /DCTDecode  ")
    with pytest.raises(NotImplementedError):
        P.extract_pdf_pages(dct)


def test_pdf_length_is_authoritative_for_streams():
    """Compressed data ending in EOL bytes must not be clipped by the
    pre-endstream newline strip — /Length wins (a real-world zlib
    payload regression)."""
    import zlib

    for filler in ("Q" * 83, "R" * 120):  # content whose deflate ends \n-ish
        p = P.encode_pdf([filler], compress=True)
        assert P.extract_pdf_pages(p) == [filler]
    # across many texts, some deflate streams end in 0x0a/0x0d; the
    # batch asserts none are corrupted
    texts = [f"doc {i} " + "word " * (i % 37) for i in range(120)]
    for t in texts:
        assert P.extract_pdf_pages(P.encode_pdf([t]))[0] == t


def test_pdf_registry_dispatch():
    payload = P.encode_pdf(PAGES)
    assert M.detect_media_format(payload).name == "pdf"
    d = M.decode_media(payload, "application/pdf")
    assert d["media_kind"] == "document" and d["n_units"] == len(PAGES)
    total = sum(len(p) for p in PAGES)
    assert d["mean_value"] == pytest.approx(total / len(PAGES))


def test_pdf_spark_page_fan_out(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} " + "x" * (95 + i)) for i in range(6)],
        "doc_id long, text string",
    )
    rows = P.extract_document_text(P.synthesize_pdfs(df)).collect()
    by_doc = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.page)):
        by_doc.setdefault(r.doc_id, []).append(r.text)
    for i in range(6):
        t = f"doc {i} " + "x" * (95 + i)
        expect = [t[j:j + 100] for j in range(0, len(t), 100)]
        assert by_doc[i] == expect


def test_pdf_keywords_inside_stream_data():
    """Structural keywords appearing INSIDE content (corpus text can
    literally say 'endobj'; zlib output is arbitrary bytes) must not
    terminate objects or hijack the trailer — /Length and the
    after-xref trailer position are authoritative."""
    for text in ("see 1 0 endobj marker",
                 "has a trailer << weird >> thing",
                 "endstream endobj trailer << /Root 9 0 R >>",
                 "xref\n0 1\nstartxref"):
        for compress in (True, False):
            assert P.extract_pdf_pages(
                P.encode_pdf([text], compress=compress)) == [text]


def test_pdf_non_latin1_round_trips_via_utf16():
    """Non-Latin-1 text writes as BOM-marked UTF-16BE strings (the
    spec's other text encoding) and round-trips exactly — including a
    page that mixes both encodings across lines and CJK/emoji-free
    astral-adjacent chars."""
    pages = ["euro € and dash —", "汉字 text", "plain ascii",
             "mixed € line\nlatin line"]
    for compress in (True, False):
        assert P.extract_pdf_pages(
            P.encode_pdf(pages, compress=compress)) == pages


def test_pdf_latin1_text_resembling_a_bom_round_trips():
    """Latin-1 text starting with þÿ must not masquerade as a UTF-16
    BOM at decode time (it routes through the real UTF-16 path)."""
    for t in ("þÿab", "þÿa", "þplain"):
        assert P.extract_pdf_pages(P.encode_pdf([t])) == [t]


def test_pdf_quote_operator_shows_its_string():
    """The '"' operator (aw ac string ") shows text exactly like "'"
    — spec text-showing form used by real writers; silently dropping
    its string was quiet text loss."""
    raw = P.encode_pdf(["base"], compress=False)
    patched = raw.replace(b"(base) Tj", b'(base)  "')
    # patch keeps lengths identical (both 9 bytes), so xref offsets and
    # /Length stay valid
    assert len(patched) == len(raw)
    assert P.extract_pdf_pages(patched) == ["\nbase"]


def test_pdf_pending_string_discarded_raises():
    """Loud boundary: a literal string consumed by an operator we do
    not recognize as text-showing must raise, not vanish."""
    raw = P.encode_pdf(["base"], compress=False)
    patched = raw.replace(b"(base) Tj", b"(base) XX")
    assert len(patched) == len(raw)
    with pytest.raises(NotImplementedError, match="pending string"):
        P.extract_pdf_pages(patched)


LAYOUTS = ("classic", "xref-stream", "objstm", "hybrid")


@pytest.mark.parametrize("layout", LAYOUTS)
@pytest.mark.parametrize("compress", [True, False])
def test_pdf_round_trip_all_xref_layouts(layout, compress):
    """The 1.5+ layouts — xref STREAM, ObjStm-packed (PNG-predicted
    xref), hybrid /XRefStm — round-trip the same torture pages the
    classic table does."""
    payload = P.encode_pdf(PAGES, compress=compress, layout=layout)
    assert P.extract_pdf_pages(payload) == PAGES


@pytest.mark.parametrize("layout", LAYOUTS[1:])
def test_pdf_non_latin1_round_trips_in_new_layouts(layout):
    pages = ["euro € and dash —", "汉字 text", "plain\nlines"]
    assert P.extract_pdf_pages(
        P.encode_pdf(pages, layout=layout)) == pages


def test_pdf_objstm_layout_really_packs_and_predicts():
    """White-box: the objstm layout must actually contain a /Type
    /ObjStm with type-2 xref rows and a PNG-predicted xref stream —
    not silently fall back to direct objects."""
    p = P.encode_pdf(["x"], compress=True, layout="objstm")
    assert b"/ObjStm" in p
    assert b"/Predictor 12" in p
    assert b"trailer" not in p  # no classic trailer in this layout
    entries, trailer = P._parse_xref(p)
    kinds = {k for k, _ in entries.values()}
    assert kinds == {"d", "s"}  # both direct and in-stream objects
    assert b"/Root" in trailer
    # the catalog (object 1) must resolve through the ObjStm
    assert entries[1][0] == "s"


def test_pdf_hybrid_members_resolve_through_xrefstm():
    """Hybrid files mark packed members free in the classic table;
    they must resolve through /XRefStm, and startxref must point at
    the TABLE (the pre-1.5-reader entry point)."""
    p = P.encode_pdf(["hybrid page"], layout="hybrid")
    assert b"/XRefStm" in p and b"trailer" in p
    import re as _re
    at = int(_re.findall(rb"startxref\s+(\d+)", p)[-1])
    assert p[at:at + 4] == b"xref"  # classic table entry point
    entries, _ = P._parse_xref(p)
    assert entries[1][0] == "s"  # catalog resolved via the stream
    assert P.extract_pdf_pages(p) == ["hybrid page"]


def test_pdf_incremental_update_newest_revision_wins():
    """A /Prev chain: the appended revision's replacement content
    object shadows the original; the superseded startxref sitting
    inside the tail window must not hijack parsing."""
    base = P.encode_pdf(["old text"], compress=False, layout="classic")
    import re as _re
    old_xref_at = int(_re.findall(rb"startxref\s+(\d+)", base)[-1])
    stream = b"BT /F1 12 Tf 72 720 Td 14 TL\n(new text) Tj\nET"
    obj = (f"4 0 obj\n<< /Length {len(stream)} >>\nstream\n".encode()
           + stream + b"\nendstream\nendobj\n")
    obj_at = len(base)
    xref_at = obj_at + len(obj)
    update = (obj + b"xref\n0 1\n0000000000 65535 f \n"
              + f"4 1\n{obj_at:010d} 00000 n \n".encode()
              + f"trailer\n<< /Size 6 /Root 1 0 R /Prev {old_xref_at} "
                f">>\nstartxref\n{xref_at}\n%%EOF\n".encode())
    assert P.extract_pdf_pages(base + update) == ["new text"]


def test_pdf_cyclic_prev_chain_raises():
    p = P.encode_pdf(["x"], layout="classic")
    import re as _re
    xref_at = int(_re.findall(rb"startxref\s+(\d+)", p)[-1])
    cyc = p.replace(b"trailer\n<< /Size",
                    f"trailer\n<< /Prev {xref_at} /Size".encode())
    with pytest.raises(ValueError, match="cyclic"):
        P.extract_pdf_pages(cyc)


def test_pdf_objstm_pair_table_must_agree_with_xref():
    """An ObjStm whose pair table lists a different object number at
    the xref-claimed index is a structural lie → ValueError."""
    p = P.encode_pdf(["x"], compress=False, layout="objstm")
    # the UNCOMPRESSED ObjStm header starts "1 0 2 ..." — renumber
    # member 1 to 9 (same byte length) so the pair table disagrees
    assert b"/ObjStm" in p and b"/Filter" not in p.split(b"/ObjStm")[1][:80]
    patched = p.replace(b"stream\n1 0 2 ", b"stream\n9 0 2 ")
    assert patched != p
    with pytest.raises(ValueError, match="pair table"):
        P.extract_pdf_pages(patched)


def test_pdf_predictor_and_xref_stream_validation():
    from opensearch_dynamodb_etl_cdk_spark.operators.pdf import (
        _unpredict_png, _predict_png_up)

    data = bytes(range(49))  # 7 rows x 7 cols
    assert _unpredict_png(_predict_png_up(data, 7), 7) == data
    with pytest.raises(ValueError, match="whole rows"):
        _unpredict_png(b"\x00" * 9, 7)
    with pytest.raises(ValueError, match="filter type"):
        _unpredict_png(b"\x09" + b"\x00" * 7, 7)
    # TIFF predictor is a loud boundary
    p = P.encode_pdf(["x"], layout="objstm")
    bad = p.replace(b"/Predictor 12", b"/Predictor 02")
    with pytest.raises(NotImplementedError, match="TIFF predictor"):
        P.extract_pdf_pages(bad)


def test_pdf_indirect_length_validation():
    """Indirect /Length RESOLVES now (companion integer object); what
    stays loud: a ref dangling outside the xref, and a length object
    that is not a plain integer."""
    import re as _re

    p = P.encode_pdf(["x" * 40], compress=False, layout="classic")
    # equal-length swap pointing the ref at an object the xref lacks
    m = _re.search(rb"/Length (\d\d)", p)
    patched = p[:m.start()] + b"/Length %s 0 R" % m.group(1) \
        + p[m.end() + 4:]
    assert len(patched) == len(p)
    with pytest.raises(ValueError, match="not in the xref"):
        P.extract_pdf_pages(patched)
    # a real indirect-length file whose length object is NOT an integer
    good = P.encode_pdf(["x" * 40], compress=False, layout="classic",
                        indirect_length=True)
    lm = _re.search(rb"(\d+) 0 obj\n(\d+)\nendobj", good)
    bad = good[:lm.start(2)] + b"x" * len(lm.group(2)) + good[lm.end(2):]
    with pytest.raises(ValueError, match="not an integer"):
        P.extract_pdf_pages(bad)


def test_pdf_hex_strings_round_trip():
    """HEX strings (<...> Tj) — the subsetted-font text form — decode
    exactly: both text encodings, whitespace inside digits, odd-digit
    zero padding, and dict tokens (<< >>) must not be mistaken for
    them."""
    pages = ["hex shown text", "euro € line\nsecond", "þÿ tricky"]
    for layout in ("classic", "objstm"):
        p = P.encode_pdf(pages, layout=layout, hex_strings=True,
                         compress=False)
        assert b"> Tj" in p
        assert P.extract_pdf_pages(p) == pages
        assert P.extract_pdf_pages(
            P.encode_pdf(pages, layout=layout, hex_strings=True)) == pages
    # hand-built: whitespace splits, odd digit pads with 0
    toks = list(P._literal_strings_and_ops(b"<4 86\n99> Tj << /MC 1 >>"))
    assert toks[0] == ("str", b"Hi\x90")
    assert ("op", b"Tj") in toks
    with pytest.raises(ValueError, match="unterminated hex"):
        list(P._literal_strings_and_ops(b"<486"))
    with pytest.raises(ValueError, match="non-hex"):
        list(P._literal_strings_and_ops(b"<4z6> Tj"))


def test_pdf_inline_image_is_a_loud_boundary():
    raw = P.encode_pdf(["base"], compress=False)
    patched = raw.replace(b"(base) Tj", b"BI ID  EI")   # same length
    assert len(patched) == len(raw)
    with pytest.raises(NotImplementedError, match="inline image"):
        P.extract_pdf_pages(patched)


def test_pdf_utf8_bom_strings_decode_and_latin1_collision_guard():
    """PDF 2.0 allows BOM-marked UTF-8 text strings; hand-built ones
    decode, and Latin-1 corpus text that happens to START with ï»¿
    routes through UTF-16 rather than masquerading as a UTF-8 BOM."""
    assert P._pdf_str(b"\xef\xbb\xbf" + "utf8 € text".encode()) \
        == "utf8 € text"
    for t in ("ï»¿tricky", "ï»¿", "ïplain"):
        assert P.extract_pdf_pages(P.encode_pdf([t])) == [t]
    # hex-string form of a UTF-8 BOM string decodes too
    raw = (b"\xef\xbb\xbf" + "héllo".encode()).hex().encode()
    toks = list(P._literal_strings_and_ops(b"<" + raw + b"> Tj"))
    assert P._pdf_str(toks[0][1]) == "héllo"


@pytest.mark.parametrize("chain", ["LZW", "AHx", "A85", "RL",
                                   "A85+Flate", "AHx+RL", "RL+LZW"])
def test_pdf_stream_filters_round_trip(chain):
    """ISO 32000 §7.4 non-Flate filters and declaration-order chains
    round-trip exactly, in every xref layout."""
    pages = ["filter torture ( ) \\ text", "seconde pagé naïve"]
    for layout in ("classic", "objstm"):
        p = P.encode_pdf(pages, layout=layout, content_filter=chain)
        assert P.extract_pdf_pages(p) == pages


def test_pdf_filter_codec_unit_vectors():
    """Spec-pinned vectors for each codec: hex padding, the z
    shorthand, partial 85-groups, literal/run mixes."""
    assert P._ascii_hex_decode(b"48 65 6c6C 6f>") == b"Hello"
    assert P._ascii_hex_decode(b"7>") == b"p"  # odd digit pads 0
    assert P._ascii_hex_decode(P._ascii_hex_encode(b"\x00\xff ab")) \
        == b"\x00\xff ab"
    # ASCII85: 'z' is four zero bytes; partial groups; wikipedia vector
    assert P._ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"
    assert P._ascii85_decode(b"87cUR~>") == b"Hell"
    assert P._ascii85_encode(b"easy") == b"ARTY*~>"
    # stdlib cross-check on assorted lengths
    import base64
    for data in (b"", b"x", b"four", b"\x00\x00\x00\x00tail", b"mixed 85"):
        assert P._ascii85_decode(base64.a85encode(data) + b"~>") == data
    for data in (b"", b"a", b"ab", b"abc", b"abcd", b"sure.", b"\x00" * 9,
                 bytes(range(256))):
        assert P._ascii85_decode(P._ascii85_encode(data)) == data
        assert P._run_length_decode(P._run_length_encode(data)) == data
    assert P._run_length_decode(b"\x02abc\xfeX\x80") == b"abcXXX"
    # runs longer than 128 split correctly
    long = b"Q" * 300 + b"literal" + b"Z" * 2
    assert P._run_length_decode(P._run_length_encode(long)) == long
    # LZW round-trips through the shared TIFF core
    assert P._lzw_decode(P._lzw_encode(b"TOBEORNOTTOBEORTOBEORNOT"), b"") \
        == b"TOBEORNOTTOBEORTOBEORNOT"


def test_pdf_filter_codec_malformed_raise():
    with pytest.raises(ValueError, match="EOD"):
        P._ascii_hex_decode(b"4865")  # missing '>'
    with pytest.raises(ValueError, match="bad character"):
        P._ascii_hex_decode(b"4g>")
    with pytest.raises(ValueError, match="EOD"):
        P._ascii85_decode(b"87cUR")  # missing '~>'
    with pytest.raises(ValueError, match="1-character final group"):
        P._ascii85_decode(b"a~>")
    with pytest.raises(ValueError, match="overflows"):
        P._ascii85_decode(b"uuuuu~>")  # > 2^32-1
    with pytest.raises(ValueError, match="'z' inside a group"):
        P._ascii85_decode(b"az~>")
    with pytest.raises(ValueError, match="bad character"):
        P._ascii85_decode(b"ab\x7fcd~>")
    with pytest.raises(ValueError, match="EOD"):
        P._run_length_decode(b"\x02abc")  # no 0x80
    with pytest.raises(ValueError, match="literal truncated"):
        P._run_length_decode(b"\x05ab")
    with pytest.raises(ValueError, match="run truncated"):
        P._run_length_decode(b"\xfe")
    with pytest.raises(NotImplementedError, match="EarlyChange"):
        P._lzw_decode(b"\x80", b"/EarlyChange 0")


def test_pdf_decode_parms_array_per_filter():
    """An array /DecodeParms maps entries to chained filters in
    order — null for no-parms, a dict for the predictor."""
    assert P._split_decode_parms(
        b"/Filter [/A /B] /DecodeParms [null << /Predictor 12 >>]", 2) \
        == [b"", b" /Predictor 12 "]
    assert P._split_decode_parms(b"/DecodeParms << /Columns 7 >>", 2) \
        == [b" /Columns 7 ", b""]
    assert P._split_decode_parms(b"no parms here", 3) == [b"", b"", b""]


def test_pdf_synthesizer_cycles_stream_filters(spark):
    """doc_id % 11 walks LZW/AHx/A85/RL and the A85+Flate chain; every
    variant still extracts to the exact source text."""
    df = spark.createDataFrame(
        [(i, f"doc {i} filter cycle text") for i in range(22)],
        "doc_id long, text string")
    payload_rows = P.synthesize_pdfs(df).collect()
    seen = set()
    for r in payload_rows:
        p = bytes(r.payload)
        for f in (b"LZWDecode", b"ASCIIHexDecode", b"ASCII85Decode",
                  b"RunLengthDecode"):
            if b"/Filter /" + f in p:
                seen.add(f.decode())
        if b"/Filter [/ASCII85Decode /FlateDecode]" in p:
            seen.add("chain")
    assert seen == {"LZWDecode", "ASCIIHexDecode", "ASCII85Decode",
                    "RunLengthDecode", "chain"}
    texts = {r.doc_id: r.text
             for r in P.extract_document_text(P.synthesize_pdfs(df)).collect()}
    assert texts == {i: f"doc {i} filter cycle text" for i in range(22)}


def test_pdf_rc4_known_answer_vectors():
    """RC4 core pinned to the public known-answer vectors — the
    round-trip tests alone could hide a mirrored bug on both sides."""
    assert P._rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert P._rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert P._rc4(b"Secret", b"Attack at dawn").hex() == \
        "45a01f645fc35b383552544b9bf5"
    # self-inverse
    assert P._rc4(b"k", P._rc4(b"k", b"abc")) == b"abc"


def test_pdf_encrypted_round_trip_all_layouts():
    """Standard-security-handler encryption (empty user password)
    decrypts for real: both RC4 widths x all four xref layouts x
    filter chains extract the exact source text."""
    pages = ["hello encrypted world", "page two\nline 2", "third"]
    for mode in ("rc4-40", "rc4-128"):
        for layout in ("classic", "xref-stream", "objstm", "hybrid"):
            for cf in (None, "LZW", "A85+Flate"):
                b = P.encode_pdf(pages, layout=layout, encrypt=mode,
                                 content_filter=cf)
                assert P.extract_pdf_pages(b) == pages, (mode, layout, cf)
    # composes with indirect /Length companions and hex strings
    b = P.encode_pdf(pages, layout="objstm", encrypt="rc4-128",
                     indirect_length=True, hex_strings=True)
    assert P.extract_pdf_pages(b) == pages
    # ciphertext differs between widths; plaintext never leaks
    e40 = P.encode_pdf(["secret marker text"], encrypt="rc4-40",
                       compress=False)
    e128 = P.encode_pdf(["secret marker text"], encrypt="rc4-128",
                        compress=False)
    assert b"secret marker text" not in e40
    assert b"secret marker text" not in e128
    assert e40 != e128


def test_aes_known_answer_vectors():
    """FIPS-197 Appendix C.1/C.3 pin the generated-S-box cipher, both
    directions, and the T-table CBC fast path agrees with the
    byte-list reference path."""
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k128, k256 = bytes(range(16)), bytes(range(32))
    c1 = P._aes_encrypt_block(P._aes_expand_key(k128), pt)
    assert c1.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    c3 = P._aes_encrypt_block(P._aes_expand_key(k256), pt)
    assert c3.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert P._aes_decrypt_block(P._aes_expand_key(k128), c1) == pt
    assert P._aes_decrypt_block(P._aes_expand_key(k256), c3) == pt
    # CBC(zero IV) over one block == the raw block transform
    assert P._aes_cbc_encrypt(k128, bytes(16), pt) == c1
    data = bytes(range(256)) * 3
    for key in (k128, k256):
        iv = P._aes_encrypt_block(P._aes_expand_key(key), bytes(16))
        enc = P._aes_cbc_encrypt(key, iv, data)
        assert P._aes_cbc_decrypt(key, iv, enc) == data
        enc2 = P._aes_stream_encrypt(key, iv, data[:100])
        assert P._aes_stream_decrypt(key, enc2) == data[:100]


def test_hash_2b_precomputed_seeds_match_algorithm():
    """The pre-seeded fixture KDF digests must equal what Algorithm
    2.B actually computes — recompute every memo seed through the raw
    path so the constants cannot drift from the implementation."""
    vs, ks = P._FIXTURE_U_SALTS
    ovs, oks = P._FIXTURE_O_SALTS
    opw = P._FIXTURE_OWNER_PW
    u_entry = P._FIXTURE_U_ENTRY
    assert P._hash_2b_raw(b"", vs) == P._H2B_MEMO[(b"", vs, b"")]
    assert P._hash_2b_raw(b"", ks) == P._H2B_MEMO[(b"", ks, b"")]
    assert P._hash_2b_raw(opw, ovs, u_entry) == \
        P._H2B_MEMO[(opw, ovs, u_entry)]
    assert P._hash_2b_raw(opw, oks, u_entry) == \
        P._H2B_MEMO[(opw, oks, u_entry)]
    assert u_entry[:32] == P._H2B_MEMO[(b"", vs, b"")]


def test_pdf_aes_encrypted_round_trip_all_layouts():
    """AESV2 (/V 4 /R 4) and AESV3 (/V 5 /R 6) decrypt for real across
    the xref layouts, filters, and indirect /Length companions (AES
    grows streams, so the companion rewrite is load-bearing)."""
    pages = ["hello AES world", "page two\nline 2"]
    for mode in ("aes-128", "aes-256"):
        for layout in ("classic", "xref-stream", "objstm", "hybrid"):
            for cf in (None, "A85+Flate"):
                b = P.encode_pdf(pages, layout=layout, encrypt=mode,
                                 content_filter=cf)
                assert P.extract_pdf_pages(b) == pages, (mode, layout, cf)
        b = P.encode_pdf(pages, layout="objstm", encrypt=mode,
                         indirect_length=True, hex_strings=True)
        assert P.extract_pdf_pages(b) == pages, mode
        e = P.encode_pdf(["secret marker text"], encrypt=mode,
                         compress=False)
        assert b"secret marker text" not in e, mode


def test_pdf_encryption_boundaries_are_loud():
    """Wrong (non-empty) user password — all revisions — and unknown
    crypt methods / handlers stay precise NotImplementedError
    boundaries; corrupted /V 5 key material is structural."""
    import re as _re

    b = P.encode_pdf(["boundary text"], encrypt="rc4-40")
    m = _re.search(rb"/U \(", b)
    bad_u = b[:m.end()] + bytes([b[m.end()] ^ 0xFF]) + b[m.end() + 1:]
    with pytest.raises(NotImplementedError, match="user password"):
        P.extract_pdf_pages(bad_u)
    alien = b.replace(b"/Filter /Standard", b"/Filter /AcmeSec ")
    with pytest.raises(NotImplementedError, match="AcmeSec"):
        P.extract_pdf_pages(alien)
    # unknown crypt-filter method on a /V 4 file
    a = P.encode_pdf(["boundary text"], encrypt="aes-128")
    with pytest.raises(NotImplementedError, match="AESV9"):
        P.extract_pdf_pages(a.replace(b"/CFM /AESV2", b"/CFM /AESV9"))
    # /V 5: a non-empty user password shows as a validation-hash miss
    a6 = P.encode_pdf(["boundary text"], encrypt="aes-256")
    um = _re.search(rb"/U \(", a6)
    bad6 = (a6[:um.end()] + bytes([a6[um.end()] ^ 0xFF])
            + a6[um.end() + 1:])
    with pytest.raises(NotImplementedError, match="user password"):
        P.extract_pdf_pages(bad6)


def test_pdf_synthesizer_cycles_encryption(spark):
    """doc_id % 13 == 4/8/2/11 emit RC4-40/RC4-128/AES-128/AES-256
    encrypted PDFs; the extraction fan-out is
    encryption-transparent."""
    df = spark.createDataFrame(
        [(i, f"doc {i} encryption cycle") for i in range(26)],
        "doc_id long, text string")
    rows = {r.doc_id: bytes(r.payload)
            for r in P.synthesize_pdfs(df).collect()}
    enc_ids = {i for i in range(26) if i % 13 in (4, 8, 2, 11)}
    for i, p in rows.items():
        assert (b"/Encrypt" in p) == (i in enc_ids), i
    v1 = {i for i in enc_ids if b"/V 1" in rows[i]}
    assert v1 == {i for i in range(26) if i % 13 == 4}
    assert all(b"/AESV2" in rows[i] for i in range(26) if i % 13 == 2)
    assert all(b"/AESV3" in rows[i] for i in range(26) if i % 13 == 11)
    texts = {r.doc_id: r.text
             for r in P.extract_document_text(P.synthesize_pdfs(df)).collect()}
    assert texts == {i: f"doc {i} encryption cycle" for i in range(26)}


def test_extract_document_text_dlq_side_output(spark):
    """on_error='dlq': a corrupted PDF yields one page=-1 error row
    instead of failing the batch; good documents are unaffected and
    the default path still raises."""
    df = spark.createDataFrame(
        [(1, "good doc one"), (2, "bad doc"), (3, "good doc three")],
        "doc_id long, text string")
    from pyspark.sql import functions as F
    pdfs = P.synthesize_pdfs(df).withColumn(
        "payload",
        F.when(F.col("doc_id") == 2, F.lit(b"XXXX garbage"))
        .otherwise(F.col("payload")))
    rows = sorted(P.extract_document_text(pdfs, on_error="dlq").collect(),
                  key=lambda r: (r.doc_id, r.page))
    assert [(r.doc_id, r.page, r.text, r.error) for r in rows] == [
        (1, 0, "good doc one", None),
        (2, -1, None, "not a PDF payload"),
        (3, 0, "good doc three", None)]
    with pytest.raises(Exception):
        P.extract_document_text(pdfs).collect()
