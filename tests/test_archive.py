"""Archive ingestion: tar/zip round-trips cross-validated against
stdlib tarfile/zipfile in BOTH directions, gzip composition, malformed
rejections, and the Spark member fan-out."""

from __future__ import annotations

import io
import tarfile
import zipfile
import struct
import zlib

import pytest

from opensearch_dynamodb_etl_cdk_spark.operators import archive as A

MEMBERS = [
    ("manifest.txt", b"doc=5"),
    ("doc_5.txt", b"hello world " * 30),
    ("empty.bin", b""),
]


def test_tar_round_trip_and_stdlib_cross_check():
    t = A.encode_tar(MEMBERS)
    assert A.parse_tar(t) == MEMBERS
    assert A.extract_members(t) == MEMBERS
    # stdlib reads ours
    tf = tarfile.open(fileobj=io.BytesIO(t))
    assert [(m.name, tf.extractfile(m).read()) for m in tf] == MEMBERS
    # ours reads stdlib's
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as w:
        for n, d in MEMBERS:
            ti = tarfile.TarInfo(n)
            ti.size = len(d)
            w.addfile(ti, io.BytesIO(d))
    assert A.parse_tar(buf.getvalue()) == MEMBERS
    # gzip-wrapped tar dispatches through the same entry point
    assert A.extract_members(zlib.compress(t, wbits=31)) == MEMBERS


def test_zip_round_trip_and_stdlib_cross_check():
    z = A.encode_zip(MEMBERS)
    assert A.parse_zip(z) == MEMBERS
    assert A.parse_zip(A.encode_zip(MEMBERS, compress=False)) == MEMBERS
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert [(n, zf.read(n)) for n in zf.namelist()] == MEMBERS
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        for n, d in MEMBERS:
            w.writestr(n, d)
    assert A.parse_zip(buf.getvalue()) == MEMBERS
    # deflate actually engages for compressible members
    assert len(z) < len(A.encode_zip(MEMBERS, compress=False))


def test_archive_malformed_rejections():
    t, z = A.encode_tar(MEMBERS), A.encode_zip(MEMBERS)
    with pytest.raises(ValueError):  # terminator gone
        A.parse_tar(t[:-1500])
    bad = bytearray(t)
    bad[150] ^= 0x01  # header checksum
    with pytest.raises(ValueError):
        A.parse_tar(bytes(bad))
    with pytest.raises(ValueError):  # EOCD gone
        A.parse_zip(z[: z.rfind(b"PK\x05\x06")])
    crc = bytearray(z)
    i = crc.find(b"PK\x01\x02")
    crc[i + 16] ^= 0xFF
    with pytest.raises(ValueError):
        A.parse_zip(bytes(crc))
    with pytest.raises(ValueError):
        A.extract_members(b"not an archive at all")
    # link typeflags are precise boundaries
    link = bytearray(A.encode_tar([("a.txt", b"x")]))
    link[156] = 0x32  # typeflag '2': symlink
    link[148:156] = f"{A._tar_checksum(bytes(link[:512])):06o}\x00 ".encode()
    with pytest.raises(NotImplementedError):
        A.parse_tar(bytes(link))


def test_archive_spark_member_fan_out(spark):
    """zip for odd ids, tar.gz for even — two member rows per doc
    either way, text bytes exact."""
    df = spark.createDataFrame(
        [(i, f"doc {i} body") for i in range(6)],
        "doc_id long, text string",
    )
    rows = A.extract_archive_members(
        A.synthesize_archives(df), with_bytes=True).collect()
    assert len(rows) == 12
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.member] = bytes(r.payload)
    for i in range(6):
        assert by_doc[i]["manifest.txt"] == f"doc={i}".encode()
        assert by_doc[i][f"doc_{i}.txt"] == f"doc {i} body".encode()


def test_archived_pdf_chain_round_trips(spark):
    """corpus text → PDF → archive → member fan-out → page extraction:
    the text survives every layer byte-exact."""
    from opensearch_dynamodb_etl_cdk_spark.operators import pdf as P

    df = spark.createDataFrame(
        [(i, f"doc {i} " + "w" * (150 + i)) for i in range(4)],
        "doc_id long, text string",
    )
    pdfs = P.synthesize_pdfs(df)
    archives = A.wrap_payloads_in_archives(pdfs, "doc_{id}.pdf")
    members = A.extract_archive_members(archives, with_bytes=True)
    pages = P.extract_document_text(
        members.select("doc_id", "payload")).collect()
    by_doc = {}
    for r in sorted(pages, key=lambda r: (r.doc_id, r.page)):
        by_doc.setdefault(r.doc_id, []).append(r.text)
    for i in range(4):
        t = f"doc {i} " + "w" * (150 + i)
        assert "".join(by_doc[i]) == t


def test_archive_non_ascii_member_names_round_trip():
    members = [("café.txt", b"x"), ("日本語/データ.bin", b"yz")]
    assert A.parse_zip(A.encode_zip(members)) == members
    assert A.parse_tar(A.encode_tar(members)) == members
    # the zip EFS flag is set so external tools read UTF-8 names too
    import io
    import zipfile

    zf = zipfile.ZipFile(io.BytesIO(A.encode_zip(members)))
    assert zf.namelist() == [n for n, _ in members]


def test_tar_ustar_prefix_field_is_honored():
    """stdlib tarfile splits >100-char paths into prefix+name; our
    reader must reassemble them."""
    import io
    import tarfile

    long_path = "dir_" + "x" * 95 + "/file.txt"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        ti = tarfile.TarInfo(long_path)
        ti.size = 2
        w.addfile(ti, io.BytesIO(b"ab"))
    assert A.parse_tar(buf.getvalue()) == [(long_path, b"ab")]


LONG = "deep/" * 30 + "member_" + "y" * 80 + ".txt"  # far past 100 bytes


@pytest.mark.parametrize("mode", ["pax", "gnu"])
def test_tar_long_paths_round_trip_both_mechanisms(mode):
    """>100-byte member paths survive our encoder→parser through both
    real-world mechanisms: PAX x-header path records and GNU
    @LongLink blocks."""
    members = [("short.txt", b"s"), (LONG, b"long data"),
               ("post.txt", b"p")]
    assert A.parse_tar(A.encode_tar(members, long_names=mode)) == members


@pytest.mark.parametrize("fmt_name", ["PAX_FORMAT", "GNU_FORMAT"])
def test_tar_stdlib_written_long_paths_parse(fmt_name):
    """Cross-validation: stdlib tarfile's PAX and GNU long-name output
    parses exactly (the same both-directions discipline as ustar)."""
    import io
    import tarfile

    buf = io.BytesIO()
    fmt = getattr(tarfile, fmt_name)
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as w:
        for name, data in [("a.txt", b"aa"), (LONG, b"bb")]:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            w.addfile(ti, io.BytesIO(data))
    assert A.parse_tar(buf.getvalue()) == [("a.txt", b"aa"), (LONG, b"bb")]


def test_tar_our_pax_output_reads_with_stdlib():
    import io
    import tarfile

    members = [(LONG, b"payload"), ("plain.txt", b"x")]
    for mode in ("pax", "gnu"):
        t = tarfile.open(fileobj=io.BytesIO(
            A.encode_tar(members, long_names=mode)))
        got = [(m.name, t.extractfile(m).read())
               for m in t.getmembers()]
        assert got == members, mode


def test_tar_pax_records_parse_and_override():
    """PAX mechanics: length-delimited records (values may contain
    newlines and non-ASCII), per-file x beats global g, size
    override wins over the header field."""
    recs = A._parse_pax_records(
        A._pax_record("path", "a/b\nc.txt") + A._pax_record("size", "3")
        + A._pax_record("comment", "naïve ünïcode"))
    assert recs == {"path": "a/b\nc.txt", "size": "3",
                    "comment": "naïve ünïcode"}
    # hand-build: global 'g' sets a path, per-file 'x' overrides it
    g = A._pax_record("path", "from-global.txt")
    x = A._pax_record("path", "from-x.txt")
    blocks = (
        A._tar_header(b"pax_global_header", len(g), 0x67) + g
        + b"\x00" * ((-len(g)) % 512)
        + A._tar_header(b"PaxHeaders.0/f", len(x), 0x78) + x
        + b"\x00" * ((-len(x)) % 512)
        + A._tar_header(b"fallback1", 2, 0x30) + b"hi"
        + b"\x00" * 510
        + A._tar_header(b"fallback2", 2, 0x30) + b"yo"
        + b"\x00" * 510
        + b"\x00" * 1024
    )
    assert A.parse_tar(blocks) == [
        ("from-x.txt", b"hi"),       # x wins for its one file
        ("from-global.txt", b"yo"),  # g persists afterwards
    ]


def test_tar_pax_size_override_reads_real_data():
    """A PAX size record overrides the ustar header's octal field —
    the member bytes and the block advance must both use it."""
    rec = A._pax_record("size", "4")
    hdr = bytearray(A._tar_header(b"f.bin", 0, 0x30))  # header says 0
    blocks = (
        A._tar_header(b"PaxHeaders.0/f.bin", len(rec), 0x78) + rec
        + b"\x00" * ((-len(rec)) % 512)
        + bytes(hdr) + b"data" + b"\x00" * 508
        + A._tar_header(b"after.txt", 2, 0x30) + b"ok" + b"\x00" * 510
        + b"\x00" * 1024
    )
    # NOTE: header size 0 means the un-overridden advance would land on
    # the data block and fail the checksum — passing proves the size
    # override drives both the slice and the cursor... but our encoder
    # pads by the REAL size here, so emulate a writer that allocated
    # blocks for the data (header field zeroed, blocks present)
    assert A.parse_tar(blocks) == [("f.bin", b"data"), ("after.txt", b"ok")]


def test_tar_malformed_pax_records_raise():
    for bad in (b"notdigits path=x\n", b"7 path=x", b"9 pathx-a\n"):
        with pytest.raises(ValueError):
            A._parse_pax_records(bad)


def test_zip64_round_trips_and_cross_validates():
    """ZIP64 (sentinel sizes → 0x0001 extras, EOCD64 + locator) —
    the layout every real >4 GiB archive uses — cross-validated with
    stdlib zipfile both directions without needing 4 GiB payloads."""
    members = [("a.txt", b"hello " * 50), ("dir/b.bin", bytes(range(256))),
               ("empty", b"")]
    for compress in (True, False):
        z = A.encode_zip(members, compress=compress, zip64=True)
        assert b"PK\x06\x06" in z and b"PK\x06\x07" in z
        assert A.parse_zip(z) == members
        zf = zipfile.ZipFile(io.BytesIO(z))
        assert [(n, zf.read(n)) for n in zf.namelist()] == members
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as w:
        for n, d in members:
            with w.open(zipfile.ZipInfo(n), "w", force_zip64=True) as f:
                f.write(d)
    assert A.parse_zip(buf.getvalue()) == members


def test_zip64_malformed_rejections():
    members = [("a.txt", b"x")]
    z = A.encode_zip(members, zip64=True)
    with pytest.raises(ValueError, match="locator"):  # locator gone
        A.parse_zip(z.replace(b"PK\x06\x07", b"PK\x00\x00"))
    with pytest.raises(ValueError, match="EOCD record"):
        A.parse_zip(z.replace(b"PK\x06\x06", b"PK\x00\x00"))
    # sentinel sizes whose ZIP64 extra was stripped (id overwritten)
    bad = z.replace(struct.pack("<HH", 0x0001, 24),
                    struct.pack("<HH", 0x0099, 24))
    with pytest.raises(ValueError, match="ZIP64 extra"):
        A.parse_zip(bad)


def test_tar_pax_record_length_overrun_raises():
    """A PAX record whose declared length overruns the payload must
    raise, not silently truncate — even if the truncated slice happens
    to end in a newline."""
    import pytest

    good = A._pax_record("path", "x.txt")
    with pytest.raises(ValueError, match="overruns"):
        A._parse_pax_records(good[:-2])  # declared length > remaining
    # truncated-but-newline-coincident: declare 99 bytes, supply fewer
    # ending in '\n'
    bad = b"99 path=a\n"
    with pytest.raises(ValueError, match="overruns"):
        A._parse_pax_records(bad)


def test_tar_bz2_and_xz_round_trip_and_stdlib_cross_check():
    """.tar.bz2 / .tar.xz extract through the bz2/lzma magic dispatch;
    cross-validated with stdlib tarfile in BOTH directions, like the
    existing gzip path."""
    import bz2
    import lzma
    import tarfile

    members = [("a.txt", b"alpha"), ("dir/b.bin", bytes(range(256)))]
    tar = A.encode_tar(members)
    for comp, mode in ((bz2.compress, "r:bz2"), (lzma.compress, "r:xz")):
        blob = comp(tar)
        # ours reads ours
        assert A.extract_members(blob) == members
        # stdlib reads our compressed output
        tf = tarfile.open(fileobj=io.BytesIO(blob), mode=mode)
        assert [(m.name, tf.extractfile(m).read())
                for m in tf if m.isfile()] == members
    # ours reads stdlib's .tar.bz2 / .tar.xz
    for wmode in ("w:bz2", "w:xz"):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=wmode) as w:
            for n, d in members:
                ti = tarfile.TarInfo(n)
                ti.size = len(d)
                w.addfile(ti, io.BytesIO(d))
        assert A.extract_members(buf.getvalue()) == members
    # concatenated bzip2 streams (multi-volume layout) decompress whole
    two = bz2.compress(tar[:512]) + bz2.compress(tar[512:])
    assert A.extract_members(two) == members


def test_synthesize_archives_cycles_all_compressors(spark):
    """Even ids walk gzip/bzip2/xz by id%6; odd stay zip; every
    variant extracts to the exact source text."""
    df = spark.createDataFrame(
        [(i, f"doc {i} compressor cycle") for i in range(12)],
        "doc_id long, text string")
    arcs = {r.doc_id: bytes(r.payload)
            for r in A.synthesize_archives(df).collect()}
    magics = {0: b"\x1f\x8b", 2: b"BZh", 4: b"\xfd7zXZ\x00"}
    for i, p in arcs.items():
        if i % 2:
            assert p[:4] == b"PK\x03\x04", i
        else:
            m = magics[i % 6]
            assert p[:len(m)] == m, (i, p[:8])
    rows = A.extract_archive_members(
        A.synthesize_archives(df), with_bytes=True).collect()
    texts = {r.doc_id: bytes(r.payload).decode()
             for r in rows if r.member.endswith(".txt")
             and not r.member.startswith("manifest")}
    assert texts == {i: f"doc {i} compressor cycle" for i in range(12)}


def test_zip_bzip2_method_cross_validated():
    """APPNOTE method 12 (bzip2): ours reads stdlib's ZIP_BZIP2
    output, stdlib reads ours, and the synthesizer cycle emits it for
    d%4==3 ids."""
    import zipfile

    members = [("a.txt", b"alpha bzip2 member"),
               ("dir/b.bin", bytes(range(200)))]
    z = A.encode_zip(members, method="bzip2")
    assert A.parse_zip(z) == members
    zf = zipfile.ZipFile(io.BytesIO(z))
    assert [(n, zf.read(n)) for n in zf.namelist()] == members
    assert zf.infolist()[0].compress_type == zipfile.ZIP_BZIP2
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_BZIP2) as w:
        for n, d in members:
            w.writestr(n, d)
    assert A.parse_zip(buf.getvalue()) == members
    with pytest.raises(ValueError, match="unknown method"):
        A.encode_zip(members, method="lzma")


def test_extract_members_dlq_side_output(spark):
    """on_error='dlq': a junk payload yields one member=NULL error row
    with the precise reader message; good archives keep full member
    rows; the default path still raises."""
    df = spark.createDataFrame(
        [(1, A.encode_zip([("a.txt", b"alpha")])),
         (2, b"junk bytes that are not any container"),
         (3, A.encode_tar([("b.txt", b"beta")]))],
        "doc_id long, payload binary")
    rows = sorted(
        A.extract_archive_members(df, with_bytes=True,
                                  on_error="dlq").collect(),
        key=lambda r: r.doc_id)
    assert [(r.doc_id, r.member, r.n_bytes, r.error is None)
            for r in rows] == [
        (1, "a.txt", 5, True),
        (2, None, 0, False),
        (3, "b.txt", 4, True)]
    assert "unrecognized archive payload" in rows[1].error
    assert rows[1].payload is None and bytes(rows[0].payload) == b"alpha"
    with pytest.raises(Exception):
        A.extract_archive_members(df).collect()
