"""Archive ingestion: tar/zip round-trips cross-validated against
stdlib tarfile/zipfile in BOTH directions, gzip composition, malformed
rejections, and the Spark member fan-out."""

from __future__ import annotations

import io
import tarfile
import zipfile
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
    # PAX/link typeflags are precise boundaries
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
