"""Archive ingestion — tar (POSIX ustar), gzip, and zip readers for
corpora shipped as archive files (SURVEY §2.10 extension family).

Real parsing from the public specs, dependency-free beyond stdlib
zlib:

- **tar**: 512-byte ustar headers (name, octal size, checksum with
  the spaces-substitution rule, typeflag), data blocks rounded to 512,
  the two-zero-block terminator, PLUS the two long-path mechanisms
  real tarballs routinely use: POSIX.1-2001 PAX extended headers
  (``x`` per-file / ``g`` global, length-delimited ``key=value``
  records, ``path``/``size`` overrides) and GNU ``L`` @LongLink
  blocks. Regular files extract; directories skip; link/device
  typeflags raise the precise boundary.
- **gzip**: the member framing via streaming zlib (wbits=31), shared
  with the WARC reader's layout — ``name.tar.gz`` composes
  gunzip → tar.
- **bzip2 / xz**: ``.tar.bz2`` / ``.tar.xz`` streams via stdlib
  ``bz2`` / ``lzma`` (concatenated-stream aware, like the gzip
  member path) — the other two compressors public datasets routinely
  ship tarballs under.
- **zip**: located from the End-Of-Central-Directory record, central
  directory entries resolved to local headers, STORED / DEFLATE
  (raw zlib, wbits=-15) / BZIP2 (method 12) members, per-member
  CRC-32 verified, ZIP64 sentinels resolved. Encryption and other
  compression methods raise.

Spark shape: ``extract_archive_members`` is the fan-out (1 archive
row → N member rows) — members' bytes stay in the UDF unless asked
for, and the extracted payloads feed ``decode_media`` /
``extract_document_text`` downstream. This is the standard shape for
"the corpus arrives as tarballs" ingestion at 100 TB: archives are
the split unit, members never shuffle raw.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

from .warc import _gunzip_members


# ------------------------------------------------------------------- tar


def _member_name(raw: bytes) -> str:
    """Member names are UTF-8 in modern archives (the encoders here
    write UTF-8 and set the zip EFS flag); pre-Unicode archives fall
    back to Latin-1 rather than failing the whole file."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def _tar_checksum(block: bytes) -> int:
    """ustar header checksum: byte sum with the chksum field (148..156)
    read as spaces."""
    return sum(block[:148]) + 8 * 0x20 + sum(block[156:512])


def _tar_header(name_field: bytes, size: int, typeflag: int) -> bytes:
    """One 512-byte ustar header block with the checksum sealed."""
    hdr = bytearray(512)
    hdr[0:len(name_field)] = name_field
    hdr[100:108] = b"0000644\x00"
    hdr[108:116] = b"0000000\x00"
    hdr[116:124] = b"0000000\x00"
    hdr[124:136] = f"{size:011o}\x00".encode()
    hdr[136:148] = b"00000000000\x00"
    hdr[156] = typeflag
    hdr[257:263] = b"ustar\x00"
    hdr[263:265] = b"00"
    hdr[148:156] = f"{_tar_checksum(bytes(hdr)):06o}\x00 ".encode()
    return bytes(hdr)


def _pax_record(key: str, value: str) -> bytes:
    """One POSIX.1-2001 extended-header record: '%d key=value\\n' where
    %d counts the WHOLE record including its own digits — a classic
    fixed point, since adding digits can change the digit count."""
    body = f" {key}={value}\n".encode("utf-8")
    n = len(body) + 1
    while len(str(n)) + len(body) != n:
        n = len(str(n)) + len(body)
    return str(n).encode() + body


def encode_tar(members: list[tuple[str, bytes]],
               long_names: str = "pax") -> bytes:
    """Write a POSIX ustar archive: one header+data block run per
    (name, payload) member, two zero blocks at the end. Member paths
    over 100 bytes are carried the way real writers do — a PAX
    ``x`` extended header with a ``path`` record (``long_names="pax"``,
    the POSIX.1-2001 default) or a GNU ``L`` @LongLink block
    (``long_names="gnu"``)."""
    if long_names not in ("pax", "gnu"):
        raise ValueError(f"tar: unknown long_names mode {long_names!r}")
    out = bytearray()

    def emit(hdr: bytes, data: bytes) -> None:
        out.extend(hdr)
        out.extend(data)
        out.extend(b"\x00" * ((-len(data)) % 512))

    for name, data in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            if long_names == "pax":
                rec = _pax_record("path", name)
                # the x-header's own name field is advisory; the
                # conventional PaxHeaders spelling, truncated to fit
                ph = ("PaxHeaders.0/" + name)[-100:].encode(
                    "utf-8", "ignore")[:100]
                emit(_tar_header(ph, len(rec), 0x78), rec)  # 'x'
                nb = nb[:100]  # truncated fallback in the real header
            else:
                link = nb + b"\x00"
                emit(_tar_header(b"././@LongLink", len(link), 0x4C),
                     link)  # 'L'
                nb = nb[:100]
        emit(_tar_header(nb, len(data), 0x30), data)  # '0': regular
    out += b"\x00" * 1024
    return bytes(out)


def _parse_pax_records(data: bytes) -> dict[str, str]:
    """Parse a PAX extended-header payload: length-delimited
    '%d key=value\\n' records (values are UTF-8 and may contain
    newlines — the length prefix, not the newline, is the frame)."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp < 0 or not data[pos:sp].isdigit():
            raise ValueError("tar: malformed PAX record length")
        n = int(data[pos:sp])
        if pos + n > len(data):
            raise ValueError(
                "tar: PAX record length overruns the payload")
        rec = data[pos:pos + n]
        if n < sp - pos + 3 or rec[-1:] != b"\n":
            raise ValueError("tar: PAX record does not end in newline")
        key, eq, value = rec[sp - pos + 1:-1].partition(b"=")
        if not eq:
            raise ValueError("tar: PAX record missing '='")
        out[key.decode("utf-8")] = value.decode("utf-8")
        pos += n
    return out


def parse_tar(payload: bytes) -> list[tuple[str, bytes]]:
    """Read a tar archive to (name, bytes) members, verifying header
    checksums and the block structure. Beyond plain ustar, the two
    long-path mechanisms real tarballs use are honored: PAX extended
    headers (typeflag ``x`` per-file and ``g`` global — ``path`` and
    ``size`` records override the following header's fields) and GNU
    ``L`` @LongLink name blocks. Link typeflags stay a loud boundary
    (extracting a symlink's TARGET as member bytes would be wrong)."""
    members = []
    pos = 0
    global_pax: dict[str, str] = {}
    pending_pax: dict[str, str] | None = None
    pending_gnu_name: str | None = None
    while pos + 512 <= len(payload):
        block = payload[pos:pos + 512]
        if block == b"\x00" * 512:  # terminator (second block optional
            return members          # in the wild; stop at the first)
        stored = block[148:156].rstrip(b" \x00")
        try:
            want = int(stored, 8)
        except ValueError:
            raise ValueError(f"tar: bad checksum field at offset {pos}")
        if _tar_checksum(block) != want:
            raise ValueError(f"tar: header checksum mismatch at {pos}")
        name = _member_name(block[0:100].split(b"\x00", 1)[0])
        # the ustar prefix field carries the directory part of long
        # paths — dropping it would collide distinct members
        prefix = block[345:500].split(b"\x00", 1)[0]
        if prefix:
            name = _member_name(prefix) + "/" + name
        size = int(block[124:136].rstrip(b" \x00") or b"0", 8)
        typeflag = block[156:157]
        data_at = pos + 512
        if data_at + size > len(payload):
            raise ValueError(f"tar: member {name!r} data truncated")
        data = payload[data_at:data_at + size]
        if typeflag in (b"0", b"\x00"):
            pax = {**global_pax, **(pending_pax or {})}
            if "path" in pax:
                name = pax["path"]
            elif pending_gnu_name is not None:
                name = pending_gnu_name
            if "size" in pax:
                real = int(pax["size"])
                if data_at + real > len(payload):
                    raise ValueError(
                        f"tar: member {name!r} PAX size exceeds archive")
                data = payload[data_at:data_at + real]
                size = real
            members.append((name, data))
            pending_pax, pending_gnu_name = None, None
        elif typeflag == b"5":
            pending_pax, pending_gnu_name = None, None  # directory
        elif typeflag == b"x":  # PAX: applies to the NEXT file only
            pending_pax = _parse_pax_records(data)
        elif typeflag == b"g":  # PAX global: applies until overridden
            global_pax.update(_parse_pax_records(data))
        elif typeflag == b"L":  # GNU @LongLink: next member's name
            pending_gnu_name = _member_name(data.rstrip(b"\x00"))
        elif typeflag == b"K":  # GNU long LINK target: consume; the
            pass                # link header itself still raises below
        else:
            raise NotImplementedError(
                f"tar: typeflag {typeflag!r} (links/devices) "
                "not supported")
        pos = data_at + size + ((-size) % 512)
    raise ValueError("tar: archive ends without a terminator block")


# ------------------------------------------------------------------- zip


def encode_zip(members: list[tuple[str, bytes]],
               compress: bool = True, zip64: bool = False,
               method: str = "deflate") -> bytes:
    """Write a zip archive: local headers + data, central directory,
    EOCD. ``method="deflate"`` stores DEFLATE (raw zlib) when
    ``compress`` and it helps, else STORED; ``method="bzip2"`` stores
    APPNOTE method 12 (stdlib bz2 — the other compression modern zip
    tools actually emit). ``zip64`` writes the ZIP64 shape real
    >4 GiB / >65k-member archives use — 0xFFFFFFFF sentinel
    sizes/offsets resolved through 0x0001 extra fields, an EOCD64
    record and its locator — without needing actual 4 GiB payloads."""
    if method not in ("deflate", "bzip2"):
        raise ValueError(f"zip: unknown method {method!r}")
    out = bytearray()
    central = bytearray()
    for name, data in members:
        nb = name.encode("utf-8")
        # general-purpose bit 11 (EFS): the name is UTF-8 — without it
        # external tools assume cp437 and misread non-ASCII names
        flags = 0x800 if not name.isascii() else 0
        crc = zlib.crc32(data) & 0xFFFFFFFF
        if method == "bzip2":
            import bz2

            blob, mcode = bz2.compress(data), 12
        else:
            packed = zlib.compress(data, 9)[2:-4] if compress else data
            mcode = 8 if compress and len(packed) < len(data) else 0
            blob = packed if mcode == 8 else data
        local_at = len(out)
        if zip64:
            # sentinel sizes in the fixed fields, real values in the
            # 0x0001 extra (local: usize+csize; central: +offset)
            lextra = (struct.pack("<HH", 0x0001, 16)
                      + struct.pack("<QQ", len(data), len(blob)))
            out += (b"PK\x03\x04"
                    + struct.pack("<HHHHHIII", 45, flags, mcode, 0, 0,
                                  crc, 0xFFFFFFFF, 0xFFFFFFFF)
                    + struct.pack("<HH", len(nb), len(lextra))
                    + nb + lextra + blob)
            cextra = (struct.pack("<HH", 0x0001, 24)
                      + struct.pack("<QQQ", len(data), len(blob),
                                    local_at))
            central += (b"PK\x01\x02"
                        + struct.pack("<HHHHHHIII", 45, 45, flags,
                                      mcode, 0, 0, crc, 0xFFFFFFFF,
                                      0xFFFFFFFF)
                        + struct.pack("<HHHHHII", len(nb), len(cextra),
                                      0, 0, 0, 0, 0xFFFFFFFF)
                        + nb + cextra)
        else:
            out += (b"PK\x03\x04"
                    + struct.pack("<HHHHHIII", 20, flags, mcode, 0, 0,
                                  crc, len(blob), len(data))
                    + struct.pack("<HH", len(nb), 0) + nb + blob)
            central += (b"PK\x01\x02"
                        + struct.pack("<HHHHHHIII", 20, 20, flags,
                                      mcode, 0, 0, crc, len(blob),
                                      len(data))
                        + struct.pack("<HHHHHII", len(nb), 0, 0, 0, 0,
                                      0, local_at)
                        + nb)
    cd_at = len(out)
    out += central
    if zip64:
        eocd64_at = len(out)
        out += (b"PK\x06\x06"
                + struct.pack("<QHHIIQQQQ", 44, 45, 45, 0, 0,
                              len(members), len(members), len(central),
                              cd_at))
        out += b"PK\x06\x07" + struct.pack("<IQI", 0, eocd64_at, 1)
        out += (b"PK\x05\x06"
                + struct.pack("<HHHHIIH", 0, 0, 0xFFFF, 0xFFFF,
                              0xFFFFFFFF, 0xFFFFFFFF, 0))
    else:
        out += (b"PK\x05\x06"
                + struct.pack("<HHHHIIH", 0, 0, len(members),
                              len(members), len(central), cd_at, 0))
    return bytes(out)


def _zip64_extra(extra: bytes, needed: int) -> list[int]:
    """Pull ``needed`` 64-bit values from the 0x0001 ZIP64 extra field
    — present only for the fixed fields that hit their 0xFFFFFFFF
    sentinel, in spec order (usize, csize, offset, disk)."""
    pos = 0
    while pos + 4 <= len(extra):
        fid, flen = struct.unpack_from("<HH", extra, pos)
        if fid == 0x0001:
            data = extra[pos + 4:pos + 4 + flen]
            if len(data) < 8 * needed:
                raise ValueError("zip: ZIP64 extra field too short")
            return list(struct.unpack_from(f"<{needed}Q", data))
        pos += 4 + flen
    raise ValueError("zip: sentinel sizes without a ZIP64 extra field")


def parse_zip(payload: bytes) -> list[tuple[str, bytes]]:
    """Read a zip archive via the central directory, decompressing
    STORED/DEFLATE members and verifying each CRC-32. ZIP64 archives
    (0xFFFF / 0xFFFFFFFF sentinels → EOCD64 via its locator, per-entry
    0x0001 extras) resolve — the layout every real >4 GiB or
    >65k-member archive uses."""
    eocd_at = payload.rfind(b"PK\x05\x06")
    if eocd_at < 0:
        raise ValueError("zip: no end-of-central-directory record")
    n_total, _cd_size, cd_at = struct.unpack_from(
        "<HII", payload, eocd_at + 10)
    if n_total == 0xFFFF or cd_at == 0xFFFFFFFF:
        loc_at = payload.rfind(b"PK\x06\x07", 0, eocd_at)
        if loc_at < 0:
            raise ValueError("zip: ZIP64 EOCD locator missing")
        (eocd64_at,) = struct.unpack_from("<Q", payload, loc_at + 8)
        if payload[eocd64_at:eocd64_at + 4] != b"PK\x06\x06":
            raise ValueError("zip: ZIP64 EOCD record missing")
        (n64,) = struct.unpack_from("<Q", payload, eocd64_at + 32)
        (cd64,) = struct.unpack_from("<Q", payload, eocd64_at + 48)
        n_total, cd_at = n64, cd64
    members = []
    pos = cd_at
    for _ in range(n_total):
        if payload[pos:pos + 4] != b"PK\x01\x02":
            raise ValueError("zip: central directory entry missing")
        (method,) = struct.unpack_from("<H", payload, pos + 10)
        crc, csize, usize = struct.unpack_from("<III", payload, pos + 16)
        nlen, elen, clen = struct.unpack_from("<HHH", payload, pos + 28)
        (local_at,) = struct.unpack_from("<I", payload, pos + 42)
        name = _member_name(payload[pos + 46:pos + 46 + nlen])
        wanted = [v == 0xFFFFFFFF for v in (usize, csize, local_at)]
        if any(wanted):
            vals = _zip64_extra(
                payload[pos + 46 + nlen:pos + 46 + nlen + elen],
                sum(wanted))
            it = iter(vals)
            usize = next(it) if wanted[0] else usize
            csize = next(it) if wanted[1] else csize
            local_at = next(it) if wanted[2] else local_at
        if payload[local_at:local_at + 4] != b"PK\x03\x04":
            raise ValueError(f"zip: member {name!r} local header missing")
        lnlen, lelen = struct.unpack_from("<HH", payload, local_at + 26)
        data_at = local_at + 30 + lnlen + lelen
        blob = payload[data_at:data_at + csize]
        if len(blob) != csize:
            raise ValueError(f"zip: member {name!r} data truncated")
        if method == 0:
            data = blob
        elif method == 8:
            try:
                data = zlib.decompress(blob, wbits=-15)
            except zlib.error as exc:
                raise ValueError(
                    f"zip: member {name!r} deflate damaged: {exc}"
                ) from None
        elif method == 12:  # bzip2 (APPNOTE 4.6.x), stdlib
            import bz2

            try:
                data = bz2.decompress(blob)
            except OSError as exc:
                raise ValueError(
                    f"zip: member {name!r} bzip2 damaged: {exc}"
                ) from None
        else:
            raise NotImplementedError(
                f"zip: compression method {method} not supported")
        if len(data) != usize or (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"zip: member {name!r} CRC/size mismatch")
        members.append((name, data))
        pos += 46 + nlen + elen + clen
    return members


# -------------------------------------------------------------- dispatch


def extract_members(payload: bytes) -> list[tuple[str, bytes]]:
    """Container dispatch: zip / gzip|bzip2|xz(+tar) / tar by magic
    bytes. All three compressors accept concatenated streams, the
    layout multi-volume writers emit."""
    if payload[:4] == b"PK\x03\x04" or payload[:4] == b"PK\x05\x06":
        return parse_zip(payload)
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    elif payload[:3] == b"BZh":
        import bz2

        payload = bz2.decompress(payload)
    elif payload[:6] == b"\xfd7zXZ\x00":
        import lzma

        payload = lzma.decompress(payload)
    if len(payload) >= 263 and payload[257:263] in (b"ustar\x00", b"ustar "):
        return parse_tar(payload)
    raise ValueError(
        "unrecognized archive payload (zip/tar/tar.{gz,bz2,xz})")


def extract_archive_members(df: DataFrame,
                            with_bytes: bool = False,
                            keep: tuple[str, ...] = (),
                            on_error: str = "raise") -> DataFrame:
    """Fan-out: one row per archive member (doc_id, member, n_bytes
    [, payload]); member bytes only leave the UDF when asked for.

    ``on_error="dlq"`` adds an ``error`` column and routes failures
    (a damaged container, an unsupported compression method, a member
    CRC mismatch) to a ``member = NULL`` side-output row instead of
    failing the batch; members already walked before the failure are
    kept — partial extraction plus an error row, the DLQ shape the
    WARC/PDF readers share."""
    if on_error not in ("raise", "dlq"):
        raise ValueError(f"on_error must be raise/dlq, got {on_error!r}")
    dlq = on_error == "dlq"
    keep_schema = ", ".join(f"{c} string" for c in keep)
    schema = "doc_id long, member string, n_bytes long" + (
        ", payload binary" if with_bytes else "") + (
        ", error string" if dlq else "") + (
        ", " + keep_schema if keep else "")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = ["doc_id", "member", "n_bytes"] + (
            ["payload"] if with_bytes else []) + (
            ["error"] if dlq else []) + list(keep)
        for pdf in batches:
            rows = []
            for j, p in enumerate(pdf["payload"]):
                tail = [pdf[c].iloc[j] for c in keep]
                try:
                    for name, data in extract_members(bytes(p)):
                        row = [pdf["doc_id"].iloc[j], name, len(data)]
                        if with_bytes:
                            row.append(data)
                        if dlq:
                            row.append(None)
                        rows.append((*row, *tail))
                except (ValueError, NotImplementedError) as exc:
                    if not dlq:
                        raise
                    row = [pdf["doc_id"].iloc[j], None, 0]
                    if with_bytes:
                        row.append(None)
                    rows.append((*row, str(exc), *tail))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema)


def wrap_payloads_in_archives(df: DataFrame,
                              member_fmt: str = "doc_{id}.bin",
                              payload_col: str = "payload",
                              id_col: str = "doc_id") -> DataFrame:
    """Wrap an existing binary payload column into one archive per row
    (zip for odd ids; tarballs for even ids, the compressor walking
    gzip → bzip2 → xz by ``id % 6``) — the composition step for
    'the corpus arrives as archives OF documents' pipelines: chain
    with extract_archive_members + a document decoder downstream."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d, p in zip(ids, pdf[payload_col]):
                members = [(member_fmt.format(id=d), bytes(p))]
                if d % 2:
                    payloads.append(encode_zip(
                        members,
                        method="bzip2" if d % 4 == 3 else "deflate"))
                else:
                    payloads.append(
                        _compress_tar(encode_tar(members), int(d)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads,
                                "media_type": "application/archive"})

    return df.select(id_col, payload_col).mapInPandas(
        run, "doc_id long, payload binary, media_type string")


def _compress_tar(tar: bytes, d: int) -> bytes:
    """Compressor cycle for even-id tarballs: gzip (``d%6==0``),
    bzip2 (``d%6==2``), xz (``d%6==4``) — the three stream formats
    public datasets ship tarballs under, all stdlib."""
    import bz2
    import lzma

    sel = d % 6
    if sel == 2:
        return bz2.compress(tar)
    if sel == 4:
        return lzma.compress(tar)
    return zlib.compress(tar, wbits=31)


def synthesize_archives(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """One real archive per row holding the corpus text as a member
    (plus a manifest member extraction must also surface): zip for
    odd ids; tar.gz / tar.bz2 / tar.xz for even ids by ``id % 6`` —
    all the container families that occur in-corpus."""
    import gzip as _unused  # noqa: F401  (documents stdlib-only intent)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for d, t in zip(ids, pdf[text_col]):
                members = [
                    ("manifest.txt", f"doc={d}".encode()),
                    (f"doc_{d}.txt", (t or "").encode()),
                ]
                if d % 2:
                    payloads.append(encode_zip(
                        members,
                        method="bzip2" if d % 4 == 3 else "deflate"))
                else:
                    payloads.append(_compress_tar(encode_tar(members),
                                                  int(d)))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads,
                                "media_type": "application/archive"})

    return df.select(id_col, text_col).mapInPandas(
        run, "doc_id long, payload binary, media_type string")
