"""Round-15 real-artifact pins: third-party ground truth for the new
office and 7z surfaces, per the every-format-gets-an-artifact
discipline.

- **.7z**: the REAL p7zip-written conda test artifact (215 bytes,
  LZMA-compressed EncodedHeader — the default writer shape) parses
  member-for-member, and every fixture coder shape is cross-validated
  byte-for-byte against the host ``libarchive.so`` 7z reader via
  ctypes (argtypes set on every call — the recorded segfault lesson).
- **.tar.zst**: libarchive's REAL zstd-compressed tar artifact decodes
  through the from-spec RFC 8878 decoder on the archive route.
- **.odt**: the REAL LibreOffice/OpenOffice-written ``styles.odt``
  that docutils ships — 25 paragraphs extract, and its genuine
  ``<text:s/>`` elements prove the whitespace-expansion semantics on
  a file no fixture writer shaped.
- **OOXML tripwire**: no real .docx/.xlsx/.pptx exists on this host
  (searched package trees); the fixture traps + the ODF sibling pin
  carry the format, and this test FAILS loudly the moment a real
  artifact appears so it gets pinned.
"""

from __future__ import annotations

import ctypes
import glob
import os

import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
    iter_archive_members,
    sniff_archive_format,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.ooxml import (
    office_to_text,
    parse_odt,
    sniff_office_format,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sevenzip import (
    build_7z,
    parse_7z,
)

_LA_DIR = "/root/miniconda/pkgs/libarchive-3.8.2-h3ec8f01_0"
_REAL_7Z = f"{_LA_DIR}/info/recipe/test-archives/archive.7z"
_REAL_TZST = f"{_LA_DIR}/info/recipe/test-archives/hello_world.tar.zst"
_REAL_ODT = (
    "/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/"
    "docutils/writers/odf_odt/styles.odt"
)


def _libarchive():
    paths = sorted(glob.glob(f"{_LA_DIR}/lib/libarchive.so*")) + sorted(
        glob.glob("/usr/lib/*/libarchive.so*")
    )
    if not paths:
        pytest.skip("no libarchive on this host")
    lib = ctypes.CDLL(paths[0])
    lib.archive_read_new.restype = ctypes.c_void_p
    sigs = {
        "archive_read_support_format_7zip": ([ctypes.c_void_p], None),
        "archive_read_open_memory": (
            [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t], None
        ),
        "archive_read_next_header": (
            [ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p)], None
        ),
        "archive_entry_pathname": ([ctypes.c_void_p], ctypes.c_char_p),
        "archive_read_data": (
            [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t],
            ctypes.c_ssize_t,
        ),
        "archive_read_free": ([ctypes.c_void_p], None),
        "archive_entry_filetype": ([ctypes.c_void_p], ctypes.c_int),
        "archive_error_string": ([ctypes.c_void_p], ctypes.c_char_p),
    }
    for name, (argtypes, restype) in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        if restype is not None:
            fn.restype = restype
    return lib


def _la_7z_members(lib, payload: bytes) -> list[tuple[str, bytes]]:
    a = lib.archive_read_new()
    assert lib.archive_read_support_format_7zip(a) == 0
    buf = ctypes.create_string_buffer(payload, len(payload))
    rc = lib.archive_read_open_memory(
        a, ctypes.cast(buf, ctypes.c_char_p), len(payload)
    )
    assert rc == 0, f"libarchive open: {lib.archive_error_string(a)}"
    out = []
    e = ctypes.c_void_p()
    try:
        while lib.archive_read_next_header(a, ctypes.byref(e)) == 0:
            name = lib.archive_entry_pathname(e).decode()
            ftype = lib.archive_entry_filetype(e)
            chunks = []
            while True:
                db = ctypes.create_string_buffer(65536)
                n = lib.archive_read_data(a, db, 65536)
                assert n >= 0, (
                    f"libarchive read: {lib.archive_error_string(a)}"
                )
                if n == 0:
                    break
                chunks.append(db.raw[:n])
            if ftype == 0o100000:  # regular file
                out.append((name, b"".join(chunks)))
    finally:
        lib.archive_read_free(a)
    return out


# --- 7z -------------------------------------------------------------------------


def test_real_p7zip_artifact_parses():
    if not os.path.exists(_REAL_7Z):
        pytest.skip("conda libarchive test artifact absent")
    payload = open(_REAL_7Z, "rb").read()
    assert sniff_archive_format(payload) == "7z"
    got = parse_7z(payload)
    # the real writer used an LZMA-compressed EncodedHeader — this
    # exercised _K_ENCODED_HEADER, not just the fixture raw header
    assert got == [
        ("7zip-archive/hello", b"hello\n"),
        ("7zip-archive/world", b"world\n"),
    ]
    assert list(iter_archive_members(payload)) == got


def test_real_p7zip_artifact_matches_libarchive():
    if not os.path.exists(_REAL_7Z):
        pytest.skip("conda libarchive test artifact absent")
    lib = _libarchive()
    payload = open(_REAL_7Z, "rb").read()
    assert sorted(_la_7z_members(lib, payload)) == sorted(
        parse_7z(payload)
    )


@pytest.mark.parametrize(
    "codec", ("copy", "lzma2", "lzma", "delta+lzma2", "bcj+lzma2")
)
def test_fixture_7z_accepted_by_libarchive(codec):
    """Both directions: our parser reads the real writer's archive
    (above); the REAL reader accepts every fixture coder shape and
    extracts identical bytes — so the fixtures are spec-valid, not
    self-consistent inventions (the recorded LZW-timing lesson)."""
    lib = _libarchive()
    members = [
        ("docs/a.txt", b"cross validated content"),
        ("bin/b.bin", bytes(range(256)) * 6),
        ("empty.txt", b""),
    ]
    pay = build_7z(members, codec=codec)
    want = sorted((n, d) for n, d in members if d)
    got = sorted(
        (n, d) for n, d in _la_7z_members(lib, pay) if d or n == "empty.txt"
    )
    # libarchive reports the empty FILE too (size 0)
    assert sorted(_la_7z_members(lib, pay)) == sorted(
        [(n, d) for n, d in members]
    )
    assert sorted(parse_7z(pay)) == sorted(members)
    assert want == [x for x in got if x[1]]


# --- tar.zst ---------------------------------------------------------------------


def test_real_tar_zst_through_from_spec_zstd():
    if not os.path.exists(_REAL_TZST):
        pytest.skip("conda libarchive test artifact absent")
    payload = open(_REAL_TZST, "rb").read()
    assert sniff_archive_format(payload) == "tzst"
    assert list(iter_archive_members(payload)) == [
        ("hello_world/greets", b"hello world\n")
    ]


# --- ODF -------------------------------------------------------------------------


def test_real_libreoffice_odt_extracts():
    if not os.path.exists(_REAL_ODT):
        pytest.skip("docutils styles.odt absent")
    payload = open(_REAL_ODT, "rb").read()
    assert sniff_office_format(payload) == "odt"
    d = office_to_text(payload)
    assert d["format"] == "odt"
    # pinned facts about the real document (stable: the file ships
    # unchanged with docutils)
    assert d["n_blocks"] == 25
    assert "Do not change the name of this table." in d["text"]
    # its genuine <text:s/> runs expand: the doubled space after the
    # sentence above is REAL LibreOffice whitespace encoding
    assert "name of this table.  rststyle-" in d["text"]
    paras = parse_odt(payload)["paragraphs"]
    assert len(paras) == 25 and paras[0].startswith("Table style 0")


# --- OOXML artifact tripwire ------------------------------------------------------


def test_ooxml_real_artifact_tripwire():
    """No real .docx/.xlsx/.pptx exists on this host today — the
    format is carried by spec-literal fixture traps plus the REAL ODF
    sibling pin above. The moment a real OOXML artifact appears in the
    usual package trees, this fails so it gets pinned properly."""
    found = []
    for pat in (
        "/root/.pyenv/versions/*/lib/python*/**/*.docx",
        "/root/.pyenv/versions/*/lib/python*/**/*.xlsx",
        "/root/.pyenv/versions/*/lib/python*/**/*.pptx",
        "/root/miniconda/**/*.docx",
        "/root/miniconda/**/*.xlsx",
        "/usr/share/**/*.docx",
    ):
        found += glob.glob(pat, recursive=True)
    assert not found, (
        f"real OOXML artifacts appeared: {found[:5]} — pin "
        "parse_docx/parse_xlsx/parse_pptx against them now"
    )


# --- RTF artifact tripwire --------------------------------------------------------


def test_rtf_real_artifact_tripwire():
    """No real .rtf or RTF reader (LibreOffice/antiword/unrtf) exists
    on this host today — the format is carried by the spec-corner
    matrix + trap fixtures in tests/test_rtf.py. The moment a real
    artifact or reader appears, this fails so rtf_to_text gets pinned
    against it."""
    found = []
    for pat in (
        "/root/.pyenv/versions/*/lib/python*/**/*.rtf",
        "/root/miniconda/**/*.rtf",
        "/usr/share/**/*.rtf",
        "/usr/bin/unrtf",
        "/usr/bin/antiword",
        "/usr/bin/soffice",
    ):
        found += glob.glob(pat, recursive=True)
    assert not found, (
        f"real RTF artifacts/readers appeared: {found[:5]} — pin "
        "rtf_to_text against them now"
    )


# --- SQLite: the engine itself is on-host ground truth ----------------------------


def test_sqlite_engine_is_the_pin():
    """The SQLite file-format reader's third-party ground truth is the
    host engine (stdlib sqlite3 -> SQLite 3.40.x) writing every test
    artifact via Connection.serialize — assert that channel stays
    alive so test_sqlite_file.py keeps its real-library standing."""
    import sqlite3

    c = sqlite3.connect(":memory:")
    c.execute("create table t(a)")
    c.execute("insert into t values (1)")
    c.commit()
    data = c.serialize()
    assert data[:16] == b"SQLite format 3\x00"
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.sqlite_file import (
        sqlite_dump,
    )

    assert sqlite_dump(data)["t"] == [[1]]


# --- CFB / legacy .doc artifact tripwire ------------------------------------------


def test_cfb_real_artifact_tripwire():
    """No real CFB artifact (.doc/.xls/.ppt/.msi/.msg) or reader
    (olefile/libgsf) exists on this host today — the container and
    the .doc piece-table walk are carried by spec-literal fixture
    traps (tests/test_cfb.py). The moment a real artifact appears,
    this fails so parse_cfb/parse_doc get pinned against it."""
    import importlib.util

    found = []
    for pat in (
        "/root/.pyenv/versions/*/lib/python*/**/*.doc",
        "/root/.pyenv/versions/*/lib/python*/**/*.xls",
        "/root/.pyenv/versions/*/lib/python*/**/*.ppt",
        "/root/.pyenv/versions/*/lib/python*/**/*.msi",
        "/root/.pyenv/versions/*/lib/python*/**/*.msg",
        "/usr/share/**/*.msi",
    ):
        found += [f for f in glob.glob(pat, recursive=True)
                  if open(f, "rb").read(8)
                  == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"]
    if importlib.util.find_spec("olefile") is not None:
        found.append("python-olefile")
    assert not found, (
        f"real CFB artifacts/readers appeared: {found[:5]} — pin "
        "parse_cfb/parse_doc against them now"
    )
