"""Fuzz: binary readers must fail CLOSED (typed error or valid doc) on
arbitrary bytes — a corpus row can contain anything; an unhandled exception
class would poison whole blocks (the kernel catches reader errors per row,
but only sane error types keep the error_msg column meaningful)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from dedoc_ray.readers.article import BadTeiFile, read_tei
from dedoc_ray.readers.cfb import BadCfbFile, CfbFile, sniff_cfb_kind
from dedoc_ray.readers.legacy_office import BadLegacyFile, read_doc, read_ppt, read_xls
from dedoc_ray.readers.note import BadNoteFile, read_note
from dedoc_ray.sources.cfb_writer import doc_bytes, ppt_bytes, xls_bytes

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_cfb_parser_never_crashes(data):
    try:
        CfbFile(data)
    except (BadCfbFile, Exception) as e:
        assert isinstance(e, (BadCfbFile, ValueError)) or type(e).__module__ == "struct"
    assert sniff_cfb_kind(data) in (None, "doc", "xls", "ppt")


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_legacy_readers_fail_closed(data):
    for reader in (read_doc, read_xls, read_ppt):
        try:
            reader(data)
        except (BadLegacyFile, ValueError):
            pass


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=512, max_size=2048))
def test_corrupted_valid_container(data):
    """A real CFB header with garbage sectors must not crash."""
    blob = CFB_MAGIC + data[8:]
    try:
        cfb = CfbFile(blob)
        for name in cfb.streams():
            cfb.stream(name)
    except (BadCfbFile, ValueError):
        pass


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=1024), st.integers(min_value=0, max_value=3000))
def test_truncated_real_files_fail_closed(noise, cut):
    for gen, reader in ((doc_bytes, read_doc), (xls_bytes, read_xls), (ppt_bytes, read_ppt)):
        blob = gen(7, "key agg the row scan")[:cut] + noise[:64]
        try:
            reader(blob)
        except (BadLegacyFile, ValueError):
            pass


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=1024))
def test_tei_and_note_fail_closed(data):
    with pytest.raises(BadTeiFile):
        read_tei(b"\x00<not-xml" + data)
    try:
        read_note(data)
    except BadNoteFile:
        pass
