"""Charset sniffing (functions/charset.py): WHATWG ladder — BOMs,
in-document declarations, strict-UTF-8 probe, cp1252 fallback — and the
never-raises contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_textract_transformer_pipeline_spark.functions.charset import (
    decode_html,
    normalize_label,
    sniff_charset,
)

TXT = "café naïve öl — ✓"


def test_boms_consume_and_decode():
    assert decode_html("﻿hi".encode("utf-8")) == "hi"  # BOM stripped
    assert decode_html(b"\xff\xfe" + "hé".encode("utf-16-le")) == "hé"
    assert decode_html(b"\xfe\xff" + "hé".encode("utf-16-be")) == "hé"
    assert decode_html(b"\xff\xfe\x00\x00" + "hé".encode("utf-32-le")) == "hé"
    assert sniff_charset(b"\xef\xbb\xbfplain") == "utf-8-sig"


def test_meta_and_xml_declarations():
    body = f"<html><head><meta charset='windows-1252'></head>{TXT[:9]}"
    assert sniff_charset(body.encode("cp1252")) == "cp1252"
    httpe = (b"<meta http-equiv=\"Content-Type\" "
             b"content=\"text/html; charset=ISO-8859-1\">caf\xe9")
    assert sniff_charset(httpe) == "cp1252"  # WHATWG: latin-1 means cp1252
    xml = b"<?xml version='1.0' encoding='cp1252'?><r>caf\xe9</r>"
    assert decode_html(xml).endswith("caf\xe9</r>")


def test_declaration_beyond_prescan_window_ignored():
    blob = b"<html>" + b" " * 1100 + b"<meta charset='utf-16'>x"
    assert sniff_charset(blob) == "utf-8"  # decl outside first 1024 bytes


def test_lying_utf16_declaration_maps_to_utf8():
    # an ASCII-byte page declaring utf-16 cannot be utf-16 (WHATWG rule)
    blob = b"<meta charset='utf-16'>hello"
    assert sniff_charset(blob) == "utf-8"
    assert decode_html(blob).endswith("hello")


def test_probe_then_fallback():
    assert sniff_charset(TXT.encode("utf-8")) == "utf-8"  # strict probe
    # latin-1/cp1252 bytes are invalid UTF-8 → cp1252 fallback
    assert sniff_charset("café".encode("latin-1")) == "cp1252"
    assert decode_html("café".encode("latin-1")) == "café"
    # cp1252-only codepoints (e.g. 0x93 smart quote) survive
    assert decode_html(b"\x93quoted\x94") == "“quoted”"


def test_normalize_label_quirks():
    assert normalize_label("LATIN1") == "cp1252"
    assert normalize_label("US-ASCII") == "cp1252"
    assert normalize_label("UTF-8") == "utf-8"
    assert normalize_label("no-such-charset-xyz") is None


def test_extraction_identical_across_encodings(spark):
    from amazon_textract_transformer_pipeline_spark.driver_queries import (
        q_charset_extract,
    )

    out = q_charset_extract(spark, None).collect()
    assert len(out) == 120
    by_url = {r.url: r.extracted_text for r in out}
    for i in range(10):
        assert by_url[f"cs://{i}"] == f"doc {i} café naïve öl"


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_never_raises(data):
    codec = sniff_charset(data)
    assert isinstance(codec, str)
    assert isinstance(decode_html(data), str)
