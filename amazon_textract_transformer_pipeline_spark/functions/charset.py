"""Charset sniffing + byte→text decoding for crawled HTML payloads.

Real Common-Crawl HTML is far from all-UTF-8 (~5-10% of pages are
cp1252/legacy-encoded, and UTF-16 appears via BOM'd exports). The
reference never faces this — Textract hands it Unicode — but a web-scale
front-end's "byte-identical extracted text" contract is only meaningful
if the *bytes* are decoded with the page's actual encoding first. The
detection ladder follows the WHATWG encoding-sniffing algorithm's
practical core:

1. **BOM** (authoritative per spec): UTF-8 / UTF-16 LE/BE / UTF-32 LE/BE.
2. **In-document declaration** within the first 1024 bytes (the spec's
   prescan window): ``<meta charset=…>``, ``<meta http-equiv
   content="…charset=…">``, or an XML ``encoding=`` declaration —
   matched bytewise, since legacy encodings are ASCII-compatible there.
3. **Strict-UTF-8 probe**: if the payload decodes as UTF-8 without
   error, it is UTF-8 (UTF-8 is self-synchronizing; false positives from
   legacy encodings are vanishingly rare on real text).
4. **cp1252 fallback** — the WHATWG default for unlabeled legacy bytes
   (a strict superset of latin-1's printable range).

Labels are normalized through Python's codec registry with the WHATWG
alias quirks (``latin1``→cp1252 etc.). Unknown labels fall through the
ladder rather than erroring — hostile input never raises.

All pure functions: they run inside the existing frontend Arrow stage,
adding no plan shape. Parity note: step 3 before step 4 means existing
UTF-8 corpora decode exactly as before.
"""

from __future__ import annotations

import codecs as _codecs
import re

#: BOM → codec, longest-prefix first (UTF-32 LE starts with the UTF-16 LE
#: BOM bytes, so order matters). The BOM-aware codec names are used so
#: the BOM itself is consumed — a bare utf-16-le decode would leak a
#: U+FEFF into the first extracted word.
_BOMS: list[tuple[bytes, str]] = [
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32"),
    (b"\x00\x00\xfe\xff", "utf-32"),
    (b"\xff\xfe", "utf-16"),
    (b"\xfe\xff", "utf-16"),
]

#: WHATWG label quirks: these labels mean cp1252 in browsers regardless
#: of what the IANA registry says
_WHATWG_CP1252 = {
    "latin1", "latin-1", "iso-8859-1", "iso8859-1", "us-ascii", "ascii",
    "windows-1252", "cp1252", "x-cp1252", "iso_8859-1", "l1",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9._\-]+)""",
    re.IGNORECASE)
_XML_DECL_RE = re.compile(
    rb"""<\?xml[^>]{0,256}?encoding\s*=\s*["']([a-zA-Z0-9._\-]+)["']""",
    re.IGNORECASE)
_PRESCAN = 1024


def normalize_label(label: str) -> str | None:
    """Charset label → Python codec name, or None if unknown."""
    label = label.strip().lower()
    if label in _WHATWG_CP1252:
        return "cp1252"
    try:
        return _codecs.lookup(label).name
    except LookupError:
        return None


def sniff_charset(data: bytes) -> str:
    """Detected codec name for an HTML payload (see module docstring for
    the ladder). Never raises."""
    for bom, codec in _BOMS:
        if data.startswith(bom):
            return codec
    head = bytes(data[:_PRESCAN])
    m = _META_CHARSET_RE.search(head) or _XML_DECL_RE.search(head)
    if m:
        codec = normalize_label(m.group(1).decode("ascii", "replace"))
        if codec is not None:
            # a BOM-less page declaring utf-16 is lying (the declaration
            # itself is ASCII bytes) — WHATWG maps it to UTF-8
            if codec.startswith("utf-16") or codec.startswith("utf-32"):
                return "utf-8"
            return codec
    try:
        data.decode("utf-8", errors="strict")
        return "utf-8"
    except (UnicodeDecodeError, ValueError):
        return "cp1252"


def decode_html(data: bytes | bytearray | memoryview | None) -> str:
    """Bytes → text with charset sniffing; undecodable bytes under the
    detected codec degrade to U+FFFD, never an exception.

    Hot path: the all-UTF-8 common case decodes exactly once — the
    strict attempt IS the probe (``sniff_charset`` would decode twice)."""
    if data is None:
        return ""
    data = bytes(data)
    for bom, codec in _BOMS:
        if data.startswith(bom):
            return data.decode(codec, errors="replace")
    head = data[:_PRESCAN]
    m = _META_CHARSET_RE.search(head) or _XML_DECL_RE.search(head)
    if m:
        codec = normalize_label(m.group(1).decode("ascii", "replace"))
        if codec is not None and not (codec.startswith("utf-16")
                                      or codec.startswith("utf-32")):
            try:
                return data.decode(codec, errors="replace")
            except (LookupError, ValueError):
                pass
    try:
        return data.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, ValueError):
        return data.decode("cp1252", errors="replace")
