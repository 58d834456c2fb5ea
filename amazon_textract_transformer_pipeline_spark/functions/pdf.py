"""PDF structure codec — from-scratch ISO 32000 subset, stdlib-only.

The reference's media-type registry marks ``.pdf`` as its primary
*scalable* input (``notebooks/preproc/textract_transformers/image_utils.py:27-42``)
and rasterizes via pdf2image at 300 DPI (``image_utils.py:560-582``,
``util/ocr.py:33``). This module gives the engine a native PDF front door
in the same spirit as the MP4 box walk (functions/av.py) and the image
codec family (functions/codecs.py):

* **structure parse** — COS object tokenizer, classic ``xref`` tables AND
  PDF-1.5 cross-reference streams (FlateDecode + PNG predictors, both
  stdlib ``zlib``), object streams (``/Type /ObjStm``), incremental-update
  ``/Prev`` chains, and a brute-force ``N G obj`` scan fallback for the
  broken-xref files every real crawl contains;
* **page metadata** — page-tree walk with ``/MediaBox`` / ``/Rotate``
  inheritance → per-page point dimensions + page count, header-only in
  spirit (no page *content* is decoded for metadata);
* **text extraction** — content-stream interpreter (BT/ET, Td/TD/Tm/T*,
  TL/Tc/Tw/Tz, Tj/TJ/'/") emitting pages→lines→words with real baseline
  geometry in PDF points. Glyph advance uses the Courier fixed metric
  (600/1000 em) because embedded font width tables are out of scope —
  exact for the fixture writer below, approximate-but-ordered for
  arbitrary PDFs (reading order and line structure are exact; only box
  widths are nominal);
* **rasterization stays a seam** — pixel rendering needs a rasterizer
  (pdf2image/pypdfium2); :func:`render_plan` computes the pixel geometry
  the reference's 300-DPI convention implies, and
  operators/multimodal.auto_decode_fn gates the actual render exactly
  like progressive JPEG.

A fixture writer (:func:`write_pdf`) emits spec-valid PDFs in four
structural dialects (classic xref / xref stream / +predictor / +ObjStm,
optionally Flate-compressed content) so every parser path is exercised
without any binary test assets.
"""

from __future__ import annotations

import re
import zlib
from typing import NamedTuple


class Ref(NamedTuple):
    num: int
    gen: int


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_EOL = (0x0A, 0x0D)

# US Letter — the spec's default when MediaBox is missing everywhere
_DEFAULT_BOX = (0.0, 0.0, 612.0, 792.0)
_COURIER_EM = 0.6  # Courier advance width, 600/1000 em
_MAX_PAGES = 200_000
_MAX_RESOLVE_DEPTH = 32


def sniff_pdf(blob: bytes) -> bool:
    return blob.startswith(b"%PDF-")


def pdf_version(blob: bytes) -> str | None:
    m = re.match(rb"%PDF-(\d+\.\d+)", blob[:16])
    return m.group(1).decode() if m else None


# --------------------------------------------------------------------------
# COS object tokenizer
# --------------------------------------------------------------------------

def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # % comment to EOL
            while pos < n and data[pos] not in _EOL:
                pos += 1
        else:
            break
    return pos


def _parse_name(data: bytes, pos: int) -> tuple[str, int]:
    pos += 1  # '/'
    out = bytearray()
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # '#xx'
            try:
                out.append(int(data[pos + 1:pos + 3], 16))
                pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        pos += 1
    return out.decode("latin-1"), pos


_STR_ESC = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C,
            0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}


def _parse_literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    pos += 1  # '('
    out = bytearray()
    depth = 1
    n = len(data)
    while pos < n:
        c = data[pos]
        if c == 0x5C:  # backslash
            if pos + 1 >= n:
                break
            e = data[pos + 1]
            if e in _STR_ESC:
                out.append(_STR_ESC[e])
                pos += 2
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = pos + 1
                oct_digits = bytearray()
                while j < n and len(oct_digits) < 3 and 0x30 <= data[j] <= 0x37:
                    oct_digits.append(data[j])
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                pos = j
            elif e in _EOL:  # line continuation
                pos += 2
                if e == 0x0D and pos < n and data[pos] == 0x0A:
                    pos += 1
            else:
                out.append(e)
                pos += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    return bytes(out), pos


def _parse_hex_string(data: bytes, pos: int) -> tuple[bytes, int]:
    end = data.find(b">", pos + 1)
    if end < 0:
        end = len(data)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[pos + 1:end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode()), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_INT_RE = re.compile(rb"\d+")


def _parse_value(data: bytes, pos: int):
    """One COS value starting at ``pos`` (whitespace already skipped).
    Returns (value, new_pos); value is dict/list/Ref/int/float/bool/None/
    str (names) / bytes (strings)."""
    c = data[pos]
    if c == 0x2F:  # /
        return _parse_name(data, pos)
    if c == 0x28:  # (
        return _parse_literal_string(data, pos)
    if c == 0x3C:  # < or <<
        if data[pos:pos + 2] == b"<<":
            d = {}
            pos += 2
            while True:
                pos = _skip_ws(data, pos)
                if pos >= len(data):
                    break
                if data[pos:pos + 2] == b">>":
                    return d, pos + 2
                if data[pos] != 0x2F:  # malformed key — bail
                    break
                key, pos = _parse_name(data, pos)
                pos = _skip_ws(data, pos)
                if pos >= len(data):
                    break
                val, pos = _parse_value(data, pos)
                d[key] = val
            return d, pos
        return _parse_hex_string(data, pos)
    if c == 0x5B:  # [
        arr = []
        pos += 1
        while True:
            pos = _skip_ws(data, pos)
            if pos >= len(data) or data[pos] == 0x5D:
                return arr, min(pos + 1, len(data))
            val, pos = _parse_value(data, pos)
            arr.append(val)
    if data.startswith(b"true", pos):
        return True, pos + 4
    if data.startswith(b"false", pos):
        return False, pos + 5
    if data.startswith(b"null", pos):
        return None, pos + 4
    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group()
        end = m.end()
        if b"." not in tok:
            # lookahead for "G R" → indirect reference
            p2 = _skip_ws(data, end)
            m2 = _INT_RE.match(data, p2)
            if m2:
                p3 = _skip_ws(data, m2.end())
                if data[p3:p3 + 1] == b"R" and (
                        p3 + 1 >= len(data)
                        or data[p3 + 1] in _WS or data[p3 + 1] in _DELIM):
                    return Ref(int(tok), int(m2.group())), p3 + 1
            return int(tok), end
        return float(tok), end
    raise ValueError(f"PDF: unparseable token at {pos}: {data[pos:pos+16]!r}")


# --------------------------------------------------------------------------
# filters
# --------------------------------------------------------------------------

def _png_unpredict(data: bytes, columns: int, bpp: int = 1) -> bytes:
    """PNG row predictors (ISO 32000 7.4.4.4, /Predictor >= 10) — rows of
    (1 + columns) bytes, filter byte first; same math as the PNG codec but
    scalar (xref streams are tiny)."""
    row = columns
    out = bytearray()
    prev = bytearray(row)
    pos = 0
    while pos + 1 + row <= len(data):
        ft = data[pos]
        cur = bytearray(data[pos + 1:pos + 1 + row])
        for i in range(row):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                cur[i] = (cur[i] + a) & 0xFF
            elif ft == 2:
                cur[i] = (cur[i] + b) & 0xFF
            elif ft == 3:
                cur[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
            elif ft == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        out += cur
        prev = cur
        pos += 1 + row
    return bytes(out)


def _decode_stream(d: dict, raw: bytes, resolve) -> bytes:
    """Apply /Filter (+ /DecodeParms). FlateDecode only — every structural
    stream this engine reads (xref, ObjStm, our content) is Flate or raw;
    image filters (DCT/JBIG2/...) never reach this path."""
    filt = resolve(d.get("Filter"))
    parms = resolve(d.get("DecodeParms")) or resolve(d.get("DP")) or {}
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    parms_list = parms if isinstance(parms, list) else [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms_list):
        f = resolve(f)
        p = resolve(p) or {}
        if f == "FlateDecode":
            data = zlib.decompress(data)
            pred = int(resolve(p.get("Predictor")) or 1)
            if pred >= 10:
                cols = int(resolve(p.get("Columns")) or 1)
                colors = int(resolve(p.get("Colors")) or 1)
                bpc = int(resolve(p.get("BitsPerComponent")) or 8)
                data = _png_unpredict(data, cols * colors * bpc // 8,
                                      max(colors * bpc // 8, 1))
        elif f in ("ASCIIHexDecode",):
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">", 1)[0])
            if len(hx) % 2:
                hx += b"0"
            data = bytes.fromhex(hx.decode())
        else:
            raise ValueError(f"PDF: unsupported stream filter {f}")
    return data


# --------------------------------------------------------------------------
# document: xref + object loading
# --------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    """Random-access view over one PDF blob: xref → object resolution →
    page tree. All lazy; construction only walks the xref (or the brute
    scan fallback)."""

    def __init__(self, blob: bytes):
        if not sniff_pdf(blob):
            raise ValueError("PDF: missing %PDF- header")
        self.blob = blob
        self.version = pdf_version(blob)
        # num -> ("n", byte_offset) | ("s", objstm_num, index_in_stream)
        self.xref: dict[int, tuple] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._scanned = False
        try:
            self._load_xref()
        except Exception:
            self.xref = {}
        if not self.xref or "Root" not in self.trailer:
            self._scan_fallback()

    # -- xref ------------------------------------------------------------

    def _load_xref(self) -> None:
        tail = self.blob[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise ValueError("PDF: no startxref")
        todo = [int(m.group(1))]
        seen = set()
        while todo:
            off = todo.pop(0)
            if off in seen or off <= 0 or off >= len(self.blob):
                continue
            seen.add(off)
            pos = _skip_ws(self.blob, off)
            if self.blob.startswith(b"xref", pos):
                trailer = self._load_xref_table(pos + 4)
            else:
                trailer = self._load_xref_stream(pos)
            if not self.trailer:
                self.trailer = dict(trailer)
            for key in ("Prev", "XRefStm"):
                nxt = trailer.get(key)
                if isinstance(nxt, (int, float)):
                    todo.append(int(nxt))

    def _load_xref_table(self, pos: int) -> dict:
        data = self.blob
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b"trailer", pos):
                pos = _skip_ws(data, pos + 7)
                trailer, _ = _parse_value(data, pos)
                return trailer if isinstance(trailer, dict) else {}
            m = re.match(rb"(\d+)\s+(\d+)", data[pos:pos + 40])
            if not m:
                return {}
            start, count = int(m.group(1)), int(m.group(2))
            pos = _skip_ws(data, pos + m.end())
            for i in range(count):
                ent = data[pos:pos + 20]
                em = re.match(rb"(\d{10})\s(\d{5})\s([nf])", ent)
                if em:
                    num = start + i
                    if em.group(3) == b"n" and num not in self.xref:
                        self.xref[num] = ("n", int(em.group(1)))
                    pos += 20 if ent[18:19] in (b"\r", b"\n", b" ") else 18
                else:  # tolerate 19-byte EOL variants
                    nl = data.find(b"\n", pos)
                    pos = nl + 1 if nl >= 0 else pos + 20

    def _load_xref_stream(self, pos: int) -> dict:
        data = self.blob
        m = _OBJ_RE.match(data, pos)
        if not m:
            raise ValueError("PDF: bad xref stream offset")
        d, raw = self._parse_stream_at(_skip_ws(data, m.end()))
        if d.get("Type") != "XRef":
            raise ValueError("PDF: xref stream is not /Type /XRef")
        content = _decode_stream(d, raw, lambda o: o)
        w = [int(x) for x in d.get("W", [1, 1, 1])]
        size = int(d.get("Size", 0))
        index = d.get("Index", [0, size])
        rec = sum(w)
        pos2 = 0

        def field(buf, a, b):
            return int.from_bytes(buf[a:b], "big") if b > a else None

        for i in range(0, len(index), 2):
            start, count = int(index[i]), int(index[i + 1])
            for num in range(start, start + count):
                row = content[pos2:pos2 + rec]
                pos2 += rec
                if len(row) < rec:
                    break
                t = field(row, 0, w[0])
                t = 1 if t is None else t  # w1==0 → default type 1
                f2 = field(row, w[0], w[0] + w[1]) or 0
                f3 = field(row, w[0] + w[1], rec) or 0
                if num in self.xref:
                    continue
                if t == 1:
                    self.xref[num] = ("n", f2)
                elif t == 2:
                    self.xref[num] = ("s", f2, f3)
        return d

    def _scan_fallback(self) -> None:
        """Broken/absent xref: brute-scan ``N G obj`` headers (the *last*
        occurrence of each number wins — incremental-update semantics) and
        find the trailer/catalog by content."""
        self._scanned = True
        for m in _OBJ_RE.finditer(self.blob):
            self.xref[int(m.group(1))] = ("n", m.start())
        if "Root" not in self.trailer:
            for tm in re.finditer(rb"trailer", self.blob):
                pos = _skip_ws(self.blob, tm.end())
                try:
                    t, _ = _parse_value(self.blob, pos)
                    if isinstance(t, dict) and "Root" in t:
                        self.trailer = t
                except Exception:
                    continue
        if "Root" not in self.trailer:
            # last resort: any object whose dict is /Type /Catalog
            for num in sorted(self.xref):
                try:
                    obj = self._load(num)
                except Exception:
                    continue
                if isinstance(obj, dict) and obj.get("Type") == "Catalog":
                    self.trailer = {"Root": Ref(num, 0)}
                    break

    # -- objects ---------------------------------------------------------

    def _parse_stream_at(self, pos: int) -> tuple[dict, bytes]:
        """Object body at ``pos`` must be a dict, optionally followed by a
        stream; returns (dict, raw_stream_bytes)."""
        data = self.blob
        d, pos = _parse_value(data, _skip_ws(data, pos))
        if not isinstance(d, dict):
            return ({}, b"") if d is None else ({"__value__": d}, b"")
        pos = _skip_ws(data, pos)
        if not data.startswith(b"stream", pos):
            return d, b""
        pos += 6
        if data[pos:pos + 2] == b"\r\n":
            pos += 2
        elif data[pos:pos + 1] == b"\n":
            pos += 1
        length = self.resolve(d.get("Length"))
        if isinstance(length, (int, float)) and \
                pos + int(length) <= len(data):
            raw = data[pos:pos + int(length)]
            # trust but verify: a lying /Length shows as missing endstream
            tailpos = _skip_ws(data, pos + int(length))
            if not data.startswith(b"endstream", tailpos):
                end = data.find(b"endstream", pos)
                raw = data[pos:end] if end >= 0 else raw
        else:
            end = data.find(b"endstream", pos)
            raw = data[pos:end].rstrip(b"\r\n") if end >= 0 else b""
        return d, raw

    def _load(self, num: int):
        if num in self._cache:
            return self._cache[num]
        ent = self.xref.get(num)
        if ent is None:
            if not self._scanned:
                self._scan_fallback()
                ent = self.xref.get(num)
            if ent is None:
                return None
        self._cache[num] = None  # cycle guard
        if ent[0] == "n":
            m = _OBJ_RE.match(self.blob, _skip_ws(self.blob, ent[1]))
            if not m or int(m.group(1)) != num:
                if not self._scanned:
                    # stale classic-xref offset: rescan repaired self.xref;
                    # the retry must not see this call's cycle guard or the
                    # repaired entry would resolve to a cached None forever
                    self._scan_fallback()
                    del self._cache[num]
                    return self._load(num)
                return None
            d, raw = self._parse_stream_at(m.end())
            obj = (d, raw) if raw else (
                d.get("__value__") if set(d) == {"__value__"} else d)
        else:  # in an object stream
            obj = self._load_from_objstm(ent[1], ent[2])
        self._cache[num] = obj
        return obj

    def _load_from_objstm(self, stm_num: int, idx: int):
        if stm_num not in self._objstm_cache:
            stm = self._load(stm_num)
            objs: list = []
            if isinstance(stm, tuple):
                d, raw = stm
                content = _decode_stream(d, raw, self.resolve)
                n = int(self.resolve(d.get("N")) or 0)
                first = int(self.resolve(d.get("First")) or 0)
                hdr = content[:first].split()
                for i in range(n):
                    off = int(hdr[2 * i + 1])
                    try:
                        val, _ = _parse_value(
                            content, _skip_ws(content, first + off))
                    except (ValueError, IndexError):
                        val = None
                    objs.append(val)
            self._objstm_cache[stm_num] = objs
        objs = self._objstm_cache[stm_num]
        return objs[idx] if 0 <= idx < len(objs) else None

    def resolve(self, obj, depth: int = 0):
        while isinstance(obj, Ref) and depth < _MAX_RESOLVE_DEPTH:
            obj = self._load(obj.num)
            depth += 1
        return obj

    # -- page tree -------------------------------------------------------

    @property
    def encrypted(self) -> bool:
        return "Encrypt" in self.trailer

    def pages(self) -> list[dict]:
        """Leaf /Page dicts in tree order with /MediaBox and /Rotate
        inheritance applied (keys ``_MediaBox``/``_Rotate`` carry the
        resolved inherited values)."""
        root = self.resolve(self.trailer.get("Root"))
        top = self.resolve(root.get("Pages")) if isinstance(root, dict) \
            else None
        out: list[dict] = []
        if isinstance(top, dict):
            inherit = {"MediaBox": None, "Rotate": 0}
            stack = [(top, dict(inherit))]
            visited: set[int] = set()
            while stack and len(out) < _MAX_PAGES:
                node, inh = stack.pop()
                if not isinstance(node, dict):
                    continue
                nid = id(node)
                if nid in visited:
                    continue
                visited.add(nid)
                inh = dict(inh)
                if "MediaBox" in node:
                    inh["MediaBox"] = self.resolve(node["MediaBox"])
                if "Rotate" in node:
                    r = self.resolve(node["Rotate"])
                    if isinstance(r, (int, float)):
                        inh["Rotate"] = int(r)
                kids = self.resolve(node.get("Kids"))
                if node.get("Type") == "Page" or (
                        kids is None and node.get("Type") != "Pages"):
                    page = dict(node)
                    page["_MediaBox"] = inh["MediaBox"] or list(_DEFAULT_BOX)
                    page["_Rotate"] = inh["Rotate"] % 360
                    out.append(page)
                elif isinstance(kids, list):
                    for kid in reversed(kids):
                        stack.append((self.resolve(kid), inh))
        if not out:
            # tree broken: any /Type /Page object, object-number order
            if not self._scanned:
                self._scan_fallback()
            for num in sorted(self.xref):
                obj = self.resolve(Ref(num, 0))
                if isinstance(obj, dict) and obj.get("Type") == "Page":
                    page = dict(obj)
                    box = self.resolve(obj.get("MediaBox"))
                    page["_MediaBox"] = box or list(_DEFAULT_BOX)
                    page["_Rotate"] = int(
                        self.resolve(obj.get("Rotate")) or 0) % 360
                    out.append(page)
        return out


def _box_dims(box, rotate: int) -> tuple[float, float]:
    try:
        x0, y0, x1, y1 = (float(v) for v in box)
    except (TypeError, ValueError):
        x0, y0, x1, y1 = _DEFAULT_BOX
    w, h = abs(x1 - x0), abs(y1 - y0)
    if rotate % 180 == 90:
        w, h = h, w
    return w, h


def pdf_meta(blob: bytes) -> dict:
    """Structure-only metadata: version, page count, per-page post-rotation
    point dims, encrypted flag. The D1 answer for PDFs.

    Error contract (same as every codec in this family): hostile or
    truncated input raises ValueError ONLY — upstream Arrow stages turn
    that into the per-record error column."""
    try:
        doc = PdfDocument(blob)
        pages = []
        for p in doc.pages():
            w, h = _box_dims(p["_MediaBox"], p["_Rotate"])
            pages.append({"width_pt": w, "height_pt": h,
                          "rotate": p["_Rotate"]})
        return {"version": doc.version, "n_pages": len(pages),
                "encrypted": doc.encrypted, "pages": pages}
    except ValueError:
        raise
    except Exception as e:  # hostile input: any parser failure → ValueError
        raise ValueError(f"PDF: malformed structure ({e!r})") from e


def pdf_page_dims(blob: bytes) -> tuple[int, int] | None:
    """(width, height) of page 1 in whole points — the sniff_dimensions
    contract (points == pixels at 72 DPI; PDFs are scalable, see
    render_plan)."""
    meta = pdf_meta(blob)
    if not meta["pages"]:
        return None
    p = meta["pages"][0]
    return round(p["width_pt"]), round(p["height_pt"])


def render_plan(width_pt: float, height_pt: float,
                dpi: int = 300) -> tuple[int, int]:
    """Pixel geometry of a rasterization at ``dpi`` — the reference's
    300-DPI pdf2image convention (image_utils.py:560-582; ``scalable=True``
    registry rows image_utils.py:27-42). Pure arithmetic; the render
    itself is the external seam."""
    return round(width_pt * dpi / 72.0), round(height_pt * dpi / 72.0)


# --------------------------------------------------------------------------
# content-stream text extraction
# --------------------------------------------------------------------------

def _content_tokens(data: bytes):
    """Yield ('val', value) and ('op', name) tokens from a content stream.
    Inline images (BI..EI) are skipped wholesale."""
    pos, n = 0, len(data)
    while True:
        pos = _skip_ws(data, pos)
        if pos >= n:
            return
        c = data[pos]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B or \
                c == 0x2B or c == 0x2D or c == 0x2E or 0x30 <= c <= 0x39:
            try:
                val, pos = _parse_value(data, pos)
            except ValueError:
                pos += 1
                continue
            yield "val", val
        elif c == 0x5D or c == 0x3E or c == 0x29 or c == 0x7B or c == 0x7D:
            pos += 1  # stray delimiter — content is best-effort
        else:
            start = pos
            while pos < n and data[pos] not in _WS and data[pos] not in _DELIM:
                pos += 1
            op = data[start:pos].decode("latin-1")
            if op == "BI":
                end = data.find(b"EI", pos)
                pos = end + 2 if end >= 0 else n
            elif op:
                yield "op", op
            else:
                pos += 1


def _mat_mul(m1, m2):
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (a1 * a2 + b1 * c2, a1 * b2 + b1 * d2,
            c1 * a2 + d1 * c2, c1 * b2 + d1 * d2,
            e1 * a2 + f1 * c2 + e2, e1 * b2 + f1 * d2 + f2)


_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _page_content(doc: PdfDocument, page: dict) -> bytes:
    contents = doc.resolve(page.get("Contents"))
    parts = []
    items = contents if isinstance(contents, list) else [contents]
    for item in items:
        item = doc.resolve(item)
        if isinstance(item, tuple):
            d, raw = item
            try:
                parts.append(_decode_stream(d, raw, doc.resolve))
            except (ValueError, zlib.error):
                continue
    return b"\n".join(parts)


def extract_page_words(doc: PdfDocument, page: dict) -> list[dict]:
    """Interpret the page's content stream(s) → line dicts
    ``{"y": baseline_pt, "words": [{"text","x","y","w","h"}]}`` in content
    order. Coordinates are PDF user space (y-up, points)."""
    data = _page_content(doc, page)
    lines: list[dict] = []
    cur_words: list[dict] = []
    cur_word_chars: list[str] = []
    word_x = 0.0
    state = {"size": 0.0, "tc": 0.0, "tw": 0.0, "tz": 1.0, "tl": 0.0}
    tm = lm = _ID
    last_y = None
    operands: list = []

    def flush_word():
        nonlocal cur_word_chars, word_x
        if cur_word_chars:
            txt = "".join(cur_word_chars)
            cur_words.append({
                "text": txt, "x": word_x, "y": tm[5],
                "w": tm[4] - word_x, "h": state["size"]})
            cur_word_chars = []

    def flush_line():
        nonlocal cur_words, last_y
        flush_word()
        if cur_words:
            lines.append({"y": cur_words[0]["y"], "words": cur_words})
            cur_words = []

    def show(raw: bytes):
        nonlocal tm, word_x, last_y
        if last_y is not None and abs(tm[5] - last_y) > 1e-6:
            flush_line()
        last_y = tm[5]
        for ch in raw.decode("latin-1"):
            adv = (_COURIER_EM * state["size"] + state["tc"]
                   + (state["tw"] if ch == " " else 0.0)) * state["tz"]
            if ch == " ":
                flush_word()
                tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)
                continue
            if not cur_word_chars:
                word_x = tm[4]
            cur_word_chars.append(ch)
            tm = _mat_mul((1, 0, 0, 1, adv, 0), tm)

    def text_move(tx: float, ty: float):
        nonlocal tm, lm
        flush_word()
        lm = _mat_mul((1, 0, 0, 1, tx, ty), lm)
        tm = lm

    for kind, tok in _content_tokens(data):
        if kind == "val":
            operands.append(tok)
            continue
        op = tok
        try:
            if op == "BT":
                tm = lm = _ID
                last_y = None
            elif op == "ET":
                flush_line()
            elif op == "Tf" and len(operands) >= 2:
                state["size"] = float(operands[-1])
            elif op == "TL" and operands:
                state["tl"] = float(operands[-1])
            elif op == "Tc" and operands:
                state["tc"] = float(operands[-1])
            elif op == "Tw" and operands:
                state["tw"] = float(operands[-1])
            elif op == "Tz" and operands:
                state["tz"] = float(operands[-1]) / 100.0
            elif op == "Td" and len(operands) >= 2:
                text_move(float(operands[-2]), float(operands[-1]))
            elif op == "TD" and len(operands) >= 2:
                state["tl"] = -float(operands[-1])
                text_move(float(operands[-2]), float(operands[-1]))
            elif op == "Tm" and len(operands) >= 6:
                flush_word()
                tm = lm = tuple(float(v) for v in operands[-6:])
            elif op == "T*":
                text_move(0.0, -state["tl"])
            elif op == "Tj" and operands and isinstance(operands[-1], bytes):
                show(operands[-1])
            elif op == "'" and operands and isinstance(operands[-1], bytes):
                text_move(0.0, -state["tl"])
                show(operands[-1])
            elif op == '"' and len(operands) >= 3:
                state["tw"] = float(operands[-3])
                state["tc"] = float(operands[-2])
                text_move(0.0, -state["tl"])
                if isinstance(operands[-1], bytes):
                    show(operands[-1])
            elif op == "TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, (int, float)):
                        tm = _mat_mul(
                            (1, 0, 0, 1,
                             -float(el) / 1000.0 * state["size"]
                             * state["tz"], 0), tm)
        except (TypeError, ValueError):
            pass
        operands = []
    flush_line()
    return lines


def pdf_extract_words(blob: bytes) -> list[dict]:
    """All pages → ``{"width_pt","height_pt","rotate","lines":[...]}``
    (lines as in :func:`extract_page_words`). Empty pages are kept here;
    the D8 empty-page filter applies downstream."""
    try:
        doc = PdfDocument(blob)
        out = []
        for p in doc.pages():
            w, h = _box_dims(p["_MediaBox"], p["_Rotate"])
            out.append({"width_pt": w, "height_pt": h,
                        "rotate": p["_Rotate"],
                        "lines": extract_page_words(doc, p)})
        return out
    except ValueError:
        raise
    except Exception as e:  # hostile input: any parser failure → ValueError
        raise ValueError(f"PDF: malformed structure ({e!r})") from e


def pdf_parse_pages(blob: bytes) -> list[list[list[str]]]:
    """pages→lines→words token shape — the same contract as
    frontend.parse_html, so PDFs route through the identical downstream
    pipeline (empty pages dropped, D8)."""
    out = []
    for page in pdf_extract_words(blob):
        lines = [[w["text"] for w in ln["words"]] for ln in page["lines"]]
        lines = [ln for ln in lines if ln]
        if lines:
            out.append(lines)
    return out


def pdf_extract_text(blob: bytes) -> str:
    """Reading-order plain text: words joined by spaces, lines by newlines,
    pages by form-feed — deterministic, byte-stable per input."""
    pages = pdf_parse_pages(blob)
    return "\f".join(
        "\n".join(" ".join(toks) for toks in page) for page in pages)


# --------------------------------------------------------------------------
# fixture writer
# --------------------------------------------------------------------------

def _esc_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_for(lines: list[str], height: float, size: float = 12.0,
                 margin: float = 72.0, leading: float = 14.0) -> bytes:
    parts = [f"BT /F1 {size:g} Tf {leading:g} TL "
             f"{margin:g} {height - margin:g} Td"]
    for i, line in enumerate(lines):
        if i:
            parts.append("T*")
        parts.append(f"({_esc_pdf_string(line)}) Tj")
    parts.append("ET")
    return " ".join(parts).encode("latin-1")


def write_pdf(pages: list[dict], *, compress: bool = False,
              xref_stream: bool = False, predictor: bool = False,
              objstm: bool = False, encrypted_flag: bool = False,
              version: str = "1.4") -> bytes:
    """Spec-valid PDF fixture writer. ``pages``: dicts with ``width``/
    ``height`` (points), optional ``rotate`` and ``lines`` (list[str],
    Courier 12pt). Dialects: classic xref (default), ``xref_stream``
    (PDF 1.5 /Type /XRef), ``predictor`` (PNG Up on the xref stream),
    ``objstm`` (page dicts packed in a /Type /ObjStm). ``compress``
    flate-compresses content streams. ``encrypted_flag`` plants /Encrypt
    in the trailer (flag-only; nothing is actually encrypted)."""
    if (predictor or objstm) and not xref_stream:
        xref_stream = True
    if xref_stream and version == "1.4":
        version = "1.5"
    objects: dict[int, bytes] = {}  # num -> serialized body (no obj wrapper)
    n_pages = len(pages)
    # numbering: 1 catalog, 2 pages-root, 3 font, 4.. page/content pairs
    kid_refs = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (f"<< /Type /Pages /Count {n_pages} "
                  f"/Kids [{kid_refs}] >>").encode()
    objects[3] = (b"<< /Type /Font /Subtype /Type1 "
                  b"/BaseFont /Courier >>")
    for i, pg in enumerate(pages):
        w = float(pg.get("width", 612))
        h = float(pg.get("height", 792))
        rot = int(pg.get("rotate", 0))
        pnum, cnum = 4 + 2 * i, 5 + 2 * i
        rotate = f" /Rotate {rot}" if rot else ""
        objects[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {w:g} {h:g}]"
            f"{rotate} /Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cnum} 0 R >>").encode()
        content = _content_for(list(pg.get("lines", [])), h)
        if compress:
            comp = zlib.compress(content)
            objects[cnum] = (
                f"<< /Length {len(comp)} /Filter /FlateDecode >>\n"
                .encode() + b"stream\n" + comp + b"\nendstream")
        else:
            objects[cnum] = (
                f"<< /Length {len(content)} >>\n".encode()
                + b"stream\n" + content + b"\nendstream")

    out = bytearray(f"%PDF-{version}\n".encode())
    out += b"%\xe2\xe3\xcf\xd3\n"  # binary-marker comment
    offsets: dict[int, int] = {}

    in_objstm: set[int] = set()
    objstm_num = None
    if objstm:
        # non-stream objects go into the ObjStm (streams are not allowed)
        in_objstm = {n for n, body in objects.items()
                     if b"stream" not in body}
        objstm_num = max(objects) + 1

    for num in sorted(objects):
        if num in in_objstm:
            continue
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"

    objstm_index: dict[int, int] = {}
    if objstm:
        members = sorted(in_objstm)
        bodies = [objects[n] for n in members]
        offs, acc = [], 0
        for b in bodies:
            offs.append(acc)
            acc += len(b) + 1
        header = " ".join(f"{n} {o}" for n, o in zip(members, offs))
        payload = (header + "\n").encode() + b"\n".join(bodies) + b"\n"
        first = len(header) + 1
        comp = zlib.compress(payload)
        offsets[objstm_num] = len(out)
        out += (f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(members)} "
                f"/First {first} /Length {len(comp)} "
                f"/Filter /FlateDecode >>\nstream\n").encode()
        out += comp + b"\nendstream\nendobj\n"
        objstm_index = {n: i for i, n in enumerate(members)}

    enc = b" /Encrypt 99 0 R" if encrypted_flag else b""
    if not xref_stream:
        xref_off = len(out)
        maxnum = max(offsets)
        out += f"xref\n0 {maxnum + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, maxnum + 1):
            out += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
        out += (b"trailer\n<< /Size " + str(maxnum + 1).encode()
                + b" /Root 1 0 R" + enc + b" >>\n")
        out += f"startxref\n{xref_off}\n%%EOF\n".encode()
        return bytes(out)

    # xref stream dialect
    xref_num = (objstm_num or max(objects)) + 1
    xref_off = len(out)
    offsets[xref_num] = xref_off
    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            rows += bytes([0]) + (0).to_bytes(4, "big") \
                + (65535).to_bytes(2, "big")
        elif num in objstm_index:
            rows += bytes([2]) + objstm_num.to_bytes(4, "big") \
                + objstm_index[num].to_bytes(2, "big")
        else:
            rows += bytes([1]) + offsets[num].to_bytes(4, "big") \
                + (0).to_bytes(2, "big")
    rec = 7
    parms = b""
    if predictor:
        filtered = bytearray()
        prev = bytes(rec)
        for r in range(size):
            row = bytes(rows[r * rec:(r + 1) * rec])
            filtered += bytes([2]) + bytes(
                (row[i] - prev[i]) & 0xFF for i in range(rec))
            prev = row
        payload = zlib.compress(bytes(filtered))
        parms = f" /DecodeParms << /Predictor 12 /Columns {rec} >>".encode()
    else:
        payload = zlib.compress(bytes(rows))
    out += (f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} "
            f"/W [1 4 2] /Root 1 0 R /Filter /FlateDecode"
            ).encode() + parms + enc \
        + f" /Length {len(payload)} >>\nstream\n".encode()
    out += payload + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)
