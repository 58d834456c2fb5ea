"""Lossless WebP (VP8L) codec — pure Python/numpy, spec-derived.

Extends the built-in codec family (functions/codecs.py) to WebP, the
highest-volume web image format with no native path so far. Scope is the
**VP8L lossless bitstream** (the "WebP Lossless Bitstream Specification"):

- **decode**: RIFF/VP8L container walk; LSB-first bit reader; canonical
  prefix codes in both spec variants (simple 1-2 symbol codes and
  code-length-coded normal codes with 16/17/18 repeats and the optional
  max_symbol counter); meta-prefix (huffman image) group selection;
  color cache; LZ77 backward references with the 120-entry 2D
  neighborhood distance map; all four transforms inverted in reverse
  read order — predictor (14 modes), cross-color, subtract-green, and
  color-indexing incl. sub-byte pixel packing for small palettes.
  Alpha is composited over white, matching the PNG path's convention
  (the reference thumbnails onto a white page, preproc.py:120).
- **encode** (tests/fixtures): literal VP8L writer with per-channel
  simple-or-flat prefix codes and optional dialects for every decoder
  stage — subtract-green, fixed-mode predictor (all 14 modes),
  cross-color multipliers, palette color-indexing with sub-byte
  packing, color cache, distance-1 RLE backreferences, and a meta-prefix
  huffman image. Roundtrips therefore pin each decode path natively;
  real-world libwebp streams are additionally cross-validated by the
  importorskip'd PIL test in tests/test_real_runtimes.py.

**Lossy WebP (VP8) stays an external-codec seam** — it is a full DCT
video intra-frame codec; `sniff_dimensions` already reads its header
dims, and decode raises the sanctioned ValueError.

Cost note (100 TB): the pixel loop is per-pixel Python (prefix decode is
inherently sequential, same floor as the JPEG entropy scan); inverse
transforms are vectorized per block where possible. Runs inside the
Arrow-batched thumbnail stages; prefer libwebp via PIL where
installable.
"""

from __future__ import annotations

import struct

import numpy as np

_HASH_MUL = 0x1E35A7BD

#: order in which code-length-code lengths appear in the stream
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
              14, 15]

#: 2D neighborhood map for distance codes 1..120: (xoffset, yoffset)
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


class _Bits:
    """LSB-first bit reader (VP8L convention — opposite of JPEG) with a
    zero-padded peek window for table-based prefix decode. Consuming more
    than 32 padding bits past the end raises (truncated stream)."""

    def __init__(self, data: bytes):
        self.data = data + b"\x00\x00\x00\x00"
        self.nbits = len(data) * 8
        self.pos = 0      # bit position

    def peek(self, k: int) -> int:
        byte = self.pos >> 3
        chunk = int.from_bytes(self.data[byte:byte + 4], "little") \
            >> (self.pos & 7)
        return chunk & ((1 << k) - 1)

    def skip(self, k: int) -> None:
        self.pos += k
        if self.pos > self.nbits + 32:
            raise ValueError("VP8L: bitstream truncated")

    def read(self, n: int) -> int:
        if n > 24:
            lo = self.read(16)
            return lo | (self.read(n - 16) << 16)
        v = self.peek(n)
        self.skip(n)
        return v


class _Prefix:
    """Canonical prefix code (first-read bit = MSB of the code) as a
    flat lookup table indexed by bit-reversed code prefixes — one peek +
    two array reads per symbol instead of a bit-by-bit tree walk."""

    def __init__(self, lengths: list[int]):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.const: int | None = nz[0][0]
            return
        self.const = None
        max_len = max(ln for _, ln in nz)
        if max_len > 15:
            raise ValueError("VP8L: code length > 15")
        bl_count = [0] * (max_len + 1)
        for _, ln in nz:
            bl_count[ln] += 1
        code = 0
        next_code = [0] * (max_len + 2)
        for ln in range(1, max_len + 1):
            code = (code + bl_count[ln - 1]) << 1
            next_code[ln] = code
        size = 1 << max_len
        tbl_sym = [0] * size
        tbl_len = [0] * size
        kraft = 0
        for s, ln in nz:
            c = next_code[ln]
            next_code[ln] += 1
            kraft += 1 << (max_len - ln)
            # stream-order index: bit-reverse the code over its length
            rev = 0
            for i in range(ln):
                rev |= ((c >> i) & 1) << (ln - 1 - i)
            for hi in range(0, size, 1 << ln):
                tbl_sym[hi | rev] = s
                tbl_len[hi | rev] = ln
        if kraft != size:
            raise ValueError("VP8L: prefix code not complete")
        self.max_len = max_len
        self.tbl_sym = tbl_sym
        self.tbl_len = tbl_len

    def decode(self, br: _Bits) -> int:
        if self.const is not None:
            return self.const
        ix = br.peek(self.max_len)
        br.skip(self.tbl_len[ix])
        return self.tbl_sym[ix]


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code: 1 or 2 symbols
        n_sym = br.read(1) + 1
        if br.read(1):  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        lengths = [0] * alphabet_size
        if n_sym == 2:
            s1 = br.read(8)
            if s0 >= alphabet_size or s1 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[s0] = lengths[s1] = 1
        else:
            if s0 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[s0] = 1
        return _Prefix(lengths)
    # normal: code-length code first
    num_clc = br.read(4) + 4
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.read(3)
    clc = _Prefix(clc_lengths)
    # optional cap on number of coded symbols
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = clc.decode(br)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + br.read(2)):
                if symbol < alphabet_size:
                    lengths[symbol] = prev
                    symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _Prefix(lengths)


def _prefix_value(code: int, br: _Bits) -> int:
    """Length/distance prefix decoding (spec 'prefix coding')."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_pixels(br: _Bits, w: int, h: int, is_main: bool):
    """Entropy-coded ARGB image → (h, w) uint32 array (+ transform list
    when is_main). Implements color cache, meta-prefix groups, literals,
    cache hits, and LZ77 backrefs."""
    transforms = []
    xsize = w
    if is_main:
        while br.read(1):
            ttype = br.read(2)
            if ttype == 0 or ttype == 1:  # predictor / cross-color
                size_bits = br.read(3) + 2
                tw = _subsample_size(xsize, size_bits)
                th = _subsample_size(h, size_bits)
                timg = _read_pixels(br, tw, th, False)[0]
                transforms.append((ttype, size_bits, timg))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                pal_size = br.read(8) + 1
                pal = _read_pixels(br, pal_size, 1, False)[0][0]
                # palette entries are delta-coded per channel
                pal = np.cumsum(pal.view(np.uint8).reshape(-1, 4),
                                axis=0, dtype=np.uint32).astype(np.uint8)
                pal = pal.reshape(-1, 4).copy().view(np.uint32).reshape(-1)
                if pal_size <= 2:
                    wbits = 3
                elif pal_size <= 4:
                    wbits = 2
                elif pal_size <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, (wbits, pal_size, xsize), pal))
                xsize = _subsample_size(xsize, wbits)

    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("VP8L: color cache too large")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    huff_img = None
    huff_bits = 0
    n_groups = 1
    if is_main and br.read(1):  # meta prefix codes
        huff_bits = br.read(3) + 2
        hw = _subsample_size(xsize, huff_bits)
        hh = _subsample_size(h, huff_bits)
        huff_img = _read_pixels(br, hw, hh, False)[0]
        meta = ((huff_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
        huff_meta = meta

    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(br, green_alpha),
            _read_prefix_code(br, 256),   # red
            _read_prefix_code(br, 256),   # blue
            _read_prefix_code(br, 256),   # alpha
            _read_prefix_code(br, 40),    # distance
        ))

    n = xsize * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0

    def cache_insert(argb: int) -> None:
        if cache_size:
            cache[((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] \
                = argb

    while pos < n:
        if huff_img is not None:
            x, y = pos % xsize, pos // xsize
            gix = int(huff_meta[y >> huff_bits,
                                (x >> huff_bits)])
            g = groups[gix]
        else:
            g = groups[0]
        s = g[0].decode(br)
        if s < 256:  # literal
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = argb
            cache_insert(argb)
            pos += 1
        elif s < 256 + 24:  # backward reference
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(g[4].decode(br), br)
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dx + dy * xsize
                if dist < 1:
                    dist = 1
            if dist > pos:
                raise ValueError("VP8L: backref before image start")
            for _ in range(length):
                if pos >= n:
                    break
                argb = int(out[pos - dist])
                out[pos] = argb
                cache_insert(argb)
                pos += 1
        else:  # color cache hit
            if not cache_size:
                raise ValueError("VP8L: cache hit without cache")
            out[pos] = cache[s - 256 - 24]
            pos += 1

    return out.reshape(h, xsize), transforms


def _avg2(a, b):
    return ((a.astype(np.uint16) + b) >> 1).astype(np.uint8)


def _predict(mode: int, left, top, topleft, topright):
    """One predictor-mode prediction for a single pixel, per channel
    (uint8[4] arrays in ARGB byte order)."""
    if mode == 0:
        return np.array([0xFF, 0, 0, 0], np.uint8)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:  # Select
        p = left.astype(np.int32) + top - topleft
        p_left = np.abs(p - left).sum()
        p_top = np.abs(p - top).sum()
        return left if p_left < p_top else top
    if mode == 12:  # ClampAddSubtractFull
        v = left.astype(np.int32) + top - topleft
        return np.clip(v, 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf
        ave = (left.astype(np.int32) + top) >> 1
        d = ave - topleft
        # C-style truncation toward zero for the /2
        v = ave + np.trunc(d / 2).astype(np.int32)
        return np.clip(v, 0, 255).astype(np.uint8)
    raise ValueError(f"VP8L: predictor mode {mode}")


def _apply_inverse_transforms(img: np.ndarray, transforms,
                              width: int) -> np.ndarray:
    """Apply the collected transforms in reverse read order."""
    for ttype, meta, data in reversed(transforms):
        h, w = img.shape
        if ttype == 3:  # color indexing
            wbits, pal_size, full_w = meta
            idx = ((img >> 8) & 0xFF).astype(np.int64)
            if wbits:
                per = 1 << wbits           # pixels packed per green byte
                bits = 8 >> wbits          # bits per packed pixel
                cols = []
                for sub in range(per):
                    cols.append((idx >> (sub * bits)) & ((1 << bits) - 1))
                idx = np.stack(cols, axis=2).reshape(h, -1)[:, :full_w]
            pal = data
            safe = np.where(idx < pal_size, idx, 0)
            img = np.where(idx < pal_size, pal[safe], 0).astype(np.uint32)
        elif ttype == 2:  # subtract green
            a = (img >> 24) & 0xFF
            r = (img >> 16) & 0xFF
            g = (img >> 8) & 0xFF
            b = img & 0xFF
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
            img = (a << 24) | (r << 16) | (g << 8) | b
        elif ttype == 1:  # cross-color
            size_bits, timg = meta, data
            a = ((img >> 24) & 0xFF).astype(np.int32)
            r = ((img >> 16) & 0xFF).astype(np.int32)
            g = ((img >> 8) & 0xFF).astype(np.int32)
            b = (img & 0xFF).astype(np.int32)
            ys, xs = np.mgrid[0:h, 0:w]
            t = timg[ys >> size_bits, xs >> size_bits]
            g2r = ((t & 0xFF).astype(np.int64)
                   .astype(np.uint8).astype(np.int8).astype(np.int32))
            g2b = (((t >> 8) & 0xFF)
                   .astype(np.uint8).astype(np.int8).astype(np.int32))
            r2b = (((t >> 16) & 0xFF)
                   .astype(np.uint8).astype(np.int8).astype(np.int32))

            def delta(m, c):
                return (m * ((c & 0xFF).astype(np.int8)
                             .astype(np.int32))) >> 5

            r = (r + delta(g2r, g)) & 0xFF
            b = (b + delta(g2b, g) + delta(r2b, r)) & 0xFF
            img = ((a.astype(np.uint32) << 24) | (r.astype(np.uint32) << 16)
                   | (g.astype(np.uint32) << 8) | b.astype(np.uint32))
        elif ttype == 0:  # predictor
            size_bits, timg = meta, data
            px = img.view(np.uint8).reshape(h, w, 4)  # little-endian BGRA
            # work in ARGB channel order [A, R, G, B]
            chans = px[:, :, [3, 2, 1, 0]].astype(np.uint8)
            out = np.zeros_like(chans)
            modes = ((timg >> 8) & 0xFF).astype(np.int64)
            zero = np.zeros(4, np.uint8)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = np.array([0xFF, 0, 0, 0], np.uint8)
                    elif y == 0:
                        pred = out[0, x - 1]
                    elif x == 0:
                        pred = out[y - 1, 0]
                    else:
                        mode = int(modes[y >> size_bits, x >> size_bits])
                        left = out[y, x - 1]
                        top = out[y - 1, x]
                        topleft = out[y - 1, x - 1]
                        # rightmost column: TR reads one past the previous
                        # row, which in libwebp's flat buffer is the
                        # current row's leftmost (already decoded) pixel
                        topright = out[y - 1, x + 1] if x + 1 < w \
                            else out[y, 0]
                        pred = _predict(mode, left, top, topleft, topright)
                    out[y, x] = (chans[y, x].astype(np.uint16)
                                 + pred) & 0xFF
            img = ((out[:, :, 0].astype(np.uint32) << 24)
                   | (out[:, :, 1].astype(np.uint32) << 16)
                   | (out[:, :, 2].astype(np.uint32) << 8)
                   | out[:, :, 3].astype(np.uint32))
    return img


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → (h, w, 4) uint8 RGBA."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)   # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    img, transforms = _read_pixels(br, w, h, True)
    img = _apply_inverse_transforms(img, transforms, w)
    if img.shape != (h, w):
        raise ValueError("VP8L: transform output size mismatch")
    a = ((img >> 24) & 0xFF).astype(np.uint8)
    r = ((img >> 16) & 0xFF).astype(np.uint8)
    g = ((img >> 8) & 0xFF).astype(np.uint8)
    b = (img & 0xFF).astype(np.uint8)
    return np.stack([r, g, b, a], axis=2)


def _rgba_over_white(rgba: np.ndarray) -> np.ndarray:
    rgb = rgba[:, :, :3].astype(np.float64)
    a = rgba[:, :, 3:4].astype(np.float64) / 255.0
    return np.round(rgb * a + 255.0 * (1.0 - a)).astype(np.uint8)


def decode_webp(blob: bytes) -> tuple[np.ndarray, int | None]:
    """WebP container → ((h, w, 3) uint8 RGB, orientation=None).
    Lossless (VP8L) decodes natively; lossy (VP8, incl. VP8X-wrapped)
    decodes through the ctypes libwebp backend when the system library
    is present, else raises the declared external-codec ValueError."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        raise ValueError("WebP: bad RIFF header")
    pos = 12
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            return _rgba_over_white(decode_vp8l(body)), None
        if tag == b"VP8 ":
            return _rgba_over_white(libwebp_decode_rgba(blob)), None
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no VP8L/VP8 chunk")


# --------------------------------------------------------------------------
# encoder (tests / fixtures)
# --------------------------------------------------------------------------

class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bitpos & 7 == 0:
                self.out.append(0)
            if (value >> i) & 1:
                self.out[-1] |= 1 << (self.bitpos & 7)
            self.bitpos += 1

    def write_code(self, code: int, length: int) -> None:
        """Prefix code word: first written bit = MSB of the code."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    nz = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
    max_len = max(ln for _, ln in nz)
    bl_count = [0] * (max_len + 1)
    for _, ln in nz:
        bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for s, ln in nz:
        out[s] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


def _complete_flat_lengths(n_symbols: int) -> list[int]:
    """Kraft-complete near-flat code lengths for n symbols: a symbols at
    bit-length L, the rest at L+1, with a/2^L + b/2^(L+1) == 1."""
    if n_symbols == 1:
        return [1]
    L = n_symbols.bit_length() - 1  # 2^L <= n < 2^(L+1)
    if (1 << L) == n_symbols:
        return [L] * n_symbols
    # a symbols at L, the rest at L+1: a/2^L + (n-a)/2^(L+1) = 1
    a = (1 << (L + 1)) - n_symbols
    return [L] * a + [L + 1] * (n_symbols - a)


def _write_normal_code(bw: _BitsW, lengths: list[int]) -> None:
    """Emit a 'normal' prefix code: code-length code + the length
    sequence (literal symbols only, with 16-repeats for long runs)."""
    used = sorted({ln for ln in lengths if ln > 0} | {16})
    clc_len = [0] * 19
    # flat code over the used code-length symbols
    flat = _complete_flat_lengths(len(used))
    for s, ln in zip(used, flat):
        clc_len[s] = ln
    # num_code_lengths must cover every used symbol in _CLC_ORDER order
    need = max(_CLC_ORDER.index(s) for s in used) + 1
    num_clc = max(need, 4)
    bw.write(0, 1)  # not simple
    bw.write(num_clc - 4, 4)
    for i in range(num_clc):
        bw.write(clc_len[_CLC_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol cap
    codes = _canonical_codes(clc_len)
    i = 0
    n = len(lengths)
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        c, cl = codes[ln]
        bw.write_code(c, cl)
        emitted = 1
        i += 1
        # repeat-16 covers runs of the previous (nonzero) length
        if ln > 0:
            while run - emitted >= 3:
                rep = min(run - emitted, 6)
                c16, l16 = codes[16]
                bw.write_code(c16, l16)
                bw.write(rep - 3, 2)
                emitted += rep
                i += rep
        while emitted < run:
            bw.write_code(c, cl)
            emitted += 1
            i += 1


def _write_channel_code(bw: _BitsW, values: np.ndarray,
                        alphabet: int) -> dict[int, tuple[int, int]]:
    """Simple code when ≤2 distinct values, else flat complete code over
    the whole alphabet. Returns symbol → (code, length)."""
    distinct = sorted(set(int(v) for v in values.reshape(-1))) or [0]
    if len(distinct) <= 2:
        bw.write(1, 1)  # simple
        bw.write(len(distinct) - 1, 1)
        s0 = distinct[0]
        if s0 > 1:
            bw.write(1, 1)
            bw.write(s0, 8)
        else:
            bw.write(0, 1)
            bw.write(s0, 1)
        if len(distinct) == 2:
            bw.write(distinct[1], 8)
            return {distinct[0]: (0, 1), distinct[1]: (1, 1)}
        return {distinct[0]: (0, 0)}
    lengths = _complete_flat_lengths(alphabet)
    _write_normal_code(bw, lengths)
    return _canonical_codes(lengths)


def _literal_subimage(bw: _BitsW, pixels: np.ndarray) -> None:
    """Entropy-coded subimage (palette / predictor / huffman image):
    no color cache, one group, literal coding only."""
    bw.write(0, 1)  # no color cache
    a = (pixels >> 24) & 0xFF
    r = (pixels >> 16) & 0xFF
    g = (pixels >> 8) & 0xFF
    b = pixels & 0xFF
    gcodes = _write_channel_code(bw, g, 256 + 24)
    rcodes = _write_channel_code(bw, r, 256)
    bcodes = _write_channel_code(bw, b, 256)
    acodes = _write_channel_code(bw, a, 256)
    _write_normal_code(bw, _complete_flat_lengths(40))  # unused distances
    for gv, rv, bv, av in zip(g.reshape(-1), r.reshape(-1),
                              b.reshape(-1), a.reshape(-1)):
        for codes, v in ((gcodes, gv), (rcodes, rv), (bcodes, bv),
                         (acodes, av)):
            c, cl = codes[int(v)]
            bw.write_code(c, cl)


def encode_webp_lossless(arr: np.ndarray, subtract_green: bool = False,
                         cache_bits: int = 0,
                         rle: bool = False,
                         predictor_mode: int | None = None,
                         cross_color: tuple[int, int, int] | None = None,
                         palette: bool = False,
                         meta_prefix: bool = False) -> bytes:
    """(h, w, 3|4) or (h, w) uint8 → lossless WebP bytes. Literal coding
    with per-channel simple-or-flat prefix codes. Optional dialects —
    each toggles a decoder stage so roundtrips cover it:
    ``subtract_green``; a fixed-mode ``predictor_mode`` (0-13, one block
    for the whole image); a fixed-multiplier ``cross_color`` transform
    (g2r, g2b, r2b int8 values); ``palette`` color-indexing (≤256
    distinct colors, sub-byte packing for ≤16); ``cache_bits`` color
    cache; ``rle`` distance-1 backreferences; ``meta_prefix`` a trivial
    1×1 huffman image. ``palette`` is exclusive of the pixel-domain
    transforms."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    r = arr[:, :, 0].astype(np.int32)
    g = arr[:, :, 1].astype(np.int32)
    b = arr[:, :, 2].astype(np.int32)
    a = (arr[:, :, 3].astype(np.int32) if arr.shape[2] == 4
         else np.full((h, w), 255, np.int32))
    bw = _BitsW()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if arr.shape[2] == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if palette and (subtract_green or predictor_mode is not None
                    or cross_color is not None):
        raise ValueError("palette is exclusive of pixel-domain transforms")
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    if cross_color is not None:
        g2r, g2b, r2b = cross_color

        def fdelta(m, c):
            return (np.int32(np.int8(m)) * c.astype(np.uint8)
                    .astype(np.int8).astype(np.int32)) >> 5

        new_r = (r - fdelta(g2r, g)) & 0xFF
        new_b = (b - fdelta(g2b, g) - fdelta(r2b, r)) & 0xFF
        r, b = new_r, new_b
        bw.write(1, 1)
        bw.write(1, 2)       # cross-color transform
        size_bits = max(w - 1, h - 1).bit_length()
        size_bits = max(size_bits, 2)
        bw.write(size_bits - 2, 3)
        cte = ((0xFF << 24) | ((r2b & 0xFF) << 16)
               | ((g2b & 0xFF) << 8) | (g2r & 0xFF))
        _literal_subimage(bw, np.array([[cte]], np.uint32))
    if predictor_mode is not None:
        # residuals computed with the SAME reconstruction rules the
        # decoder applies (left/top edge rules, wrap-around topright)
        chans = np.stack([a, r, g, b], axis=2).astype(np.uint8)
        resid = np.zeros_like(chans)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = np.array([0xFF, 0, 0, 0], np.uint8)
                elif y == 0:
                    pred = chans[0, x - 1]
                elif x == 0:
                    pred = chans[y - 1, 0]
                else:
                    tr = chans[y - 1, x + 1] if x + 1 < w else chans[y, 0]
                    pred = _predict(predictor_mode, chans[y, x - 1],
                                    chans[y - 1, x], chans[y - 1, x - 1],
                                    tr)
                resid[y, x] = (chans[y, x].astype(np.int32)
                               - pred) & 0xFF
        a = resid[:, :, 0].astype(np.int32)
        r = resid[:, :, 1].astype(np.int32)
        g = resid[:, :, 2].astype(np.int32)
        b = resid[:, :, 3].astype(np.int32)
        bw.write(1, 1)
        bw.write(0, 2)       # predictor transform
        size_bits = max(max(w - 1, h - 1).bit_length(), 2)
        bw.write(size_bits - 2, 3)
        mode_px = (0xFF << 24) | (predictor_mode << 8)
        _literal_subimage(bw, np.array([[mode_px]], np.uint32))
    if palette:
        colors = {}
        idx = np.zeros((h, w), np.int32)
        for y in range(h):
            for x in range(w):
                key = (int(a[y, x]), int(r[y, x]), int(g[y, x]),
                       int(b[y, x]))
                if key not in colors:
                    colors[key] = len(colors)
                idx[y, x] = colors[key]
        pal = list(colors)
        if len(pal) > 256:
            raise ValueError("palette: more than 256 distinct colors")
        bw.write(1, 1)
        bw.write(3, 2)       # color indexing
        bw.write(len(pal) - 1, 8)
        deltas = []
        prev = (0, 0, 0, 0)
        for e in pal:
            deltas.append(tuple((c - p) & 0xFF for c, p in zip(e, prev)))
            prev = e
        pal_px = np.array([[(d[0] << 24) | (d[1] << 16) | (d[2] << 8)
                            | d[3] for d in deltas]], np.uint32)
        _literal_subimage(bw, pal_px)
        if len(pal) <= 2:
            wbits = 3
        elif len(pal) <= 4:
            wbits = 2
        elif len(pal) <= 16:
            wbits = 1
        else:
            wbits = 0
        if wbits:
            per = 1 << wbits
            bits = 8 >> wbits
            packed_w = _subsample_size(w, wbits)
            packed = np.zeros((h, packed_w), np.int32)
            for x in range(w):
                packed[:, x >> wbits] |= idx[:, x] << ((x % per) * bits)
            idx = packed
            w = packed_w
        a = np.full(idx.shape, 255, np.int32)
        r = np.zeros(idx.shape, np.int32)
        g = idx
        b = np.zeros(idx.shape, np.int32)
    bw.write(0, 1)  # end of transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if meta_prefix:
        bw.write(1, 1)
        bw.write(0, 3)       # huffman_bits = 2
        # 1-pixel huffman image → meta index 0 everywhere (covers the
        # whole image when 1 << 2 >= dims; callers keep fixtures small)
        hw = _subsample_size(w, 2)
        hh = _subsample_size(h, 2)
        _literal_subimage(
            bw, np.full((hh, hw), 0xFF000000, np.uint32))
    else:
        bw.write(0, 1)  # no meta prefix
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + 24 + cache_size
    # green channel always needs the full green alphabet when cache or
    # rle symbols are emitted; use flat unless plain-literal simple fits
    gvals = g.reshape(-1)
    if cache_bits or rle or len(set(int(v) for v in gvals)) > 2:
        glens = _complete_flat_lengths(green_alpha)
        _write_normal_code(bw, glens)
        gcodes = _canonical_codes(glens)
    else:
        gcodes = _write_channel_code(bw, g, green_alpha)
    rcodes = _write_channel_code(bw, r, 256)
    bcodes = _write_channel_code(bw, b, 256)
    acodes = _write_channel_code(bw, a, 256)
    dlens = _complete_flat_lengths(40)
    _write_normal_code(bw, dlens)
    dcodes = _canonical_codes(dlens)

    cache = [None] * cache_size

    def cache_ix(argb: int) -> int:
        return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - cache_bits)

    flat_r, flat_g, flat_b, flat_a = (c.reshape(-1)
                                      for c in (r, g, b, a))
    n = h * w
    i = 0
    while i < n:
        argb = ((int(flat_a[i]) << 24) | (int(flat_r[i]) << 16)
                | (int(flat_g[i]) << 8) | int(flat_b[i]))
        if rle and i > 0:
            prev = ((int(flat_a[i - 1]) << 24) | (int(flat_r[i - 1]) << 16)
                    | (int(flat_g[i - 1]) << 8) | int(flat_b[i - 1]))
            run = 0
            while i + run < n and run < 4096:
                cur = ((int(flat_a[i + run]) << 24)
                       | (int(flat_r[i + run]) << 16)
                       | (int(flat_g[i + run]) << 8)
                       | int(flat_b[i + run]))
                if cur != prev:
                    break
                run += 1
            if run >= 3:
                # length prefix code for `run`, distance code for dist=1
                lcode, lextra, lebits = _to_prefix(run)
                c, cl = gcodes[256 + lcode]
                bw.write_code(c, cl)
                bw.write(lextra, lebits)
                dcode, dextra, debits = _to_prefix(1 + 120)
                c, cl = dcodes[dcode]
                bw.write_code(c, cl)
                bw.write(dextra, debits)
                if cache_size:
                    for k in range(run):
                        cache[cache_ix(prev)] = prev
                i += run
                continue
        if cache_size and cache[cache_ix(argb)] == argb:
            sym = 256 + 24 + cache_ix(argb)
            c, cl = gcodes[sym]
            bw.write_code(c, cl)
            i += 1
            continue
        c, cl = gcodes[int(flat_g[i])]
        bw.write_code(c, cl)
        c, cl = rcodes[int(flat_r[i])]
        bw.write_code(c, cl)
        c, cl = bcodes[int(flat_b[i])]
        bw.write_code(c, cl)
        c, cl = acodes[int(flat_a[i])]
        bw.write_code(c, cl)
        if cache_size:
            cache[cache_ix(argb)] = argb
        i += 1

    payload = b"\x2f" + bytes(bw.out)
    if len(payload) & 1:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload + b"\x00"
    else:
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _to_prefix(value: int) -> tuple[int, int, int]:
    """Inverse of :func:`_prefix_value`: value → (code, extra, n_extra)."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    extra_bits = x.bit_length() - 2
    rem = x - (2 << extra_bits)
    if rem >= (1 << extra_bits):
        return 2 * extra_bits + 3, rem - (1 << extra_bits), extra_bits
    return 2 * extra_bits + 2, rem, extra_bits


def encode_webp_vp8_stub(w: int, h: int, seed: int = 0) -> bytes:
    """Metadata-grade lossy-WebP fixture: a spec-valid VP8 key-frame
    *uncompressed header* (RFC 6386 §9.1 frame tag, start code, 14-bit
    dims) over a deterministic filler payload. ``sniff_dimensions``
    reads the true dims from it — the D1 path never errors on lossy
    WebP — while ``decode_webp`` refuses the payload with the declared
    external-codec ValueError (pixel decode of entropy-coded VP8 stays
    a seam, exercised for real by the PIL importorskip tests)."""
    if not (0 < w < (1 << 14) and 0 < h < (1 << 14)):
        raise ValueError("VP8 stub: dims out of 14-bit range")
    filler = bytes(((seed + i) * 37) & 0xFF for i in range(48))
    first_part_size = len(filler)
    # frame tag: key frame (bit0=0), version 0, show_frame=1, size<<5
    tag = (first_part_size << 5) | (1 << 4)
    payload = (tag.to_bytes(3, "little") + b"\x9d\x01\x2a"
               + struct.pack("<H", w & 0x3FFF)
               + struct.pack("<H", h & 0x3FFF) + filler)
    if len(payload) & 1:
        payload += b"\x00"
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# --------------------------------------------------------------------------
# libwebp backend (ctypes): entropy-coded lossy VP8/VP8X decode
# --------------------------------------------------------------------------
#
# The VP8 *intra* bitstream needs ~3000 exact spec constants (token/mode
# probability tables) a from-scratch implementation must transcribe; the
# system libwebp — present on most hosts including this one — IS the
# reference implementation of that spec, so the lossy branch binds to it
# via ctypes when available instead. VP8L stays native (spec-derived
# above) and cross-validates against this backend byte-exactly whenever
# the library is present.

def _probe_libwebp():
    lib = None
    try:
        import ctypes
        import ctypes.util

        name = ctypes.util.find_library("webp") or "libwebp.so.7"
        lib = ctypes.CDLL(name)
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.WebPFree.argtypes = [ctypes.c_void_p]
    except (OSError, AttributeError):
        lib = None
    return lib


def _libwebp():
    """System libwebp under the deployment backend policy
    (functions/backends.py): auto-probe / require / forced-off."""
    from .backends import resolve_backend

    return resolve_backend("libwebp", _probe_libwebp)


def libwebp_available() -> bool:
    return _libwebp() is not None


def libwebp_decode_rgba(blob: bytes) -> np.ndarray:
    """Whole WebP container → (h, w, 4) RGBA via the system libwebp.
    Raises ValueError when the library is absent (the declared seam) or
    the payload is undecodable (hostile input → error column)."""
    import ctypes

    lib = _libwebp()
    if lib is None:
        raise ValueError(
            "WebP: lossy VP8 needs an external codec (libwebp/PIL seam) — "
            "native path covers lossless VP8L")
    w, h = ctypes.c_int(), ctypes.c_int()
    ptr = lib.WebPDecodeRGBA(bytes(blob), len(blob),
                             ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("WebP: lossy VP8 payload undecodable (libwebp)")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy() \
            .reshape(h.value, w.value, 4)
    finally:
        lib.WebPFree(ctypes.cast(ptr, ctypes.c_void_p))
    return arr


def libwebp_encode_rgb(arr: np.ndarray, quality: float = 80.0) -> bytes:
    """RGB array → lossy WebP via the system libwebp (test fixtures for
    the real-VP8 decode path). Raises ValueError when absent."""
    import ctypes

    lib = _libwebp()
    if lib is None or not hasattr(lib, "WebPEncodeRGB"):
        raise ValueError("WebP: libwebp not available for encoding")
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
    h, w = arr.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(np.ascontiguousarray(arr).tobytes(),
                             w, h, w * 3, quality, ctypes.byref(out))
    if not size:
        raise ValueError("WebP: libwebp encode failed")
    try:
        return bytes(np.ctypeslib.as_array(out, shape=(size,)))
    finally:
        lib.WebPFree(ctypes.cast(out, ctypes.c_void_p))
