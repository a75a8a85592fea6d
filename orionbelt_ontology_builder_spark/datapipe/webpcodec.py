"""WebP lossless (VP8L) codec — pure NumPy + a real prefix-code
entropy coder with LZ77 backward references.

Closes the WEBP entry in the honest-rejection list (the container
ships no Pillow/libwebp): a from-scratch implementation of the public
VP8L byte format (WebP Lossless Bitstream Specification; RIFF
container per the WebP Container Specification).  The encoder is a
REAL entropy coder — per-channel symbol histograms, length-limited
canonical prefix codes (package-merge, depth <= 15), DEFLATE-style
code-length-coded storage, greedy longest-match LZ77 with the spec's
(2 + parity) << extra prefix bucketing for lengths and distances, and
the one/two-symbol "simple code" path for degenerate channels (a
constant alpha plane costs 0 bits/pixel).  The decoder implements the
general read path: simple and code-length-coded prefix codes
(including the 16/17/18 repeat ops with the spec's default-8 previous
length), LZ77 copies, and the color cache (hash 0x1e35a7bd).

Scope (documented, enforced): no transforms (predictor / color /
subtract-green / color-indexing — the transform-present bit raises),
one prefix-code group (the meta-prefix bit raises), and only direct
distance codes (> 120); the 120 near-pixel plane codes raise.  The
encoder emits none of these, so decode(encode(x)) is the identity —
VP8L is lossless, and round-trip tests on random and structured
images exercise both halves.  No reference decoder ships in this
container, so cross-implementation validation is not possible here;
bit-level conventions follow DEFLATE (LSB-first bit packing, prefix
codes written most-significant-bit first, canonical assignment by
(length, symbol) order), which is the convention the public zlib-
derived VP8L table builder reads.
"""

from __future__ import annotations

import struct

import numpy as np

#: DEFLATE-style storage order of the code-length-code lengths.
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

_NUM_LITERAL = 256        #: literal green / red / blue / alpha symbols
_NUM_LENGTH = 24          #: LZ77 length prefix symbols in the green code
_NUM_DISTANCE = 40        #: distance prefix symbols
_CACHE_MUL = 0x1E35A7BD   #: color-cache hash multiplier (spec constant)


# ------------------------------------------------------------------ #
# bit I/O — LSB-first within bytes; prefix codes MSB-of-code first
# ------------------------------------------------------------------ #


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, width: int) -> None:
        """Write ``width`` bits of ``value``, LSB first (plain fields)."""
        self.acc |= (value & ((1 << width) - 1)) << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, code: int, length: int) -> None:
        """Write a canonical prefix code, most-significant bit first."""
        for i in range(length - 1, -1, -1):
            self.bits((code >> i) & 1, 1)

    def done(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.limit = len(data) * 8

    def bits(self, width: int) -> int:
        if self.pos + width > self.limit:
            raise ValueError("VP8L bitstream truncated")
        byte0 = self.pos >> 3
        span = ((self.pos & 7) + width + 7) // 8
        val = int.from_bytes(self.data[byte0 : byte0 + span], "little")
        out = (val >> (self.pos & 7)) & ((1 << width) - 1)
        self.pos += width
        return out


# ------------------------------------------------------------------ #
# canonical prefix codes
# ------------------------------------------------------------------ #


def limited_code_lengths(freqs: list[int], limit: int) -> list[int]:
    """Length-limited prefix-code lengths via package-merge.

    Returns one length per symbol (0 = unused).  Exact optimal lengths
    under the depth limit; handles the 0/1-symbol degenerate cases the
    callers special-case into VP8L "simple" codes anyway."""
    alive = [i for i, f in enumerate(freqs) if f > 0]
    n = len(alive)
    lengths = [0] * len(freqs)
    if n == 0:
        return lengths
    if n == 1:
        lengths[alive[0]] = 1
        return lengths
    if (1 << limit) < n:
        raise ValueError("alphabet too large for depth limit")
    # package-merge: L-1 package/merge rounds over (weight, symbols)
    # coin lists, then the 2n-2 cheapest items of the last round; each
    # symbol's occurrence count across those items is its code length.
    items = sorted((freqs[i], (i,)) for i in alive)
    lst = items
    for _ in range(limit - 1):
        packaged = [
            (lst[i][0] + lst[i + 1][0], lst[i][1] + lst[i + 1][1])
            for i in range(0, len(lst) - 1, 2)
        ]
        lst = sorted(items + packaged)
    counts = [0] * len(freqs)
    for _, syms in lst[: 2 * (n - 1)]:
        for s in syms:
            counts[s] += 1
    for i in alive:
        lengths[i] = counts[i]
    return lengths


def canonical_codes(lengths: list[int]) -> list[int]:
    """DEFLATE canonical code assignment: codes ordered by (length,
    symbol); returns one code per symbol (valid where length > 0)."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    codes = [0] * len(lengths)
    for sym, ln in enumerate(lengths):
        if ln:
            codes[sym] = next_code[ln]
            next_code[ln] += 1
    return codes


class _PrefixDecoder:
    """Bit-at-a-time canonical decoder: map (length, code) -> symbol."""

    def __init__(self, lengths: list[int]) -> None:
        self.single: int | None = None
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            self.single = used[0][1]
            return
        codes = canonical_codes(lengths)
        self.map = {
            (ln, codes[sym]): sym for sym, ln in enumerate(lengths) if ln
        }
        self.max_len = max(ln for ln, _ in used)

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.bits(1)
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


# ------------------------------------------------------------------ #
# prefix-code (de)serialization in the bitstream
# ------------------------------------------------------------------ #


def _write_prefix_code(bw: _BitWriter, freqs: list[int]) -> tuple[list[int], list[int]]:
    """Serialize a prefix code for ``freqs``; returns (lengths, codes).

    Uses the VP8L simple-code path for <= 2 distinct symbols, else the
    code-length-coded path (literal lengths only — the encoder never
    needs the 16/17/18 repeats; the decoder accepts them)."""
    used = [i for i, f in enumerate(freqs) if f > 0]
    if len(used) <= 2 and (not used or max(used) < 256):
        bw.bits(1, 1)  # simple code
        syms = used if used else [0]
        bw.bits(len(syms) - 1, 1)
        if syms[0] >= 2:
            bw.bits(1, 1)           # first symbol in 8 bits
            bw.bits(syms[0], 8)
        else:
            bw.bits(0, 1)           # first symbol in 1 bit
            bw.bits(syms[0], 1)
        if len(syms) == 2:
            bw.bits(syms[1], 8)
        if len(syms) == 1:
            lengths = [0] * len(freqs)
            lengths[syms[0]] = 1    # marker; decoder emits 0 bits
            return lengths, canonical_codes(lengths)
        lengths = [0] * len(freqs)
        for s in syms:
            lengths[s] = 1
        return lengths, canonical_codes(lengths)

    bw.bits(0, 1)  # code-length-coded
    lengths = limited_code_lengths(freqs, 15)
    # histogram of code lengths 0..15 -> code-length code (19 symbols)
    cl_freqs = [0] * 19
    for ln in lengths:
        cl_freqs[ln] += 1
    cl_lengths = limited_code_lengths(cl_freqs, 7)
    bw.bits(19 - 4, 4)  # num_code_lengths = 19: every order slot
    for sym in CODE_LENGTH_ORDER:
        bw.bits(cl_lengths[sym], 3)
    cl_codes = canonical_codes(cl_lengths)
    bw.bits(0, 1)  # no explicit max_symbol
    single_cl = sum(1 for f in cl_freqs if f) == 1
    for ln in lengths:
        if not single_cl:  # a single-symbol CL code reads 0 bits/slot
            bw.code(cl_codes[ln], cl_lengths[ln])
    return lengths, canonical_codes(lengths)


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.bits(1):  # simple
        num_symbols = br.bits(1) + 1
        if br.bits(1):
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        lengths = [0] * alphabet_size
        lengths[sym0] = 1
        if num_symbols == 2:
            lengths[br.bits(8)] = 1
        return _PrefixDecoder(lengths)
    num_code_lengths = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.bits(3)
    cl = _PrefixDecoder(cl_lengths)
    if br.bits(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8  # spec default when no non-zero length seen yet
    sym = 0
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        code_len = cl.read(br)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            for _ in range(3 + br.bits(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif code_len == 17:
            sym += 3 + br.bits(3)
        else:  # 18
            sym += 11 + br.bits(7)
    return _PrefixDecoder(lengths)


# ------------------------------------------------------------------ #
# LZ77 prefix bucketing: value v>=1 <-> (code, extra_bits, extra)
# ------------------------------------------------------------------ #


def _prefix_encode(v: int) -> tuple[int, int, int]:
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    nbits = x.bit_length() - 1          # highest set bit
    parity = (x >> (nbits - 1)) & 1     # bit below it
    code = 2 * nbits + parity
    offset = (2 + parity) << (nbits - 1)
    return code, nbits - 1, x - offset


def _prefix_decode(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.bits(extra_bits) + 1


# ------------------------------------------------------------------ #
# encode
# ------------------------------------------------------------------ #


def _lz77_tokens(px: np.ndarray, min_match: int = 3, window: int = 1024):
    """Greedy longest-match LZ77 over the row-major ARGB pixel array.

    Yields ('lit', argb) and ('copy', length, distance) tokens.
    Candidate starts come from an occurrence index on the pixel value;
    overlapping matches (distance < length) are found and emitted —
    they are legal VP8L and the decoder's one-pixel-at-a-time copy
    reproduces them.  Distances stay within ``window`` so the direct
    (> 120) distance-code path always applies.
    """
    n = len(px)
    occ: dict[int, list[int]] = {}

    def note(j: int) -> None:
        occ.setdefault(int(px[j]), []).append(j)

    i = 0
    while i < n:
        best_len = 0
        best_dist = 0
        maxl = min(n - i, 4096)
        for j in reversed(occ.get(int(px[i]), [])):
            if i - j > window:
                break
            length = 0
            while length < maxl and px[j + length] == px[i + length]:
                length += 1
            if length > best_len:
                best_len = length
                best_dist = i - j
                if best_len >= maxl:
                    break
        if best_len >= min_match:
            yield ("copy", best_len, best_dist)
            for k in range(best_len):
                note(i + k)
            i += best_len
        else:
            yield ("lit", int(px[i]))
            note(i)
            i += 1


def encode_webp_lossless(argb: np.ndarray) -> bytes:
    """Encode an (h, w, 4) uint8 ARGB array as a lossless WebP file
    (RIFF/WEBP/VP8L) — real prefix codes + LZ77, no transforms."""
    arr = np.asarray(argb, dtype=np.uint8)
    h, w, c = arr.shape
    if c != 4:
        raise ValueError("encode_webp_lossless wants (h, w, 4) ARGB")
    packed = (
        (arr[:, :, 0].astype(np.uint32) << 24)
        | (arr[:, :, 1].astype(np.uint32) << 16)
        | (arr[:, :, 2].astype(np.uint32) << 8)
        | arr[:, :, 3].astype(np.uint32)
    ).reshape(-1)

    tokens = list(_lz77_tokens(packed))

    g_freq = [0] * (_NUM_LITERAL + _NUM_LENGTH)
    r_freq = [0] * _NUM_LITERAL
    b_freq = [0] * _NUM_LITERAL
    a_freq = [0] * _NUM_LITERAL
    d_freq = [0] * _NUM_DISTANCE
    for tok in tokens:
        if tok[0] == "lit":
            v = tok[1]
            g_freq[(v >> 8) & 0xFF] += 1
            r_freq[(v >> 16) & 0xFF] += 1
            b_freq[v & 0xFF] += 1
            a_freq[(v >> 24) & 0xFF] += 1
        else:
            _, length, dist = tok
            g_freq[_NUM_LITERAL + _prefix_encode(length)[0]] += 1
            d_freq[_prefix_encode(dist + 120)[0]] += 1

    bw = _BitWriter()
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bits(0, 1)  # alpha hint
    bw.bits(0, 3)  # version
    bw.bits(0, 1)  # no transforms
    bw.bits(0, 1)  # no color cache
    bw.bits(0, 1)  # no meta prefix codes — one group
    g_len, g_code = _write_prefix_code(bw, g_freq)
    r_len, r_code = _write_prefix_code(bw, r_freq)
    b_len, b_code = _write_prefix_code(bw, b_freq)
    a_len, a_code = _write_prefix_code(bw, a_freq)
    d_len, d_code = _write_prefix_code(bw, d_freq)

    def emit(lengths: list[int], codes: list[int], sym: int) -> None:
        if sum(1 for x in lengths if x) > 1:  # single-symbol: 0 bits
            bw.code(codes[sym], lengths[sym])

    for tok in tokens:
        if tok[0] == "lit":
            v = tok[1]
            emit(g_len, g_code, (v >> 8) & 0xFF)
            emit(r_len, r_code, (v >> 16) & 0xFF)
            emit(b_len, b_code, v & 0xFF)
            emit(a_len, a_code, (v >> 24) & 0xFF)
        else:
            _, length, dist = tok
            code, nbits, extra = _prefix_encode(length)
            emit(g_len, g_code, _NUM_LITERAL + code)
            if nbits:
                bw.bits(extra, nbits)
            code, nbits, extra = _prefix_encode(dist + 120)
            emit(d_len, d_code, code)
            if nbits:
                bw.bits(extra, nbits)

    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ------------------------------------------------------------------ #
# decode
# ------------------------------------------------------------------ #


def decode_webp(blob: bytes) -> np.ndarray:
    """Decode a lossless WebP (RIFF/WEBP/VP8L) to (h, w, 3) uint8 RGB.

    Subset per module docstring: transforms, meta prefix groups and
    plane distance codes raise ``NotImplementedError`` by name; lossy
    VP8 and extended VP8X files are rejected the same way."""
    data = bytes(blob)
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF) file")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if tag == b"VP8L":
            payload = data[pos + 8 : pos + 8 + size]
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy VP8 / extended VP8X WebP needs libwebp; only "
                "lossless VP8L decodes here"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("WebP file has no VP8L chunk")
    if payload[:1] != b"\x2f":
        raise ValueError("bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    if br.bits(1):
        raise NotImplementedError(
            "VP8L transforms (predictor/color/subtract-green/palette) "
            "are out of scope for this decoder"
        )
    cache_bits = 0
    cache = None
    if br.bits(1):
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad color-cache size")
        cache = [0] * (1 << cache_bits)
    if br.bits(1):
        raise NotImplementedError(
            "VP8L meta prefix groups are out of scope for this decoder"
        )
    cache_size = (1 << cache_bits) if cache_bits else 0
    green = _read_prefix_code(br, _NUM_LITERAL + _NUM_LENGTH + cache_size)
    red = _read_prefix_code(br, _NUM_LITERAL)
    blue = _read_prefix_code(br, _NUM_LITERAL)
    alpha = _read_prefix_code(br, _NUM_LITERAL)
    dist = _read_prefix_code(br, _NUM_DISTANCE)

    n = w * h
    px = np.zeros(n, dtype=np.uint32)
    i = 0

    def cache_insert(v: int) -> None:
        if cache is not None:
            cache[((_CACHE_MUL * v) & 0xFFFFFFFF) >> (32 - cache_bits)] = v

    while i < n:
        s = green.read(br)
        if s < _NUM_LITERAL:
            g = s
            r = red.read(br)
            b = blue.read(br)
            a = alpha.read(br)
            v = (a << 24) | (r << 16) | (g << 8) | b
            px[i] = v
            cache_insert(v)
            i += 1
        elif s < _NUM_LITERAL + _NUM_LENGTH:
            length = _prefix_decode(s - _NUM_LITERAL, br)
            dcode = _prefix_decode(dist.read(br), br)
            if dcode <= 120:
                raise NotImplementedError(
                    "VP8L plane (near-pixel) distance codes are out of "
                    "scope for this decoder"
                )
            d = dcode - 120
            if d > i or i + length > n:
                raise ValueError("VP8L backward reference out of range")
            for k in range(length):  # overlapping copies are legal
                v = int(px[i - d + k])
                px[i + k] = v
                cache_insert(v)
            i += length
        else:
            if cache is None:
                raise ValueError("color-cache symbol without a cache")
            v = cache[s - _NUM_LITERAL - _NUM_LENGTH]
            px[i] = v
            cache_insert(v)
            i += 1

    out = np.empty((h, w, 3), dtype=np.uint8)
    flat = px.reshape(h, w)
    out[:, :, 0] = (flat >> 16) & 0xFF
    out[:, :, 1] = (flat >> 8) & 0xFF
    out[:, :, 2] = flat & 0xFF
    return out


def encode_webp_gray(pixels: np.ndarray) -> bytes:
    """Lossless-WebP bytes for an (h, w) uint8 grayscale image (ARGB
    with r = g = b = value, opaque alpha) — the synthesis entry point,
    mirroring :func:`gifcodec.encode_gif_gray`."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    argb = np.empty((h, w, 4), dtype=np.uint8)
    argb[:, :, 0] = 255
    argb[:, :, 1] = px
    argb[:, :, 2] = px
    argb[:, :, 3] = px
    return encode_webp_lossless(argb)
