"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) codec — pure NumPy.

Closes the last honest entropy-codec rejection in
:mod:`datapipe.multimodal` (the container ships no Pillow): a real
sequential-baseline encoder/decoder for 8-bit GRAYSCALE images —
canonical Huffman entropy coding (Annex K tables), zigzag run-length
AC coding, DPCM DC, byte stuffing, dequantize + float64 2-D IDCT.
Everything here is the public byte format from the spec; no reference
code involved (the reference app delegates images to Pillow).

Scope (documented, enforced): baseline DCT, one 8-bit component,
no chroma subsampling, no restart intervals, no progressive scans.
Color/progressive variants raise ``NotImplementedError`` with the
exact unsupported feature named.

Determinism note for the oracle story: JPEG is lossy, but the engine's
synthesized media uses CONSTANT 8x8 blocks with an all-ones quant
table — a constant block's DCT is DC-only (DC = 8*(v-128), an exact
multiple of 8; every AC sum cancels below the rounding threshold), so
decode(encode(img)) is bit-exact and DuckDB can recompute every decoded
statistic from the payload construction without touching a blob.  The
general path (arbitrary pixels, arbitrary quant table) is exercised by
round-trip-within-quantization-error tests.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ #
# constants (spec Annex K — public tables)
# ------------------------------------------------------------------ #

ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.3.1 — luminance DC: BITS (codes per length 1..16), HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

#: Annex K.3.2 — luminance AC
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

#: all-ones quantization table — the exact-round-trip configuration the
#: synthesized media uses (see module docstring); callers may pass any.
QUANT_ONES = np.ones(64, dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix C: S = C @ s @ C.T."""
    k = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    c = np.cos((2 * x + 1) * k * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(DC_BITS, DC_VALS)
_AC_ENC = _canonical_codes(AC_BITS, AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec F.1.2.3
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def encode_jpeg_gray(pixels: np.ndarray, quant: np.ndarray = QUANT_ONES) -> bytes:
    """Sequential-baseline JFIF bytes for an (h, w) uint8 grayscale
    image whose dimensions are multiples of 8.  ``quant`` is the
    64-entry luminance table in NATURAL (row-major) order."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray needs multiple-of-8 dims")
    qn = np.asarray(quant, dtype=np.int64).reshape(64)
    qzz = qn[ZIGZAG]  # table as stored in DQT (zigzag order)

    out = bytearray(b"\xff\xd8")                      # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"      # APP0
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes(int(v) & 0xFF for v in qzz)           # DQT id 0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) \
        + b"\x01\x11\x00"                             # SOF0, 1 comp, 1x1
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(DC_VALS)) \
        + b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)   # DHT DC 0
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(AC_VALS)) \
        + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)   # DHT AC 0
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00" \
        + b"\x00\x3f\x00"                             # SOS

    # forward DCT + quantize for ALL blocks in one einsum (the per-block
    # Python loop below only does entropy coding over the int arrays):
    # orthonormal C gives exactly the spec scaling:
    # (C s C^T)[0,0] = sum(s)/8 = 8*mean(s)  (A.3.3)
    bh, bw_ = h // 8, w // 8
    blocks = (
        px.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8).astype(np.float64) - 128.0
    )
    coef = np.einsum("ij,bjk,lk->bil", _C, blocks, _C)
    qblk = np.round(coef / qn.reshape(8, 8)).astype(np.int64)
    zzall = qblk.reshape(-1, 64)[:, ZIGZAG]

    bw = _BitWriter()
    prev_dc = 0
    for zz in zzall:
        # DC (DPCM)
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        t = _category(diff)
        code, ln = _DC_ENC[t]
        bw.put(code, ln)
        if t:
            bw.put(_amplitude_bits(diff, t), t)
        # AC run-length over the nonzero positions only
        nz = np.nonzero(zz[1:])[0] + 1
        prev_k = 0
        for k in nz:
            run = int(k) - prev_k - 1
            prev_k = int(k)
            while run > 15:
                c, l = _AC_ENC[0xF0]            # ZRL
                bw.put(c, l)
                run -= 16
            v = int(zz[k])
            t = _category(v)
            c, l = _AC_ENC[run * 16 + t]
            bw.put(c, l)
            bw.put(_amplitude_bits(v, t), t)
        if prev_k != 63:
            c, l = _AC_ENC[0x00]                # EOB
            bw.put(c, l)
    out += bw.flush()
    out += b"\xff\xd9"                          # EOI
    return bytes(out)


# ------------------------------------------------------------------ #
# decoder
# ------------------------------------------------------------------ #


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1           # stuffed byte
                else:
                    # marker — treat as end of entropy data (pad zeros)
                    self.pos = len(self.data)
                    b = 0
            self.acc = (self.acc << 8) | b
            self.n += 8

    def peek16(self) -> int:
        self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        return v


def _decode_tables(bits: list[int], vals: list[int]):
    """16-bit lookup table (sym, length) — one array index per decoded
    symbol instead of a per-length canonical probe.  Every word whose
    leading bits match a code of length L maps to that code's symbol."""
    key = (bytes(bits), bytes(vals))
    hit = _LUT_MEMO.get(key)
    if hit is not None:
        return hit
    codes = _canonical_codes(bits, vals)
    sym_lut = np.full(1 << 16, -1, dtype=np.int16)
    len_lut = np.zeros(1 << 16, dtype=np.uint8)
    for sym, (code, ln) in codes.items():
        lo = code << (16 - ln)
        hi = lo + (1 << (16 - ln))
        sym_lut[lo:hi] = sym
        len_lut[lo:hi] = ln
    if len(_LUT_MEMO) < 64:     # bounded: tables repeat across images
        _LUT_MEMO[key] = (sym_lut, len_lut)
    return sym_lut, len_lut


_LUT_MEMO: dict[tuple[bytes, bytes], tuple[np.ndarray, np.ndarray]] = {}


def _huff_decode(br: _BitReader, table) -> int:
    sym_lut, len_lut = table
    word = br.peek16()
    sym = int(sym_lut[word])
    if sym < 0:
        raise ValueError("invalid Huffman code in entropy stream")
    br.skip(int(len_lut[word]))
    return sym


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_gray(blob: bytes) -> np.ndarray:
    """Decode sequential-baseline single-component JPEG bytes to an
    (h, w) uint8 array.  Progressive scans, multi-component color,
    subsampling and restart intervals raise ``NotImplementedError``
    naming the feature."""
    data = bytes(blob)
    if data[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                quant[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: only sequential baseline (SOF0) is implemented"
            )
        elif marker == 0xC0:                     # SOF0
            _prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if nf != 1:
                raise NotImplementedError(
                    "JPEG: only single-component (grayscale) baseline"
                )
            # per-component: id, H/V sampling nibbles, quant-table id
            if body[7] != 0x11:
                raise NotImplementedError("JPEG: subsampling unsupported")
            comp_tq = body[8]
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _decode_tables(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:
            raise NotImplementedError("JPEG: restart intervals unsupported")
        elif marker == 0xDA:                     # SOS
            td, ta = body[2] >> 4, body[2] & 0xF
            scan_start = pos
            break
        # APPn/COM: skipped
    if h is None or scan_start is None:
        raise ValueError("JPEG missing SOF0/SOS")
    q = quant[comp_tq].astype(np.float64)
    dc_tbl, ac_tbl = huff[(0, td)], huff[(1, ta)]
    br = _BitReader(data[scan_start:])
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    nblk = bh * bw_
    # entropy decode (inherently sequential) into one coefficient
    # matrix, then dequantize + IDCT every block in a single einsum
    zzall = np.zeros((nblk, 64), dtype=np.float64)
    prev_dc = 0
    for b in range(nblk):
        zz = zzall[b]
        t = _huff_decode(br, dc_tbl)
        diff = _extend(br.take(t), t) if t else 0
        prev_dc += diff
        zz[0] = prev_dc
        k = 1
        while k < 64:
            sym = _huff_decode(br, ac_tbl)
            if sym == 0x00:                      # EOB
                break
            if sym == 0xF0:                      # ZRL
                k += 16
                continue
            run, t = sym >> 4, sym & 0xF
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(br.take(t), t)
            k += 1
    coef = np.zeros((nblk, 64), dtype=np.float64)
    coef[:, ZIGZAG] = zzall
    coef = coef.reshape(nblk, 8, 8) * q
    s = np.einsum("ji,bjk,kl->bil", _C, coef, _C) + 128.0
    blocks = np.clip(np.round(s), 0, 255).astype(np.uint8)
    out = (
        blocks.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3)
        .reshape(bh * 8, bw_ * 8)
    )
    return out[:h, :w]
