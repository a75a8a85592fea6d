"""GIF89a codec — pure NumPy + a real LZW entropy coder.

Closes the GIF entry in the honest-rejection list (the container ships
no Pillow): a from-the-spec implementation of the public byte format
(GIF89a specification, CompuServe 1990 / W3C note) — logical screen
descriptor, color tables, sub-block framing, and variable-width
LSB-first LZW with clear/end codes, dictionary growth and the 12-bit
cap.  The encoder is a REAL LZW compressor (longest-match dictionary,
emits grow-width codes, resets at 4096), not the fixed-width
"uncompressed GIF" trick; the decoder handles deferred clears and
arbitrary code-width growth, and is exercised against the encoder by
round-trip tests on random and structured images.

Scope (documented, enforced): 8-bit single-frame images, no
interlacing, no transparency compositing (extensions are skipped via
the sub-block grammar); animations decode their FIRST image
descriptor.  GIF is lossless, so decode(encode(x)) is bit-exact —
the oracle story needs no constant-block trick (unlike JPEG).
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------------ #
# LZW (GIF variant: LSB-first bit packing, variable width 3..12 bits)
# ------------------------------------------------------------------ #


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Compress ``data`` (symbols < 2**min_code_size) into the GIF LZW
    bitstream: CLEAR, longest-match codes with width growth, CLEAR on
    dictionary overflow at 4096, END."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    width = min_code_size + 1
    put(clear, width)
    seq = b""
    for b in bytes(data):
        cand = seq + bytes([b])
        if cand in table:
            seq = cand
            continue
        put(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code >= 4096:
            put(clear, width)
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        seq = bytes([b])
    if seq:
        put(table[seq], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Inverse of :func:`lzw_encode`; also accepts streams from other
    encoders (deferred clears, the KwKwK first-use case)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()

    pos = 0  # bit position
    nbits_total = len(data) * 8

    def get(width: int) -> int | None:
        nonlocal pos
        if pos + width > nbits_total:
            return None
        byte0 = pos >> 3
        val = int.from_bytes(
            data[byte0 : byte0 + ((pos & 7) + width + 7) // 8 + 1],
            "little",
        )
        code = (val >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        return code

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = get(width)
        if code is None or code == end:
            break
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("corrupt LZW stream: code out of range")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out)


# ------------------------------------------------------------------ #
# container
# ------------------------------------------------------------------ #


def encode_gif_gray(pixels: np.ndarray) -> bytes:
    """Single-frame GIF89a bytes for an (h, w) uint8 image with the
    identity grayscale palette (index i -> (i, i, i))."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8 bpp, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):  # identity gray palette
        out += bytes([i, i, i])
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image desc
    out.append(8)  # LZW minimum code size
    stream = lzw_encode(px.tobytes(), 8)
    for i in range(0, len(stream), 255):  # sub-block framing
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(blob: bytes) -> np.ndarray:
    """Decode GIF87a/89a bytes to an (h, w, 3) uint8 RGB array (first
    image descriptor; interlace rejected; extensions skipped)."""
    data = bytes(blob)
    if data[:4] != b"GIF8":
        raise ValueError("bad GIF signature")
    if len(data) < 14:
        raise ValueError("GIF header truncated")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise ValueError("GIF image without a color table")
        min_code = data[pos]
        pos += 1
        stream = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            stream += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            lzw_decode(bytes(stream), min_code)[: iw * ih], dtype=np.uint8
        )
        if idx.size != iw * ih:
            raise ValueError("GIF pixel data truncated")
        return table[idx.reshape(ih, iw)]
    raise ValueError("GIF contains no image descriptor")
