"""G.711 μ-law / A-law audio codec (ITU-T G.711, public spec).

The two telephony companding laws are closed-form per-byte transforms,
which makes them the strongest oracle story in the media family: the
DuckDB twin replays the decode formula NATIVELY in per-row arithmetic
(no recursion, no transcription of the NumPy decoder's shape).

Decode follows the canonical public-domain reference (Sun g711.c, the
implementation the ITU spec tables linearize to 16-bit scale):

- μ-law: ``u = ~code``; ``t = ((u & 0xF) << 3 | +0x84) << seg`` with
  ``seg = (u >> 4) & 7``; sample = ``0x84 - t`` when the sign bit of
  ``u`` is set, else ``t - 0x84``.  Range ±32124.
- A-law: ``a = code ^ 0x55``; ``t = (a & 0xF) << 4``; segment 0 adds
  8, segments >= 1 add 0x108 then shift by ``seg - 1``; the sign bit
  of ``a`` SET means positive.  Range ±32256.

The encoders are exact nearest-codeword quantizers over the 256
decode levels (``searchsorted`` on the sorted level table) — optimal
by construction, so ``decode(encode(x))`` is the closest representable
level to ``x`` and codec-level round-trips are the identity.

WAV container: format tags 7 (μ-law) and 6 (A-law), 8 bits/sample,
dispatched by :func:`multimodal.decode_wav`.
"""

from __future__ import annotations

import struct

import numpy as np

G711_RATE = 8000


def _mulaw_level(code: int) -> int:
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_level(code: int) -> int:
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    if seg == 0:
        t += 8
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


#: 256-entry decode tables, int16 scale (μ-law ±32124, A-law ±32256).
MULAW_TABLE = np.array([_mulaw_level(c) for c in range(256)], dtype=np.int16)
ALAW_TABLE = np.array([_alaw_level(c) for c in range(256)], dtype=np.int16)


def decode_g711(codes: bytes | np.ndarray, law: str) -> np.ndarray:
    """Codewords -> int16 samples via the law's 256-level table."""
    table = MULAW_TABLE if law == "mulaw" else ALAW_TABLE
    idx = np.frombuffer(bytes(codes), dtype=np.uint8)
    return table[idx]


def _nearest_encoder(table: np.ndarray):
    order = np.argsort(table, kind="stable")
    levels = table[order].astype(np.int32)
    # floor midpoints: searchsorted-left sends an exact level to its
    # own slot and a half-way sample to the nearer (lower on tie) one
    mids = (levels[:-1] + levels[1:]) // 2
    return order, levels, mids


_MULAW_ENC = _nearest_encoder(MULAW_TABLE)
_ALAW_ENC = _nearest_encoder(ALAW_TABLE)


def encode_g711(samples: np.ndarray, law: str) -> bytes:
    """int16 samples -> codewords, exact nearest-level quantization."""
    order, levels, mids = _MULAW_ENC if law == "mulaw" else _ALAW_ENC
    s = np.asarray(samples, dtype=np.int32)
    slot = np.searchsorted(mids, s, side="left")
    return order[slot].astype(np.uint8).tobytes()


def encode_wav_g711(codewords: bytes, law: str) -> bytes:
    """RIFF/WAVE mono 8 kHz container whose 8-bit data bytes ARE the
    given G.711 codewords (format tag 7 = μ-law, 6 = A-law)."""
    tag = 7 if law == "mulaw" else 6
    data = bytes(codewords)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, tag, 1, G711_RATE, G711_RATE, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data
