"""IMA (DVI4) ADPCM codec — pure NumPy/int, public byte format.

The classic 4-bit adaptive-differential PCM (IMA ADPCM, WAV format tag
0x11; spec: IMA Digital Audio Focus Group 1992, public) — each nibble
encodes a quantized delta against an adaptive predictor + step-size
state machine.  Everything here is integer arithmetic from the
published tables, so decode is bit-deterministic and a DuckDB
recursive CTE can replay the state machine sample-for-sample (the
`media_adpcm_stats` oracle).

Implemented: mono, single-block streams (header carries the initial
predictor + step index; the header predictor is emitted as sample 0).
Stereo interleaving and multi-block framing raise with the feature
named.
"""

from __future__ import annotations

import struct

import numpy as np

#: step-size table (89 entries) — IMA spec, public
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]

#: index-adjust table keyed by nibble & 7 — IMA spec, public
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp(v: int, lo: int, hi: int) -> int:
    return lo if v < lo else hi if v > hi else v


def decode_nibbles(
    nibbles, predictor: int = 0, index: int = 0
) -> np.ndarray:
    """Decode a nibble sequence to int16 samples — the published IMA
    update rule; sample 0 is the initial predictor (block-header
    semantics)."""
    out = [predictor]
    for n in nibbles:
        step = STEP_TABLE[index]
        delta = step >> 3
        if n & 4:
            delta += step
        if n & 2:
            delta += step >> 1
        if n & 1:
            delta += step >> 2
        predictor = _clamp(
            predictor - delta if n & 8 else predictor + delta,
            -32768, 32767,
        )
        index = _clamp(index + INDEX_TABLE[n & 7], 0, 88)
        out.append(predictor)
    return np.asarray(out, dtype=np.int16)


def encode_samples(samples) -> tuple[bytes, int, int]:
    """REAL IMA encoder: quantize int16 samples into nibbles against
    the same adaptive state machine.  Returns (nibble_bytes, initial
    predictor, initial index); sample 0 seeds the predictor, the rest
    become one nibble each (even count padded with a zero nibble)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.size == 0:
        return b"", 0, 0
    predictor = int(s[0])
    index = 0
    nibbles = []
    for target in s[1:]:
        step = STEP_TABLE[index]
        diff = int(target) - predictor
        n = 0
        if diff < 0:
            n = 8
            diff = -diff
        if diff >= step:
            n |= 4
            diff -= step
        if diff >= step >> 1:
            n |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            n |= 1
        # replay the decoder update so encoder state tracks decoder
        delta = step >> 3
        if n & 4:
            delta += step
        if n & 2:
            delta += step >> 1
        if n & 1:
            delta += step >> 2
        predictor = _clamp(
            predictor - delta if n & 8 else predictor + delta,
            -32768, 32767,
        )
        index = _clamp(index + INDEX_TABLE[n & 7], 0, 88)
        nibbles.append(n)
    if len(nibbles) % 2:
        nibbles.append(0)
    packed = bytes(
        (nibbles[i] & 0xF) | ((nibbles[i + 1] & 0xF) << 4)
        for i in range(0, len(nibbles), 2)
    )
    return packed, int(s[0]), 0


def nibbles_of(data: bytes):
    """Low nibble first, then high — the IMA-in-WAV packing order."""
    for b in bytes(data):
        yield b & 0xF
        yield b >> 4


def encode_wav_adpcm(
    nibble_bytes: bytes,
    predictor: int = 0,
    index: int = 0,
    sample_rate: int = 8000,
) -> bytes:
    """RIFF/WAVE container, fmt tag 0x11 (IMA ADPCM), mono, one block:
    4-byte block header (predictor int16 LE, step index, pad) + packed
    nibbles."""
    block = struct.pack("<hBB", predictor, index, 0) + bytes(nibble_bytes)
    n_samples = 1 + 2 * len(nibble_bytes)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 52 + len(block))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHHHH",
            20, 0x11, 1, sample_rate, sample_rate // 2,
            len(block), 4, 2, n_samples,
        )
        + b"fact" + struct.pack("<II", 4, n_samples)
        + b"data" + struct.pack("<I", len(block))
    )
    return hdr + block


def decode_wav_adpcm(fmt, data: bytes) -> np.ndarray:
    """Decode the data chunk of a fmt-0x11 WAV (mono, single block)."""
    channels = fmt[1]
    if channels != 1:
        raise NotImplementedError(
            "IMA ADPCM: stereo nibble interleave unsupported"
        )
    predictor, index, _pad = struct.unpack_from("<hBB", data, 0)
    return decode_nibbles(nibbles_of(data[4:]), predictor, index)
