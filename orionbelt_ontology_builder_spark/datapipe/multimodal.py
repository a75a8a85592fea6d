"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are **opaque BINARY columns with typed metadata** — the only
representation that survives 100 TB: bytes stay columnar in Parquet, the
JVM never interprets them, and all decode / feature-extraction runs in
Arrow-batched ``mapInPandas`` stages (zero-copy-ish byte transfer, no
per-row Python).

The default decode path is REAL: a pure-NumPy codec for the
uncompressed public formats (binary PPM/PGM, 24-bpp BMP), PNG
(stdlib-zlib inflate + all five unfilters) and sequential-baseline
grayscale JPEG (:mod:`.jpegcodec`: Annex-K Huffman, zigzag RLE,
dequant, float64 IDCT), with encode/decode round-trip laws, driven by
``decode_image_stats`` / ``decode_jpeg_block_stats`` inside
``mapInPandas``.  GIF89a (LZW, :mod:`.gifcodec`) and lossless WebP
(VP8L prefix codes + LZ77, :mod:`.webpcodec`) also decode for real;
only the lossy VP8/WEBM and MP3 entropy coders raise
``NotImplementedError`` honestly.  A deterministic fake container
(``FAKEIMG0``) additionally
exercises the plumbing with DuckDB-recomputable features (md5 over the
same byte string).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HEADER = b"FAKEIMG0"  # 8-byte magic of the deterministic fake container
N_FRAMES = 4          # frame-sampling stub: fixed sample count

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", StructType([  # typed metadata + opaque bytes
            StructField("mime", StringType()),
            StructField("n_bytes", LongType()),
        ])),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("header_ok", IntegerType()),
        StructField("content_md5", StringType()),
    ]
)

FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """(doc_id, blob BINARY, mime, n_bytes): deterministic fake media.

    blob = HEADER || utf8(text) — a stand-in for stored image bytes,
    built JVM-side (encode/concat, no Python), so the binary column is
    a real Tungsten binary, not a Python artifact.
    """
    # NULL text reads as '' (matches the oracles' coalesce(text, ''))
    txt = F.coalesce(F.col("text"), F.lit(""))
    blob = F.concat(F.lit(HEADER), F.encode(txt, "utf-8")).alias("blob")
    return docs.select(
        "doc_id",
        blob,
        F.lit("image/x-fake").alias("mime"),
        (F.length(txt) + len(HEADER)).alias("n_bytes"),
    )


def encode_ppm(pixels) -> bytes:
    """Binary PPM (P6, maxval 255) encoder — pure NumPy, no codec
    libraries.  ``pixels`` is (h, w, 3) uint8."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("P6 PPM is RGB; got %d channels" % c)
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def encode_bmp(pixels) -> bytes:
    """Uncompressed 24-bpp Windows BMP encoder (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding, BGR byte order) — pure NumPy."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("24-bpp BMP is RGB; got %d channels" % c)
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = bytearray()
    bgr = px[:, :, ::-1]  # BMP stores BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].tobytes() + b"\x00" * pad
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + bytes(body)


def _decode_pnm(blob: bytes):
    """P6 (RGB) / P5 (gray) binary PNM decode: whitespace-separated
    header tokens (comments supported), then raw samples."""
    import numpy as np

    tokens: list[bytes] = []
    i = 2  # past magic
    while len(tokens) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":  # comment to end of line
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        tokens.append(blob[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError("only 8-bit PNM supported (maxval 255)")
    channels = 3 if blob[:2] == b"P6" else 1
    need = w * h * channels
    body = np.frombuffer(blob, dtype=np.uint8, count=need, offset=i)
    arr = body.reshape(h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def _decode_bmp(blob: bytes):
    """Uncompressed 24-bpp BITMAPINFOHEADER BMP decode (top-down or
    bottom-up), pure NumPy."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    w, h_signed = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bpp BMP supported")
    h = abs(h_signed)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = []
    for y in range(h):
        off = data_off + y * stride
        rows.append(
            np.frombuffer(blob, dtype=np.uint8, count=row_bytes, offset=off)
            .reshape(w, 3)[:, ::-1]  # BGR -> RGB
        )
    if h_signed > 0:  # bottom-up storage
        rows.reverse()
    return np.stack(rows)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels, row_filters: bool = True) -> bytes:
    """Minimal real PNG writer: 8-bit RGB, non-interlaced, zlib level 6.

    ``row_filters=True`` cycles scanline filters 0..4 (None / Sub / Up /
    Average / Paeth) so round-trip tests exercise every unfilter path;
    False writes all-None filters."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_png writes RGB; got %d channels" % c)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.uint8)
    for y in range(h):
        row = px[y]
        ft = (y % 5) if row_filters else 0
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            enc = row - left
        elif ft == 2:  # Up
            enc = row - prev
        elif ft == 3:  # Average
            upleft = np.zeros_like(prev)
            upleft[1:] = prev[:-1]
            enc = row - (
                (left.astype(np.uint16) + prev.astype(np.uint16)) // 2
            ).astype(np.uint8)
        else:  # Paeth
            upleft = np.zeros_like(prev)
            upleft[1:] = prev[:-1]
            enc = row - _paeth(left, prev, upleft)
        raw.append(ft)
        raw += enc.astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def _paeth(left, up, upleft):
    """Vectorized Paeth predictor (PNG spec section 9, public)."""
    import numpy as np

    a = left.astype(np.int16)
    b = up.astype(np.int16)
    c = upleft.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _decode_png(blob: bytes):
    """Pure stdlib-zlib + NumPy PNG decode: 8-bit, non-interlaced,
    color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA); all five scanline filters.  Alpha is dropped, gray and
    palette expand to RGB, so every container yields (h, w, 3) uint8
    like the other codecs."""
    import struct
    import zlib

    import numpy as np

    if blob[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (ln,) = struct.unpack_from(">I", blob, pos)
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            "PNG variant unsupported (need 8-bit, non-interlaced)"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError("bad PNG color type %d" % ctype)
    raw = zlib.decompress(bytes(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = line + prev
        else:
            rec = line
            if ft == 1:  # Sub: sequential in x
                for x in range(bpp, stride):
                    rec[x] = (int(rec[x]) + int(rec[x - bpp])) & 0xFF
            elif ft == 3:  # Average
                for x in range(stride):
                    left = rec[x - bpp] if x >= bpp else 0
                    rec[x] = (rec[x] + ((int(left) + int(prev[x])) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for x in range(stride):
                    a = int(rec[x - bpp]) if x >= bpp else 0
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (rec[x] + pred) & 0xFF
            else:
                raise ValueError("bad PNG filter %d" % ft)
        out[y] = rec
        prev = out[y]
    px = out.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if ctype == 6:
        return px[:, :, :3].copy()
    return px


def decode_image(blob: bytes):
    """Decode an image blob to an (h, w, 3) uint8 NumPy array.

    REAL paths: uncompressed PPM (P6) / PGM (P5) / 24-bpp BMP, PNG
    (stdlib zlib inflate + NumPy unfilter — 8-bit gray/RGB/palette/
    alpha, all five scanline filters), and sequential-baseline
    grayscale JPEG (:mod:`.jpegcodec` — Annex-K Huffman + dequant +
    float64 IDCT; gray replicates to RGB), GIF (real LZW,
    :mod:`.gifcodec`) and lossless WebP (VP8L prefix codes + LZ77,
    :mod:`.webpcodec`) — public byte formats, no codec libraries.
    Lossy VP8/VP8X WebP needs libwebp, which this container does not
    ship; it raises ``NotImplementedError`` honestly rather than
    faking pixels."""
    blob = bytes(blob)
    if blob[:2] in (b"P6", b"P5"):
        return _decode_pnm(blob)
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:8] == _PNG_SIG:
        return _decode_png(blob)
    if blob[:2] == b"\xff\xd8":
        import numpy as np

        from . import jpegcodec

        gray = jpegcodec.decode_jpeg_gray(blob)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if blob[:4] == b"GIF8":
        from . import gifcodec

        return gifcodec.decode_gif(blob)
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":
        from . import webpcodec

        return webpcodec.decode_webp(blob)
    raise ValueError("unrecognized image container")


def extract_features(media: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, header_ok, content_md5) via mapInPandas.

    One Arrow batch in, one out — the feature-extraction shape a real
    CLIP/whisper embedder would use (bytes -> model -> vector); here the
    'model' is the md5 stub.  Runs on whatever partitioning the media
    table has; no shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "header_ok": blobs.map(
                        lambda b: int(bytes(b[: len(HEADER)]) == HEADER)
                    ).astype("int32"),
                    "content_md5": blobs.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.select("doc_id", "blob").mapInPandas(
        batches, FEATURES_SCHEMA
    ).orderBy("doc_id")


def extract_features_oracle() -> str:
    """DuckDB twin: recompute features from text (blob is
    HEADER || utf8(text) and text is ASCII in the corpus, so string md5
    == byte md5)."""
    h = HEADER.decode()
    return f"""
SELECT doc_id,
  len(coalesce(text, '')) + {len(HEADER)} AS n_bytes,
  1 AS header_ok,
  md5('{h}' || coalesce(text, '')) AS content_md5
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------------ #
# audio: RIFF/WAVE PCM codec (pure struct/NumPy — public byte format)
# ------------------------------------------------------------------ #

WAV_RATE = 8000      # synthesized fixture sample rate
WAV_N_BYTES = 64     # 4 chained md5 digests -> 32 int16 mono samples

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("s_min", IntegerType()),
        StructField("s_max", IntegerType()),
        StructField("s_sum", LongType()),
        StructField("pcm_md5", StringType()),
    ]
)


def encode_wav(samples, sample_rate: int = WAV_RATE) -> bytes:
    """Canonical 44-byte-header RIFF/WAVE, 16-bit PCM.  ``samples`` is
    (n,) int16 mono or (n, channels) int16."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    channels = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate,
            channels * 2, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(blob: bytes):
    """Decode RIFF/WAVE 16-bit PCM -> (samples int16 ndarray of shape
    (n,) or (n, channels), sample_rate).  Walks chunks properly, so
    files with extra chunks (LIST/fact) decode too; compressed formats
    raise."""
    import struct

    import numpy as np

    blob = bytes(blob)
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate = fmt[0], fmt[1], fmt[2]
    bits = fmt[5]
    if audio_format == 0x11:
        from . import adpcmcodec

        return adpcmcodec.decode_wav_adpcm(fmt, data), rate
    if audio_format in (6, 7):  # G.711 A-law / μ-law, 8 bits/sample
        from . import g711codec

        s = g711codec.decode_g711(data, "mulaw" if audio_format == 7 else "alaw")
        if channels > 1:
            s = s.reshape(-1, channels)
        return s, rate
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            "only 16-bit PCM, IMA-ADPCM (0x11) and G.711 (6/7) WAV "
            "supported"
        )
    s = np.frombuffer(data, dtype="<i2")
    if channels > 1:
        s = s.reshape(-1, channels)
    return s, rate


def synthesize_wav_media(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): REAL RIFF/WAVE PCM blobs built JVM-side — the
    44-byte canonical header (fixed: payload size is constant) plus
    ``unhex`` of 4 chained md5 digests of the text = 32 little-endian
    int16 mono samples at 8 kHz.  Deterministic and arithmetic-only,
    so DuckDB recomputes every decoded statistic from the hex
    construction without touching a blob."""
    import struct

    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + WAV_N_BYTES)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
        + b"data"
        + struct.pack("<I", WAV_N_BYTES)
    )
    hs = [F.md5(F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8"))]
    for _ in range(3):
        hs.append(F.md5(F.encode(hs[-1], "utf-8")))
    return docs.select(
        "doc_id",
        F.concat(F.lit(hdr), F.unhex(F.concat(*hs))).alias("blob"),
    )


def decode_audio(blob: bytes):
    """Container dispatch: FLAC (``fLaC`` magic, :mod:`.flaccodec`) or
    RIFF/WAVE (PCM / IMA-ADPCM / G.711) -> (samples, rate)."""
    blob = bytes(blob)
    if blob[:4] == b"fLaC":
        from . import flaccodec

        return flaccodec.decode_flac(blob)
    return decode_wav(blob)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """(doc_id, sample_rate, n_channels, n_samples, s_min, s_max,
    s_sum, pcm_md5): REAL audio decode (WAV or FLAC) inside
    mapInPandas, then integer per-clip statistics (bit-stable across
    engines) — the shape a whisper-style featurizer stage takes."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {
            "doc_id": [], "sample_rate": [], "n_channels": [],
            "n_samples": [], "s_min": [], "s_max": [], "s_sum": [],
            "pcm_md5": [],
        }
        for pdf in it:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                s, rate = decode_audio(bytes(blob))
                flat = s.reshape(-1)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(int(rate))
                out["n_channels"].append(1 if s.ndim == 1 else s.shape[1])
                out["n_samples"].append(
                    len(s) if s.ndim == 1 else s.shape[0]
                )
                out["s_min"].append(int(flat.min()))
                out["s_max"].append(int(flat.max()))
                out["s_sum"].append(int(flat.sum(dtype="int64")))
                # md5 over the lowercase hex of the PCM bytes (not the
                # raw bytes): DuckDB's md5 is VARCHAR-typed, and the
                # hex round-trip still binds every decoded byte
                out["pcm_md5"].append(
                    hashlib.md5(
                        flat.astype("<i2").tobytes().hex().encode()
                    ).hexdigest()
                )
        yield pd.DataFrame(out)

    return (
        media.select("doc_id", "blob")
        .mapInPandas(batches, AUDIO_STATS_SCHEMA)
        .orderBy("doc_id")
    )


def decode_audio_stats_oracle() -> str:
    """DuckDB twin: the PCM payload of a synthesized WAV IS unhex of
    the 4-chain md5 hex, so each little-endian int16 sample is plain
    hex arithmetic (lo byte + 256*hi byte, two's complement), and
    pcm_md5 is md5 over the payload's lowercase hex (VARCHAR on both
    engines; the Spark side re-hexes the decoded bytes)."""
    n = WAV_N_BYTES // 2
    return f"""
WITH pay AS (
  SELECT doc_id,
    md5(coalesce(text, '')) || md5(md5(coalesce(text, ''))) || md5(md5(md5(coalesce(text, ''))))
      || md5(md5(md5(md5(coalesce(text, ''))))) AS hexs
  FROM documents),
s AS (
  SELECT doc_id, hexs,
    ('0x' || substr(hexs, 4 * g.i + 1, 2))::BIGINT
      + 256 * ('0x' || substr(hexs, 4 * g.i + 3, 2))::BIGINT AS raw
  FROM pay, generate_series(0, {n - 1}) AS g(i)),
v AS (
  SELECT doc_id, hexs, raw - CASE WHEN raw >= 32768 THEN 65536 ELSE 0 END AS val
  FROM s)
SELECT doc_id, {WAV_RATE}::INT AS sample_rate, 1::INT AS n_channels,
       {n}::INT AS n_samples,
       min(val)::INT AS s_min, max(val)::INT AS s_max,
       sum(val)::BIGINT AS s_sum,
       md5(hexs) AS pcm_md5
FROM v GROUP BY doc_id, hexs ORDER BY doc_id
"""


def sample_frames(media: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """(doc_id, frame_idx, frame_len, frame_md5): video-frame-sampling
    stub — splits the payload into n_frames contiguous chunks and
    fingerprints each, via mapInPandas returning multiple rows per input
    row (the UDTF/flat-map shape of real frame extraction)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []
            }
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                payload = bytes(blob)[len(HEADER):]
                step = max(1, len(payload) // n_frames)
                for j in range(n_frames):
                    chunk = payload[j * step: (j + 1) * step] if j < n_frames - 1 else payload[(n_frames - 1) * step:]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(j)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.select("doc_id", "blob").mapInPandas(
        batches, FRAMES_SCHEMA
    ).orderBy("doc_id", "frame_idx")


PPM_W = 8
PPM_H = 8  # 8x8 RGB = 192 samples = 6 chained md5 hex digests

IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("px_sum", LongType()),
        StructField("px_mean", DoubleType()),
        StructField("px_md5", StringType()),
    ]
)


def synthesize_ppm_media(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): REAL binary P6 PPM images, built JVM-side.

    Pixel samples are the ASCII codes of 6 chained md5 hex digests of
    the document text (192 chars = 8*8*3 samples) — pure projections
    (the engineering notes: md5 outside aggs), byte-deterministic, and ASCII-only,
    so DuckDB recomputes every decoded statistic from the identical
    construction without ever touching a blob."""
    hs = [F.md5(F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8"))]
    for _ in range(5):
        hs.append(F.md5(F.encode(hs[-1], "utf-8")))
    return docs.select(
        "doc_id",
        F.encode(
            F.concat(F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n"), F.concat(*hs)),
            "utf-8",
        ).alias("blob"),
    )


def synthesize_png_media(docs: DataFrame, doc_id_offset: int = 0) -> DataFrame:
    """(doc_id, blob): REAL PNGs carrying the SAME chained-md5 ASCII
    payload pixels as :func:`synthesize_ppm_media` — so the DuckDB
    oracle arithmetic recomputes the decoded statistics unchanged while
    the Spark side exercises the full inflate + unfilter path (the
    encoder cycles all five scanline filters).  PNG needs zlib, so the
    build runs on the Arrow path (mapInPandas), not JVM exprs."""
    import numpy as np

    from ..session import ship_package

    ship_package(docs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _md5_chain_payload(
                    text if isinstance(text, str) else ""
                )
                px = np.frombuffer(
                    payload.encode("ascii"), dtype=np.uint8
                ).reshape(PPM_H, PPM_W, 3)
                ids.append(int(doc_id) + doc_id_offset)
                blobs.append(encode_png(px))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id long, blob binary"
    )


#: JPEG synthesis geometry: 16x12 = 192 blocks of 8x8, one CONSTANT
#: block per payload char -> 128x96 grayscale.  Constant blocks with an
#: all-ones quant table make baseline JPEG bit-exact (DC = 8*(v-128),
#: an exact multiple of 8; every AC coefficient rounds to 0), so the
#: DuckDB oracle recomputes decoded statistics from the payload alone.
JPEG_BLOCKS_W = 16
JPEG_BLOCKS_H = 12


def synthesize_jpeg_media(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): REAL sequential-baseline JPEGs whose 192
    constant 8x8 blocks carry the chained-md5 ASCII payload (block
    raster order == payload order).  Runs on the Arrow path — entropy
    coding is per-doc CPU work no SQL builtin expresses."""
    import numpy as np

    from ..session import ship_package

    from . import jpegcodec

    ship_package(docs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _md5_chain_payload(
                    text if isinstance(text, str) else ""
                )
                vals = np.frombuffer(
                    payload.encode("ascii"), dtype=np.uint8
                ).reshape(JPEG_BLOCKS_H, JPEG_BLOCKS_W)
                img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
                ids.append(int(doc_id))
                blobs.append(jpegcodec.encode_jpeg_gray(img))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    # entropy coding is CPU-heavy per-doc Python: spread the scan's
    # (often single-file, single-partition) layout across cores BEFORE
    # the Arrow stage, or the whole corpus encodes on one task — the
    # engineering notes' repartition-before-CPU-stage law.  The decode
    # stage downstream inherits this partitioning with no extra
    # shuffle.
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(n_part)
        .mapInPandas(batches, "doc_id long, blob binary")
    )


def decode_jpeg_block_stats(media: DataFrame) -> DataFrame:
    """(doc_id, width, height, px_sum, px_mean, block_md5): full
    baseline-JPEG decode (Huffman -> dequant -> IDCT) inside
    ``mapInPandas``, then whole-image statistics plus a block-raster
    digest of the per-block means.  ``px_sum`` binds every decoded
    pixel (all three replicated channels); ``block_md5`` binds the
    block structure — for the synthesized constant-block media it
    equals md5 of the generating payload, which is what the DuckDB
    oracle recomputes from text."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "px_sum": [], "px_mean": [], "block_md5": [],
        }
        for pdf in it:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_image(bytes(blob))
                h, w = arr.shape[0], arr.shape[1]
                ch = arr[:, :, 0]
                means = (
                    ch.reshape(h // 8, 8, w // 8, 8)
                    .mean(axis=(1, 3))
                    .round()
                    .astype("uint8")
                )
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(int(arr.sum()))
                out["px_mean"].append(int(arr.sum()) / float(arr.size))
                out["block_md5"].append(
                    hashlib.md5(means.tobytes()).hexdigest()
                )
        yield pd.DataFrame(out)

    return (
        media.select("doc_id", "blob")
        .mapInPandas(
            batches,
            "doc_id long, width int, height int, px_sum long, "
            "px_mean double, block_md5 string",
        )
        .orderBy("doc_id")
    )


def decode_jpeg_block_stats_oracle() -> str:
    """DuckDB twin: each payload char fills one constant 8x8 block in a
    128x96 grayscale JPEG replicated to 3 channels, so px_sum is
    64*3*sum(ascii), and the block-mean raster IS the payload."""
    n = JPEG_BLOCKS_W * JPEG_BLOCKS_H               # 192 payload chars
    px = n * 64 * 3                                 # total samples
    return f"""
WITH pay AS (
  SELECT doc_id,
    md5(coalesce(text, '')) || md5(md5(coalesce(text, '')))
      || md5(md5(md5(coalesce(text, ''))))
      || md5(md5(md5(md5(coalesce(text, '')))))
      || md5(md5(md5(md5(md5(coalesce(text, ''))))))
      || md5(md5(md5(md5(md5(md5(coalesce(text, ''))))))) AS payload
  FROM documents),
s AS (
  SELECT doc_id, payload,
         sum(ascii(substr(payload, g.i, 1)))::BIGINT AS a
  FROM pay, generate_series(1, {n}) AS g(i)
  GROUP BY doc_id, payload)
SELECT doc_id, {JPEG_BLOCKS_W * 8}::INT AS width,
       {JPEG_BLOCKS_H * 8}::INT AS height,
       (a * 192)::BIGINT AS px_sum,
       a * 192 / ({px}.0::DOUBLE) AS px_mean,
       md5(payload) AS block_md5
FROM s ORDER BY doc_id
"""


def synthesize_adpcm_media(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): RIFF/WAVE fmt-0x11 (IMA ADPCM) blobs whose
    compressed nibble stream IS the 192-byte chained-md5 payload
    (initial predictor 0, step index 0) — decode runs the real
    adaptive state machine, and a DuckDB RECURSIVE CTE replays it
    integer-for-integer."""
    from ..session import ship_package

    from . import adpcmcodec

    ship_package(docs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _md5_chain_payload(
                    text if isinstance(text, str) else ""
                )
                ids.append(int(doc_id))
                blobs.append(
                    adpcmcodec.encode_wav_adpcm(payload.encode("ascii"))
                )
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id long, blob binary"
    )


def decode_adpcm_stats_oracle() -> str:
    """DuckDB twin of ``decode_audio_stats`` over the ADPCM synthesis:
    a RECURSIVE CTE replays the published IMA update rule (step table,
    index-adjust table, clamps) nibble-by-nibble over the payload —
    native recursive semantics, not a transcription of the NumPy
    decoder's shape."""
    from .adpcmcodec import INDEX_TABLE, STEP_TABLE

    steps = "[" + ", ".join(str(v) for v in STEP_TABLE) + "]"
    idxs = "[" + ", ".join(str(v) for v in INDEX_TABLE) + "]"
    n_nib = PPM_W * PPM_H * 3 * 2  # 192 payload bytes -> 384 nibbles
    return f"""
WITH RECURSIVE pay AS (
  SELECT doc_id,
    md5(coalesce(text, '')) || md5(md5(coalesce(text, '')))
      || md5(md5(md5(coalesce(text, ''))))
      || md5(md5(md5(md5(coalesce(text, '')))))
      || md5(md5(md5(md5(md5(coalesce(text, ''))))))
      || md5(md5(md5(md5(md5(md5(coalesce(text, ''))))))) AS payload
  FROM documents),
walk AS (
  SELECT doc_id, payload, 0 AS k, 0::BIGINT AS pred, 0::BIGINT AS idx
  FROM pay
  UNION ALL
  SELECT doc_id, payload, k,
    CASE WHEN (nib & 8) > 0 THEN greatest(pred - delta, -32768)
         ELSE least(pred + delta, 32767) END,
    greatest(0::BIGINT, least(88::BIGINT,
      idx + list_extract({idxs}, (nib % 8) + 1)))
  FROM (
    SELECT doc_id, payload, k + 1 AS k, pred, idx, nib,
      (step // 8)
        + CASE WHEN (nib & 4) > 0 THEN step ELSE 0 END
        + CASE WHEN (nib & 2) > 0 THEN step // 2 ELSE 0 END
        + CASE WHEN (nib & 1) > 0 THEN step // 4 ELSE 0 END AS delta
    FROM (
      SELECT *, list_extract({steps}, idx + 1) AS step,
        CASE WHEN (k % 2) = 0
             THEN ascii(substr(payload, k // 2 + 1, 1)) % 16
             ELSE ascii(substr(payload, k // 2 + 1, 1)) // 16
        END AS nib
      FROM walk WHERE k < {n_nib}))),
hexed AS (
  SELECT doc_id, k, pred,
    printf('%04x', ((pred % 65536) + 65536) % 65536) AS be
  FROM walk),
agg AS (
  SELECT doc_id,
    count(*)::INT AS n_samples,
    min(pred)::INT AS s_min, max(pred)::INT AS s_max,
    sum(pred)::BIGINT AS s_sum,
    md5(string_agg(substr(be, 3, 2) || substr(be, 1, 2), ''
                   ORDER BY k)) AS pcm_md5
  FROM hexed GROUP BY doc_id)
SELECT doc_id, 8000::INT AS sample_rate, 1::INT AS n_channels,
       n_samples, s_min, s_max, s_sum, pcm_md5
FROM agg ORDER BY doc_id
"""


def synthesize_g711_media(docs: DataFrame, law: str) -> DataFrame:
    """(doc_id, blob): RIFF/WAVE G.711 blobs (fmt 7 = μ-law, 6 =
    A-law) whose 8-bit codeword stream IS the 192-byte chained-md5
    payload.  G.711 decode is a stateless per-byte closed form, so the
    DuckDB oracle replays it in NATIVE per-row arithmetic — no
    recursion, no transcription of the decoder's shape."""
    from ..session import ship_package

    from . import g711codec

    ship_package(docs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _md5_chain_payload(
                    text if isinstance(text, str) else ""
                )
                ids.append(int(doc_id))
                blobs.append(
                    g711codec.encode_wav_g711(payload.encode("ascii"), law)
                )
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id long, blob binary"
    )


def decode_g711_stats_oracle(law: str) -> str:
    """DuckDB oracle for ``decode_audio_stats`` over the G.711
    synthesis — the ITU-T G.711 decode formula written directly in
    per-byte SQL arithmetic (16-bit scale, Sun-g711 linearization):

    - μ-law: ``u = 255 - code``; ``t = ((u%16)*8 + 132) << ((u//16)%8)``;
      sample = ``132 - t`` if the sign bit of ``u`` is set else
      ``t - 132``.
    - A-law: ``a = xor(code, 85)``; ``t = (a%16)*16``; segment 0 adds
      8, higher segments add 264 and shift by ``seg - 1``; sign bit
      SET means positive.
    """
    n = PPM_W * PPM_H * 3  # 192 payload bytes = codewords
    if law == "mulaw":
        sample = """
      CASE WHEN u >= 128 THEN 132 - t ELSE t - 132 END"""
        pre = """
    SELECT doc_id, k, u,
      ((u % 16) * 8 + 132)::BIGINT << ((u // 16) % 8) AS t
    FROM (SELECT doc_id, g.i AS k,
                 255 - ascii(substr(payload, g.i, 1)) AS u
          FROM pay, generate_series(1, {n}) AS g(i))"""
    else:
        sample = """
      CASE WHEN a >= 128 THEN mag ELSE -mag END"""
        pre = """
    SELECT doc_id, k, a,
      CASE WHEN ((a // 16) % 8) = 0 THEN (a % 16) * 16 + 8
           ELSE ((a % 16) * 16 + 264)::BIGINT << (((a // 16) % 8) - 1)
      END AS mag
    FROM (SELECT doc_id, g.i AS k,
                 xor(ascii(substr(payload, g.i, 1)), 85) AS a
          FROM pay, generate_series(1, {n}) AS g(i))"""
    return f"""
WITH pay AS (
  SELECT doc_id,
    md5(coalesce(text, '')) || md5(md5(coalesce(text, '')))
      || md5(md5(md5(coalesce(text, ''))))
      || md5(md5(md5(md5(coalesce(text, '')))))
      || md5(md5(md5(md5(md5(coalesce(text, ''))))))
      || md5(md5(md5(md5(md5(md5(coalesce(text, ''))))))) AS payload
  FROM documents),
dec AS (
  SELECT doc_id, k, ({sample.strip()}) AS s
  FROM ({pre.format(n=n)})),
hexed AS (
  SELECT doc_id, k, s,
    printf('%04x', ((s % 65536) + 65536) % 65536) AS be
  FROM dec)
SELECT doc_id, 8000::INT AS sample_rate, 1::INT AS n_channels,
       count(*)::INT AS n_samples,
       min(s)::INT AS s_min, max(s)::INT AS s_max,
       sum(s)::BIGINT AS s_sum,
       md5(string_agg(substr(be, 3, 2) || substr(be, 1, 2), ''
                      ORDER BY k)) AS pcm_md5
FROM hexed GROUP BY doc_id ORDER BY doc_id
"""


def synthesize_flac_media(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): REAL FLAC files — the 192 payload ASCII values
    as int16 samples, compressed with the real fixed-predictor + Rice
    encoder (:mod:`.flaccodec`).  Odd doc_ids are encoded with an
    explicit LPC subframe so both subframe read paths run in the
    corpus.  FLAC is lossless, so the decoded samples ARE the payload
    byte values and the DuckDB oracle is native per-byte arithmetic."""
    import numpy as np

    from ..session import ship_package

    from . import flaccodec

    ship_package(docs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _md5_chain_payload(
                    text if isinstance(text, str) else ""
                )
                samples = np.frombuffer(
                    payload.encode("ascii"), dtype=np.uint8
                ).astype(np.int16)
                ids.append(int(doc_id))
                blobs.append(
                    flaccodec.encode_flac_mono16(
                        samples, lpc_frame=bool(int(doc_id) % 2)
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    # the per-sample Python bit-writer is CPU-heavy: spread the
    # (often single-file) scan before the Arrow stage, per the
    # repartition-before-CPU-stage law; decode inherits the layout
    # (measured 7.2 s single-task -> ~1 s spread at sf0.1).
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(n_part)
        .mapInPandas(batches, "doc_id long, blob binary")
    )


def decode_flac_stats_oracle() -> str:
    """DuckDB oracle for ``decode_audio_stats`` over the FLAC
    synthesis: lossless codec, so each decoded int16 sample is the
    ASCII value of the corresponding payload character — native
    per-byte arithmetic, no recursion, no decoder transcription."""
    n = PPM_W * PPM_H * 3  # 192 payload chars = samples
    return f"""
WITH pay AS (
  SELECT doc_id,
    md5(coalesce(text, '')) || md5(md5(coalesce(text, '')))
      || md5(md5(md5(coalesce(text, ''))))
      || md5(md5(md5(md5(coalesce(text, '')))))
      || md5(md5(md5(md5(md5(coalesce(text, ''))))))
      || md5(md5(md5(md5(md5(md5(coalesce(text, ''))))))) AS payload
  FROM documents),
dec AS (
  SELECT doc_id, g.i AS k,
         ascii(substr(payload, g.i, 1))::BIGINT AS s
  FROM pay, generate_series(1, {n}) AS g(i)),
hexed AS (
  SELECT doc_id, k, s, printf('%04x', s) AS be FROM dec)
SELECT doc_id, 8000::INT AS sample_rate, 1::INT AS n_channels,
       count(*)::INT AS n_samples,
       min(s)::INT AS s_min, max(s)::INT AS s_max,
       sum(s)::BIGINT AS s_sum,
       md5(string_agg(substr(be, 3, 2) || substr(be, 1, 2), ''
                      ORDER BY k)) AS pcm_md5
FROM hexed GROUP BY doc_id ORDER BY doc_id
"""


def synthesize_gif_media(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): REAL GIF89a blobs — real LZW compression over
    the 192-char chained-md5 payload laid out as a 16x12 grayscale
    image (identity palette).  GIF is lossless, so the decoded
    channel-0 bytes ARE the payload, PPM/PNG-style."""
    import numpy as np

    from ..session import ship_package

    from . import gifcodec

    ship_package(docs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _md5_chain_payload(
                    text if isinstance(text, str) else ""
                )
                img = np.frombuffer(
                    payload.encode("ascii"), dtype=np.uint8
                ).reshape(JPEG_BLOCKS_H, JPEG_BLOCKS_W)
                ids.append(int(doc_id))
                blobs.append(gifcodec.encode_gif_gray(img))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id long, blob binary"
    )


def decode_gif_stats(media: DataFrame) -> DataFrame:
    """(doc_id, width, height, px_sum, px_mean, px_md5): full LZW +
    palette decode inside ``mapInPandas``.  ``px_sum``/``px_mean``
    cover all three (palette-replicated) channels; ``px_md5`` digests
    the channel-0 bytes — for the synthesized media that is exactly
    md5 of the generating payload, which the DuckDB oracle recomputes
    from text."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "px_sum": [], "px_mean": [], "px_md5": [],
        }
        for pdf in it:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_image(bytes(blob))
                out["doc_id"].append(int(doc_id))
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["px_sum"].append(int(arr.sum()))
                out["px_mean"].append(int(arr.sum()) / float(arr.size))
                out["px_md5"].append(
                    hashlib.md5(arr[:, :, 0].tobytes()).hexdigest()
                )
        yield pd.DataFrame(out)

    return (
        media.select("doc_id", "blob")
        .mapInPandas(batches, IMAGE_STATS_SCHEMA)
        .orderBy("doc_id")
    )


def decode_gif_stats_oracle() -> str:
    """DuckDB twin: the decoded channel-0 bytes of a synthesized GIF
    ARE the 192-char payload (lossless LZW, identity palette), and the
    identity palette replicates each byte across 3 channels."""
    n = JPEG_BLOCKS_W * JPEG_BLOCKS_H
    return f"""
WITH pay AS (
  SELECT doc_id,
    md5(coalesce(text, '')) || md5(md5(coalesce(text, '')))
      || md5(md5(md5(coalesce(text, ''))))
      || md5(md5(md5(md5(coalesce(text, '')))))
      || md5(md5(md5(md5(md5(coalesce(text, ''))))))
      || md5(md5(md5(md5(md5(md5(coalesce(text, ''))))))) AS payload
  FROM documents),
s AS (
  SELECT doc_id, payload,
         sum(ascii(substr(payload, g.i, 1)))::BIGINT AS a
  FROM pay, generate_series(1, {n}) AS g(i)
  GROUP BY doc_id, payload)
SELECT doc_id, {JPEG_BLOCKS_W}::INT AS width, {JPEG_BLOCKS_H}::INT AS height,
       (a * 3)::BIGINT AS px_sum,
       a * 3 / ({n * 3}.0::DOUBLE) AS px_mean,
       md5(payload) AS px_md5
FROM s ORDER BY doc_id
"""


def synthesize_webp_media(docs: DataFrame) -> DataFrame:
    """(doc_id, blob): REAL lossless-WebP blobs — length-limited
    canonical prefix codes + LZ77 over the 192-char chained-md5
    payload laid out as a 16x12 grayscale image (opaque ARGB with
    r = g = b).  VP8L is lossless, so the decoded channel bytes ARE
    the payload, GIF/PPM/PNG-style."""
    import numpy as np

    from ..session import ship_package

    from . import webpcodec

    ship_package(docs.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = _md5_chain_payload(
                    text if isinstance(text, str) else ""
                )
                img = np.frombuffer(
                    payload.encode("ascii"), dtype=np.uint8
                ).reshape(JPEG_BLOCKS_H, JPEG_BLOCKS_W)
                ids.append(int(doc_id))
                blobs.append(webpcodec.encode_webp_gray(img))
            yield pd.DataFrame({"doc_id": ids, "blob": blobs})

    # prefix-code construction + LZ77 is CPU-heavy per-doc Python:
    # spread the (often single-file) scan before the Arrow stage, per
    # the repartition-before-CPU-stage law; decode inherits the layout.
    n_part = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(n_part)
        .mapInPandas(batches, "doc_id long, blob binary")
    )


def decode_webp_stats(media: DataFrame) -> DataFrame:
    """(doc_id, width, height, px_sum, px_mean, px_md5): full VP8L
    prefix-code + LZ77 decode inside ``mapInPandas``; ``px_md5``
    digests the channel-0 bytes, which for the synthesized media is
    exactly md5 of the generating payload — the DuckDB oracle
    recomputes it from text."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "px_sum": [], "px_mean": [], "px_md5": [],
        }
        for pdf in it:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_image(bytes(blob))
                out["doc_id"].append(int(doc_id))
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["px_sum"].append(int(arr.sum()))
                out["px_mean"].append(int(arr.sum()) / float(arr.size))
                out["px_md5"].append(
                    hashlib.md5(arr[:, :, 0].tobytes()).hexdigest()
                )
        yield pd.DataFrame(out)

    return (
        media.select("doc_id", "blob")
        .mapInPandas(batches, IMAGE_STATS_SCHEMA)
        .orderBy("doc_id")
    )


def decode_webp_stats_oracle() -> str:
    """DuckDB twin: identical to the GIF one — lossless codec, gray
    replicated across 3 channels, channel-0 bytes == the payload."""
    return decode_gif_stats_oracle()


def _md5_chain_payload(text: str) -> str:
    """6 chained md5 hex digests of ``text`` — 192 ASCII chars, the
    shared pixel payload of the PPM and PNG syntheses."""
    hs = []
    cur = text
    for _ in range(6):
        cur = hashlib.md5(cur.encode("utf-8")).hexdigest()
        hs.append(cur)
    return "".join(hs)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """(doc_id, width, height, px_sum, px_mean, px_md5): REAL image
    decode in the plan — ``decode_image`` (pure-NumPy PPM/BMP codec)
    inside mapInPandas, then per-image statistics over the pixel
    array.  The shape a CLIP-style embedder stage takes: bytes in,
    fixed-width features out, no shuffle."""
    from ..session import ship_package

    ship_package(media.sparkSession)  # decode_image pickles by module ref

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out: dict[str, list] = {
            "doc_id": [], "width": [], "height": [],
            "px_sum": [], "px_mean": [], "px_md5": [],
        }
        for pdf in it:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = decode_image(bytes(blob))
                s = int(arr.sum())
                out["doc_id"].append(int(doc_id))
                out["width"].append(arr.shape[1])
                out["height"].append(arr.shape[0])
                out["px_sum"].append(s)
                out["px_mean"].append(s / float(arr.size))
                out["px_md5"].append(
                    hashlib.md5(arr.tobytes()).hexdigest()
                )
        yield pd.DataFrame(out)

    return (
        media.select("doc_id", "blob")
        .mapInPandas(batches, IMAGE_STATS_SCHEMA)
        .orderBy("doc_id")
    )


def decode_image_stats_oracle() -> str:
    """DuckDB twin: the decoded pixel array of a synthesized PPM — or
    of the PNG twin built from the same payload — IS the 192-char
    chained-md5 payload, so width/height are the fixed header, px_md5
    is md5(payload), and the sum/mean unnest ascii codes.  For the PNG
    query a hash match proves the inflate + unfilter path reconstructs
    the exact bytes (identical oracle, different Spark-side codec)."""
    n = PPM_W * PPM_H * 3
    return f"""
WITH pay AS (
  SELECT doc_id,
    md5(coalesce(text, '')) || md5(md5(coalesce(text, ''))) || md5(md5(md5(coalesce(text, ''))))
      || md5(md5(md5(md5(coalesce(text, '')))))
      || md5(md5(md5(md5(md5(coalesce(text, ''))))))
      || md5(md5(md5(md5(md5(md5(coalesce(text, ''))))))) AS payload
  FROM documents),
s AS (
  SELECT doc_id, payload,
         sum(ascii(substr(payload, g.i, 1)))::BIGINT AS px_sum
  FROM pay, generate_series(1, {n}) AS g(i)
  GROUP BY doc_id, payload)
SELECT doc_id, {PPM_W}::INT AS width, {PPM_H}::INT AS height,
       px_sum, px_sum / ({n}.0::DOUBLE) AS px_mean,
       md5(payload) AS px_md5
FROM s ORDER BY doc_id
"""


def sample_frames_oracle(n_frames: int = N_FRAMES) -> str:
    """DuckDB twin of the chunking arithmetic over the ASCII payload."""
    return f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS text,
                  len(coalesce(text, '')) AS n,
                  greatest(1, len(coalesce(text, '')) // {n_frames}) AS step
           FROM documents),
f AS (
  SELECT doc_id, j AS frame_idx,
    CASE WHEN j < {n_frames - 1}
         THEN substr(text, j * step + 1, step)
         ELSE substr(text, {n_frames - 1} * step + 1)
    END AS chunk
  FROM d, unnest(generate_series(0, {n_frames - 1})) AS t(j))
SELECT doc_id, frame_idx::INT AS frame_idx,
       len(chunk)::INT AS frame_len, md5(chunk) AS frame_md5
FROM f ORDER BY doc_id, frame_idx
"""
