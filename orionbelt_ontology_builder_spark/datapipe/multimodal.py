"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are **opaque BINARY columns with typed metadata** — the only
representation that survives 100 TB: bytes stay columnar in Parquet, the
JVM never interprets them, and all decode / feature-extraction runs in
Arrow-batched ``mapInPandas`` stages (zero-copy-ish byte transfer, no
per-row Python).

The actual image/audio codecs are NOT in this container, so the decode
step is STUBBED behind a deterministic fake (``FAKEIMG0`` container
format below) plus a clearly-marked ``NotImplementedError`` path for
real codecs.  The Spark-side plumbing — schema, batch shape, UDF
signatures, per-frame explode — is real and oracle-tested: the fake
container is byte-deterministic from the document text, so DuckDB can
recompute every extracted feature (md5 over the same byte string).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
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
    blob = F.concat(
        F.lit(HEADER), F.encode(F.col("text"), "utf-8")
    ).alias("blob")
    return docs.select(
        "doc_id",
        blob,
        F.lit("image/x-fake").alias("mime"),
        (F.length(F.col("text")) + len(HEADER)).alias("n_bytes"),
    )


def decode_image(blob: bytes) -> object:
    """Real-codec decode — STUB.

    The container has no image libraries; a deployment with Pillow
    plugs in here.  The Spark plumbing around this function (batching,
    schema, explode) is what the engine owns and tests.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - intentional stub
        raise NotImplementedError(
            "image decode requires Pillow; container ships without codecs "
            "(deterministic fake features via extract_features instead)"
        ) from exc
    raise NotImplementedError("real-codec path not wired in this build")


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
  len(text) + {len(HEADER)} AS n_bytes,
  1 AS header_ok,
  md5('{h}' || text) AS content_md5
FROM documents ORDER BY doc_id
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


def sample_frames_oracle(n_frames: int = N_FRAMES) -> str:
    """DuckDB twin of the chunking arithmetic over the ASCII payload."""
    return f"""
WITH d AS (SELECT doc_id, text, len(text) AS n,
                  greatest(1, len(text) // {n_frames}) AS step
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
