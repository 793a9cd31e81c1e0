"""Multimodal column plumbing (images/audio/video as opaque binaries).

The container has no image/audio codecs, so the *decode* step is a
clearly marked deterministic stub — but everything Spark-side is real
and tested: binary columns travel through Arrow batches, the feature
extractor is a ``mapInPandas`` over bytes with a typed output schema,
and the plan stays fully distributed (no driver-side loops).

Swap ``_decode_stub`` for a real decoder (PIL/libsndfile/ffmpeg) on a
cluster with codecs installed; the schema, batching and partitioning do
not change.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("magic", T.StringType(), True),
    T.StructField("media_kind", T.StringType(), True),
    T.StructField("sha256", T.StringType(), True),
    T.StructField("fake_width", T.IntegerType(), True),
    T.StructField("fake_height", T.IntegerType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])

_MAGIC_KINDS = [
    (b"%PDF-", "pdf"),
    (b"\x89PNG", "image"),
    (b"\xff\xd8\xff", "image"),
    (b"RIFF", "audio"),
    (b"<!DO", "html"),
    (b"<htm", "html"),
]


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode: real decoders are unavailable in this container
    (no PIL/ffmpeg). Produces deterministic fake dimensions and an
    8-dim feature vector derived from the content digest, so the
    Spark-side plumbing (schema, batch shape, partitioning) is fully
    exercised. Replace with a real decoder in production.

    Feature components are b/256.0 (exact binary fractions, exactly
    representable in float32), so downstream double arithmetic is
    bit-identical across engines — the DuckDB oracle recomputes them
    from the sha256 hex digest."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [b / 256.0 for b in digest[2:10]]
    return width, height, feature


def _sniff(payload: bytes) -> str:
    for magic, kind in _MAGIC_KINDS:
        if payload[: len(magic)] == magic:
            return kind
    return "binary"


def media_features_kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for url, payload in zip(pdf["url"], pdf["html"]):
            if payload is None or len(payload) == 0:
                rows.append({
                    "url": url, "n_bytes": 0, "magic": None, "media_kind": None,
                    "sha256": None, "fake_width": None, "fake_height": None,
                    "feature": None,
                })
                continue
            data = bytes(payload)
            width, height, feature = _decode_stub(data)
            rows.append({
                "url": url,
                "n_bytes": len(data),
                "magic": data[:4].hex(),
                "media_kind": _sniff(data),
                "sha256": hashlib.sha256(data).hexdigest(),
                "fake_width": width,
                "fake_height": height,
                "feature": feature,
            })
        yield pd.DataFrame(rows)


def media_features(pages: DataFrame) -> DataFrame:
    """Binary-column feature extraction: Arrow-batched, schema-typed."""
    return pages.select("url", "html").mapInPandas(media_features_kernel, MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), True),
    T.StructField("frame_off", T.LongType(), True),
    T.StructField("frame_len", T.LongType(), True),
    T.StructField("frame_sig", T.StringType(), True),
    T.StructField("luma", T.DoubleType(), True),
])

N_FRAMES = 4
FRAME_CHUNK = 64


def media_frame_sample_kernel(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Frame-sampling plumbing for video-like payloads: N evenly-spaced
    "frames" per document, each a fixed-size window with a per-frame
    digest signature and a stub luma statistic.  The decode step is the
    honest stub (no codecs in this container): frames are windows over
    the payload's decoded text, offsets in CHARACTERS so the DuckDB
    oracle (substr on VARCHAR + sha256, which hashes the slice's UTF-8
    bytes — exactly this kernel's re-encode) reproduces every value.
    A real deployment swaps the window slicing for ffmpeg keyframe
    extraction; the explode shape (one input row → N typed frame
    rows), Arrow batching and schema stay identical."""
    for pdf in batches:
        rows = []
        for url, payload in zip(pdf["url"], pdf["html"]):
            if payload is None or len(payload) == 0:
                continue
            txt = bytes(payload).decode("utf-8", errors="replace")
            n = len(txt)
            if n == 0:
                continue
            for i in range(N_FRAMES):
                off = (i * n) // N_FRAMES
                ln = min(FRAME_CHUNK, n - off)
                digest = hashlib.sha256(txt[off:off + ln].encode("utf-8")).hexdigest()
                rows.append({
                    "url": url,
                    "frame_idx": i,
                    "frame_off": off,
                    "frame_len": ln,
                    "frame_sig": digest,
                    "luma": int(digest[:2], 16) / 256.0,
                })
        yield pd.DataFrame(
            rows,
            columns=["url", "frame_idx", "frame_off", "frame_len",
                     "frame_sig", "luma"],
        )


def media_frame_sample(pages: DataFrame) -> DataFrame:
    """One input document → N typed frame rows (mapInPandas explode)."""
    return pages.select("url", "html").mapInPandas(
        media_frame_sample_kernel, FRAME_SCHEMA
    )
