"""Multimodal columns: opaque binary payloads + typed metadata, with a
mapInPandas decode/feature pipeline (extension — BASELINE.json north
star; the reference has no binary data at all).

Design for 100 TB: media bytes live in a `binary` column (or an object-
store URI for >~1 MB payloads); metadata (mime, width, sample rate, …)
is a typed struct so filters prune on metadata WITHOUT touching bytes —
`WHERE meta.mime = 'image/png'` reads only the metadata column from
parquet. Decode/resize/frame-sample run as Arrow-batched mapInPandas so
the heavy libs initialize once per executor.

The actual codec step is STUBBED: image/audio libraries are not in this
container. `decode_media_batch(deterministic_fake=True)` produces
seeded fake features (shape-correct, test-stable); with
deterministic_fake=False it raises NotImplementedError where Pillow/
torchaudio would be called. The Spark-side plumbing — schemas, batch
iteration, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from tugas_2_big_data_spark.operators.partitioning import fan_out

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum_md5", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    widen: bool = False,
) -> DataFrame:
    """Demo payload builder: UTF-8 bytes of the text column stand in for
    media bytes (the container ships no real media fixtures).

    ``widen=True`` fans the scan out to executor width before the Arrow
    UDF stages — use it when the decode step is REAL (Pillow/ffmpeg,
    ~ms-per-row). With the deterministic stub the decode is µs-per-row
    and the fan-out shuffle + per-task Python worker spin-up cost more
    than they recover (measured 0.6 s → 3.9 s cold at sf0.1), so the
    default stays narrow."""
    if widen:
        df = fan_out(df)
    payload = F.encode(F.col(text_col), "UTF-8")
    mime = F.when(F.col(id_col) % 2 == 0, F.lit("image/png")).otherwise(
        F.lit("audio/wav")
    )
    meta = F.struct(
        mime.alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum_md5"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def extract_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — at scale this plan must NOT read the
    payload column (verify ReadSchema in .explain)."""
    return df.select("doc_id", "meta.mime", "meta.n_bytes", "meta.checksum_md5")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded embedding: bytes of
    md5(payload) scaled to [0, 1) — stable across runs/executors."""
    digest = hashlib.md5(payload).digest()
    return [b / 256.0 for b in digest[:dim]]


def decode_media_batch(
    df: DataFrame,
    deterministic_fake: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """mapInPandas decode/feature-extract over (doc_id, payload, meta).

    Real codecs are unavailable here — the decode seam raises
    NotImplementedError unless deterministic_fake=True. Batch shape,
    schema contract, and per-executor iteration are the real article.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media codecs (Pillow/torchaudio/ffmpeg) not available "
                    "in this container; stubbed decode seam"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": [
                        _fake_feature(bytes(p), feature_dim) for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(decode, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    deterministic_fake: bool = True,
) -> DataFrame:
    """mapInPandas image resize over (doc_id, payload, meta).

    With real codecs this is Pillow `Image.open(bytes).resize((w, h))`
    per element inside the Arrow batch; here the codec seam is stubbed
    (deterministic fake: payload md5-digest bytes tiled to w·h — size-
    correct, content-stable). Non-image rows pass through untouched
    with NULL dims, so the operator composes with mixed-modality
    tables without a pre-filter.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image codecs (Pillow) not available in this "
                    "container; stubbed resize seam"
                )
            out = {
                "doc_id": [],
                "mime": [],
                "width": [],
                "height": [],
                "payload": [],
            }
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                mime = meta["mime"]
                out["doc_id"].append(doc_id)
                out["mime"].append(mime)
                if mime.startswith("image/"):
                    digest = hashlib.md5(bytes(payload)).digest()
                    n = width * height
                    fake = (digest * (n // len(digest) + 1))[:n]
                    out["width"].append(width)
                    out["height"].append(height)
                    out["payload"].append(fake)
                else:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["payload"].append(bytes(payload))
            yield pd.DataFrame(out)

    return df.mapInPandas(resize, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 5,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Row-EXPANDING mapInPandas video frame sampler: one output row per
    sampled frame (doc_id, frame_idx, frame_payload).

    With real codecs: ffmpeg/PyAV seek-decode of every n-th frame. The
    stub derives frame count from payload length and frame bytes from
    md5(payload ‖ frame_idx) — deterministic, and exercises the real
    structural contract: output batches whose row count differs from
    the input's (the shape that trips naive one-row-in/one-row-out UDF
    plumbing).
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "video codecs (ffmpeg/PyAV) not available in this "
                    "container; stubbed frame-sample seam"
                )
            ids, idxs, payloads = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = min(max_frames, max(1, len(raw) // every_n))
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i * every_n)
                    payloads.append(
                        hashlib.md5(raw + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.mapInPandas(sample, FRAMES_SCHEMA)
