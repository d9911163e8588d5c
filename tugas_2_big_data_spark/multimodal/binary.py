"""Multimodal columns: opaque binary payloads + typed metadata, with a
mapInPandas decode/feature pipeline (extension — BASELINE.json north
star; the reference has no binary data at all).

Design for 100 TB: media bytes live in a `binary` column (or an object-
store URI for >~1 MB payloads); metadata (mime, width, sample rate, …)
is a typed struct so filters prune on metadata WITHOUT touching bytes —
`WHERE meta.mime = 'image/png'` reads only the metadata column from
parquet. Decode/resize/frame-sample run as Arrow-batched mapInPandas so
the heavy libs initialize once per executor.

The codec step is an import-gated dependency seam (same design as
text/summarize.bart_backend): `decode_media_batch(deterministic_fake=
True)` produces seeded fake features (shape-correct, test-stable) with
no external deps; deterministic_fake=False runs the REAL Pillow decode/
resize when PIL is importable and raises NotImplementedError otherwise
(this build container ships no codecs — tests/test_real_deps.py is the
opt-in smoke lane that exercises the real path where Pillow exists).
The Spark-side plumbing — schemas, batch iteration, partitioning — is
identical on both paths and tested hermetically.
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


def _require_pillow(what: str):
    """Import gate for the real codec path — the same seam shape as
    bart_backend: a clear NotImplementedError when the dependency is
    absent, the real library when it is importable."""
    try:
        from PIL import Image  # type: ignore
    except ImportError as e:
        raise NotImplementedError(
            f"{what} requires Pillow, which is not installed in this "
            "environment; use deterministic_fake=True or install PIL "
            "(opt-in smoke lane: tests/test_real_deps.py)"
        ) from e
    return Image


def _real_image_feature(Image, raw: bytes, dim: int) -> list[float]:
    """Pillow-backed decode feature: [width, height, n_bands,
    band means over a 16x16 thumbnail scaled to [0,1)] padded to
    ``dim`` — cheap, deterministic, and proves a real decode ran."""
    import io

    with Image.open(io.BytesIO(raw)) as img:
        rgb = img.convert("RGB")
        w, h = img.size
        pixels = list(rgb.resize((16, 16)).getdata())
    means = [
        sum(p[c] for p in pixels) / (len(pixels) * 255.0) for c in range(3)
    ]
    feat = [float(w), float(h), 3.0] + means
    return (feat + [0.0] * dim)[:dim]


def decode_media_batch(
    df: DataFrame,
    deterministic_fake: bool = True,
    feature_dim: int = 8,
) -> DataFrame:
    """mapInPandas decode/feature-extract over (doc_id, payload, meta).

    deterministic_fake=False runs the REAL Pillow decode for image/*
    rows (import-gated — NotImplementedError when PIL is absent; audio
    rows raise too, torchaudio being a further seam). Batch shape,
    schema contract, and per-executor lazy init are identical on both
    paths.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None
        if not deterministic_fake:
            # once per executor python worker, like the BART factory
            Image = _require_pillow("decode_media_batch")

        def feature(mime: str, raw: bytes) -> list[float]:
            if deterministic_fake:
                return _fake_feature(raw, feature_dim)
            if mime.startswith("image/"):
                return _real_image_feature(Image, raw, feature_dim)
            raise NotImplementedError(
                f"real decode for {mime} needs torchaudio/ffmpeg — "
                "not installed; only image/* decodes via Pillow"
            )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": [
                        feature(m["mime"], bytes(p))
                        for m, p in zip(pdf["meta"], pdf["payload"])
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

    deterministic_fake=False runs the REAL Pillow
    `Image.open(bytes).resize((w, h))` per element inside the Arrow
    batch (import-gated; resized payload re-encoded as PNG); the fake
    tiles payload md5-digest bytes to w·h — size-correct,
    content-stable. Non-image rows pass through untouched with NULL
    dims on both paths, so the operator composes with mixed-modality
    tables without a pre-filter.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = None
        if not deterministic_fake:
            Image = _require_pillow("resize_images")

        def resized_payload(raw: bytes) -> bytes:
            if deterministic_fake:
                digest = hashlib.md5(raw).digest()
                n = width * height
                return (digest * (n // len(digest) + 1))[:n]
            import io

            with Image.open(io.BytesIO(raw)) as img:
                small = img.convert("RGB").resize((width, height))
            buf = io.BytesIO()
            small.save(buf, format="PNG")
            return buf.getvalue()

        for pdf in batches:
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
                if mime.startswith("image/"):
                    # the real path re-encodes as PNG, so the emitted
                    # mime must say so — downstream mime dispatch (e.g.
                    # decode_media_batch's startswith gate) reads the
                    # row's mime as describing the row's payload. The
                    # fake path keeps the source mime: its payload is
                    # a digest tile in no container format, and the
                    # registered oracle pins the pass-through mime.
                    out["mime"].append(
                        mime if deterministic_fake else "image/png"
                    )
                    out["width"].append(width)
                    out["height"].append(height)
                    out["payload"].append(resized_payload(bytes(payload)))
                else:
                    out["mime"].append(mime)
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
