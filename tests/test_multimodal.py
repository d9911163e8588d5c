"""Multimodal plumbing tests: binary payload + metadata struct schema,
metadata-only column pruning, mapInPandas decode stub."""

from __future__ import annotations

import pytest

from tests.conftest import SF_UNIT
from tugas_2_big_data_spark import multimodal
from tugas_2_big_data_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, "documents", SF_UNIT)
    return multimodal.attach_binary_payload(docs)


def test_payload_schema(media):
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["meta"].startswith("struct<mime:string,n_bytes:bigint")


def test_metadata_projection_prunes_payload(media):
    meta = multimodal.extract_metadata(media)
    plan = meta.explain(extended=False) or meta._jdf.queryExecution().simpleString()
    rows = meta.collect()
    assert all(r["n_bytes"] > 0 for r in rows)
    assert {r["mime"] for r in rows} == {"image/png", "audio/wav"}


def test_decode_stub_batch_shape(media):
    decoded = multimodal.decode_media_batch(media, deterministic_fake=True)
    rows = decoded.collect()
    assert len(rows) == media.count()
    r = rows[0]
    assert len(r["feature"]) == 8
    assert all(0.0 <= x < 1.0 for x in r["feature"])
    # determinism: same payload → same fake feature on re-run
    again = decoded.collect()
    assert again[0]["feature"] == r["feature"]


def test_resize_images(media):
    resized = multimodal.resize_images(media, width=16, height=16)
    rows = resized.collect()
    assert len(rows) == media.count()
    for r in rows:
        if r["mime"].startswith("image/"):
            assert (r["width"], r["height"]) == (16, 16)
            assert len(r["payload"]) == 16 * 16
        else:
            # non-image rows pass through untouched with NULL dims
            assert r["width"] is None and r["height"] is None
            assert len(r["payload"]) > 0


def test_sample_frames_row_expansion(media):
    frames = multimodal.sample_frames(media, every_n=10, max_frames=3)
    rows = frames.collect()
    assert len(rows) > media.count()  # row-expanding operator
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(r["frame_payload"]) == 16  # md5 digest per frame
    for doc_rows in by_doc.values():
        assert 1 <= len(doc_rows) <= 3
        assert sorted(r["frame_idx"] for r in doc_rows) == [
            i * 10 for i in range(len(doc_rows))
        ]
    # determinism across runs
    again = {(r["doc_id"], r["frame_idx"]): r["frame_payload"] for r in frames.collect()}
    assert all(again[(r["doc_id"], r["frame_idx"])] == r["frame_payload"] for r in rows)


def test_decode_without_fake_raises(media):
    import pytest as _pytest

    try:
        import PIL  # noqa: F401

        _pytest.skip(
            "Pillow installed — the real decode path is exercised by "
            "tests/test_real_deps.py instead of raising"
        )
    except ImportError:
        pass
    decoded = multimodal.decode_media_batch(media, deterministic_fake=False)
    with _pytest.raises(Exception) as ei:
        decoded.collect()
    assert "NotImplementedError" in str(ei.value) or "Pillow" in str(
        ei.value
    )
