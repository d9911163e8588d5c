"""Fault injection for the artifact store (VERDICT r8 #7): crashed
writers (stale staging dirs, partial ingest footprints) and lost
rename races between the build-once guard's probe and its rename.
Every scenario must end with serving seeing EXACTLY ONE winner and
replays duplicate-free — the local-fs stand-in for the commit
protocol a real artifact store runs."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_UNIT
from tugas_2_big_data_spark import queries as q  # noqa: F401  (registers modules)
from tugas_2_big_data_spark.operators import similarity
from tugas_2_big_data_spark.queries_training import _ensure_artifact
from tugas_2_big_data_spark.sources.catalog import load_table


def _build_marker(tag):
    """build_fn that writes a recognizable one-file artifact."""

    def build(tmp):
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "content"), "w") as f:
            f.write(tag)

    return build


def _served(path):
    with open(os.path.join(path, "content")) as f:
        return f.read()


def test_ensure_artifact_builds_once_and_serves(spark, tmp_path):
    path = str(tmp_path / "store" / "artifact")
    _ensure_artifact(spark, path, "content", _build_marker("A"))
    assert _served(path) == "A"
    # second call: probe hits, build_fn must NOT run again
    def explode(tmp):
        raise AssertionError("rebuilt an existing artifact")

    _ensure_artifact(spark, path, "content", explode)
    assert _served(path) == "A"


def test_ensure_artifact_survives_stale_staging_of_crashed_writer(
    spark, tmp_path
):
    """A writer that died after staging but before rename leaves
    `<path>.tmp-<pid>` behind (possibly partial). A later session must
    build + serve normally, never serve the corpse, and its own
    staging reuse must tolerate the leftovers."""
    path = str(tmp_path / "store" / "artifact")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # corpse from a "crashed" FOREIGN pid: partial content
    foreign = f"{path}.tmp-999999"
    os.makedirs(foreign)
    with open(os.path.join(foreign, "content"), "w") as f:
        f.write("PARTIAL")
    # corpse from OUR OWN pid (a previous crashed attempt in this
    # process): must be swept before restaging
    own = f"{path}.tmp-{os.getpid()}"
    os.makedirs(own)
    with open(os.path.join(own, "junk"), "w") as f:
        f.write("x")

    _ensure_artifact(spark, path, "content", _build_marker("GOOD"))
    assert _served(path) == "GOOD"
    assert not os.path.exists(own)  # own corpse consumed by restage
    # the foreign corpse is inert — it is NOT the served path
    assert _served(path) != "PARTIAL"


def test_ensure_artifact_rename_race_loser_serves_winner(spark, tmp_path):
    """Lost rename race: a concurrent session renames ITS copy into
    place between our probe and our rename. Our rename fails
    (target exists), we must discard our staging copy and serve the
    winner's bytes — exactly one winner visible."""
    path = str(tmp_path / "store" / "artifact")

    def build_then_lose(tmp):
        _build_marker("LOSER")(tmp)
        # concurrent winner lands while we are "building"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        winner_tmp = f"{path}.tmp-winner"
        _build_marker("WINNER")(winner_tmp)
        os.rename(winner_tmp, path)

    _ensure_artifact(spark, path, "content", build_then_lose)
    assert _served(path) == "WINNER"
    # loser staging cleaned up
    assert not os.path.exists(f"{path}.tmp-{os.getpid()}")


def test_ensure_artifact_rename_failure_without_winner_raises(
    spark, tmp_path, monkeypatch
):
    """A rename that fails for any reason OTHER than losing the race
    (permissions, cross-device tempdir) must surface, not leave a
    missing artifact for the downstream read to trip over."""
    path = str(tmp_path / "store" / "artifact")

    def broken_rename(src, dst):
        raise OSError("EXDEV: cross-device link")

    monkeypatch.setattr(os, "rename", broken_rename)
    with pytest.raises(OSError, match="EXDEV"):
        _ensure_artifact(spark, path, "content", _build_marker("X"))
    assert not os.path.exists(path)


# ---------------------------------------------------------------------------
# IVF append: crashed-writer staging + partial footprints around the
# ingest-keyed replay (extends the exact-footprint replay pins).
# ---------------------------------------------------------------------------


@pytest.fixture()
def ivf_store(spark, tmp_path):
    emb = load_table(spark, "embeddings", SF_UNIT)
    base = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "index")
    similarity.ivf_build_index(base, path)
    return emb, batch, path


def _serve(spark, emb, path):
    return sorted(
        map(
            tuple,
            similarity.ivf_topk_from_index(
                spark, path, emb.filter(F.col("vec_id") < 5), nprobe=2, k=5
            )
            .select("query_id", "nbr_id", "rk")
            .collect(),
        )
    )


def test_ivf_append_ignores_and_reclaims_crashed_staging(spark, ivf_store):
    """A writer that crashed between staging and the per-cell moves
    leaves `_ingest_<key>/` behind with full parquet content. Serving
    must not read it (the invfile dir is the only serving surface);
    a replay of the same key must restage (mode=overwrite), complete
    the moves, and remove the staging dir."""
    emb, batch, path = ivf_store
    before = _serve(spark, emb, path)

    # simulate the crash: stage the batch exactly as the operator
    # does, but "die" before any move
    from tugas_2_big_data_spark.sources import sinks

    cents_dir = os.path.join(path, "centroids")
    assert os.path.exists(cents_dir)
    staging = os.path.join(path, "_ingest_b7")
    sinks.write_parquet(
        batch.select(
            F.lit(0).alias("cid"),
            F.col("vec_id").alias("nbr_id"),
            F.col("embedding").cast("array<double>").alias("nbr_vec"),
        ),
        staging,
        mode="overwrite",
        partition_by=["cid"],
    )
    assert glob.glob(os.path.join(staging, "cid=*", "*.parquet"))
    # serving is untouched by the corpse
    assert _serve(spark, emb, path) == before

    # replay the key for real: staging reclaimed, appends land once
    similarity.ivf_append_to_index(spark, path, batch, ingest_key="b7")
    assert not os.path.exists(staging)
    after = _serve(spark, emb, path)

    # uninterrupted twin
    emb2, batch2, path2 = (
        emb,
        batch,
        path + "_ref",
    )
    base = emb.filter(F.col("vec_id") % 2 == 0)
    similarity.ivf_build_index(base, path2)
    similarity.ivf_append_to_index(spark, path2, batch2, ingest_key="b7")
    assert after == _serve(spark, emb2, path2)


def test_ivf_append_replay_restores_partial_footprint(spark, ivf_store):
    """A crash mid-move leaves SOME cells with this key's ingest file
    and others without. Replaying the key must restore the exact full
    footprint — no duplicates in covered cells, no holes in missed
    ones — proven by row-level equality with an uninterrupted twin."""
    emb, batch, path = ivf_store
    similarity.ivf_append_to_index(spark, path, batch, ingest_key="b3")
    files = sorted(
        glob.glob(os.path.join(path, "invfile", "cid=*", "ingest-b3*.parquet"))
    )
    assert len(files) >= 2, "fixture needs >=2 touched cells"
    full_rows = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(path, "invfile"))
            .select("nbr_id")
            .collect(),
        )
    )
    # crash: half this key's moved files vanish (the move loop died)
    for f in files[: len(files) // 2]:
        os.remove(f)
    # and a stale EXTRA file from an earlier fatter attempt survives
    # in the last cell — the footprint sweep must remove it
    extra_dir = os.path.dirname(files[-1])
    shutil.copyfile(
        files[-1], os.path.join(extra_dir, "ingest-b3-9.parquet")
    )

    similarity.ivf_append_to_index(spark, path, batch, ingest_key="b3")
    replay_rows = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(path, "invfile"))
            .select("nbr_id")
            .collect(),
        )
    )
    assert replay_rows == full_rows
