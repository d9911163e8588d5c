"""SparkSession factory and session tuning.

The reference builds ad-hoc sessions (one per Mongo collection at
``yfinance_transform.py:104-107``, a 2g/2g local[*] session at
``idx_transform.py:76-93``). Our engine uses ONE session with AQE and
Arrow enabled, UTC timezone (oracle comparability), and shuffle
parallelism sized to the machine rather than the Spark default of 200.

At cluster scale the same factory applies: AQE handles runtime
coalescing/skew; shuffle partitions should be ~2-3× total cores.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tugas_2_big_data_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces shuffle outputs below minPartitionSize (default
        # 1 MB). Kilobyte-scale intermediates with compute-heavy
        # projections above them (HOF folds, Arrow UDFs) collapse to ONE
        # task and serialize on a single core; 64 KB keeps such stages
        # wide while still folding away empty/trivial partitions. At
        # cluster scale partitions are MBs+ and this setting is inert.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        # InferFiltersFromGenerate rewrites explode(expr) into
        # size(expr) > 0 AND ... filters and pushes them below the
        # projection — substituting the FULL generator expression into
        # the filter. For computed arrays (shingles, band structs,
        # probe lists) that re-evaluates an expensive HOF chain once
        # per filter check on the narrow pre-shuffle stage: the
        # exhaustive n-gram Jaccard measured 10.5 s -> 2.9 s at sf0.1
        # with the rule off. Explode already skips empty arrays, so the
        # rule is a pure pre-prune optimization we never benefit from.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Trained ANN state (centroids/codebooks) is checkpointed lazily
        # (eager=False saves one blocking driver job per query) and is
        # consumed via crossJoin(broadcast(...)), so the whole multi-job
        # training loop runs inside the broadcast-exchange future and
        # counts against broadcastTimeout. The default 300 s would fail
        # a >5 min train at the 100 TB design point; the state itself is
        # k·dim doubles (KBs), so a long timeout is safe.
        .config("spark.sql.broadcastTimeout", "36000")
        # The default JVM code cache (240 MB) overflows after a few dozen
        # wide whole-stage-codegen + higher-order-function queries; the
        # JIT then silently stops compiling and hot expression loops run
        # interpreted (measured: the 45-query bench total halved,
        # 132 s → 62 s, with the larger cache). Driver == executor JVM in
        # local mode; set spark.executor.extraJavaOptions too on a real
        # cluster.
        .config(
            "spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=2g"
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally-provided session.

    The verification driver supplies its own SparkSession; these confs are
    runtime-mutable so we can still pin the semantics our plans rely on
    (UTC timestamps for date_format grains, AQE, Arrow).
    """
    conf = {
        "spark.sql.session.timeZone": "UTC",
        # reference semantics are Spark-3 non-ANSI (cast → NULL, no
        # arithmetic exceptions); Spark 4 defaults ANSI on
        "spark.sql.ansi.enabled": "false",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
        "spark.sql.optimizer.excludedRules":
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # lazy ANN training checkpoints materialize inside broadcast
        # futures — see get_spark for the full rationale
        "spark.sql.broadcastTimeout": "36000",
    }
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build — keep going
    ship_package(spark)
    return spark


_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers.

    Pandas-UDF closures (text pipeline, multimodal decode) reference
    this module by name; when the driver process wasn't launched from
    the repo root, worker processes can't import it and every task dies
    with ModuleNotFoundError. Zip the package and addPyFile it — works
    identically in local mode and on a real cluster.
    """
    sc = spark.sparkContext
    app = sc.applicationId or "local"
    if app in _SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"tugas_2_big_data_spark_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zip_path, "w") as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    rel = os.path.join(
                        "tugas_2_big_data_spark", os.path.relpath(full, pkg_root)
                    )
                    zf.write(full, rel)
    try:
        sc.addPyFile(zip_path)
    except Exception:
        pass  # same archive already registered on this context
    _SHIPPED.add(app)
