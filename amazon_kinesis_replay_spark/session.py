"""SparkSession construction with scale-aware defaults.

Single place to encode the engine's execution posture: AQE on (runtime
re-planning, skew-join handling), UTC session timezone (deterministic
timestamp arithmetic for the DuckDB oracle), Arrow enabled (fast Pandas-UDF
boundary for the few operators that need Python).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs applied to sessions we build AND re-asserted (when runtime-settable)
#: on sessions handed to us by the driver.
ENGINE_RUNTIME_CONF = {
    # Determinism: all timestamp <-> epoch math in UTC, matching DuckDB.
    "spark.sql.session.timeZone": "UTC",
    # Let AQE coalesce shuffle partitions and split skewed ones at runtime.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Older events fixtures stored TIMESTAMP(NANOS) parquet, which Spark's
    # vectorized reader rejects; read as long and convert (tables.load).
    # Harmless for the current TIMESTAMP(MICROS) fixtures, kept so either
    # physical type loads (tables.load normalizes both to TimestampType).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def build_spark(app_name: str = "amazon-kinesis-replay-spark",
                shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) a local session sized from $SPARK_GRAFT_CPUS."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = str(shuffle_partitions or int(cpus))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.warehouse.dir", "/tmp/spark-graft-warehouse")
    )
    for k, v in ENGINE_RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Re-assert runtime-settable engine configs on an externally built
    session (the driver owns the session in `__spark_entry__` calls), and
    make this package importable on executor Python workers."""
    for k, v in ENGINE_RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build; keep going
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors via addPyFile (once per session).

    Python-UDF closures (mapInPandas decoders, foreachPartition senders)
    reference module-level functions, which cloudpickle serializes BY
    REFERENCE — workers must be able to import the package. When the driver
    process was launched from outside the repo, the workers' sys.path does
    not include it; a zipped copy on the Spark files channel fixes that in
    both local and cluster mode.
    """
    if getattr(spark, "_akrs_pyfiles_shipped", False):
        return
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    try:
        staging = tempfile.mkdtemp(prefix="akrs-pyfiles-")
        zip_base = os.path.join(staging, "amazon_kinesis_replay_spark")
        archive = shutil.make_archive(
            zip_base, "zip",
            root_dir=os.path.dirname(pkg_dir),
            base_dir=os.path.basename(pkg_dir))
        spark.sparkContext.addPyFile(archive)
        spark._akrs_pyfiles_shipped = True
    except Exception:
        pass  # best-effort: repo-rooted runs work without it
