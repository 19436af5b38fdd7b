"""Kinesis stream source (the inverse of the reference's sink direction).

BASELINE.json names the Spark approach "Structured Streaming + Kinesis
source". Spark has no first-party Kinesis connector; the maintained path is
the spark-sql-kinesis (Qubole lineage) or AWS's spark-streaming-kinesis-asl
packages. Neither ships in this container, so this module import-gates the
connector and exposes the same (payload, ts) shape as sources/ndjson so the
rest of the engine is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ReplayConfig
from ..functions import jsonf

#: Connector short names we know how to drive, in preference order.
_FORMATS = ("aws-kinesis", "kinesis")


def read_kinesis_stream(spark: SparkSession, cfg: ReplayConfig,
                        starting_position: str = "TRIM_HORIZON") -> DataFrame:
    """Streaming read from the configured Kinesis stream -> (payload, ts).

    Requires a Kinesis DSv2 connector on the classpath (e.g.
    spark-sql-kinesis). Raises NotImplementedError with packaging guidance
    when absent — the NDJSON file source (sources/ndjson) is the
    connector-free path.
    """
    if not cfg.stream_arn:
        raise ValueError("ReplayConfig.stream_arn is required")
    last_err: Exception | None = None
    for fmt in _FORMATS:
        try:
            raw = (spark.readStream.format(fmt)
                   .option("streamName", cfg.stream_arn.rsplit("/", 1)[-1])
                   .option("startingposition", starting_position)
                   .load())
            break
        except Exception as exc:  # connector missing / option mismatch
            last_err = exc
    else:
        raise NotImplementedError(
            "no Kinesis connector on the classpath; add a spark-sql-kinesis "
            "compatible package (--packages) or replay from files via "
            "sources.ndjson.read_events_stream") from last_err
    payload = F.col("data").cast("string").alias("payload")
    return (raw.select(payload,
                       jsonf.json_attr_ts(F.col("data").cast("string"),
                                          cfg.timestamp_attribute).alias("ts"))
            .filter(F.col("ts").isNotNull()))
