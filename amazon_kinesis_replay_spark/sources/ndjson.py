"""NDJSON event source (OP-SRC-* / OP-PARSE-*).

Reference behavior being re-expressed (SURVEY §2.1):
- prefix listing scan          JsonEventS3Iterator.java:61-62 -> file-source listing
- per-object line reads        JsonEventS3Iterator.java:118   -> spark.read.text
- transparent decompression    JsonEventS3Iterator.java:162-167 -> Hadoop codecs
  by extension (.gz/.bz2/...; behavior-sniffing fallback is lost — documented
  deviation, SURVEY §4)
- suffix file pruning          JsonEventS3Iterator.java:139-143 -> input_file_name
  filter (+ pathGlobFilter include when the caller knows the data glob)
- corrupt-object skip          JsonEventS3Iterator.java:151-160 -> ignoreCorruptFiles
  (the reference's time-anchor reset side effect is NOT reproduced; SURVEY §1.3)
- malformed-row drop           JsonEventS3Iterator.java:187-193 -> null-drop on
  try_to_timestamp of the configured attribute

Works against any Hadoop-visible path (file://, s3a://). One row per event:
(payload string, ts timestamp), exactly the reference's JsonEvent shape
minus ingestion time (derived later, OP-PROJ-INGEST).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import ReplayConfig
from ..functions import jsonf


def _finish(lines: DataFrame, cfg: ReplayConfig) -> DataFrame:
    """Shared tail: suffix-prune files, parse timestamp attr, drop malformed."""
    if cfg.object_suffix_to_skip:
        lines = lines.filter(
            ~F.input_file_name().endswith(cfg.object_suffix_to_skip))
    parsed = lines.select(
        F.col("value").alias("payload"),
        jsonf.json_attr_ts(F.col("value"), cfg.timestamp_attribute).alias("ts"),
    )
    return parsed.filter(F.col("ts").isNotNull())


def read_events(spark: SparkSession, cfg: ReplayConfig,
                path_glob_filter: str | None = None) -> DataFrame:
    """Batch scan of an NDJSON prefix -> (payload, ts)."""
    reader = spark.read.option("ignoreCorruptFiles", "true")
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    return _finish(reader.text(cfg.source_path), cfg)


def read_events_stream(spark: SparkSession, cfg: ReplayConfig,
                       max_files_per_trigger: int = 1,
                       path_glob_filter: str | None = None) -> DataFrame:
    """Streaming scan of an NDJSON prefix.

    maxFilesPerTrigger is the micro-batch analogue of the reference's
    bounded reader buffer (OP-FLOW-BACKPRESSURE,
    JsonEventBufferedReader.java:38-46): it caps how far the source can run
    ahead of the paced sink.
    """
    reader = (spark.readStream
              .option("ignoreCorruptFiles", "true")
              .option("maxFilesPerTrigger", str(max_files_per_trigger)))
    if path_glob_filter:
        reader = reader.option("pathGlobFilter", path_glob_filter)
    return _finish(reader.text(cfg.source_path), cfg)
