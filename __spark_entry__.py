"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``amazon_kinesis_replay_spark``; this module is the
thin contract surface. Query registry: amazon_kinesis_replay_spark/plans/
registry.py (operator IDs and reference citations in SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Defensive: make the package importable even when this module is loaded by
# file path from another working directory.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from amazon_kinesis_replay_spark.plans import QUERIES  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.2 milestone-0 slice): seek-filter ->
    JSON-attr parse -> anchored ingestion-time derivation -> event-time
    order — the reference's whole batch prefix in one Catalyst plan."""
    from pyspark.sql import functions as F

    from amazon_kinesis_replay_spark.functions import jsonf
    from amazon_kinesis_replay_spark.operators import replay_ops
    from amazon_kinesis_replay_spark.plans.registry import (
        INGESTION_START_MS, SPEEDUP)
    from amazon_kinesis_replay_spark.session import ensure_engine_conf
    from amazon_kinesis_replay_spark.tables import load

    ensure_engine_conf(spark)
    events = load(spark, SF_SMOKE_DIR, "events")
    seeked = replay_ops.seek(events, "ts", "2024-01-05 00:00:00")
    parsed = seeked.withColumn(
        "k", jsonf.json_attr(F.col("props"), "k").cast("int"))
    derived = replay_ops.with_ingestion_time(
        parsed, "ts", INGESTION_START_MS, SPEEDUP)
    return replay_ops.order_by_event_time(
        derived.select("event_id", "ts", "event_type", "k", "ingestion_ms"),
        "ts", "event_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per query (omitted for non-SQL-
    expressible ops -> driver records a rows-only check). A spec.oracle
    may be a zero-arg callable producing the SQL (used when the oracle
    embeds independently-recomputed literals, e.g. simhash values); it is
    resolved here so consumers always see plain strings."""
    return {name: (spec.oracle() if callable(spec.oracle) else spec.oracle)
            for name, spec in QUERIES.items()
            if spec.oracle is not None}
