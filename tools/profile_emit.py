#!/usr/bin/env python
"""One-off profiler for the two replay-emit bench entries: times each run
N times and (for partitioned mode) splits the anchor-agg job from the emit
job so the r3 bench regression can be attributed. Not part of the suite.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from amazon_kinesis_replay_spark.config import ReplayConfig
from amazon_kinesis_replay_spark.session import build_spark
from amazon_kinesis_replay_spark.streaming.replay import ReplayEngine
from amazon_kinesis_replay_spark.streaming.sinks import InMemorySink
from amazon_kinesis_replay_spark.tables import load


class _NoopSink:
    def put_records(self, records):
        return []


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("N", "5"))
    spark = build_spark("profile-emit")
    spark.sparkContext.setLogLevel("ERROR")

    events = load(spark, sf_dir, "events").select(
        F.col("props").alias("payload"), "ts")
    print("rows:", events.count())

    # -- driver mode, split: probe / sort+toPandas / loop --------------------
    for i in range(n):
        engine = ReplayEngine(
            ReplayConfig(speedup_factor=1e12), InMemorySink(), mode="driver")
        t0 = time.monotonic()
        bound = engine.cfg.driver_mode_max_rows
        events.limit(bound + 1).count()
        t1 = time.monotonic()
        pdf = (events.select("payload", "ts")
               .orderBy(F.col("ts").asc()).toPandas())
        t2 = time.monotonic()
        engine2 = ReplayEngine(
            ReplayConfig(speedup_factor=1e12), InMemorySink(), mode="driver")
        t3 = time.monotonic()
        engine2.process_batch(events, 0)
        t4 = time.monotonic()
        print(f"driver[{i}]: probe={t1-t0:.3f} sort+toPandas={t2-t1:.3f} "
              f"full_process_batch={t4-t3:.3f} rows={len(pdf)}")

    # -- partitioned mode, split: agg / emit --------------------------------
    for i in range(n):
        engine = ReplayEngine(
            ReplayConfig(speedup_factor=1e12, sender_threads=8),
            _NoopSink, mode="partitioned")
        t0 = time.monotonic()
        events.agg(F.min("ts"), F.max("ts")).toPandas()
        t1 = time.monotonic()
        engine.process_batch(events, 0)
        t2 = time.monotonic()
        print(f"partitioned[{i}]: agg_alone={t1-t0:.3f} "
              f"full_process_batch={t2-t1:.3f}")


if __name__ == "__main__":
    main()
