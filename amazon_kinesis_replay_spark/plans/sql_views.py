"""Spark SQL surface: register the fixture tables as temp views so users
can query the engine with plain ``spark.sql(...)`` — the reference has no
query language (SURVEY §3); this is part of the engine's added surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..tables import TABLES, load


def register_views(spark: SparkSession, sf_dir: str,
                   prefix: str = "") -> list[str]:
    """Create (or replace) one temp view per fixture table. Returns the
    view names. Views see the engine's canonicalized schemas (events.ts is
    a proper timestamp, not raw nanos)."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names
