"""spark.sql(...) over registered views — the engine's SQL front door."""

from pyspark.sql import functions as F

from amazon_kinesis_replay_spark.plans.sql_views import register_views


def test_register_views_and_query(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert "events" in names and "lineitem" in names
    out = spark.sql("""
        SELECT event_type, count(*) AS n, min(ts) AS first_ts
        FROM events GROUP BY event_type ORDER BY n DESC
    """).collect()
    assert sum(r["n"] for r in out) == spark.table("events").count()
    # joins across views work and timestamps are real timestamps
    joined = spark.sql("""
        SELECT n_name, count(*) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """)
    assert joined.count() > 0


def test_views_see_canonical_event_schema(spark, sf_dir):
    register_views(spark, sf_dir)
    dtypes = dict(spark.table("events").dtypes)
    assert dtypes["ts"] == "timestamp"   # not raw bigint nanos


def test_events_fixture_physical_type_is_handled(spark, sf_dir):
    """CANARY for the r4/r5 two-round regression: the driver has shipped
    events.ts as TIMESTAMP(NANOS) and as TIMESTAMP(MICROS,
    isAdjustedToUTC=0) across rounds; tables.load must normalize WHATEVER
    the current fixture stores to a usable TimestampType. If this fails,
    the physical type changed again — extend the normalization branch in
    tables.load (and keep unix_millis working) before anything else."""
    import pyarrow.parquet as pq

    from amazon_kinesis_replay_spark.tables import load, table_path
    arrow_t = pq.ParquetFile(
        table_path(sf_dir, "events")).schema_arrow.field("ts").type
    e = load(spark, sf_dir, "events")
    assert dict(e.dtypes)["ts"] == "timestamp", (
        f"events.ts arrived as {dict(e.dtypes)['ts']!r} "
        f"(physical {arrow_t}) — tables.load does not normalize this "
        "physical type; add a branch for it")
    # the expression class that broke for two rounds must analyze and run
    n = e.select(F.unix_millis("ts").alias("ms")).filter("ms > 0").count()
    assert n == e.count()
