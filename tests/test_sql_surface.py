"""spark.sql(...) over registered views — the engine's SQL front door."""

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
