"""Salted aggregation/join equivalence + plan shape."""

from pyspark.sql import functions as F

from amazon_kinesis_replay_spark.operators import skew
from amazon_kinesis_replay_spark.tables import load


def test_salted_agg_matches_plain(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    plain = {(r["event_type"],): (r["n"], r["total"]) for r in
             e.groupBy("event_type").agg(
                 F.count("*").alias("n"),
                 F.sum("value").alias("total")).collect()}
    salted = {(r["event_type"],): (r["n"], r["total"]) for r in
              skew.salted_agg(e, ["event_type"],
                              {"n": (F.count("*"), "sum"),
                               "total": (F.sum("value"), "sum")},
                              n_salts=16).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6 * abs(plain[k][1])


def test_salted_agg_rejects_nondecomposable():
    """F.avg through the old string-sniffing path silently merged partials
    as sum (wrong answer); the explicit-spec API must refuse instead."""
    import pytest
    with pytest.raises(ValueError, match="salted_avg"):
        skew.salted_agg(None, ["k"], {"a": (F.avg("x"), "avg")})
    with pytest.raises(ValueError):
        skew.salted_agg(None, ["k"], {"a": F.avg("x")})  # bare Column


def test_salted_avg_matches_plain(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    plain = {r["event_type"]: r["a"] for r in
             e.groupBy("event_type").agg(F.avg("value").alias("a")).collect()}
    salted = {r["event_type"]: r["avg"] for r in
              skew.salted_avg(e, ["event_type"], "value",
                              n_salts=16).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-9 * max(1.0, abs(plain[k]))


def test_salted_agg_two_stage_plan(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    out = skew.salted_agg(e, ["event_type"], {"n": (F.count("*"), "sum")},
                          n_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # two logical aggregations -> at least 4 HashAggregate nodes
    # (partial+final per stage)
    assert plan.count("HashAggregate") >= 4


def test_salted_join_matches_plain(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name") \
        .withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, "o_custkey").count()
    salted = skew.salted_join_left(o, c, "o_custkey", n_salts=8).count()
    assert plain == salted
