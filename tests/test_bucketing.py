"""Bucketed co-located join: correct results AND an exchange-free plan."""

from amazon_kinesis_replay_spark import bucketing
from amazon_kinesis_replay_spark.tables import load


def test_bucketed_join_is_exchange_free(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bucketing.write_bucketed(o, "orders_b", "o_orderkey", n_buckets=8)
    bucketing.write_bucketed(l, "lineitem_b", "l_orderkey", n_buckets=8)
    try:
        joined = bucketing.co_located_join(
            spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan   # co-located reads
        # results match the plain join
        plain = o.join(l, o["o_orderkey"] == l["l_orderkey"]).count()
        assert joined.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
