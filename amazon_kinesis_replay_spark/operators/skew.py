"""Skew-mitigation helpers for hot-key workloads at scale.

AQE's skew-join splitting handles most cases (enabled in session.py); these
helpers cover the aggregation-side patterns AQE does not: a single hot
group key funneling into one reducer, and hot build-side keys in joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, Column],
               n_salts: int = 16) -> DataFrame:
    """Two-stage aggregation over salted keys.

    Stage 1 groups by (key, salt) — the hot key's rows spread over n_salts
    reducers; stage 2 merges the partials per key (n_salts rows per key,
    trivial). Supported merge semantics: sum/count/min/max style partials
    (the caller provides stage-1 expressions; stage 2 re-aggregates with
    the matching merge in `merge_for`).

    aggs: output_name -> stage-1 aggregate Column (e.g. F.count("*"),
    F.sum("x")). count merges as sum; sum/min/max merge as themselves.
    """
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(),
                                            F.lit(n_salts)))
    stage1 = salted.groupBy(*key_cols, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, c in aggs.items()])
    merged = stage1.groupBy(*key_cols).agg(
        *[_merge_for(name, aggs[name]).alias(name) for name in aggs])
    return merged


def _merge_for(name: str, stage1_col: Column) -> Column:
    """Merge partials: COUNT partials sum; SUM/MIN/MAX merge as themselves."""
    expr = stage1_col._jc.toString().lower()
    col = F.col(f"__p_{name}")
    if expr.startswith("count"):
        return F.sum(col)
    if expr.startswith("min"):
        return F.min(col)
    if expr.startswith("max"):
        return F.max(col)
    return F.sum(col)  # sum-like default


def salted_join_left(big: DataFrame, small: DataFrame, key: str,
                     n_salts: int = 8) -> DataFrame:
    """Hot-key equi-join: salt the big side, replicate the small side
    n_salts times, join on (key, salt). Use when one build-side key is so
    hot that even AQE's skew split leaves a straggler.
    """
    b = big.withColumn("__salt", F.pmod(F.monotonically_increasing_id(),
                                        F.lit(n_salts)))
    s = small.crossJoin(
        F.broadcast(big.sparkSession.range(n_salts)
                    .select(F.col("id").cast("int").alias("__salt"))))
    out = b.join(s, [key, "__salt"])
    return out.drop("__salt")
