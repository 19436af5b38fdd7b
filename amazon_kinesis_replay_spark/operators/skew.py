"""Skew-mitigation helpers for hot-key workloads at scale.

AQE's skew-join splitting handles most cases (enabled in session.py); these
helpers cover the aggregation-side patterns AQE does not: a single hot
group key funneling into one reducer, and hot build-side keys in joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: merge functions a stage-1 partial may declare
_MERGES = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, key_cols: list[str],
               aggs: dict[str, tuple[Column, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-stage aggregation over salted keys.

    Stage 1 groups by (key, salt) — the hot key's rows spread over n_salts
    reducers; stage 2 merges the partials per key (n_salts rows per key,
    trivial).

    aggs: output_name -> (stage-1 aggregate Column, merge) where merge is
    one of "sum" | "min" | "max" — the EXPLICIT function that combines
    stage-1 partials (count partials merge as "sum"; sum/min/max as
    themselves). Being explicit is the contract: an earlier version
    sniffed the stage-1 expression's JVM string and silently defaulted to
    sum, so a non-decomposable aggregate like F.avg produced
    sum-of-partial-averages — wrong, and invisibly so. Aggregates that
    don't decompose into one partial + one merge (avg, stddev, exact
    percentiles) must be expressed from decomposable parts — see
    `salted_avg` — or rejected; anything but a recognized merge name
    raises ValueError.
    """
    for name, spec in aggs.items():
        if (not isinstance(spec, tuple) or len(spec) != 2
                or spec[1] not in _MERGES):
            raise ValueError(
                f"aggs[{name!r}] must be (stage1 Column, merge) with merge "
                f"in {sorted(_MERGES)}; got {spec!r}. Non-decomposable "
                "aggregates (avg, ...) need explicit partials — see "
                "salted_avg.")
    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(),
                                            F.lit(n_salts)))
    stage1 = salted.groupBy(*key_cols, "__salt").agg(
        *[c.alias(f"__p_{name}") for name, (c, _) in aggs.items()])
    merged = stage1.groupBy(*key_cols).agg(
        *[_MERGES[merge](F.col(f"__p_{name}")).alias(name)
          for name, (_, merge) in aggs.items()])
    return merged


def salted_avg(df: DataFrame, key_cols: list[str], value_col: str,
               out_col: str = "avg", n_salts: int = 16) -> DataFrame:
    """Skew-safe average: the decomposable (sum, count) pair merged per
    key, divided at the end — the correct two-stage form of the aggregate
    that salted_agg deliberately refuses to guess."""
    parts = salted_agg(
        df, key_cols,
        {"__sum": (F.sum(value_col), "sum"),
         "__cnt": (F.count(value_col), "sum")},
        n_salts=n_salts)
    return (parts.withColumn(
        out_col, F.col("__sum").cast("double") / F.col("__cnt"))
        .drop("__sum", "__cnt"))


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
