"""Range/interval join — the bucketed equi-join pattern.

Spark has no native interval-join operator; a naive `a.ts BETWEEN b.lo AND
b.hi` join plans as BroadcastNestedLoop/Cartesian, which is quadratic and
dies at scale. The scale pattern: quantize time into fixed buckets, explode
each interval over the buckets it covers, equi-join on the bucket id (hash
join, shuffle on a 64-bit key), then re-check exact containment. Work is
proportional to (#points + #interval-bucket entries + #true matches), not
#points x #intervals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str = "ts", lo: str = "lo", hi: str = "hi",
                  bucket_width_s: int = 3600) -> DataFrame:
    """Join each point to every interval containing it ([lo, hi) semantics).

    points: any columns + `point_ts` timestamp.
    intervals: any columns + `lo`/`hi` timestamps; hi - lo may exceed the
    bucket width (intervals explode over all covered buckets).
    """
    # Bucket from exact epoch MICROS — the full precision of a Spark
    # timestamp (events.parquet is ns-truncated-to-µs). Bucketing at any
    # coarser unit truncates, which can place a point in the same truncated
    # unit as a finer-grained exclusive `hi` one bucket past the interval's
    # exploded range whenever that unit is a bucket boundary (a missed
    # match, not a false positive the exact re-check could repair).
    width_us = bucket_width_s * 1_000_000
    p_bucket = F.floor(F.unix_micros(F.col(point_ts)) / width_us)
    p = points.withColumn("__bucket", p_bucket)

    lo_b = F.floor(F.unix_micros(F.col(lo)) / width_us)
    # hi is exclusive: the last covered bucket is the one holding hi - 1µs
    hi_b = F.floor((F.unix_micros(F.col(hi)) - 1) / width_us)
    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(lo_b, F.greatest(hi_b, lo_b))))

    joined = p.join(iv, "__bucket").filter(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi)))
    return joined.drop("__bucket")


def multi_resolution_rollup(events: DataFrame, ts_col: str = "ts",
                            resolutions_s: tuple[int, ...] = (60, 3600, 86400),
                            group_col: str | None = None,
                            persist: bool = True) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup at several resolutions:
    counts per (bucket, group), stacked with a `resolution_s`
    discriminator.

    Plan shape: when every resolution is a multiple of the finest (the
    hypertable case — 1min/1h/1day), the raw data is scanned and
    aggregated ONCE at the finest grain; every coarser level folds the
    finest level's partials (#fine-buckets rows, persisted) — identical
    results to independent aggregates because counts are decomposable,
    but a 100 TB input is read once instead of once per level. Falls back
    to independent per-level aggregates for non-nesting resolutions.

    Cache ownership (r7 review): the returned DataFrame is lazily
    derived from the persisted finest-grain table, so this operator
    CANNOT unpersist it — the cache (#fine-buckets rows, bounded) lives
    until the session ends or the caller releases it via
    `spark.catalog.clearCache()`. Repeated calls in one session each pin
    their own copy; pass persist=False to trade the single-scan
    guarantee for zero cache residency (each coarser level then re-folds
    from its own scan — the pre-r1 shape)."""
    def bucket_ms(src_s, res: int):
        return (F.floor(src_s / res) * res * 1000).cast("long")

    finest = min(resolutions_s)
    group_keys = [F.col(group_col)] if group_col else []
    if all(r % finest == 0 for r in resolutions_s):
        base = (events.groupBy(
            bucket_ms(F.unix_timestamp(F.col(ts_col)), finest)
            .alias("bucket_start_ms"), *group_keys)
            .agg(F.count("*").alias("n_events")))
        if persist:
            base = base.persist()      # consumed once per level
        outs = []
        for res in resolutions_s:
            if res == finest:
                out = base
            else:
                out = (base.groupBy(
                    bucket_ms(F.col("bucket_start_ms") / 1000, res)
                    .alias("bucket_start_ms"), *group_keys)
                    .agg(F.sum("n_events").cast("long").alias("n_events")))
            outs.append(out.withColumn("resolution_s",
                                       F.lit(res).cast("long")))
    else:
        outs = []
        for res in resolutions_s:
            out = (events.groupBy(
                bucket_ms(F.unix_timestamp(F.col(ts_col)), res)
                .alias("bucket_start_ms"), *group_keys)
                .agg(F.count("*").alias("n_events"))
                .withColumn("resolution_s", F.lit(res).cast("long")))
            outs.append(out)
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result
