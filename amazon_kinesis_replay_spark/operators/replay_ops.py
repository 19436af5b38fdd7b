"""Batch relational forms of the reference's replay operators.

Each function is a pure DataFrame -> DataFrame transform (composable, fully
Catalyst-visible — filters and projections here push down into the parquet /
json scan). Reference citations point into /root/reference/src/main/java/com/
amazonaws/samples/kinesis/replay/ (short names as in SURVEY.md).

Scale posture:
- seek / projections / normalization: narrow ops, no shuffle.
- ordering: `repartitionByRange` + `sortWithinPartitions` (a single range
  shuffle; Spark's SortExec spills, so a 100 TB sort is disk-bound not
  OOM-bound). A global `orderBy` is equivalent; we expose both.
- global row numbering (needed for 500-record batch assignment): two-pass
  partition-offset scheme — per-partition window (parallel) + tiny offset
  broadcast — NOT a single-partition global Window, which would serialize
  the whole dataset through one task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Filters (OP-FILTER-*)
# --------------------------------------------------------------------------


def seek(df: DataFrame, ts_col: str, seek_to: str) -> DataFrame:
    """OP-FILTER-SEEK — start replay at an event-time lower bound.

    Reference: JsonEventS3Iterator.java:79-101 probes every 10,000th line
    while seeking (sampled, may overshoot). The declarative filter is exact
    and strictly stronger; parquet row-group min/max stats + partition
    pruning give the same skip-ahead effect without sampling.
    """
    return df.filter(F.col(ts_col) >= F.lit(seek_to).cast("timestamp"))


def non_empty(df: DataFrame) -> bool:
    """OP-FILTER-NONEMPTY — empty-source guard (RePlayer.java:123-126)."""
    return not df.isEmpty()


# --------------------------------------------------------------------------
# Projections (OP-PROJ-*)
# --------------------------------------------------------------------------


def ingestion_time_ms(ts_col: Column, first_ts_col: Column,
                      ingestion_start_ms: int, speedup: float) -> Column:
    """OP-PROJ-INGEST — the affine event-time -> ingestion-time map.

    ingestion = start + round((event_ts - first_event_ts) / speedup), in
    milliseconds: JsonEvent.java:96-97. `first_ts_col` is the anchor (the
    reference anchors on the first parsed event, JsonEvent.java:91-93; batch
    form uses min(ts), computed once and broadcast — see
    `with_ingestion_time`). Returns epoch-millis BIGINT for deterministic
    cross-engine comparison.
    """
    delta = F.unix_millis(ts_col) - F.unix_millis(first_ts_col)
    return (F.lit(ingestion_start_ms)
            + F.round(delta / F.lit(float(speedup))).cast("long"))


def with_ingestion_time(df: DataFrame, ts_col: str, ingestion_start_ms: int,
                        speedup: float, out_col: str = "ingestion_ms") -> DataFrame:
    """Derive ingestion time for every row, anchored at global min(ts).

    Two-pass + broadcast: the 1-row min(ts) aggregate cross-joins back in
    (Catalyst plans it as a broadcast nested loop over a 1-row build side),
    instead of `min over ()` which would funnel all rows through a single
    window partition at scale.
    """
    anchor = df.agg(F.min(ts_col).alias("__first_ts"))
    return (
        df.crossJoin(F.broadcast(anchor))
        .withColumn(out_col, ingestion_time_ms(
            F.col(ts_col), F.col("__first_ts"), ingestion_start_ms, speedup))
        .drop("__first_ts")
    )


def normalize_payload(df: DataFrame, payload_col: str,
                      out_col: str | None = None) -> DataFrame:
    """OP-PROJ-NEWLINE — append a trailing newline iff missing
    (JsonEvent.java:43-49, "easier digestible by firehose and athena")."""
    out = out_col or payload_col
    c = F.col(payload_col)
    return df.withColumn(
        out, F.when(c.endswith("\n"), c).otherwise(F.concat(c, F.lit("\n"))))


def serialize_payload(df: DataFrame, payload_col: str,
                      out_col: str = "payload_bytes") -> DataFrame:
    """OP-PROJ-SERIALIZE — UTF-8 payload bytes for the sink
    (JsonEvent.java:118-124)."""
    return df.withColumn(out_col, F.encode(F.col(payload_col), "UTF-8"))


# --------------------------------------------------------------------------
# Ordering (OP-SORT-*)
# --------------------------------------------------------------------------


def order_by_event_time(df: DataFrame, ts_col: str, *tiebreak: str) -> DataFrame:
    """OP-SORT-EVENTTIME — total order by event time.

    Reference re-sorts within a 100k-row priority queue
    (JsonEventBufferedReader.java:39-46); batch Spark sorts exactly:
    range-partition shuffle + per-partition spill-able sort.
    """
    return df.orderBy(F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak])


def head_min_event(df: DataFrame, ts_col: str) -> DataFrame:
    """OP-PEEK-MIN — non-destructive smallest-element peek
    (JsonEventBufferedReader.java:84-86) as a min() aggregate."""
    return df.agg(F.min(ts_col).alias("min_ts"))


# --------------------------------------------------------------------------
# Global indexing + sink shaping (OP-SINK-KINESIS batching, OP-SINK-PARTKEY)
# --------------------------------------------------------------------------


def with_global_index(df: DataFrame, order_cols: list[str],
                      out_col: str = "rn", num_partitions: int | None = None) -> DataFrame:
    """Scalable global 1-based row number in `order_cols` order.

    Partition-offset scheme, expressed as ONE declarative plan:
      1. range-partition by the order keys (the only full-data shuffle),
         sortWithinPartitions, and number rows per partition via
         monotonically_increasing_id's documented bit layout (partition id
         in the upper bits, a 0-based in-partition counter in the lower 33
         — assigned in row order, i.e. in sort order here). This avoids the
         second full-data hash shuffle a Window.partitionBy(pid) would add.
      2. per-partition counts → prefix-sum offsets (a window over
         #partitions rows, not #rows) → broadcast-join back on pid.

    Both the numbering branch and the offsets branch hang off the SAME
    repartitionByRange subplan, so Catalyst's ReuseExchange materializes
    the shuffle once and both consumers read identical partitions (same
    AQE coalescing — decided once per shuffle stage). This is what makes
    the scheme correct under retries/speculation: range sampling "may not
    be consistent" across separate executions, so an earlier version that
    collect()ed counts in one job and re-ran the shuffle in the next could
    in principle see different bounds and emit duplicate/gapped indexes.
    No driver collect, no extra job, one shuffle of the data.

    Equivalent result to `row_number() over (order by ...)` but never
    serializes the dataset through a single task.
    """
    cols = [F.col(c) for c in order_cols]
    ranged = df.repartitionByRange(*(([num_partitions] if num_partitions else []) + cols))
    local_mask = (1 << 33) - 1
    local = (ranged.sortWithinPartitions(*cols)
             .withColumn("__mid", F.monotonically_increasing_id())
             .withColumn("__pid", F.shiftrightunsigned("__mid", 33).cast("int"))
             .withColumn("__local_rn",
                         (F.col("__mid").bitwiseAND(F.lit(local_mask)) + 1))
             .drop("__mid"))
    # Offsets as a subplan over the same exchange: exclusive prefix sum of
    # per-partition counts. The cumsum window runs in a single task over
    # #partitions rows — O(parallelism), not O(data).
    off_w = (Window.orderBy("__pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    off_df = (ranged.groupBy(F.spark_partition_id().alias("__pid"))
              .agg(F.count("*").alias("__cnt"))
              .withColumn("__off", F.coalesce(F.sum("__cnt").over(off_w),
                                              F.lit(0)).cast("long"))
              .drop("__cnt"))
    return (local.join(F.broadcast(off_df), "__pid")
            .withColumn(out_col, F.col("__local_rn") + F.col("__off"))
            .drop("__pid", "__local_rn", "__off"))


def assign_batches(df: DataFrame, order_cols: list[str],
                   max_per_batch: int = 500, out_col: str = "batch_id") -> DataFrame:
    """OP-SINK-KINESIS batching — deterministic ≤500-record batch ids.

    batch_id = floor((rn - 1) / max_per_batch) over the event-time order;
    mirrors drainTo(batch, 500) at KinesisProducer.java:112 with the service
    limit constant at :25.
    """
    idx = with_global_index(df, order_cols, out_col="__rn")
    return idx.withColumn(
        out_col, F.floor((F.col("__rn") - 1) / max_per_batch)).drop("__rn")


def partition_key(df: DataFrame, out_col: str = "partition_key") -> DataFrame:
    """OP-SINK-PARTKEY — per-record random partition key
    (KinesisProducer.java:197-199, UUID.randomUUID) for uniform shard
    spread. Nondeterministic by design; oracle-checked queries use
    `surrogate_shard` instead."""
    return df.withColumn(out_col, F.expr("uuid()"))


def surrogate_shard(df: DataFrame, key_col: str, n_shards: int,
                    out_col: str = "shard") -> DataFrame:
    """Deterministic stand-in for the UUID shard spread (SURVEY §2.9):
    shard = key % n_shards, checkable against the SQL oracle."""
    return df.withColumn(out_col, F.pmod(F.col(key_col), F.lit(n_shards)).cast("int"))
