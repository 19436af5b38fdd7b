"""Named-query registry backing ``__spark_entry__.py``.

Each entry pairs a PySpark DataFrame program with (where SQL-expressible)
an ANSI-SQL oracle that DuckDB runs over the same parquet tables. Operator
IDs reference SURVEY.md §2; reference citations point into
/root/reference/src/main/java/com/amazonaws/samples/kinesis/replay/.

Cross-engine determinism rules (SURVEY §5.2 / FIXTURES.md):
- UTC everywhere; window starts exposed as epoch-millis BIGINT.
- Aggregates over doubles go through DECIMAL casts (exact, order-independent
  summation -> bit-identical doubles in both engines). Ties at decimal
  boundaries cannot occur for scale >= 1 (5*10^-k is not dyadic).
- avg built as CAST(sum AS DOUBLE)/count, never the engine's avg.
- No current_timestamp / uuid / rand in oracle-checked queries.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import arn as arnf
from ..functions import jsonf
from ..operators import dedup, replay_ops, similarity, stats, text
from ..session import ensure_engine_conf
from ..tables import load

# -- deterministic literal anchors (FIXTURES.md determinism rules) ----------
SEEK_TS = "2024-01-15 00:00:00"
SPEEDUP = 6480.0                       # RePlayer.java:23 default
INGESTION_START_MS = 1706745600000     # 2024-02-01T00:00:00Z
NOW_MS = 1706746000000                 # 2024-02-01T00:06:40Z
FREQ_MS = 20_000                       # RePlayer.java:24 default
BATCH_MAX = 500                        # KinesisProducer.java:25
N_SHARDS = 8


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_engine_conf(spark)
    return load(spark, sf_dir, "events")


# ===========================================================================
# Reference surface (SURVEY §2.9)
# ===========================================================================


def q_scan_events(spark, sf_dir):
    """OP-SRC-LIST/READ — full scan (JsonEventS3Iterator.java:61-62,118)."""
    return _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value", "props")


def q_filter_seek(spark, sf_dir):
    """OP-FILTER-SEEK (JsonEventS3Iterator.java:79-101) — exact range
    predicate; parquet min/max pruning replaces the 10k-line skip sampling."""
    return replay_ops.seek(_events(spark, sf_dir), "ts", SEEK_TS).select(
        "event_id", "ts", "event_type")


def q_parse_json_attr(spark, sf_dir):
    """OP-PARSE-JSON (JsonEvent.java:81-100) — JSON attribute extract+cast."""
    e = _events(spark, sf_dir)
    return e.select(
        "event_id",
        jsonf.json_attr(F.col("props"), "k").cast("int").alias("k"))


def q_drop_malformed(spark, sf_dir):
    """OP-PARSE-BADROW (JsonEventS3Iterator.java:187-193) — rows whose
    timestamp attribute fails to parse are dropped. Payloads synthesized
    from `events` with ~1/7 corrupted timestamps."""
    e = _events(spark, sf_dir)
    payload = F.when(
        F.col("event_id") % 7 == 0,
        F.lit('{"dropoff_datetime":"not-a-timestamp"}'),
    ).otherwise(F.concat(
        F.lit('{"dropoff_datetime":"'),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        F.lit('"}')))
    withp = e.select("event_id", payload.alias("payload"))
    return jsonf.drop_malformed(withp, "payload", "dropoff_datetime") \
        .select("event_id", "parsed_ts")


def q_derive_ingestion_time(spark, sf_dir):
    """OP-PROJ-INGEST (JsonEvent.java:96-97) — anchored affine event-time ->
    ingestion-time map with speedup, min(ts) anchor broadcast back."""
    e = _events(spark, sf_dir)
    out = replay_ops.with_ingestion_time(e, "ts", INGESTION_START_MS, SPEEDUP)
    return out.select("event_id", "ingestion_ms")


def q_normalize_payload(spark, sf_dir):
    """OP-PROJ-NEWLINE (JsonEvent.java:43-49)."""
    e = _events(spark, sf_dir)
    return replay_ops.normalize_payload(
        e.select("event_id", F.col("props").alias("payload")), "payload")


def q_order_by_event_time(spark, sf_dir):
    """OP-SORT-EVENTTIME (JsonEventBufferedReader.java:39-46) — total order
    by event time (range shuffle + spillable per-partition sort)."""
    return replay_ops.order_by_event_time(
        _events(spark, sf_dir).select("event_id", "ts"), "ts", "event_id")


def q_head_min_event(spark, sf_dir):
    """OP-PEEK-MIN (JsonEventBufferedReader.java:84-86)."""
    return replay_ops.head_min_event(_events(spark, sf_dir), "ts")


def q_max_watermark(spark, sf_dir):
    """OP-AGG-MAXWM (RePlayer.java:153-157)."""
    return stats.max_watermark(_events(spark, sf_dir), "ts")


def q_window_rate_stats(spark, sf_dir):
    """OP-AGG-WINDOWCOUNT (RePlayer.java:145-162) — 20 s tumbling counts +
    events/sec, map-side combinable."""
    return stats.window_rate_stats(_events(spark, sf_dir), "ts", FREQ_MS)


def q_running_total(spark, sf_dir):
    """OP-AGG-RUNNINGTOTAL (RePlayer.java:115,146) — cumulative count over
    stat windows (window runs over aggregated slots, not raw rows)."""
    return stats.running_total(_events(spark, sf_dir), "ts", FREQ_MS)


def q_replay_lag(spark, sf_dir):
    """OP-AGG-LAG (RePlayer.java:136,153-157) — lag vs pacing schedule,
    literal 'now' for determinism."""
    e = _events(spark, sf_dir)
    ing = replay_ops.with_ingestion_time(e, "ts", INGESTION_START_MS, SPEEDUP)
    return stats.replay_lag(ing, "ingestion_ms", NOW_MS)


def q_batch_assignment(spark, sf_dir):
    """OP-SINK-KINESIS batching (KinesisProducer.java:25,112) — ≤500-record
    batch ids in event-time order via the scalable two-pass row index."""
    e = _events(spark, sf_dir).select("event_id", "ts")
    return replay_ops.assign_batches(e, ["ts", "event_id"], BATCH_MAX) \
        .select("event_id", "batch_id")


def q_partition_key_spread(spark, sf_dir):
    """OP-SINK-PARTKEY (KinesisProducer.java:197-199) — deterministic
    surrogate shard spread (uuid is nondeterministic; SURVEY §2.9)."""
    e = _events(spark, sf_dir)
    return replay_ops.surrogate_shard(e, "event_id", N_SHARDS) \
        .groupBy("shard").agg(F.count("*").alias("n"))


def q_union_objects(spark, sf_dir):
    """Implicit ordered UNION ALL of per-object scans
    (JsonEventS3Iterator.java:124-178) — overlapping slices, duplicates
    preserved."""
    e = _events(spark, sf_dir).select("event_id", "ts", "event_type", "value")
    a = e.filter(F.col("event_type") == "click")
    b = e.filter(F.col("value") > 100.0)
    return a.unionAll(b)


def q_validate_arn_regex(spark, sf_dir):
    """OP-VALIDATE-ARN (KinesisProducer.java:61-72) — regex validation +
    region/stream extraction over synthetic ARNs built from `nation`."""
    n = load(spark, sf_dir, "nation")
    arn_col = F.concat(
        F.lit("arn:aws:kinesis:region-"), F.col("n_nationkey").cast("string"),
        F.lit(":123456789012:stream/"), F.col("n_name"))
    return n.select(
        F.col("n_nationkey"),
        arn_col.alias("arn"),
        arnf.region_col(arn_col).alias("region"),
        arnf.stream_name_col(arn_col).alias("stream_name"))


_ORACLES_REFERENCE = {
    "scan_events": """
        SELECT event_id, ts, user_id, event_type, value, props FROM events
    """,
    "filter_seek": f"""
        SELECT event_id, ts, event_type FROM events
        WHERE ts >= TIMESTAMP '{SEEK_TS}'
    """,
    "parse_json_attr": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
    """,
    "drop_malformed": """
        WITH payloads AS (
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0
                        THEN '{"dropoff_datetime":"not-a-timestamp"}'
                        ELSE '{"dropoff_datetime":"' ||
                             strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || '"}'
                   END AS payload
            FROM events)
        SELECT event_id,
               TRY_CAST(json_extract_string(payload, '$.dropoff_datetime')
                        AS TIMESTAMP) AS parsed_ts
        FROM payloads
        WHERE TRY_CAST(json_extract_string(payload, '$.dropoff_datetime')
                       AS TIMESTAMP) IS NOT NULL
    """,
    "derive_ingestion_time": f"""
        WITH anchor AS (SELECT min(ts) AS first_ts FROM events)
        SELECT e.event_id,
               {INGESTION_START_MS} + CAST(round(
                   (epoch_ms(e.ts) - epoch_ms(a.first_ts)) / {SPEEDUP}
               ) AS BIGINT) AS ingestion_ms
        FROM events e CROSS JOIN anchor a
    """,
    "normalize_payload": """
        SELECT event_id,
               CASE WHEN props LIKE '%' || chr(10) THEN props
                    ELSE props || chr(10) END AS payload
        FROM events
    """,
    "order_by_event_time": """
        SELECT event_id, ts FROM events ORDER BY ts, event_id
    """,
    "head_min_event": "SELECT min(ts) AS min_ts FROM events",
    "max_watermark": "SELECT max(ts) AS max_ts FROM events",
    "window_rate_stats": f"""
        SELECT CAST(floor(epoch_ms(ts) / {FREQ_MS}) AS BIGINT) * {FREQ_MS}
                   AS window_start_ms,
               count(*) AS n_events,
               CAST(round(count(*) * 1000.0 / {FREQ_MS}.0) AS BIGINT)
                   AS events_per_sec
        FROM events GROUP BY 1
    """,
    "running_total": f"""
        WITH slots AS (
            SELECT CAST(floor(epoch_ms(ts) / {FREQ_MS}) AS BIGINT) * {FREQ_MS}
                       AS window_start_ms,
                   count(*) AS n_events
            FROM events GROUP BY 1)
        SELECT window_start_ms, n_events,
               CAST(sum(n_events) OVER (
                   ORDER BY window_start_ms
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS running_total
        FROM slots
    """,
    "replay_lag": f"""
        WITH anchor AS (SELECT min(ts) AS first_ts FROM events),
        ing AS (
            SELECT {INGESTION_START_MS} + CAST(round(
                       (epoch_ms(e.ts) - epoch_ms(a.first_ts)) / {SPEEDUP}
                   ) AS BIGINT) AS ingestion_ms
            FROM events e CROSS JOIN anchor a)
        SELECT max({NOW_MS} - ingestion_ms) AS max_lag_ms,
               CAST(sum({NOW_MS} - ingestion_ms) AS DOUBLE) / count(*)
                   AS avg_lag_ms
        FROM ing
    """,
    "batch_assignment": f"""
        SELECT event_id,
               CAST(floor((row_number() OVER (ORDER BY ts, event_id) - 1)
                          / {BATCH_MAX}) AS BIGINT) AS batch_id
        FROM events
    """,
    "partition_key_spread": f"""
        SELECT CAST(event_id % {N_SHARDS} AS INTEGER) AS shard,
               count(*) AS n
        FROM events GROUP BY 1
    """,
    "union_objects": """
        SELECT event_id, ts, event_type, value FROM events
        WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, ts, event_type, value FROM events
        WHERE value > 100.0
    """,
    "validate_arn_regex": r"""
        WITH arns AS (
            SELECT n_nationkey,
                   'arn:aws:kinesis:region-' || CAST(n_nationkey AS VARCHAR)
                   || ':123456789012:stream/' || n_name AS arn
            FROM nation)
        SELECT n_nationkey, arn,
               regexp_extract(arn,
                   '^arn:aws:kinesis:([a-z0-9-]+):(\d{12}):stream/(.+)$', 1)
                   AS region,
               regexp_extract(arn,
                   '^arn:aws:kinesis:([a-z0-9-]+):(\d{12}):stream/(.+)$', 3)
                   AS stream_name
        FROM arns
    """,
}


# ===========================================================================
# Registry assembly
# ===========================================================================

QUERIES: dict[str, QuerySpec] = {}


def _register(name: str, fn, oracle: Optional[str]):
    QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, doc=fn.__doc__ or "")


for _name, _fn in [
    ("scan_events", q_scan_events),
    ("filter_seek", q_filter_seek),
    ("parse_json_attr", q_parse_json_attr),
    ("drop_malformed", q_drop_malformed),
    ("derive_ingestion_time", q_derive_ingestion_time),
    ("normalize_payload", q_normalize_payload),
    ("order_by_event_time", q_order_by_event_time),
    ("head_min_event", q_head_min_event),
    ("max_watermark", q_max_watermark),
    ("window_rate_stats", q_window_rate_stats),
    ("running_total", q_running_total),
    ("replay_lag", q_replay_lag),
    ("batch_assignment", q_batch_assignment),
    ("partition_key_spread", q_partition_key_spread),
    ("union_objects", q_union_objects),
    ("validate_arn_regex", q_validate_arn_regex),
]:
    _register(_name, _fn, _ORACLES_REFERENCE.get(_name))
