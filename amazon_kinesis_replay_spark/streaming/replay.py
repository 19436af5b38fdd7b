"""The streaming replay shell: pace event emission against simulated
ingestion time and sink in batched, retried requests.

This is the inherently-streaming part of the reference (SURVEY §7.3 M4):

- OP-RATE-PACE     RePlayer.java:132-143 — sleep until now >= ingestion_time
- OP-RATE-SPEEDUP  RePlayer.java:23 / JsonEvent.java:96 — affine time map
- OP-PROJ-INGEST   JsonEvent.java:70-71,91-97 — anchor = first parsed event
                   + wall clock at start (faithfully stateful across batches)
- OP-SORT-EVENTTIME JsonEventBufferedReader.java:39-46 — per-micro-batch
                   event-time sort (watermark = the bounded-disorder analogue)
- OP-SINK-KINESIS / OP-SINK-RETRY — sinks.send_with_retry
- OP-AGG-WINDOWCOUNT/-MAXWM/-LAG  RePlayer.java:145-162 — live statistics

Two emission modes:

- ``driver``      — exact single-stream pacing, mirroring the reference's
                    sequential replay loop (its consumer thread IS single-
                    stream). Micro-batches are bounded by maxFilesPerTrigger,
                    so the per-batch collect is bounded; right for tests and
                    for any sink that must observe global event-time order.
- ``partitioned`` — the 100 TB path: repartitionByRange(senders, ts) then
                    foreachPartition, each partition pacing independently —
                    the analogue of the reference's N concurrent sender
                    threads (KinesisProducer.java:51-54), which already give
                    only approximate global order at the sink.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import ReplayConfig
from .sinks import SinkStats, chunked, send_with_retry


@dataclass
class ReplayStats:
    """Live statistics mirroring RePlayer.java:145-162 +
    KinesisProducer.java:204-218."""
    total_events: int = 0
    batches: int = 0
    max_emitted_ts: object = None          # OP-AGG-MAXWM
    max_lag_s: float = 0.0                 # OP-AGG-LAG
    sink: SinkStats = field(default_factory=SinkStats)
    window_counts: list = field(default_factory=list)  # OP-AGG-WINDOWCOUNT
    _window_start: float | None = None
    _window_events: int = 0

    def tick(self, n_events: int, now: float, frequency_ms: int):
        self.total_events += n_events
        if self._window_start is None:
            self._window_start = now
        self._window_events += n_events
        freq_s = frequency_ms / 1000.0
        while now - self._window_start >= freq_s:
            # events/sec = round(1000*count/freq): RePlayer.java:150
            self.window_counts.append(
                (self._window_start,
                 self._window_events,
                 round(self._window_events / freq_s)))
            self._window_start += freq_s
            self._window_events = 0


class ReplayEngine:
    """Stateful cross-batch replay: holds the ingestion anchor exactly like
    the reference's parser (first parsed event + wall clock at construction,
    JsonEvent.java:70-71,91-93) and paces each micro-batch.

    Use as the foreachBatch callback: ``stream.foreachBatch(engine)``.
    """

    def __init__(self, cfg: ReplayConfig, sink,
                 mode: str = "driver",
                 clock=time.monotonic, sleep=time.sleep):
        if mode not in ("driver", "partitioned"):
            raise ValueError(f"unknown replay mode {mode!r}")
        self.cfg = cfg
        self.sink = sink
        self.mode = mode
        self.clock = clock
        self.sleep = sleep
        self.stats = ReplayStats()
        self._first_event_ts = None        # event-time anchor
        self._ingestion_start = None       # wall-clock anchor

    # -- anchor management (OP-PROJ-INGEST) --------------------------------

    def _ensure_anchor(self, batch_min_ts):
        if self._first_event_ts is None:
            self._first_event_ts = batch_min_ts
            self._ingestion_start = self.clock()

    def _ingestion_offset_s(self, ts) -> float:
        """Seconds after ingestion_start this event should be emitted."""
        delta = (ts - self._first_event_ts).total_seconds()
        return max(0.0, delta) / self.cfg.speedup_factor

    # -- foreachBatch entry --------------------------------------------------

    def __call__(self, batch_df: DataFrame, batch_id: int):
        self.process_batch(batch_df, batch_id)

    def process_batch(self, batch_df: DataFrame, batch_id: int):
        if self.mode == "driver":
            self._process_driver(batch_df)
        else:
            self._process_partitioned(batch_df)
        self.stats.batches += 1

    # -- driver mode: exact global-order pacing ------------------------------

    def _process_driver(self, batch_df: DataFrame):
        # Guard BEFORE the collect: driver mode's exact global-order pacing
        # materializes the batch on the driver, which is only sane at small
        # scale. Refuse loudly instead of OOMing; partitioned mode is the
        # scale path. The probe counts THROUGH a limit of bound+1 so it
        # stops scanning (and, for decode-heavy sources, decoding) at the
        # bound instead of re-executing the whole source plan just to
        # learn the batch is too big.
        bound = self.cfg.driver_mode_max_rows
        probed = batch_df.limit(bound + 1).count()
        if probed > bound:
            raise ValueError(
                f"driver-mode replay refuses a micro-batch exceeding "
                f"driver_mode_max_rows={bound}: the batch would be "
                "collect()ed onto the driver. Use mode='partitioned' "
                "(per-sender pacing, executor-side sinks) or raise "
                "driver_mode_max_rows explicitly.")
        # Arrow transfer: toPandas moves the batch as columnar Arrow
        # batches instead of one pickled Row object per record (the
        # session enables spark.sql.execution.arrow.pyspark.enabled).
        # Timestamps arrive in the SESSION timezone (UTC per
        # ensure_engine_conf), so emitted ts isoformat strings are
        # deterministic UTC regardless of host TZ — the pre-Arrow collect()
        # path rendered them in host-local time.
        pdf = (batch_df.select("payload", "ts")
               .orderBy(F.col("ts").asc())           # OP-SORT-EVENTTIME
               .toPandas())
        if pdf.empty:
            return
        self._ensure_anchor(pdf["ts"].iloc[0])
        buffer: list[dict] = []
        for payload, ts in zip(pdf["payload"].values, pdf["ts"]):
            target = self._ingestion_offset_s(ts)
            gap = (self._ingestion_start + target) - self.clock()
            if gap > 0:                              # OP-RATE-PACE
                self.sleep(gap)
            lag = self.clock() - (self._ingestion_start + target)
            self.stats.max_lag_s = max(self.stats.max_lag_s, lag)
            # per-record watermark update: a mid-batch sink failure must
            # leave OP-AGG-MAXWM reflecting what was actually handed to
            # the send path, not the previous batch
            self.stats.max_emitted_ts = ts           # rows are ts-ordered
            buffer.append({"payload": payload, "ts": ts.isoformat()})
            if len(buffer) >= self.cfg.max_records_per_request:
                self._flush(buffer)
                buffer = []
        if buffer:
            self._flush(buffer)
        self.stats.tick(len(pdf), self.clock(),
                        self.cfg.statistics_frequency_ms)

    def _flush(self, records: list[dict]):
        send_with_retry(self.sink, records, self.cfg,
                        stats=self.stats.sink, sleep=self.sleep)

    # -- partitioned mode: per-sender pacing at scale ------------------------

    def _process_partitioned(self, batch_df: DataFrame):
        """Range-partition by ts into `sender_threads` partitions, each paced
        independently (the reference's sender fan-out). The sink must be
        worker-constructible: a zero-arg factory is required.

        One emit action per micro-batch: event counts and per-partition
        SinkStats flow back through accumulators, so the driver-side
        summary (cli.py end-of-run) reflects partitioned-mode sends — an
        earlier version ran shaped.count() before foreachPartition, which
        recomputed the repartitionByRange+sort shuffle and reported no
        sink counters at all."""
        cfg = self.cfg
        sink_factory = self.sink
        if not callable(sink_factory):
            raise TypeError("partitioned mode needs a sink FACTORY "
                            "(zero-arg callable usable on executors)")
        # Anchor via Arrow toPandas, NOT collect(): collect() renders
        # timestamps as naive HOST-LOCAL datetimes (TimestampType.
        # fromInternal), while the Arrow kernel below receives session-tz
        # (UTC) values — mixing the two skews every pacing target by the
        # host's UTC offset (collapsed or inflated sleeps off-UTC).
        bpdf = batch_df.agg(F.min("ts").alias("mn"),
                            F.max("ts").alias("mx")).toPandas()
        bounds = {"mn": bpdf["mn"].iloc[0], "mx": bpdf["mx"].iloc[0]}
        if bounds["mn"] is None or bpdf["mn"].isna().iloc[0]:
            return
        self._ensure_anchor(bounds["mn"])
        first_ts = self._first_event_ts
        ingestion_start_wall = time.time() - (self.clock() - self._ingestion_start)
        speedup = cfg.speedup_factor
        max_per_request = cfg.max_records_per_request

        shaped = (batch_df.select("payload", "ts")
                  .repartitionByRange(cfg.sender_threads, F.col("ts"))
                  .sortWithinPartitions("ts"))

        # Arrow-batched emit kernel: record bytes reach Python as columnar
        # batches (an earlier foreachPartition version unpickled one Row
        # object per record — the only row-at-a-time Python left in a hot
        # path). The per-record loop below is semantically required (the
        # reference paces each record, RePlayer.java:128-136) but now
        # iterates numpy/pandas values. One stats row per partition comes
        # back through the same action — no accumulators, one emit job.
        def _emit(batches):
            import pandas as pd
            sink = sink_factory()
            part_stats = SinkStats()
            buffer: list[dict] = []
            n = 0
            for pdf in batches:
                for payload, ts in zip(pdf["payload"].values, pdf["ts"]):
                    n += 1
                    target = ingestion_start_wall + max(
                        0.0, (ts - first_ts).total_seconds()) / speedup
                    gap = target - time.time()
                    if gap > 0:
                        time.sleep(gap)
                    buffer.append({"payload": payload,
                                   "ts": ts.isoformat()})
                    if len(buffer) >= max_per_request:
                        send_with_retry(sink, buffer, cfg, stats=part_stats)
                        buffer = []
            if buffer:
                send_with_retry(sink, buffer, cfg, stats=part_stats)
            yield pd.DataFrame({
                "n": [n], "requests": [part_stats.requests],
                "retried": [part_stats.retried_records],
                "sent": [part_stats.records_sent]})

        totals = (shaped.mapInPandas(
            _emit, "n long, requests long, retried long, sent long")
            .groupBy().sum().collect()[0])
        n_events = totals[0] or 0
        self.stats.sink.requests += totals[1] or 0
        self.stats.sink.retried_records += totals[2] or 0
        self.stats.sink.records_sent += totals[3] or 0
        if (self.stats.max_emitted_ts is None
                or bounds["mx"] > self.stats.max_emitted_ts):
            self.stats.max_emitted_ts = bounds["mx"]    # OP-AGG-MAXWM
        self.stats.tick(n_events, self.clock(),
                        cfg.statistics_frequency_ms)


def run_replay_stream(events: DataFrame, engine: ReplayEngine,
                      checkpoint_dir: str, available_now: bool = True):
    """Wire a streaming (payload, ts) DataFrame into the replay engine via
    foreachBatch and run it. With available_now the query drains all input
    respecting maxFilesPerTrigger, then stops — the batch-to-stream
    conversion the reference performs, finite-input edition."""
    writer = (events.writeStream
              .foreachBatch(engine)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    return query


def replay_batch_plan(events: DataFrame, cfg: ReplayConfig,
                      ingestion_start_ms: int) -> DataFrame:
    """The fully-declarative batch form of the replay dataflow (for plan
    inspection and oracle checks): order + ingestion time + batch ids.
    Streaming pacing is the only thing it cannot express."""
    from ..operators import replay_ops
    ing = replay_ops.with_ingestion_time(
        events, "ts", ingestion_start_ms, cfg.speedup_factor)
    return replay_ops.assign_batches(
        ing, ["ts"], cfg.max_records_per_request)
