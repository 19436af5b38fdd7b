"""Streaming metrics surface (SURVEY §2.6 / M4).

The reference logs replay statistics every 20 s (RePlayer.java:145-162:
batch count, events/sec, cumulative total, max emitted event time, replay
lag) and exposes sink counters (KinesisProducer.java:204-218). In Spark the
query-progress stream already carries the equivalents; this listener adapts
them to the reference's vocabulary and keeps a bounded history.
"""

from __future__ import annotations

import json
from collections import deque

from pyspark.sql.streaming import StreamingQueryListener


class ReplayProgressListener(StreamingQueryListener):
    """Adapts StreamingQueryProgress to the reference's statistics line.

    Attach with ``spark.streams.addListener(listener)``; read
    ``listener.history`` (deque of dicts) or let it log via ``printer``.
    """

    def __init__(self, history: int = 256, printer=None):
        self.history: deque = deque(maxlen=history)
        self.printer = printer
        # Per-(query, run) running totals (r7 review): a session-wide
        # counter would sum UNRELATED queries on the same session and
        # double-count micro-batches replayed after a restart (a new
        # runId re-delivers the recovered batch's progress). Totals are
        # keyed by query id and RESET when its runId changes — the
        # reference's counter also counts one run of one replay.
        self._totals: dict = {}                  # query_id -> total
        self._runs: dict = {}                    # query_id -> run_id

    @property
    def total_events(self) -> int:               # OP-AGG-RUNNINGTOTAL
        """Events across all live runs (sum of per-query totals)."""
        return sum(self._totals.values())

    @property
    def events_by_query(self) -> dict:
        """query_id -> events replayed by its CURRENT run."""
        return dict(self._totals)

    # StreamingQueryListener interface -------------------------------------
    def onQueryStarted(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        n = int(p.get("numInputRows") or 0)
        qid, run = p.get("id"), p.get("runId")
        if self._runs.get(qid) != run:           # first batch of a new run
            self._runs[qid] = run
            self._totals[qid] = 0
        self._totals[qid] += n
        snap = {
            "query_id": qid,
            "run_id": run,
            "batch_id": p.get("batchId"),
            "batch_events": n,
            "events_per_sec": p.get("processedRowsPerSecond"),  # OP-AGG-WINDOWCOUNT
            "total_events": self._totals[qid],   # THIS query's run
            # max event time seen by the engine (OP-AGG-MAXWM); present when
            # the query has an event-time watermark
            "max_event_time": (p.get("eventTime") or {}).get("max"),
            "watermark": (p.get("eventTime") or {}).get("watermark"),
            "duration_ms": (p.get("durationMs") or {}).get("triggerExecution"),
        }
        self.history.append(snap)
        if self.printer:
            # statistics line shape mirrors RePlayer.java:153-157
            self.printer(
                f"replayed {snap['total_events']} events "
                f"({snap['events_per_sec'] or 0:.0f} events/s); all events "
                f"until {snap['max_event_time']} have been sent")
