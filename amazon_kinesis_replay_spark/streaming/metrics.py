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
        self.total_events = 0                    # OP-AGG-RUNNINGTOTAL
        self.printer = printer

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
        self.total_events += n
        snap = {
            "batch_id": p.get("batchId"),
            "batch_events": n,
            "events_per_sec": p.get("processedRowsPerSecond"),  # OP-AGG-WINDOWCOUNT
            "total_events": self.total_events,
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
