"""CDC metrics via StreamingQueryListener (T14).

The reference exports Prometheus metrics (``source/metrics/Metrics.java:34-121``,
``PollingMetrics.java``, ``ListeningMetrics.java``): total reads, per-op
counts, error count, last-receive time, IDLE-after-8s status, events-per-poll
history (default 10, ``polling.history.size``). Spark already measures all the
raw quantities per micro-batch; this listener renames them onto the
reference's metric vocabulary.
"""

from __future__ import annotations

import time
from collections import deque

from pyspark.sql.streaming import StreamingQueryListener

IDLE_AFTER_SECONDS = 8.0  # ListeningMetrics.java:56 / PollingMetrics.java:56


class CDCMetricsListener(StreamingQueryListener):
    """Per-source metrics. ``query_name`` (or ``query_id``) scopes the
    listener to ONE streaming query — listeners are session-global in Spark,
    so without the filter two concurrent CDC sources would corrupt each
    other's counters. Unscoped (both None) tracks everything (single-query
    sessions)."""

    def __init__(self, history_size: int = 10, query_name: str | None = None, query_id: str | None = None):
        self.query_name = query_name
        self.query_id = query_id
        self.total_reads = 0
        self.error_count = 0
        self.last_receive_time: float | None = None
        self.events_per_poll = deque(maxlen=history_size)  # PollingMetrics.java:139-149
        self._started = time.time()

        self._ids: set[str] = set()  # ids observed for query_name (start events)

    def _mine(self, name: str | None, qid) -> bool:
        if self.query_name is not None:
            return name == self.query_name or str(qid) in self._ids
        if self.query_id is not None:
            return str(qid) == str(self.query_id)
        return True

    # -- status ---------------------------------------------------------------

    @property
    def status(self) -> str:
        """CONSUMING / IDLE / ERROR (CDCStatus.java:24-27)."""
        if self.error_count:
            return "ERROR"
        ref = self.last_receive_time or self._started
        return "IDLE" if time.time() - ref > IDLE_AFTER_SECONDS else "CONSUMING"

    @property
    def idle_time(self) -> float:
        ref = self.last_receive_time or self._started
        return max(0.0, time.time() - ref)

    # -- listener hooks ---------------------------------------------------------

    def onQueryStarted(self, event) -> None:
        # Terminated events carry no name; remember the id→name binding here.
        if self.query_name is not None and event.name == self.query_name:
            self._ids.add(str(event.id))

    def onQueryProgress(self, event) -> None:
        if not self._mine(event.progress.name, event.progress.id):
            return
        n = int(event.progress.numInputRows)
        self.events_per_poll.append(n)
        if n > 0:
            self.total_reads += n
            self.last_receive_time = time.time()

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if not self._mine(getattr(event, "name", None), event.id):
            return
        if event.exception is not None:
            self.error_count += 1

    def snapshot(self) -> dict:
        return {
            "total_reads": self.total_reads,
            "error_count": self.error_count,
            "status": self.status,
            "idle_time": self.idle_time,
            "events_per_poll": list(self.events_per_poll),
        }
