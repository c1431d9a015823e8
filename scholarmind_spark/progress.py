"""Engine-side pipeline progress reporting.

The reference threads a ``progress_callback(current, total, stage)``
through enrichment and LLM batches and maps each stage into a fixed
percent band (``app.py:351-370``: journal metrics 10-40, AI analysis
40-80 capped, sink 80-100; ``main.py:393-406`` drives the per-journal
ticks).  The engine mirrors that surface with two Spark-native sources
of ticks:

- **driver-side loops** (the throttled journal-metrics fetch) report
  ``(i, n)`` directly, exactly like the reference loop;
- **cluster-side actions** report task completion observed through
  ``SparkContext.statusTracker()`` — a poller thread scopes the running
  action with a job group and aggregates ``numCompletedTasks/numTasks``
  over the group's stages.  This is the listener-equivalent surface
  exposed to Python (task granularity, no py4j subclassing), and it
  sees every job the action spawns.

Percent mapping is monotone by construction: band lower edges are
non-decreasing along the pipeline and the reporter clamps to the
high-water mark (the reference achieves the same with ``min(80, ...)``
caps), so a UI polling it never sees progress move backwards.
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import SparkSession

# stage → (band_lo, band_hi), mirroring the reference's weights:
# parse 0-10, journal metrics 10-40 (30%), AI analysis 40-80, sink 80-100
STAGE_BANDS: dict[str, tuple[float, float]] = {
    "parse": (0.0, 10.0),
    "journal_metrics": (10.0, 40.0),
    "ai_analysis": (40.0, 80.0),
    "sink": (80.0, 100.0),
}


@dataclass(frozen=True)
class ProgressEvent:
    stage: str
    current: int
    total: int
    percent: float  # overall 0-100, monotone across the run


class ProgressReporter:
    """Maps per-stage ``(current, total)`` ticks into one monotone overall
    percent and forwards :class:`ProgressEvent`s to the callback."""

    def __init__(self, callback: Callable[[ProgressEvent], None]):
        self._cb = callback
        self._high_water = 0.0
        self._lock = threading.Lock()

    def update(self, stage: str, current: int, total: int) -> None:
        lo, hi = STAGE_BANDS.get(stage, (0.0, 100.0))
        frac = 0.0 if total <= 0 else min(1.0, max(0.0, current / total))
        pct = round(lo + frac * (hi - lo), 2)
        with self._lock:
            # high-water clamp: a late tick from a finished stage's poller
            # must never move the bar backwards
            self._high_water = max(self._high_water, pct)
            evt = ProgressEvent(stage, current, total, self._high_water)
        self._cb(evt)

    def stage_done(self, stage: str) -> None:
        self.update(stage, 1, 1)


def watch_action(
    spark: SparkSession,
    reporter: ProgressReporter,
    stage: str,
    action: Callable[[], object],
    poll_s: float = 0.25,
):
    """Run ``action`` (anything that triggers Spark jobs) while a poller
    thread reports its task-level completion as ``stage`` progress.

    The action is scoped with a job group so the poller aggregates ONLY
    the jobs this action spawns — concurrent work in the same session
    does not leak into the stage's numbers."""
    sc = spark.sparkContext
    group = f"sm-progress-{stage}"
    done = threading.Event()

    def _poll() -> None:
        tracker = sc.statusTracker()
        while not done.is_set():
            total = completed = 0
            for jid in tracker.getJobIdsForGroup(group):
                jinfo = tracker.getJobInfo(jid)
                if jinfo is None:
                    continue
                for sid in jinfo.stageIds:
                    sinfo = tracker.getStageInfo(sid)
                    if sinfo is not None and sinfo.numTasks > 0:
                        total += sinfo.numTasks
                        completed += sinfo.numCompletedTasks
            if total > 0:
                reporter.update(stage, completed, total)
            done.wait(poll_s)

    sc.setJobGroup(group, f"scholarmind {stage}")
    poller = threading.Thread(target=_poll, daemon=True, name=f"sm-progress-{stage}")
    poller.start()
    try:
        return action()
    finally:
        done.set()
        poller.join(timeout=2.0)
        sc.setLocalProperty("spark.jobGroup.id", None)
        reporter.stage_done(stage)
