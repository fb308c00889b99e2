"""Progress reporter (reference O16) + plan inspection helpers.

The reference prints processed/success/failure counts plus memory usage every
``progressInterval`` ms (lib/batchProcessing.js:299-311). Spark's analog:
poll the status tracker from a daemon thread on the driver. Zero impact on
executors; 0 disables, like the reference.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession


class ProgressReporter:
    """Context manager printing active-stage progress on an interval."""

    def __init__(self, spark: SparkSession, interval_ms: int = 10000, sink=print):
        self.spark = spark
        self.interval = interval_ms / 1000.0
        self.sink = sink
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _loop(self) -> None:
        tracker = self.spark.sparkContext.statusTracker()
        while not self._stop.wait(self.interval):
            stage_ids = tracker.getActiveStageIds()
            for sid in stage_ids:
                info = tracker.getStageInfo(sid)
                if info:
                    self.sink(
                        f"[progress] stage {sid}: {info.numCompletedTasks}/"
                        f"{info.numTasks} tasks, {info.numActiveTasks} active, "
                        f"{info.numFailedTasks} failed"
                    )

    def __enter__(self) -> "ProgressReporter":
        if self.interval > 0:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1.0)


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (for tests / inspection)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    missing = [n for n in needles if n not in plan]
    if missing:
        raise AssertionError(f"plan is missing {missing}; plan:\n{plan}")


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = formatted_plan(df)
    present = [n for n in needles if n in plan]
    if present:
        raise AssertionError(f"plan unexpectedly contains {present}; plan:\n{plan}")
