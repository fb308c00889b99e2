"""Three-way record-outcome router (reference O7, SURVEY.md §2.3.1).

Every parsed frame carries ``statusText`` in {SUCCESS, FAILED, IGNORED}.
The router splits it into the success channel (flows to the sink), the error
channel (flows to the BatchStatus ledger), and the ignore channel (a plain
filter — never logged, never counted, reference lib/batchProcessing.js:626-629).

Counter semantics preserved: ``totalRecordCount`` counts only non-ignored
records (lib/batchProcessing.js:623,696).

These are DataFrame filters — Catalyst pushes them into the parse output and
both channels share the one upstream scan+parse (no double read when the plan
is materialized once via persist, or written with a single pass per channel).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUCCESS = "SUCCESS"
FAILED = "FAILED"
IGNORED = "IGNORED"
FATAL = "FATAL"


@dataclass
class RoutedRecords:
    success: DataFrame
    failed: DataFrame
    non_ignored: DataFrame  # success + failed (= what the ledgers count)

    def counts(self) -> dict[str, int]:
        """total/success/failure counts in one aggregation pass (the
        reference's only aggregation, O12)."""
        row = (
            self.non_ignored.groupBy()
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.sum(F.when(F.col("statusText") == SUCCESS, 1).otherwise(0)).alias(
                    "success"
                ),
                F.sum(F.when(F.col("statusText") == FAILED, 1).otherwise(0)).alias(
                    "failure"
                ),
            )
            .collect()[0]
        )
        return {
            "totalRecordCount": row["total"],
            "successCount": row["success"] or 0,
            "failureCount": row["failure"] or 0,
        }


def route(parsed: DataFrame) -> RoutedRecords:
    """Split a parsed frame (with statusText) into its outcome channels."""
    non_ignored = parsed.filter(F.col("statusText") != IGNORED)
    return RoutedRecords(
        success=non_ignored.filter(F.col("statusText") == SUCCESS),
        failed=non_ignored.filter(F.col("statusText") == FAILED),
        non_ignored=non_ignored,
    )


def route_native(scanned: DataFrame, corrupt_col: str = "_corrupt_record") -> RoutedRecords:
    """Router for the native CSV scan path: corrupt-record column NULL =>
    SUCCESS, non-NULL => FAILED (with the raw line as the error payload)."""
    parsed = scanned.withColumn(
        "statusText",
        F.when(F.col(corrupt_col).isNull(), F.lit(SUCCESS)).otherwise(F.lit(FAILED)),
    ).withColumn(
        "error",
        F.when(F.col(corrupt_col).isNotNull(), F.lit("Malformed CSV record")),
    )
    return route(parsed)


def route_observed(parsed: DataFrame):
    """Like :func:`route`, but the run counters ride along as an
    ``Observation`` (Spark's accumulator-backed query metrics): the
    total/success/failure counts materialize as a side effect of whatever
    action consumes the channels — e.g. the sink write — instead of the
    separate aggregation pass ``RoutedRecords.counts()`` runs. At scale
    that second pass re-reads the whole parse output; this is free.

    Returns ``(RoutedRecords, Observation)``; read the dict with
    :func:`observed_counts` AFTER an action has run over a channel.
    """
    from pyspark.sql import Observation

    obs = Observation("outcome_counts")
    non_ignored = parsed.filter(F.col("statusText") != IGNORED).observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("statusText") == SUCCESS, 1).otherwise(0)).alias(
            "success"
        ),
        F.sum(F.when(F.col("statusText") == FAILED, 1).otherwise(0)).alias(
            "failure"
        ),
    )
    routed = RoutedRecords(
        success=non_ignored.filter(F.col("statusText") == SUCCESS),
        failed=non_ignored.filter(F.col("statusText") == FAILED),
        non_ignored=non_ignored,
    )
    return routed, obs


def observed_counts(obs) -> dict[str, int]:
    """BatchRun-shaped counters from a fired Observation (same keys as
    ``RoutedRecords.counts()``, reference O12 semantics)."""
    got = obs.get
    return {
        "totalRecordCount": got["total"],
        "successCount": got["success"] or 0,
        "failureCount": got["failure"] or 0,
    }
