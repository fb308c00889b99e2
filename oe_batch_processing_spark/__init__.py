"""oe_batch_processing_spark — a PySpark-native batch/ingestion analytics engine.

A brand-new engine with the data-processing capabilities of the reference
flat-file batch-ingestion framework (EdgeVerve/oe-batch-processing, surveyed in
SURVEY.md), rebuilt Spark-first: DataFrame/SQL declarative plans optimized by
Catalyst, Structured Streaming for streams, Arrow-batched Pandas UDFs only where
built-ins can't express the semantics.

Layout:
    session      — SparkSession factory (AQE on, UTC, tuned shuffle partitions)
    tables       — testdata parquet loaders / temp-view registration
    config       — layered job config (env > file > default), cf. reference O15
    sources/     — line scan, CSV, fixed-width, custom-parser hook (O1-O6)
    operators/   — relational recipes, dedup, similarity, text analysis (§2.2)
    functions/   — scalar function helpers incl. JS-fidelity coercion
    streaming/   — event-time windows, watermarks, streaming dedup
    sinks/       — ledger writers, rate-limited REST sink (O10-O12)
    plans/       — explain/plan-inspection helpers
"""

__version__ = "0.1.0"
