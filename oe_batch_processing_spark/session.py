"""SparkSession factory.

Defaults are chosen for correctness-first differential testing against DuckDB
(UTC session timezone, ANSI off so casts behave like the reference's permissive
coercion) and for scale (AQE on with skew-join handling, broadcast threshold
sized for the dimension tables, Arrow enabled for the Pandas-UDF paths).

On a real cluster the same builder is used; only ``master`` and the shuffle
partition count change (shuffle partitions should track ~2-3x total cores, and
AQE coalesces the rest).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "oe-batch-processing-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale notes (100 TB design intent):
      - AQE enabled: runtime partition coalescing + skew-join splitting mean the
        static ``shuffle.partitions`` only needs to be an upper bound.
      - ``autoBroadcastJoinThreshold`` stays at a value that catches the star-
        schema dimension tables (region/nation/customer at small SF; on a real
        cluster dims up to ~64 MB) so fact-dim joins never shuffle the fact.
      - Arrow execution for the Pandas-UDF operators (minhash, embeddings).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Executor Python workers must be able to import this package regardless
    # of the driver process's cwd (mapInPandas closures pickle functions by
    # module reference). Prepend the repo root to the workers' PYTHONPATH.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker_pythonpath = repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # Shuffle/spill files on tmpfs when available: this sandbox's block
        # device writes are slow enough to dominate small shuffles (measured
        # 2.2 s -> 0.48 s for a 260k-row exchange). Spill volumes at test SFs
        # are MBs — far under the tmpfs ceiling; production clusters set
        # spark.local.dir to fast NVMe per standard practice.
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/oebp-spark-local"
                if os.path.isdir("/dev/shm")
                else "/tmp/oebp-spark-local",
            ),
        )
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        # keep bucketed-table experiments out of the repo tree
        .config("spark.sql.warehouse.dir", "/tmp/oebp-warehouse")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
