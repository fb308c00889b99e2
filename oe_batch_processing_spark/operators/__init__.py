"""Operator recipe modules. Importing this package registers every query.

Modules register named queries (and DuckDB oracles) into
``oe_batch_processing_spark.registry`` as an import side effect.
"""

from oe_batch_processing_spark.operators import (  # noqa: F401
    dedup,
    fuzzy,
    graph,
    ingest_queries,
    langmodel,
    llmops,
    llmops2,
    mining,
    mlstats,
    multimodal,
    multimodal_aiff,
    multimodal_avi,
    multimodal_h264,
    multimodal_flac,
    multimodal_gif,
    multimodal_jpeg,
    multimodal_tiff,
    multimodal_webp,
    pipeline,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    sessions,
    similarity,
    sketches,
    similarity2,
    skew,
    textops,
    textops2,
    timeseries,
    tpch_like,
    tpch_like2,
    udaf,
    udtf_py,
)
from oe_batch_processing_spark.streaming import (  # noqa: F401
    event_windows,
    foreach_batch,
    stateful,
)
