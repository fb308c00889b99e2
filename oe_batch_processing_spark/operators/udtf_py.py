"""Real Python UDTF (Spark 4 ``@udtf`` table functions).

``udtf_explode_words`` (relational2.py) shows the JVM table-generating
surface (posexplode); this module exercises the actual Python UDTF API the
reference's custom-parser hook (lib/parsers.js:249-266, the "return an
array of records" contract) maps onto when a user needs one-row-in,
many-rows-out logic that genuinely isn't expressible as explode over an
array expression: a class with ``eval`` yielding rows, lateral-joined
against the input table.

Scale notes: Python UDTFs are the SLOW extension path (row-at-a-time
Python, pickled rows across the socket) — the 100 TB guidance is the same
as for the grouped-map UDAF template (udaf.py): reach for this only when
JVM expressions can't express the semantics, and keep a native twin. Here
the semantics (per-doc distinct-word stats) ARE expressible natively —
``text_top_tokens``/``udtf_explode_words`` cover the JVM shape — so this
query deliberately doubles as the fidelity test that the Python surface
returns bit-identical results to the SQL oracle. The lateral join itself
is narrow (no shuffle: the UDTF runs inside the scan stage's Python
worker); the only exchange is the final presentation sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table


@query(
    "udtf_python_word_stats",
    oracle="""
    SELECT doc_id, word,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM (
      SELECT doc_id, words[i] AS word, i - 1 AS pos
      FROM (
        SELECT doc_id, string_split(text, ' ') AS words,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
      )
    )
    WHERE doc_id % 25 = 0 AND word <> ''
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def udtf_python_word_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF lateral join: per document, one output row per distinct
    word with its occurrence count and first position. The UDTF is the
    Spark-4 `@udtf` class form (eval yields rows); defined inline so
    cloudpickle ships it by value — no executor import needed."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, cnt: bigint, first_pos: bigint")
    class WordStats:
        def eval(self, text: str):  # noqa: ANN001 — UDTF contract
            stats: dict[str, list[int]] = {}
            for pos, w in enumerate(text.split(" ")):
                if not w:
                    continue
                s = stats.get(w)
                if s is None:
                    stats[w] = [1, pos]
                else:
                    s[0] += 1
            for w in sorted(stats):
                cnt, first = stats[w]
                yield (w, cnt, first)

    spark.udtf.register("word_stats", WordStats)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 25 == 0).createOrReplaceTempView(
        "udtf_docs_sample"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.cnt, s.first_pos
        FROM udtf_docs_sample d, LATERAL word_stats(d.text) s
        ORDER BY d.doc_id, s.word
        """
    )


@query(
    "udtf_table_arg_streaks",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rnt
      FROM events
    ),
    isl AS (
      SELECT user_id, event_type, rn - rnt AS island,
             CAST(COUNT(*) AS BIGINT) AS streak,
             MIN(rn) AS start_rn
      FROM e GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT user_id, event_type, streak, start_rn,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak DESC, start_rn) AS pick
      FROM isl
    )
    SELECT user_id, event_type AS streak_type, streak,
           CAST(start_rn AS BIGINT) AS start_rn
    FROM best WHERE pick = 1
    """,
)
def udtf_table_arg_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 polymorphic UDTF with a TABLE argument: the function is
    invoked as ``streaks(TABLE(events) PARTITION BY user_id ORDER BY ts,
    event_id)`` — the engine plans the partitioning/ordering and streams
    each user's ordered rows through one UDTF instance, which tracks the
    longest same-event-type run and emits one row per user at
    ``terminate()``. This is the missing-piece API for imperative per-key
    logic (the reference's custom-parser contract, upgraded to grouped
    ordered input): no collect_list, no manual fold — the UDTF *is* the
    per-key program.

    The oracle is the declarative twin: gaps-and-islands (rn − rn_per_type)
    in pure SQL — proving the imperative and declarative spellings agree
    bit-for-bit (deterministic tie-break: earliest streak wins).

    Scale: one shuffle on user_id (engine-planned from the PARTITION BY
    clause); per-key state is O(1) — streak counters, not arrays. Python
    row streaming is the cost; the declarative oracle shape IS the
    JVM-native production twin, registered here as the same relation.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id: bigint, streak_type: string, "
          "streak: bigint, start_rn: bigint")
    class Streaks:
        def __init__(self) -> None:
            self.user_id = None
            self.rn = 0
            self.cur_type: str | None = None
            self.cur_len = 0
            self.cur_start = 0
            self.best_type: str | None = None
            self.best_len = 0
            self.best_start = 0

        def _close_run(self) -> None:
            if self.cur_type is not None and (
                self.cur_len > self.best_len
                or (self.cur_len == self.best_len
                    and self.cur_start < self.best_start)
            ):
                self.best_type = self.cur_type
                self.best_len = self.cur_len
                self.best_start = self.cur_start

        def eval(self, row):  # noqa: ANN001 — UDTF contract (Row input)
            self.user_id = row.user_id
            self.rn += 1
            if row.event_type == self.cur_type:
                self.cur_len += 1
            else:
                self._close_run()
                self.cur_type = row.event_type
                self.cur_len = 1
                self.cur_start = self.rn
            return None

        def terminate(self):
            self._close_run()
            if self.best_type is not None:
                yield (self.user_id, self.best_type, self.best_len,
                       self.best_start)

    spark.udtf.register("oebp_streaks", Streaks)
    events = load_table(spark, sf_dir, "events")
    events.select("user_id", "event_type", "ts", "event_id").createOrReplaceTempView(
        "udtf_streak_events"
    )
    return spark.sql(
        """
        SELECT s.user_id, s.streak_type, s.streak, s.start_rn
        FROM oebp_streaks(TABLE(udtf_streak_events)
                          PARTITION BY user_id ORDER BY (ts, event_id)) AS s
        """
    )
