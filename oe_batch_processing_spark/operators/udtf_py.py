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
