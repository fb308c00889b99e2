"""Statistical language-model operators over the documents corpus.

The reference stops at record parsing (lib/batchProcessing.js is a
row-at-a-time ETL loop); these are the corpus-statistics shapes an LLM
training-data pipeline needs on top: score held-out text under a bigram LM
trained on the corpus itself (the classic perplexity-filter for data
quality), and detect distribution drift between corpus slices.

Exactness strategy — NO floating-point logs anywhere. Log-probabilities are
transcendental and libm implementations differ between the JVM and DuckDB,
so a log-space perplexity could never hash-match. Instead both operators
work in *quantized probability space*: every probability is scaled to an
integer via ``(SCALE * num) div den`` — integer multiply + integer floor
division, bit-identical in any engine — and summed as BIGINT. The metric is
defined BY the quantization (documented per operator), not approximated by
it, so the oracle comparison is exact.

Scale notes (100 TB):
  - LM training is two hash aggregations over the token stream (unigrams,
    bigrams) — the same shuffle shape as a word count; partial aggregation
    is map-side. Scoring is two shuffle joins keyed by token/bigram — both
    sides huge, both hash-partitioned, no driver state. The model tables
    (vocab-sized, Zipf-bounded) are orders of magnitude smaller than the
    corpus; for production they'd be computed once and reused across
    scoring runs.
  - Drift builds a languages x vocabulary grid — |langs| * |V| rows, tiny
    relative to the corpus (the token stream is what's 100 TB, the vocab is
    Zipf-bounded) — then one hash join back to the per-slice counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

# Quantization scales. Chosen so that SCALE * max_count stays far below
# 2^63: corpus token counts at 100 TB are ~1e13; 1e6 * 1e13 = 1e19 is too
# close, so production would drop to 1e4 — at test SFs counts are <1e7 and
# 1e6 keeps 6 significant digits of probability.
_LM_SCALE = 1_000_000
_TVD_SCALE = 1_000_000_000


@query(
    "text_bigram_lm_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    train_uni AS (
      SELECT w, COUNT(*) AS cnt_u FROM (
        SELECT UNNEST(words) AS w FROM toks WHERE doc_id % 10 < 8
      ) GROUP BY 1
    ),
    vocab AS (SELECT COUNT(*) AS v FROM train_uni),
    train_bi AS (
      SELECT w1, w2, COUNT(*) AS cnt_b FROM (
        SELECT words[i+1] AS w1, words[i+2] AS w2
        FROM toks, UNNEST(range(len(words) - 1)) AS t(i)
        WHERE doc_id % 10 < 8
      ) GROUP BY 1, 2
    ),
    heldout_bi AS (
      SELECT doc_id, words[i+1] AS w1, words[i+2] AS w2
      FROM toks, UNNEST(range(len(words) - 1)) AS t(i)
      WHERE doc_id % 10 >= 8
    )
    SELECT h.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN b.cnt_b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unseen,
           CAST(SUM(({_LM_SCALE} * (COALESCE(b.cnt_b, 0) + 1))
                    // (COALESCE(u.cnt_u, 0) + v.v)) AS BIGINT)
             AS score_scaled
    FROM heldout_bi h
    LEFT JOIN train_bi b ON h.w1 = b.w1 AND h.w2 = b.w2
    LEFT JOIN train_uni u ON h.w1 = u.w
    CROSS JOIN vocab v
    GROUP BY 1
    ORDER BY 1
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram LM scoring — the perplexity-style quality filter.

    Train an add-one-smoothed bigram model on the 80% split
    (``doc_id % 10 < 8``, the same hash-stable rule as
    ``docs_train_val_test_split``), then score every held-out document:
    for each adjacent pair (w1, w2) the quantized smoothed probability

        p_scaled = (SCALE * (B(w1,w2) + 1)) div (U(w1) + V)

    with B/U = train bigram/unigram counts (0 when unseen) and V = train
    vocabulary size. Per doc: bigram count, unseen-bigram count, and the
    summed score (higher = more in-distribution). The quantization IS the
    metric definition, so Spark and DuckDB agree bit-for-bit — no float
    logs (see module docstring).

    Plan: two hash aggs build the model (word-count shuffle shape), then
    two hash joins score the held-out stream. Nothing driver-side; V is
    the only scalar and rides a broadcast one-row frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 2)
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(words) - 2), "
                "i -> struct(words[i] AS w1, words[i+1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")

    train_doc = F.col("doc_id") % 10 < 8
    train_uni = (
        toks.filter(train_doc)
        .select(F.explode("words").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt_u"))
    )
    vocab = train_uni.agg(F.count(F.lit(1)).alias("v"))
    train_bi = (
        bigrams.filter(train_doc)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt_b"))
    )
    heldout = bigrams.filter(~train_doc)

    scored = (
        heldout.join(train_bi, ["w1", "w2"], "left")
        .join(train_uni, heldout["w1"] == train_uni["w"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.col("cnt_b").isNull().cast("bigint").alias("unseen"),
            F.expr(
                f"({_LM_SCALE}L * (coalesce(cnt_b, 0L) + 1L))"
                " div (coalesce(cnt_u, 0L) + v)"
            ).alias("p_scaled"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("unseen").alias("n_unseen"),
            F.sum("p_scaled").alias("score_scaled"),
        )
        .orderBy("doc_id")
    )


@query(
    "docs_lang_tvd_drift",
    oracle=f"""
    WITH tok AS (
      SELECT lang, UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    corpus_w AS (SELECT w, COUNT(*) AS n_w FROM tok GROUP BY 1),
    corpus_n AS (SELECT COUNT(*) AS n FROM tok),
    lang_w AS (SELECT lang, w, COUNT(*) AS n_lw FROM tok GROUP BY 1, 2),
    lang_n AS (SELECT lang, COUNT(*) AS n_l FROM tok GROUP BY 1),
    grid AS (
      SELECT l.lang, c.w, c.n_w, COALESCE(lw.n_lw, 0) AS n_lw
      FROM lang_n l
      CROSS JOIN corpus_w c
      LEFT JOIN lang_w lw ON lw.lang = l.lang AND lw.w = c.w
    )
    SELECT g.lang,
           ln.n_l AS n_tokens,
           CAST(SUM(ABS(({_TVD_SCALE} * g.n_lw) // ln.n_l
                        - ({_TVD_SCALE} * g.n_w) // cn.n)) AS BIGINT)
             AS tvd_scaled_x2
    FROM grid g
    JOIN lang_n ln ON ln.lang = g.lang
    CROSS JOIN corpus_n cn
    GROUP BY 1, 2
    ORDER BY 1
    """,
)
def docs_lang_tvd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift per corpus slice: for every language, the
    quantized total-variation distance between the slice's unigram
    distribution and the whole corpus's —

        tvd_x2 = SUM_w | (S*n_lw) div n_l  -  (S*n_w) div n |

    (2x the usual TVD since we sum over all words without halving; the
    floor-quantized probabilities ARE the metric, making it engine-exact).
    This is the mixture-monitoring primitive: a slice (language, source,
    crawl snapshot) whose token distribution drifts from the corpus gets
    flagged before it poisons a training mix.

    Plan: one token-stream shuffle each for corpus and per-slice counts;
    the comparison grid is |langs| x |vocab| (Zipf-bounded, tiny vs the
    token stream) built by crossing the slice list with the vocab, then a
    single hash join pulls in the per-slice counts. No Python, no driver
    loops; the corpus total rides a broadcast one-row frame.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(F.split("text", " ")).alias("w"))
    corpus_w = tok.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    corpus_n = tok.agg(F.count(F.lit(1)).alias("n"))
    lang_w = tok.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("n_lw"))
    lang_n = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))

    grid = (
        lang_n.crossJoin(corpus_w)
        .join(lang_w, ["lang", "w"], "left")
        .withColumn("n_lw", F.coalesce("n_lw", F.lit(0)))
        .crossJoin(F.broadcast(corpus_n))
    )
    term = F.expr(
        f"abs(({_TVD_SCALE}L * n_lw) div n_l - ({_TVD_SCALE}L * n_w) div n)"
    )
    return (
        grid.groupBy("lang", F.col("n_l").alias("n_tokens"))
        .agg(F.sum(term).alias("tvd_scaled_x2"))
        .orderBy("lang")
    )
