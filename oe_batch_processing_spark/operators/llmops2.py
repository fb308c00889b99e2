"""Round-5 LLM training-data operators: fixed-token document chunking with
overlap (the RAG / pretraining prep primitive), TF-IDF top-terms, an SCD2
(slowly-changing-dimension) history build from the event stream, and a
CDC-style merge/upsert — the batch "MERGE INTO" shape expressed as a full
outer join.

All decisions are integer arithmetic or single identical IEEE divisions of
integer-derived doubles, so every query is bit-exact against DuckDB.
No Python UDFs — everything is JVM codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import dsum, query
from oe_batch_processing_spark.tables import BROADCAST_DIMS, load_table

# --- fixed-token chunking with overlap --------------------------------------

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks


@query(
    "docs_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    starts AS (
      SELECT doc_id, t, UNNEST(generate_series(0, LEN(t) - 1, {CHUNK_STRIDE})) AS s
      FROM toks
    )
    SELECT doc_id,
           CAST(s / {CHUNK_STRIDE} AS INTEGER) AS chunk_idx,
           CAST(s AS INTEGER) AS start_tok,
           CAST(LEN(t[s + 1 : LEAST(s + {CHUNK_TOKENS}, LEN(t))]) AS INTEGER)
             AS n_tokens,
           array_to_string(t[s + 1 : LEAST(s + {CHUNK_TOKENS}, LEN(t))], ' ')
             AS chunk_text
    FROM starts
    """,
)
def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: split each document into
    {CHUNK_TOKENS}-token chunks every {CHUNK_STRIDE} tokens (8-token overlap)
    — the standard RAG-index / pretraining-context prep step.

    Spark shape: one narrow projection — ``split`` once per document, then
    ``posexplode`` over a ``sequence`` of chunk starts and a ``slice`` +
    ``array_join`` per chunk. No shuffle at all: chunking is embarrassingly
    parallel, the scan partitioning carries through, and at 100 TB this runs
    as a single map stage whose output feeds the tokenizer directly. The
    only data growth is the declared overlap ratio (~{CHUNK_TOKENS}/{CHUNK_STRIDE}x).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    starts = toks.select(
        "doc_id",
        "t",
        F.posexplode(
            F.expr(f"sequence(0, size(t) - 1, {CHUNK_STRIDE})")
        ).alias("chunk_idx", "s"),
    )
    chunk = F.expr(f"slice(t, s + 1, {CHUNK_TOKENS})")
    return starts.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("s").cast("int").alias("start_tok"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --- TF-IDF top terms -------------------------------------------------------

TFIDF_TOPK = 3


@query(
    "docs_tfidf_topterms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
    ),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             CAST(tf.tf AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (token)
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rnk
      FROM scored
    )
    SELECT doc_id, token, tf, df, score, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= {TFIDF_TOPK}
    """,
)
def docs_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-{TFIDF_TOPK} distinguishing terms by a rational
    TF-IDF (score = tf/df — one IEEE division of two integer-derived
    doubles, bit-identical in both engines; log-weighting would differ in
    final ULPs between libm and java.lang.Math and is deliberately avoided
    for the differential gate — the RANKING is what the operator is).

    Scale shape: tokenize once, two aggregations off it (per-doc TF keyed by
    (doc_id, token); corpus DF keyed by token with map-side partial
    count-distinct), one join on token, one per-doc window top-k. The DF
    side is vocabulary-sized — orders of magnitude smaller than the corpus —
    so at 100 TB it broadcasts and the join never shuffles the TF stream;
    AQE picks that up from runtime stats (the explicit hint is left out so
    tiny test SFs keep a plannable exchange).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df, "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        (F.col("tf").cast("double") / F.col("df")).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .select("doc_id", "token", "tf", "df", "score", "rnk")
    )


# --- SCD2 history build -----------------------------------------------------

TIER_EDGES = (100.0, 500.0)  # value < 100 -> bronze, < 500 -> silver, else gold


def _tier_case_sql() -> str:
    return (
        f"CASE WHEN value < {TIER_EDGES[0]} THEN 'bronze' "
        f"WHEN value < {TIER_EDGES[1]} THEN 'silver' ELSE 'gold' END"
    )


@query(
    "scd2_user_value_tiers",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts, event_id, {_tier_case_sql()} AS tier
      FROM events WHERE event_type = 'purchase'
    ),
    marked AS (
      SELECT user_id, ts, tier,
             CASE WHEN LAG(tier) OVER w IS DISTINCT FROM tier THEN 1 ELSE 0
               END AS chg
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, tier,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ),
    hist AS (
      SELECT user_id, tier, run_id, MIN(ts) AS vf
      FROM runs GROUP BY 1, 2, 3
    )
    SELECT user_id, tier,
           strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(vf) OVER (PARTITION BY user_id ORDER BY run_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           LEAD(vf) OVER (PARTITION BY user_id ORDER BY run_id) IS NULL
             AS is_current
    FROM hist
    """,
)
def scd2_user_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change stream: each user's purchase
    events assign a value tier; consecutive same-tier runs collapse into one
    versioned row with ``valid_from`` / ``valid_to`` / ``is_current`` — the
    gaps-and-islands pattern that turns an event log into a slowly-changing
    dimension.

    Scale shape: ONE shuffle on user_id serves every step — the change-flag
    lag, the running run-id sum, the per-run MIN, and the valid_to lead all
    reuse the same partitioning (Catalyst plans a single Exchange; the
    window sorts are local). At 100 TB this is the canonical "rebuild the
    dimension history from the log" batch job; the incremental variant
    unions the open tail (is_current) with new events and re-runs the same
    plan on the delta partition.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = e.select("user_id", "ts", "event_id", F.expr(_tier_case_sql()).alias("tier"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = p.select(
        "user_id",
        "ts",
        "tier",
        F.when(
            ~F.lag("tier").over(w).eqNullSafe(F.col("tier")), F.lit(1)
        ).otherwise(F.lit(0)).alias("chg"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = marked.select(
        "user_id", "ts", "tier", F.sum("chg").over(wrun).alias("run_id")
    )
    hist = runs.groupBy("user_id", "tier", "run_id").agg(F.min("ts").alias("vf"))
    wver = Window.partitionBy("user_id").orderBy("run_id")
    nxt = F.lead("vf").over(wver)
    return hist.select(
        "user_id",
        "tier",
        F.date_format("vf", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


# --- CDC merge / upsert -----------------------------------------------------

@query(
    "merge_upsert_customer_balance",
    oracle="""
    WITH src AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS purchase_total
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT COALESCE(c.c_custkey, s.user_id) AS c_custkey,
           COALESCE(c.c_name, 'Customer#new-' || CAST(s.user_id AS VARCHAR))
             AS c_name,
           CASE WHEN s.user_id IS NULL THEN c.c_acctbal
                WHEN c.c_custkey IS NULL THEN s.purchase_total
                ELSE c.c_acctbal + s.purchase_total END AS new_acctbal,
           CASE WHEN s.user_id IS NULL THEN 'unchanged'
                WHEN c.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS action
    FROM customer c FULL JOIN src s ON c.c_custkey = s.user_id
    """,
)
def merge_upsert_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style MERGE INTO expressed Spark-first: the change source (summed
    purchase value per user) full-outer-joins the target dimension;
    matched rows update (balance += purchases), unmatched-source rows
    insert, unmatched-target rows pass through unchanged — exactly the
    three-branch semantics of ``MERGE WHEN [NOT] MATCHED`` on engines
    without a transactional table format.

    Scale shape: the source aggregate is one map-side-combined shuffle on
    user_id; the merge itself is a single full outer hash join on the key.
    At 100 TB the target is read bucket-partitioned on the merge key so the
    join co-locates with zero target shuffle, and the output rewrites only
    the partitions containing touched keys (the classic pre-lakehouse
    upsert); on Delta/Iceberg the SAME source frame feeds ``MERGE INTO``.
    The exact-decimal sum keeps the updated balances bit-identical across
    engines (registry.dsum convention).
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    src = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dsum("value").alias("purchase_total"))
    )
    m = cust.join(src, cust["c_custkey"] == src["user_id"], "full_outer")
    no_src = F.col("user_id").isNull()
    no_tgt = F.col("c_custkey").isNull()
    return m.select(
        F.coalesce("c_custkey", "user_id").alias("c_custkey"),
        F.coalesce(
            "c_name", F.concat(F.lit("Customer#new-"), F.col("user_id").cast("string"))
        ).alias("c_name"),
        F.when(no_src, F.col("c_acctbal"))
        .when(no_tgt, F.col("purchase_total"))
        .otherwise(F.col("c_acctbal") + F.col("purchase_total"))
        .alias("new_acctbal"),
        F.when(no_src, F.lit("unchanged"))
        .when(no_tgt, F.lit("inserted"))
        .otherwise(F.lit("updated"))
        .alias("action"),
    )


# --- CDC latest-state compaction --------------------------------------------

@query(
    "events_cdc_latest_state",
    oracle="""
    SELECT user_id, event_type AS last_event_type, value AS last_value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: reduce the change log to the LATEST row per key
    (newest ts, event_id as the deterministic intra-timestamp sequencer) —
    the materialize-current-state half of every CDC pipeline, and the
    companion to the SCD2 history build above.

    Scale shape: one shuffle on user_id + a per-key top-1. Spark plans
    ROW_NUMBER()=1 with a rank-limit pushdown (WindowGroupLimit): each map
    task keeps only its per-key newest row BEFORE the exchange, so the
    shuffle carries ~|keys| rows, not |log| rows — the same effect as the
    log-compaction combiner in a streaming system. At 100 TB the log is
    additionally partitioned by arrival date and the compaction reads only
    partitions newer than the last checkpoint, merging onto the prior
    compacted state with merge_upsert semantics.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


# --- streaming corpus gate ---------------------------------------------------

@query(
    "stream_docs_quality_gate",
    oracle=f"""
    SELECT doc_id,
           CASE
             WHEN LEN(string_split(text, ' ')) < 10 THEN 'too_few_words'
             WHEN LENGTH(text) < 180 THEN 'too_short'
             WHEN lang NOT IN ('en', 'de', 'es', 'fr') THEN 'non_target_lang'
             ELSE 'keep'
           END AS decision
    FROM documents
    """,
)
def stream_docs_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus quality gate run as a STREAM: documents arrive as files
    (readStream over the parquet directory), each micro-batch classifies
    rows with the same pure-projection rules as the batch gate, and kept
    rows flow onward — the continuous-ingestion shape of an LLM data
    pipeline (new crawl shards land, the gate never stops).

    Row-level projection streams in append mode with no watermark, no
    state, and no shuffle — each micro-batch is a map-only job, so
    backpressure is purely source-rate-bound (``maxFilesPerTrigger`` is the
    production knob). Differential-checked against the batch SQL on the
    same files — the unified-API guarantee that the stream computes exactly
    the batch answer.
    """
    from oe_batch_processing_spark.streaming.event_windows import (
        run_available_now,
    )
    from oe_batch_processing_spark.tables import table_path

    raw_schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    gated = stream.select(
        "doc_id",
        F.when(F.size(F.split("text", " ")) < 10, F.lit("too_few_words"))
        .when(F.length("text") < 180, F.lit("too_short"))
        .when(~F.col("lang").isin("en", "de", "es", "fr"), F.lit("non_target_lang"))
        .otherwise(F.lit("keep"))
        .alias("decision"),
    )
    return run_available_now(gated, "append")


@query(
    "text_repetition_ratios",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(len(ws) AS BIGINT) AS n_words,
             CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct
      FROM w
    ),
    big AS (
      SELECT doc_id, ws[i] || ' ' || ws[i + 1] AS bigram
      FROM w, UNNEST(range(1, len(ws))) AS t(i)
    ),
    cnt AS (
      SELECT doc_id, bigram, COUNT(*) AS c FROM big GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, MAX(c) AS top_bigram_n,
             CAST(SUM(c) AS BIGINT) AS n_bigrams
      FROM cnt GROUP BY 1
    )
    SELECT s.doc_id, n_words, n_distinct,
           CAST(n_words - n_distinct AS DOUBLE) / n_words AS dup_word_frac,
           top_bigram_n, n_bigrams,
           CAST(top_bigram_n AS DOUBLE) / n_bigrams AS top_bigram_frac,
           CASE WHEN CAST(top_bigram_n AS DOUBLE) / n_bigrams > 0.2
                  OR CAST(n_words - n_distinct AS DOUBLE) / n_words > 0.6
                THEN 'repetitive' ELSE 'keep' END AS decision
    FROM stats s JOIN top USING (doc_id)
    """,
)
def text_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repetition half of the Gopher/MassiveText heuristics
    (``text_gopher_quality`` has the word-form half): duplicate-word
    fraction and most-frequent-bigram coverage, with the published
    flag-if-repetitive decision. Boilerplate and keyboard-mash documents
    score high on exactly these two ratios.

    Shape: the bigram mode per doc is computed relationally (posexplode ->
    per-(doc,bigram) count -> per-doc max) — one shuffle keyed on doc_id,
    map-side combined, instead of building per-row hash maps in Python.
    Every ratio is a single division of two exact integers, so both
    engines agree bit-for-bit.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    stats = docs.select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.size(F.array_distinct("ws")).cast("long").alias("n_distinct"),
    )
    bigrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2),"
                " i -> concat(ws[i], ' ', ws[i + 1]))"
            )
        ).alias("bigram"),
    )
    cnt = bigrams.groupBy("doc_id", "bigram").agg(
        F.count(F.lit(1)).alias("c")
    )
    top = cnt.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_n"),
        F.sum("c").alias("n_bigrams"),
    )
    dup_frac = (
        (F.col("n_words") - F.col("n_distinct")).cast("double")
        / F.col("n_words")
    )
    top_frac = F.col("top_bigram_n").cast("double") / F.col("n_bigrams")
    return (
        stats.join(top, "doc_id")
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            dup_frac.alias("dup_word_frac"),
            "top_bigram_n",
            "n_bigrams",
            top_frac.alias("top_bigram_frac"),
            F.when(
                (top_frac > 0.2) | (dup_frac > 0.6), "repetitive"
            )
            .otherwise("keep")
            .alias("decision"),
        )
    )


@query(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH p AS (
      SELECT user_id, ts, event_id, {_tier_case_sql()} AS tier
      FROM events WHERE event_type = 'purchase'
    ),
    marked AS (
      SELECT user_id, ts, tier,
             CASE WHEN LAG(tier) OVER w IS DISTINCT FROM tier THEN 1 ELSE 0
               END AS chg
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, tier,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS run_id
      FROM marked
    ),
    hist AS (
      SELECT user_id, tier, run_id, MIN(ts) AS vf
      FROM runs GROUP BY 1, 2, 3
    ),
    versions AS (
      SELECT user_id, tier, vf,
             LEAD(vf) OVER (PARTITION BY user_id ORDER BY run_id) AS vt
      FROM hist
    )
    SELECT COALESCE(v.tier, 'none') AS tier_at_event,
           e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events e
    LEFT JOIN versions v
      ON v.user_id = e.user_id
     AND e.ts >= v.vf AND (v.vt IS NULL OR e.ts < v.vt)
    GROUP BY 1, 2
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join against the SCD2 dimension — the feature-store
    pattern: every event is enriched with the user's value tier AS OF
    the event's own timestamp (never the current tier — that's label
    leakage), then aggregated per (tier, event_type). The oracle spells
    the textbook form (range join on [valid_from, valid_to)); the Spark
    plan avoids the range join entirely with the union-carry trick:
    version-change rows and event rows interleave in one per-user
    ordered pass, a carried ``last(tier)`` assigns each event its
    then-current version — ONE shuffle on user_id, no interval probing,
    no IEJoin dependency. Events before a user's first version get tier
    'none' (the honest cold-start bucket).

    Scale: the dominant cost is one user_id exchange over events ∪
    versions; versions are run-length-compressed (|versions| ≪ |events|),
    so the union adds almost nothing. This is the exact shape ML feature
    backfills run at 100 TB — and why they don't need a temporal-join
    engine extension.
    """
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.expr(_tier_case_sql()).alias("tier")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = p.select(
        "user_id",
        "ts",
        "tier",
        F.when(
            ~F.lag("tier").over(w).eqNullSafe(F.col("tier")), F.lit(1)
        ).otherwise(F.lit(0)).alias("chg"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = marked.select(
        "user_id", "ts", "tier", F.sum("chg").over(wrun).alias("run_id")
    )
    versions = runs.groupBy("user_id", "tier", "run_id").agg(
        F.min(F.unix_micros("ts")).alias("ts_us")
    )
    changes = versions.select(
        "user_id",
        "ts_us",
        F.lit(0).alias("pri"),
        F.col("tier").alias("v_tier"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    ev_rows = e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(1).alias("pri"),
        F.lit(None).cast("string").alias("v_tier"),
        "event_type",
        "value",
    )
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "pri")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        changes.unionByName(ev_rows)
        .withColumn("tier_now", F.last("v_tier", ignorenulls=True).over(wc))
    )
    return (
        carried.filter(F.col("pri") == 1)
        .groupBy(
            F.coalesce("tier_now", F.lit("none")).alias("tier_at_event"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# --- BM25 shingle retrieval ---------------------------------------------------

BM25_TOPK = 3
# k1 = 6/5 and b = 3/4 (the classic 1.2 / 0.75), spelled as the integer
# cross-multiplied form below so every per-term score is one exact
# DECIMAL(38,0)/HUGEINT floor division and the per-pair score is a SUM
# OF BIGINTS — order-free, so the full relation hash-matches DuckDB.
# Derivation (q = query doc, d = train doc, term t):
#   idf_r(t)  = (N - df + 1/2) / (df + 1/2)          (rational idf — the
#               log-free Robertson form; logs differ in final ULPs
#               between libm and java.lang.Math, the docs_tfidf_topterms
#               precedent, so the MONOTONE rational core is scored)
#   sat(t, d) = tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl)),  avgdl = T/N
#   milli     = floor(1e6 idf_r sat)
#             = (2N - 2 df + 1) tf 44 T 1e6
#               DIV ((2 df + 1) (20 tf T + 6 T + 18 dl N))
# with N = train docs, T = total train shingle count, dl = the doc's
# shingle count — all integers. Magnitudes: numerator < 1e35 at 100 TB
# text (N ~ 1e10, T ~ 1e13, tf <= 1e4), inside DECIMAL(38,0)/HUGEINT.
# Engine casts differ BY NECESSITY: DuckDB's // on DECIMAL routes
# through DOUBLE (measured: low-digit drift at 1e22 numerators), so the
# oracle casts HUGEINT (// exact); Spark has no int128, so the operator
# casts DECIMAL(38,0) and floors via the exact remainder identity in
# the milli expression (decimal `div` half-up-rounds its intermediate).
_BM25_MILLI_NUM = (
    "CAST((2 * n - 2 * df + 1) AS DECIMAL(38,0)) * tf * 44 * t * 1000000"
)
_BM25_MILLI_DEN = (
    "CAST((2 * df + 1) AS DECIMAL(38,0))"
    " * (20 * tf * t + 6 * t + 18 * dl * n)"
)


@query(
    "text_bm25_shingle_retrieval",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text,
             ((instr('0123456789abcdef',
                     substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
              + instr('0123456789abcdef',
                      substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 10
               AS b
      FROM documents
    ),
    tr AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS words FROM split
      WHERE b < 8 AND len(string_split(text, ' ')) >= 3
    ),
    tg AS MATERIALIZED (
      SELECT doc_id,
             words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS term
      FROM tr, UNNEST(range(len(words) - 2)) AS u(i)
    ),
    tf AS MATERIALIZED (SELECT doc_id, term, COUNT(*) AS tf FROM tg GROUP BY 1, 2),
    dl AS MATERIALIZED (SELECT doc_id, len(words) - 2 AS dl FROM tr),
    scal AS MATERIALIZED (
      SELECT COUNT(*) AS n, CAST(SUM(len(words) - 2) AS BIGINT) AS t
      FROM tr
    ),
    df AS MATERIALIZED (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    dfp AS MATERIALIZED (SELECT df.term, df.df FROM df, scal WHERE 2 * df.df <= scal.n),
    qg AS MATERIALIZED (
      SELECT DISTINCT doc_id AS query_doc,
             words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS term
      FROM (
        SELECT doc_id, string_split(text, ' ') AS words FROM split
        WHERE b = 9 AND len(string_split(text, ' ')) >= 3
      ), UNNEST(range(len(words) - 2)) AS u(i)
    ),
    scored AS (
      SELECT qg.query_doc, tf.doc_id AS train_doc,
             ({_BM25_MILLI_NUM.replace("DECIMAL(38,0)", "HUGEINT").replace("n -", "scal.n -").replace("df +", "dfp.df +").replace("* tf", "* tf.tf").replace("* t *", "* scal.t *")})
             // ({_BM25_MILLI_DEN.replace("DECIMAL(38,0)", "HUGEINT").replace("df +", "dfp.df +").replace("tf *", "tf.tf *").replace("* t +", "* scal.t +").replace("6 * t", "6 * scal.t").replace("dl * n", "dl.dl * scal.n")})
               AS milli
      FROM qg
      JOIN dfp USING (term)
      JOIN tf USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id, scal
    ),
    agg AS MATERIALIZED (
      SELECT query_doc, train_doc,
             CAST(SUM(milli) AS BIGINT) AS bm25_milli,
             CAST(COUNT(*) AS INTEGER) AS n_shared_terms
      FROM scored GROUP BY 1, 2
    )
    SELECT query_doc, CAST(rnk AS INTEGER) AS rnk, train_doc,
           bm25_milli, n_shared_terms
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_doc ORDER BY bm25_milli DESC, train_doc
      ) AS rnk
      FROM agg
    ) WHERE rnk <= {BM25_TOPK}
    """,
)
def text_bm25_shingle_retrieval(
    spark: SparkSession, sf_dir: str, rep_min_n: int | None = None
) -> DataFrame:
    """BM25 retrieval over 3-word-shingle terms: each TEST-split document
    (the md5 bucket-9 convention shared with the contamination screen)
    queries the TRAIN split; per query the top-{BM25_TOPK} train docs by
    BM25(k1=1.2, b=0.75) with rational idf and exact fixed-point
    milli-scores (see _BM25_MILLI_NUM — no logs, no float sums, so the
    full relation hash-matches DuckDB). Shingle terms rather than
    unigrams: this corpus's unigram vocabulary is ~31 words (every term
    is a stopword by the df > N/2 rule), while its 3-gram space is rich
    — and n-gram indexing is the standard IR answer to tiny/noisy
    vocabularies. The term-based retrieval twin of the embedding ANN
    family (similarity_topk_*): the candidate generator a production
    dedup/quality pipeline runs when embeddings are too expensive.

    Stopword pruning (2 df <= N) is part of the contract (mirrored in
    the oracle): terms in over half the corpus carry near-zero idf and
    dominate posting volume — exactly the terms a 100 TB posting build
    drops. The prune is DICTIONARY-side (r16, matching the oracle's
    ``dfp`` CTE): the vocabulary-sized df frame is filtered against the
    broadcast (N, T) scalar BEFORE the postings join, so stopword
    posting lists never fan out through the query x postings exchange.

    Scale shape: tokenize/shingle once per split; the heavy exchange is
    the POSTINGS JOIN (query terms x train tf, keyed on term — bounded
    by pruned posting-list sizes, the standard IR cost); df and the
    (N, T) scalars are vocabulary-/1-row-sized (broadcast; the scalar
    frame rides a broadcast cross-join, the q22 idiom), dl is doc-keyed
    and joins AFTER the per-(query, train, term) frame collapses to
    nothing — actually before the aggregate, but as a broadcast of a
    doc-count-sized frame. Top-k per query is a rank window with
    group-limit pushdown. At 100 TB: bucket tf by term (co-located
    postings), replace the full df relation with the pruned dictionary
    broadcast, and cap posting lists by impact order — the plan shape
    is unchanged.
    """
    from oe_batch_processing_spark.operators.pipeline import _SPLIT_BYTE
    from oe_batch_processing_spark.tables import table_row_count

    gate = BM25_REP_MIN_N if rep_min_n is None else rep_min_n
    # metadata-only gate (the r15 footer-count convention): every
    # committed SF keeps the flat plan the oracle checks directly
    if table_row_count(sf_dir, "documents") >= gate:
        return _bm25_collapsed(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPLIT_BYTE) % 10
    tagged = docs.select("doc_id", "text", bucket.alias("b"))
    w = 3
    gram_expr = (
        f"CASE WHEN size(tk) >= {w} THEN "
        f"transform(sequence(1, size(tk) - {w - 1}), "
        f"i -> array_join(slice(tk, i, {w}), ' ')) "
        "ELSE array() END"
    )
    tr = (
        tagged.filter(F.col("b") < 8)
        .select("doc_id", F.split("text", " ").alias("tk"))
        .filter(F.size("tk") >= w)
    )
    tg = tr.select(
        "doc_id", F.explode(F.expr(gram_expr)).alias("term")
    )
    tf = tg.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tr.select("doc_id", (F.size("tk") - (w - 1)).alias("dl"))
    scal = tr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("tk") - (w - 1)).cast("long").alias("t"),
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qg = (
        tagged.filter(F.col("b") == 9)
        .select(
            F.col("doc_id").alias("query_doc"),
            F.split("text", " ").alias("tk"),
        )
        .filter(F.size("tk") >= w)
        .select(
            "query_doc", F.explode(F.expr(gram_expr)).alias("term")
        )
        .distinct()
    )
    # Dictionary-side stopword prune (oracle-mirrored: the oracle's dfp
    # CTE). r15 shipped the `2*df <= n` filter ABOVE the postings join —
    # but `n` arrived via the post-join broadcast cross-join, so Catalyst
    # could not push the prune below it and the stopword terms' posting
    # lists (by definition the largest) entered the heavy query x postings
    # exchange only to be filtered after the fan-out. Pruning the
    # VOCABULARY-sized df frame first (the scalar broadcast is free at any
    # scale) means the qg-dictionary join drops stopword query terms
    # before tf is touched, so the quadratic (query-doc x posting-entry)
    # blowup never materializes for pruned terms. (`n` counts TRAIN docs
    # with >= 3 tokens — a filtered aggregate, so the parquet-footer
    # table_row_count path cannot supply it; the 1-row broadcast is the
    # metadata-free equivalent.)
    # (broadcasting the SAME scal frame here and below lets Spark reuse
    # one broadcast exchange for both references)
    dfp = (
        df.crossJoin(F.broadcast(scal))
        .filter(F.expr("2 * df <= n"))
        .select("term", "df")
    )
    scored = (
        qg.join(dfp, "term")
        .join(tf, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(scal))
        .select(
            "query_doc",
            F.col("doc_id").alias("train_doc"),
            # exact floor division: Spark's decimal `div` ROUNDS the
            # intermediate quotient (HALF_UP at scale 6) before taking
            # the integral part, which disagrees with DuckDB's exact
            # HUGEINT // on ~1-in-a-few quotients; BigDecimal remainder
            # (%) is EXACT, so (num - num % den) / den is an exact
            # multiple and the final division is lossless.
            F.expr(
                f"CAST((({_BM25_MILLI_NUM}) - (({_BM25_MILLI_NUM}) % "
                f"({_BM25_MILLI_DEN}))) / ({_BM25_MILLI_DEN}) AS BIGINT)"
            ).alias("milli"),
        )
    )
    agg = scored.groupBy("query_doc", "train_doc").agg(
        F.sum("milli").cast("long").alias("bm25_milli"),
        F.count(F.lit(1)).cast("int").alias("n_shared_terms"),
    )
    wnd = Window.partitionBy("query_doc").orderBy(
        F.desc("bm25_milli"), F.asc("train_doc")
    )
    return (
        agg.withColumn("rnk", F.row_number().over(wnd))
        .filter(F.col("rnk") <= BM25_TOPK)
        .select(
            "query_doc",
            F.col("rnk").cast("int").alias("rnk"),
            "train_doc",
            "bm25_milli",
            "n_shared_terms",
        )
    )


BM25_REP_MIN_N = 8192  # the collapse family's gate convention: committed
# SFs (<= 5,000 docs) keep the flat plan the DuckDB oracle checks
# directly; the replica-heavy probe corpora engage the collapse below.


def _bm25_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-representative collapse of the BM25 retrieval (r15, gated
    at ``BM25_REP_MIN_N`` — the flat postings join pays replica-count^2
    on replica-heavy corpora: the 30x probe read 37.02x with slope x5.3
    per 3x). Exactness, piece by piece:

    * tf and dl are CONTENT-determined; df, N, T count DOCUMENTS, so at
      content level they are the doc-WEIGHTED sums: a content with
      ``n_train`` train members contributes ``n_train`` to df for each
      of its distinct terms, ``n_train`` to N, and ``n_train * dl`` to
      T — exact integer regroupings of the flat sums (the DSIR/PCA
      weighted-collapse precedent).
    * Every test member of a query content receives the IDENTICAL
      ranked list (scores never read the query doc id), so query-side
      expansion is a verbatim replication.
    * Train-side top-k: the flat output ranks member rows by
      (milli DESC, doc_id ASC); all members of one content tie at its
      milli, so interleaving happens only BETWEEN tied contents. Stage
      1 keeps, per query content, dense_rank <= k content candidates
      under (milli DESC, min-train-member ASC) — a content
      contributing a flat top-k row has its best row (milli, min
      member) among the k best best-rows, so the kept set is a
      SUPERSET of contributors (the ann_rep_expand_topk argument,
      without the self-exclusion — splits are disjoint doc sets, and
      a train doc textually identical to the query is a legitimate
      hit in both paths). Stage 2 explodes the kept contents' train
      members and applies the exact member-level
      row_number() over (milli DESC, doc_id ASC) <= k, which the
      restriction cannot change (any member beating a kept top-k
      member belongs to a content that also survives stage 1).
    """
    from oe_batch_processing_spark.operators.dedup import content_rep_groups
    from oe_batch_processing_spark.operators.pipeline import _SPLIT_BYTE

    docs = load_table(spark, sf_dir, "documents")
    groups = content_rep_groups(docs)
    d_byte = _SPLIT_BYTE.replace("doc_id", "d")
    w = 3
    gram_expr = (
        f"CASE WHEN size(tk) >= {w} THEN "
        f"transform(sequence(1, size(tk) - {w - 1}), "
        f"i -> array_join(slice(tk, i, {w}), ' ')) "
        "ELSE array() END"
    )
    base = groups.select(
        F.col("rep_id"),
        F.split("text", " ").alias("tk"),
        F.expr(
            f"array_sort(filter(members, d -> ({d_byte}) % 10 < 8))"
        ).alias("train_members"),
        F.expr(
            f"array_sort(filter(members, d -> ({d_byte}) % 10 = 9))"
        ).alias("test_members"),
    ).filter(F.size("tk") >= w)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ctr = (
        base.filter(F.size("train_members") >= 1)
        .select(
            F.col("rep_id").alias("t_rep"),
            "tk",
            F.size("train_members").alias("n_tr"),
            (F.size("tk") - (w - 1)).alias("dl"),
            "train_members",
        )
        .repartition(n_part)
    )
    tg = ctr.select(
        "t_rep", "n_tr", F.explode(F.expr(gram_expr)).alias("term")
    )
    tf = tg.groupBy("t_rep", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("n_tr").alias("n_tr")
    )
    dl = ctr.select("t_rep", "dl")
    scal = ctr.agg(
        F.sum("n_tr").alias("n"),
        F.sum(F.col("n_tr").cast("long") * F.col("dl")).alias("t"),
    )
    # doc-weighted document frequency: sum of member counts over the
    # contents containing the term
    df = tf.groupBy("term").agg(F.sum("n_tr").alias("df"))
    qg = (
        base.filter(F.size("test_members") >= 1)
        .select(
            F.col("rep_id").alias("q_rep"),
            F.explode(F.expr(gram_expr)).alias("term"),
        )
        .distinct()
    )
    # dictionary-side stopword prune (the flat path's r16 fix, mirrored):
    # prune the vocabulary-sized doc-weighted df frame BEFORE the postings
    # join so stopword posting lists never enter the heavy exchange
    dfp = (
        df.crossJoin(F.broadcast(scal))
        .filter(F.expr("2 * df <= n"))
        .select("term", "df")
    )
    scored = (
        qg.join(dfp, "term")
        .join(tf.drop("n_tr"), "term")
        .join(dl, "t_rep")
        .crossJoin(F.broadcast(scal))
        .select(
            "q_rep",
            "t_rep",
            F.expr(
                f"CAST((({_BM25_MILLI_NUM}) - (({_BM25_MILLI_NUM}) % "
                f"({_BM25_MILLI_DEN}))) / ({_BM25_MILLI_DEN}) AS BIGINT)"
            ).alias("milli"),
        )
    )
    agg = scored.groupBy("q_rep", "t_rep").agg(
        F.sum("milli").cast("long").alias("bm25_milli"),
        F.count(F.lit(1)).cast("int").alias("n_shared_terms"),
    )
    # stage 1: content-candidate prune under (milli desc, best member asc)
    cand = agg.join(
        ctr.select("t_rep", "train_members"), "t_rep"
    ).withColumn("best_id", F.expr("train_members[0]"))
    w1 = Window.partitionBy("q_rep").orderBy(
        F.desc("bm25_milli"), F.asc("best_id")
    )
    kept = (
        cand.withColumn("rk0", F.dense_rank().over(w1))
        .filter(F.col("rk0") <= BM25_TOPK)
        .drop("rk0", "best_id")
    )
    # stage 2: exact member-level re-truncation
    mem = kept.select(
        "q_rep", "bm25_milli", "n_shared_terms",
        F.explode("train_members").alias("train_doc"),
    )
    w2 = Window.partitionBy("q_rep").orderBy(
        F.desc("bm25_milli"), F.asc("train_doc")
    )
    top = (
        mem.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= BM25_TOPK)
    )
    # query-side replication: every test member of the query content
    qmem = base.filter(F.size("test_members") >= 1).select(
        F.col("rep_id").alias("q_rep"),
        F.explode("test_members").alias("query_doc"),
    )
    return top.join(qmem, "q_rep").select(
        "query_doc",
        F.col("rnk").cast("int").alias("rnk"),
        "train_doc",
        "bm25_milli",
        "n_shared_terms",
    )
