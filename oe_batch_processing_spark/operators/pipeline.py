"""Composite training-data pipeline operators: the end-to-end filter a
corpus actually runs before tokenization — rule-based quality gates +
fingerprint dedup folded into one classification pass — and a trailing-
window anomaly detector over the event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table, table_row_count

MIN_CHARS = 180
MAX_SPACE_RATIO = 0.25
TARGET_LANGS = ("en", "de", "es", "fr")


@query(
    "pipeline_quality_filter",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id, lang,
             LENGTH(text) AS n_chars_actual,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
               / LENGTH(text) AS space_ratio,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS fp_rank
      FROM enriched
    ),
    classified AS (
      SELECT doc_id,
             CASE
               WHEN fp_rank > 1 THEN 'duplicate'
               WHEN n_chars_actual < {MIN_CHARS} THEN 'too_short'
               WHEN space_ratio > {MAX_SPACE_RATIO} THEN 'low_quality'
               WHEN lang NOT IN ('en', 'de', 'es', 'fr') THEN 'non_target_lang'
               ELSE 'keep'
             END AS decision
      FROM ranked
    )
    SELECT decision, COUNT(*) AS n_docs,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM documents) AS fraction
    FROM classified
    GROUP BY decision
    """,
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus filter: fingerprint-dedup > length gate > quality
    gate > language gate, first matching rule wins; reports the funnel of
    drop reasons. One scan + one window over the fingerprint + one tiny agg
    — exactly how the pass runs at 100 TB (decision column written back,
    `keep` partition feeds tokenization)."""
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    n_chars = F.length("text")
    space_ratio = (n_chars - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).cast(
        "double"
    ) / n_chars
    enriched = docs.select(
        "doc_id",
        "lang",
        n_chars.alias("n_chars_actual"),
        space_ratio.alias("space_ratio"),
        fp.alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    classified = enriched.withColumn("fp_rank", F.row_number().over(w)).select(
        "doc_id",
        F.when(F.col("fp_rank") > 1, "duplicate")
        .when(F.col("n_chars_actual") < MIN_CHARS, "too_short")
        .when(F.col("space_ratio") > MAX_SPACE_RATIO, "low_quality")
        .when(~F.col("lang").isin(*TARGET_LANGS), "non_target_lang")
        .otherwise("keep")
        .alias("decision"),
    )
    return classified.groupBy("decision").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)).cast("double") / F.lit(total)).alias("fraction"),
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, value,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
      FROM events
    ),
    stats AS (
      SELECT event_id, user_id, value,
             COUNT(*) OVER w AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(value * value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, value,
           (value - s1 / n) / SQRT((s2 - s1 * s1 / n) / n) AS zscore
    FROM stats
    WHERE n >= 10
      AND (s2 - s1 * s1 / n) / n > 0
      AND ABS((value - s1 / n) / SQRT((s2 - s1 * s1 / n) / n)) > 2.5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each event scored against the
    mean/std of the user's previous <=20 events (exact decimal moments over
    a ROWS frame => engine-exact z-scores); |z| > 2.5 flagged. One window
    pass, no self-joins — the streaming-friendly shape (the stateful twin
    would carry the trailing buffer in applyInPandasWithState)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(-20, -1)
    )
    stats = e.select(
        "event_id",
        "user_id",
        "value",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("s1"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / F.col("n")
    z = (F.col("value") - mean) / F.sqrt(var)
    return (
        stats.filter((F.col("n") >= 10) & (var > 0) & (F.abs(z) > 2.5))
        .select("event_id", "user_id", "value", z.alias("zscore"))
    )


@query("sample_stratified_documents")  # seeded sampling: rows-only check
def sample_stratified_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus downsampling (per-language fractions, fixed seed) —
    the deterministic-given-seed subsample step of a training-data pipeline.
    Seeded Bernoulli sampling is engine-specific, so rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    fractions = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 0.25}
    sampled = docs.sampleBy("lang", fractions, seed=42)
    return sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))


@query(
    "events_resample_5min",
    oracle="""
    WITH bounds AS (
      SELECT CAST(floor(MIN(epoch(ts)) / 300) AS BIGINT) AS b0,
             CAST(floor(MAX(epoch(ts)) / 300) AS BIGINT) AS b1
      FROM events
    ),
    grid AS (
      SELECT b0 + i AS bucket FROM bounds, UNNEST(range(b1 - b0 + 1)) AS t(i)
    ),
    counts AS (
      SELECT CAST(floor(epoch(ts) / 300) AS BIGINT) AS bucket, COUNT(*) AS n
      FROM events GROUP BY 1
    )
    SELECT strftime(make_timestamp(grid.bucket * 300 * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS bucket_ts,
           COALESCE(n, 0) AS n_events
    FROM grid LEFT JOIN counts ON grid.bucket = counts.bucket
    """,
)
def events_resample_5min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap filling: a dense 5-minute grid from
    min to max event time, empty buckets filled with 0 — the regularization
    step before any windowed model input. Grid generated with
    sequence+explode (no driver loop); at scale the grid is tiny relative
    to events and broadcast-joins to the counts."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.floor(F.unix_micros("ts") / F.lit(300_000_000)).alias("bucket")
    bounds = e.select(bucket).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = bounds.select(
        F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("bucket")
    )
    counts = e.select(bucket).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    return (
        grid.join(counts, "bucket", "left")
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("bucket") * 300), "yyyy-MM-dd HH:mm:ss"
            ).alias("bucket_ts"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


@query(
    "events_value_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) AS BIGINT) AS bin,
           COUNT(*) AS n,
           MIN(value) AS bin_min,
           MAX(value) AS bin_max
    FROM events
    GROUP BY 1
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (bin = floor(value/50)) — the cheap
    distribution profile run before choosing filters/clips."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.floor(F.col("value") / 50).alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("bin_min"),
        F.max("value").alias("bin_max"),
    )


# --- deterministic split + sequence packing ---------------------------------

# train/val/test by the first md5 byte of the doc id: 80/10/10. Hash-based
# (not modulo-id) so the split is stable under re-ingestion, insertion order,
# and partial reprocessing — the property a training pipeline actually needs.
_SPLIT_BYTE = (
    "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1)"
    " * 16 + instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1"
)
_SPLIT_BYTE_DUCK = _SPLIT_BYTE.replace("CAST(doc_id AS STRING)", "CAST(doc_id AS VARCHAR)")


@query(
    "docs_train_val_test_split",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN ({_SPLIT_BYTE_DUCK}) % 10 < 8 THEN 'train'
                WHEN ({_SPLIT_BYTE_DUCK}) % 10 = 8 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def docs_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 corpus split keyed on md5(doc_id) — identical
    assignment on any engine, any partitioning, any ingestion order (the
    md5-byte decode is the same instr() idiom the simhash oracle uses, so
    DuckDB reproduces it bit-for-bit). Pure codegen projection: zero
    shuffles, runs at scan speed at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SPLIT_BYTE) % 10
    return docs.select(
        "doc_id",
        "lang",
        F.when(bucket < 8, "train").when(bucket == 8, "val").otherwise("test").alias(
            "split"
        ),
    )


PACK_BUDGET = 4096  # token budget per packed training sequence


@query(
    "pipeline_pack_sequences",
    oracle=f"""
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((cum - n_tokens) / {PACK_BUDGET}.0) AS BIGINT) AS pack_id
    FROM (
      SELECT doc_id, lang,
             LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
             SUM(LEN(regexp_extract_all(text, '[A-Za-z0-9]+')))
               OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    )
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget training
    packs (4096 tokens) per language, by running token count in stable
    doc_id order — pack_id = floor(offset / budget), the linear-packing
    rule. Deterministic integer arithmetic, so both engines agree exactly.

    Scale shape: one shuffle to partition by lang; the running sum is a
    within-partition window (Spark computes it without a second exchange).
    A giant language is the skew risk — shard the window key to
    (lang, doc_id div RANGE) and offset pack ids per shard to keep packs
    deterministic while bounding partition size.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.regexp_count("text", F.lit("[A-Za-z0-9]+"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens")
    ).withColumn("cum", F.sum("n_tokens").over(w))
    return staged.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / float(PACK_BUDGET))
        .cast("long")
        .alias("pack_id"),
    )


@query(
    "users_churn_labels",
    oracle="""
    WITH b AS (
      SELECT CAST(epoch_ns(MIN(ts)) // 1000 AS BIGINT) AS t0,
             CAST(epoch_ns(MAX(ts)) // 1000 AS BIGINT) AS t1
      FROM events
    ),
    bounds AS (SELECT t0 + ((t1 - t0) * 8) // 10 AS cutoff_us FROM b),
    o AS (
      SELECT user_id, value,
             CAST(epoch_ns(ts) // 1000 AS BIGINT) AS ts_us
      FROM events
    ),
    feat AS (
      SELECT user_id,
             COUNT(*) AS n_events_feat,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               AS total_value_feat,
             MAX(ts_us) AS last_feat_us
      FROM o, bounds WHERE ts_us < cutoff_us GROUP BY user_id
    ),
    label AS (
      SELECT DISTINCT user_id FROM o, bounds WHERE ts_us >= cutoff_us
    )
    SELECT f.user_id, f.n_events_feat, f.total_value_feat,
           ((SELECT cutoff_us FROM bounds) - f.last_feat_us) // 3600000000
             AS hours_quiet_at_cutoff,
           l.user_id IS NULL AS churned
    FROM feat f LEFT JOIN label l ON l.user_id = f.user_id
    """,
)
def users_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-label generation with leakage discipline: features are
    computed STRICTLY before the cutoff (the 80% point of the data's
    time span, in exact integer microseconds so it's range-relative and
    engine-identical), the label is "no activity at or after the cutoff" — the temporal
    split every supervised pipeline needs and the one naive joins get
    wrong (features peeking past the cutoff inflate offline metrics and
    die in production). Deterministic: the cutoff is integer
    arithmetic on the observed span, so the labelset is re-runnable and
    engine-exact.

    Scale: one filtered aggregate per side of the cutoff plus a keyed
    left join — and the cutoff predicate pushes to the parquet scan, so
    the feature pass reads only pre-cutoff row groups when data is
    time-partitioned (the usual layout).
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    cutoff_df = e.agg(
        (
            F.min("ts_us")
            + F.expr("((max(ts_us) - min(ts_us)) * 8) div 10")
        ).alias("cutoff_us")
    )
    with_cut = e.crossJoin(F.broadcast(cutoff_df))
    feat = (
        with_cut.filter(F.col("ts_us") < F.col("cutoff_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events_feat"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value_feat"),
            F.max("ts_us").alias("last_feat_us"),
            F.max("cutoff_us").alias("cutoff_us"),
        )
    )
    label = (
        with_cut.filter(F.col("ts_us") >= F.col("cutoff_us"))
        .select("user_id")
        .distinct()
        .withColumn("active_after", F.lit(1))
    )
    return feat.join(label, "user_id", "left").select(
        "user_id",
        "n_events_feat",
        "total_value_feat",
        F.expr("(cutoff_us - last_feat_us) div 3600000000").alias(
            "hours_quiet_at_cutoff"
        ),
        F.col("active_after").isNull().alias("churned"),
    )


@query(
    "pipeline_mix_temperature_sqrt",
    oracle="""
    WITH g AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
    w AS (
      SELECT lang, n_docs,
             CAST(floor(1000000 * sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)
               AS w_scaled
      FROM g
    ),
    t AS (
      SELECT lang, n_docs, w_scaled,
             (100000 * w_scaled) // SUM(w_scaled) OVER () AS base,
             (100000 * w_scaled) % SUM(w_scaled) OVER () AS rem
      FROM w
    ),
    r AS (
      SELECT lang, n_docs, w_scaled, base, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk,
             100000 - SUM(base) OVER () AS deficit
      FROM t
    )
    SELECT lang, n_docs, w_scaled,
           CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
             AS mix_per_100k,
           CAST((1000000 * n_docs) // SUM(n_docs) OVER () AS BIGINT)
             AS natural_ppm
    FROM r
    """,
)
def pipeline_mix_temperature_sqrt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual mixing (T = 0.5): sampling weights
    ∝ n_docs^(1/2) — the standard upsampling of low-resource languages
    against the natural distribution's head (the multilingual-pretraining
    recipe). T = 0.5 is chosen deliberately: the exponent becomes
    ``sqrt``, which IEEE-754 rounds correctly, so the weights — floored
    to 1e6-scaled integers — and the largest-remainder allocation of a
    100k-sample budget are engine-exact end to end (arbitrary
    temperatures need ``pow``, whose libm drift is why the LM operators
    avoid transcendental space; at production you'd quantize the weights
    once and ship them as a literal table). Natural-distribution ppm is
    emitted alongside so the upsampling factor is visible per language.

    Scale: a |langs|-sized problem after one count shuffle — the
    apportionment maths is free; the downstream sampler consumes the
    quotas (``sample_stratified_documents``).
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    w = g.select(
        "lang",
        "n_docs",
        F.floor(
            F.lit(1000000) * F.sqrt(F.col("n_docs").cast("double"))
        )
        .cast("long")
        .alias("w_scaled"),
    )
    t = w.select(
        "lang",
        "n_docs",
        "w_scaled",
        F.expr("100000 * w_scaled").alias("scaled"),
        F.sum("w_scaled").over(w_all).alias("wtot"),
        F.sum("n_docs").over(w_all).alias("ntot"),
    ).select(
        "lang",
        "n_docs",
        "w_scaled",
        F.expr("scaled div wtot").alias("base"),
        (F.col("scaled") % F.col("wtot")).alias("rem"),
        "ntot",
    )
    r = t.select(
        "lang",
        "n_docs",
        "w_scaled",
        "base",
        "ntot",
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), "lang"))
        .alias("rk"),
        (F.lit(100000) - F.sum("base").over(w_all)).alias("deficit"),
    )
    return r.select(
        "lang",
        "n_docs",
        "w_scaled",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)
        ).alias("mix_per_100k"),
        F.expr("(1000000 * n_docs) div ntot").alias("natural_ppm"),
    )


@query(
    "pipeline_curriculum_order",
    oracle="""
    WITH banded AS (
      SELECT doc_id,
             CASE WHEN n_chars < 700 THEN 0
                  WHEN n_chars < 1000 THEN 1
                  WHEN n_chars < 1300 THEN 2
                  ELSE 3 END AS band,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT doc_id, CAST(band AS INTEGER) AS band,
           CAST(ROW_NUMBER() OVER (ORDER BY band, h, doc_id) AS BIGINT)
             AS curriculum_pos
    FROM banded
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: assign every document a GLOBAL training
    position — easy band first (short docs here; any difficulty score
    slots in), hash-shuffled within each band so the curriculum is
    deterministic yet unclustered. The naive spelling is one
    ``row_number() OVER (ORDER BY ...)`` — a single-partition sort of
    the entire corpus, the canonical scale-killer. The scale shape used
    here is the two-pass split: (1) count per band (tiny aggregate),
    (2) prefix-sum those counts into band offsets (broadcast), (3)
    row_number only WITHIN each band partition, (4) position = band
    offset + intra-band rank. The global sort never materializes on one
    node; the oracle IS the naive global spelling, proving the
    decomposition exact.

    Scale: one hash shuffle on band for the windows (bands are few but
    each band's window is itself partition-parallel after AQE splits;
    for true 100 TB, sub-salt the band key and add the salt to the
    offset arithmetic — same identity, documented in SCALE.md).
    """
    docs = load_table(spark, sf_dir, "documents")
    banded = docs.select(
        "doc_id",
        F.when(F.col("n_chars") < 700, 0)
        .when(F.col("n_chars") < 1000, 1)
        .when(F.col("n_chars") < 1300, 2)
        .otherwise(3)
        .cast("int")
        .alias("band"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    counts = banded.groupBy("band").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.select(
        "band",
        (
            F.sum("n").over(
                Window.orderBy("band").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("offset"),
    ).fillna({"offset": 0})
    rn = F.row_number().over(Window.partitionBy("band").orderBy("h", "doc_id"))
    return (
        banded.withColumn("rn", rn)
        .join(F.broadcast(offsets), "band")
        .select(
            "doc_id",
            "band",
            (F.col("offset") + F.col("rn")).cast("bigint").alias("curriculum_pos"),
        )
    )


# --- corpus data card --------------------------------------------------------

_DATA_CARD_SQL = """
    WITH d AS (
      SELECT lang, source, n_chars,
             {size_split} AS n_tokens,
             CASE WHEN COUNT(*) OVER (PARTITION BY text) > 1
                  THEN 1 ELSE 0 END AS is_dup,
             CASE WHEN n_chars < 100 THEN 1 ELSE 0 END AS is_short
      FROM documents
    )
    SELECT CASE WHEN GROUPING(lang) = 1 THEN '(all)' ELSE lang END AS lang,
           CASE WHEN GROUPING(source) = 1 THEN '(all)' ELSE source END
             AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
           CAST(SUM(is_short) AS BIGINT) AS n_short_docs,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM d
    GROUP BY GROUPING SETS ((lang), (source), (lang, source), ())
"""


@query(
    "pipeline_data_card",
    oracle=_DATA_CARD_SQL.format(
        size_split="len(string_split(text, ' '))"
    ),
)
def pipeline_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATA CARD: one GROUPING SETS pass producing the summary a
    training-data release ships — per-language, per-source, per-(language ×
    source) and overall doc counts, char/token volume, exact-duplicate
    document counts (text appears more than once in the corpus — a window
    count, not a self-join), and short-doc counts. The '(all)' rows come
    from GROUPING() so a NULL language can never masquerade as a rollup
    row.

    Scale: ONE shuffle for the duplicate window (partition by text — at
    100 TB partition by xxhash64(text)), then one grouping-sets aggregate;
    Spark expands the 4 sets in a single Expand+HashAggregate, map-side
    partial, |langs × sources| result rows regardless of corpus size.
    """
    from oe_batch_processing_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        _DATA_CARD_SQL.format(size_split="size(split(text, ' '))")
    )


# --- train/val leakage report ------------------------------------------------


@query(
    "pipeline_split_leakage_report",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text,
             CASE WHEN ({_SPLIT_BYTE_DUCK}) % 10 < 8 THEN 'train'
                  WHEN ({_SPLIT_BYTE_DUCK}) % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    shingles AS (
      SELECT DISTINCT doc_id, split,
             words[i+1] || ' ' || words[i+2] || ' ' || words[i+3] AS sh
      FROM (
        SELECT doc_id, split, string_split(text, ' ') AS words FROM split
        WHERE len(string_split(text, ' ')) >= 3
      ), UNNEST(range(len(words) - 2)) AS t(i)
    ),
    counts AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    cross_pairs AS (
      SELECT t.doc_id AS train_doc, h.doc_id AS held_doc, h.split AS held_split,
             COUNT(*) AS n_common
      FROM shingles t JOIN shingles h ON t.sh = h.sh
      WHERE t.split = 'train' AND h.split <> 'train'
      GROUP BY 1, 2, 3
    ),
    leaks AS (
      SELECT held_split, held_doc, train_doc,
             CAST(n_common AS DOUBLE) / (nt.n + nh.n - n_common) AS jaccard
      FROM cross_pairs
      JOIN counts nt ON nt.doc_id = train_doc
      JOIN counts nh ON nh.doc_id = held_doc
      WHERE CAST(n_common AS DOUBLE) / (nt.n + nh.n - n_common) >= 0.8
    )
    SELECT held_split,
           CAST(COUNT(DISTINCT held_doc) AS BIGINT) AS n_leaked_docs,
           CAST(COUNT(*) AS BIGINT) AS n_leak_pairs,
           CAST(MIN(held_doc) AS BIGINT) AS first_leaked_doc
    FROM leaks
    GROUP BY held_split
    """,
)
def pipeline_split_leakage_report(
    spark: SparkSession, sf_dir: str, rep_min_n: int | None = None
) -> DataFrame:
    """Train→holdout LEAKAGE audit — the check every training pipeline
    must run before trusting an eval number: near-duplicate pairs (word-
    trigram Jaccard >= 0.8, same ground truth as the dedup family) that
    CROSS the md5-stable train/val/test split, reported per held-out
    split. A val doc that near-duplicates a train doc invalidates the
    perplexity/benchmark signal; this op counts exactly those docs and
    pairs. Composes three already-oracled primitives — the hash split,
    the shingle inverted index, and exact Jaccard — into the capstone
    question, and inherits their exactness, so the report itself is
    hash-checked.

    Scale (round-14 collapse, gated at ``LEAKAGE_REP_MIN_N`` — the r14
    30x probe read 41.95x with a superlinear decade slope on the flat
    form): jaccard is content-determined and the split is doc-keyed, so
    above the gate the quadratic pair stage runs on CONTENT
    REPRESENTATIVES (the shared ``rep_jaccard_pairs`` half of
    ``dedup_jaccard_shingles``) and the doc-level report is recovered
    by exact counting arithmetic instead of pair expansion: with
    ``partner_train(b) = sum of train-member counts over b's qualifying
    contents`` (the symmetrized >= 0.8 rep relation plus the
    trigram-gated self edge),
    ``n_leak_pairs(s) = sum_b partner_train(b) * n_s(b)`` and
    ``n_leaked_docs(s) = sum_{b: partner_train(b) >= 1} n_s(b)`` —
    every holdout member of a qualifying content leaks, every
    (train member x holdout member) pair is counted exactly once; the
    doc-level leak relation never materializes (30x probe scaled wall
    149.9 -> 8.5 s). BELOW the gate (every committed SF) the flat
    doc-level inverted-index form stays — it is leaner on a
    near-dup-free corpus (~+3.5 s collapse overhead at sf0.1, the
    family's disclosed trade), and the DuckDB hash oracle checks it
    directly; the collapsed path is pinned by a flat-vs-collapsed
    replica-corpus agreement test and the probe decades. At 100 TB,
    swap the exact rep pair stage for MinHash candidates + exact
    verify — the contract is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    gate = LEAKAGE_REP_MIN_N if rep_min_n is None else rep_min_n
    # metadata-only gate (r15): parquet footer count, no Spark job — the
    # operator body stays lazy and plan-only tooling pays nothing.
    if table_row_count(sf_dir, "documents") < gate:
        return _split_leakage_report_flat(spark, docs)
    from oe_batch_processing_spark.operators.dedup import (
        content_rep_groups,
        rep_jaccard_pairs,
    )

    groups = content_rep_groups(docs)
    membership = groups.select(
        "rep_id", F.explode("members").alias("doc_id")
    )
    bucket = F.expr(_SPLIT_BYTE) % 10
    tagged = membership.select(
        "rep_id",
        "doc_id",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
    # per-content train mass and per-(content, holdout-split) stats
    train_mass = (
        tagged.filter(F.col("split") == "train")
        .groupBy("rep_id")
        .agg(F.count(F.lit(1)).alias("n_train"))
    )
    hold = (
        tagged.filter(F.col("split") != "train")
        .groupBy("rep_id", "split")
        .agg(
            F.count(F.lit(1)).alias("n_s"),
            F.min("doc_id").alias("min_doc"),
        )
    )
    # qualifying content relation: symmetrized rep pairs at J >= 0.8 plus
    # the self edge for any content that enters the shingle relation at
    # all (>= 3 words => >= 1 trigram; identical texts pair at J = 1.0)
    q = rep_jaccard_pairs(spark, groups, 0.8).select("rep_a", "rep_b")
    edges = (
        q.select(F.col("rep_a").alias("a"), F.col("rep_b").alias("b"))
        .unionByName(
            q.select(F.col("rep_b").alias("a"), F.col("rep_a").alias("b"))
        )
        .unionByName(
            groups.filter(F.size(F.split("text", " ")) >= 3).select(
                F.col("rep_id").alias("a"), F.col("rep_id").alias("b")
            )
        )
    )
    partner_train = (
        edges.join(
            train_mass.select(F.col("rep_id").alias("a"), "n_train"), "a"
        )
        .groupBy("b")
        .agg(F.sum("n_train").alias("pt"))
    )
    leaks = hold.join(
        partner_train.select(F.col("b").alias("rep_id"), "pt"), "rep_id"
    )
    return leaks.groupBy(F.col("split").alias("held_split")).agg(
        F.sum("n_s").alias("n_leaked_docs"),
        F.sum(F.col("pt") * F.col("n_s")).alias("n_leak_pairs"),
        F.min("min_doc").alias("first_leaked_doc"),
    )


LEAKAGE_REP_MIN_N = 8192  # the collapse family's gate convention: every
# committed SF (500 / 5,000 docs) keeps the flat plan the hash oracle
# checks; probe corpora (50k / 150k) engage the representative collapse


def _split_leakage_report_flat(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The sub-gate doc-level form (the original r8-era plan): shingle
    inverted-index train x holdout join, exact Jaccard, per-split report."""
    bucket = F.expr(_SPLIT_BYTE) % 10
    tagged = docs.select(
        "doc_id",
        "text",
        F.when(bucket < 8, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
    from oe_batch_processing_spark.operators.dedup import word_shingles

    # r17: the split tag AND the per-doc distinct-shingle count ride
    # THROUGH the shingle explode (carry/count columns) instead of a
    # re-attach join and a count-aggregate branch; the keyed index is
    # PERSISTED for the two self-join sides (the r16 winnowing-pairs
    # finding applied to this flat sibling), and the pair aggregate keys
    # on (nt, nh) — functionally dependent on the doc ids — so the
    # per-doc count joins disappear from the plan.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sh = (
        word_shingles(tagged, 3, carry=("split",), count_col="n")
        .repartition(n_part, "sh")
        .persist()
    )
    t = sh.filter(F.col("split") == "train").alias("t")
    h = sh.filter(F.col("split") != "train").hint("shuffle_hash").alias("h")
    cross = (
        t.join(h, F.col("t.sh") == F.col("h.sh"))
        .groupBy(
            F.col("t.doc_id").alias("train_doc"),
            F.col("h.doc_id").alias("held_doc"),
            F.col("h.split").alias("held_split"),
            F.col("t.n").alias("nt"),
            F.col("h.n").alias("nh"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("nt") + F.col("nh") - F.col("n_common")
    )
    leaks = cross.filter(jac >= 0.8)
    return leaks.groupBy("held_split").agg(
        F.count_distinct("held_doc").alias("n_leaked_docs"),
        F.count(F.lit(1)).alias("n_leak_pairs"),
        F.min("held_doc").alias("first_leaked_doc"),
    )


K_ANON = 5  # minimum group size for a quasi-identifier combination


@query(
    "dq_k_anonymity_report",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, n_chars // 100 AS size_band, COUNT(*) AS n
      FROM documents
      GROUP BY 1, 2, 3
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_groups,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
             AS n_risky_docs,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(MAX(n) AS BIGINT) AS max_group_size
    FROM g
    GROUP BY lang
    """,
)
def dq_k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier combination (lang,
    source, 100-char size band): a document whose combination matches
    fewer than {K_ANON} corpus rows is re-identification-risky — the
    privacy screen a dataset release runs next to the PII redactor
    (text_pii_redact), reported per language. Two map-side-combined
    aggregates, result bounded by |quasi-identifier combos|; at 100 TB
    the k-threshold and banding are the tunables, the plan is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(
        "lang", "source", F.expr("n_chars div 100").alias("size_band")
    ).agg(F.count(F.lit(1)).alias("n"))
    risky = F.when(F.col("n") < K_ANON, 1).otherwise(0)
    return g.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(risky).alias("n_risky_groups"),
        F.sum(F.when(F.col("n") < K_ANON, F.col("n")).otherwise(0)).alias(
            "n_risky_docs"
        ),
        F.min("n").alias("min_group_size"),
        F.max("n").alias("max_group_size"),
    )


# --- DSIR-style hashed-ngram importance selection ---------------------------------

DSIR_BUCKETS = 256  # hashed feature space: first two md5 hex nibbles
DSIR_TARGET_LANG = "en"

_DSIR_ORACLE = f"""
    WITH words AS (
      SELECT doc_id, lang = '{DSIR_TARGET_LANG}' AS is_t,
             list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS ws
      FROM documents
    ),
    feats AS (
      SELECT doc_id, is_t, f
      FROM words,
           UNNEST(list_concat(
             ws,
             [ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))]
           )) AS t(f)
    ),
    bucketed AS (
      SELECT doc_id, is_t,
             (instr('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 16 +
             (instr('0123456789abcdef', substr(md5(f), 2, 1)) - 1) AS b
      FROM feats
    ),
    doc_bucket AS (
      SELECT doc_id, is_t, b, COUNT(*) AS c FROM bucketed GROUP BY 1, 2, 3
    ),
    bstats AS (
      SELECT b,
             COALESCE(SUM(CASE WHEN is_t THEN c END), 0) AS ct,
             COALESCE(SUM(CASE WHEN NOT is_t THEN c END), 0) AS cr
      FROM doc_bucket GROUP BY b
    ),
    tot AS (
      SELECT CAST(COALESCE(SUM(ct), 0) + {DSIR_BUCKETS} AS HUGEINT) AS s_t,
             CAST(COALESCE(SUM(cr), 0) + {DSIR_BUCKETS} AS HUGEINT) AS s_r
      FROM bstats
    ),
    dots AS (
      SELECT doc_id,
             SUM(c) AS n_feat,
             SUM(c * (ct + 1)) AS dot_t,
             SUM(c * (cr + 1)) AS dot_r
      FROM doc_bucket JOIN bstats USING (b)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_feat, 0) AS BIGINT) AS n_features,
           CAST(COALESCE(dot_t, 0) AS BIGINT) AS dot_target,
           CAST(COALESCE(dot_r, 0) AS BIGINT) AS dot_raw,
           CAST(CASE WHEN CAST(COALESCE(dot_t, 0) AS HUGEINT) * (SELECT s_r FROM tot)
                        > CAST(COALESCE(dot_r, 0) AS HUGEINT) * (SELECT s_t FROM tot)
                THEN 1 ELSE 0 END AS INTEGER) AS selected
    FROM documents d LEFT JOIN dots USING (doc_id)
"""


# tokenizer + feature expressions shared verbatim by the flat and the
# collapsed (representative) paths — one source of truth, no drift
_DSIR_WS_EXPR = "filter(split(lower(text), ' '), w -> length(w) > 0)"
_DSIR_FEATS_EXPR = (
    "concat(ws, CASE WHEN size(ws) >= 2 THEN "
    "transform(sequence(1, size(ws) - 1), "
    "          i -> concat(element_at(ws, i), ' ', "
    "                      element_at(ws, i + 1))) "
    "ELSE array() END)"
)

DSIR_REP_MIN_N = 8192  # the collapse family's gate convention: committed
# SFs (500 / 5,000 docs) keep the flat plan the hash oracle checks;
# replica-heavy probe corpora engage the weighted representative collapse


@query("pipeline_dsir_importance", oracle=_DSIR_ORACLE)
def pipeline_dsir_importance(
    spark: SparkSession, sf_dir: str, rep_min_n: int | None = None
) -> DataFrame:
    """DSIR-style data selection via hashed-ngram importance weights
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling" — the public recipe): unigram+bigram features hash into
    {DSIR_BUCKETS} buckets (md5 first byte — engine-reproducible, the
    dedup_simhash convention), the target distribution is the corpus'
    own '{DSIR_TARGET_LANG}' slice and raw is the rest, and each document
    gets an importance decision from its bag-of-buckets likelihood under
    +1-smoothed unigram bucket models. Everything stays in EXACT integer
    arithmetic: per-doc dot products dot_t = sum_b c_b*(ct_b+1) and
    dot_r = sum_b c_b*(cr_b+1) are BIGINTs, and the selection test
    dot_t * S_r > dot_r * S_t cross-multiplies the normalizing constants
    (S = total smoothed mass) in DECIMAL(38,0) / HUGEINT instead of
    dividing — no floats anywhere, so the full relation hash-matches the
    oracle. (The decimal bound holds to ~1e18 features per side — beyond
    100 TB of text.)

    Scale: one explode over tokenized text, ONE shuffle to (doc_id, bucket)
    granularity, a 256-row global bucket-stats aggregate broadcast back,
    and a per-doc re-aggregate — linear in corpus tokens, no UDFs, no
    driver-side state. The bucket-stat frame is O(DSIR_BUCKETS) regardless
    of corpus size, exactly the shape that survives a 1000-executor run.
    Above ``DSIR_REP_MIN_N`` the tokenize/hash stage runs once per DISTINCT
    text and every per-bucket sum carries the content's class-membership
    weight (the weighted representative collapse, the PCA precedent):
    ct[b] = sum_rep c_rep[b] * n_target(rep) is an exact regrouping of the
    flat per-doc sums, per-doc dots are content-determined and expand
    through the membership join verbatim. Below the gate every committed
    SF keeps the flat plan the DuckDB hash oracle checks directly.
    """
    docs = load_table(spark, sf_dir, "documents")
    gate = DSIR_REP_MIN_N if rep_min_n is None else rep_min_n
    # metadata-only gate (r15): parquet footer count, no Spark job — the
    # operator body stays lazy and plan-only tooling pays nothing.
    if table_row_count(sf_dir, "documents") < gate:
        return _dsir_flat(spark, docs)
    return _dsir_collapsed(spark, docs)


def _dsir_select(base: DataFrame, totals: DataFrame) -> DataFrame:
    """The shared final projection: coalesce absent dots to zero and apply
    the exact DECIMAL(38,0) cross-multiplied selection test. ``base`` has
    (doc_id, n_feat?, dot_t?, dot_r?)."""
    dec = "decimal(19,0)"
    return base.crossJoin(F.broadcast(totals)).select(
        "doc_id",
        F.coalesce(F.col("n_feat"), F.lit(0)).alias("n_features"),
        F.coalesce(F.col("dot_t"), F.lit(0)).alias("dot_target"),
        F.coalesce(F.col("dot_r"), F.lit(0)).alias("dot_raw"),
        F.when(
            F.coalesce(F.col("dot_t"), F.lit(0)).cast(dec)
            * F.col("s_r").cast(dec)
            > F.coalesce(F.col("dot_r"), F.lit(0)).cast(dec)
            * F.col("s_t").cast(dec),
            1,
        )
        .otherwise(0)
        .alias("selected"),
    )


def _dsir_flat(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The sub-gate per-doc form (the plan the committed-SF oracle checks)."""
    words = docs.select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_t"),
        F.expr(_DSIR_WS_EXPR).alias("ws"),
    )
    # unigrams + bigrams; sequence(1, n) is DESCENDING for n < 1, so the
    # bigram leg is gated on size >= 2 (empty array otherwise)
    feats = words.select(
        "doc_id",
        "is_t",
        F.explode(F.expr(_DSIR_FEATS_EXPR)).alias("f"),
    )
    from oe_batch_processing_spark.tables import persist_once

    # db is consumed twice (the 256-row bucket stats AND the per-doc dot
    # products); without a persist each consumer re-scans and re-tokenizes
    # the corpus — at 100 TB that is the whole job done twice. The frame
    # is tiny relative to the corpus (<= 256 rows per document).
    db = persist_once(
        feats.select(
            "doc_id",
            "is_t",
            F.conv(F.substring(F.md5("f"), 1, 2), 16, 10)
            .cast("int")
            .alias("b"),
        )
        .groupBy("doc_id", "is_t", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bstats = db.groupBy("b").agg(
        F.coalesce(
            F.sum(F.when(F.col("is_t"), F.col("c"))), F.lit(0)
        ).alias("ct"),
        F.coalesce(
            F.sum(F.when(~F.col("is_t"), F.col("c"))), F.lit(0)
        ).alias("cr"),
    )
    totals = bstats.agg(
        (F.coalesce(F.sum("ct"), F.lit(0)) + F.lit(DSIR_BUCKETS)).alias("s_t"),
        (F.coalesce(F.sum("cr"), F.lit(0)) + F.lit(DSIR_BUCKETS)).alias("s_r"),
    )
    dots = (
        db.join(F.broadcast(bstats), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feat"),
            F.sum(F.col("c") * (F.col("ct") + 1)).alias("dot_t"),
            F.sum(F.col("c") * (F.col("cr") + 1)).alias("dot_r"),
        )
    )
    return _dsir_select(docs.select("doc_id").join(dots, "doc_id", "left"), totals)


def _dsir_collapsed(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The above-gate weighted representative form: tokenize/hash DISTINCT
    texts once, weight per-bucket sums by class-membership counts, expand
    content-determined dots through the membership join. Exact regrouping
    of the flat integer sums — the emitted relation is bit-identical."""
    from oe_batch_processing_spark.operators.dedup import content_rep_groups
    from oe_batch_processing_spark.tables import persist_once

    groups = content_rep_groups(docs)
    membership = persist_once(
        groups.select("rep_id", F.explode("members").alias("doc_id"))
    )
    # per-content class masses; NULL lang stays outside BOTH (the flat
    # path's three-valued when() semantics — no otherwise branch)
    cls = (
        membership.join(
            docs.select(
                "doc_id", (F.col("lang") == DSIR_TARGET_LANG).alias("is_t")
            ),
            "doc_id",
        )
        .groupBy("rep_id")
        .agg(
            F.coalesce(F.sum(F.when(F.col("is_t"), 1)), F.lit(0)).alias("n_t"),
            F.coalesce(F.sum(F.when(~F.col("is_t"), 1)), F.lit(0)).alias("n_r"),
        )
    )
    reps = groups.select(F.col("rep_id"), "text")
    words = reps.select("rep_id", F.expr(_DSIR_WS_EXPR).alias("ws"))
    feats = words.select(
        "rep_id", F.explode(F.expr(_DSIR_FEATS_EXPR)).alias("f")
    )
    rep_db = persist_once(
        feats.select(
            "rep_id",
            F.conv(F.substring(F.md5("f"), 1, 2), 16, 10)
            .cast("int")
            .alias("b"),
        )
        .groupBy("rep_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bstats = (
        rep_db.join(cls, "rep_id")
        .groupBy("b")
        .agg(
            F.coalesce(F.sum(F.col("c") * F.col("n_t")), F.lit(0)).alias("ct"),
            F.coalesce(F.sum(F.col("c") * F.col("n_r")), F.lit(0)).alias("cr"),
        )
    )
    totals = bstats.agg(
        (F.coalesce(F.sum("ct"), F.lit(0)) + F.lit(DSIR_BUCKETS)).alias("s_t"),
        (F.coalesce(F.sum("cr"), F.lit(0)) + F.lit(DSIR_BUCKETS)).alias("s_r"),
    )
    rep_dots = (
        rep_db.join(F.broadcast(bstats), "b")
        .groupBy("rep_id")
        .agg(
            F.sum("c").alias("n_feat"),
            F.sum(F.col("c") * (F.col("ct") + 1)).alias("dot_t"),
            F.sum(F.col("c") * (F.col("cr") + 1)).alias("dot_r"),
        )
    )
    return _dsir_select(
        membership.join(rep_dots, "rep_id", "left").drop("rep_id"), totals
    )


CONTAM_W = 8  # screen window width (tokens) — same width as the
# docs_duplicate_ngram_spans machinery so the gram grammar is shared;
# public decontamination recipes use 8-13-gram exact overlap


@query(
    "pipeline_contamination_screen",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, ({_SPLIT_BYTE_DUCK}) % 10 AS b,
             string_split(lower(text), ' ') AS tk
      FROM documents
    ),
    grams AS (
      SELECT doc_id, b, i AS pos,
             array_to_string(tk[i:i+{CONTAM_W - 1}], ' ') AS gram,
             LEN(tk) AS n_tokens
      FROM toks,
           UNNEST(range(1, greatest(LEN(tk) - {CONTAM_W - 2}, 1))) AS u(i)
    ),
    bench_grams AS (
      SELECT DISTINCT gram FROM grams WHERE b = 9
    ),
    hits AS (
      SELECT g.doc_id, g.pos, g.n_tokens
      FROM grams g JOIN bench_grams USING (gram) WHERE g.b <> 9
    ),
    marked AS (
      SELECT doc_id, pos, n_tokens,
             CASE WHEN pos > COALESCE(MAX(pos + {CONTAM_W - 1}) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM hits
    ),
    islands AS (
      SELECT doc_id, pos, n_tokens,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS UNBOUNDED PRECEDING) AS island_id
      FROM marked
    ),
    per_island AS (
      SELECT doc_id, island_id, MIN(n_tokens) AS n_tokens,
             COUNT(*) AS n_windows,
             MAX(pos + {CONTAM_W - 1}) - MIN(pos) + 1 AS covered
      FROM islands GROUP BY doc_id, island_id
    )
    SELECT doc_id,
           CAST(MIN(n_tokens) AS INTEGER) AS n_tokens,
           CAST(SUM(n_windows) AS INTEGER) AS contaminated_windows,
           CAST(COUNT(*) AS INTEGER) AS n_spans,
           CAST(SUM(covered) AS INTEGER) AS covered_tokens,
           CAST(SUM(covered) AS DOUBLE) / CAST(MIN(n_tokens) AS DOUBLE)
             AS contamination_fraction
    FROM per_island GROUP BY doc_id
    """,
)
def pipeline_contamination_screen(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benchmark-contamination screen (the public decontamination recipe:
    GPT-3 appendix C / C4 analyses screen training documents for exact
    n-gram overlap with held-out evaluation sets). The held-out slice is
    the corpus's own 'test' split (the md5(doc_id) byte convention shared
    with ``docs_train_val_test_split`` and the leakage report — bucket 9);
    every {CONTAM_W}-token window of a non-test document that appears
    verbatim anywhere in the test slice marks its position, and marked
    positions merge into maximal covered spans per document (the
    interval-island pass shared with ``docs_duplicate_ngram_spans``).
    Output: one row per CONTAMINATED training/val document — window count,
    span count, exact covered-token count, contaminated fraction. The
    reference has no text analytics (lib/parsers.js stops at delimiter
    tokens); this is the release-gate twin of the near-dup leakage report,
    for EXACT substring contamination.

    Exactness: tokenization, window grammar, and the island pass reuse
    the docs_duplicate_ngram_spans grammar verbatim; the split byte is
    the leakage report's _SPLIT_BYTE. All counts are integers; the one
    double is a single IEEE division of exact integers — the full DuckDB
    relation hash-matches.

    Scale (why this op does NOT inherit the dup-spans shuffle): the
    benchmark gram dictionary is corpus-INDEPENDENT — a fixed, small
    n-gram set (here: the test split's distinct {CONTAM_W}-grams; at
    100 TB, the actual benchmark suite's grams, a few MB) — so the screen
    is one broadcast LEFT SEMI join against the corpus gram stream: the
    corpus grams are never shuffled at all. The only corpus-wide
    exchanges are content_rep_groups' groupBy(text) (shared, cached once
    per sweep) and the rep_id-partitioned island window (narrow,
    output-bounded: only hit positions reach it). Content-representative
    collapse is ALWAYS-ON (the dup-spans recipe, full-oracle-checked):
    contamination stats are content-determined given the dictionary, so
    the gram build + screen run once per DISTINCT text — benchmark
    membership of a content group is an ``exists()`` HOF over its members
    array (no join), and per-rep stats expand verbatim through the
    membership join to non-test members only. A training doc whose exact
    text also sits in the test split is fully contaminated by
    construction — the screen's raison d'être, and the collapse preserves
    it (its group is both bench-member and corpus-carrying).
    """
    docs = load_table(spark, sf_dir, "documents")
    from oe_batch_processing_spark.operators.dedup import content_rep_groups

    w = CONTAM_W
    groups = content_rep_groups(docs)
    d_byte = _SPLIT_BYTE.replace("doc_id", "d")
    is_bench = F.expr(f"exists(members, d -> ({d_byte}) % 10 = 9)")
    has_corpus = F.expr(f"exists(members, d -> ({d_byte}) % 10 <> 9)")
    gram_expr = (
        f"CASE WHEN size(tk) >= {w} THEN "
        f"transform(sequence(1, size(tk) - {w - 1}), "
        f"i -> struct(i AS pos, array_join(slice(tk, i, {w}), ' ') AS gram)) "
        "ELSE array() END"
    )
    # benchmark gram dictionary: distinct grams of contents with >= 1
    # test-split member; small and corpus-independent => broadcast
    bench_grams = (
        groups.filter(is_bench)
        .select(F.split(F.lower("text"), " ").alias("tk"))
        .select(F.explode(F.expr(gram_expr)).alias("g"))
        .select(F.col("g.gram").alias("gram"))
        .distinct()
    )
    # corpus side: one gram build per distinct content that has >= 1
    # non-test member; round-robin before the string-building explosion
    # so it runs core-wide (the shared groups cache has few partitions)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    reps = (
        groups.filter(has_corpus)
        .select("rep_id", F.split(F.lower("text"), " ").alias("tk"))
        .repartition(n_part)
    )
    grams = reps.select(
        "rep_id",
        F.size("tk").alias("n_tokens"),
        F.explode(F.expr(gram_expr)).alias("g"),
    ).select(
        "rep_id", "n_tokens",
        F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"),
    )
    hits = grams.join(F.broadcast(bench_grams), "gram", "leftsemi").select(
        "rep_id", "pos", "n_tokens"
    )
    prev_end = F.max(F.col("pos") + (w - 1)).over(
        Window.partitionBy("rep_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hits.withColumn(
        "new_island",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    )
    island_id = F.sum("new_island").over(
        Window.partitionBy("rep_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_island = (
        marked.withColumn("island_id", island_id)
        .groupBy("rep_id", "island_id")
        .agg(
            F.min("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_windows"),
            (F.max(F.col("pos") + (w - 1)) - F.min("pos") + 1).alias("covered"),
        )
    )
    per_rep = per_island.groupBy("rep_id").agg(
        F.min("n_tokens").cast("int").alias("n_tokens"),
        F.sum("n_windows").cast("int").alias("contaminated_windows"),
        F.count(F.lit(1)).cast("int").alias("n_spans"),
        F.sum("covered").cast("int").alias("covered_tokens"),
        (
            F.sum("covered").cast("double") / F.min("n_tokens").cast("double")
        ).alias("contamination_fraction"),
    )
    membership = groups.select(
        "rep_id", F.explode("members").alias("doc_id")
    ).filter(F.expr(f"({_SPLIT_BYTE}) % 10 <> 9"))
    return per_rep.join(membership, "rep_id").select(
        "doc_id", "n_tokens", "contaminated_windows", "n_spans",
        "covered_tokens", "contamination_fraction",
    )


QC_WSCALE = 1_000_000_000  # fixed-point weight scale: w[c][b] is a
# 1e-9-resolution class-conditional bucket frequency stored as BIGINT


_QC_ORACLE = f"""
    WITH words AS MATERIALIZED (
      SELECT doc_id, lang, ({_SPLIT_BYTE_DUCK}) % 10 AS bkt,
             list_filter(string_split(lower(text), ' '), w -> len(w) > 0) AS ws
      FROM documents
    ),
    feats AS MATERIALIZED (
      SELECT doc_id, lang, bkt,
             (instr('0123456789abcdef', substr(md5(f), 1, 1)) - 1) * 16 +
             (instr('0123456789abcdef', substr(md5(f), 2, 1)) - 1) AS b
      FROM words,
           UNNEST(list_concat(
             ws,
             [ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))]
           )) AS t(f)
    ),
    db AS MATERIALIZED (
      SELECT doc_id, b, COUNT(*) AS c FROM feats GROUP BY 1, 2
    ),
    classes AS MATERIALIZED (
      SELECT DISTINCT lang FROM words WHERE bkt < 8 AND lang IS NOT NULL
    ),
    ctb AS MATERIALIZED (
      SELECT lang, b, COUNT(*) AS ct
      FROM feats WHERE bkt < 8 AND lang IS NOT NULL
      GROUP BY 1, 2
    ),
    stot AS MATERIALIZED (
      SELECT c.lang,
             COALESCE((SELECT SUM(ct) FROM ctb WHERE ctb.lang = c.lang), 0)
               + {DSIR_BUCKETS} AS s
      FROM classes c
    ),
    wts AS MATERIALIZED (
      SELECT g.lang, g.b,
             CAST((CAST({QC_WSCALE} AS HUGEINT) * (COALESCE(ctb.ct, 0) + 1))
                  // CAST(s.s AS HUGEINT) AS BIGINT) AS w
      FROM (SELECT c.lang, r.range AS b
            FROM classes c CROSS JOIN range({DSIR_BUCKETS}) r) g
      LEFT JOIN ctb ON ctb.lang = g.lang AND ctb.b = g.b
      JOIN stot s ON s.lang = g.lang
    ),
    scores AS MATERIALIZED (
      SELECT db.doc_id, wts.lang,
             SUM(db.c * wts.w) AS score, SUM(db.c) AS n_feat
      FROM db JOIN wts ON wts.b = db.b
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT doc_id, lang, score, n_feat,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn,
             LEAD(score) OVER (PARTITION BY doc_id
                               ORDER BY score DESC, lang) AS nxt
      FROM scores
    ),
    top AS MATERIALIZED (
      SELECT doc_id, lang AS pred, score,
             score - COALESCE(nxt, 0) AS margin, n_feat
      FROM ranked WHERE rn = 1
    ),
    dflt AS (SELECT MIN(lang) AS d_lang FROM classes)
    SELECT d.doc_id,
           COALESCE(t.pred, dflt.d_lang) AS pred_lang,
           CAST(COALESCE(t.score, 0) AS BIGINT) AS score,
           CAST(COALESCE(t.margin, 0) AS BIGINT) AS margin,
           CAST(COALESCE(t.n_feat, 0) AS BIGINT) AS n_features,
           CAST(CASE WHEN d.lang = COALESCE(t.pred, dflt.d_lang)
                THEN 1 ELSE 0 END AS INTEGER) AS is_correct
    FROM documents d LEFT JOIN top t USING (doc_id), dflt
"""


QC_REP_MIN_N = 8192  # the collapse family's gate convention: committed
# SFs keep the flat plan the DuckDB hash oracle checks directly;
# replica-heavy probe corpora engage the weighted representative collapse


@query("pipeline_quality_classifier", oracle=_QC_ORACLE)
def pipeline_quality_classifier(
    spark: SparkSession, sf_dir: str, rep_min_n: int | None = None
) -> DataFrame:
    """Supervised linear document classifier — the CCNet / LLaMA-style
    fastText-shaped scoring pass (Wenzek et al. 2020 train a linear
    bag-of-ngram classifier and score every crawl document with it; the
    LLaMA corpus filter is the same architecture with a quality label).
    Architecture, faithfully: hashed unigram+bigram bag-of-features
    (the shared {DSIR_BUCKETS}-bucket md5 feature space — verbatim the
    DSIR machinery, ``_DSIR_FEATS_EXPR``), one weight vector per class,
    per-document class scores as dot products, argmax label with margin.
    The supervision signal is the corpus's own ``lang`` column on the
    train split (md5(doc_id) buckets 0-7, the shared split convention);
    a production quality pass swaps the label column, nothing else.

    Training is the closed-form linear fit that needs no iteration (the
    class-centroid / +1-smoothed Naive-Bayes-mean model): w[c][b] =
    floor({QC_WSCALE} * (ct[c][b] + 1) / S_c) where ct is the class's
    train-split feature count in bucket b and S_c its smoothed total
    mass — a Laplace-smoothed class-conditional bucket frequency in
    1e-9 fixed point. Every document (train, val, AND test — a scoring
    pass scores the whole corpus) gets score_c = sum_b c_b * w[c][b]
    in exact BIGINT arithmetic; prediction is argmax with (score DESC,
    lang ASC) tie-break, margin = top1 - top2. No logs, no floats
    anywhere: the weight floor division is DECIMAL(38,0) via the exact
    remainder identity on the Spark side (decimal `div` half-up-rounds
    its intermediate — the BM25 trap) and HUGEINT `//` in the oracle
    (DuckDB's DECIMAL `//` routes through DOUBLE — the other BM25
    trap), so the full relation hash-matches. Zero-feature documents
    score 0 for every class and take the deterministic default
    (alphabetically-first class), oracle-mirrored.

    Scale shape: one explode over corpus tokens (linear), ONE shuffle
    to (doc_id, bucket) granularity (<= {DSIR_BUCKETS} rows per doc),
    and a |classes| x {DSIR_BUCKETS} weight matrix that is broadcast
    BOTH ways — the class-stat aggregate collapses to a
    vocabulary-independent constant-size frame, and the scoring join
    fans each (doc, bucket) row out by |classes| against the broadcast
    (no shuffle). The argmax is a keyed window over |classes| rows per
    doc. Nothing here is quadratic in corpus size and no frame beyond
    the (doc, bucket) counts is corpus-sized — the exact shape that
    survives a 1000-executor 100 TB scoring run. Above ``QC_REP_MIN_N``
    (metadata-only footer gate, the family convention) the tokenize/hash
    stage additionally runs once per DISTINCT text: class-bucket counts
    become member-weighted content sums (exact integer regroupings, the
    DSIR-collapse argument), per-content scores are content-determined
    and expand verbatim through the membership join, and only
    ``is_correct`` is evaluated per document (it reads the doc's own
    label). Below the gate every committed SF keeps the flat plan the
    DuckDB hash oracle checks directly.
    """
    docs = load_table(spark, sf_dir, "documents")
    gate = QC_REP_MIN_N if rep_min_n is None else rep_min_n
    if table_row_count(sf_dir, "documents") >= gate:
        return _qc_collapsed(spark, docs)
    return _qc_flat(spark, docs)


def _qc_weights(
    spark: SparkSession, classes: DataFrame, ctb: DataFrame
) -> DataFrame:
    """The dense |classes| x {DSIR_BUCKETS} fixed-point weight matrix
    from per-(class, bucket) raw feature counts (shared by the flat and
    collapsed paths — one source of truth for the smoothing and the
    exact floor division)."""
    stot = classes.join(
        ctb.groupBy("lang").agg(F.sum("ct").alias("raw")), "lang", "left"
    ).select(
        "lang",
        (F.coalesce(F.col("raw"), F.lit(0)) + F.lit(DSIR_BUCKETS)).alias("s"),
    )
    grid = classes.crossJoin(
        spark.range(DSIR_BUCKETS).select(F.col("id").cast("int").alias("b"))
    )
    num = f"CAST({QC_WSCALE} AS DECIMAL(38,0)) * (coalesce(ct, 0) + 1)"
    return (
        grid.join(ctb, ["lang", "b"], "left")
        .join(stot, "lang")
        .select(
            "lang", "b",
            # exact floor division (the BM25 remainder identity)
            F.expr(
                f"CAST((({num}) - (({num}) % s)) / s AS BIGINT)"
            ).alias("w"),
        )
    )


def _qc_top(db: DataFrame, wts: DataFrame, key: str) -> DataFrame:
    """Per-``key`` argmax over broadcast-joined class scores: (key, pred,
    score, margin, n_feat). ``db`` holds (key, b, c) bucket counts."""
    scores = (
        db.join(F.broadcast(wts), "b")
        .groupBy(key, "lang")
        .agg(
            F.sum(F.col("c") * F.col("w")).alias("score"),
            F.sum("c").alias("n_feat"),
        )
    )
    wnd = Window.partitionBy(key).orderBy(F.desc("score"), F.asc("lang"))
    return (
        scores.withColumn("rn", F.row_number().over(wnd))
        .withColumn("nxt", F.lead("score").over(wnd))
        .filter(F.col("rn") == 1)
        .select(
            key,
            F.col("lang").alias("pred"),
            "score",
            (F.col("score") - F.coalesce(F.col("nxt"), F.lit(0))).alias(
                "margin"
            ),
            "n_feat",
        )
    )


def _qc_project(
    docs: DataFrame, top: DataFrame, classes: DataFrame
) -> DataFrame:
    """Shared final projection: left-join per-doc predictions onto the
    corpus, default zero-feature docs to the alphabetically-first class,
    and evaluate is_correct against each doc's own label."""
    dflt = classes.agg(F.min("lang").alias("d_lang"))
    pred_final = F.coalesce(F.col("pred"), F.col("d_lang"))
    return (
        docs.select("doc_id", "lang")
        .join(top, "doc_id", "left")
        .crossJoin(F.broadcast(dflt))
        .select(
            "doc_id",
            pred_final.alias("pred_lang"),
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
            F.coalesce(F.col("margin"), F.lit(0)).cast("long").alias("margin"),
            F.coalesce(F.col("n_feat"), F.lit(0))
            .cast("long")
            .alias("n_features"),
            F.when(F.col("lang") == pred_final, 1)
            .otherwise(0)
            .cast("int")
            .alias("is_correct"),
        )
    )


def _qc_flat(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The sub-gate per-doc form (the plan the committed-SF oracle checks)."""
    from oe_batch_processing_spark.tables import persist_once

    bucket = F.expr(_SPLIT_BYTE) % 10
    words = docs.select(
        "doc_id", "lang", bucket.alias("bkt"),
        F.expr(_DSIR_WS_EXPR).alias("ws"),
    )
    feats = words.select(
        "doc_id", "lang", "bkt",
        F.explode(F.expr(_DSIR_FEATS_EXPR)).alias("f"),
    )
    # (doc, class-split, bucket) counts — consumed twice (train-side
    # weights AND corpus-side scores); without the persist the corpus
    # tokenize+hash runs twice (the DSIR flat-path rationale).
    db0 = persist_once(
        feats.select(
            "doc_id", "lang", "bkt",
            F.conv(F.substring(F.md5("f"), 1, 2), 16, 10)
            .cast("int")
            .alias("b"),
        )
        .groupBy("doc_id", "lang", "bkt", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    is_train = (F.col("bkt") < 8) & F.col("lang").isNotNull()
    ctb = (
        db0.filter(is_train)
        .groupBy("lang", "b")
        .agg(F.sum("c").alias("ct"))
    )
    # class list at DOC granularity (a class whose train docs are all
    # empty-text still classifies, with the uniform smoothed weights)
    classes = (
        words.filter((F.col("bkt") < 8) & F.col("lang").isNotNull())
        .select("lang")
        .distinct()
    )
    wts = _qc_weights(spark, classes, ctb)
    top = _qc_top(db0.select("doc_id", "b", "c"), wts, "doc_id")
    return _qc_project(docs, top, classes)


def _qc_collapsed(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """The above-gate content-representative form: tokenize/hash each
    DISTINCT text once. Exactness, piece by piece: per-doc bucket counts
    are CONTENT-determined, so the class-bucket count ct[c][b] — a sum
    over train docs of class c — regroups exactly as
    sum_rep c_rep[b] * n_members(rep, class c, train split) (integer
    weights, the DSIR-collapse argument); class scores and the argmax
    read only bucket counts, so every member of a content receives the
    identical (pred, score, margin, n_feat) row, expanded verbatim
    through the membership join; is_correct compares the expansion
    against each DOC's own label (the one per-doc column)."""
    from oe_batch_processing_spark.operators.dedup import content_rep_groups
    from oe_batch_processing_spark.tables import persist_once

    groups = content_rep_groups(docs)
    membership = persist_once(
        groups.select("rep_id", F.explode("members").alias("doc_id"))
    )
    bucket = F.expr(_SPLIT_BYTE) % 10
    attrs = docs.select("doc_id", "lang", bucket.alias("bkt"))
    # per-(content, class) TRAIN member counts — the collapse weights
    cls = (
        membership.join(attrs, "doc_id")
        .filter((F.col("bkt") < 8) & F.col("lang").isNotNull())
        .groupBy("rep_id", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    words_r = groups.select("rep_id", F.expr(_DSIR_WS_EXPR).alias("ws"))
    feats_r = words_r.select(
        "rep_id", F.explode(F.expr(_DSIR_FEATS_EXPR)).alias("f")
    )
    rep_db = persist_once(
        feats_r.select(
            "rep_id",
            F.conv(F.substring(F.md5("f"), 1, 2), 16, 10)
            .cast("int")
            .alias("b"),
        )
        .groupBy("rep_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ctb = (
        rep_db.join(cls, "rep_id")
        .groupBy("lang", "b")
        .agg(F.sum(F.col("c") * F.col("n")).alias("ct"))
    )
    # doc-granularity class list (includes classes whose train docs are
    # all empty-text: cls rows need no features, only membership)
    classes = cls.select("lang").distinct()
    wts = _qc_weights(spark, classes, ctb)
    top_rep = _qc_top(rep_db, wts, "rep_id")
    top = membership.join(top_rep, "rep_id").drop("rep_id")
    return _qc_project(docs, top, classes)
