"""Text-analysis operators for LLM training-data pipelines (north-star scope):
token counting, quality scoring, language-ID heuristic, document
fingerprinting, corpus token histogram.

All of these are pure JVM expressions (whole-stage codegen, no Python) —
at 100 TB they run at scan speed with no shuffle except the histogram's
groupBy. Every double here is a ratio of identical integers, so results are
engine-exact without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

TOKEN_RE = "[A-Za-z0-9]+"


@query(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '{TOKEN_RE}')) AS INTEGER) AS n_tokens,
           CAST(LENGTH(text) AS INTEGER) AS n_chars_actual,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS INTEGER) AS n_nonspace,
           CAST(LENGTH(text) AS DOUBLE)
             / LEN(regexp_extract_all(text, '{TOKEN_RE}')) AS chars_per_token
    FROM documents
    WHERE LEN(regexp_extract_all(text, '{TOKEN_RE}')) > 0
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: regex word tokens (BPE-ish alnum runs), char counts,
    chars-per-token ratio."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.regexp_count("text", F.lit(TOKEN_RE))
    return docs.filter(n_tokens > 0).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_nonspace"),
        (F.length("text").cast("double") / n_tokens).alias("chars_per_token"),
    )


# quality heuristics: stopword ratio, mean word length, whitespace ratio
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


@query(
    "text_quality_scores",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             LEN(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
             LEN(regexp_extract_all(lower(text),
                 '\\b({"|".join(_STOPWORDS)})\\b')) AS n_stop,
             LENGTH(text) AS n_chars_actual,
             LENGTH(REPLACE(text, ' ', '')) AS n_nonspace
      FROM documents
    )
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(n_stop AS INTEGER) AS n_stopwords,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_nonspace AS DOUBLE) / n_tokens AS mean_token_len,
           CAST(n_chars_actual - n_nonspace AS DOUBLE) / n_chars_actual AS space_ratio
    FROM toks
    WHERE n_tokens > 0
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal battery: stopword ratio, mean token length, whitespace
    ratio — the standard cheap filters before expensive pipeline stages."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.regexp_count("text", F.lit(TOKEN_RE))
    n_stop = F.regexp_count(F.lower("text"), F.lit(r"\b(" + "|".join(_STOPWORDS) + r")\b"))
    n_chars = F.length("text")
    n_nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    return docs.filter(n_tokens > 0).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (n_nonspace.cast("double") / n_tokens).alias("mean_token_len"),
        ((n_chars - n_nonspace).cast("double") / n_chars).alias("space_ratio"),
    )


# language-ID heuristic: marker-word votes per language, argmax with a
# deterministic tie-break on language code order
_LANG_MARKERS = {
    "en": ("the", "and", "value"),
    "de": ("der", "und", "nicht"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "est"),
    "zh": ("shi", "de_", "bu"),
}


def _marker_score_sql(lang: str) -> str:
    words = "|".join(_LANG_MARKERS[lang])
    return f"LEN(regexp_extract_all(lower(text), '\\b({words})\\b'))"


@query(
    "text_language_id",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang,
             {_marker_score_sql('en')} AS s_en,
             {_marker_score_sql('de')} AS s_de,
             {_marker_score_sql('es')} AS s_es,
             {_marker_score_sql('fr')} AS s_fr,
             {_marker_score_sql('zh')} AS s_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE GREATEST(s_en, s_de, s_es, s_fr, s_zh)
             WHEN 0 THEN 'unknown'
             WHEN s_en THEN 'en'
             WHEN s_de THEN 'de'
             WHEN s_es THEN 'es'
             WHEN s_fr THEN 'fr'
             ELSE 'zh' END AS predicted_lang,
           CAST(GREATEST(s_en, s_de, s_es, s_fr, s_zh) AS INTEGER) AS marker_hits
    FROM scores
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/marker-word language-ID heuristic with deterministic argmax
    (first language in en/de/es/fr/zh order wins ties; 0 hits => unknown)."""
    docs = load_table(spark, sf_dir, "documents")
    scores = {
        lang: F.regexp_count(
            F.lower("text"), F.lit(r"\b(" + "|".join(words) + r")\b")
        )
        for lang, words in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, "unknown")
    for lang in ("en", "de", "es", "fr", "zh"):  # tie-break order
        pred = pred.when(scores[lang] == best, lang)
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("predicted_lang"),
        best.cast("int").alias("marker_hits"),
    )


@query(
    "text_fingerprint_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    SELECT fingerprint,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM fp
    GROUP BY fingerprint
    """,
)
def text_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowercase text,
    grouped — the normalized-exact-dedup primitive. md5 is identical across
    engines, so this is fully oracle-checkable (unlike xxhash-based ops)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace("text", r"\s+", " ")))
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@query(
    "text_top_tokens",
    oracle=f"""
    SELECT token, n, rnk FROM (
      SELECT token, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS INTEGER) AS rnk
      FROM (
        SELECT token, COUNT(*) AS n
        FROM (
          SELECT UNNEST(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS token
          FROM documents
        )
        GROUP BY token
      )
    ) WHERE rnk <= 20
    """,
)
def text_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token histogram, top 20 — explode → count → global top-k."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")).alias("token")
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "token")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("token", "n", "rnk")
    )


# --- corpus cleaning / PII / n-grams / length profile (round 2) ------------

@query(
    "text_clean_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(text),
                '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS clean_text,
           CAST(LENGTH(trim(regexp_replace(regexp_replace(lower(text),
                '<[^>]*>', ' ', 'g'), ' +', ' ', 'g'))) AS INTEGER) AS n_chars_clean
    FROM documents
    """,
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning pass: strip markup-like tags, lowercase, collapse
    whitespace, trim — the standard normalize step before dedup/quality
    gating. Pure JVM regexp chain (Spark's regexp_replace is global by
    default; the oracle passes DuckDB's 'g' flag), runs at scan speed with
    zero shuffles at any SF."""
    docs = load_table(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "<[^>]*>", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).cast("int").alias("n_chars_clean"),
    )


_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "text_pii_redact",
    oracle=rf"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.org or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(t, '{_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(LEN(regexp_extract_all(t, '{_PHONE_RE}')) AS INTEGER) AS n_phones,
           regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM seeded
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: count and mask email / phone patterns. The corpus is
    synthetic and PII-free, so a deterministic PII suffix (derived from
    doc_id, identical in both engines) is appended first — the operator
    under test is the count+redact regexp chain, which runs scan-speed JVM
    with no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.org or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return seeded.select(
        "doc_id",
        F.regexp_count("t", F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("t", F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ).alias("redacted"),
    )


@query(
    "text_ngram_bigrams",
    oracle="""
    SELECT bigram, n, rnk FROM (
      SELECT bigram, n,
             CAST(ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS INTEGER) AS rnk
      FROM (
        SELECT words[i+1] || ' ' || words[i+2] AS bigram, COUNT(*) AS n
        FROM (
          SELECT string_split(text, ' ') AS words FROM documents
          WHERE len(string_split(text, ' ')) >= 2
        ), UNNEST(range(len(words) - 1)) AS t(i)
        GROUP BY 1
      )
    ) WHERE rnk <= 50
    """,
)
def text_ngram_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency, top 50 (occurrence counts, NOT per-doc
    distinct — complements the shingle dedup family). Bigrams are built as a
    per-row JVM array transform (no elementwise shuffle); the only exchanges
    are the count groupBy and the 50-row top-k."""
    docs = load_table(spark, sf_dir, "documents")
    bigrams = (
        docs.withColumn("words", F.split(F.col("text"), " "))
        .filter(F.size("words") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(words) - 2), "
                    "i -> concat_ws(' ', words[i], words[i+1]))"
                )
            ).alias("bigram")
        )
    )
    counts = bigrams.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.col("n").desc(), "bigram")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 50)
        .select("bigram", "n", "rnk")
    )


@query(
    "docs_length_histogram",
    oracle=f"""
    SELECT bucket_lo, COUNT(*) AS n_docs,
           MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
    FROM (
      SELECT CAST(LEN(regexp_extract_all(text, '{TOKEN_RE}')) // 10 AS INTEGER) * 10
               AS bucket_lo,
             CAST(LEN(regexp_extract_all(text, '{TOKEN_RE}')) AS INTEGER) AS n_tokens
      FROM documents
    )
    GROUP BY bucket_lo
    """,
)
def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length profile of the corpus: 10-token buckets with doc counts
    — the length-filter calibration step of a data pipeline. Single partial-
    agg shuffle on a handful of bucket keys."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.regexp_count("text", F.lit(TOKEN_RE)).cast("int")
    return (
        docs.select(
            (F.floor(n_tokens / 10).cast("int") * 10).alias("bucket_lo"),
            n_tokens.alias("n_tokens"),
        )
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


RH_BASE = 257
RH_MOD = 2_147_483_647  # 2^31 - 1 (Mersenne): acc*257 + cp stays < 2^40


@query(
    "text_rolling_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 [CAST(ascii(c) AS BIGINT) FOR c IN string_split(text, '')]),
               (acc, x) -> (acc * {RH_BASE} + x) % {RH_MOD}) AS rolling_fp
      FROM documents
    )
    SELECT doc_id, rolling_fp,
           COUNT(*) OVER (PARTITION BY rolling_fp) AS dup_count
    FROM fp
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (Rabin-Karp polynomial over unicode
    codepoints, base 257 mod 2^31-1) + per-fingerprint duplicate count — the
    O(1)-state streaming fingerprint a chunked/rolling dedup builds on
    (vs the md5 batch fingerprint in ``text_fingerprint_dedup``).

    Exactness: the fold is pure integer arithmetic in a fixed left-to-right
    order in both engines (Spark ``aggregate`` / DuckDB ``list_reduce``), so
    fingerprints are bit-identical. Scale: one pass per doc, zero shuffles
    before the window count on the (tiny) fingerprint key.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        F.expr(
            f"aggregate(split(text, ''), 0L, "
            f"(acc, c) -> (acc * {RH_BASE} + ascii(c)) % {RH_MOD})"
        ).alias("rolling_fp"),
    )
    w = Window.partitionBy("rolling_fp")
    return fp.select(
        "doc_id", "rolling_fp", F.count(F.lit(1)).over(w).alias("dup_count")
    )


MG_CAPACITY = 512  # Misra-Gries counters per partition
TOP_K_FREQ = 25


@query(
    "text_frequent_tokens_sketch",
    oracle=f"""
    SELECT token, n FROM (
      SELECT token, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rnk
      FROM (
        SELECT lower(UNNEST(regexp_extract_all(text, '{TOKEN_RE}'))) AS token
        FROM documents
      )
      GROUP BY token
    ) WHERE rnk <= {TOP_K_FREQ}
    """,
)
def text_frequent_tokens_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus top-k (k=25) tokens via the 2-pass sketch-then-verify
    pattern: a Misra-Gries heavy-hitters sketch per partition (bounded
    memory, one pass) proposes candidates; an exact recount restricted to
    the candidate set ranks them.

    Why this shape at 100 TB: a naive groupBy(token) shuffles every token
    occurrence. Here pass 1 is shuffle-free (``mapInPandas`` emits at most
    MG_CAPACITY candidate rows per partition), and pass 2's shuffle carries
    only occurrences of candidate tokens (a broadcast semi-join prunes the
    rest at the scan). The MG union guarantee (any token with global count
    > N/MG_CAPACITY survives in some partition's sketch) makes the final
    top-k EXACT when k ≪ capacity — which the DuckDB oracle verifies
    against a full exact count every round.
    """
    from collections.abc import Iterator

    docs = load_table(spark, sf_dir, "documents")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    tokens = docs.repartition(n_part).select(
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("token")
    )

    def mg_sketch(batches: Iterator) -> Iterator:
        import pandas as pd

        # Weighted (batch) Misra-Gries: fold each Arrow batch's exact
        # value_counts into the counter set, then, when over capacity,
        # subtract the smallest amount d that frees enough slots and drop
        # the zeroed counters. Each subtract-d event cancels ≥ d×(capacity+1)
        # token occurrences, so the classic MG bound — every token with true
        # count > N/(capacity+1) survives — is preserved, while the per-token
        # work runs in pandas C loops instead of a Python per-occurrence
        # loop (~20× on wide partitions).
        counters: "pd.Series | None" = None
        for pdf in batches:
            vc = pdf["token"].value_counts()
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > MG_CAPACITY:
                d = counters.nsmallest(len(counters) - MG_CAPACITY).iloc[-1]
                counters = (counters - d)[lambda s: s > 0]
        toks = [] if counters is None else list(counters.index)
        yield pd.DataFrame({"token": toks})

    candidates = tokens.mapInPandas(mg_sketch, schema="token string").distinct()
    exact = (
        tokens.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), "token")
    return (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K_FREQ)
        .select("token", "n")
    )
