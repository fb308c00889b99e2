"""Round-3 LLM training-data operators: rule-based quality gating (Gopher-
style), benchmark-contamination detection, paragraph-level dedup, URL
extraction, inverted-index build, domain-mixture weighting, and hash-shard
sequence packing.

All quality/mixture/shard math is integer arithmetic or ratios of identical
integers (md5 bytes for hash decisions), so every query here is bit-exact
against the DuckDB oracle. Scale notes per docstring; none of these uses a
Python UDF — everything is JVM codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
_STOP_RE = r"\b(" + "|".join(_STOPWORDS) + r")\b"


def _md5_byte(salt: str, *, duck: bool) -> str:
    """First md5 byte (0..255) of ``salt || doc_id`` — the same hex-decode
    idiom as the train/val/test split, with a per-operator salt so different
    hash decisions are independent."""
    cast = "VARCHAR" if duck else "STRING"
    h = f"md5('{salt}' || CAST(doc_id AS {cast}))" if duck else (
        f"md5(concat('{salt}', CAST(doc_id AS {cast})))"
    )
    return (
        f"(instr('0123456789abcdef', substr({h}, 1, 1)) - 1) * 16"
        f" + instr('0123456789abcdef', substr({h}, 2, 1)) - 1"
    )


# --- Gopher-style rule gate --------------------------------------------------

MIN_WORDS, MAX_WORDS = 10, 1000
MIN_MWL, MAX_MWL = 2.0, 12.0
MIN_ALPHA_FRAC = 0.8


@query(
    "text_gopher_quality",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             LEN(string_split(text, ' ')) AS n_words,
             LENGTH(REPLACE(text, ' ', '')) AS n_nonspace,
             LEN([w FOR w IN string_split(text, ' ')
                  IF regexp_full_match(w, '[A-Za-z]+')]) AS n_alpha,
             LEN(regexp_extract_all(lower(text), '{_STOP_RE}')) AS n_stop
      FROM documents
    )
    SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
           CAST(n_nonspace AS DOUBLE) / n_words AS mean_word_len,
           CAST(n_alpha AS DOUBLE) / n_words AS frac_alpha_words,
           CAST(n_stop AS INTEGER) AS n_stopword_hits,
           CASE
             WHEN n_words < {MIN_WORDS} THEN 'too_few_words'
             WHEN n_words > {MAX_WORDS} THEN 'too_many_words'
             WHEN CAST(n_nonspace AS DOUBLE) / n_words < {MIN_MWL}
               OR CAST(n_nonspace AS DOUBLE) / n_words > {MAX_MWL}
               THEN 'word_length'
             WHEN CAST(n_alpha AS DOUBLE) / n_words < {MIN_ALPHA_FRAC}
               THEN 'low_alpha'
             WHEN n_stop < 1 THEN 'no_stopwords'
             ELSE 'keep'
           END AS decision
    FROM m
    """,
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (word-count bounds, mean-word-
    length bounds, alphabetic-word fraction, stopword presence; first failing
    rule wins — the published heuristic family from the Gopher/MassiveText
    data work, adapted to the synthetic corpus ranges).

    Scale: pure codegen projection over one scan — the cheapest filter in
    the pipeline, run before anything that shuffles. Every reported double
    is a ratio of identical integers, so the gate is engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_alpha = F.size(F.expr("filter(split(text, ' '), w -> w RLIKE '^[A-Za-z]+$')"))
    n_stop = F.regexp_count(F.lower("text"), F.lit(_STOP_RE))
    mwl = n_nonspace.cast("double") / n_words
    frac_alpha = n_alpha.cast("double") / n_words
    return docs.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        mwl.alias("mean_word_len"),
        frac_alpha.alias("frac_alpha_words"),
        n_stop.cast("int").alias("n_stopword_hits"),
        F.when(n_words < MIN_WORDS, "too_few_words")
        .when(n_words > MAX_WORDS, "too_many_words")
        .when((mwl < MIN_MWL) | (mwl > MAX_MWL), "word_length")
        .when(frac_alpha < MIN_ALPHA_FRAC, "low_alpha")
        .when(n_stop < 1, "no_stopwords")
        .otherwise("keep")
        .alias("decision"),
    )


# --- benchmark contamination ------------------------------------------------

NGRAM = 3  # real decontam uses 8-13-grams; the synthetic corpus's tiny
# vocabulary makes 3-grams the equivalent collision rate
BENCH_MOD = 97  # "benchmark/eval" docs: doc_id % 97 == 0


@query(
    "text_contamination_ngrams",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE LEN(string_split(text, ' ')) >= {NGRAM}
    ),
    ng AS (
      SELECT DISTINCT doc_id,
             array_to_string(words[i+1:i+{NGRAM}], ' ') AS ngram
      FROM w, UNNEST(range(LEN(words) - {NGRAM - 1})) AS t(i)
    ),
    bench AS (SELECT DISTINCT ngram FROM ng WHERE doc_id % {BENCH_MOD} = 0),
    train AS (SELECT * FROM ng WHERE doc_id % {BENCH_MOD} <> 0),
    tot AS (SELECT doc_id, COUNT(*) AS n_ngrams FROM train GROUP BY doc_id),
    sh AS (
      SELECT doc_id, COUNT(*) AS n_shared
      FROM train JOIN bench USING (ngram) GROUP BY doc_id
    )
    SELECT doc_id, n_ngrams, n_shared,
           CAST(n_shared AS DOUBLE) / n_ngrams AS shared_frac
    FROM sh JOIN tot USING (doc_id)
    """,
)
def text_contamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination detection: flag training docs sharing any
    word n-gram with the (deterministic) eval subset — the n-gram-overlap
    decontam pass every training corpus runs against its eval benchmarks.

    Scale shape: the eval set's distinct n-gram table is tiny relative to
    the corpus and is BROADCAST, so the corpus side never shuffles its
    n-gram stream for the join; the only exchange is the per-doc count agg.
    At 100 TB the corpus n-grams stay distinct-per-doc (one explode, one
    local distinct) and the broadcast join prunes non-matches at scan speed.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = docs.withColumn("words", F.split(F.col("text"), " ")).filter(
        F.size("words") >= NGRAM
    )
    ng = w.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, size(words) - {NGRAM}), "
                f"i -> concat_ws(' ', slice(words, i + 1, {NGRAM})))"
            )
        ).alias("ngram"),
    ).distinct()
    bench = (
        ng.filter(F.col("doc_id") % BENCH_MOD == 0).select("ngram").distinct()
    )
    train = ng.filter(F.col("doc_id") % BENCH_MOD != 0)
    tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_ngrams"))
    sh = (
        train.join(F.broadcast(bench), "ngram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return sh.join(tot, "doc_id").select(
        "doc_id",
        "n_ngrams",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("n_ngrams")).alias("shared_frac"),
    )


# --- paragraph-level dedup ---------------------------------------------------

CHUNK_WORDS = 12


@query(
    "docs_paragraph_dedup",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             md5(array_to_string(
               words[i*{CHUNK_WORDS}+1 : (i+1)*{CHUNK_WORDS}], ' ')) AS fp
      FROM w, UNNEST(range(CAST(ceil(LEN(words) / {CHUNK_WORDS}.0) AS BIGINT)))
             AS t(i)
    ),
    ranked AS (
      SELECT doc_id, chunk_idx,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx)
               AS rn
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
    FROM ranked
    GROUP BY doc_id
    """,
)
def docs_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level (sub-document) dedup: split each doc into 12-word
    chunks, fingerprint each chunk (md5), keep only the globally-first
    occurrence of each fingerprint ((doc_id, chunk_idx) order) — the
    passage-dedup pass that removes boilerplate repeated ACROSS documents,
    which whole-doc fingerprinting cannot see.

    Scale: one explode (bounded: n_words/12 rows per doc), one window over
    the fingerprint key (hash-partitioned, no skew — md5 keys are uniform),
    one per-doc agg. This is exactly the shape of suffix-chunk dedup over a
    100 TB corpus; the window state per key is the tiny duplicate set.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = docs.withColumn("words", F.split(F.col("text"), " "))
    chunks = w.select(
        "doc_id",
        F.explode(
            F.expr(
                f"sequence(0, CAST(ceil(size(words) / {CHUNK_WORDS}.0) AS INT) - 1)"
            )
        ).alias("chunk_idx"),
        F.col("words"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5(
            F.expr(
                f"concat_ws(' ', slice(words, chunk_idx * {CHUNK_WORDS} + 1, "
                f"{CHUNK_WORDS}))"
            )
        ).alias("fp"),
    )
    win = Window.partitionBy("fp").orderBy("doc_id", "chunk_idx")
    ranked = chunks.withColumn("rn", F.row_number().over(win))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_dropped"),
    )


# --- URL extraction ----------------------------------------------------------

_HOST_RE = r"https?://([a-z0-9.-]+)"


@query(
    "docs_url_extract",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || ' see https://example.org/doc' || CAST(doc_id AS VARCHAR)
                  || CASE WHEN doc_id % 2 = 0
                          THEN ' and http://site' || CAST(doc_id % 13 AS VARCHAR)
                               || '.net/page'
                          ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(t, '{_HOST_RE}', 1)) AS INTEGER)
             AS n_urls,
           array_to_string(regexp_extract_all(t, '{_HOST_RE}', 1), ',')
             AS hosts,
           regexp_extract_all(t, '{_HOST_RE}', 1)[1] AS first_host
    FROM seeded
    """,
)
def docs_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/host extraction: pull every URL host from each document — the
    provenance/domain-filter primitive (domain blocklists, per-domain
    mixture stats). The synthetic corpus is URL-free, so a deterministic
    URL suffix (from doc_id, identical in both engines) is appended first;
    the operator under test is the group-capture regexp_extract_all chain.

    Scale: scan-speed codegen regex; no shuffle. Output is flattened
    (joined host list + first host) so downstream comparators never see
    arrays.
    """
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://example.org/doc"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" and http://site"),
                    (F.col("doc_id") % 13).cast("string"),
                    F.lit(".net/page"),
                ),
            ).otherwise(""),
        ).alias("t"),
    )
    hosts = F.expr(f"regexp_extract_all(t, '{_HOST_RE}', 1)")
    return seeded.select(
        "doc_id",
        F.size(hosts).cast("int").alias("n_urls"),
        F.array_join(hosts, ",").alias("hosts"),
        F.try_element_at(hosts, F.lit(1)).alias("first_host"),
    )


# --- inverted index ----------------------------------------------------------

TOKEN_RE = "[A-Za-z0-9]+"
MIN_DOC_FREQ = 10
POSTINGS_CAP = 20


@query(
    "docs_inverse_index",
    oracle=f"""
    WITH occ AS (
      SELECT doc_id, lower(UNNEST(regexp_extract_all(text, '{TOKEN_RE}')))
               AS token
      FROM documents
    ),
    counts AS (SELECT token, COUNT(*) AS n_occurrences FROM occ GROUP BY token),
    dd AS (SELECT DISTINCT token, doc_id FROM occ),
    idx AS (
      SELECT token, COUNT(*) AS doc_freq,
             array_to_string(
               list_slice(list(doc_id ORDER BY doc_id), 1, {POSTINGS_CAP}), ',')
               AS postings
      FROM dd GROUP BY token
    )
    SELECT token, doc_freq, n_occurrences, postings
    FROM idx JOIN counts USING (token)
    WHERE doc_freq >= {MIN_DOC_FREQ}
    """,
)
def docs_inverse_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: token -> (document frequency, total occurrences,
    capped sorted posting list) — the retrieval-side index a contamination
    or search pipeline materializes from the corpus.

    Scale: one explode + two aggs sharing the token hash partitioning.
    Posting lists are capped (first {POSTINGS_CAP} doc ids) exactly as a real
    index shards its postings; the cap also bounds per-token state so hot
    stopword tokens cannot blow a partition. Output flattened to a joined
    string (driver comparators never see arrays).
    """
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RE}', 0)")
        ).alias("token"),
    )
    counts = occ.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    dd = occ.select("token", "doc_id").distinct()
    idx = dd.groupBy("token").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.array_join(
            F.expr(
                f"transform(slice(array_sort(collect_list(doc_id)), 1, "
                f"{POSTINGS_CAP}), x -> CAST(x AS STRING))"
            ),
            ",",
        ).alias("postings"),
    )
    return (
        idx.join(counts, "token")
        .filter(F.col("doc_freq") >= MIN_DOC_FREQ)
        .select("token", "doc_freq", "n_occurrences", "postings")
    )


# --- domain-mixture weighting ------------------------------------------------

# per-source sampling weight class: src_idx % 4 -> keep threshold out of 256
_MIX_THRESHOLDS = (256, 128, 64, 192)  # weights 1.0, 0.5, 0.25, 0.75


def _mix_thr_case(idx_expr: str) -> str:
    return (
        f"CASE ({idx_expr}) % 4 "
        + " ".join(
            f"WHEN {i} THEN {t}" for i, t in enumerate(_MIX_THRESHOLDS)
        )
        + " END"
    )


@query(
    "pipeline_mix_weighted",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(substr(source, 4) AS INTEGER) AS src_idx,
             {_md5_byte('mix:', duck=True)} AS b
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN b < {_mix_thr_case('src_idx')} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST({_mix_thr_case('MIN(src_idx)')} AS DOUBLE) / 256 AS target_weight,
           CAST(SUM(CASE WHEN b < {_mix_thr_case('src_idx')} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS realized_frac
    FROM d
    GROUP BY source
    """,
)
def pipeline_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture weighting: each source gets a target sampling weight
    (DoReMi/The-Pile-style mixture table); documents are kept by comparing a
    deterministic md5 byte against the weight threshold, so the subsample is
    stable under re-ingestion and partitioning — the same property the
    train/val/test split relies on. Reports per-source target vs realized
    fractions.

    Scale: one scan + one agg on the (tiny) source key; the keep decision is
    pure codegen hash math, so at 100 TB the sampled corpus is produced by a
    filter at scan speed with no shuffle at all.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.expr("CAST(substr(source, 4) AS INT)").alias("src_idx"),
        F.expr(_md5_byte("mix:", duck=False)).alias("b"),
    )
    kept = F.when(
        F.col("b") < F.expr(_mix_thr_case("src_idx")), 1
    ).otherwise(0)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).alias("n_kept"),
        (F.expr(_mix_thr_case("MIN(src_idx)")).cast("double") / 256).alias(
            "target_weight"
        ),
        (F.sum(kept).cast("double") / F.count(F.lit(1))).alias("realized_frac"),
    )


# --- hash-shard sequence packing ---------------------------------------------

N_SHARDS = 16
SHARD_BUDGET = 4096


@query(
    "pipeline_shard_pack",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             ({_md5_byte('shard:', duck=True)}) % {N_SHARDS} AS shard_id,
             LEN(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens
      FROM documents
    )
    SELECT doc_id, CAST(shard_id AS INTEGER) AS shard_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard_id ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                      / {SHARD_BUDGET}.0) AS BIGINT) AS pack_id
    FROM d
    """,
)
def pipeline_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level output sharding + sequence packing: documents hash to one of
    {N_SHARDS} shards (md5 — re-ingestion-stable), then each shard packs its
    docs into fixed-token-budget training sequences by running-sum in doc_id
    order.

    Why two-level at 100 TB: a single global running sum is one window over
    one partition — a non-starter. Hash-sharding first makes every window
    partition-local and embarrassingly parallel while keeping pack
    assignment fully deterministic; shard count scales with the cluster, and
    pack ids are stable because the shard hash and the in-shard order are
    both content-derived.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        (F.expr(_md5_byte("shard:", duck=False)) % N_SHARDS)
        .cast("int")
        .alias("shard_id"),
        F.regexp_count("text", F.lit("[A-Za-z0-9]+")).cast("int").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return d.select(
        "doc_id",
        "shard_id",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / float(SHARD_BUDGET))
        .cast("long")
        .alias("pack_id"),
    )
