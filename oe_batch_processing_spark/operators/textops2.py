"""Text analysis, part 2: readability scoring and cross-document
repeated-n-gram span detection (the substring-dedup family).

The reference has no text analytics (its records are opaque lines —
lib/parsers.js tokenizes on a delimiter and stops); these are the
document-level shapes an LLM training-data pipeline adds. Both are pure
JVM column expressions — regexp counts and array HOFs — with no Python
in the hot path.

``docs_duplicate_ngram_spans`` is the DataFrame form of
suffix-array-style exact substring dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better"): instead of a global
suffix array (which doesn't distribute), every w-token window is hashed
and windows occurring in 2+ documents are merged back into maximal
covered spans per document via the interval-island window trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table

_SYL_RE = "[aeiouy]+"  # vowel-group syllable estimate
_NGRAM_W = 8  # window width (tokens) for repeated-span detection


@query(
    "text_readability_forcast",
    oracle=f"""
    WITH c AS (
      SELECT doc_id, lang,
             LEN(string_split(text, ' ')) AS n_words,
             LEN([w FOR w IN string_split(lower(text), ' ')
                  IF LEN(regexp_extract_all(w, '{_SYL_RE}')) = 1])
               AS n_mono,
             LEN(regexp_extract_all(lower(text), '{_SYL_RE}'))
               AS n_syllables
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(n_words AS INTEGER) AS n_words,
           CAST(n_mono AS INTEGER) AS n_mono,
           CAST(n_syllables AS INTEGER) AS n_syllables,
           CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)
             AS syll_per_word,
           20.0 - (CAST(n_mono AS DOUBLE) * (150.0 / CAST(n_words AS DOUBLE)))
                  / 10.0 AS forcast_grade
    FROM c WHERE n_words > 0
    """,
)
def text_readability_forcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORCAST readability grade per document. Chosen over Flesch
    because FORCAST is the standard formula for text WITHOUT sentence
    punctuation (forms, listings — and this corpus has none): grade =
    20 - (monosyllabic words per 150 words)/10, with syllables estimated
    as vowel groups. Emits the count profile plus syllables-per-word.

    Exactness: all counts are integers from identical regexp/split
    semantics in both engines; the two ratios are single IEEE divisions
    of exact integers, so doubles match bit-for-bit.

    Scale: embarrassingly parallel scan — one narrow projection, no
    shuffle, whole-stage codegen end to end. The word filter is an array
    HOF (`filter` + `regexp_extract_all`), not a UDF.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    n_mono = F.size(
        F.expr(
            "filter(split(lower(text), ' '), "
            f"w -> size(regexp_extract_all(w, '{_SYL_RE}', 0)) = 1)"
        )
    )
    n_syll = F.expr(f"size(regexp_extract_all(lower(text), '{_SYL_RE}', 0))")
    base = docs.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        n_mono.alias("n_mono"),
        n_syll.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wd = F.col("n_words").cast("double")
    return base.select(
        "doc_id",
        "lang",
        "n_words",
        "n_mono",
        "n_syllables",
        (F.col("n_syllables").cast("double") / wd).alias("syll_per_word"),
        (
            F.lit(20.0)
            - (F.col("n_mono").cast("double") * (F.lit(150.0) / wd))
            / F.lit(10.0)
        ).alias("forcast_grade"),
    )


@query(
    "docs_duplicate_ngram_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos, array_to_string(tk[i:i+{_NGRAM_W - 1}], ' ') AS gram,
             LEN(tk) AS n_tokens
      FROM toks, UNNEST(range(1, greatest(LEN(tk) - {_NGRAM_W - 2}, 1))) AS u(i)
    ),
    dupg AS (
      SELECT gram FROM grams GROUP BY gram
      HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT g.doc_id, g.pos, g.n_tokens FROM grams g JOIN dupg USING (gram)
    ),
    marked AS (
      SELECT doc_id, pos, n_tokens,
             CASE WHEN pos > COALESCE(MAX(pos + {_NGRAM_W - 1}) OVER (
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
             MAX(pos + {_NGRAM_W - 1}) - MIN(pos) + 1 AS covered
      FROM islands GROUP BY doc_id, island_id
    )
    SELECT doc_id,
           CAST(MIN(n_tokens) AS INTEGER) AS n_tokens,
           CAST(SUM(n_windows) AS INTEGER) AS dup_windows,
           CAST(COUNT(*) AS INTEGER) AS n_spans,
           CAST(SUM(covered) AS INTEGER) AS covered_tokens,
           CAST(SUM(covered) AS DOUBLE) / CAST(MIN(n_tokens) AS DOUBLE)
             AS dup_fraction
    FROM per_island GROUP BY doc_id
    """,
)
def docs_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring detection: every {w}-token
    window is hashed; windows appearing in >= 2 distinct documents mark
    their positions, and per document the marked [pos, pos+w-1]
    intervals merge into maximal islands (the interval-coalescing window
    shape) — yielding, per contaminated document, the duplicated-window
    count, span count, exact covered-token count, and duplicated
    fraction. This is the distributed stand-in for suffix-array exact
    substring dedup: a suffix array needs global order (hostile at
    100 TB); hashed fixed-width windows need one shuffle and lose only
    sub-window-length matches.

    Content-representative collapse (round-14, the jaccard/containment
    recipe — always-on, so the full DuckDB hash oracle checks the whole
    rewrite at committed SFs): identical texts yield identical gram
    sequences AND identical per-doc span statistics, so the gram build,
    the duplicated-gram window, and the interval-island pass all run
    once per DISTINCT content and the per-rep stats expand verbatim
    through the membership join. The duplicated-gram criterion counts
    distinct DOCUMENTS, which at rep level is the group-size-weighted
    count: a gram row of rep r is duplicated iff
    ``sum(group_size over reps containing the gram) >= 2``, which is
    exactly ``(nd_reps >= 2) OR (group_size(r) >= 2)`` — if r's own
    group holds >= 2 docs the sum clears 2 by itself; if r is a
    singleton the sum clears 2 iff a second rep shares the gram; and
    the predicate never fires on a singleton-only gram (sum = 1). The
    30x probe corpus is replica-heavy by design (every doc has 30
    byte-identical copies), where the flat shape paid the full gram
    shuffle + island pass per replica (18.95x at 30x, slope x3.47 per
    3x input — the r13 verdict's item-1 watch item).

    Scale: tokens explode to ~L windows per DISTINCT content (bounded by
    distinct corpus token count); the gram groupBy is the single heavy
    shuffle and its key is a hash — salting-free because gram
    frequencies are Zipfian but the dense_rank window runs after a
    map-side-combinable exchange. The island pass repartitions by
    rep_id (second narrow shuffle); the final membership join is
    output-sized. At 100 TB, replace the raw gram string with
    xxhash64(gram) to shrink shuffle bytes ~10x (kept as the readable
    string here so the oracle can share the key).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = _NGRAM_W
    from oe_batch_processing_spark.operators.dedup import content_rep_groups

    groups = content_rep_groups(docs)
    # round-robin before the (string-building) gram explosion so it runs
    # core-wide — the groupBy above leaves few, possibly skewed partitions
    # at test scale; same rationale as shingle_arrays
    reps = groups.select(
        "rep_id", F.size("members").alias("gsz"), "text"
    ).repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    toks = reps.select(
        "rep_id", "gsz", F.split(F.lower("text"), " ").alias("tk")
    )
    grams = toks.select(
        "rep_id",
        "gsz",
        F.size("tk").alias("n_tokens"),
        F.expr(
            f"CASE WHEN size(tk) >= {w} THEN "
            f"transform(sequence(1, size(tk) - {w - 1}), "
            f"i -> struct(i AS pos, array_join(slice(tk, i, {w}), ' ') AS gram)) "
            "ELSE array() END"
        ).alias("gs"),
    ).select(
        "rep_id", "gsz", "n_tokens", F.explode("gs").alias("g")
    ).select(
        "rep_id", "gsz", "n_tokens",
        F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"),
    )

    # Distinct-rep count per gram WITHOUT a second gram build: the old
    # aggregate-then-join-back shape recomputed the (expensive) gram
    # explosion on both sides of the join and shuffled the gram stream
    # twice; one (gram, rep_id)-sorted window pass gets the same count via
    # max(dense_rank) — single shuffle, single gram build, and none of the
    # collect_set memory risk on a hot boilerplate gram (r6 rework,
    # measured 2x at sf0.1: hits stage 8.7 s -> 2.5 s warm).
    wg = Window.partitionBy("gram").orderBy("rep_id")
    wga = Window.partitionBy("gram")
    hits = (
        grams.withColumn("nd", F.max(F.dense_rank().over(wg)).over(wga))
        .filter((F.col("nd") >= 2) | (F.col("gsz") >= 2))
        .select("rep_id", "pos", "n_tokens")
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
        F.sum("n_windows").cast("int").alias("dup_windows"),
        F.count(F.lit(1)).cast("int").alias("n_spans"),
        F.sum("covered").cast("int").alias("covered_tokens"),
        (
            F.sum("covered").cast("double") / F.min("n_tokens").cast("double")
        ).alias("dup_fraction"),
    )
    membership = groups.select(
        "rep_id", F.explode("members").alias("doc_id")
    )
    return per_rep.join(membership, "rep_id").select(
        "doc_id", "n_tokens", "dup_windows", "n_spans",
        "covered_tokens", "dup_fraction",
    )


_RAKE_STOPS = "the|a|and|of|to|in|is|it"
_RAKE_PAT = r"\b(?:" + _RAKE_STOPS + r")\b"
_RAKE_TOP = 3


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH phr AS (
      SELECT doc_id, p AS phrase
      FROM (
        SELECT doc_id,
               [trim(x) FOR x IN
                string_split_regex(lower(text), '{_RAKE_PAT}')
                IF trim(x) <> ''] AS ps
        FROM documents
      ), UNNEST(ps) AS u(p)
    ),
    pa AS (
      SELECT doc_id, phrase, COUNT(*) AS n_occ,
             LEN(string_split(phrase, ' ')) AS phrase_len
      FROM phr GROUP BY doc_id, phrase
    ),
    wtab AS (
      SELECT doc_id, phrase, phrase_len, n_occ, w AS word
      FROM pa, UNNEST(string_split(phrase, ' ')) AS u(w)
    ),
    ws AS (
      SELECT doc_id, word,
             SUM(n_occ) AS freq,
             SUM(n_occ * phrase_len) AS deg
      FROM wtab GROUP BY doc_id, word
    ),
    ps AS (
      SELECT t.doc_id, t.phrase,
             CAST(SUM(CAST(CAST(s.deg AS DOUBLE) / CAST(s.freq AS DOUBLE)
                           AS DECIMAL(18,6))) AS DOUBLE) AS rake_score,
             COUNT(*) AS n_words
      FROM wtab t JOIN ws s ON t.doc_id = s.doc_id AND t.word = s.word
      GROUP BY t.doc_id, t.phrase
    )
    SELECT doc_id, phrase, rake_score,
           CAST(n_words AS INTEGER) AS n_words, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY rake_score DESC, phrase) AS rnk
      FROM ps
    ) WHERE rnk <= {_RAKE_TOP}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    the maximal stopword-free token runs; each word scores
    degree/frequency (degree = summed length of phrases containing it),
    a phrase scores the sum of its word scores, and the top {_RAKE_TOP}
    phrases per document are kept.

    Exactness: word scores are a single IEEE division of exact integer
    degree/frequency; the per-phrase sum goes through DECIMAL(18,6)
    rounding (the registry dsum convention) so the cross-engine addition
    order cannot drift ULPs.

    Scale: two hash shuffles — (doc_id, word) for scores and
    (doc_id, phrase) for the phrase roll-up — plus the per-doc top-k
    window; all keys carry doc_id so a corpus partitioned by doc hash
    never concentrates. The stopword split is one codegen regexp.
    """
    docs = load_table(spark, sf_dir, "documents")
    phrases = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(split(lower(text), "
                f"'{_RAKE_PAT.replace(chr(92), chr(92) * 2)}'), "
                "p -> trim(p)), p -> p <> '')"
            )
        ).alias("phrase"),
    )
    pa = phrases.groupBy("doc_id", "phrase").agg(
        F.count(F.lit(1)).alias("n_occ")
    ).withColumn("phrase_len", F.size(F.split("phrase", " ")))
    wtab = pa.select(
        "doc_id",
        "phrase",
        "phrase_len",
        "n_occ",
        F.explode(F.split("phrase", " ")).alias("word"),
    )
    ws = wtab.groupBy("doc_id", "word").agg(
        F.sum("n_occ").alias("freq"),
        F.sum(F.col("n_occ") * F.col("phrase_len")).alias("deg"),
    )
    score_dec = (
        F.col("deg").cast("double") / F.col("freq").cast("double")
    ).cast("decimal(18,6)")
    ps = (
        wtab.join(ws.withColumn("wscore", score_dec), ["doc_id", "word"])
        .groupBy("doc_id", "phrase")
        .agg(
            F.sum("wscore").cast("double").alias("rake_score"),
            F.count(F.lit(1)).cast("int").alias("n_words"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("rake_score").desc(), "phrase")
    return (
        ps.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _RAKE_TOP)
        .select("doc_id", "phrase", "rake_score", "n_words", "rnk")
    )


# Shared by the Spark query and the DuckDB oracle VERBATIM: the seed
# manufactures noisy URL spellings (scheme/case/www/port/trailing-slash/
# utm/fragment variants, URL-free corpus) and the canonicalizer is pure
# standard SQL (CASE + regexp_extract/replace with single-match patterns,
# identical semantics in both engines).
_URL_CANON_SQL = """
WITH seeded AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
    || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0 THEN 'Example.ORG' ELSE 'example.org' END)
    || (CASE WHEN doc_id % 7 = 0 THEN ':443' ELSE '' END)
    || '/page/' || CAST(doc_id % 40 AS VARCHAR(16))
    || (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 4 = 0
             THEN '?utm_source=feed&q=' || CAST(doc_id % 5 AS VARCHAR(16))
             WHEN doc_id % 4 = 1
             THEN '?q=' || CAST(doc_id % 5 AS VARCHAR(16))
             ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0 THEN '#section' ELSE '' END) AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
    regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1) AS hostport,
    regexp_extract(url, '^[a-zA-Z]+://[^/?#]+(/[^?#]*)', 1) AS path,
    regexp_extract(url, '[?]([^#]*)', 1) AS query
  FROM seeded
),
cleaned AS (
  SELECT doc_id, url, hostport, path,
    regexp_replace(regexp_replace(query, 'utm_[^&]*&?', ''), '&$', '') AS q2
  FROM parts
),
canon AS (
  SELECT doc_id, url,
    'https://'
    || regexp_replace(regexp_replace(lower(hostport), '^www[.]', ''),
                      ':(443|80)$', '')
    || regexp_replace(path, '/$', '')
    || (CASE WHEN q2 <> '' THEN '?' || q2 ELSE '' END) AS canonical
  FROM cleaned
)
SELECT canonical, COUNT(*) AS n_docs, COUNT(DISTINCT url) AS n_raw_forms,
       MIN(doc_id) AS min_doc
FROM canon GROUP BY canonical
"""


@query("docs_url_canonical_dedup", oracle=_URL_CANON_SQL)
def docs_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the CommonCrawl-style provenance
    step: URLs that differ only in scheme, host case, ``www.``, default
    port, trailing slash, ``utm_*`` tracking params, or fragment
    collapse to one canonical form, which then keys the per-page dedup
    group (here: group size, distinct raw spellings, representative).
    Meaningful query params (``q=``) survive; tracking params die.

    The seed + canonicalizer is ONE standard-SQL text executed verbatim
    by Spark and by the DuckDB oracle — the strongest parity form:
    whatever the regexp chain does, both engines do it to the letter.

    Scale: scan + one hash shuffle on the canonical string (pre-hash it
    with xxhash64 at 100 TB to shrink shuffle keys). All regexp work is
    per-row codegen.
    """
    from oe_batch_processing_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_URL_CANON_SQL)


_MATTR_W = 25  # moving window (tokens); docs shorter than this get one window


@query(
    "text_lexical_mattr",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    b AS (
      SELECT doc_id, l, len(l) AS n, len(list_distinct(l)) AS d
      FROM t WHERE len(l) > 0
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(CASE WHEN n >= {_MATTR_W} THEN n - {_MATTR_W - 1}
                ELSE 1 END AS BIGINT) AS n_windows,
           CAST(d AS BIGINT) AS distinct_full,
           CAST((1000000 * d) // n AS BIGINT) AS ttr_full_micro,
           CAST(CASE WHEN n >= {_MATTR_W} THEN
             (1000000 * LIST_SUM([
                len(list_distinct(l[i:i+{_MATTR_W - 1}]))
                FOR i IN range(1, n - {_MATTR_W - 2})]))
               // ({_MATTR_W} * (n - {_MATTR_W - 1}))
           ELSE (1000000 * d) // n END AS BIGINT) AS mattr_micro
    FROM b
    """,
)
def text_lexical_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity per document via MATTR (moving-average
    type-token ratio, Covington & McFall 2010): the mean of
    distinct/window over every sliding 25-token window. Plain
    TTR shrinks with document length (longer texts repeat function
    words), which makes it useless as a cross-length quality filter;
    MATTR is the standard length-robust replacement an LLM data
    pipeline uses to flag template/boilerplate docs (low diversity) and
    token-salad spam (implausibly high). Documents shorter than the
    window fall back to whole-doc TTR (one window).

    Exactness: distinct counts are integers; both ratios are emitted
    micro-quantized by non-negative integer division, identical in both
    engines. The sliding distinct is an array HOF chain
    (sequence -> transform -> slice -> array_distinct -> aggregate) —
    whole-stage codegen, no UDF, no explode/shuffle; the oracle is the
    same computation as a DuckDB list comprehension.

    Scale: embarrassingly parallel narrow scan; per-doc work is
    O(tokens x window) = O(2.5k) small-object-free JVM ops here. For
    book-length documents the same statistic decomposes into per-chunk
    windows (chunk with window-sized overlap, union the window
    sums) — noted rather than built because the corpus is short-doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        tokens.alias("l"),
        F.size(tokens).alias("n"),
        F.size(F.array_distinct(tokens)).alias("d"),
    ).filter(F.col("n") > 0)
    w = _MATTR_W
    mattr = F.when(
        F.col("n") >= w,
        F.expr(
            f"(1000000 * aggregate(transform(sequence(1, n - {w - 1}), "
            f"i -> size(array_distinct(slice(l, i, {w})))), 0L, "
            f"(a, x) -> a + x)) div ({w} * (n - {w - 1}))"
        ),
    ).otherwise(
        F.expr("(1000000 * d) div n")
    )
    return base.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.when(F.col("n") >= w, F.col("n") - (w - 1))
        .otherwise(F.lit(1))
        .cast("bigint")
        .alias("n_windows"),
        F.col("d").cast("bigint").alias("distinct_full"),
        F.expr("(1000000 * d) div n").cast("bigint").alias("ttr_full_micro"),
        mattr.cast("bigint").alias("mattr_micro"),
    )


# --- winnowing fingerprints (round 16) ---------------------------------------

WINNOW_K = 3   # gram width (words) — the BM25/contamination gram grammar
WINNOW_W = 4   # winnowing window: one fingerprint selected per W
#                consecutive gram hashes (rightmost-minimum rule)
_WINNOW_MOD = 1_000_000_007  # checksum modulus: sum of h%p stays in BIGINT


# the winnowing selection as a reusable oracle CTE chain (ends at
# fps(doc_id, pos, h)) — shared verbatim by the per-doc summary relation
# and the pair join so the two oracles cannot drift
_WINNOW_FPS_CTES = f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split(lower(text), ' ') AS tk
      FROM documents
      WHERE len(string_split(lower(text), ' ')) >= {WINNOW_K + WINNOW_W - 1}
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, len(tk) - {WINNOW_K - 1} AS g, i - 1 AS pos,
             ('0x' || substr(md5(
               tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]), 1, 15))::BIGINT
               AS h
      FROM toks, UNNEST(range(1, len(tk) - {WINNOW_K - 2})) AS u(i)
    ),
    expanded AS MATERIALIZED (
      SELECT doc_id, g, pos, h, i
      FROM grams,
           UNNEST(range(greatest(pos - {WINNOW_W - 1}, 0),
                        least(pos, g - {WINNOW_W}) + 1)) AS w(i)
    ),
    sel1 AS MATERIALIZED (
      SELECT doc_id, i, MIN(h) AS minh FROM expanded GROUP BY 1, 2
    ),
    sel AS MATERIALIZED (
      SELECT e.doc_id, e.i, s.minh AS h, MAX(e.pos) AS pos
      FROM expanded e JOIN sel1 s ON s.doc_id = e.doc_id AND s.i = e.i
      WHERE e.h = s.minh
      GROUP BY 1, 2, 3
    ),
    fps AS MATERIALIZED (
      SELECT DISTINCT doc_id, pos, h FROM sel
    )"""


@query(
    "text_winnowing_fingerprints",
    oracle=_WINNOW_FPS_CTES + f""",
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
             CAST(SUM(h % {_WINNOW_MOD}) AS BIGINT) AS fp_mod_sum,
             CAST(MIN(h) AS BIGINT) AS min_fp
      FROM fps GROUP BY 1
    )
    SELECT t.doc_id,
           CAST(g.g AS BIGINT) AS n_grams,
           CAST(g.g - {WINNOW_W - 1} AS BIGINT) AS n_windows,
           p.n_fingerprints,
           CAST((1000000 * p.n_fingerprints) // (g.g - {WINNOW_W - 1})
                AS BIGINT) AS density_ppm,
           p.fp_mod_sum, p.min_fp
    FROM toks t
    JOIN (SELECT DISTINCT doc_id, g FROM grams) g USING (doc_id)
    JOIN per_doc p USING (doc_id)
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints — the public local-fingerprinting
    algorithm (Schleimer, Wilkerson, Aiken 2003, the MOSS selector; also
    the fingerprint stage of production near-dup/plagiarism pipelines):
    hash every {k}-word gram, slide a window of {w} consecutive hashes,
    and in each window select the MINIMUM hash, breaking ties toward the
    RIGHTMOST position; consecutive windows reselecting the same
    (position, hash) collapse to one fingerprint. The guarantee that
    makes it the standard: every match of length >= k+w-1 tokens between
    two documents shares at least one SELECTED fingerprint (any shared
    window selects the same minimum), while the selected set is only
    ~2/(w+1) of all grams — the index a 100 TB near-dup pass builds is
    ~{pct}% of the full shingle index with no recall loss at the
    guarantee length. This operator emits the per-document selection
    relation (counts, density, exact checksum over the selected set);
    the pair join over selected fingerprints is the dedup family's
    standard inverted-index shape on a strictly smaller index.

    Exactness: the gram hash is the md5-prefix 60-bit integer (engine-
    identical), the rightmost-minimum rule is an argmin over the pair
    (h, -pos) — Spark computes it as ONE min(struct(h, -pos)) aggregate,
    the oracle as the equivalent two-stage min + filtered-max regrouping
    — and the checksum sums h mod {mod} (BIGINT-bounded). All integers;
    the full relation hash-matches.

    Scale: one posexplode over corpus grams, a x{w} constant-factor
    window expansion (each gram feeds <= {w} window starts), and two
    keyed aggregations — linear in corpus tokens, no cross-document
    joins, no windows over unbounded partitions (the per-(doc, window)
    argmin is a groupBy, not a sliding Window function, so it needs no
    per-doc ordering pass).
    """
    w = WINNOW_W
    docs = load_table(spark, sf_dir, "documents")
    grams, fps = winnow_fp_sets(docs)
    per_doc = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.sum(F.col("h") % _WINNOW_MOD).cast("long").alias("fp_mod_sum"),
        F.min("h").cast("long").alias("min_fp"),
    )
    sizes = grams.select("doc_id", "g").distinct()
    return (
        sizes.join(per_doc, "doc_id")
        .select(
            "doc_id",
            F.col("g").cast("long").alias("n_grams"),
            (F.col("g") - (w - 1)).cast("long").alias("n_windows"),
            "n_fingerprints",
            F.expr(f"CAST((1000000 * n_fingerprints) div (g - {w - 1}) "
                   "AS BIGINT)").alias("density_ppm"),
            "fp_mod_sum",
            "min_fp",
        )
    )


text_winnowing_fingerprints.__doc__ = text_winnowing_fingerprints.__doc__.format(
    k=WINNOW_K, w=WINNOW_W, mod=_WINNOW_MOD,
    pct=round(200 / (WINNOW_W + 1)),
)


def winnow_fp_sets(docs: DataFrame):
    """The winnowing selection over a (doc_id, text, ...) frame — the
    Spark half of _WINNOW_FPS_CTES, shared verbatim by the per-doc
    summary relation and the pair join. Returns (grams, fps): grams =
    (doc_id, g, pos, h) hashed gram stream (g = per-doc gram count),
    fps = (doc_id, pos, h) distinct rightmost-minimum selections."""
    k, w = WINNOW_K, WINNOW_W
    toks = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("tk")
    ).filter(F.size("tk") >= k + w - 1)
    gram_expr = (
        f"transform(sequence(1, size(tk) - {k - 1}), "
        f"i -> array_join(slice(tk, i, {k}), ' '))"
    )
    grams = toks.select(
        "doc_id",
        (F.size("tk") - (k - 1)).alias("g"),
        F.posexplode(F.expr(gram_expr)).alias("pos", "gram"),
    ).select(
        "doc_id",
        "g",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    expanded = grams.select(
        "doc_id",
        "g",
        "pos",
        "h",
        F.explode(
            F.expr(
                f"sequence(greatest(pos - {w - 1}, 0), "
                f"least(pos, g - {w}))"
            )
        ).alias("i"),
    )
    sel = expanded.groupBy("doc_id", "i").agg(
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).alias("m")
    )
    fps = sel.select(
        "doc_id", (-F.col("m.np")).alias("pos"), F.col("m.h").alias("h")
    ).distinct()
    return grams, fps


WINNOW_PAIR_T = 0.5  # MOSS-style report threshold on the overlap score


@query(
    "dedup_winnowing_pairs",
    oracle=_WINNOW_FPS_CTES + f""",
    hs AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM fps),
    cnt AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM hs GROUP BY 1),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM hs a JOIN hs b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE) / least(na.n, nb.n) AS fp_overlap
    FROM common
    JOIN cnt na ON na.doc_id = doc_a
    JOIN cnt nb ON nb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / least(na.n, nb.n) >= {WINNOW_PAIR_T}
    """,
)
def dedup_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MOSS match join over winnowing fingerprints: document pairs
    whose SELECTED fingerprint-hash sets overlap at
    |H_a intersect H_b| / min(|H_a|, |H_b|) >= {t} — the similarity
    report MOSS computes, and the near-dup candidate join a production
    pipeline runs on the winnowed index instead of the full shingle
    index (same inverted-index shape as ``dedup_jaccard_shingles``, on
    an index ~2/(w+1) the size with the guarantee that any
    {k}+{w}-1-token match still shares a fingerprint). Identical texts
    share every fingerprint (overlap exactly 1.0). The one double is a
    single IEEE division of exact integers — hash-exact vs DuckDB.

    Scale: the content-representative collapse + membership expansion
    (the jaccard recipe verbatim — identical texts select identical
    fingerprints, and the score is content-determined): the quadratic
    posting join runs over DISTINCT contents' SELECTED fingerprints —
    two multiplicative reductions over the flat shingle self-join — with
    the partition count pinned against AQE's input-size coalescing (the
    fan-out-blind-heuristic lesson) and the winnowed index PERSISTED so
    its selection subtree evaluates once for the join sides and the
    per-doc counts alike. Within-group pairs expand at
    overlap 1.0, admitted at the k+w-1-token selection floor.
    """
    from oe_batch_processing_spark.operators.dedup import (
        content_rep_groups,
        expand_rep_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    groups = content_rep_groups(docs)
    rep_docs = groups.select(F.col("rep_id").alias("doc_id"), "text")
    _grams, fps = winnow_fp_sets(rep_docs)
    hs = fps.select("doc_id", "h").distinct()
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # PERSIST the selected-fingerprint relation (r16): it feeds FOUR plan
    # branches — both sides of the posting self-join and the na/nb count
    # joins — and without the cache each branch re-ran the whole
    # winnowing selection (double Generate + argmin SortAggregate over
    # the w-expanded gram stream); runtime ReusedExchange bridges at most
    # the two identically-projected join sides, not the count branches.
    # Interleaved A/B at sf0.1: median 5.04 -> 3.50 s. The cached frame
    # is the winnowed index: ~2/(w+1) of the rep-level gram stream.
    keyed = hs.repartition(n_part, "h").persist()
    counts = keyed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = keyed.alias("a")
    b = keyed.hint("shuffle_hash").alias("b")
    common = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = counts.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    nb = counts.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    score = F.col("n_common").cast("double") / F.least("na", "nb")
    rep_pairs = (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            F.col("doc_a").alias("rep_a"),
            F.col("doc_b").alias("rep_b"),
            score.alias("fp_overlap"),
        )
        .filter(F.col("fp_overlap") >= WINNOW_PAIR_T)
    )
    return expand_rep_pairs(
        groups, rep_pairs, "fp_overlap", F.lit(1.0),
        min_tokens=WINNOW_K + WINNOW_W - 1,
    )


dedup_winnowing_pairs.__doc__ = dedup_winnowing_pairs.__doc__.format(
    t=WINNOW_PAIR_T, k=WINNOW_K, w=WINNOW_W
)
