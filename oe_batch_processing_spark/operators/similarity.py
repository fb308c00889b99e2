"""Embedding similarity search (north-star scope).

  - ``similarity_topk_cosine`` — brute-force cosine top-k, the exact
    oracle-checkable baseline. Dot products and norms via exact decimal
    summation so both engines agree bit-for-bit.
  - ``similarity_topk_lsh`` — random-hyperplane LSH bucketed variant: the
    100 TB scale path (candidates only from matching buckets, exact rescore
    inside buckets, multi-probe via multiple tables). Rows-only check.
  - ``similarity_pairs_above`` — all-pairs cosine >= threshold via the same
    exact math (self-join form used by embedding near-dedup).

Scale notes: brute force is O(Q×N×d) — fine for reranking a candidate set,
wrong as the primary search at 100 TB. The LSH variant's only shuffles are
groupBy(bucket) and the final per-query top-k; bucket skew is bounded by the
hyperplane count (2^k buckets) and AQE skew-split. An IVF variant would swap
the bucketer for k-means cells trained on a sample — same plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import (
    load_table,
    persist_once,
    table_row_count,
)

TOP_K = 5
QUERY_MOD = 100  # query set = vec_id % 100 == 0 (deterministic, sf-stable)

QUERY_ID_CAP: int | None = None  # fixed-QPS probe hook (round-12): when
# set (ONLY by tools/scaleprobe.py's fixed-QPS ANN mode, restored in its
# finally), the ANN query set is additionally bounded to vec_id < CAP so
# the probe measures per-query cost at a CONSTANT query count across
# scale factors — the scale-probe corpora key-shift replicas by +1e9 per
# replica, so CAP=2000 selects exactly the base corpus's 20 queries at
# every factor. None (always, outside probes) is a provable no-op: the
# predicate is unchanged, so committed plans/hashes/bench rows are
# untouched.


def ann_query_pred(col):
    """The shared ANN-family query-set predicate: ``vec_id % QUERY_MOD ==
    0``, optionally intersected with the fixed-QPS ``vec_id < CAP`` bound
    (see QUERY_ID_CAP above)."""
    pred = col % QUERY_MOD == 0
    if QUERY_ID_CAP is not None:
        pred = pred & (col < QUERY_ID_CAP)
    return pred


ANN_REP_MIN_N = 8192  # corpus content-collapse threshold for the exact ANN
# rewrites (round-13, the IVF_HIER_MIN_N / SEMDEDUP_HIER_MIN_N gating
# recipe): 4x the largest committed corpus, so every committed SF keeps its
# flat plan BIT-IDENTICALLY (hashes, bench rows, recall numbers untouched);
# the 10x/30x probe corpora (20k/60k vectors, replica-heavy by design)
# cross it and run the collapsed corpus side. Tests force both paths by
# patching this module attribute (restored in finally).


def ann_rep_expand_topk(
    rep_cand: DataFrame,
    groups: DataFrame,
    k: int,
    score_col: str,
    ascending: bool,
) -> DataFrame:
    """Expand rep-level ANN candidates back to vector-level rows covering
    the global per-query top-k EXACTLY — the membership-expansion half of
    the content-representative collapse (round-13; the dedup-family recipe
    applied to ANN corpora, where replica-heavy inputs make every
    bucket/scan candidate list grow with replica count while scores depend
    only on vector CONTENT).

    Correctness of the prune (a superset argument, not a heuristic): the
    final output orders rows by (score, neighbor_id). A rep's BEST
    expanded row is (score, min eligible member); best rows of distinct
    reps are distinct rows, and if j reps rank ahead of rep r in best-row
    order then at least j rows beat r's best row — so any rep contributing
    a global top-k row ranks <= k among reps. Keeping dense_rank <= k over
    (score, best_id) therefore keeps a SUPERSET of the contributing reps;
    rows of dropped reps are all strictly outside the top-k, and ranks of
    surviving rows only count better rows, which all belong to kept reps —
    the caller's final ranking window reproduces the flat output
    bit-identically.

    ``rep_cand``: (query_id, rep_id, <score_col>) — exact duplicate rows
    are fine (multi-table LSH). ``groups``: (rep_id, members). The
    query's own vec_id is excluded POST-expansion (its content class may
    hold other corpus vectors, which the flat path keeps), so callers on
    the collapsed path must NOT pre-filter neighbor != query at rep level.

    Two-stage prune (round-13 refinement): the groups join carries
    replica-count-sized members arrays, so joining the FULL candidate set
    would multiply candidate bytes by the replica factor before any
    pruning. Stage 1 ranks candidates by (score, rep_id) — no join — and
    keeps dense_rank <= k+1: rep_id == best_id for every class except
    possibly the query's own (rep_id = min member <= best eligible
    member, with equality unless the query IS the min member), so at
    most ONE rep per query sits earlier under (score, rep_id) than under
    (score, best_id), displacing the others by at most one rank — every
    rep with best-rank <= k has rep_id-rank <= k+1. Stage 2 joins groups
    on the <= (k+1)-reps-per-query survivors and applies the exact
    (score, best_id) dense_rank <= k; ranks are unchanged by the
    restriction because any rep better than a surviving top-k rep also
    survives stage 1.
    """
    direction = F.col(score_col).asc() if ascending else F.col(score_col).desc()
    w_pre = Window.partitionBy("query_id").orderBy(
        direction, F.col("rep_id").asc()
    )
    # distinct BEFORE the groups join (round-14, advisor): multi-table LSH
    # emits duplicate (query_id, rep_id, score) rows that survive stage 1
    # and would each carry a replica-count-sized members array through the
    # join — the exact cost the two-stage prune exists to avoid. Deduping
    # the <= (k+1)-reps-per-query survivors here makes the post-window
    # distinct a cheap no-op (kept for the score-tie row shape).
    pre = (
        rep_cand.withColumn("rk0", F.dense_rank().over(w_pre))
        .filter(F.col("rk0") <= k + 1)
        .drop("rk0")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        direction, F.col("best_id").asc()
    )
    kept = (
        pre.join(groups.select("rep_id", "members"), "rep_id")
        .withColumn(
            "best_id",
            F.expr("array_min(filter(members, m -> m != query_id))"),
        )
        .filter(F.col("best_id").isNotNull())
        .withColumn("rk", F.dense_rank().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rep_id", score_col, "members")
        .distinct()
    )
    return kept.select(
        "query_id", score_col, F.explode("members").alias("neighbor_id")
    ).filter(F.col("neighbor_id") != F.col("query_id"))


# Exact-match dot products without a position join: each product is rounded
# to an integer at 1e-9 resolution and summed as BIGINT (exact, associative,
# order-independent) — both engines produce the identical integer, and the
# final /1e9 and norm division are identical IEEE doubles.
_DOT_SCALED_SQL = (
    "aggregate(zip_with({a}, {b}, (x, y) -> "
    "CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e9) AS BIGINT)), "
    "0L, (acc, v) -> acc + v)"
)

_COSINE_ORACLE = f"""
    WITH elems AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding, generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    norms AS (
      SELECT vec_id,
             SQRT(SUM(CAST(ROUND(v * v * 1e9) AS BIGINT)) / 1e9) AS nrm
      FROM elems GROUP BY vec_id
    ),
    dots AS (
      SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
             SUM(CAST(ROUND(q.v * d.v * 1e9) AS BIGINT)) AS dot_scaled
      FROM elems q
      JOIN elems d ON q.i = d.i
      WHERE q.vec_id % {QUERY_MOD} = 0 AND d.vec_id <> q.vec_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id, cosine, rnk
    FROM (
      SELECT query_id, neighbor_id,
             (dot_scaled / 1e9) / (nq.nrm * nd.nrm) AS cosine,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY (dot_scaled / 1e9) / (nq.nrm * nd.nrm) DESC, neighbor_id
             ) AS INTEGER) AS rnk
      FROM dots
      JOIN norms nq ON nq.vec_id = query_id
      JOIN norms nd ON nd.vec_id = neighbor_id
    )
    WHERE rnk <= {TOP_K}
"""


@query("similarity_topk_cosine", oracle=_COSINE_ORACLE)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (k=5) for the deterministic query subset.

    Scale shape: the (small) query set is broadcast against the corpus —
    no position-explode, no shuffle on the 64-value dimension key. Each
    corpus row computes Q dot products via JVM array folds inside codegen;
    the only shuffle is the final per-query top-k window (which Spark
    group-limits to K rows per partition before the exchange). This is the
    reranker primitive; the LSH variant below bounds Q×N at scale.

    The corpus side runs on content representatives (round-13, always-on
    like dedup_embedding_cosine — the full hash oracle checks the whole
    rewrite at committed SFs): identical embeddings score identically, so
    the Q-dot scan covers distinct vectors and the per-query top-k
    expands back through :func:`ann_rep_expand_topk`.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm = lambda col: F.sqrt(  # noqa: E731
        F.expr(_DOT_SCALED_SQL.format(a=col, b=col)) / F.lit(1e9)
    )
    queries = emb.filter(ann_query_pred(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm("embedding").alias("nrm_q"),
    )
    groups = persist_once(
        emb.groupBy("embedding").agg(
            F.min("vec_id").alias("rep_id"),
            F.collect_list("vec_id").alias("members"),
        )
    )
    corpus = groups.select(
        "rep_id", "embedding", norm("embedding").alias("nrm_d")
    )
    dot_scaled = F.expr(_DOT_SCALED_SQL.format(a="q_emb", b="embedding"))
    rep_cand = corpus.crossJoin(F.broadcast(queries)).select(
        "query_id",
        "rep_id",
        ((dot_scaled / F.lit(1e9)) / (F.col("nrm_q") * F.col("nrm_d"))).alias(
            "cosine"
        ),
    )
    sims = ann_rep_expand_topk(rep_cand, groups, TOP_K, "cosine", ascending=False)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


N_PLANES = 5  # 2^5 = 32 buckets per table
N_TABLES = 16  # independent tables; recall ~ 1-(1-p^planes)^tables
# Geometry set by the round-7 sweep (tools/recall.py --lsh-geometry): at the
# FIXED candidate budget tables/2^planes = 1/2, measured recall@5 at sf0.1
# was 3×4 → 0.680, 4×8 → 0.760 (rounds 4-6 default), 5×16 → 0.810,
# 6×32 → 0.870 — matching 1-(1-p^planes)^tables with p ≈ 0.63 to ±0.01.
# 5×16 clears the 0.8 bar at ~1.5× the 4×8 runtime; 6×32 costs ~3× for
# +0.06 — finer slicing buys recall because FEWER near-duplicate-bucket
# collisions are wasted on far pairs, at identical rescore volume.
NZ_PER_PLANE = 16  # sparse hyperplanes: signed entries on 16 of the 64 dims
EMB_DIM = 64  # testdata embeddings are 64-d (TESTDATA.md)


def _sparse_plane(t: int, p: int) -> list[tuple[int, int]]:
    """Deterministic sparse signed hyperplane for (table, plane): a fixed
    md5-derived choice of NZ_PER_PLANE (dim, ±1) entries. Sparse random
    projections (Achlioptas-style) preserve the sign-collision probability
    of dense Gaussian planes in expectation while costing 16 signed adds
    instead of 64 multiply-adds per (table, plane) — evaluated as small
    zip_with folds over literal dim/sign arrays (see the bucket CASE note).
    """
    import hashlib

    entries: list[tuple[int, int]] = []
    seen: set[int] = set()
    k = 0
    while len(entries) < NZ_PER_PLANE:
        h = hashlib.md5(f"lsh:{t}:{p}:{k}".encode()).digest()
        k += 1
        d = 1 + (h[0] | (h[1] << 8)) % EMB_DIM
        if d in seen:
            continue
        seen.add(d)
        entries.append((d, 1 if h[2] & 1 else -1))
    return entries


def _hof_dot(a: str, b: str) -> str:
    """Plain double dot product as a zip_with/aggregate fold.

    Measured (sf0.1, 2M-pair stream in dedup_embedding_cosine): HOF folds
    stream the primitive arrays in a single pass and run ~7× FASTER than a
    flat 64-term ``element_at`` chain, which pays per-term eval overhead —
    use folds for per-pair hot paths, not unrolled expressions. Not
    order-exact across engines (double adds) — for oracle-checked exactness
    use ``_DOT_SCALED_SQL``; this form is for rows-only ranking paths.
    """
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


@query("similarity_topk_lsh")  # approximate candidate gen => rows-only
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket by the sign pattern of
    {N_PLANES} sparse pseudo-random hyperplanes × {N_TABLES} tables,
    cosine rescore within candidate buckets only, per-query top-k. The
    scale path for similarity search.

    Everything stays inside whole-stage codegen: bucket ids are flat signed
    element_at sums (one expression per table — zero intermediate rows; a
    prior revision exploded dims × tables × planes = 2048 rows/vector), and
    the rescore dot product is a zip_with/aggregate fold over the joined
    embedding arrays (folds beat flat element_at chains ~7× per pair —
    see _hof_dot). Hyperplanes derive from md5(table, plane) at plan
    build time, so the operator needs no stored model.

    Geometry (round-7 sweep, tools/recall.py --lsh-geometry, committed in
    COVERAGE.md): at a FIXED candidate budget (tables / 2^planes = 1/2 of
    the corpus rescored), recall@5 at sf0.1 follows the theory curve
    recall ~ 1-(1-p^planes)^tables with p = 1 - angle/pi ≈ 0.63 for this
    corpus's cos~0.4 true neighbors (uniform-random vectors, ANN's worst
    case — real clustered embeddings do better): 3×4 → ~0.68, 4×8 →
    ~0.76, 5×16 → ~0.81, 6×32 → ~0.87. Default is {N_PLANES}×{N_TABLES};
    ``lsh_topk`` takes the geometry as parameters.
    """
    return lsh_topk(spark, sf_dir, N_PLANES, N_TABLES)


def lsh_topk(
    spark: SparkSession, sf_dir: str, n_planes: int, n_tables: int
) -> DataFrame:
    """Parameterized core of ``similarity_topk_lsh`` (geometry sweeps).

    Above ANN_REP_MIN_N the CORPUS side runs on content representatives
    (round-13): bucket ids and rescore cosines depend only on the
    embedding array, so identical vectors share every (table, bucket) key
    and per-query candidates grow linearly with replica count — the 30x
    probe measured 97x total / 11.97x per fixed query from exactly that
    term. Distinct embeddings bucket + rescore once; the top-k prune and
    membership expansion (:func:`ann_rep_expand_topk`) reproduce the flat
    output bit-identically. Below the gate (all committed SFs) the flat
    plan is unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(F.expr(_hof_dot("embedding", "embedding")))
    vecs = persist_once(emb.select("vec_id", "embedding", nrm.alias("nrm")))
    # metadata-only n (r15): vecs is a row-preserving projection of the
    # embeddings table, so the parquet footer count equals vecs.count()
    # without firing a job; the persist still fills on first real action.
    n_vecs = table_row_count(sf_dir, "embeddings")
    collapse = n_vecs >= ANN_REP_MIN_N
    groups = None
    corpus = vecs
    if collapse:
        groups = persist_once(
            vecs.groupBy("embedding").agg(
                F.min("vec_id").alias("rep_id"),
                F.min("nrm").alias("nrm"),  # nrm is a function of embedding
                F.collect_list("vec_id").alias("members"),
            )
        )
        corpus = groups.select(
            F.col("rep_id").alias("vec_id"), "embedding", "nrm"
        )

    def proj(t: int, p: int) -> str:
        entries = _sparse_plane(t, p)
        dims = ", ".join(str(d) for d, _s in entries)
        signs = ", ".join(f"{s:.1f}" for _d, s in entries)
        return (
            f"aggregate(zip_with(array({dims}), array({signs}), "
            "(d, s) -> CAST(element_at(embedding, d) AS DOUBLE) * s), "
            "CAST(0 AS DOUBLE), (a, v) -> a + v)"
        )

    def bucket(t: int) -> str:
        return " + ".join(
            f"CAST({proj(t, p)} > 0 AS LONG) * {1 << p}" for p in range(n_planes)
        )

    # table id from an exploded literal sequence + a lazy CASE per table: the
    # bucket expression is evaluated exactly once per (vector, table) row and
    # only the matching branch runs. (A flat 512-term array() variant blew
    # janino's method limit and dropped the whole stage to the interpreter;
    # small zip_with folds over literal dim/sign arrays keep the generated
    # code bounded.)
    bucket_case = (
        "CASE tbl "
        + " ".join(f"WHEN {t} THEN {bucket(t)}" for t in range(n_tables))
        + " END"
    )

    def with_buckets(df: DataFrame) -> DataFrame:
        return df.select(
            "*", F.explode(F.expr(f"sequence(0, {n_tables - 1})")).alias("tbl")
        ).withColumn("bucket", F.expr(bucket_case))

    # One corpus pass: explode the 8 (table, bucket) keys, broadcast-hash-join
    # against the (small) exploded query buckets, and compute the codegen dot
    # in the SAME stage — candidates never hit a shuffle. The only exchanges
    # left are the pair dedup and the final top-k window. When the query set
    # outgrows a broadcast, swap this join for a shuffle join on (tbl,
    # bucket) — the corpus side of the plan is unchanged.
    qb = with_buckets(
        vecs.filter(ann_query_pred(F.col("vec_id")))
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("nrm_q"),
        "tbl",
        "bucket",
    )
    db = with_buckets(corpus).select(
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        F.col("nrm").alias("nrm_d"),
        "tbl",
        "bucket",
    )
    cos = (
        F.expr(_hof_dot("q_emb", "embedding"))
        / (F.col("nrm_q") * F.col("nrm_d"))
    ).alias("cosine")
    joined = db.join(F.broadcast(qb), ["tbl", "bucket"])
    if collapse:
        # self-exclusion happens POST-expansion (the query's content class
        # may hold other corpus vectors the flat path keeps as neighbors)
        rep_cand = joined.select(
            "query_id", F.col("neighbor_id").alias("rep_id"), cos
        )
        sims = ann_rep_expand_topk(
            rep_cand, groups, TOP_K, "cosine", ascending=False
        )
    else:
        sims = joined.filter(
            F.col("neighbor_id") != F.col("query_id")
        ).select("query_id", "neighbor_id", cos)
    # A pair surfaced by several tables appears as EXACT duplicate rows, and
    # the window orders by (cosine, neighbor_id) — unique per distinct pair —
    # so dense_rank collapses duplicates to one rank. Deduping after the
    # rank filter touches <= K × tables rows per query instead of shuffling
    # the full candidate set through a distinct first.
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        sims.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .distinct()
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


_PAIRS_ORACLE = """
    WITH q AS (
      SELECT vec_id,
             [CAST(ROUND(CAST(x AS DOUBLE) * 1e4) AS BIGINT)
              FOR x IN embedding] AS qe
      FROM embeddings WHERE vec_id % 10 = 0
    ),
    norms AS (
      SELECT vec_id, qe, SQRT(LIST_SUM([x * x FOR x IN qe]) / 1e8) AS nrm
      FROM q
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           (LIST_SUM([a.qe[i] * b.qe[i] FOR i IN GENERATE_SERIES(1, 64)]) / 1e8)
             / (a.nrm * b.nrm) AS cosine
    FROM norms a
    JOIN norms b ON a.vec_id < b.vec_id
    WHERE (LIST_SUM([a.qe[i] * b.qe[i] FOR i IN GENERATE_SERIES(1, 64)]) / 1e8)
            / (a.nrm * b.nrm) >= 0.2
"""


PAIRS_GRID = 4  # subset is ~N/10 vectors; 16 grid cells spread the pairs


@query("similarity_pairs_above", oracle=_PAIRS_ORACLE)
def similarity_pairs_above(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine >= 0.2 on a deterministic 10% subset (vec_id % 10
    == 0) — the embedding near-dedup primitive, exact math.

    Same physical shape as ``dedup_embedding_cosine``: vectors quantize once
    to 1e-4 BIGINT arrays (exact in both engines), pairs come from a grid
    block equi-join (codegen-friendly, parallel — never a position-explode
    join on the dimension index, which shuffles 64 rows per vector, nor a
    nested-loop cross join, which drops out of codegen), and the dot product
    is an integer zip_with/aggregate fold — over CONTENT REPRESENTATIVES
    (round-13, the dedup_embedding_cosine recipe, always-on and checked by
    the full hash oracle): the quadratic grid join runs on distinct ``qe``
    arrays, rep pairs expand back through two membership joins, and
    within-group pairs emit cosine = sumsq/1e8 / nrm² — the SAME IEEE
    expression the pair path evaluates, not a 1.0 literal.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    qe = F.expr(
        "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e4) AS BIGINT))"
    )
    sumsq = F.expr("aggregate(qe, 0L, (acc, x) -> acc + x * x)")
    nrm = F.sqrt(sumsq / F.lit(1e8))
    groups = persist_once(
        emb.select("vec_id", qe.alias("qe"))
        .groupBy("qe")
        .agg(
            F.min("vec_id").alias("rep_id"),
            F.collect_list("vec_id").alias("members"),
        )
    )
    vecs = groups.select(F.col("rep_id").alias("vec_id"), "qe").select(
        "vec_id", "qe", nrm.alias("nrm"), (F.col("vec_id") % PAIRS_GRID).alias("g")
    )
    a = vecs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("qe").alias("qe_a"),
        F.col("nrm").alias("nrm_a"),
        F.explode(
            F.expr(f"transform(sequence(0, {PAIRS_GRID - 1}), j -> g * {PAIRS_GRID} + j)")
        ).alias("cell"),
    )
    b = vecs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("qe").alias("qe_b"),
        F.col("nrm").alias("nrm_b"),
        F.explode(
            F.expr(f"transform(sequence(0, {PAIRS_GRID - 1}), i -> i * {PAIRS_GRID} + g)")
        ).alias("cell"),
    )
    dot = "aggregate(zip_with(qe_a, qe_b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    rep_pairs = (
        a.repartition(n_part, "cell")
        .join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            F.col("vec_a").alias("rep_a"),
            F.col("vec_b").alias("rep_b"),
            ((F.expr(dot) / F.lit(1e8)) / (F.col("nrm_a") * F.col("nrm_b"))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= 0.2)
    )
    membership = groups.select(
        F.col("rep_id"), F.explode("members").alias("vec_id")
    )
    ma = membership.select(
        F.col("rep_id").alias("rep_a"), F.col("vec_id").alias("va")
    )
    mb = membership.select(
        F.col("rep_id").alias("rep_b"), F.col("vec_id").alias("vb")
    )
    cross = (
        rep_pairs.join(ma, "rep_a")
        .join(mb, "rep_b")
        .select(
            F.least("va", "vb").alias("vec_a"),
            F.greatest("va", "vb").alias("vec_b"),
            "cosine",
        )
    )
    within = (
        groups.filter(F.size("members") >= 2)
        .select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(members, "
                    "x -> transform(members, y -> struct(x, y)))), "
                    "p -> p.x < p.y)"
                )
            ).alias("p"),
            (sumsq / F.lit(1e8) / (nrm * nrm)).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.2)
        .select(
            F.col("p.x").alias("vec_a"),
            F.col("p.y").alias("vec_b"),
            "cosine",
        )
    )
    return cross.unionByName(within)


# Round-10 geometry (tools/recall.py --ivf-geometry sweep at sf0.1, equal
# ~620-dot budget = centroid dots + candidate dots per query):
#   17x30x2 = 0.77 (the r9 config)   17x30x3 = 0.75   17x30x4 = 0.73
#   13x36x2 = 0.79   13x36x3 = 0.82  <- adopted (beats LSH's 0.81)
#   23x23x2 = 0.77   11x40x2 = 0.73  11x40x3 = 0.74
# Two lessons: (1) FINER cells + more probes dominate at fixed budget up
# to a point (mod 11 overshoots — per-cell population ~11 is too small for
# top-5), and (2) a 3rd Lloyd round helps exactly when cells are fine
# (13x36: +0.03) and HURTS when they're coarse (17x30: -0.02; coarse CVT
# cells equalize volumes and push true neighbors across probe borders).
# History: r5 subset centroids 37x16 = 0.69; r9 Lloyd-refined 17x30x2 =
# 0.77 (+0.08 from Lloyd); r10 13x36x3 = 0.82 (+0.05 from geometry).
N_CELLS_MOD = 13  # centroid INIT: vec_id % 13 == 1 (deterministic, ~N/13 cells)
N_PROBE = 36      # 36/~154 cells at sf0.1: recall@5 0.82 at the r5 budget
_IVF_LLOYD = 3    # deterministic Lloyd refinement rounds (exact integer means)

# sqrt(2000) reference: the sf0.1 corpus all committed geometry sweeps ran
# on. Below/at that size the adaptive stride is a NO-OP (mod == base, so
# every committed recall/bench number is untouched); beyond it the stride
# grows ~sqrt(n), keeping ncells ~ sqrt(n) — the FAISS nlist heuristic.
_REF_SQRT = 44  # floor(sqrt(2000))


def adaptive_cells_mod(base: int, n: int) -> int:
    """Centroid-subset stride for an n-vector corpus: ``max(base,
    floor(sqrt(n)) * base // 44)``. With a FIXED stride the centroid count
    n/mod grows LINEARLY, so the n x ncells assignment stage goes
    quadratic — the round-10 scale probe measured similarity_topk_ivf at
    29.3x and dedup_semdedup_clusters at 71.8x for 10x input. A sqrt(n)
    stride bounds both the assignment and the within-cell pair stage at
    ~n^1.5 (the flat-index optimum; going below that needs a hierarchy).
    Integer-exact and engine-reproducible: floor(sqrt(double)) agrees with
    exact isqrt for n far below 2^52, and the oracle SQL computes the
    identical expression (adaptive_cells_mod_sql)."""
    import math

    return max(base, int(math.floor(math.sqrt(n))) * base // _REF_SQRT)


def adaptive_cells_mod_sql(base: int, table: str = "embeddings") -> str:
    """The DuckDB spelling of :func:`adaptive_cells_mod` over ``table``'s
    row count, for oracles that must mirror the adaptive stride."""
    return (
        f"GREATEST({base}, (CAST(FLOOR(SQRT(CAST((SELECT COUNT(*) FROM "
        f"{table}) AS DOUBLE))) AS BIGINT) * {base}) // {_REF_SQRT})"
    )


IVF_HIER_MIN_N = 8192  # two-level coarse-quantizer threshold (shared by the
# IVF and IVFPQ builds): 4x the largest committed corpus, so every committed
# SF takes the flat n x ncells assignment BIT-IDENTICALLY (hashes, bench
# rows, recall numbers untouched); the 10x/30x probes (20k/60k vectors)
# cross it and run the hierarchy. Same gating recipe as
# SEMDEDUP_HIER_MIN_N / adaptive_cells_mod / LLOYD_TRAIN_CAP.

LLOYD_TRAIN_CAP = 2000  # == the sf0.1 corpus, so sampling is an exact no-op
# at every committed SF (train == full corpus, bit-identical centroids to
# the unsampled code; every committed recall and bench number is untouched)


LLOYD_TRAIN_PER_CELL = 8  # minimum training points per centroid. Round-13
# finding: the r11 FIXED ~2000-point sample starved the sqrt-scaled cell
# count at scale (834 init cells at 30x got ~2.4 train points each, and 3
# Lloyd rounds COLLAPSED them to 142 survivors — each probed cell then
# held ~423 members, so every query's candidate list covered ~a quarter of
# the corpus and the IVFPQ ADC join exploded to ~73M rows: the real driver
# of the 46.1x/210s 30x row, not the assignment pass). FAISS warns below
# ~39 points/centroid; 8 keeps survival near-complete (1 - e^-8) at a
# training cost that stays ~linear: rounds x (8 * ncells) x ncells =
# O(n) for ncells ~ sqrt(n).


def lloyd_train_mod(n: int, cells_mod: int | None = None) -> int:
    """Training-sample stride for the Lloyd refinement rounds: ``max(1,
    n // cap)`` with ``cap = max(LLOYD_TRAIN_CAP, LLOYD_TRAIN_PER_CELL *
    (n // cells_mod))`` — a deterministic ``vec_id % mod == 1`` sample of
    ~cap vectors that SCALES WITH THE CELL COUNT (the FAISS train/add
    split sized to its nlist; see LLOYD_TRAIN_PER_CELL for the round-13
    cell-collapse finding a fixed cap caused). With full-corpus training
    the 3 Lloyd passes dominate the index BUILD at scale (the round-10
    probe measured similarity_topk_ivf at 18.0x for 10x input); the
    sample bounds them while keeping ~{LLOYD_TRAIN_PER_CELL} points per
    centroid. EXACT NO-OP at every committed SF: n <= LLOYD_TRAIN_CAP
    keeps cap >= n, so mod == 1 == the unsampled plan, bit-identical —
    recall and bench rows are untouched. ``cells_mod=None`` keeps the r11
    fixed-cap behavior for callers without a cell geometry. Centroid
    quality is a sample-accuracy question, not a correctness one: the IVF
    consumers are rows-only ANN queries tracked by tools/recall.py."""
    cap = LLOYD_TRAIN_CAP
    if cells_mod is not None:
        cap = max(cap, LLOYD_TRAIN_PER_CELL * (n // cells_mod))
    return max(1, n // cap)


def _lloyd_refine(
    vecs: DataFrame, cents: DataFrame, rounds: int, sample_mod: int = 1
) -> DataFrame:
    """Deterministic distributed Lloyd refinement of the IVF centroids:
    assign every vector to its nearest centroid (broadcast argmax — no
    shuffle on the corpus side), recompute each cell's mean on the unit
    sphere, repeat. Means are exact BIGINT micro-unit sums per (cell,
    component) — order-independent, so the refined centroids (and hence
    cell membership and recall) are bit-identical across runs and cluster
    sizes; a plain AVG(double) here would make the index nondeterministic.
    Cost per round: one |N|x|C| broadcast score + one 64|N|-row explode
    shuffle into |C|x64 partial sums — the textbook distributed k-means
    round, linear in the corpus at any scale. Cells that lose all members
    drop out (slightly shrinking ncells), matching the numpy prototype in
    tools/recall.py's sweep.

    ``sample_mod`` > 1 trains the rounds on the deterministic ``vec_id %
    sample_mod == 1`` sample (bounded at ~LLOYD_TRAIN_CAP vectors by
    :func:`lloyd_train_mod`) — the FAISS train/add split: refinement cost
    becomes rounds x |sample| x |C| while the ONE full-corpus assignment
    pass stays with the caller. At 1 (all committed SFs) the plan is
    bit-identical to unsampled training."""
    train = vecs
    made_sample = sample_mod > 1
    if made_sample:
        train = persist_once(vecs.filter(F.col("vec_id") % sample_mod == 1))
    unit = F.expr(
        "transform(embedding, x -> CAST(x AS DOUBLE) / nrm)"
    )
    for _ in range(rounds):
        dot = F.expr(_DOT_SCALED_SQL.format(a="embedding", b="c_emb"))
        cs = (dot / F.lit(1e9)) / (F.col("nrm") * F.col("c_nrm"))
        # top-1 assignment as a hash aggregate (max over a lexicographic
        # struct; -cell_id makes ties resolve to the LOWEST cell id, same
        # as the search path's row_number ordering) — no sort window
        assigned = (
            train.crossJoin(F.broadcast(cents))
            .select("vec_id", unit.alias("u"), cs.alias("cs"), "cell_id")
            .groupBy("vec_id")
            .agg(
                F.max(F.struct("cs", (-F.col("cell_id")).alias("nc"))).alias("b"),
                F.first("u").alias("u"),
            )
            .select((-F.col("b.nc")).alias("cell_id"), "u")
        )
        comp = assigned.select(
            "cell_id", F.posexplode("u").alias("pos", "x")
        ).select(
            "cell_id",
            "pos",
            F.expr("CAST(ROUND(x * 1e9) AS BIGINT)").alias("xm"),
        )
        cents = (
            comp.groupBy("cell_id", "pos")
            .agg(F.sum("xm").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("cell_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
                    lambda t: t["s"].cast("double") / t["n"] / F.lit(1e9),
                ).alias("c_emb")
            )
            .select(
                "cell_id",
                "c_emb",
                F.sqrt(
                    F.expr(_DOT_SCALED_SQL.format(a="c_emb", b="c_emb"))
                    / F.lit(1e9)
                ).alias("c_nrm"),
            )
            .localCheckpoint(eager=True)  # keep the per-round plan flat
        )
    if made_sample:
        train.unpersist()  # centroids are checkpointed — the sample is done
    return cents


def _ivf_hier_cell_scores(
    vecs: DataFrame,
    cents: DataFrame,
    cells_mod: int,
    route: DataFrame = None,  # noqa: RUF013
) -> DataFrame:
    """Two-level (super -> cell) scoring for the IVF coarse quantizer —
    the restricted (vec_id, embedding, nrm, cell_id, cs) frame that
    replaces the flat n x ncells crossJoin above IVF_HIER_MIN_N (the
    semdedup ``_semdedup_hier_assign`` recipe applied to the quantizer
    BUILD, which the round-12 30x probe named as the remaining n^1.5
    term: one full assignment over ncells ~ sqrt(n) centroids).

    A sqrt-sized SUPER layer (deterministic sub-stride of the refined
    centroid ids — cell_ids are the init vec_ids, so ``cell_id %
    (cells_mod * cf) == 1`` picks ~ncells/cf of them) routes both sides:
    every cell centroid joins its best super (|cells| x |supers| — tiny),
    and every vector scores only the supers (n x sqrt(ncells)) plus the
    cells routed to its top supers (~2*NPROBE cells, sized so query
    probing keeps its breadth). Per-vector work falls from ncells ~
    sqrt(n) to ~n^(1/4) + 2*NPROBE — the build drops under n^1.5. All
    orderings are (score, id) ties, so the restriction is deterministic;
    the downstream argmax/top-NPROBE code is unchanged — only the
    candidate set shrinks (rows-only ANN: recall at committed SFs is
    untouched because the flat path runs there).

    ``route`` (round-13 content-collapse): the frame actually scored and
    routed — defaults to ``vecs``; the collapsed path passes content
    representatives while both centroid layers stay derived from the full
    corpus's vec_id strides (scoring depends only on vector content and
    the centroid tables, so a rep scores exactly as each member would)."""
    import math

    if route is None:
        route = vecs
    ncells = cents.count()  # centroid-table action: sqrt(n) rows, cached
    cf = max(2, math.isqrt(max(1, ncells)))
    super_mod = cells_mod * cf
    sup = cents.filter(F.col("cell_id") % super_mod == 1).select(
        F.col("cell_id").alias("super_id"),
        F.col("c_emb").alias("s_emb"),
        F.col("c_nrm").alias("s_nrm"),
    )
    c2s = (
        F.expr(_DOT_SCALED_SQL.format(a="c_emb", b="s_emb")) / F.lit(1e9)
    ) / (F.col("c_nrm") * F.col("s_nrm"))
    f2s = (
        cents.crossJoin(F.broadcast(sup))
        .select("cell_id", "c_emb", "c_nrm", "super_id", c2s.alias("cs"))
        .groupBy("cell_id")
        .agg(
            F.max(F.struct("cs", (-F.col("super_id")).alias("ns"))).alias("b"),
            F.first("c_emb").alias("c_emb"),
            F.first("c_nrm").alias("c_nrm"),
        )
        .select((-F.col("b.ns")).alias("super_id"), "cell_id", "c_emb", "c_nrm")
    )
    v2s = (
        F.expr(_DOT_SCALED_SQL.format(a="embedding", b="s_emb")) / F.lit(1e9)
    ) / (F.col("nrm") * F.col("s_nrm"))
    vs = route.crossJoin(F.broadcast(sup)).select(
        "vec_id", v2s.alias("cs"), "super_id"
    )
    # enough probed supers that ~2x NPROBE cells stay reachable per query
    n_sup_probes = max(2, (2 * N_PROBE + cf - 1) // cf)
    wp = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), "super_id")
    probed = (
        vs.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_sup_probes)
        .select("vec_id", "super_id")
    )
    cs_cell = (
        F.expr(_DOT_SCALED_SQL.format(a="embedding", b="c_emb")) / F.lit(1e9)
    ) / (F.col("nrm") * F.col("c_nrm"))
    # each cell routes to exactly one super and supers are distinct per
    # vector, so (vec_id, cell_id) rows are already unique — no dedup.
    # SLIM output (no embedding/nrm riding along) + persist: the frame
    # feeds BOTH the assignment argmax and the query probes — without the
    # persist each consumer would replay the two-shuffle routing pipeline.
    return (
        probed.join(route, "vec_id")
        .join(F.broadcast(f2s), "super_id")
        .select("vec_id", "cell_id", cs_cell.alias("cs"))
        .persist()
    )


@query("similarity_topk_ivf")  # approximate candidate gen => rows-only
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a deterministic centroid subset stands in for k-means
    cells (same plumbing — swap in sampled+trained centroids on a cluster);
    every vector is assigned to its nearest centroid, queries probe the
    N_PROBE nearest cells, and exact cosine rescoring runs only inside the
    probed cells.

    Scale: assignment is a broadcast of the (small) centroid table + one
    argmin per vector — no shuffle; search shuffles only candidates from
    probed cells (corpus/cells * nprobe rows per query on average), then the
    per-query top-k window. Cell skew is bounded by centroid spread; AQE
    splits hot cells.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(F.expr(_DOT_SCALED_SQL.format(a="embedding", b="embedding")) / F.lit(1e9))
    # the tiny test parquet is ONE scan split; every broadcast-scoring
    # below (interpreted HOF dots) would run in a single task without this
    # bounded round-robin fan-out (same fix as the codec pipelines)
    vecs = (
        persist_once(emb.select("vec_id", "embedding", norm.alias("nrm"))
        .repartition(spark.sparkContext.defaultParallelism))
    )
    # sqrt-scaled stride (no-op at the committed SFs): ncells ~ sqrt(n),
    # so the n x ncells assignment stays ~n^1.5 instead of n^2
    # metadata-only n (r15): vecs is a row-preserving projection of the
    # embeddings table, so the parquet footer count equals vecs.count()
    # without firing a job; the persist still fills on first real action.
    n_vecs = table_row_count(sf_dir, "embeddings")
    # Content-collapse of the corpus side (round-13, the LSH/PQ recipe):
    # centroid INIT and Lloyd TRAINING stay id-selected from the full
    # corpus (unchanged index), but assignment, probing, and the exact
    # rescore are content-determined given the centroid tables, so they
    # run on distinct embeddings; a query's probe cells equal its rep's
    # (same content), and the final top-k expands back through
    # ann_rep_expand_topk. Gated so committed SFs keep the flat plan.
    collapse = n_vecs >= ANN_REP_MIN_N
    groups = None
    membership = None
    src = vecs
    if collapse:
        groups = persist_once(
            vecs.groupBy("embedding").agg(
                F.min("vec_id").alias("rep_id"),
                F.min("nrm").alias("nrm"),  # nrm is a function of embedding
                F.collect_list("vec_id").alias("members"),
            )
        )
        src = groups.select(
            F.col("rep_id").alias("vec_id"), "embedding", "nrm"
        )
        membership = groups.select(
            "rep_id", F.explode("members").alias("member")
        )
        # reps whose content class holds >= 1 query member: the probe
        # window only ever feeds the membership join below, which drops
        # every other rep — semi-joining BEFORE the window (round-14,
        # advisor) keeps the top-NPROBE sort at query-rep count instead
        # of a full-corpus-reps window. Per-rep ranks are unchanged by
        # the restriction (the window partitions by vec_id).
        query_reps = F.broadcast(
            membership.filter(ann_query_pred(F.col("member")))
            .select(F.col("rep_id").alias("vec_id"))
            .distinct()
        )
    cells_mod = adaptive_cells_mod(N_CELLS_MOD, n_vecs)
    cents = vecs.filter(F.col("vec_id") % cells_mod == 1).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    # sample-trained Lloyd (no-op at committed SFs): the 3 refinement
    # rounds run over a ~LLOYD_TRAIN_CAP-vector deterministic sample, so
    # the index BUILD is one full n x ncells assignment pass instead of
    # four (the round-10 probe's 18.0x grower)
    cents = _lloyd_refine(vecs, cents, _IVF_LLOYD, lloyd_train_mod(n_vecs, cells_mod))
    if n_vecs >= IVF_HIER_MIN_N:
        # two-level quantizer build (round-13): the flat n x ncells
        # assignment is the n^1.5 term the 30x probe flagged at 46.1x on
        # the IVFPQ twin; the super layer drops it under n^1.5 while the
        # committed SFs stay on the flat path bit-identically. The slim
        # restricted frame assigns via a HASH-AGG argmax (map-side
        # combine) instead of the flat path's window — no array-laden
        # n x cells shuffle — and embedding/nrm re-join per VECTOR (n
        # rows), not per (vector, cell).
        slim = _ivf_hier_cell_scores(
            vecs, cents, cells_mod, route=src if collapse else None
        )
        best = (
            slim.groupBy("vec_id")
            .agg(F.max(F.struct("cs", (-F.col("cell_id")).alias("nc"))).alias("b"))
            .select("vec_id", (-F.col("b.nc")).alias("cell_id"))
        )
        assigned = best.join(src, "vec_id").select(
            "vec_id", "embedding", "nrm", "cell_id"
        )
        w_hier = Window.partitionBy("vec_id").orderBy(
            F.col("cs").desc(), "cell_id"
        )
        src_probes = (
            (
                slim.join(query_reps, "vec_id", "left_semi")
                if collapse
                else slim.filter(ann_query_pred(F.col("vec_id")))
            )
            .withColumn("rk", F.row_number().over(w_hier))
            .filter(F.col("rk") <= N_PROBE)
            .select("vec_id", "cell_id")
        )
    else:
        dot = F.expr(_DOT_SCALED_SQL.format(a="embedding", b="c_emb"))
        sim_to_cent = (dot / F.lit(1e9)) / (F.col("nrm") * F.col("c_nrm"))
        scored = src.crossJoin(F.broadcast(cents)).select(
            "vec_id", "embedding", "nrm", "cell_id", sim_to_cent.alias("cs")
        )
        w_assign = Window.partitionBy("vec_id").orderBy(
            F.col("cs").desc(), "cell_id"
        )
        assigned = (
            scored.withColumn("rk", F.row_number().over(w_assign))
            .filter(F.col("rk") == 1)
            .select("vec_id", "embedding", "nrm", "cell_id")
        )
        src_probes = (
            (
                scored.join(query_reps, "vec_id", "left_semi")
                if collapse
                else scored.filter(ann_query_pred(F.col("vec_id")))
            )
            .withColumn("rk", F.row_number().over(w_assign))
            .filter(F.col("rk") <= N_PROBE)
            .select("vec_id", "cell_id")
        )
    if collapse:
        # a query's probe cells are its rep's probe cells (content-
        # determined); the rep-level top-NPROBE rows fan out to member
        # queries through the membership relation
        probes = (
            membership.filter(ann_query_pred(F.col("member")))
            .join(src_probes.withColumnRenamed("vec_id", "rep_id"), "rep_id")
            .select(F.col("member").alias("query_id"), "cell_id")
        )
    else:
        probes = src_probes.filter(
            ann_query_pred(F.col("vec_id"))
        ).select(F.col("vec_id").alias("query_id"), "cell_id")
    queries = vecs.filter(ann_query_pred(F.col("vec_id"))).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("nrm_q"),
    )
    cand = probes.join(assigned, "cell_id")
    if not collapse:
        # self-exclusion moves into ann_rep_expand_topk's post-expansion
        # filter on the collapsed path (the query's content class may
        # hold other corpus vectors the flat path keeps)
        cand = cand.filter(F.col("vec_id") != F.col("query_id"))
    cand = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), "embedding", "nrm"
    )
    if n_vecs >= IVF_HIER_MIN_N:
        # the probe-cell join EXPLODES output ~|cell| per probe row while
        # its shuffle INPUT stays small, so AQE coalesces the rescore to a
        # handful of tasks (measured: the 5.4M-candidate exact rescore at
        # 30x ran 9-wide, 27 s of the 68 s wall). Keyed repartition spreads
        # it cluster-wide AND pre-satisfies the final top-k window's
        # partitioning (same key — no extra exchange). Gated with the
        # hierarchy so every committed-SF plan is byte-identical.
        n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        cand = cand.repartition(n_part, "query_id")
    qdot = F.expr(_DOT_SCALED_SQL.format(a="q_emb", b="embedding"))
    sims = cand.join(F.broadcast(queries), "query_id").select(
        "query_id",
        "neighbor_id",
        ((qdot / F.lit(1e9)) / (F.col("nrm_q") * F.col("nrm"))).alias("cosine"),
    )
    if collapse:
        sims = ann_rep_expand_topk(
            sims.withColumnRenamed("neighbor_id", "rep_id"),
            groups,
            TOP_K,
            "cosine",
            ascending=False,
        )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
