"""Fuzzy string matching (entity-resolution primitive): edit-distance join
via deletion-neighborhood blocking + exact Levenshtein verification.

Blocking is FastSS-style (Bocek et al., "Fast Similarity Search in Large
Dictionaries", U. Zurich tech report 2007 — public literature): each string
emits itself plus every single-character deletion as block keys. Two strings
within edit distance 1 always share a key (substitution: both delete the
differing position; insertion/deletion: the longer side's deletion at the
inserted position equals the shorter side), so the candidate set is a
provable superset and the Levenshtein filter makes the result exact.

Unlike half-split (PassJoin-style) blocking, deletion keys are near-full
strings — selectivity survives a constant shared prefix (e.g. the
'Customer#%09d' name family, where any fixed-position prefix block collapses
to ONE bucket holding the whole table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oe_batch_processing_spark.registry import query
from oe_batch_processing_spark.tables import load_table


@query(
    "join_fuzzy_customer_names",
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           a.c_name AS name_a, b.c_name AS name_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a
    JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def join_fuzzy_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 name pairs over the customer table.

    Scale shape: each row explodes to len(name)+1 deletion keys (JVM
    transform, no Python); candidates come from a keyed self-join on those
    near-full-string keys, so shuffle and pair volume track TRUE match
    counts, never O(N²). Levenshtein runs only on candidates; distinct
    collapses pairs surfaced by several shared keys. The oracle is the
    naive quadratic join — exactly what makes the blocking's no-miss
    property checkable every round.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # keys: the string itself (i=0) + each single-deletion variant (i>=1)
    keys = F.expr(
        "transform(sequence(0, length(c_name)), i -> IF(i = 0, c_name, "
        "concat(substring(c_name, 1, i - 1), substring(c_name, i + 1))))"
    )
    exploded = cust.select(
        "c_custkey", "c_name", F.explode(keys).alias("blk")
    )
    a = exploded.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"), "blk"
    )
    b = exploded.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"), "blk"
    )
    cand = (
        a.repartition(n_part, "blk")
        .join(b, "blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "name_a", "name_b")
        .distinct()
    )
    return cand.withColumn("dist", F.levenshtein("name_a", "name_b")).filter(
        F.col("dist") <= 1
    )
