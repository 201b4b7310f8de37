"""Similarity search over embedding columns.

- ``cosine``            : exact cosine between two array<double> columns —
                          a zip_with/aggregate fold, fully JVM-side.
- ``with_norm``         : precompute L2 norms once per row (narrow) so pair
                          scoring is a dot product, not two extra folds.
- ``topk_bruteforce``   : exact top-k via query⨯corpus join + window rank.
                          Baseline path: at scale the query side is small and
                          broadcast, so the corpus is scanned once, no shuffle
                          of the big side.
- ``lsh_buckets`` /
  ``topk_lsh``          : sign-random-projection LSH (deterministic seeded
                          hyperplanes). Scale path: candidates only join
                          within a bucket — turns O(Q·N) into
                          O(Q·N/2^bits) expected, at recall cost. The
                          hyperplanes are literal arrays baked into the plan
                          (no SparkContext broadcast needed at this size).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product as an aggregate/zip_with fold.

    Do NOT "optimize" this into an unrolled sum of element_at terms: when
    the operand is a computed array (e.g. the _v cast column), codegen
    inlines the array-producing expression into EVERY element_at — 64
    terms re-evaluating a 64-element transform is a 64x blowup (measured
    6x slower end-to-end). The lambda fold evaluates the array once.
    Re-measured in round 7 for BOUND attributes too (vectors out of a
    checkpoint, inside the LSH band-join verify): the 64-term unrolled
    projection pushed the generated method past the codegen size limit,
    the join stage fell back to interpreted eval, and the key ran 2x
    SLOWER than this fold. The fold is the right form in both regimes."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Cast vec to double + attach its L2 norm (one narrow pass).

    Deliberately NOT spread(): the per-row vector arithmetic (a few dozen
    multiply-adds) is far lighter than token hashing, so forcing an extra
    repartition shuffle costs more than the parallelism buys — measured
    slower on every embedding path."""
    return df.withColumn("_v", as_double(F.col(vec_col))).withColumn("_norm", l2_norm(F.col("_v")))


def cosine(v_a: Column, norm_a: Column, v_b: Column, norm_b: Column) -> Column:
    return dot(v_a, v_b) / F.nullif(norm_a * norm_b, F.lit(0.0))


def topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k cosine for each query over the corpus.

    Output: (query_id, vec_id, cosine, rk). Ranking is on the ROUNDED cosine
    with an id tiebreak, so results are stable against last-ulp float noise.
    The query side is broadcast — the corpus never shuffles.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
    )
    c = with_norm(corpus, vec_col).select(id_col, "_v", "_norm")
    scored = (
        c.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                cosine(F.col("_qv"), F.col("_qnorm"), F.col("_v"), F.col("_norm")), round_to
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(bits, dim).tolist()


def lsh_buckets(
    df: DataFrame, planes: list[list[float]], vec_col: str = "_v"
) -> DataFrame:
    """Attach a sign-random-projection bucket id (0..2^bits-1)."""
    bucket = F.lit(0)
    for j, h in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in h])
        bit = (dot(F.col(vec_col), lit) > 0).cast("int")
        bucket = bucket + bit * (2 ** j)
    return df.withColumn("bucket", bucket)


def topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket.

    At 100 TB: bucket is a narrow computed column, the candidate join keys on
    (bucket) so both sides hash-partition by bucket — expected candidate set
    shrinks ~2^bits-fold vs brute force. Recall is tunable via bits / probing
    multiple buckets.
    """
    planes = hyperplanes(dim, bits)
    q = lsh_buckets(with_norm(queries, vec_col), planes).select(
        F.col(id_col).alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
        F.col("bucket"),
    )
    c = lsh_buckets(with_norm(corpus, vec_col), planes).select(id_col, "_v", "_norm", "bucket")
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                cosine(F.col("_qv"), F.col("_qnorm"), F.col("_v"), F.col("_norm")), round_to
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col(id_col))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
