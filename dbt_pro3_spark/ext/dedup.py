"""Deduplication operators for document corpora.

Five escalating strategies, each the idiomatic Spark shape for its scale:

- exact        : groupBy(normalized text) keep min id — one shuffle on a
                 content hash; at 100 TB group on sha2(text) so the shuffle
                 key is 32 bytes, not the document.
- minhash_lsh  : pyspark.ml HashingTF → MinHashLSH approxSimilarityJoin —
                 banding avoids the O(n²) pair space.
- simhash      : 32-bit sign-vote fingerprint + byte-band candidate join +
                 hamming verify. Pure DataFrame ops (explode/groupBy/bit
                 ops) — no UDF, no cartesian product.
- ngram_jaccard: shingle explode → shingle-equality candidate pairs →
                 exact Jaccard verify (block-then-verify; hot shingles are
                 the skew hazard — cap or salt them at real scale).
- embedding    : cosine ≥ threshold pair join (delegates to similarity.py
                 norms; bucket with LSH first at real scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import cosine, with_norm
from .text import shingles, tokens


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct normalized text: (kept id, dup_count).

    Shuffle key is the md5 of the text, not the text itself — at corpus
    scale that's the difference between shuffling 100 TB and shuffling 2 TB.
    """
    norm = F.lower(F.trim(F.col(text_col)))
    return (
        df.select(F.col(id_col), F.md5(norm.cast("binary")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("kept_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 5,
    jaccard_max_distance: float = 0.8,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash LSH (stock pyspark.ml).

    shingle → HashingTF sparse vector → MinHash signatures → banded
    similarity join. Returns (doc_a, doc_b, jaccard_distance) with
    doc_a < doc_b. Deterministic via fixed seed.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = df.select(F.col(id_col), shingles(F.col(text_col), 3).alias("sh")).filter(
        F.size("sh") > 0
    )
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features)
    feat = tf.transform(docs)
    lsh = MinHashLSH(inputCol="features", outputCol="sig", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(feat)
    pairs = model.approxSimilarityJoin(feat, feat, jaccard_max_distance, distCol="jaccard_distance")
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """32-bit SimHash per document: per-token xxhash64, sign-votes per bit.

    explode → one groupBy(doc) with `bits` conditional sums — a single
    shuffle keyed by doc id; reassembly is plain integer arithmetic.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    hashed = toks.withColumn("h", F.xxhash64("tok"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + F.when(F.col(f"b{b}") > 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 6
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 32-bit signature into 4 bytes;
    pairs sharing ANY byte are candidates (pigeonhole: hamming ≤ 3 over 4
    bands guarantees a shared band); verify with exact bit_count(xor)."""
    sigs = simhash(df, id_col, text_col)
    bands = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(255)).alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select(id_col, "simhash", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    a = bands.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"), "band", "val"
    )
    b = bands.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"), "band", "val"
    )
    cand = (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.expr("bit_count(sig_a ^ sig_b)")
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_common: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs sharing ≥ min_common shingles.

    Block-then-verify: the shingle-equality join IS the blocking step.
    Output: (doc_a, doc_b, common_shingles, jaccard)."""
    # join on the 8-byte xxhash64 of the shingle, not the shingle string —
    # the candidate-join shuffle carries fixed-size keys (collision odds
    # ~2^-64 per pair; immaterial vs the string-shuffle cost at scale)
    sh = (
        df.select(F.col(id_col).alias("doc_id_"), F.explode(shingles(F.col(text_col), n)).alias("shingle"))
        .select("doc_id_", F.xxhash64("shingle").alias("sh_h"))
        .dropDuplicates(["doc_id_", "sh_h"])
    )
    counts = sh.groupBy("doc_id_").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id_").alias("doc_a"), "sh_h")
    b = sh.select(F.col("doc_id_").alias("doc_b"), "sh_h")
    common = (
        a.join(b, "sh_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common_shingles"))
        .filter(F.col("common_shingles") >= min_common)
    )
    ca = counts.select(F.col("doc_id_").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col("doc_id_").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "common_shingles",
            F.round(
                F.col("common_shingles").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common_shingles")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, id-ordered.

    Self-join is O(n²)/2 — correct baseline; at corpus scale route through
    similarity.topk_lsh buckets first. Threshold applies to the ROUNDED
    cosine so the cut is reproducible bit-for-bit by the oracle."""
    e = with_norm(df, vec_col).select(id_col, "_v", "_norm")
    a = e.select(
        F.col(id_col).alias("vec_a"), F.col("_v").alias("va"), F.col("_norm").alias("na")
    )
    b = e.select(
        F.col(id_col).alias("vec_b"), F.col("_v").alias("vb"), F.col("_norm").alias("nb")
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).select(
        "vec_a",
        "vec_b",
        F.round(cosine(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")), 6).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
