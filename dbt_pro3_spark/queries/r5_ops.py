"""Round-5 operator batch.

New analytics/LLM-pipeline keys added in round 5, following the established
batch recipe: each key lands with a DuckDB oracle twin, a plan-quality
sweep entry (automatic — tests/test_plan_quality.py parametrizes over the
registry), and a BASELINE.md row in the same commit.

Cited parity anchor: /root/reference/models (beyond-reference surface —
the reference's dbt project defines no analytics beyond its 12 models;
these keys extend the engine the way its Databricks warehouse would be
used downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ext import similarity as sim
from ..ext import text as tx
from ..sources.readers import load
from . import dround, register
from .llm_ops import _TOKS_SQL, _md5_32, _spark_md5_32

# ---------------------------------------------------------------------------
# ext_rerank_rrf — reciprocal-rank fusion of two retrieval rankers
# ---------------------------------------------------------------------------

RRF_K0 = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_POOL = 20  # candidate depth contributed by each ranker
RRF_OUT = 10  # fused list depth
RRF_NQ = 10  # probe queries: vec_id < RRF_NQ


@register(
    "ext_rerank_rrf",
    f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {RRF_NQ}
    ), scored AS MATERIALIZED (
        SELECT query_id, vec_id,
               {dround('list_cosine_similarity(qv, v)', 6)} AS cosine,
               {dround('list_inner_product(qv, v)', 6)} AS dotp
        FROM q JOIN e ON vec_id <> query_id
    ), rc AS (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
        FROM scored
    ), rd AS (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dotp DESC, vec_id) AS rk
        FROM scored
    ), pool AS (
        SELECT COALESCE(rc.query_id, rd.query_id) AS query_id,
               COALESCE(rc.vec_id, rd.vec_id) AS vec_id,
               rc.rk AS rk_cos, rd.rk AS rk_dot
        FROM (SELECT * FROM rc WHERE rk <= {RRF_POOL}) rc
        FULL OUTER JOIN (SELECT * FROM rd WHERE rk <= {RRF_POOL}) rd
          ON rc.query_id = rd.query_id AND rc.vec_id = rd.vec_id
    ), fused AS (
        SELECT query_id, vec_id,
               CAST(COALESCE(rk_cos, 0) AS BIGINT) AS rk_cos,
               CAST(COALESCE(rk_dot, 0) AS BIGINT) AS rk_dot,
               {dround(f'COALESCE(1.0 / ({RRF_K0} + rk_cos), 0) + COALESCE(1.0 / ({RRF_K0} + rk_dot), 0)', 9)} AS rrf_score
        FROM pool
    )
    SELECT query_id, vec_id, rk_cos, rk_dot, rrf_score,
           CAST(rrf_rank AS BIGINT) AS rrf_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, vec_id
        ) AS rrf_rank
        FROM fused
    ) WHERE rrf_rank <= {RRF_OUT}
    """,
)
def ext_rerank_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, Cormack et al. 2009) of two retrieval
    rankers over the embedding corpus: cosine similarity and raw inner
    product each contribute their top-{RRF_POOL} per query, and candidates
    are re-scored by sum(1 / ({RRF_K0} + rank)) — absent from a ranker
    contributes 0 (rk reported as 0 = "outside that ranker's pool"). This
    is the standard training-free alternative to a cross-encoder rerank
    when fusing heterogeneous retrieval outputs (dense + sparse, multiple
    embedding spaces).

    Determinism: both base ranks order by the 6dp-ROUNDED score with a
    vec_id tiebreak; RRF terms 1/(k0+r) are exact double divisions of
    small integers, so the 2-term sum is bit-identical across engines;
    the fused order ties-break on vec_id.

    Scale shape: the probe side is {RRF_NQ} broadcast rows, so the corpus
    is scanned ONCE computing both scores (the scored table is
    checkpointed for its two window consumers); each window partitions by
    query; the fusion join is over <= 2*{RRF_POOL} rows per query. At
    100 TB the scored table comes from the ANN candidate keys
    (ext_ann_lsh / ext_ann_ivf) instead of a full scan — fusion cost is
    rank-pool-bounded either way. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    emb = load(spark, sf_dir, "embeddings")
    q = sim.with_norm(emb.filter(F.col("vec_id") < RRF_NQ)).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qnorm"),
    )
    c = sim.with_norm(emb).select("vec_id", "_v", "_norm")
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                sim.cosine(F.col("_qv"), F.col("_qnorm"), F.col("_v"), F.col("_norm")), 6
            ).alias("cosine"),
            F.round(sim.dot(F.col("_qv"), F.col("_v")), 6).alias("dotp"),
        )
        .localCheckpoint(eager=False)
    )
    w_cos = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    w_dot = Window.partitionBy("query_id").orderBy(F.desc("dotp"), "vec_id")
    rc = (
        scored.withColumn("rk", F.row_number().over(w_cos))
        .filter(F.col("rk") <= RRF_POOL)
        .select("query_id", "vec_id", F.col("rk").alias("rk_cos"))
    )
    rd = (
        scored.withColumn("rk", F.row_number().over(w_dot))
        .filter(F.col("rk") <= RRF_POOL)
        .select("query_id", "vec_id", F.col("rk").alias("rk_dot"))
    )
    pool = rc.join(rd, ["query_id", "vec_id"], "full_outer")
    fused = pool.select(
        "query_id",
        "vec_id",
        F.coalesce(F.col("rk_cos"), F.lit(0)).cast("bigint").alias("rk_cos"),
        F.coalesce(F.col("rk_dot"), F.lit(0)).cast("bigint").alias("rk_dot"),
        F.round(
            F.coalesce(1.0 / (RRF_K0 + F.col("rk_cos")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K0 + F.col("rk_dot")), F.lit(0.0)),
            9,
        ).alias("rrf_score"),
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "vec_id")
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w_f).cast("bigint"))
        .filter(F.col("rrf_rank") <= RRF_OUT)
    )


ext_rerank_rrf.__doc__ = (
    ext_rerank_rrf.__doc__.replace("{RRF_POOL}", str(RRF_POOL))
    .replace("{RRF_K0}", str(RRF_K0))
    .replace("{RRF_NQ}", str(RRF_NQ))
)


# ---------------------------------------------------------------------------
# ext_text_loss_mask — dedup-aware loss-mask intervals (span-remove's
# training-time complement)
# ---------------------------------------------------------------------------

LM_N = 8  # token n-gram width shared with ext_text_dup_ngram_spans


@register(
    "ext_text_loss_mask",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), sized AS (
        SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n_tokens FROM toks
    ), grams AS (
        SELECT doc_id, i, md5(array_to_string(l[i:i+{LM_N - 1}], ' ')) AS g
        FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - {LM_N - 1})) AS i
              FROM sized WHERE n_tokens >= {LM_N})
    ), dupg AS (
        SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ), spans AS (
        SELECT doc_id, i AS s, i + {LM_N - 1} AS e
        FROM grams JOIN dupg USING (g)
    ), flagged AS (
        SELECT doc_id, s, e,
               CASE WHEN s > COALESCE(MAX(e) OVER (
                        PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), -1) + 1 THEN 1 ELSE 0 END AS new_island
        FROM spans
    ), islands AS (
        SELECT doc_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING
               ) AS mask_id
        FROM flagged
    )
    SELECT doc_id, CAST(mask_id AS BIGINT) AS mask_id,
           CAST(MIN(s) AS BIGINT) AS span_start,
           CAST(MAX(e) AS BIGINT) AS span_end,
           CAST(MAX(e) - MIN(s) + 1 AS BIGINT) AS span_len
    FROM islands GROUP BY doc_id, mask_id
    """,
)
def ext_text_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware loss-mask plan: the training-time COMPLEMENT of
    ext_text_dup_span_remove. Instead of rewriting documents, each
    cross-document duplicate {LM_N}-gram span is kept in the corpus but
    marked for loss masking (tokens still condition the model; their loss
    is zeroed — the standard middle ground when span removal would break
    document coherence). Output is the per-document mask table: maximal
    merged intervals [span_start, span_end] (1-based token positions) of
    tokens under at least one duplicate span.

    Interval merging is the gaps-and-islands pattern: spans sorted by
    start within a doc open a new island exactly when they begin past the
    running MAX(end)+1 (adjacent spans fuse); the island id is the
    running sum of those openings. All-integer arithmetic end to end.

    Scale shape: the duplicate-gram set is the same df-capped md5-keyed
    aggregate as ext_text_dup_ngram_spans (one shuffle on 16-byte keys);
    both merge windows partition BY DOCUMENT and order by span start, so
    window state is bounded by a single document's span count, never the
    corpus. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    n = LM_N
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    # spread() before the tokenize+gram-hash explode: the md5-per-gram
    # pass is the key's heaviest per-row work and otherwise runs in the
    # one-task scan stage of a one-file corpus (§2.5)
    from ..sources.readers import spread

    sized = spread(docs.select("doc_id", "text")).select(
        "doc_id", toks.alias("l"), F.size(toks).cast("bigint").alias("n_tokens")
    )
    grams = (
        sized.filter(F.col("n_tokens") >= n)
        .withColumn(
            "i",
            F.explode(F.sequence(F.lit(1), (F.col("n_tokens") - (n - 1)).cast("int"))),
        )
        .select(
            "doc_id",
            "i",
            F.md5(
                F.concat_ws(" ", F.slice(F.col("l"), F.col("i"), n)).cast("binary")
            ).alias("g"),
        )
    )
    # Cross-document duplicate test WITHOUT replaying the gram pass: a
    # gram spans >= 2 distinct docs iff min(doc_id) < max(doc_id) within
    # its gram group, so the dup decision rides ONE g-keyed window
    # (unordered frame, no sort) instead of the aggregate + self-join
    # that computed the tokenize+md5 explode twice — the same rewrite
    # ext_text_dup_ngram_spans got in r10 (§2.4: two operations keyed the
    # same way share one exchange).
    w_g = Window.partitionBy("g")
    spans = (
        grams.withColumn("_dmin", F.min("doc_id").over(w_g))
        .withColumn("_dmax", F.max("doc_id").over(w_g))
        .filter(F.col("_dmin") < F.col("_dmax"))
        .select(
            "doc_id",
            F.col("i").cast("bigint").alias("s"),
            (F.col("i") + (n - 1)).cast("bigint").alias("e"),
        )
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "new_island",
        (F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1).cast("int"),
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.withColumn(
        "mask_id", F.sum("new_island").over(w_run).cast("bigint")
    )
    return islands.groupBy("doc_id", "mask_id").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        (F.max("e") - F.min("s") + 1).alias("span_len"),
    )


ext_text_loss_mask.__doc__ = ext_text_loss_mask.__doc__.replace("{LM_N}", str(LM_N))


# ---------------------------------------------------------------------------
# ext_corpus_manifest — source -> split -> shard provenance manifest
# ---------------------------------------------------------------------------

MF_SHARDS = 8  # shard fan-out, shared with ext_data_shard


@register(
    "ext_corpus_manifest",
    f"""
    WITH assigned AS (
        SELECT doc_id, source,
               CASE WHEN ({_md5_32("'doc:' || CAST(doc_id AS VARCHAR)")} % 100) < 80 THEN 'train'
                    WHEN ({_md5_32("'doc:' || CAST(doc_id AS VARCHAR)")} % 100) < 90 THEN 'val'
                    ELSE 'test' END AS split,
               {_md5_32("CAST(doc_id AS VARCHAR)")} % {MF_SHARDS} AS shard_id,
               len({_TOKS_SQL}) AS n_tokens,
               {_md5_32("text")} AS content_h
        FROM documents
    )
    SELECT source, split, CAST(shard_id AS BIGINT) AS shard_id,
           source || '/' || split || '/shard-' || CAST(shard_id AS VARCHAR) AS lineage_path,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(content_h) AS BIGINT) AS content_checksum,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM assigned
    GROUP BY source, split, shard_id
    """,
)
def ext_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus lineage/provenance manifest: the source -> split -> shard
    chain a training-data release ships alongside the shards. Every
    document carries its REAL provenance cell — original source, the
    registry's deterministic 80/10/10 split assignment (bit-identical to
    ext_data_split's salted-md5 bucket rule), and its training shard
    (ext_data_shard's md5 rule) — and each cell publishes the manifest
    row a loader validates before consuming: doc/token counts, an
    order-invariant 32-bit-md5 content checksum (summed in 64-bit — no
    overflow below 2^31 docs per cell), the id range, and the
    'source/split/shard-N' lineage path.

    Because split and shard are pure hash expressions of the doc id, the
    manifest is reproducible from the raw corpus alone on any engine —
    provenance does not depend on any run's partitioning or ordering.

    Scale shape: assignment is narrow expressions in the scan; ONE
    aggregate on the (source, split, shard) cell key (bounded:
    sources x 3 x {MF_SHARDS} groups) with map-side partials. Cited
    parity anchor: /root/reference/models (beyond-reference surface)."""
    docs = load(spark, sf_dir, "documents")
    toksz = F.size(tx.tokens(F.col("text")))
    split_bucket = F.pmod(
        _spark_md5_32(F.concat(F.lit("doc:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    assigned = docs.select(
        "doc_id",
        "source",
        F.when(split_bucket < 80, "train")
        .when(split_bucket < 90, "val")
        .otherwise("test")
        .alias("split"),
        (_spark_md5_32(F.col("doc_id").cast("string")) % MF_SHARDS)
        .cast("bigint")
        .alias("shard_id"),
        toksz.cast("bigint").alias("n_tokens"),
        _spark_md5_32(F.col("text")).alias("content_h"),
    )
    return (
        assigned.groupBy("source", "split", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("content_h").cast("bigint").alias("content_checksum"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .select(
            "source",
            "split",
            "shard_id",
            F.concat(
                F.col("source"), F.lit("/"), F.col("split"), F.lit("/shard-"),
                F.col("shard_id").cast("string"),
            ).alias("lineage_path"),
            "n_docs",
            "n_tokens",
            "content_checksum",
            "min_doc_id",
            "max_doc_id",
        )
    )


ext_corpus_manifest.__doc__ = ext_corpus_manifest.__doc__.replace(
    "{MF_SHARDS}", str(MF_SHARDS)
)
