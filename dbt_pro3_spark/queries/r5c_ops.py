"""Round-5 third operator batch.

Five named-technique keys, batch recipe as always (oracle twin + automatic
plan-quality sweep + BASELINE row in the same commit):

- ext_eval_pass_at_k     the unbiased pass@k estimator (Chen et al. 2021)
- ext_feature_woe_iv     weight-of-evidence / information-value screen
- ext_stat_wasserstein_1d  exact 1-D earth-mover distance on a bounded grid
- ext_embed_matryoshka_audit  dimension-truncation retrieval-quality audit
- ext_data_epoch_order   deterministic per-epoch loader-order plan

Cited parity anchor: /root/reference/models (beyond-reference surface —
the reference's dbt project defines no analytics beyond its 12 models;
these keys extend the engine the way its Databricks warehouse would be
used downstream).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ext import similarity as sim
from ..sources.readers import load
from . import dround, register
from .llm_ops import _md5_32, _spark_md5_32
from .r4e_ops import _dec, _vd

# ---------------------------------------------------------------------------
# ext_eval_pass_at_k — unbiased pass@k estimator
# ---------------------------------------------------------------------------

PAK_K = 10  # the k of pass@k
PAK_T = 100.0  # per-sample success threshold on value


def _pak_lnsum_sql() -> str:
    """Unrolled fixed-order sum of ln((n-c-i)/(n-i)), i = 0..k-1."""
    return " + ".join(
        f"ln((n - c - {i}) * 1.0 / (n - {i}))" for i in range(PAK_K)
    )


@register(
    "ext_eval_pass_at_k",
    f"""
    WITH per AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN value >= {PAK_T} THEN 1 ELSE 0 END) AS BIGINT) AS c
        FROM events GROUP BY user_id
    )
    SELECT user_id, n AS n_samples, c AS n_success,
           {dround('c * 1.0 / n', 6)} AS pass_at_1,
           CASE WHEN n - c < {PAK_K} THEN 1.0
                ELSE {dround(f'1.0 - exp({_pak_lnsum_sql()})', 6)} END AS pass_at_k
    FROM per WHERE n >= {PAK_K}
    """,
)
def ext_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbiased pass@k estimator (Chen et al. 2021, the HumanEval
    metric): per task (user), given n attempted samples of which c
    succeed (value >= {PAK_T}), pass@k = 1 - C(n-c, k)/C(n, k) — the
    probability at least one of k drawn samples succeeds, computed
    WITHOUT enumerating subsets via the telescoped product
    prod_{{i=0..k-1}} (n-c-i)/(n-i). The standard eval readout for any
    sampled-generation benchmark; pass@1 (the plain success rate) rides
    along. Tasks with fewer than k samples are excluded (the estimator
    is undefined there).

    Determinism: the product is evaluated as exp of an UNROLLED
    fixed-order {PAK_K}-term sum of ln of exact integer ratios —
    identical literal expression trees on both engines, so the fold
    order cannot drift; n-c < k short-circuits to exactly 1.0 before
    any float math; c = 0 gives ln-sum 0 -> pass@k exactly 0 after the
    round.

    Scale shape: ONE conditional aggregate keyed by task with map-side
    partials, then pure per-row expressions — no joins, no windows, no
    second pass. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    per = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("value") >= PAK_T, 1).otherwise(0))
            .cast("bigint")
            .alias("c"),
        )
        .filter(F.col("n") >= PAK_K)
    )
    n, c = F.col("n"), F.col("c")
    lnsum = reduce(
        lambda acc, i: acc + F.log(((n - c - F.lit(i)) * 1.0) / (n - F.lit(i))),
        range(1, PAK_K),
        F.log(((n - c - F.lit(0)) * 1.0) / (n - F.lit(0))),
    )
    return per.select(
        "user_id",
        n.alias("n_samples"),
        c.alias("n_success"),
        F.round(c * 1.0 / n, 6).alias("pass_at_1"),
        F.when(n - c < PAK_K, F.lit(1.0))
        .otherwise(F.round(1.0 - F.exp(lnsum), 6))
        .alias("pass_at_k"),
    )


ext_eval_pass_at_k.__doc__ = ext_eval_pass_at_k.__doc__.replace(
    "{PAK_K}", str(PAK_K)
).replace("{PAK_T}", str(PAK_T))


# ---------------------------------------------------------------------------
# ext_feature_woe_iv — weight of evidence / information value
# ---------------------------------------------------------------------------

WOE_BIN = 50000  # fixed-width value band on o_totalprice
WOE_BAD = "F"  # the "bad" outcome class (finished orders here)


@register(
    "ext_feature_woe_iv",
    f"""
    WITH b AS (
        SELECT CAST(FLOOR(o_totalprice / {WOE_BIN}) AS BIGINT) AS bucket,
               CAST(SUM(CASE WHEN o_orderstatus = '{WOE_BAD}' THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
               CAST(SUM(CASE WHEN o_orderstatus = '{WOE_BAD}' THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
        FROM orders GROUP BY 1
    ), t AS (
        SELECT *,
               CAST(SUM(n_good) OVER () AS BIGINT) AS goods,
               CAST(SUM(n_bad) OVER () AS BIGINT) AS bads,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_buckets
        FROM b
    ), w AS (
        SELECT *,
               (n_good + 0.5) / (goods + 0.5 * n_buckets) AS pg,
               (n_bad + 0.5) / (bads + 0.5 * n_buckets) AS pb
        FROM t
    )
    SELECT bucket, n_good, n_bad,
           {dround('pg', 6)} AS pct_good,
           {dround('pb', 6)} AS pct_bad,
           {dround('ln(pg / pb)', 6)} AS woe,
           {dround('(pg - pb) * ln(pg / pb)', 6)} AS iv_contrib,
           {dround('SUM((pg - pb) * ln(pg / pb)) OVER ()', 6)} AS iv_total
    FROM w
    """,
)
def ext_feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature screen (the classic
    credit-scoring univariate): band the candidate feature (order value,
    fixed {WOE_BIN}-wide bands), count good/bad outcomes per band
    (bad = status '{WOE_BAD}'), and emit WOE = ln(pct_good/pct_bad) per
    band plus each band's IV contribution and the feature's total IV
    (rule of thumb: IV < 0.02 useless, > 0.3 strong). Laplace-smoothed
    with 0.5 per cell so empty cells cannot produce ln(0) — the standard
    adjusted-WOE form. Complements ext_feature_mi (which screens via
    mutual information): WOE additionally gives the per-band DIRECTION
    and the monotonicity read a scorecard needs.

    Determinism: pg/pb are exact-double ratios of integer counts (+0.5
    halves are exact); ln at 1 ulp lands inside the 6dp terminal round;
    iv_total sums <= ~10 per-band terms.

    Scale shape: one conditional aggregate to the bounded band grid
    (price range / {WOE_BIN} cells, corpus-size-independent), then
    grid-sized windows. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    b = (
        load(spark, sf_dir, "orders")
        .select(
            F.floor(F.col("o_totalprice") / WOE_BIN).cast("bigint").alias("bucket"),
            F.when(F.col("o_orderstatus") == WOE_BAD, 0).otherwise(1).alias("ig"),
            F.when(F.col("o_orderstatus") == WOE_BAD, 1).otherwise(0).alias("ib"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("ig").cast("bigint").alias("n_good"),
            F.sum("ib").cast("bigint").alias("n_bad"),
        )
    )
    w_all = Window.partitionBy(F.lit(1))
    t = (
        b.withColumn("goods", F.sum("n_good").over(w_all).cast("bigint"))
        .withColumn("bads", F.sum("n_bad").over(w_all).cast("bigint"))
        .withColumn("n_buckets", F.count(F.lit(1)).over(w_all).cast("bigint"))
    )
    pg = (F.col("n_good") + 0.5) / (F.col("goods") + 0.5 * F.col("n_buckets"))
    pb = (F.col("n_bad") + 0.5) / (F.col("bads") + 0.5 * F.col("n_buckets"))
    contrib = (pg - pb) * F.log(pg / pb)
    return t.select(
        "bucket",
        "n_good",
        "n_bad",
        F.round(pg, 6).alias("pct_good"),
        F.round(pb, 6).alias("pct_bad"),
        F.round(F.log(pg / pb), 6).alias("woe"),
        F.round(contrib, 6).alias("iv_contrib"),
        F.round(F.sum(contrib).over(w_all), 6).alias("iv_total"),
    )


ext_feature_woe_iv.__doc__ = ext_feature_woe_iv.__doc__.replace(
    "{WOE_BIN}", str(WOE_BIN)
).replace("{WOE_BAD}", WOE_BAD)


# ---------------------------------------------------------------------------
# ext_stat_wasserstein_1d — exact 1-D earth-mover distance, bounded grid
# ---------------------------------------------------------------------------

W1_A = "purchase"
W1_B = "click"
W1_BIN = 1.0  # grid width on value


@register(
    "ext_stat_wasserstein_1d",
    f"""
    WITH cells AS (
        SELECT CAST(FLOOR(value / {W1_BIN}) AS BIGINT) AS g,
               CAST(SUM(CASE WHEN event_type = '{W1_A}' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN event_type = '{W1_B}' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        FROM events WHERE event_type IN ('{W1_A}', '{W1_B}')
        GROUP BY 1
    ), cum AS (
        SELECT g,
               CAST(SUM(ca) OVER (ORDER BY g) AS BIGINT) AS ma,
               CAST(SUM(cb) OVER (ORDER BY g) AS BIGINT) AS mb,
               LEAD(g) OVER (ORDER BY g) AS g_next
        FROM cells
    ), nn AS (
        SELECT MAX(ma) AS na, MAX(mb) AS nb FROM cum
    ), s AS (
        SELECT CAST(SUM(CAST(ABS(c.ma * n.nb - c.mb * n.na) AS HUGEINT)
                        * (c.g_next - c.g)) AS HUGEINT) AS ssum
        FROM cum c CROSS JOIN nn n WHERE c.g_next IS NOT NULL
    )
    SELECT n.na AS n_a, n.nb AS n_b,
           {dround(f"{_vd('s.ssum')} * {W1_BIN} / (CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE))", 6)} AS w1_distance
    FROM s CROSS JOIN nn n
    """,
)
def ext_stat_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1-D Wasserstein-1 (earth-mover) distance between the
    '{W1_A}' and '{W1_B}' value distributions on a bounded {W1_BIN}-wide
    grid: W1 = integral |F_A - F_B| = sum over occupied cells of
    |CDF gap| x (distance to the next occupied cell). Completes the
    two-sample family with the TRANSPORT-cost view: KS sees the max CDF
    gap, CvM/AD the (weighted) squared gap, PSI a binned likelihood
    ratio — W1 is the one that weighs HOW FAR mass must move, the metric
    behind distribution-shift SLAs.

    Determinism (the CvM/AD integer-grid discipline): per-cell CDF gaps
    stay the exact integer |ma*nb - mb*na|, weighted by the exact
    integer cell gap, accumulated in decimal(38,0)/HUGEINT, divided by
    na*nb exactly once with the engine-portable VARCHAR-routed
    conversion. No float accumulates anywhere.

    Scale shape: one conditional aggregate down to the bounded grid
    (value range / {W1_BIN} cells, corpus-size-independent), a
    grid-sized cumulative window, and a scalar fold. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type").isin(W1_A, W1_B))
    cells = (
        ev.select(
            F.floor(F.col("value") / W1_BIN).cast("bigint").alias("g"),
            F.when(F.col("event_type") == W1_A, 1).otherwise(0).alias("ia"),
            F.when(F.col("event_type") == W1_B, 1).otherwise(0).alias("ib"),
        )
        .groupBy("g")
        .agg(
            F.sum("ia").cast("bigint").alias("ca"),
            F.sum("ib").cast("bigint").alias("cb"),
        )
        # r10: the bounded grid feeds the totals scalar, the transport fold
        # and the report — pinned so the corpus collapse runs once (plan
        # audit: 3 events scans -> 1; the _spark_grid discipline)
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, 0)
    cum = cells.select(
        "g",
        F.sum("ca").over(w).cast("bigint").alias("ma"),
        F.sum("cb").over(w).cast("bigint").alias("mb"),
        F.lead("g").over(Window.orderBy("g")).alias("g_next"),
    )
    nn = cum.agg(F.max("ma").alias("na"), F.max("mb").alias("nb"))
    gap = F.abs(F.col("ma") * F.col("nb") - F.col("mb") * F.col("na"))
    s = (
        cum.filter(F.col("g_next").isNotNull())
        .crossJoin(F.broadcast(nn))
        .select((_dec(gap) * (F.col("g_next") - F.col("g"))).alias("t"))
        .agg(F.sum("t").cast("decimal(38,0)").alias("ssum"))
    )
    w1 = (
        F.col("ssum").cast("double")
        * W1_BIN
        / (F.col("na").cast("double") * F.col("nb").cast("double"))
    )
    return s.crossJoin(F.broadcast(nn)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(w1, 6).alias("w1_distance"),
    )


ext_stat_wasserstein_1d.__doc__ = (
    ext_stat_wasserstein_1d.__doc__.replace("{W1_A}", W1_A)
    .replace("{W1_B}", W1_B)
    .replace("{W1_BIN}", str(W1_BIN))
)


# ---------------------------------------------------------------------------
# ext_embed_matryoshka_audit — dimension-truncation retrieval audit
# ---------------------------------------------------------------------------

MAT_D = 16  # truncated prefix dimensionality (of 64)
MAT_K = 5  # retrieval depth compared
MAT_NQ = 10  # probe queries: vec_id < MAT_NQ


@register(
    "ext_embed_matryoshka_audit",
    f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               (embedding::DOUBLE[])[1:{MAT_D}] AS vt
        FROM embeddings
    ), q AS (
        SELECT vec_id AS query_id, v AS qv, vt AS qvt FROM e
        WHERE vec_id < {MAT_NQ}
    ), full_rk AS (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                   {dround('list_cosine_similarity(qv, v)', 6)} DESC, vec_id) AS rk
        FROM q JOIN e ON vec_id <> query_id
    ), trunc_rk AS (
        SELECT query_id, vec_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
                   {dround('list_cosine_similarity(qvt, vt)', 6)} DESC, vec_id) AS rk
        FROM q JOIN e ON vec_id <> query_id
    )
    SELECT f.query_id,
           CAST({MAT_K} AS BIGINT) AS k,
           CAST(COUNT(t.vec_id) AS BIGINT) AS n_overlap,
           {dround(f'COUNT(t.vec_id) * 1.0 / {MAT_K}', 6)} AS overlap_at_k
    FROM (SELECT * FROM full_rk WHERE rk <= {MAT_K}) f
    LEFT JOIN (SELECT * FROM trunc_rk WHERE rk <= {MAT_K}) t
      ON f.query_id = t.query_id AND f.vec_id = t.vec_id
    GROUP BY f.query_id
    """,
)
def ext_embed_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation audit: how much of full-dim
    retrieval survives when vectors are truncated to their first {MAT_D}
    of 64 dimensions (the MRL deployment question — can the cheap prefix
    index serve first-stage retrieval?). For each probe query, top-{MAT_K}
    by 64-dim cosine vs top-{MAT_K} by {MAT_D}-dim cosine of the SAME
    corpus, reporting overlap@k. Low overlap = these embeddings were not
    trained matryoshka-style and prefix truncation reorders retrieval;
    the audit quantifies it per query instead of assuming.

    Both rankings order by the 6dp-rounded cosine with a vec_id tiebreak
    (the house retrieval determinism contract); overlap is an exact
    integer ratio.

    Scale shape: the probe side is {MAT_NQ} broadcast rows; the corpus
    is scanned once per ranking (prefix slice is a narrow projection —
    at 100 TB the truncated index IS the separately-stored small copy);
    per-query windows; the overlap join is over 2x{MAT_K} rows per
    query. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    emb = load(spark, sf_dir, "embeddings")
    trunc = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, MAT_D).alias("embedding")
    )

    def topk(corpus: DataFrame) -> DataFrame:
        c = sim.with_norm(corpus).select("vec_id", "_v", "_norm")
        q = sim.with_norm(corpus.filter(F.col("vec_id") < MAT_NQ)).select(
            F.col("vec_id").alias("query_id"),
            F.col("_v").alias("_qv"),
            F.col("_norm").alias("_qnorm"),
        )
        scored = c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).select(
            "query_id",
            "vec_id",
            F.round(
                sim.cosine(F.col("_qv"), F.col("_qnorm"), F.col("_v"), F.col("_norm")),
                6,
            ).alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= MAT_K)
            .select("query_id", "vec_id")
        )

    f = topk(emb)
    t = topk(trunc).withColumnRenamed("vec_id", "t_vec_id")
    return (
        f.join(
            t,
            (f["query_id"] == t["query_id"]) & (f["vec_id"] == t["t_vec_id"]),
            "left",
        )
        .groupBy(f["query_id"].alias("query_id"))
        .agg(
            F.lit(MAT_K).cast("bigint").alias("k"),
            F.count("t_vec_id").cast("bigint").alias("n_overlap"),
            F.round(F.count("t_vec_id") * 1.0 / MAT_K, 6).alias("overlap_at_k"),
        )
    )


ext_embed_matryoshka_audit.__doc__ = (
    ext_embed_matryoshka_audit.__doc__.replace("{MAT_D}", str(MAT_D))
    .replace("{MAT_K}", str(MAT_K))
    .replace("{MAT_NQ}", str(MAT_NQ))
)


# ---------------------------------------------------------------------------
# ext_data_epoch_order — deterministic per-epoch loader-order plan
# ---------------------------------------------------------------------------

EPOCH_N = 2  # training epochs planned
EPOCH_SHARDS = 8  # shard fan-out, shared with ext_data_shard


@register(
    "ext_data_epoch_order",
    f"""
    WITH docs AS (
        SELECT doc_id,
               {_md5_32("CAST(doc_id AS VARCHAR)")} % {EPOCH_SHARDS} AS shard_id
        FROM documents
    ), expanded AS (
        SELECT CAST(e AS BIGINT) AS epoch, doc_id, CAST(shard_id AS BIGINT) AS shard_id,
               {_md5_32("'epoch:' || CAST(e AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")} AS order_key
        FROM docs, unnest(generate_series(0, {EPOCH_N - 1})) AS t(e)
    )
    SELECT epoch, shard_id, doc_id, order_key,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY epoch, shard_id ORDER BY order_key, doc_id
           ) AS BIGINT) AS position
    FROM expanded
    """,
)
def ext_data_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch loader-order plan: "don't reshuffle 100 TB
    between epochs — re-KEY it". Every document keeps its stable shard
    (ext_data_shard's md5 rule, so shard files never move) and gets, per
    epoch, a fresh epoch-salted order key md5('epoch:' || e || ':' || id)
    and its 1-based position within (epoch, shard). A data loader sorts
    each shard by the epoch's key locally and gets a different, globally
    reproducible permutation every epoch — no cross-shard shuffle, no RNG
    state, resumable mid-epoch from (shard, position) alone.

    All-integer/hash arithmetic; no float discipline needed.

    Scale shape: the epoch expansion is a bounded explode (x{EPOCH_N});
    ranking partitions BY (epoch, shard) — window state is one shard's
    documents, the exact unit a loader sorts in memory anyway; no global
    sort at any size. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        (_spark_md5_32(F.col("doc_id").cast("string")) % EPOCH_SHARDS)
        .cast("bigint")
        .alias("shard_id"),
    )
    expanded = docs.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.lit(EPOCH_N - 1)))
    ).withColumn("epoch", F.col("epoch").cast("bigint")).withColumn(
        "order_key",
        _spark_md5_32(
            F.concat(
                F.lit("epoch:"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ),
    )
    w = Window.partitionBy("epoch", "shard_id").orderBy("order_key", "doc_id")
    return expanded.select(
        "epoch",
        "shard_id",
        "doc_id",
        "order_key",
        F.row_number().over(w).cast("bigint").alias("position"),
    )


ext_data_epoch_order.__doc__ = ext_data_epoch_order.__doc__.replace(
    "{EPOCH_N}", str(EPOCH_N)
)
