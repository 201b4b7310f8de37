"""Round-5 fourth operator batch.

Four named-technique keys (batch recipe: oracle twin + automatic
plan-quality sweep + BASELINE row in the same commit):

- ext_calibration_temperature  temperature-scaling calibration scan
                               (Guo et al. 2017)
- ext_causal_ipw_ate           inverse-propensity-weighted ATE (Hájek)
- ext_sample_negatives_plan    word2vec unigram^0.75 negative-sampling table
- ext_text_canary_scan         canary-string exposure probe

Cited parity anchor: /root/reference/models (beyond-reference surface —
the reference's dbt project defines no analytics beyond its 12 models;
these keys extend the engine the way its Databricks warehouse would be
used downstream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ext import text as tx
from ..sources.readers import load
from . import dround, register

# ---------------------------------------------------------------------------
# ext_calibration_temperature — temperature-scaling scan
# ---------------------------------------------------------------------------

# Every grid temperature is EXACTLY representable as a double (quarters and
# halves), so logit/T is the identical IEEE division on both engines.
TEMP_GRID = (0.25, 0.5, 0.75, 1.0, 1.5, 2.0, 3.0)
TEMP_EPS = 0.0005  # lower clamp on the pseudo-probability (pm = 0 rows)


def _temp_tag(t: float) -> str:
    return str(t).replace(".", "_")


def _temp_agg_sql() -> str:
    cols = []
    for t in TEMP_GRID:
        tag = _temp_tag(t)
        pt = f"1.0 / (1.0 + exp(-(logit / CAST({t} AS DOUBLE))))"
        cols.append(
            f"{dround(f'AVG(-(y * ln({pt}) + (1 - y) * ln(1.0 - {pt})))', 6)} AS nll_{tag}"
        )
        cols.append(
            f"{dround(f'AVG(({pt} - y) * ({pt} - y))', 6)} AS brier_{tag}"
        )
    return ",\n               ".join(cols)


def _temp_union_sql() -> str:
    rows = [
        f"SELECT CAST({t} AS DOUBLE) AS temperature, nll_{_temp_tag(t)} AS nll,"
        f" brier_{_temp_tag(t)} AS brier FROM a"
        for t in TEMP_GRID
    ]
    return " UNION ALL ".join(rows)


@register(
    "ext_calibration_temperature",
    f"""
    WITH r AS (
        SELECT CAST(ROUND(l_discount * 1000) AS BIGINT) AS pm,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ), s AS (
        SELECT y, ln(p / (1.0 - p)) AS logit
        FROM (SELECT y, GREATEST(pm / 1000.0, {TEMP_EPS}) AS p FROM r)
    ), a AS (
        SELECT {_temp_agg_sql()}
        FROM s
    ), stacked AS (
        {_temp_union_sql()}
    )
    SELECT temperature, nll, brier,
           CAST(ROW_NUMBER() OVER (ORDER BY nll, temperature) AS BIGINT) AS rank_by_nll,
           CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY nll, temperature) = 1
                THEN 1 ELSE 0 END AS INTEGER) AS is_best
    FROM stacked
    """,
)
def ext_calibration_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaling calibration scan (Guo et al. 2017): treating
    the milli-unit discount as a pseudo-probability of return (the
    ext_eval_calibration setup) and the return flag as the label, rescale
    every score's logit by each temperature in a fixed grid and report
    NLL and Brier per temperature, ranking by NLL — the post-hoc
    single-parameter calibration fit, done as a grid scan instead of
    LBFGS because a monotone 1-parameter NLL only needs a bounded sweep.
    T > 1 softens over-confident scores, T < 1 sharpens; rank 1 is the
    temperature a serving layer would deploy.

    Determinism: every grid temperature is EXACTLY representable as a
    double (quarters/halves), so logit/T is the identical IEEE division
    on both engines; per-temperature NLL/Brier are single AVG aggregates
    rounded at 6dp (the established discipline); the best-T pick
    compares ROUNDED NLLs with a temperature tiebreak.

    Scale shape: ONE fact-table scan computes all {{len(TEMP_GRID)}}x2
    aggregates map-side-combined (no per-temperature row blowup); the
    stack/rank runs over the {{len(TEMP_GRID)}}-row grid. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    pm = F.round(F.col("l_discount") * 1000).cast("bigint")
    y = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    p = F.greatest(pm / 1000.0, F.lit(TEMP_EPS))
    s = li.select(y.alias("y"), F.log(p / (1.0 - p)).alias("logit"))
    aggs = []
    for t in TEMP_GRID:
        tag = _temp_tag(t)
        pt = 1.0 / (1.0 + F.exp(-(F.col("logit") / F.lit(t))))
        aggs.append(
            F.round(
                F.avg(
                    -(
                        F.col("y") * F.log(pt)
                        + (1 - F.col("y")) * F.log(1.0 - pt)
                    )
                ),
                6,
            ).alias(f"nll_{tag}")
        )
        aggs.append(
            F.round(F.avg((pt - F.col("y")) * (pt - F.col("y"))), 6).alias(
                f"brier_{tag}"
            )
        )
    a = s.agg(*aggs).localCheckpoint(eager=False)  # len(TEMP_GRID) consumers
    stacked = None
    for t in TEMP_GRID:
        tag = _temp_tag(t)
        row = a.select(
            F.lit(float(t)).alias("temperature"),
            F.col(f"nll_{tag}").alias("nll"),
            F.col(f"brier_{tag}").alias("brier"),
        )
        stacked = row if stacked is None else stacked.unionByName(row)
    w = Window.orderBy("nll", "temperature")
    return stacked.withColumn(
        "rank_by_nll", F.row_number().over(w).cast("bigint")
    ).withColumn("is_best", (F.col("rank_by_nll") == 1).cast("int"))


# ---------------------------------------------------------------------------
# ext_causal_ipw_ate — inverse-propensity-weighted ATE (Hájek estimator)
# ---------------------------------------------------------------------------

IPW_SPLIT = "2024-01-16"  # pre/post boundary (events span 2024-01)
# Frozen propensity weights (the ext_quality_logistic discipline: a fixed,
# documented linear model rather than an in-engine fit): logit(e) =
# W0 + W1*(n_pre - 33) + W2*(v_pre - 50) keeps e within ~[0.25, 0.65] on
# the driver corpus — overlap holds, no weight explodes.
IPW_W0 = -0.3
IPW_W1 = 0.04
IPW_W2 = 0.01


@register(
    "ext_causal_ipw_ate",
    f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INTEGER) AS treat,
               CAST(SUM(CASE WHEN ts < TIMESTAMP '{IPW_SPLIT}' THEN 1 ELSE 0 END) AS BIGINT) AS n_pre,
               {dround(f"AVG(CASE WHEN ts < TIMESTAMP '{IPW_SPLIT}' THEN value END)", 6)} AS v_pre,
               {dround(f"AVG(CASE WHEN ts >= TIMESTAMP '{IPW_SPLIT}' THEN value END)", 6)} AS y
        FROM events GROUP BY user_id
    ), scored AS (
        SELECT *,
               {dround(f'1.0 / (1.0 + exp(-({IPW_W0} + {IPW_W1} * (n_pre - 33.0) + {IPW_W2} * (v_pre - 50.0))))', 6)} AS e
        FROM per_user WHERE n_pre > 0 AND y IS NOT NULL
    )
    SELECT CAST(SUM(treat) AS BIGINT) AS n_treat,
           CAST(SUM(1 - treat) AS BIGINT) AS n_ctrl,
           {dround('AVG(CASE WHEN treat = 1 THEN e END)', 6)} AS mean_prop_treat,
           {dround('AVG(CASE WHEN treat = 1 THEN y END) - AVG(CASE WHEN treat = 0 THEN y END)', 6)} AS ate_naive,
           {dround('''SUM(CASE WHEN treat = 1 THEN y / e END) / SUM(CASE WHEN treat = 1 THEN 1.0 / e END)
                    - SUM(CASE WHEN treat = 0 THEN y / (1.0 - e) END) / SUM(CASE WHEN treat = 0 THEN 1.0 / (1.0 - e) END)''', 6)} AS ate_ipw,
           {dround('''pow(SUM(CASE WHEN treat = 1 THEN 1.0 / e END), 2)
                    / SUM(CASE WHEN treat = 1 THEN 1.0 / (e * e) END)''', 2)} AS ess_treat,
           {dround('''pow(SUM(CASE WHEN treat = 0 THEN 1.0 / (1.0 - e) END), 2)
                    / SUM(CASE WHEN treat = 0 THEN 1.0 / ((1.0 - e) * (1.0 - e)) END)''', 2)} AS ess_ctrl
    FROM scored
    """,
)
def ext_causal_ipw_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect, Hájek
    (self-normalized) form: per-user pre-period covariates (event count,
    mean value before {IPW_SPLIT}) feed a FROZEN logistic propensity
    (the ext_quality_logistic discipline — fixed documented weights, not
    an in-engine fit), and the post-period mean value is reweighted by
    1/e vs 1/(1-e) within deterministic hash arms. Emits the naive
    difference alongside the IPW estimate (their gap is the measured
    selection-on-covariates correction) plus Kish effective sample sizes
    per arm — the overlap diagnostic that says whether any weight has
    blown up. Completes the causal family: DID (ext_promo_effect_did),
    RDD, QTE, Shapley attribution — this adds the propensity-weighting
    member.

    Float discipline: per-user averages and the propensity are rounded
    at 6dp, so every weighted sum folds bit-identical operands; the
    weighted-sum ratios compose in identical expression order and round
    terminally.

    Scale shape: one conditional aggregate keyed by user, then ONE
    scalar conditional-aggregate pass over the users-sized table —
    no joins, no windows. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    split = F.lit(IPW_SPLIT).cast("timestamp")
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pre"),
            F.round(F.avg(F.when(F.col("ts") < split, F.col("value"))), 6).alias(
                "v_pre"
            ),
            F.round(F.avg(F.when(F.col("ts") >= split, F.col("value"))), 6).alias(
                "y"
            ),
        )
        .withColumn("treat", (F.col("user_id") % 2).cast("int"))
    )
    scored = per_user.filter(
        (F.col("n_pre") > 0) & F.col("y").isNotNull()
    ).withColumn(
        "e",
        F.round(
            1.0
            / (
                1.0
                + F.exp(
                    -(
                        IPW_W0
                        + IPW_W1 * (F.col("n_pre") - 33.0)
                        + IPW_W2 * (F.col("v_pre") - 50.0)
                    )
                )
            ),
            6,
        ),
    )
    t, y, e = F.col("treat"), F.col("y"), F.col("e")
    sum_t = lambda expr: F.sum(F.when(t == 1, expr))  # noqa: E731
    sum_c = lambda expr: F.sum(F.when(t == 0, expr))  # noqa: E731
    return scored.agg(
        F.sum(t).cast("bigint").alias("n_treat"),
        F.sum(1 - t).cast("bigint").alias("n_ctrl"),
        F.round(F.avg(F.when(t == 1, e)), 6).alias("mean_prop_treat"),
        F.round(
            F.avg(F.when(t == 1, y)) - F.avg(F.when(t == 0, y)), 6
        ).alias("ate_naive"),
        F.round(
            sum_t(y / e) / sum_t(1.0 / e)
            - sum_c(y / (1.0 - e)) / sum_c(1.0 / (1.0 - e)),
            6,
        ).alias("ate_ipw"),
        F.round(
            F.pow(sum_t(1.0 / e), 2) / sum_t(1.0 / (e * e)), 2
        ).alias("ess_treat"),
        F.round(
            F.pow(sum_c(1.0 / (1.0 - e)), 2)
            / sum_c(1.0 / ((1.0 - e) * (1.0 - e))),
            2,
        ).alias("ess_ctrl"),
    )


ext_causal_ipw_ate.__doc__ = ext_causal_ipw_ate.__doc__.replace(
    "{IPW_SPLIT}", IPW_SPLIT
)


# ---------------------------------------------------------------------------
# ext_sample_negatives_plan — unigram^0.75 negative-sampling table
# ---------------------------------------------------------------------------

NS_V = 500  # retained vocabulary size
NS_POW = 0.75  # the word2vec smoothing exponent
NS_SALTS = 32  # level-1 hash buckets for the two-level top-K prune


@register(
    "ext_sample_negatives_plan",
    f"""
    WITH vocab AS (
        SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
              FROM documents)
        GROUP BY t
    ), topv AS (
        SELECT token, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank
        FROM vocab
        QUALIFY rank <= {NS_V}
    ), wtd AS (
        SELECT token, cnt, rank,
               {dround(f'pow(cnt, {NS_POW})', 6)} AS weight
        FROM topv
    ), tot AS (
        SELECT *, {dround('SUM(weight) OVER ()', 6)} AS tot_w FROM wtd
    ), probs AS (
        SELECT token, cnt, rank, weight,
               {dround('weight / tot_w', 9)} AS p_neg
        FROM tot
    )
    SELECT token, cnt, rank, weight, p_neg,
           {dround('SUM(p_neg) OVER (ORDER BY rank)', 9)} AS cum_p
    FROM probs
    """,
)
def ext_sample_negatives_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-sampling distribution table (the word2vec unigram^{NS_POW}
    rule): the top-{NS_V} vocabulary by frequency, each token weighted
    count^{NS_POW} (flattens the head so frequent tokens aren't sampled
    quite proportionally), normalized to p_neg, with the cumulative
    boundary column a sampler binary-searches at draw time — the
    precomputed table every contrastive/embedding training loop ships to
    its workers. Deterministic end to end: same corpus -> same table,
    no RNG anywhere (draws happen training-side against cum_p).

    Float discipline: pow and its sum are rounded at 6dp, p_neg at 9dp;
    cum_p is an ORDERED prefix sum of the rounded p_neg values, so both
    engines fold identical operands in identical order.

    Scale shape: one token-count shuffle (map-side combined); the
    global top-{NS_V} uses the two-level ranking (a {NS_SALTS}-bucket
    local top-K prunes the vocab to <= {NS_SALTS}x{NS_V} rows before the
    single-partition ranking window — the ext_text_vocab_coverage
    pattern, no vocab-wide hot partition); everything after runs on the
    {NS_V}-row plan table. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(tx.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # two-level top-K: local prune per hash bucket, then the global rank
    bucketed = vocab.withColumn("b", F.pmod(F.xxhash64("token"), F.lit(NS_SALTS)))
    w_local = Window.partitionBy("b").orderBy(F.desc("cnt"), "token")
    pruned = (
        bucketed.withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= NS_V)
        .drop("b", "lrk")
    )
    w_global = Window.orderBy(F.desc("cnt"), "token")
    topv = (
        pruned.withColumn("rank", F.row_number().over(w_global).cast("bigint"))
        .filter(F.col("rank") <= NS_V)
    )
    wtd = topv.withColumn("weight", F.round(F.pow(F.col("cnt"), NS_POW), 6))
    w_all = Window.partitionBy(F.lit(1))
    tot = wtd.withColumn("tot_w", F.round(F.sum("weight").over(w_all), 6))
    probs = tot.withColumn(
        "p_neg", F.round(F.col("weight") / F.col("tot_w"), 9)
    )
    w_cum = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return probs.select(
        "token",
        "cnt",
        "rank",
        "weight",
        "p_neg",
        F.round(F.sum("p_neg").over(w_cum), 9).alias("cum_p"),
    )


ext_sample_negatives_plan.__doc__ = (
    ext_sample_negatives_plan.__doc__.replace("{NS_V}", str(NS_V))
    .replace("{NS_POW}", str(NS_POW))
    .replace("{NS_SALTS}", str(NS_SALTS))
)


# ---------------------------------------------------------------------------
# ext_text_canary_scan — canary-string exposure probe
# ---------------------------------------------------------------------------

# Probe strings: three high/medium-frequency corpus terms standing in for
# leaked strings whose exposure is being measured, plus one true canary
# that must come back zero (the scan's own negative control).
CANARIES = ("join", "customer", "checkpoint", "canary-x9q7-7f3a")


@register(
    "ext_text_canary_scan",
    f"""
    WITH canaries AS (
        SELECT * FROM (VALUES {", ".join(f"('{c}')" for c in CANARIES)}) AS t(canary)
    ), hits AS (
        SELECT c.canary, d.doc_id,
               CAST((length(d.text) - length(replace(d.text, c.canary, '')))
                    / length(c.canary) AS BIGINT) AS occ
        FROM documents d CROSS JOIN canaries c
    )
    SELECT canary,
           CAST(SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
           CAST(SUM(occ) AS BIGINT) AS n_hits,
           {dround('SUM(CASE WHEN occ > 0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)', 6)} AS doc_rate
    FROM hits GROUP BY canary
    """,
)
def ext_text_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary-string exposure probe (the Carlini-style memorization
    audit's data-side half): count, for each probe string, how many
    documents contain it and how many times in total. Three probes are
    real corpus terms standing in for strings whose leakage is being
    measured; the fourth is a true canary that MUST return zero — the
    scan's own negative control. Distinct from ext_text_decontaminate
    (benchmark n-gram overlap): canaries are exact literal strings, and
    the count uses exact substring arithmetic
    (len(text) - len(remove(text, c))) / len(c) — all-integer, no
    tokenization dependence, overlapping-free occurrence count.

    Scale shape: the canary list is a broadcast literal table; ONE
    corpus scan evaluates every canary per document (narrow string
    expressions, no shuffle of text), then a canary-keyed aggregate over
    integer counts. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    spark_canaries = spark.createDataFrame(
        [(c,) for c in CANARIES], "canary string"
    )
    docs = load(spark, sf_dir, "documents")
    occ = (
        (
            F.length(F.col("text"))
            - F.length(F.replace(F.col("text"), F.col("canary"), F.lit("")))
        )
        / F.length(F.col("canary"))
    ).cast("bigint")
    hits = docs.crossJoin(F.broadcast(spark_canaries)).select(
        "canary", occ.alias("occ")
    )
    return hits.groupBy("canary").agg(
        F.sum(F.when(F.col("occ") > 0, 1).otherwise(0)).cast("bigint").alias("n_docs"),
        F.sum("occ").cast("bigint").alias("n_hits"),
        F.round(
            F.sum(F.when(F.col("occ") > 0, 1).otherwise(0)) * 1.0 / F.count(F.lit(1)),
            6,
        ).alias("doc_rate"),
    )
