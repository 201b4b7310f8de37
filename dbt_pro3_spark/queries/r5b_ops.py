"""Round-5 second operator batch.

Six named-technique keys closing genuine gaps in the analytics /
LLM-pipeline surface, following the established batch recipe (DuckDB
oracle twin + automatic plan-quality sweep entry + BASELINE.md row in the
same commit):

- ext_fdr_bh            Benjamini-Hochberg + Holm multiple-testing layer
                        over the per-cell mean-shift z battery
- ext_metric_delta_ratio delta-method CI for ratio metrics (the
                        experimentation family's missing member)
- ext_sketch_quantile_bottomk  deterministic mergeable bottom-k quantile
                        sketch with an in-row error audit
- ext_kfold_assign      deterministic stratified k-fold assignment audit
- ext_text_curriculum   curriculum phase plan by composite difficulty
- ext_text_doc_novelty  first-occurrence n-gram novelty per document

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
from .llm_ops import _TOKS_SQL, _md5_32, _spark_md5_32

# ---------------------------------------------------------------------------
# ext_fdr_bh — Benjamini-Hochberg / Holm multiple-testing correction
# ---------------------------------------------------------------------------

FDR_Q = 0.10  # BH false-discovery-rate level
FWER_ALPHA = 0.05  # Holm family-wise error level
FDR_EPOCH = "2024-01-01"  # a Monday; dow = days-since-epoch mod 7


@register(
    "ext_fdr_bh",
    f"""
    WITH ev AS (
        SELECT event_type,
               ((datediff('day', DATE '{FDR_EPOCH}', CAST(ts AS DATE)) % 7) + 7) % 7 AS dow,
               value
        FROM events
    ), g AS (
        SELECT {dround('AVG(value)', 6)} AS mu_all FROM ev
    ), gv AS (
        SELECT {dround('AVG(pow(ev.value - g.mu_all, 2))', 6)} AS var_all
        FROM ev, g
    ), cells AS (
        SELECT ev.event_type, ev.dow,
               CAST(COUNT(*) AS BIGINT) AS n_cell,
               {dround('AVG(ev.value)', 6)} AS mean_cell
        FROM ev GROUP BY ev.event_type, ev.dow
    ), z AS (
        SELECT c.event_type, c.dow, c.n_cell, c.mean_cell,
               {dround('(c.mean_cell - g.mu_all) / sqrt(gv.var_all / c.n_cell)', 4)} AS z_stat
        FROM cells c, g, gv
    ), p AS (
        SELECT *, {dround('2.0 / (1.0 + exp(1.702 * abs(z_stat)))', 6)} AS p_value
        FROM z
    ), ranked AS (
        SELECT *,
               CAST(ROW_NUMBER() OVER (ORDER BY p_value, event_type, dow) AS BIGINT) AS p_rank,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_tests
        FROM p
    ), decided AS (
        SELECT *,
               CAST(MAX(CASE WHEN p_value <= p_rank * {FDR_Q} / n_tests
                             THEN p_rank ELSE 0 END) OVER () AS BIGINT) AS k_star,
               CAST(MIN(CASE WHEN p_value > {FWER_ALPHA} / (n_tests - p_rank + 1)
                             THEN p_rank ELSE n_tests + 1 END) OVER () AS BIGINT) AS first_fail,
               MIN(p_value * n_tests / p_rank) OVER (
                   ORDER BY p_rank DESC ROWS UNBOUNDED PRECEDING
               ) AS qv_raw
        FROM ranked
    )
    SELECT event_type, CAST(dow AS BIGINT) AS dow, n_cell, mean_cell, z_stat,
           p_value, p_rank, n_tests,
           {dround('LEAST(1.0, qv_raw)', 6)} AS q_value,
           CAST(CASE WHEN p_rank <= k_star THEN 1 ELSE 0 END AS INTEGER) AS reject_bh,
           CAST(CASE WHEN p_rank < first_fail THEN 1 ELSE 0 END AS INTEGER) AS reject_holm
    FROM decided
    """,
)
def ext_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing correction layer over a battery of per-cell
    mean-shift z-tests: Benjamini-Hochberg step-up at FDR q={FDR_Q} plus
    Holm step-down at FWER alpha={FWER_ALPHA}, with per-hypothesis BH
    q-values. The hypothesis grid is (event_type, day-of-week) cells —
    each cell's mean event value tested against the global mean with
    z = (mu_cell - mu_all) / sqrt(var_all / n_cell). This is the missing
    layer above the repo's classical-test family (ztest, chi2, KS, ...):
    any battery of them needs FDR control before acting on "significant"
    cells.

    Two-sided p-values use the logistic approximation of the normal CDF,
    p = 2 / (1 + exp(1.702 |z|)) (max abs error < 0.01 vs exact Phi —
    documented approximation; BH/Holm only need a monotone transform of
    |z| plus a comparable scale, which this provides). Float discipline:
    the two-pass centered variance with 6dp-rounded means, z rounded at
    4dp before exp, p at 6dp before every threshold compare; BH/Holm
    thresholds (rank*q/m, alpha/(m-rank+1)) are identical double
    expressions on both engines, so every accept/reject compare sees
    bit-identical operands. q-values are the standard right-to-left
    running min of p*m/rank, clamped at 1.

    Scale shape: two fact-table passes (global mean, then centered
    moments + cells in one aggregate each); everything after that —
    ranking, step-up/step-down scans, q-values — is windows over the
    HYPOTHESIS table, whose row count is the size of the test battery
    (here 5 event types x 7 dows = 35), never the corpus. dow is an exact
    integer datediff from a fixed Monday epoch, engine-portable (no
    locale-dependent DOW function). Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        # pmod, not %: C-style % yields -6..-1 for pre-epoch timestamps,
        # which would label those cells as distinct negative "days of week"
        F.pmod(F.datediff(F.col("ts").cast("date"), F.lit(FDR_EPOCH)), F.lit(7)).alias("dow"),
        "value",
    )
    # r10: the 1-row global mean feeds the variance pass AND the z grid —
    # pinned so its fact scan runs once (plan audit: events 4x -> 3, the
    # two-pass-variance floor: mean pass, moment pass, cell pass)
    g = ev.agg(F.round(F.avg("value"), 6).alias("mu_all")).localCheckpoint(
        eager=False
    )
    dev = ev.crossJoin(F.broadcast(g))
    gv = dev.agg(
        F.round(F.avg(F.pow(F.col("value") - F.col("mu_all"), 2)), 6).alias("var_all")
    )
    cells = ev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cell"),
        F.round(F.avg("value"), 6).alias("mean_cell"),
    )
    z = (
        cells.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(gv))
        .withColumn(
            "z_stat",
            F.round(
                (F.col("mean_cell") - F.col("mu_all"))
                / F.sqrt(F.col("var_all") / F.col("n_cell")),
                4,
            ),
        )
    )
    p = z.withColumn(
        "p_value",
        F.round(2.0 / (1.0 + F.exp(1.702 * F.abs(F.col("z_stat")))), 6),
    )
    w_rank = Window.orderBy("p_value", "event_type", "dow")
    w_all = Window.partitionBy(F.lit(1))
    ranked = p.withColumn(
        "p_rank", F.row_number().over(w_rank).cast("bigint")
    ).withColumn("n_tests", F.count(F.lit(1)).over(w_all).cast("bigint"))
    bh_hit = F.when(
        F.col("p_value") <= F.col("p_rank") * FDR_Q / F.col("n_tests"), F.col("p_rank")
    ).otherwise(F.lit(0))
    holm_fail = F.when(
        F.col("p_value") > FWER_ALPHA / (F.col("n_tests") - F.col("p_rank") + 1),
        F.col("p_rank"),
    ).otherwise(F.col("n_tests") + 1)
    w_desc = (
        Window.orderBy(F.desc("p_rank")).rowsBetween(Window.unboundedPreceding, 0)
    )
    decided = (
        ranked.withColumn("k_star", F.max(bh_hit).over(w_all).cast("bigint"))
        .withColumn("first_fail", F.min(holm_fail).over(w_all).cast("bigint"))
        .withColumn(
            "qv_raw",
            F.min(F.col("p_value") * F.col("n_tests") / F.col("p_rank")).over(w_desc),
        )
    )
    return decided.select(
        "event_type",
        F.col("dow").cast("bigint").alias("dow"),
        "n_cell",
        "mean_cell",
        "z_stat",
        "p_value",
        "p_rank",
        "n_tests",
        F.round(F.least(F.lit(1.0), F.col("qv_raw")), 6).alias("q_value"),
        (F.col("p_rank") <= F.col("k_star")).cast("int").alias("reject_bh"),
        (F.col("p_rank") < F.col("first_fail")).cast("int").alias("reject_holm"),
    )


ext_fdr_bh.__doc__ = ext_fdr_bh.__doc__.replace("{FDR_Q}", str(FDR_Q)).replace(
    "{FWER_ALPHA}", str(FWER_ALPHA)
)


# ---------------------------------------------------------------------------
# ext_metric_delta_ratio — delta-method CI for ratio metrics
# ---------------------------------------------------------------------------

DR_Z = 1.96  # two-sided 95% normal critical value


@register(
    "ext_metric_delta_ratio",
    f"""
    WITH per_user AS (
        SELECT event_type, user_id,
               {dround('SUM(value)', 6)} AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY event_type, user_id
    ), mu AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               {dround('AVG(x)', 6)} AS mu_x,
               {dround('AVG(y)', 6)} AS mu_y
        FROM per_user GROUP BY event_type
    ), mom AS (
        SELECT p.event_type, m.n_users, m.mu_x, m.mu_y,
               {dround('AVG(pow(p.x - m.mu_x, 2))', 6)} AS var_x,
               {dround('AVG(pow(p.y - m.mu_y, 2))', 6)} AS var_y,
               {dround('AVG((p.x - m.mu_x) * (p.y - m.mu_y))', 6)} AS cov_xy
        FROM per_user p JOIN mu m USING (event_type)
        GROUP BY p.event_type, m.n_users, m.mu_x, m.mu_y
    ), est AS (
        SELECT *, {dround('mu_x / mu_y', 6)} AS ratio_mean FROM mom
    ), se AS (
        SELECT *,
               {dround('''sqrt(GREATEST(
                   (var_x - 2.0 * ratio_mean * cov_xy + ratio_mean * ratio_mean * var_y)
                   / (n_users * mu_y * mu_y), 0.0))''', 6)} AS se_delta
        FROM est
    )
    SELECT event_type, n_users, mu_x, mu_y, var_x, var_y, cov_xy, ratio_mean,
           se_delta,
           {dround(f'ratio_mean - {DR_Z} * se_delta', 6)} AS ci_lo,
           {dround(f'ratio_mean + {DR_Z} * se_delta', 6)} AS ci_hi
    FROM se
    """,
)
def ext_metric_delta_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method standard error and 95% CI for RATIO metrics — value
    per event, per event_type, with the user as the randomization unit
    (the standard experimentation read-out for revenue-per-session-style
    metrics, where the naive per-row SE is wrong because rows within a
    user are correlated). R = mean(x_u)/mean(y_u) over per-user totals
    (x = sum of value, y = event count); Var(R) is the first-order Taylor
    expansion (var_x - 2R cov + R^2 var_y) / (n mu_y^2). Completes the
    experimentation family: ext_ab_ztest (mean metrics), ext_ab_srm_check
    (assignment health), ext_ab_power_analysis (planning),
    ext_metric_cuped (variance reduction) — this adds ratio metrics.

    Float discipline: per-user x rounded at 6dp, then the established
    two-pass centered moments with 6dp-rounded means joined back, ratio
    and SE composed from rounded operands in identical expression order
    on both engines, terminal round at 6dp.

    Scale shape: ONE fact-table shuffle keyed (event_type, user) to the
    per-user table (checkpointed for its two consumers), then tiny
    per-metric aggregates; the moments pass broadcasts the 5-row means
    table. The per-user table is |users x metrics|-sized — the natural
    intermediate any experimentation pipeline materializes anyway. Cited
    parity anchor: /root/reference/models (beyond-reference surface)."""
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(
            F.round(F.sum("value"), 6).alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    mu = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("x"), 6).alias("mu_x"),
        F.round(F.avg("y"), 6).alias("mu_y"),
    )
    j = per_user.join(F.broadcast(mu), "event_type")
    dx = F.col("x") - F.col("mu_x")
    dy = F.col("y") - F.col("mu_y")
    mom = j.groupBy("event_type", "n_users", "mu_x", "mu_y").agg(
        F.round(F.avg(dx * dx), 6).alias("var_x"),
        F.round(F.avg(dy * dy), 6).alias("var_y"),
        F.round(F.avg(dx * dy), 6).alias("cov_xy"),
    )
    est = mom.withColumn("ratio_mean", F.round(F.col("mu_x") / F.col("mu_y"), 6))
    r = F.col("ratio_mean")
    var_r = (
        F.col("var_x") - 2.0 * r * F.col("cov_xy") + r * r * F.col("var_y")
    ) / (F.col("n_users") * F.col("mu_y") * F.col("mu_y"))
    se = est.withColumn(
        "se_delta", F.round(F.sqrt(F.greatest(var_r, F.lit(0.0))), 6)
    )
    return se.select(
        "event_type", "n_users", "mu_x", "mu_y", "var_x", "var_y", "cov_xy",
        "ratio_mean", "se_delta",
        F.round(F.col("ratio_mean") - DR_Z * F.col("se_delta"), 6).alias("ci_lo"),
        F.round(F.col("ratio_mean") + DR_Z * F.col("se_delta"), 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# ext_sketch_quantile_bottomk — deterministic mergeable quantile sketch
# ---------------------------------------------------------------------------

QSK_K = 64  # sample size per group (the sketch's memory bound)


@register(
    "ext_sketch_quantile_bottomk",
    f"""
    WITH keyed AS (
        SELECT event_type, event_id, value,
               {_md5_32("'qsk:' || CAST(event_id AS VARCHAR)")} AS hkey
        FROM events
    ), sampled AS (
        SELECT event_type, value
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY event_type ORDER BY hkey, event_id
            ) AS rk
            FROM keyed
        ) WHERE rk <= {QSK_K}
    ), est AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_sample,
               {dround('quantile_cont(value, 0.25)', 6)} AS est_p25,
               {dround('quantile_cont(value, 0.5)', 6)} AS est_p50,
               {dround('quantile_cont(value, 0.75)', 6)} AS est_p75,
               {dround('quantile_cont(value, 0.9)', 6)} AS est_p90
        FROM sampled GROUP BY event_type
    ), exact AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               {dround('quantile_cont(value, 0.25)', 6)} AS exact_p25,
               {dround('quantile_cont(value, 0.5)', 6)} AS exact_p50,
               {dround('quantile_cont(value, 0.75)', 6)} AS exact_p75,
               {dround('quantile_cont(value, 0.9)', 6)} AS exact_p90
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, x.n_rows, e.n_sample,
           e.est_p25, e.est_p50, e.est_p75, e.est_p90,
           x.exact_p25, x.exact_p50, x.exact_p75, x.exact_p90,
           {dround('abs(e.est_p50 - x.exact_p50)', 6)} AS err_p50,
           {dround('abs(e.est_p90 - x.exact_p90)', 6)} AS err_p90
    FROM est e JOIN exact x USING (event_type)
    """,
)
def ext_sketch_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mergeable quantile sketch via coordinated BOTTOM-K
    sampling, with an in-row error audit against the exact quantiles. The
    sketch keeps, per group, the {QSK_K} rows with the smallest md5 hash
    of the row id — a KMV-style coordinated sample: the union of two
    groups' bottom-k sets contains the union's bottom-k, so partial
    sketches merge exactly (the property GK/KLL buy with far more
    machinery). Quantiles are then exact interpolated quantiles OVER THE
    SAMPLE. Unlike ext_approx_quantile (Greenwald-Khanna, contract-
    checked against a rank envelope), this sketch is bit-REPRODUCIBLE on
    any engine — the sample is a pure function of row ids — so the oracle
    hash-checks it exactly; the price is a weaker (probabilistic, not
    guaranteed) rank error, which the emitted err_p50/err_p90 columns
    measure in-engine rather than trust.

    Scale shape: one shuffle per group for the bottom-k rank (at 100 TB
    the same sketch is built with a partial per-partition top-k before
    the shuffle — each executor keeps its local {QSK_K} smallest hashes,
    so the shuffle moves K rows per partition, not the corpus); the exact
    side is the audit and is the expensive path by design (per-group
    sort), dropped in production once the error envelope is accepted.
    Cited parity anchor: /root/reference/models (beyond-reference
    surface)."""
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(
        "event_type",
        "event_id",
        "value",
        _spark_md5_32(
            F.concat(F.lit("qsk:"), F.col("event_id").cast("string"))
        ).alias("hkey"),
    )
    w = Window.partitionBy("event_type").orderBy("hkey", "event_id")
    sampled = (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QSK_K)
        .select("event_type", "value")
    )
    est = sampled.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("est_p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("est_p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("est_p75"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("est_p90"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.percentile("value", F.lit(0.25)), 6).alias("exact_p25"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("exact_p50"),
        F.round(F.percentile("value", F.lit(0.75)), 6).alias("exact_p75"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("exact_p90"),
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_rows", "n_sample",
        "est_p25", "est_p50", "est_p75", "est_p90",
        "exact_p25", "exact_p50", "exact_p75", "exact_p90",
        F.round(F.abs(F.col("est_p50") - F.col("exact_p50")), 6).alias("err_p50"),
        F.round(F.abs(F.col("est_p90") - F.col("exact_p90")), 6).alias("err_p90"),
    )


ext_sketch_quantile_bottomk.__doc__ = ext_sketch_quantile_bottomk.__doc__.replace(
    "{QSK_K}", str(QSK_K)
)


# ---------------------------------------------------------------------------
# ext_kfold_assign — deterministic stratified k-fold assignment audit
# ---------------------------------------------------------------------------

KFOLD_K = 5


@register(
    "ext_kfold_assign",
    f"""
    WITH assigned AS (
        SELECT label,
               {_md5_32("'fold:' || CAST(vec_id AS VARCHAR)")} % {KFOLD_K} AS fold
        FROM embeddings
    ), cells AS (
        SELECT fold, label, CAST(COUNT(*) AS BIGINT) AS n_vecs
        FROM assigned GROUP BY fold, label
    ), tot AS (
        SELECT fold, label, n_vecs,
               CAST(SUM(n_vecs) OVER (PARTITION BY fold) AS BIGINT) AS fold_total,
               CAST(SUM(n_vecs) OVER (PARTITION BY label) AS BIGINT) AS label_total,
               CAST(SUM(n_vecs) OVER () AS BIGINT) AS grand_total
        FROM cells
    )
    SELECT CAST(fold AS BIGINT) AS fold, label, n_vecs, fold_total, label_total,
           {dround('n_vecs * 1.0 / fold_total', 6)} AS share_in_fold,
           {dround('label_total * 1.0 / grand_total', 6)} AS label_share_global,
           {dround('n_vecs * 1.0 / fold_total - label_total * 1.0 / grand_total', 6)} AS balance_dev
    FROM tot
    """,
)
def ext_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment ({KFOLD_K} folds)
    with a stratification audit: fold = md5('fold:' || id) mod K — the
    same salted-hash bucket rule as ext_data_split, so folds are
    reproducible from raw ids on any engine, disjoint, and stable under
    corpus growth (a new row never moves an existing row's fold). The
    output is the fold x label audit grid a training pipeline checks
    before trusting CV numbers: each cell's share within its fold against
    the label's global share, and their deviation (|dev| large = the hash
    landed a label disproportionately in one fold — at small n this is
    expected and the audit QUANTIFIES it instead of assuming balance).

    All shares are exact integer-ratio doubles — no float discipline
    needed beyond the terminal display rounding.

    Scale shape: one narrow hash expression in the scan, ONE aggregate on
    the (fold, label) cell key with map-side partials; the share windows
    run over the K x |labels| audit grid, never the corpus. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    assigned = load(spark, sf_dir, "embeddings").select(
        "label",
        (
            _spark_md5_32(F.concat(F.lit("fold:"), F.col("vec_id").cast("string")))
            % KFOLD_K
        ).alias("fold"),
    )
    cells = assigned.groupBy("fold", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs")
    )
    w_fold = Window.partitionBy("fold")
    w_label = Window.partitionBy("label")
    w_all = Window.partitionBy(F.lit(1))
    tot = (
        cells.withColumn("fold_total", F.sum("n_vecs").over(w_fold).cast("bigint"))
        .withColumn("label_total", F.sum("n_vecs").over(w_label).cast("bigint"))
        .withColumn("grand_total", F.sum("n_vecs").over(w_all).cast("bigint"))
    )
    share = F.col("n_vecs") * 1.0 / F.col("fold_total")
    gshare = F.col("label_total") * 1.0 / F.col("grand_total")
    return tot.select(
        F.col("fold").cast("bigint").alias("fold"),
        "label",
        "n_vecs",
        "fold_total",
        "label_total",
        F.round(share, 6).alias("share_in_fold"),
        F.round(gshare, 6).alias("label_share_global"),
        F.round(share - gshare, 6).alias("balance_dev"),
    )


ext_kfold_assign.__doc__ = ext_kfold_assign.__doc__.replace(
    "{KFOLD_K}", str(KFOLD_K)
)


# ---------------------------------------------------------------------------
# ext_text_curriculum — curriculum phase plan by composite difficulty
# ---------------------------------------------------------------------------

CUR_PHASES = 4
CUR_LEN_CAP = 256  # token-count normalizer cap
CUR_CPT_CAP = 12.0  # chars-per-token normalizer cap


@register(
    "ext_text_curriculum",
    f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct({_TOKS_SQL})) AS BIGINT) AS n_distinct
        FROM documents
    ), d AS (
        SELECT doc_id, n_tokens,
               {dround(f'''0.4 * (LEAST(n_tokens, {CUR_LEN_CAP}) * 1.0 / {CUR_LEN_CAP})
                + 0.3 * (n_distinct * 1.0 / n_tokens)
                + 0.3 * (LEAST(n_chars * 1.0 / n_tokens, {CUR_CPT_CAP}) / {CUR_CPT_CAP})''', 6)}
                   AS difficulty
        FROM t
    )
    SELECT doc_id, n_tokens, difficulty,
           CAST(NTILE({CUR_PHASES}) OVER (ORDER BY difficulty, doc_id) AS INTEGER) AS phase
    FROM d
    """,
)
def ext_text_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering plan: each document gets a composite difficulty
    score and a training phase 1..{CUR_PHASES} (easy -> hard), the data-
    side half of curriculum learning / sequence-length warmup. Difficulty
    = 0.4 * capped length norm + 0.3 * type-token ratio + 0.3 * capped
    chars-per-token norm — longer documents with richer vocabulary and
    longer words sort later. Every component is a ratio of exact integers
    (token count, distinct-token count, char count), so the weighted sum
    is bit-identical across engines before its terminal 6dp round; phases
    are NTILE over (difficulty, doc_id) — balanced and fully tiebroken.

    Scale shape: the features are scan-local array expressions (no
    shuffle); the NTILE rank is the one global sort, which defines the
    exact oracle-checkable semantics — at 100 TB the same plan swaps the
    NTILE for phase cuts from approx_percentile(difficulty), turning the
    sort into one scan + broadcast thresholds with identical downstream
    schema. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    t = docs.select(
        "doc_id",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
    )
    difficulty = F.round(
        0.4 * (F.least(F.col("n_tokens"), F.lit(CUR_LEN_CAP)) * 1.0 / CUR_LEN_CAP)
        + 0.3 * (F.col("n_distinct") * 1.0 / F.col("n_tokens"))
        + 0.3
        * (
            F.least(F.col("n_chars") * 1.0 / F.col("n_tokens"), F.lit(CUR_CPT_CAP))
            / CUR_CPT_CAP
        ),
        6,
    )
    d = t.select("doc_id", "n_tokens", difficulty.alias("difficulty"))
    w = Window.orderBy("difficulty", "doc_id")
    return d.withColumn("phase", F.ntile(CUR_PHASES).over(w))


ext_text_curriculum.__doc__ = ext_text_curriculum.__doc__.replace(
    "{CUR_PHASES}", str(CUR_PHASES)
)


# ---------------------------------------------------------------------------
# ext_text_doc_novelty — first-occurrence n-gram novelty per document
# ---------------------------------------------------------------------------

NOV_N = 8  # token n-gram width, shared with the dup-span/loss-mask family


@register(
    "ext_text_doc_novelty",
    f"""
    WITH sized AS (
        SELECT doc_id, {_TOKS_SQL} AS l,
               CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
        FROM documents
    ), grams AS (
        SELECT DISTINCT doc_id,
               md5(array_to_string(l[i:i+{NOV_N - 1}], ' ')) AS g
        FROM (SELECT doc_id, l,
                     unnest(generate_series(1, len(l) - {NOV_N - 1})) AS i
              FROM sized WHERE n_tokens >= {NOV_N})
    ), firstdoc AS (
        SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT grams.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = grams.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           {dround('SUM(CASE WHEN f.first_doc = grams.doc_id THEN 1 ELSE 0 END) * 1.0 / COUNT(*)', 6)} AS novelty_ratio
    FROM grams JOIN firstdoc f USING (g)
    GROUP BY grams.doc_id
    """,
)
def ext_text_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence n-gram novelty per document: for each doc's set of
    distinct {NOV_N}-token shingles, the fraction whose corpus-wide FIRST
    occurrence (minimum doc_id — the corpus's canonical ingestion order)
    is this document. Low novelty = the document contributes almost
    nothing the corpus hasn't already seen — the attribution-style
    pruning signal that complements the dup-span family: dup_ngram_spans
    says WHERE text repeats, novelty says WHICH documents are redundant
    wholesale and can be dropped from a token budget first. Documents
    shorter than {NOV_N} tokens have no shingles and are absent (no
    novelty to measure).

    All-integer counts; the ratio is an exact integer division with a
    terminal display round.

    Scale shape: distinct (doc, gram) pairs on 16-byte md5 keys (the
    dup-span family's key discipline), one aggregate for first-occurrence
    per gram, one equi-join back on the gram hash, one per-doc aggregate
    — every stage hash-partitions by the gram or doc key; no all-pairs
    structure anywhere. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    n = NOV_N
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    sized = docs.select(
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
            F.md5(
                F.concat_ws(" ", F.slice(F.col("l"), F.col("i"), n)).cast("binary")
            ).alias("g"),
        )
        .distinct()
    )
    firstdoc = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.join(firstdoc, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") * 1.0 / F.count(F.lit(1)), 6
            ).alias("novelty_ratio"),
        )
    )


ext_text_doc_novelty.__doc__ = ext_text_doc_novelty.__doc__.replace(
    "{NOV_N}", str(NOV_N)
)
