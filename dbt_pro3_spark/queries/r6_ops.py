"""Round-6 operator batch: evaluation metrics (exact average precision /
best-F1, completing the eval family next to ext_eval_auc), preference-data
construction (Bradley-Terry strengths, DPO chosen/rejected pairs — the
RLHF-dataset primitives), and corpus statistics (Good-Turing smoothing).

Coverage discipline: candidates conceptually covered by existing registry
keys were dropped before landing (exact ROC AUC == ext_eval_auc, CUPED ==
ext_metric_cuped, Theil-Sen == ext_theilsen_trend, MAD outliers ==
ext_outlier_mad, FD audit == ext_fd_discovery, triangles ==
ext_graph_triangles) — new keys must add operators, not fixtures.

Beyond-reference surface (the reference's dbt project defines no analytics
beyond its 12 models — /root/reference/models); these extend the engine the
way its warehouse would be used downstream for ML-evaluation and
training-data pipelines.

House rules every key follows (hard-won in rounds 4-5):
- oracle output lanes are BIGINT/DOUBLE/VARCHAR only (DuckDB SUM widens to
  HUGEINT and DECIMAL output demotes to lossy float64 in the pandas fetch —
  both hash-miss classes; tests/test_oracle_types.py lints);
- money/metric doubles go through the exact-cents BIGINT route before any
  aggregation, so every sum is integer-exact and the only float ops are
  terminal single divisions (bit-identical cross-engine), then dround(6);
- float accumulations that cannot be integerized fold IN ARRAY ORDER on
  both engines (Spark F.aggregate == DuckDB ordered-list list_reduce);
- global windows run over GRID-sized intermediates (distinct scores, month
  grid, pair lattice), never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load
from . import dround, register
from .llm_ops import _TOKS_SQL, _md5_32, _spark_md5_32

_CENTS_SQL = "CAST(ROUND(value * 100) AS BIGINT)"


def _cents(col: str = "value") -> F.Column:
    return F.round(F.col(col) * 100, 0).cast("bigint")


# ---------------------------------------------------------------------------
# ext_pr_average_precision — exact average precision + best F1 per type
# ---------------------------------------------------------------------------


@register(
    "ext_pr_average_precision",
    f"""
    WITH ev AS (
        SELECT event_type, {_CENTS_SQL} AS cents FROM events
    ), g AS (
        SELECT cents, CAST(COUNT(*) AS BIGINT) AS n_all FROM ev GROUP BY 1
    ), gc AS (
        SELECT cents,
               CAST(SUM(n_all) OVER (ORDER BY cents DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_all
        FROM g
    ), t AS (
        SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n_t
        FROM ev GROUP BY 1, 2
    ), tc AS (
        SELECT event_type, cents, n_t,
               CAST(SUM(n_t) OVER (PARTITION BY event_type ORDER BY cents DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tp
        FROM t
    ), joined AS (
        SELECT tc.event_type, tc.cents, tc.n_t, tc.cum_tp, gc.cum_all,
               CAST(tc.n_t * tc.cum_tp AS DOUBLE) / gc.cum_all AS ap_term
        FROM tc JOIN gc USING (cents)
    ), pos AS (
        SELECT event_type, CAST(SUM(n_t) AS BIGINT) AS n_pos
        FROM t GROUP BY 1
    ), folded AS (
        SELECT event_type,
               list_reduce(list(ap_term ORDER BY cents), (a, x) -> a + x)
                   AS ap_num,
               MAX(2.0 * cum_tp / (cum_all + n_pos2)) AS max_f1_raw
        FROM (SELECT j.*, p.n_pos AS n_pos2
              FROM joined j JOIN pos p USING (event_type))
        GROUP BY 1
    )
    SELECT f.event_type, p.n_pos,
           {dround('f.ap_num / p.n_pos', 6)} AS average_precision,
           {dround('f.max_f1_raw', 6)} AS max_f1
    FROM folded f JOIN pos p USING (event_type)
    """,
)
def ext_pr_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (area under the precision-recall curve by the
    step-wise AP definition: sum over descending thresholds of
    deltaRecall * Precision) plus the best achievable F1, one event type vs
    rest scored by `value` — the class-imbalance-robust companion to
    ext_eval_auc (AP degrades when positives are rare; AUC doesn't).

    Determinism: each AP term is one exact-integer product divided once
    (bit-identical cross-engine); the term SUM folds IN GRID ORDER on both
    engines (Spark sort_array + F.aggregate == DuckDB ordered-list
    list_reduce), so the accumulated double is bit-reproducible before its
    terminal dround. F1 at threshold s is the single-division integer ratio
    2*tp / (predicted + positives); MAX over thresholds is order-free.

    Scale shape: two map-side-combined aggregates onto the distinct-score
    grid (the ext_eval_auc discipline); the fold runs
    over the per-type grid array (~18k doubles), never the corpus."""
    ev = load(spark, sf_dir, "events").select("event_type", _cents().alias("cents"))
    # r10: events is scanned ONCE (the ext_kruskal_wallis rewrite) — the
    # (type, cents) grid is pinned, and the global cents grid collapses out
    # of it (sum of per-type counts per cell ≡ the global cell count)
    # instead of a second corpus aggregate (plan audit: 3 events scans -> 1)
    t = ev.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    ).localCheckpoint(eager=False)
    g = t.groupBy("cents").agg(F.sum("n_t").cast("bigint").alias("n_all"))
    wg = Window.orderBy(F.desc("cents")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gc = g.select("cents", F.sum("n_all").over(wg).cast("bigint").alias("cum_all"))
    wt = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("cents"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tc = t.withColumn("cum_tp", F.sum("n_t").over(wt).cast("bigint"))
    pos = t.groupBy("event_type").agg(F.sum("n_t").cast("bigint").alias("n_pos"))
    joined = (
        tc.join(gc, "cents")
        .join(F.broadcast(pos), "event_type")
        .select(
            "event_type",
            "cents",
            "n_pos",
            ((F.col("n_t") * F.col("cum_tp")).cast("double") / F.col("cum_all")).alias(
                "ap_term"
            ),
            (
                F.lit(2.0) * F.col("cum_tp") / (F.col("cum_all") + F.col("n_pos"))
            ).alias("f1_raw"),
        )
    )
    folded = joined.groupBy("event_type").agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("cents", "ap_term"))),
                lambda s: s["ap_term"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("ap_num"),
        F.max("f1_raw").alias("max_f1_raw"),
        F.first("n_pos").alias("n_pos"),
    )
    return folded.select(
        "event_type",
        "n_pos",
        F.round(F.col("ap_num") / F.col("n_pos"), 6).alias("average_precision"),
        F.round("max_f1_raw", 6).alias("max_f1"),
    )


# ---------------------------------------------------------------------------
# ext_good_turing — Good-Turing frequency-of-frequencies smoothing
# ---------------------------------------------------------------------------

GT_MAX_R = 10
GT_N = 3  # word n-gram order: the fixture vocab is tiny (31 unigrams, all
# frequent), so the species space with a rare tail — where Good-Turing is
# meaningful — is the 3-gram space (~16k species at sf0.01, counts 1..8)


@register(
    "ext_good_turing",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), grams AS (
        SELECT md5(array_to_string(l[i:i+{GT_N - 1}], ' ')) AS tok
        FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - {GT_N - 1})) AS i
              FROM toks WHERE len(l) >= {GT_N})
    ), cnt AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS r FROM grams GROUP BY 1
    ), fof AS (
        SELECT r, CAST(COUNT(*) AS BIGINT) AS n_r FROM cnt GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(r * n_r) AS BIGINT) AS n_tokens FROM fof
    ), grid AS (
        SELECT r, n_r,
               LEAD(r) OVER (ORDER BY r) AS r_next,
               LEAD(n_r) OVER (ORDER BY r) AS n_r_next
        FROM fof
    )
    SELECT g.r, g.n_r,
           {dround("CASE WHEN g.r_next = g.r + 1"
                   " THEN (g.r + 1.0) * g.n_r_next / g.n_r ELSE 0.0 END", 6)}
               AS r_star,
           {dround('CAST(g.r * g.n_r AS DOUBLE) / tot.n_tokens', 6)}
               AS mass_share
    FROM grid g, tot WHERE g.r <= {GT_MAX_R}
    """,
)
def ext_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing smoothing table over the corpus word-3-gram counts: for
    each observed frequency r <= 10, the species count N_r and the GT
    adjusted count r* = (r+1) * N_(r+1) / N_r — the classical estimator of
    how much probability mass the unseen/rare tail deserves (the r=1 row's
    mass_share is the Good-Turing estimate of UNSEEN-species mass, the
    number an LM-smoothing/vocab decision needs before committing).

    Exactness: gram counts and frequency-of-frequencies are exact integer
    aggregates; r* and mass_share are single divisions of exact integers
    (bit-identical), then dround. A gap in the r sequence (N_(r+1) = 0)
    yields r* = 0 — the raw GT estimator's honest degenerate value.

    Scale shape: narrow sequence+explode gram fan-out (the dup_ngram_spans
    idiom: 16-byte md5 shuffle keys) -> two map-side-combined aggregates
    (gram counts, then frequency-of-frequencies — the second input is
    species-sized); the LEAD window runs over the tiny r-grid."""
    from ..ext import text as tx

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(tx.tokens(F.col("text")).alias("l")).filter(
        F.size("l") >= GT_N
    )
    grams = toks.withColumn(
        "i", F.explode(F.sequence(F.lit(1), (F.size("l") - (GT_N - 1)).cast("int")))
    ).select(
        F.md5(
            F.concat_ws(" ", F.slice(F.col("l"), F.col("i"), GT_N)).cast("binary")
        ).alias("tok")
    )
    cnt = grams.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    fof = cnt.groupBy("r").agg(F.count(F.lit(1)).cast("bigint").alias("n_r"))
    tot = fof.agg(F.sum(F.col("r") * F.col("n_r")).cast("bigint").alias("n_tokens"))
    w = Window.orderBy("r")
    grid = fof.select(
        "r",
        "n_r",
        F.lead("r").over(w).alias("r_next"),
        F.lead("n_r").over(w).alias("n_r_next"),
    )
    return (
        grid.filter(F.col("r") <= GT_MAX_R)
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.round(
                F.when(
                    F.col("r_next") == F.col("r") + 1,
                    (F.col("r") + 1.0) * F.col("n_r_next") / F.col("n_r"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("r_star"),
            F.round(
                (F.col("r") * F.col("n_r")).cast("double") / F.col("n_tokens"), 6
            ).alias("mass_share"),
        )
    )


# ---------------------------------------------------------------------------
# ext_pref_bradley_terry — Bradley-Terry strengths from pairwise preferences
# ---------------------------------------------------------------------------

BT_TYPES = ["click", "error", "purchase", "signup", "view"]
BT_ITERS = 5


def _bt_pairs() -> list[tuple[str, str]]:
    return [
        (a, b) for i, a in enumerate(BT_TYPES) for b in BT_TYPES[i + 1:]
    ]


def _bt_oracle() -> str:
    """Generate the unrolled MM-iteration oracle SQL. The per-user spend
    pivot and pair counts are exact integers; each MM iteration is a fixed
    scalar expression DAG over ONE wide row (terms emitted in sorted type
    order on both engines), so every float op sequence is bit-identical."""
    spend = ",\n               ".join(
        f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN {_CENTS_SQL} END), 0) AS BIGINT) AS s_{t}"
        for t in BT_TYPES
    )
    npairs = ",\n               ".join(
        f"CAST(SUM(CASE WHEN s_{a} <> s_{b} THEN 1 ELSE 0 END) AS BIGINT) AS n_{a}_{b}"
        for a, b in _bt_pairs()
    )
    wpairs = ",\n               ".join(
        f"CAST(SUM(CASE WHEN s_{a} > s_{b} THEN 1 ELSE 0 END) AS BIGINT) AS w_{a}_{b}"
        for a, b in _bt_pairs()
    )

    def n_of(a: str, b: str) -> str:
        return f"n_{a}_{b}" if (a, b) in _bt_pairs() else f"n_{b}_{a}"

    def wins(t: str) -> str:
        terms = []
        for a, b in _bt_pairs():
            if a == t:
                terms.append(f"w_{a}_{b}")
            elif b == t:
                terms.append(f"(n_{a}_{b} - w_{a}_{b})")
        return " + ".join(terms)

    base_cols = (
        [f"n_{a}_{b}" for a, b in _bt_pairs()]
        + [f"CAST({wins(t)} AS BIGINT) AS w_{t}" for t in BT_TYPES]
    )
    sql = f"""
    WITH spend AS (
        SELECT user_id,
               {spend}
        FROM events GROUP BY 1
    ), counts AS (
        SELECT {npairs},
               {wpairs}
        FROM spend
    ), it0 AS (
        SELECT {', '.join(base_cols)},
               {', '.join(f'0.2 AS p_{t}' for t in BT_TYPES)}
        FROM counts
    )"""
    carry = [f"n_{a}_{b}" for a, b in _bt_pairs()] + [f"w_{t}" for t in BT_TYPES]
    prev = "it0"
    for k in range(1, BT_ITERS + 1):
        q_exprs = []
        for t in BT_TYPES:
            den = " + ".join(
                f"{n_of(t, u)} / (p_{t} + p_{u})" for u in BT_TYPES if u != t
            )
            q_exprs.append(f"w_{t} / ({den}) AS q_{t}")
        norm = " + ".join(f"q_{t}" for t in BT_TYPES)
        sql += f""", q{k} AS (
        SELECT {', '.join(carry)}, {', '.join(q_exprs)} FROM {prev}
    ), it{k} AS (
        SELECT {', '.join(carry)},
               {', '.join(f'q_{t} / ({norm}) AS p_{t}' for t in BT_TYPES)}
        FROM q{k}
    )"""
        prev = f"it{k}"
    rows = " UNION ALL ".join(
        f"SELECT '{t}' AS event_type, w_{t} AS wins, "
        f"CAST({' + '.join(n_of(t, u) for u in BT_TYPES if u != t)} AS BIGINT)"
        f" AS n_comparisons, "
        f"{dround(f'p_{t}', 6)} AS strength FROM {prev}"
        for t in BT_TYPES
    )
    return sql + "\n    " + rows


@register("ext_pref_bradley_terry", _bt_oracle())
def ext_pref_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over event types: each user's
    per-type spend forms pairwise preferences (type a "beats" type b for a
    user when the user spent strictly more on a), and 5 fixed
    minorization-maximization iterations fit the BT model
    P(a beats b) = p_a / (p_a + p_b) — the construction behind
    RLHF/preference-dataset quality audits (are preferences transitive
    enough for a scalar reward model?) and pairwise-ranked eval leaderboards.

    Determinism: pair win/decisive counts are exact integer aggregates; the
    MM recursion runs on ONE wide row with per-type scalar expressions whose
    terms are emitted in sorted type order on BOTH engines — every float
    op sequence is identical, so the fixed-point after 5 iterations is
    bit-reproducible before its terminal dround.

    Scale shape: ONE user-keyed shuffle builds the spend pivot; the pair
    counts are a map-side-combined scalar aggregate (10 integer columns);
    the iterations touch a single row — corpus size is irrelevant to them."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", _cents().alias("cents")
    )
    spend = ev.groupBy("user_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("event_type") == t, F.col("cents"))), F.lit(0)
            )
            .cast("bigint")
            .alias(f"s_{t}")
            for t in BT_TYPES
        ]
    )
    pair_aggs = []
    for a, b in _bt_pairs():
        pair_aggs.append(
            F.sum(F.when(F.col(f"s_{a}") != F.col(f"s_{b}"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{a}_{b}")
        )
        pair_aggs.append(
            F.sum(F.when(F.col(f"s_{a}") > F.col(f"s_{b}"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"w_{a}_{b}")
        )
    counts = spend.agg(*pair_aggs)

    def n_of(a: str, b: str) -> str:
        return f"n_{a}_{b}" if (a, b) in _bt_pairs() else f"n_{b}_{a}"

    wins_cols = []
    for t in BT_TYPES:
        terms = None
        for a, b in _bt_pairs():
            term = None
            if a == t:
                term = F.col(f"w_{a}_{b}")
            elif b == t:
                term = F.col(f"n_{a}_{b}") - F.col(f"w_{a}_{b}")
            if term is not None:
                terms = term if terms is None else terms + term
        wins_cols.append(terms.cast("bigint").alias(f"w_{t}"))
    state = counts.select("*", *wins_cols).withColumns(
        {f"p_{t}": F.lit(0.2) for t in BT_TYPES}
    )
    for _ in range(BT_ITERS):
        q_cols = {}
        for t in BT_TYPES:
            den = None
            for u in BT_TYPES:
                if u == t:
                    continue
                term = F.col(n_of(t, u)) / (F.col(f"p_{t}") + F.col(f"p_{u}"))
                den = term if den is None else den + term
            q_cols[f"q_{t}"] = F.col(f"w_{t}") / den
        state = state.withColumns(q_cols)
        norm = None
        for t in BT_TYPES:
            norm = F.col(f"q_{t}") if norm is None else norm + F.col(f"q_{t}")
        state = state.withColumns(
            {f"p_{t}": F.col(f"q_{t}") / norm for t in BT_TYPES}
        ).drop(*[f"q_{t}" for t in BT_TYPES])
    # r10: emit the 5 report rows by exploding an array of structs over the
    # single state row — the prior 5-way unionByName planned the whole
    # events-scan + user-pivot + MM-iteration subtree once PER BRANCH
    report = F.array(
        *[
            F.struct(
                F.lit(t).alias("event_type"),
                F.col(f"w_{t}").alias("wins"),
                sum(
                    (F.col(n_of(t, u)) for u in BT_TYPES if u != t),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("n_comparisons"),
                F.round(F.col(f"p_{t}"), 6).alias("strength"),
            )
            for t in BT_TYPES
        ]
    )
    return state.select(F.explode(report).alias("r")).select(
        "r.event_type", "r.wins", "r.n_comparisons", "r.strength"
    )


# ---------------------------------------------------------------------------
# ext_dpo_pair_build — chosen/rejected preference-pair construction
# ---------------------------------------------------------------------------


@register(
    "ext_dpo_pair_build",
    f"""
    WITH ev AS (
        SELECT user_id, event_id, event_type, {_CENTS_SQL} AS cents
        FROM events
    ), best AS (
        SELECT user_id, event_id, event_type, cents FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY cents DESC, event_id) AS rn FROM ev
        ) WHERE rn = 1
    ), worst AS (
        SELECT user_id, event_id, event_type, cents FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY cents, event_id) AS rn FROM ev
        ) WHERE rn = 1
    )
    SELECT b.user_id,
           b.event_id AS chosen_event_id,
           w.event_id AS rejected_event_id,
           b.event_type AS chosen_type,
           w.event_type AS rejected_type,
           {dround('(b.cents - w.cents) / 100.0', 6)} AS reward_margin
    FROM best b JOIN worst w USING (user_id)
    WHERE b.cents > w.cents
    """,
)
def ext_dpo_pair_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference-pair construction: per prompt group (user), pick
    the highest-reward completion as `chosen` and the lowest as `rejected`
    (reward = value; ties broken by event_id so the pair is unique), drop
    groups with zero margin — the standard best-vs-worst pairing that turns
    scored generations into direct-preference-optimization training rows.

    Exactness: rewards compare as exact cents integers; the margin is one
    integer difference divided once, then dround. Window tie-breaks are
    total orders (cents, event_id).

    Scale shape: two partition-parallel windows keyed by the prompt group
    (the natural DPO shuffle key) and one group-keyed equi-join of two
    1-row-per-group tables — no global ordering anywhere."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", _cents().alias("cents")
    )
    wb = Window.partitionBy("user_id").orderBy(F.desc("cents"), F.asc("event_id"))
    ww = Window.partitionBy("user_id").orderBy(F.asc("cents"), F.asc("event_id"))
    best = (
        ev.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("chosen_event_id"),
            F.col("event_type").alias("chosen_type"),
            F.col("cents").alias("c_ch"),
        )
    )
    worst = (
        ev.withColumn("rn", F.row_number().over(ww))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("rejected_event_id"),
            F.col("event_type").alias("rejected_type"),
            F.col("cents").alias("c_rj"),
        )
    )
    return (
        best.join(worst, "user_id")
        .filter(F.col("c_ch") > F.col("c_rj"))
        .select(
            "user_id",
            "chosen_event_id",
            "rejected_event_id",
            "chosen_type",
            "rejected_type",
            F.round((F.col("c_ch") - F.col("c_rj")) / 100.0, 6).alias(
                "reward_margin"
            ),
        )
    )




# ---------------------------------------------------------------------------
# ext_kruskal_wallis — k-sample rank test (H with tie correction)
# ---------------------------------------------------------------------------

KW_TYPES = ["click", "error", "purchase", "signup", "view"]


def _kw_oracle() -> str:
    pick_n = ", ".join(
        f"CAST(MAX(CASE WHEN event_type = '{t}' THEN n_pos END) AS BIGINT) AS n_{t}"
        for t in KW_TYPES
    )
    pick_r = ", ".join(
        f"CAST(MAX(CASE WHEN event_type = '{t}' THEN r2 END) AS BIGINT) AS r2_{t}"
        for t in KW_TYPES
    )
    term = " + ".join(
        f"(CAST(r2_{t} AS DOUBLE) / 2.0) * (CAST(r2_{t} AS DOUBLE) / 2.0) / n_{t}"
        for t in KW_TYPES
    )
    h = f"(12.0 / (CAST(n AS DOUBLE) * (n + 1.0)) * ({term}) - 3.0 * (n + 1.0))"
    c = "(1.0 - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))"
    return f"""
    WITH ev AS (
        SELECT event_type, {_CENTS_SQL} AS cents FROM events
    ), g AS (
        SELECT cents, CAST(COUNT(*) AS BIGINT) AS n_all FROM ev GROUP BY 1
    ), gc AS (
        SELECT cents, n_all,
               CAST(COALESCE(SUM(n_all) OVER (ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS below_all
        FROM g
    ), t AS (
        SELECT event_type, cents, CAST(COUNT(*) AS BIGINT) AS n_t
        FROM ev GROUP BY 1, 2
    ), pg AS (
        SELECT t.event_type,
               CAST(SUM(t.n_t) AS BIGINT) AS n_pos,
               CAST(SUM(t.n_t * (2 * gc.below_all + gc.n_all + 1)) AS BIGINT)
                   AS r2
        FROM t JOIN gc USING (cents) GROUP BY 1
    ), wide AS (
        SELECT {pick_n}, {pick_r} FROM pg
    ), s AS (
        SELECT CAST(SUM(n_all) AS BIGINT) AS n,
               CAST(SUM(n_all * n_all * n_all - n_all) AS BIGINT) AS tie3
        FROM g
    )
    SELECT s.n AS n_events, CAST({len(KW_TYPES)} AS BIGINT) AS k_groups,
           {dround(h, 6)} AS h_stat,
           {dround(f"{h} / {c}", 6)} AS h_adj,
           {dround(f"({h} - {len(KW_TYPES)} + 1.0) / (s.n - {len(KW_TYPES)})", 6)}
               AS epsilon_sq
    FROM wide, s
    """


@register("ext_kruskal_wallis", _kw_oracle())
def ext_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test: do the k event types draw `value` from the
    same distribution? The nonparametric k-sample ANOVA (rank-based, no
    normality assumption) with the standard tie correction and the
    epsilon-squared effect size — the gate before trusting any per-type
    mean comparison on skewed metrics. Completes the rank-test family
    (two_sample_ks, rank_effect_stats, jonckheere_trend, friedman_test)
    with the unordered-k-sample case.

    Exactness: rank sums use the doubled-midrank identity on the exact
    cents grid (2*midrank = 2*below + ties + 1), so every R_g is an exact
    BIGINT; H folds the five per-group terms in sorted type order on both
    engines (identical float op sequence), and the tie term sum(t^3 - t) is
    an exact integer.

    Scale shape: the same two grid aggregates as ext_eval_auc (corpus
    scanned once, projected to 2 columns); the H arithmetic runs on ONE
    wide row."""
    ev = load(spark, sf_dir, "events").select("event_type", _cents().alias("cents"))
    # r10: events is scanned ONCE — the (type, cents) grid is pinned and the
    # global cents grid collapses out of it (sum of per-type counts per cell
    # ≡ the global cell count) instead of a second corpus aggregate; g stays
    # unpinned (its two consumers replay only a grid-sized fold over the
    # pinned t — no corpus scan). Plan audit: 3 events scans -> 1.
    t = ev.groupBy("event_type", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    ).localCheckpoint(eager=False)
    g = t.groupBy("cents").agg(
        F.sum("n_t").cast("bigint").alias("n_all")
    )
    wg = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    gc = g.withColumn(
        "below_all", F.coalesce(F.sum("n_all").over(wg), F.lit(0)).cast("bigint")
    )
    pg = (
        t.join(gc, "cents")
        .groupBy("event_type")
        .agg(
            F.sum("n_t").cast("bigint").alias("n_pos"),
            F.sum(
                F.col("n_t") * (2 * F.col("below_all") + F.col("n_all") + 1)
            )
            .cast("bigint")
            .alias("r2"),
        )
    )
    wide = pg.agg(
        *[
            F.max(F.when(F.col("event_type") == t_, F.col("n_pos")))
            .cast("bigint")
            .alias(f"n_{t_}")
            for t_ in KW_TYPES
        ],
        *[
            F.max(F.when(F.col("event_type") == t_, F.col("r2")))
            .cast("bigint")
            .alias(f"r2_{t_}")
            for t_ in KW_TYPES
        ],
    )
    s = g.agg(
        F.sum("n_all").cast("bigint").alias("n"),
        F.sum(F.col("n_all") * F.col("n_all") * F.col("n_all") - F.col("n_all"))
        .cast("bigint")
        .alias("tie3"),
    )
    row = wide.crossJoin(F.broadcast(s))
    nd = F.col("n").cast("double")
    term = None
    for t_ in KW_TYPES:
        r2d = F.col(f"r2_{t_}").cast("double")
        piece = (r2d / 2.0) * (r2d / 2.0) / F.col(f"n_{t_}")
        term = piece if term is None else term + piece
    h = 12.0 / (nd * (nd + 1.0)) * term - 3.0 * (nd + 1.0)
    c = 1.0 - F.col("tie3").cast("double") / (nd * nd * nd - nd)
    k = len(KW_TYPES)
    return row.select(
        F.col("n").alias("n_events"),
        F.lit(k).cast("bigint").alias("k_groups"),
        F.round(h, 6).alias("h_stat"),
        F.round(h / c, 6).alias("h_adj"),
        F.round((h - k + 1.0) / (F.col("n") - k), 6).alias("epsilon_sq"),
    )


# ---------------------------------------------------------------------------
# ext_fleiss_kappa — multi-rater agreement over median-split ratings
# ---------------------------------------------------------------------------

FK_TYPES = ["click", "error", "purchase", "signup", "view"]
FK_M = len(FK_TYPES)


@register(
    "ext_fleiss_kappa",
    f"""
    WITH ev AS (
        SELECT user_id, event_type, {_CENTS_SQL} AS cents FROM events
    ), tot AS (
        SELECT user_id, event_type, CAST(SUM(cents) AS BIGINT) AS t
        FROM ev GROUP BY 1, 2
    ), users AS (
        SELECT DISTINCT user_id FROM ev
    ), grid AS (
        SELECT u.user_id, ty.event_type, COALESCE(tot.t, 0) AS t
        FROM users u
        CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in FK_TYPES)})
            AS ty(event_type)
        LEFT JOIN tot ON tot.user_id = u.user_id
                     AND tot.event_type = ty.event_type
    ), r1 AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY t, user_id) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM grid
    ), med AS (
        SELECT event_type, CAST(MIN(t) + MAX(t) AS BIGINT) AS med_x2
        FROM r1 WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
        GROUP BY 1
    ), rate AS (
        SELECT g.user_id,
               CASE WHEN 2 * g.t > m.med_x2 THEN 1 ELSE 0 END AS r
        FROM grid g JOIN med m USING (event_type)
    ), item AS (
        SELECT user_id, CAST(SUM(r) AS BIGINT) AS c1 FROM rate GROUP BY 1
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c1) AS BIGINT) AS s1,
               CAST(SUM(c1 * (c1 - 1)
                        + ({FK_M} - c1) * ({FK_M - 1} - c1)) AS BIGINT) AS q
        FROM item
    )
    SELECT n AS n_items, CAST({FK_M} AS BIGINT) AS n_raters,
           {dround(f'CAST(q AS DOUBLE) / (CAST(n AS DOUBLE) * {FK_M * (FK_M - 1)}.0)', 6)}
               AS p_bar,
           {dround(f'(CAST(s1 AS DOUBLE) / ({FK_M}.0 * n)) * (CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))'
                   f' + (1.0 - CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))'
                   f' * (1.0 - CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))', 6)}
               AS p_e,
           {dround(f'(CAST(q AS DOUBLE) / (CAST(n AS DOUBLE) * {FK_M * (FK_M - 1)}.0)'
                   f' - ((CAST(s1 AS DOUBLE) / ({FK_M}.0 * n)) * (CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))'
                   f'    + (1.0 - CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))'
                   f'    * (1.0 - CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))))'
                   f' / (1.0 - ((CAST(s1 AS DOUBLE) / ({FK_M}.0 * n)) * (CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))'
                   f'    + (1.0 - CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))'
                   f'    * (1.0 - CAST(s1 AS DOUBLE) / ({FK_M}.0 * n))))', 6)}
               AS fleiss_kappa
    FROM s
    """,
)
def ext_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa: chance-corrected agreement among m > 2 raters — the
    annotation-QA statistic for preference/label datasets (Cohen's kappa,
    already covered by ext_cohens_kappa, only handles 2 raters). Each event
    type acts as a rater scoring every user with a binary rating (above /
    not-above that type's median per-user spend), and kappa asks whether
    the five raters agree more than chance.

    Exactness: ratings derive from exact integer spend totals compared
    against exact middle-element medians (strict >, ties rate 0); the
    agreement numerator sum c1(c1-1) + c0(c0-1) and the category total are
    exact integers; p_bar, p_e and kappa are fixed double expressions over
    those integers (identical op order both engines), then dround.

    Scale shape: one (user, type)-keyed aggregate, a users x m broadcast
    grid (absence = 0 total, so every item has all m ratings), per-type
    partition-parallel median windows, one item aggregate, one scalar."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", _cents().alias("cents")
    )
    # r10: events is scanned ONCE (same rationale as ext_cochran_q — user
    # list from the aggregate, reused small frames pinned; was 4 scans)
    tot = ev.groupBy("user_id", "event_type").agg(
        F.sum("cents").cast("bigint").alias("t")
    ).localCheckpoint(eager=False)
    users = tot.select("user_id").distinct()
    types = spark.createDataFrame([(t,) for t in FK_TYPES], ["event_type"])
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(tot, ["user_id", "event_type"], "left")
        .select("user_id", "event_type", F.coalesce("t", F.lit(0)).alias("t"))
        .localCheckpoint(eager=False)  # feeds the median pass AND rate
    )
    w = Window.partitionBy("event_type").orderBy("t", "user_id")
    wn = Window.partitionBy("event_type")
    r1 = grid.select(
        "event_type",
        "t",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    med = (
        r1.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy("event_type")
        .agg((F.min("t") + F.max("t")).cast("bigint").alias("med_x2"))
    )
    rate = grid.join(F.broadcast(med), "event_type").select(
        "user_id",
        F.when(2 * F.col("t") > F.col("med_x2"), 1).otherwise(0).alias("r"),
    )
    item = rate.groupBy("user_id").agg(F.sum("r").cast("bigint").alias("c1"))
    s = item.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c1").cast("bigint").alias("s1"),
        F.sum(
            F.col("c1") * (F.col("c1") - 1)
            + (FK_M - F.col("c1")) * ((FK_M - 1) - F.col("c1"))
        )
        .cast("bigint")
        .alias("q"),
    )
    nd = F.col("n").cast("double")
    p1 = F.col("s1").cast("double") / (float(FK_M) * F.col("n"))
    pe = p1 * p1 + (1.0 - p1) * (1.0 - p1)
    pbar = F.col("q").cast("double") / (nd * float(FK_M * (FK_M - 1)))
    return s.select(
        F.col("n").alias("n_items"),
        F.lit(FK_M).cast("bigint").alias("n_raters"),
        F.round(pbar, 6).alias("p_bar"),
        F.round(pe, 6).alias("p_e"),
        F.round((pbar - pe) / (1.0 - pe), 6).alias("fleiss_kappa"),
    )


# ---------------------------------------------------------------------------
# ext_conv_sample_build — session -> conversation training-sample assembly
# ---------------------------------------------------------------------------

CONV_GAP_MIN = 30  # session gap, minutes (matches ext_session_window)
CONV_MAX_TURNS = 8  # context-window turn cap
CONV_USER_MOD = 4  # hash gate: 1/4 of users (bounds output deterministically)


@register(
    "ext_conv_sample_build",
    f"""
    WITH gated AS (
        SELECT user_id, ts, event_id, event_type
        FROM events
        WHERE {_md5_32("CAST(user_id AS VARCHAR)")} % {CONV_USER_MOD} = 0
    ), marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL {CONV_GAP_MIN} MINUTE
                    THEN 1 ELSE 0 END AS is_start
        FROM gated
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(SUM(is_start) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM marked
    ), turns AS (
        SELECT user_id, session_seq, ts, event_id, event_type,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                   ORDER BY ts, event_id) AS BIGINT) AS turn_no,
               CAST(COUNT(*) OVER (PARTITION BY user_id, session_seq)
                   AS BIGINT) AS sess_len,
               epoch_us(ts) - MIN(epoch_us(ts)) OVER (
                   PARTITION BY user_id, session_seq) AS off_us
        FROM sess
    )
    SELECT {_md5_32("CAST(user_id AS VARCHAR) || ':' || CAST(session_seq AS VARCHAR)")}
               AS sample_id,
           user_id, session_seq,
           CAST(LEAST(MAX(sess_len), {CONV_MAX_TURNS}) AS BIGINT) AS n_turns,
           CAST(CASE WHEN MAX(sess_len) > {CONV_MAX_TURNS} THEN 1 ELSE 0 END
               AS BIGINT) AS truncated,
           string_agg(event_type || '@' || CAST(off_us AS VARCHAR), '|'
               ORDER BY ts, event_id) AS turns,
           CAST(length(string_agg(event_type || '@' || CAST(off_us AS VARCHAR),
               '|' ORDER BY ts, event_id)) AS BIGINT) AS n_chars,
           CASE WHEN {_md5_32("CAST(user_id AS VARCHAR) || ':' || CAST(session_seq AS VARCHAR)")} % 10 < 8
                THEN 'train'
                WHEN {_md5_32("CAST(user_id AS VARCHAR) || ':' || CAST(session_seq AS VARCHAR)")} % 10 = 8
                THEN 'val' ELSE 'test' END AS split
    FROM turns WHERE turn_no <= {CONV_MAX_TURNS}
    GROUP BY user_id, session_seq
    """,
)
def ext_conv_sample_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation training-sample assembly: gap-sessionized event streams
    become one sample row per session — turns serialized in order with
    microsecond offsets, truncated to the context-window turn cap with an
    explicit `truncated` flag, a content-addressed sample_id, and a
    deterministic 80/10/10 train/val/test split — the multi-turn analogue
    of ext_text_pack that turns raw interaction logs into SFT-ready rows
    (ext_session_path_topk COUNTS paths for analytics; this key EMITS the
    samples).

    Determinism: sessionization order is the (ts, event_id) total order;
    offsets are exact integer microseconds (epoch_us == unix_micros); the
    serialization is an ORDERED string_agg on both engines; ids and the
    split are md5-derived (rand-free). The user hash-gate bounds output
    deterministically at any SF.

    Scale shape: everything is partitioned by user (the natural
    conversation shuffle key) — two window passes and one grouped
    serialization, no global ordering, no joins."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    gated = ev.filter(
        F.pmod(_spark_md5_32(F.col("user_id").cast("string")), F.lit(CONV_USER_MOD))
        == 0
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = gated.withColumn(
        "is_start",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("long")
                - F.lag("ts").over(w).cast("long")
                > CONV_GAP_MIN * 60
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_seq",
        F.sum("is_start")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    ws = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    wsa = Window.partitionBy("user_id", "session_seq")
    turns = sess.select(
        "user_id",
        "session_seq",
        "ts",
        "event_id",
        "event_type",
        F.row_number().over(ws).cast("bigint").alias("turn_no"),
        F.count(F.lit(1)).over(wsa).cast("bigint").alias("sess_len"),
        (F.unix_micros("ts") - F.min(F.unix_micros("ts")).over(wsa)).alias(
            "off_us"
        ),
    )
    sid = _spark_md5_32(
        F.concat(
            F.col("user_id").cast("string"),
            F.lit(":"),
            F.col("session_seq").cast("string"),
        )
    )
    txt = F.concat(
        F.col("event_type"), F.lit("@"), F.col("off_us").cast("string")
    )
    kept = turns.filter(F.col("turn_no") <= CONV_MAX_TURNS)
    agged = kept.groupBy("user_id", "session_seq").agg(
        F.least(F.max("sess_len"), F.lit(CONV_MAX_TURNS))
        .cast("bigint")
        .alias("n_turns"),
        F.when(F.max("sess_len") > CONV_MAX_TURNS, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("truncated"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", txt.alias("txt")))
                ),
                lambda s: s["txt"],
            ),
            "|",
        ).alias("turns"),
    )
    return agged.select(
        sid.alias("sample_id"),
        "user_id",
        "session_seq",
        "n_turns",
        "truncated",
        "turns",
        F.length("turns").cast("bigint").alias("n_chars"),
        F.when(F.pmod(sid, F.lit(10)) < 8, "train")
        .when(F.pmod(sid, F.lit(10)) == 8, "val")
        .otherwise("test")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# ext_pinball_grid_fit — quantile regression by exact-integer grid search
# ---------------------------------------------------------------------------

PIN_TAU_NUM = 9  # tau = 0.9 (scaled-by-10 integer pinball loss)
PIN_K = 10  # slope grid: k in [-PIN_K, PIN_K]


@register(
    "ext_pinball_grid_fit",
    f"""
    WITH mrev AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS y
        FROM orders GROUP BY 1
    ), m AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY mth) AS BIGINT) AS x, y
        FROM mrev
    ), st AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(GREATEST((MAX(y) - MIN(y)) // (COUNT(*) * {PIN_K}), 1)
                   AS BIGINT) AS step
        FROM m
    ), cand AS (
        SELECT m.x, m.y, k.k, st.n, k.k * st.step AS slope,
               m.y - k.k * st.step * m.x AS resid
        FROM m, st, (SELECT unnest(generate_series(-{PIN_K}, {PIN_K})) AS k) k
    ), b AS (
        SELECT k, slope, n, resid AS intercept FROM (
            SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY k
                ORDER BY resid, x) AS BIGINT) AS rn
            FROM cand
        ) WHERE rn = ({PIN_TAU_NUM} * n + 9) // 10
    ), loss AS (
        SELECT c.k, b.slope, b.intercept,
               CAST(SUM(CASE WHEN c.y >= b.slope * c.x + b.intercept
                    THEN {PIN_TAU_NUM} * (c.y - (b.slope * c.x + b.intercept))
                    ELSE {10 - PIN_TAU_NUM} * ((b.slope * c.x + b.intercept) - c.y)
                    END) AS BIGINT) AS loss10
        FROM cand c JOIN b USING (k)
        GROUP BY 1, 2, 3
    ), best AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY loss10, ABS(k), k) AS rb
            FROM loss
        ) WHERE rb = 1
    )
    SELECT st.n AS n_months, CAST(0.9 AS DOUBLE) AS tau,
           {dround('CAST(best.slope AS DOUBLE) / 100.0', 6)} AS slope_per_month,
           {dround('CAST(best.intercept AS DOUBLE) / 100.0', 6)} AS intercept,
           best.loss10 AS pinball_loss_x10_cents
    FROM best, st
    """,
)
def ext_pinball_grid_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile regression (tau = 0.9) of monthly revenue on month index by
    EXACT grid search: 21 slope candidates spanning the data's slope range,
    each paired with its pinball-optimal intercept (the tau-th order
    statistic of that slope's residuals), scored by the integer pinball
    loss, argmin with deterministic tie-breaks — the upper-quantile trend
    line that answers "what does a strong month look like" where OLS
    (ext_trend_ols) fits the mean and Theil-Sen (ext_theilsen_trend) the
    median. Grid-bounded by contract: the fit is exact over the documented
    candidate set.

    Exactness: everything — slopes, residuals, the intercept order
    statistic, the x10-scaled pinball loss, the argmin — is INTEGER
    arithmetic on exact cents; the only doubles are the two terminal
    reporting divisions, dround.

    Scale shape: the corpus collapses to the month grid in one aggregate;
    the grid x 21 candidates (~1.7k rows) fans out via broadcast; per-k
    windows and the final argmin run on candidate-grid-sized data."""
    mrev = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mth"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
    )
    # r10: the month grid feeds three consumers (slope-range scalars, the
    # candidate fan-out, the month count) — pinned so the orders scan +
    # month aggregate runs once, not once per consumer (plan audit: orders
    # scanned 5x -> 1)
    m = mrev.select(
        F.row_number().over(Window.orderBy("mth")).cast("bigint").alias("x"), "y"
    ).localCheckpoint(eager=False)
    st = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.greatest(
            F.floor((F.max("y") - F.min("y")) / (F.count(F.lit(1)) * PIN_K)),
            F.lit(1),
        )
        .cast("bigint")
        .alias("step"),
    )
    ks = st.select(
        "n", "step", F.explode(F.sequence(F.lit(-PIN_K), F.lit(PIN_K))).alias("k")
    )
    cand = m.crossJoin(F.broadcast(ks)).select(
        "x",
        "y",
        "k",
        "n",
        (F.col("k") * F.col("step")).alias("slope"),
        (F.col("y") - F.col("k") * F.col("step") * F.col("x")).alias("resid"),
    )
    wk = Window.partitionBy("k").orderBy("resid", "x")
    b = (
        cand.withColumn("rn", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rn") == F.floor((PIN_TAU_NUM * F.col("n") + 9) / 10))
        .select("k", "slope", F.col("resid").alias("intercept"))
    )
    yhat = F.col("slope") * F.col("x") + F.col("intercept")
    loss = (
        cand.drop("slope")
        .join(F.broadcast(b), "k")
        .groupBy("k", "slope", "intercept")
        .agg(
            F.sum(
                F.when(
                    F.col("y") >= yhat, PIN_TAU_NUM * (F.col("y") - yhat)
                ).otherwise((10 - PIN_TAU_NUM) * (yhat - F.col("y")))
            )
            .cast("bigint")
            .alias("loss10")
        )
    )
    best = (
        loss.withColumn(
            "rb",
            F.row_number().over(
                Window.orderBy("loss10", F.abs(F.col("k")), F.col("k"))
            ),
        )
        .filter(F.col("rb") == 1)
        .select("slope", "intercept", "loss10")
    )
    n_months = m.agg(F.count(F.lit(1)).cast("bigint").alias("n_months"))
    return best.crossJoin(F.broadcast(n_months)).select(
        "n_months",
        F.lit(0.9).alias("tau"),
        F.round(F.col("slope").cast("double") / 100.0, 6).alias("slope_per_month"),
        F.round(F.col("intercept").cast("double") / 100.0, 6).alias("intercept"),
        F.col("loss10").alias("pinball_loss_x10_cents"),
    )


# ---------------------------------------------------------------------------
# ext_tail_dependence — upper-tail dependence between event-type day series
# ---------------------------------------------------------------------------

TDEP_Q_NUM = 8  # q = 0.8 threshold quantile (scaled by 10)


@register(
    "ext_tail_dependence",
    f"""
    WITH ev AS (
        SELECT CAST(ts AS DATE) AS d, event_type, {_CENTS_SQL} AS cents
        FROM events
    ), daily0 AS (
        SELECT d, event_type, CAST(SUM(cents) AS BIGINT) AS t
        FROM ev GROUP BY 1, 2
    ), days AS (SELECT DISTINCT d FROM ev),
    types AS (SELECT DISTINCT event_type FROM ev),
    daily AS (
        SELECT days.d, types.event_type, COALESCE(daily0.t, 0) AS t
        FROM days CROSS JOIN types
        LEFT JOIN daily0 ON daily0.d = days.d
                        AND daily0.event_type = types.event_type
    ), r AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY t, d) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM daily
    ), thr AS (
        SELECT event_type, n, CAST(MAX(t) AS BIGINT) AS thr
        FROM r WHERE rn = ({TDEP_Q_NUM} * n + 9) // 10
        GROUP BY 1, 2
    ), ex AS (
        SELECT daily.d, daily.event_type, thr.n, thr.thr,
               CASE WHEN daily.t > thr.thr THEN 1 ELSE 0 END AS exceed
        FROM daily JOIN thr USING (event_type)
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(MAX(a.n) AS BIGINT) AS n_days,
           {dround('CAST(MAX(a.thr) AS DOUBLE) / 100.0', 6)} AS thr_a,
           {dround('CAST(MAX(b.thr) AS DOUBLE) / 100.0', 6)} AS thr_b,
           CAST(SUM(a.exceed) AS BIGINT) AS n_exceed_a,
           CAST(SUM(b.exceed) AS BIGINT) AS n_exceed_b,
           CAST(SUM(a.exceed * b.exceed) AS BIGINT) AS n_joint,
           {dround(f'CAST(SUM(a.exceed * b.exceed) AS DOUBLE)'
                   f' / (MAX(a.n) * (1.0 - {TDEP_Q_NUM}.0 / 10.0))', 6)}
               AS lambda_u
    FROM ex a JOIN ex b ON a.d = b.d AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def ext_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical upper-tail dependence between event-type daily revenue
    series: lambda_U = P(both series exceed their own 0.8-quantile) /
    (1 - 0.8) — the copula-tail diagnostic that answers "do these metrics
    spike TOGETHER" (correlation, ext_ts_rolling_corr, measures the body;
    tail dependence measures exactly the co-extreme behavior that breaks
    capacity plans and alert budgets; ext_tail_index_hill measures one
    series' tail weight, not co-movement).

    Exactness: daily totals are exact cents integers (absent days
    materialized as 0 on the full day x type grid); thresholds are exact
    order statistics (element at ceil(q*n)); exceedance flags and joint
    counts are pure integer arithmetic; lambda is one terminal division,
    dround.

    Scale shape: one (day, type) aggregate collapses the corpus to the
    calendar grid; everything after — per-type threshold windows, the
    day-keyed pair join — is grid-sized."""
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"),
        "event_type",
        _cents().alias("cents"),
    )
    # r10: events is scanned ONCE (ext_cochran_q's rewrite): the day and
    # type lists collapse out of the (d, type) aggregate (a day/type appears
    # in daily0 iff it has any event — identical sets), and the grid-sized
    # reused frames are pinned so the threshold window, the exceedance
    # join and the a/b self-join below don't each replay the corpus
    # aggregate (plan audit: 12 events scans -> 1)
    daily0 = ev.groupBy("d", "event_type").agg(
        F.sum("cents").cast("bigint").alias("t")
    ).localCheckpoint(eager=False)
    days = daily0.select("d").distinct()
    types = daily0.select("event_type").distinct()
    daily = (
        days.crossJoin(F.broadcast(types))
        .join(daily0, ["d", "event_type"], "left")
        .select("d", "event_type", F.coalesce("t", F.lit(0)).alias("t"))
        .localCheckpoint(eager=False)  # feeds the rank window AND ex
    )
    w = Window.partitionBy("event_type").orderBy("t", "d")
    wn = Window.partitionBy("event_type")
    r = daily.select(
        "event_type",
        "t",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    thr = (
        r.filter(F.col("rn") == F.floor((TDEP_Q_NUM * F.col("n") + 9) / 10))
        .groupBy("event_type", "n")
        .agg(F.max("t").cast("bigint").alias("thr"))
    )
    ex = daily.join(F.broadcast(thr), "event_type").select(
        "d",
        "event_type",
        "n",
        "thr",
        F.when(F.col("t") > F.col("thr"), 1).otherwise(0).alias("exceed"),
    ).localCheckpoint(eager=False)  # grid-sized; feeds BOTH sides of a⋈b
    a = ex.select(
        "d",
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("thr").alias("thr_a_c"),
        F.col("exceed").alias("ex_a"),
    )
    b = ex.select(
        "d",
        F.col("event_type").alias("type_b"),
        F.col("thr").alias("thr_b_c"),
        F.col("exceed").alias("ex_b"),
    )
    return (
        a.join(b, "d")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.max("n_a").cast("bigint").alias("n_days"),
            F.round(F.max("thr_a_c").cast("double") / 100.0, 6).alias("thr_a"),
            F.round(F.max("thr_b_c").cast("double") / 100.0, 6).alias("thr_b"),
            F.sum("ex_a").cast("bigint").alias("n_exceed_a"),
            F.sum("ex_b").cast("bigint").alias("n_exceed_b"),
            F.sum(F.col("ex_a") * F.col("ex_b")).cast("bigint").alias("n_joint"),
            F.round(
                F.sum(F.col("ex_a") * F.col("ex_b")).cast("double")
                / (F.max("n_a") * (1.0 - TDEP_Q_NUM / 10.0)),
                6,
            ).alias("lambda_u"),
        )
    )


# ---------------------------------------------------------------------------
# src_python_datasource — Spark 4 Python DataSource API (custom source)
# ---------------------------------------------------------------------------

PYDS_ROWS = 10_000
PYDS_PARTS = 8
PYDS_MULT = 2654435761  # Knuth multiplicative hash constant
PYDS_MOD = 4294967296  # 2^32


@register(
    "src_python_datasource",
    f"""
    WITH src AS (
        SELECT i, (i * {PYDS_MULT}) % {PYDS_MOD} AS h
        FROM (SELECT unnest(generate_series(0, {PYDS_ROWS - 1})) AS i)
    )
    SELECT CAST(h % 16 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(h) AS BIGINT) AS sum_h,
           CAST(MIN(i) AS BIGINT) AS min_i,
           CAST(MAX(i) AS BIGINT) AS max_i
    FROM src GROUP BY 1
    """,
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: ARG001
    """Custom PYTHON DATA SOURCE (the Spark 4 pyspark.sql.datasource API):
    a registered DataSource class whose reader fans out over
    {PYDS_PARTS} InputPartitions, each generating a deterministic slice of
    a Knuth-hash series — the engine surface a connector author uses to
    expose ANY external system (queue, REST API, proprietary format) as a
    parallel DataFrame scan. The aggregate on top proves rows from every
    partition arrived exactly once.

    Determinism: the source yields pure integer arithmetic
    (h = i * 2654435761 mod 2^32) — no wall clock, no randomness; the
    oracle regenerates the identical series with generate_series.

    Scale shape: partitions() is the parallelism contract — the driver
    plans one task per InputPartition, so a real connector scales by
    returning one partition per shard/file/offset-range; the aggregate is
    map-side-combined into 16 buckets."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    rows, parts, mult, mod = PYDS_ROWS, PYDS_PARTS, PYDS_MULT, PYDS_MOD

    class SyntheticSeriesSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "synthetic_series"

        def schema(self) -> str:
            return "i BIGINT, h BIGINT"

        def reader(self, schema):  # noqa: ARG002
            return SyntheticSeriesReader()

    class SyntheticSeriesReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(p) for p in range(parts)]

        def read(self, partition):
            chunk = rows // parts
            start = partition.value * chunk
            for i in range(start, start + chunk):
                yield (i, (i * mult) % mod)

    spark.dataSource.register(SyntheticSeriesSource)
    src = spark.read.format("synthetic_series").load()
    return src.groupBy(F.pmod("h", F.lit(16)).cast("bigint").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("h").cast("bigint").alias("sum_h"),
        F.min("i").cast("bigint").alias("min_i"),
        F.max("i").cast("bigint").alias("max_i"),
    )


# ---------------------------------------------------------------------------
# src_binary_files — binaryFile ingestion audit (multimodal source surface)
# ---------------------------------------------------------------------------

_BIN_TABLES = [
    "customer", "documents", "embeddings", "events", "lineitem",
    "nation", "orders", "part", "region", "supplier",
]


@register(
    "src_binary_files",
    "SELECT * FROM (VALUES "
    + ", ".join(f"('{t}.parquet', TRUE, TRUE)" for t in _BIN_TABLES)
    + ") AS t(file_name, content_nonempty, length_matches_content)",
)
def src_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary ingestion through Spark's binaryFile source — the
    entry point of every multimodal pipeline (images/audio/video land as
    whole-file binary rows BEFORE any decode UDF; the mm_* keys consume
    exactly this shape). Reads the scale-factor directory's parquet files
    as raw bytes and emits the SF-invariant contract: each expected file
    present, non-empty, and with the `length` metadata column equal to the
    actual content byte count (the consistency a downstream decode stage
    relies on for batch sizing).

    DuckDB cannot hash Spark-identical raw bytes (BLOB->VARCHAR escapes),
    so like src_file_metadata the oracle pins basename + invariant flags
    rather than content digests.

    Scale shape: binaryFile is a real FileFormat scan — partition planning,
    pathGlobFilter pushdown, and (in production) maxBytesPerTrigger
    batching all apply; one row per file, no shuffle until the tiny audit
    projection."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .load(sf_dir)
    )
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        (F.col("content").isNotNull() & (F.length("content") > 0)).alias(
            "content_nonempty"
        ),
        (F.length("content") == F.col("length")).alias("length_matches_content"),
    )


# ---------------------------------------------------------------------------
# ext_embed_cka_views — linear CKA between embedding dimension halves
# ---------------------------------------------------------------------------

CKA_UNITS = 1000  # same quantization as the PCA family (r4_ops.PCA_UNITS)


@register(
    "ext_embed_cka_views",
    f"""
    WITH xq AS MATERIALIZED (
        SELECT vec_id, i - 1 AS j,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {CKA_UNITS}) AS BIGINT)
                   AS x
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ), gram AS (
        SELECT a.j AS j, b.j AS k, CAST(SUM(a.x * b.x) AS BIGINT) AS g
        FROM xq a JOIN xq b USING (vec_id)
        GROUP BY 1, 2
    ), sums AS (
        SELECT j, CAST(SUM(x) AS BIGINT) AS s FROM xq GROUP BY 1
    ), nrow AS (
        SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM xq
    ), cells AS (
        SELECT gram.j, gram.k,
               CAST(nrow.n * gram.g - sj.s * sk.s AS DOUBLE) AS c
        FROM gram, nrow
        JOIN sums sj ON sj.j = gram.j
        JOIN sums sk ON sk.j = gram.k
    ), dsz AS (
        SELECT CAST(MAX(j) + 1 AS BIGINT) AS d FROM cells
    ), folded AS (
        SELECT
            list_reduce(list(CASE WHEN cells.j <  dsz.d // 2 AND cells.k <  dsz.d // 2
                                  THEN cells.c * cells.c ELSE 0.0 END
                             ORDER BY cells.j, cells.k), (a, x) -> a + x) AS fxx,
            list_reduce(list(CASE WHEN cells.j >= dsz.d // 2 AND cells.k >= dsz.d // 2
                                  THEN cells.c * cells.c ELSE 0.0 END
                             ORDER BY cells.j, cells.k), (a, x) -> a + x) AS fyy,
            list_reduce(list(CASE WHEN cells.j <  dsz.d // 2 AND cells.k >= dsz.d // 2
                                  THEN cells.c * cells.c ELSE 0.0 END
                             ORDER BY cells.j, cells.k), (a, x) -> a + x) AS fxy
        FROM cells, dsz
    )
    SELECT nrow.n AS n_vecs, CAST(dsz.d // 2 AS BIGINT) AS d_view,
           {dround('folded.fxy / (sqrt(folded.fxx) * sqrt(folded.fyy))', 6)}
               AS linear_cka
    FROM folded, nrow, dsz
    """,
)
def ext_embed_cka_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered-kernel alignment) between the first and second
    halves of the embedding dimensions: do the two 32-dim views carry the
    same pairwise-similarity geometry? CKA is THE representation-similarity
    metric for comparing embedding spaces; a high half-vs-half CKA says the
    space is redundant enough that truncation is cheap — the geometry-level
    companion to ext_embed_matryoshka_audit (which measures the same
    question at the retrieval-metric level).

    Exactness: embeddings quantize to integer units (the PCA-family
    discipline), so the full Gram and column sums are exact BIGINTs and
    every centered cell n*G_jk - S_j*S_k is an exact integer below 2^53
    (exactly representable as the double it converts to); the three
    Frobenius sums fold over the 4096-cell grid IN (j,k) ORDER on both
    engines; CKA is a fixed expression of the three folds (sqrt is
    IEEE-correctly-rounded on both).

    Scale shape: ONE corpus pass builds the d^2 Gram via double-posexplode
    into a map-side-combined aggregate (no self-join shuffle — the
    _pca_eigvec plan); everything after is d^2 = 4096-row arithmetic."""
    from ..ext import similarity as sim  # noqa: F401  (family cohesion)

    emb = load(spark, sf_dir, "embeddings")
    arrq = emb.select(
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * CKA_UNITS, 0).cast("bigint"),
        ).alias("aq")
    )
    pairs = arrq.select(F.posexplode("aq").alias("j", "xj"), "aq").select(
        "j", "xj", F.posexplode("aq").alias("k", "xk")
    )
    gram = pairs.groupBy("j", "k").agg(
        F.sum(F.col("xj") * F.col("xk")).cast("bigint").alias("g")
    )
    sums = (
        arrq.select(F.posexplode("aq").alias("j", "x"))
        .groupBy("j")
        .agg(F.sum("x").cast("bigint").alias("s"))
    )
    # r10: nrow feeds the centered cells AND the final report, and `cells`
    # (the d^2 = 4096-row centered Gram) feeds dsz, the fold and the report
    # — unpinned, every consumer replayed the whole corpus Gram pass (plan
    # audit: embeddings scanned 13x; pinned it is 3x — Gram, column sums,
    # count — and the heavy d^2 aggregate runs exactly once)
    nrow = arrq.agg(F.count(F.lit(1)).cast("bigint").alias("n")).localCheckpoint(
        eager=False
    )
    cells = (
        gram.crossJoin(F.broadcast(nrow))
        .join(F.broadcast(sums.select(F.col("j").alias("j_"), F.col("s").alias("sj"))), F.col("j") == F.col("j_"))
        .join(F.broadcast(sums.select(F.col("j").alias("k_"), F.col("s").alias("sk"))), F.col("k") == F.col("k_"))
        .select(
            "j",
            "k",
            (F.col("n") * F.col("g") - F.col("sj") * F.col("sk"))
            .cast("double")
            .alias("c"),
        )
        .localCheckpoint(eager=False)
    )
    dsz = cells.agg((F.max("j") + 1).cast("bigint").alias("d")).localCheckpoint(
        eager=False
    )
    cd = cells.crossJoin(F.broadcast(dsz))
    half = F.floor(F.col("d") / 2)

    def fold(cond):
        return F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "j",
                            "k",
                            F.when(cond, F.col("c") * F.col("c"))
                            .otherwise(F.lit(0.0))
                            .alias("sq"),
                        )
                    )
                ),
                lambda s: s["sq"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    folded = cd.agg(
        fold((F.col("j") < half) & (F.col("k") < half)).alias("fxx"),
        fold((F.col("j") >= half) & (F.col("k") >= half)).alias("fyy"),
        fold((F.col("j") < half) & (F.col("k") >= half)).alias("fxy"),
    )
    return (
        folded.crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(dsz))
        .select(
            F.col("n").alias("n_vecs"),
            F.floor(F.col("d") / 2).cast("bigint").alias("d_view"),
            F.round(
                F.col("fxy") / (F.sqrt(F.col("fxx")) * F.sqrt(F.col("fyy"))), 6
            ).alias("linear_cka"),
        )
    )


# ---------------------------------------------------------------------------
# ext_cochran_q — m-condition binary repeated-measures test
# ---------------------------------------------------------------------------

CQ_TYPES = ["click", "error", "purchase", "signup", "view"]
CQ_M = len(CQ_TYPES)


def _cq_oracle() -> str:
    g_sq = " + ".join(
        f"CAST(g_{t} AS DOUBLE) * g_{t}" for t in CQ_TYPES
    )
    picks = ", ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN r ELSE 0 END) AS BIGINT)"
        f" AS g_{t}"
        for t in CQ_TYPES
    )
    q = (
        f"(({CQ_M}.0 - 1.0) * ({CQ_M}.0 * ({g_sq}) - CAST(tt AS DOUBLE) * tt)"
        f" / ({CQ_M}.0 * tt - l2))"
    )
    return f"""
    WITH ev AS (
        SELECT user_id, event_type, {_CENTS_SQL} AS cents FROM events
    ), tot AS (
        SELECT user_id, event_type, CAST(SUM(cents) AS BIGINT) AS t
        FROM ev GROUP BY 1, 2
    ), users AS (SELECT DISTINCT user_id FROM ev),
    grid AS (
        SELECT u.user_id, ty.event_type, COALESCE(tot.t, 0) AS t
        FROM users u
        CROSS JOIN (VALUES {", ".join(f"('{t}')" for t in CQ_TYPES)})
            AS ty(event_type)
        LEFT JOIN tot ON tot.user_id = u.user_id
                     AND tot.event_type = ty.event_type
    ), r1 AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY t, user_id) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM grid
    ), med AS (
        SELECT event_type, CAST(MIN(t) + MAX(t) AS BIGINT) AS med_x2
        FROM r1 WHERE rn IN ((n + 1) // 2, (n + 2) // 2) GROUP BY 1
    ), rate AS (
        SELECT g.user_id, g.event_type,
               CASE WHEN 2 * g.t > m.med_x2 THEN 1 ELSE 0 END AS r
        FROM grid g JOIN med m USING (event_type)
    ), cols AS (
        SELECT {picks} FROM rate
    ), rows_ AS (
        SELECT user_id, CAST(SUM(r) AS BIGINT) AS l FROM rate GROUP BY 1
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(l) AS BIGINT) AS tt,
               CAST(SUM(l * l) AS BIGINT) AS l2
        FROM rows_
    )
    SELECT s.n_items, CAST({CQ_M} AS BIGINT) AS n_conditions,
           CAST({CQ_M - 1} AS BIGINT) AS df,
           {dround(q, 6)} AS q_stat
    FROM cols, s
    """


@register("ext_cochran_q", _cq_oracle())
def ext_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test: do the m conditions (event types) have equal
    'success' proportions across matched subjects (users)? The m-condition
    generalization of McNemar (ext_mcnemar_test covers m = 2) on the same
    median-split binary ratings ext_fleiss_kappa scores for AGREEMENT —
    Q answers the hypothesis-test question (are the marginal rates equal),
    kappa the reliability question; both belong in an annotation-QA suite.

    Exactness: Q = (m-1)(m*sum G_j^2 - T^2) / (m*T - sum L_i^2) is a fixed
    double expression over four exact integer aggregates (column totals in
    sorted type order, grand total, row-total sum of squares), then dround.

    Scale shape: same (user, type) aggregate + broadcast grid + per-type
    median windows as the kappa key; the Q arithmetic is scalar."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", _cents().alias("cents")
    )
    # r10: events is scanned ONCE — the user list collapses out of the
    # (user, type) aggregate (same set: a user appears in tot iff they have
    # any event) instead of a second distinct over the corpus, and the small
    # reused frames are pinned so the grid/rate fan-outs below don't replay
    # the corpus aggregate per consumer (plan audit: 8 events scans -> 1)
    tot = ev.groupBy("user_id", "event_type").agg(
        F.sum("cents").cast("bigint").alias("t")
    ).localCheckpoint(eager=False)
    users = tot.select("user_id").distinct()
    types = spark.createDataFrame([(t,) for t in CQ_TYPES], ["event_type"])
    grid = (
        users.crossJoin(F.broadcast(types))
        .join(tot, ["user_id", "event_type"], "left")
        .select("user_id", "event_type", F.coalesce("t", F.lit(0)).alias("t"))
        .localCheckpoint(eager=False)  # feeds the median pass AND rate
    )
    w = Window.partitionBy("event_type").orderBy("t", "user_id")
    wn = Window.partitionBy("event_type")
    r1 = grid.select(
        "user_id",
        "event_type",
        "t",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    )
    lo = F.floor((F.col("n") + 1) / 2)
    hi = F.floor((F.col("n") + 2) / 2)
    med = (
        r1.filter((F.col("rn") == lo) | (F.col("rn") == hi))
        .groupBy("event_type")
        .agg((F.min("t") + F.max("t")).cast("bigint").alias("med_x2"))
    )
    rate = grid.join(F.broadcast(med), "event_type").select(
        "user_id",
        "event_type",
        F.when(2 * F.col("t") > F.col("med_x2"), 1).otherwise(0).alias("r"),
    ).localCheckpoint(eager=False)  # feeds the column AND row aggregates
    cols = rate.agg(
        *[
            F.sum(F.when(F.col("event_type") == t_, F.col("r")).otherwise(0))
            .cast("bigint")
            .alias(f"g_{t_}")
            for t_ in CQ_TYPES
        ]
    )
    rows_ = rate.groupBy("user_id").agg(F.sum("r").cast("bigint").alias("l"))
    s = rows_.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("l").cast("bigint").alias("tt"),
        F.sum(F.col("l") * F.col("l")).cast("bigint").alias("l2"),
    )
    row = cols.crossJoin(F.broadcast(s))
    g_sq = None
    for t_ in CQ_TYPES:
        piece = F.col(f"g_{t_}").cast("double") * F.col(f"g_{t_}")
        g_sq = piece if g_sq is None else g_sq + piece
    ttd = F.col("tt").cast("double")
    q = (
        (float(CQ_M) - 1.0)
        * (float(CQ_M) * g_sq - ttd * F.col("tt"))
        / (float(CQ_M) * F.col("tt") - F.col("l2"))
    )
    return row.select(
        "n_items",
        F.lit(CQ_M).cast("bigint").alias("n_conditions"),
        F.lit(CQ_M - 1).cast("bigint").alias("df"),
        F.round(q, 6).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# ext_partial_corr — detrended (partial) correlation on the month grid
# ---------------------------------------------------------------------------

PC_KUNITS = 100_000  # revenue in kilodollar integer units (cents // 1e5)


@register(
    "ext_partial_corr",
    f"""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    // {PC_KUNITS} AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), g AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY mth) AS BIGINT) AS z, x, y
        FROM m
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(z) AS BIGINT) AS sz,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(z * z) AS BIGINT) AS szz,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * z) AS BIGINT) AS sxz,
               CAST(SUM(y * z) AS BIGINT) AS syz
        FROM g
    ), r AS (
        SELECT n,
            (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
              / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                AS rxy,
            (CAST(n AS DOUBLE) * sxz - CAST(sx AS DOUBLE) * sz)
              / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * sqrt(CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
                AS rxz,
            (CAST(n AS DOUBLE) * syz - CAST(sy AS DOUBLE) * sz)
              / (sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                 * sqrt(CAST(n AS DOUBLE) * szz - CAST(sz AS DOUBLE) * sz))
                AS ryz
        FROM s
    )
    SELECT n AS n_months,
           {dround('rxy', 6)} AS r_xy,
           {dround('rxz', 6)} AS r_x_trend,
           {dround('ryz', 6)} AS r_y_trend,
           {dround('(rxy - rxz * ryz) / (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz))', 6)}
               AS partial_r_xy
    FROM r
    """,
)
def ext_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlation of monthly revenue and monthly order count
    CONTROLLING FOR the time trend: r_xy.z = (r_xy - r_xz*r_yz) /
    sqrt((1-r_xz^2)(1-r_yz^2)) with z = month index. Two series that both
    grow look correlated (ext_spearman_corr / agg_corr_regression measure
    exactly that raw association); the partial coefficient asks whether
    they co-move AFTER the shared trend is removed — the difference between
    'both went up this year' and 'they actually track each other'.

    Exactness: revenue is floored to kilodollar integer units (cents
    // 1e5 — raw cents squares overflow int64 at this SF) so all nine
    moments are exact BIGINTs; the three Pearson r's and the partial
    coefficient are fixed double expressions over those integers (sqrt is
    IEEE-correctly-rounded on both engines), then dround.

    Scale shape: one month-grid aggregate collapses the corpus; everything
    after is a single scalar row."""
    mrev = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mth"))
        .agg(
            F.floor(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                / PC_KUNITS
            )
            .cast("bigint")
            .alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
    )
    g = mrev.select(
        F.row_number().over(Window.orderBy("mth")).cast("bigint").alias("z"),
        "x",
        "y",
    )
    s = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("bigint").alias("szz"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("bigint").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("bigint").alias("syz"),
    )
    nd = F.col("n").cast("double")

    def pearson(sab, sa, sb, saa, sbb):
        return (nd * F.col(sab) - F.col(sa).cast("double") * F.col(sb)) / (
            F.sqrt(nd * F.col(saa) - F.col(sa).cast("double") * F.col(sa))
            * F.sqrt(nd * F.col(sbb) - F.col(sb).cast("double") * F.col(sb))
        )

    rxy = pearson("sxy", "sx", "sy", "sxx", "syy")
    rxz = pearson("sxz", "sx", "sz", "sxx", "szz")
    ryz = pearson("syz", "sy", "sz", "syy", "szz")
    return s.select(
        F.col("n").alias("n_months"),
        F.round(rxy, 6).alias("r_xy"),
        F.round(rxz, 6).alias("r_x_trend"),
        F.round(ryz, 6).alias("r_y_trend"),
        F.round(
            (rxy - rxz * ryz)
            / (F.sqrt(1.0 - rxz * rxz) * F.sqrt(1.0 - ryz * ryz)),
            6,
        ).alias("partial_r_xy"),
    )


# ---------------------------------------------------------------------------
# ext_isotonic_calibration — PAV isotonic fit via the exact minimax formula
# ---------------------------------------------------------------------------

ISO_BIN_W = 5600  # cents per score bin (spans the fixture's 0..56021 range)
ISO_BINS = 10


@register(
    "ext_isotonic_calibration",
    f"""
    WITH ev AS (
        SELECT LEAST({_CENTS_SQL} // {ISO_BIN_W}, {ISO_BINS - 1}) AS bin,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ), b AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
        FROM ev GROUP BY 1
    ), c AS (
        SELECT bin, n, pos,
               CAST(SUM(n) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cn,
               CAST(SUM(pos) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cp
        FROM b
    ), iv AS (
        SELECT lo.bin AS j, hi.bin AS k,
               CAST(hi.cp - lo.cp + lo.pos AS DOUBLE)
                   / (hi.cn - lo.cn + lo.n) AS a
        FROM c lo JOIN c hi ON lo.bin <= hi.bin
    ), mn AS (
        SELECT i.bin AS i, iv.j, MIN(iv.a) AS mn_a
        FROM b i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
        GROUP BY 1, 2
    ), iso AS (
        SELECT i, MAX(mn_a) AS iso_rate FROM mn GROUP BY 1
    )
    SELECT b.bin, b.n, b.pos,
           {dround('CAST(b.pos AS DOUBLE) / b.n', 6)} AS rate_raw,
           {dround('iso.iso_rate', 6)} AS rate_iso
    FROM b JOIN iso ON iso.i = b.bin
    """,
)
def ext_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the purchase rate against the value
    score: the nonparametric monotone calibrator — THE standard companion
    to temperature scaling (ext_calibration_temperature fits one
    parameter; isotonic fits a free nondecreasing step function, the
    right tool when the reliability curve is monotone but not logistic).
    Computed EXACTLY via the minimax identity iso_i = max_(j<=i)
    min_(k>=i) mean(y[j..k]) — no iterative pooling, so no convergence
    state to reason about.

    Exactness: bin counts and interval means' numerators/denominators are
    exact integers from one cumulative pass; each interval mean is ONE
    division (bit-identical cross-engine), and min/max over identical
    doubles agree; terminal dround.

    Scale shape: one map-side-combined 10-bin aggregate collapses the
    corpus; the interval lattice (55 rows) and the minimax joins are
    bin-grid-sized."""
    ev = load(spark, sf_dir, "events").select(
        F.least(F.floor(_cents() / ISO_BIN_W), F.lit(ISO_BINS - 1))
        .cast("bigint")
        .alias("bin"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    # r10: the 10-bin aggregate feeds FOUR consumers (the cumulative pass →
    # both interval sides, the minimax bin list, the final join) — pinned so
    # the corpus collapse runs once (plan audit: events scanned 4x -> 1)
    b = ev.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    ).localCheckpoint(eager=False)
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = b.select(
        "bin",
        "n",
        "pos",
        F.sum("n").over(wc).cast("bigint").alias("cn"),
        F.sum("pos").over(wc).cast("bigint").alias("cp"),
    )
    lo = c.select(
        F.col("bin").alias("j"),
        F.col("n").alias("n_j"),
        F.col("pos").alias("pos_j"),
        F.col("cn").alias("cn_j"),
        F.col("cp").alias("cp_j"),
    )
    hi = c.select(
        F.col("bin").alias("k"),
        F.col("cn").alias("cn_k"),
        F.col("cp").alias("cp_k"),
    )
    iv = (
        lo.crossJoin(F.broadcast(hi))
        .filter(F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (
                (F.col("cp_k") - F.col("cp_j") + F.col("pos_j")).cast("double")
                / (F.col("cn_k") - F.col("cn_j") + F.col("n_j"))
            ).alias("a"),
        )
    )
    mn = (
        b.select(F.col("bin").alias("i"))
        .crossJoin(F.broadcast(iv))
        .filter((F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("a").alias("mn_a"))
    )
    iso = mn.groupBy("i").agg(F.max("mn_a").alias("iso_rate"))
    return b.join(F.broadcast(iso), b["bin"] == iso["i"]).select(
        "bin",
        "n",
        "pos",
        F.round(F.col("pos").cast("double") / F.col("n"), 6).alias("rate_raw"),
        F.round("iso_rate", 6).alias("rate_iso"),
    )


# ---------------------------------------------------------------------------
# ext_embed_mmd — linear-kernel MMD^2 between embedding label groups
# ---------------------------------------------------------------------------

MMD_UNITS = 1000  # same quantization as the PCA/CKA family


@register(
    "ext_embed_mmd",
    f"""
    WITH xq AS (
        SELECT vec_id, label, i - 1 AS j,
               CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {MMD_UNITS}) AS BIGINT)
                   AS x
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
    ), g AS (
        SELECT label, j, CAST(SUM(x) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM xq GROUP BY 1, 2
    ), pair AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(MAX(a.n) AS BIGINT) AS n_a, CAST(MAX(b.n) AS BIGINT) AS n_b,
               CAST(SUM((a.s * b.n - b.s * a.n) * (a.s * b.n - b.s * a.n))
                   AS BIGINT) AS num
        FROM g a JOIN g b ON a.j = b.j AND a.label < b.label
        GROUP BY 1, 2
    )
    SELECT label_a, label_b, n_a, n_b,
           {dround(f'CAST(num AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_a * n_b * n_b'
                   f' * {MMD_UNITS}.0 * {MMD_UNITS}.0)', 6)} AS mmd_sq
    FROM pair
    """,
)
def ext_embed_mmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-kernel maximum mean discrepancy between every pair of
    embedding label groups: MMD^2 = ||mean_a - mean_b||^2 — the two-sample
    test for EMBEDDING distributions (ext_stat_wasserstein_1d and
    ext_two_sample_ks test scalar columns; this tests the vector space
    itself), the drift gate run before mixing a new embedding batch into a
    retrieval corpus.

    Exactness: with quantized integer embeddings, each per-dimension
    difference of means scales to the exact integer S_a*n_b - S_b*n_a
    (|.| <= 4.4e7 here), its square (<= 2e15) and the 64-dim sum (<= 1.3e17)
    stay in int64 — the numerator is EXACT; one terminal division
    normalizes by (n_a*n_b*units)^2, then dround.

    Scale shape: one (label, dim) aggregate collapses the corpus
    (map-side-combined, d rows per label); the pair join runs on the
    labels x d grid (640 rows), emitting 45 pair rows."""
    emb = load(spark, sf_dir, "embeddings")
    xq = emb.select(
        "label", F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * MMD_UNITS, 0).cast("bigint"),
            )
        ).alias("j", "x"),
    )
    g = xq.groupBy("label", "j").agg(
        F.sum("x").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = g.select(
        F.col("label").alias("label_a"), "j",
        F.col("s").alias("sa"), F.col("n").alias("na"),
    )
    bb = g.select(
        F.col("label").alias("label_b"), F.col("j").alias("jb"),
        F.col("s").alias("sb"), F.col("n").alias("nb"),
    )
    diff = F.col("sa") * F.col("nb") - F.col("sb") * F.col("na")
    pair = (
        a.join(F.broadcast(bb), (F.col("j") == F.col("jb")) & (F.col("label_a") < F.col("label_b")))
        .groupBy("label_a", "label_b")
        .agg(
            F.max("na").cast("bigint").alias("n_a"),
            F.max("nb").cast("bigint").alias("n_b"),
            F.sum(diff * diff).cast("bigint").alias("num"),
        )
    )
    return pair.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        F.round(
            F.col("num").cast("double")
            / (
                F.col("n_a").cast("double")
                * F.col("n_a")
                * F.col("n_b")
                * F.col("n_b")
                * float(MMD_UNITS)
                * float(MMD_UNITS)
            ),
            6,
        ).alias("mmd_sq"),
    )


# ---------------------------------------------------------------------------
# ext_neyman_allocation — optimal stratified-sample allocation
# ---------------------------------------------------------------------------

NEY_BUDGET = 10_000
NEY_STRATA = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _ney_oracle() -> str:
    # share_h = B * N_h*S_h / sum(N*S): the fold over strata is emitted in
    # sorted stratum order on both engines so the denominator double is
    # bit-identical.
    w = lambda t: (  # noqa: E731
        f"(CAST(n_{t} AS DOUBLE) * sqrt((CAST(n_{t} AS DOUBLE) * sxx_{t}"
        f" - CAST(sx_{t} AS DOUBLE) * sx_{t}) / (CAST(n_{t} AS DOUBLE) * n_{t})))"
    )
    tags = [t.split("-")[0] for t in NEY_STRATA]
    picks = ", ".join(
        f"CAST(MAX(CASE WHEN stratum = '{s}' THEN n END) AS BIGINT) AS n_{t}, "
        f"CAST(MAX(CASE WHEN stratum = '{s}' THEN sx END) AS BIGINT) AS sx_{t}, "
        f"CAST(MAX(CASE WHEN stratum = '{s}' THEN sxx END) AS BIGINT) AS sxx_{t}"
        for s, t in zip(NEY_STRATA, tags)
    )
    tot = " + ".join(w(t) for t in tags)
    rows = " UNION ALL ".join(
        f"SELECT '{s}' AS stratum, n_{t} AS n_h, "
        f"{w(t)} AS wgt, ({tot}) AS wtot FROM wide"
        for s, t in zip(NEY_STRATA, tags)
    )
    return f"""
    WITH o AS (
        -- dollar units: cents-squared sums overflow int64 at sf0.1
        SELECT o_orderpriority AS stratum,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) // 100 AS c
        FROM orders
    ), st AS (
        SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS sx,
               CAST(SUM(c * c) AS BIGINT) AS sxx
        FROM o GROUP BY 1
    ), wide AS (
        SELECT {picks} FROM st
    ), shares AS (
        SELECT stratum, n_h, {NEY_BUDGET}.0 * wgt / wtot AS share FROM ({rows})
    ), fl AS (
        SELECT stratum, n_h, share,
               CAST(FLOOR(share) AS BIGINT) AS base,
               share - FLOOR(share) AS frac
        FROM shares
    ), rem AS (
        SELECT CAST({NEY_BUDGET} - SUM(base) AS BIGINT) AS r FROM fl
    ), ranked AS (
        SELECT fl.*, CAST(ROW_NUMBER() OVER (ORDER BY frac DESC, stratum)
                     AS BIGINT) AS rk, rem.r
        FROM fl, rem
    )
    SELECT stratum, n_h,
           {dround('share', 6)} AS share_exact,
           CAST(base + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT)
               AS n_alloc
    FROM ranked
    """


@register("ext_neyman_allocation", _ney_oracle())
def ext_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: given a total budget of
    {NEY_BUDGET} sampled orders, allocate n_h proportional to N_h * S_h
    (stratum size times stratum standard deviation) — the survey-sampling
    design that minimizes estimator variance for a fixed budget, with
    largest-remainder rounding so the integer allocations sum exactly to
    the budget. The design-side companion to ext_design_effect /
    ext_ipf_raking (which audit and re-weight AFTER sampling); the
    downstream executor is ext_sample_stratified's hash sampler.

    Exactness: per-stratum count/sum/sum-of-squares are exact integer
    dollars (cents // 100 — cents-squared sums overflow int64 at sf0.1;
    Neyman weights are scale-invariant so the allocation is unchanged); each weight N_h*S_h and the shared denominator fold (in
    sorted stratum order) are fixed double expressions; floors, remainders
    and the largest-remainder ranking operate on identical doubles with a
    total-order tie-break — integer allocations match exactly.

    Scale shape: one stratum-keyed aggregate collapses the corpus;
    everything after is 5-row arithmetic."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("stratum"),
        # dollar units: cents-squared sums overflow int64 at sf0.1
        F.floor(F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100)
        .cast("bigint")
        .alias("c"),
    )
    st = o.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sxx"),
    )
    tags = [t.split("-")[0] for t in NEY_STRATA]
    wide = st.agg(
        *[
            agg
            for s, t in zip(NEY_STRATA, tags)
            for agg in (
                F.max(F.when(F.col("stratum") == s, F.col("n")))
                .cast("bigint")
                .alias(f"n_{t}"),
                F.max(F.when(F.col("stratum") == s, F.col("sx")))
                .cast("bigint")
                .alias(f"sx_{t}"),
                F.max(F.when(F.col("stratum") == s, F.col("sxx")))
                .cast("bigint")
                .alias(f"sxx_{t}"),
            )
        ]
    # localCheckpoint: the 5 per-stratum share rows below each reference
    # this one-row aggregate; without it the union re-scans orders 5x.
    ).localCheckpoint(eager=False)

    def wgt(t: str):
        nd = F.col(f"n_{t}").cast("double")
        return nd * F.sqrt(
            (nd * F.col(f"sxx_{t}") - F.col(f"sx_{t}").cast("double") * F.col(f"sx_{t}"))
            / (nd * F.col(f"n_{t}"))
        )

    wtot = None
    for t in tags:
        wtot = wgt(t) if wtot is None else wtot + wgt(t)
    rows = [
        wide.select(
            F.lit(s).alias("stratum"),
            F.col(f"n_{t}").alias("n_h"),
            (float(NEY_BUDGET) * wgt(t) / wtot).alias("share"),
        )
        for s, t in zip(NEY_STRATA, tags)
    ]
    shares = rows[0]
    for r_ in rows[1:]:
        shares = shares.unionByName(r_)
    fl = shares.select(
        "stratum",
        "n_h",
        "share",
        F.floor("share").cast("bigint").alias("base"),
        (F.col("share") - F.floor("share")).alias("frac"),
    )
    rem = fl.agg((F.lit(NEY_BUDGET) - F.sum("base")).cast("bigint").alias("r"))
    ranked = fl.crossJoin(F.broadcast(rem)).withColumn(
        "rk",
        F.row_number()
        .over(Window.orderBy(F.desc("frac"), F.asc("stratum")))
        .cast("bigint"),
    )
    return ranked.select(
        "stratum",
        "n_h",
        F.round("share", 6).alias("share_exact"),
        (F.col("base") + F.when(F.col("rk") <= F.col("r"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_alloc"),
    )


# ---------------------------------------------------------------------------
# ext_recursive_hierarchy — WITH RECURSIVE walk-to-root (Spark 4 surface)
# ---------------------------------------------------------------------------

RH_MAX_KEY = 500  # start nodes: part keys 1..500; parent(k) = (k-1)//3


@register(
    "ext_recursive_hierarchy",
    f"""
    WITH RECURSIVE nodes AS (
        SELECT DISTINCT p_partkey AS k FROM part
        WHERE p_partkey BETWEEN 1 AND {RH_MAX_KEY}
    ), walk (start_k, cur, depth, path) AS (
        SELECT k, k, CAST(0 AS BIGINT), CAST(k AS VARCHAR) FROM nodes
        UNION ALL
        SELECT start_k, (cur - 1) // 3, depth + 1,
               path || '>' || CAST((cur - 1) // 3 AS VARCHAR)
        FROM walk WHERE cur > 0
    )
    SELECT start_k, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
           CAST(0 AS BIGINT) AS root,
           MAX(CASE WHEN cur = 0 THEN path END) AS path
    FROM walk GROUP BY 1
    """,
)
def ext_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE hierarchy walk (the recursive-CTE surface Spark
    gained in 4.x): every part key up to {RH_MAX_KEY} climbs its ternary
    parent chain parent(k) = (k-1)//3 to the root, emitting depth and the
    full materialized path — the BOM/org-chart/category-tree traversal
    pattern that previously required driver-side iteration (the
    ext_graph_bfs_reach family iterates in Python; this one runs INSIDE
    the engine on both sides).

    Determinism: the recursion is pure integer arithmetic on keys with a
    strictly decreasing variant (cur > 0 terminates in ceil(log3 k)
    steps); paths are canonical strings.

    Scale shape: each recursion step is a narrow projection + filter over
    the frontier (no joins, no shuffle growth); the frontier shrinks
    geometrically. For data-driven edges the same template joins the
    frontier to a broadcast edge table per step."""
    return spark.sql(
        f"""
        WITH RECURSIVE nodes AS (
            SELECT DISTINCT p_partkey AS k FROM {{part}}
            WHERE p_partkey BETWEEN 1 AND {RH_MAX_KEY}
        ), walk (start_k, cur, depth, path) AS (
            SELECT k, k, CAST(0 AS BIGINT), CAST(k AS STRING) FROM nodes
            UNION ALL
            SELECT start_k, CAST(FLOOR((cur - 1) / 3) AS BIGINT), depth + 1,
                   CONCAT(path, '>', CAST(CAST(FLOOR((cur - 1) / 3) AS BIGINT) AS STRING))
            FROM walk WHERE cur > 0
        )
        SELECT start_k, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
               CAST(0 AS BIGINT) AS root,
               MAX(CASE WHEN cur = 0 THEN path END) AS path
        FROM walk GROUP BY start_k
        """,
        part=load(spark, sf_dir, "part"),
    )


# ---------------------------------------------------------------------------
# ext_granger_causality — does revenue Granger-cause order count?
# ---------------------------------------------------------------------------


@register(
    "ext_granger_causality",
    f"""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    // {100_000} AS BIGINT) AS x,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), g AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY mth) AS BIGINT) AS t, x, y
        FROM m
    ), lagd AS (
        SELECT t, y AS yt,
               LAG(y) OVER (ORDER BY t) AS yl,
               LAG(x) OVER (ORDER BY t) AS xl
        FROM g
    ), d AS (
        SELECT t, yt, yl, xl FROM lagd WHERE yl IS NOT NULL
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(yt) AS BIGINT) AS sy,
               CAST(SUM(yl) AS BIGINT) AS sa,
               CAST(SUM(xl) AS BIGINT) AS sb,
               CAST(SUM(yl * yl) AS BIGINT) AS saa,
               CAST(SUM(xl * xl) AS BIGINT) AS sbb,
               CAST(SUM(yl * xl) AS BIGINT) AS sab,
               CAST(SUM(yt * yl) AS BIGINT) AS sya,
               CAST(SUM(yt * xl) AS BIGINT) AS syb
        FROM d
    ), coef AS (
        SELECT n,
            (CAST(n AS DOUBLE) * sya - CAST(sy AS DOUBLE) * sa)
              / (CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa) AS b_r,
            (CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * sya - CAST(sy AS DOUBLE) * sa)
              / (CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)) * sa) / n AS a_r,
            ((CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)
               * (CAST(n AS DOUBLE) * sya - CAST(sy AS DOUBLE) * sa)
             - (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
               * (CAST(n AS DOUBLE) * syb - CAST(sy AS DOUBLE) * sb))
            / ((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
               * (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)
             - (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
               * (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)) AS b_u,
            ((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
               * (CAST(n AS DOUBLE) * syb - CAST(sy AS DOUBLE) * sb)
             - (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
               * (CAST(n AS DOUBLE) * sya - CAST(sy AS DOUBLE) * sa))
            / ((CAST(n AS DOUBLE) * saa - CAST(sa AS DOUBLE) * sa)
               * (CAST(n AS DOUBLE) * sbb - CAST(sb AS DOUBLE) * sb)
             - (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)
               * (CAST(n AS DOUBLE) * sab - CAST(sa AS DOUBLE) * sb)) AS c_u
        FROM s
    ), cu AS (
        SELECT n, a_r, b_r, b_u, c_u,
               (CAST((SELECT sy FROM s) AS DOUBLE)
                - b_u * (SELECT sa FROM s) - c_u * (SELECT sb FROM s)) / n AS a_u
        FROM coef
    ), rss AS (
        SELECT
            list_reduce(list(
                (d.yt - cu.a_r - cu.b_r * d.yl) * (d.yt - cu.a_r - cu.b_r * d.yl)
                ORDER BY d.t), (p, q) -> p + q) AS rss_r,
            list_reduce(list(
                (d.yt - cu.a_u - cu.b_u * d.yl - cu.c_u * d.xl)
                * (d.yt - cu.a_u - cu.b_u * d.yl - cu.c_u * d.xl)
                ORDER BY d.t), (p, q) -> p + q) AS rss_u
        FROM d, cu
    )
    SELECT cu.n AS n_used,
           {dround('cu.b_u', 6)} AS coef_y_lag,
           {dround('cu.c_u', 6)} AS coef_x_lag,
           {dround('rss.rss_r', 4)} AS rss_restricted,
           {dround('rss.rss_u', 4)} AS rss_unrestricted,
           {dround('(rss.rss_r - rss.rss_u) / (rss.rss_u / (cu.n - 3.0))', 6)}
               AS f_stat
    FROM cu, rss
    """,
)
def ext_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality (one lag): does last month's REVENUE improve the
    forecast of this month's ORDER COUNT beyond the count's own history?
    Fits the restricted AR(1) model y_t ~ y_(t-1) and the unrestricted
    y_t ~ y_(t-1) + x_(t-1) by exact normal equations (Cramer's rule) and
    reports the incremental-RSS F statistic — the time-series causality
    screen none of the correlation keys (ext_partial_corr,
    ext_ts_rolling_corr, agg_corr_regression) answer, because correlation
    has no direction or lag.

    Exactness: the nine moments are exact integers (kilodollar revenue
    units); coefficients are fixed Cramer expressions over them; both RSS
    values fold the per-month squared residuals IN TIME ORDER on both
    engines (identical doubles in, identical fold out), then dround.

    Scale shape: the corpus collapses to the month grid in one aggregate;
    lags, moments, coefficients and the folds are grid-sized."""
    mrev = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mth"))
        .agg(
            F.floor(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                / 100_000
            )
            .cast("bigint")
            .alias("x"),
            F.count(F.lit(1)).cast("bigint").alias("y"),
        )
    )
    g = mrev.select(
        F.row_number().over(Window.orderBy("mth")).cast("bigint").alias("t"),
        "x",
        "y",
    )
    wlag = Window.orderBy("t")
    d = (
        g.select(
            "t",
            F.col("y").alias("yt"),
            F.lag("y").over(wlag).alias("yl"),
            F.lag("x").over(wlag).alias("xl"),
        )
        .filter(F.col("yl").isNotNull())
        .localCheckpoint(eager=False)
    )
    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("yt").cast("bigint").alias("sy"),
        F.sum("yl").cast("bigint").alias("sa"),
        F.sum("xl").cast("bigint").alias("sb"),
        F.sum(F.col("yl") * F.col("yl")).cast("bigint").alias("saa"),
        F.sum(F.col("xl") * F.col("xl")).cast("bigint").alias("sbb"),
        F.sum(F.col("yl") * F.col("xl")).cast("bigint").alias("sab"),
        F.sum(F.col("yt") * F.col("yl")).cast("bigint").alias("sya"),
        F.sum(F.col("yt") * F.col("xl")).cast("bigint").alias("syb"),
    )
    nd = F.col("n").cast("double")
    caa = nd * F.col("saa") - F.col("sa").cast("double") * F.col("sa")
    cbb = nd * F.col("sbb") - F.col("sb").cast("double") * F.col("sb")
    cab = nd * F.col("sab") - F.col("sa").cast("double") * F.col("sb")
    cya = nd * F.col("sya") - F.col("sy").cast("double") * F.col("sa")
    cyb = nd * F.col("syb") - F.col("sy").cast("double") * F.col("sb")
    b_r = cya / caa
    a_r = (F.col("sy").cast("double") - b_r * F.col("sa")) / F.col("n")
    det = caa * cbb - cab * cab
    b_u = (cbb * cya - cab * cyb) / det
    c_u = (caa * cyb - cab * cya) / det
    a_u = (
        F.col("sy").cast("double") - b_u * F.col("sa") - c_u * F.col("sb")
    ) / F.col("n")
    cu = s.select(
        "n",
        a_r.alias("a_r"),
        b_r.alias("b_r"),
        a_u.alias("a_u"),
        b_u.alias("b_u"),
        c_u.alias("c_u"),
    )
    dd = d.crossJoin(F.broadcast(cu))
    res_r = F.col("yt") - F.col("a_r") - F.col("b_r") * F.col("yl")
    res_u = (
        F.col("yt")
        - F.col("a_u")
        - F.col("b_u") * F.col("yl")
        - F.col("c_u") * F.col("xl")
    )

    def fold(expr):
        return F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("t", (expr * expr).alias("sq")))),
                lambda st: st["sq"],
            ),
            F.lit(0.0),
            lambda p, q: p + q,
        )

    rss = dd.agg(
        fold(res_r).alias("rss_r"),
        fold(res_u).alias("rss_u"),
        F.first("n").alias("n"),
        F.first("b_u").alias("b_u"),
        F.first("c_u").alias("c_u"),
    )
    return rss.select(
        F.col("n").alias("n_used"),
        F.round("b_u", 6).alias("coef_y_lag"),
        F.round("c_u", 6).alias("coef_x_lag"),
        F.round("rss_r", 4).alias("rss_restricted"),
        F.round("rss_u", 4).alias("rss_unrestricted"),
        F.round(
            (F.col("rss_r") - F.col("rss_u")) / (F.col("rss_u") / (F.col("n") - 3.0)),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# ext_pandas_trimmed_mean — GROUPED_AGG pandas UDF surface (exact trim)
# ---------------------------------------------------------------------------

TRIM_PCT = 10  # drop the lowest and highest 10% (by count floor) per group


@register(
    "ext_pandas_trimmed_mean",
    f"""
    WITH ev AS (
        SELECT event_type, {_CENTS_SQL} AS c FROM events
    ), r AS (
        SELECT event_type, c,
               CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY c) AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM ev
    ), kept AS (
        SELECT event_type, c, n, n - 2 * (n * {TRIM_PCT} // 100) AS n_kept
        FROM r
        WHERE rn > n * {TRIM_PCT} // 100 AND rn <= n - n * {TRIM_PCT} // 100
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(MAX(n_kept) AS BIGINT) AS n_kept,
           {dround('CAST(SUM(c) AS DOUBLE) / MAX(n_kept) / 100.0', 6)}
               AS trimmed_mean
    FROM kept GROUP BY 1
    """,
)
def ext_pandas_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interdecile trimmed mean per event type, computed through a
    GROUPED_AGG pandas UDF — the vectorized per-group Python-aggregate
    surface the registry's other escapes don't cover (scalar pandas_udf:
    ext_topk_cosine_pandas; mapInArrow: ext_arrow_length_hist;
    applyInPandas/cogroup elsewhere). The estimator DROPS each tail
    (ext_winsorize CLAMPS it, ext_outlier_mad REMOVES by a robust cut) —
    the classic robust-location alternative.

    Exactness: the UDF receives exact integer cents, sorts, slices the
    middle by integer counts (floor(n*10%) per side), and returns the
    exact int sum + kept count; the mean is ONE terminal division done
    JVM-side, so no float ever crosses the Python boundary. The oracle
    replicates the same slice with rank windows.

    Scale shape: GROUPED_AGG ships each group's column to Python as Arrow
    batches — per-type groups partition-parallel; at wider cardinality the
    same trim is expressible with the oracle's rank-window plan (kept as
    the scale path), making the UDF the API-surface demonstration."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # GROUPED_AGG pandas UDFs return one scalar per group — sum and
    # kept-count ship as two exact-integer aggregates over the same Arrow
    # batches. The Series -> scalar type hint IS the grouped-agg form
    # (SPARK-28264 inference; the explicit PandasUDFType warns deprecated).
    # This module runs under `from __future__ import annotations`, which
    # stringifies inline hints before pyspark's signature inference can
    # read them — so the real annotation objects are attached explicitly.
    def _grouped_agg_long(fn):
        fn.__annotations__ = {"c": pd.Series, "return": int}
        return pandas_udf(fn, "long")

    @_grouped_agg_long
    def trim_sum(c):
        v = c.sort_values().to_numpy()
        cut = len(v) * TRIM_PCT // 100
        return int(v[cut : len(v) - cut].sum())

    @_grouped_agg_long
    def trim_count(c):
        n = len(c)
        return int(n - 2 * (n * TRIM_PCT // 100))

    # group-agg pandas UDFs cannot mix with JVM aggregates in one agg():
    # the row count is a third UDF over the same batches.
    @_grouped_agg_long
    def grp_count(c):
        return int(len(c))

    ev = load(spark, sf_dir, "events").select(
        "event_type", _cents().alias("c")
    )
    agg = ev.groupBy("event_type").agg(
        grp_count("c").alias("n_events"),
        trim_sum("c").alias("s"),
        trim_count("c").alias("k"),
    )
    return agg.select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("k").cast("bigint").alias("n_kept"),
        F.round(
            F.col("s").cast("double") / F.col("k") / 100.0, 6
        ).alias("trimmed_mean"),
    )


# ---------------------------------------------------------------------------
# ext_markov_absorption — expected steps to absorption in the session chain
# ---------------------------------------------------------------------------

MA_ABSORB = "purchase"
MA_TRANSIENT = ["click", "error", "signup", "view"]  # sorted


def _det3(m, mul, sub, add):
    """3x3 determinant with a FIXED expansion order; m is a 3x3 of engine
    expressions, combined with the caller's mul/sub/add ops."""
    return sub(
        add(
            sub(
                mul(m[0][0], sub(mul(m[1][1], m[2][2]), mul(m[1][2], m[2][1]))),
                mul(m[0][1], sub(mul(m[1][0], m[2][2]), mul(m[1][2], m[2][0]))),
            ),
            mul(m[0][2], sub(mul(m[1][0], m[2][1]), mul(m[1][1], m[2][0]))),
        ),
        None,
    )


def _det4(m, mul, sub, add):
    """4x4 determinant by first-row cofactor expansion, fixed order."""
    def minor(col):
        return [[m[r][c] for c in range(4) if c != col] for r in range(1, 4)]

    t0 = mul(m[0][0], _det3(minor(0), mul, sub, add))
    t1 = mul(m[0][1], _det3(minor(1), mul, sub, add))
    t2 = mul(m[0][2], _det3(minor(2), mul, sub, add))
    t3 = mul(m[0][3], _det3(minor(3), mul, sub, add))
    return sub(add(sub(t0, t1), t2), t3)


def _ma_sql_ops():
    mul = lambda a, b: f"({a} * {b})"  # noqa: E731
    sub = lambda a, b: f"({a} - {b})" if b is not None else a  # noqa: E731
    add = lambda a, b: f"({a} + {b})"  # noqa: E731
    return mul, sub, add


def _ma_oracle() -> str:
    ts = MA_TRANSIENT
    counts = ", ".join(
        f"CAST(SUM(CASE WHEN src = '{i}' AND dst = '{j}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS c_{i}_{j}"
        for i in ts
        for j in ts + [MA_ABSORB]
    )
    drow = ", ".join(
        "CAST(" + " + ".join(f"c_{i}_{j}" for j in ts + [MA_ABSORB]) + f" AS BIGINT) AS d_{i}"
        for i in ts
    )
    # M[i][j] = d_i*delta_ij - c_ij as DOUBLE expressions
    m = [
        [
            (f"(CAST(d_{i} AS DOUBLE) - c_{i}_{j})" if i == j else f"(0.0 - c_{i}_{j})")
            for j in ts
        ]
        for i in ts
    ]
    rhs = [f"CAST(d_{i} AS DOUBLE)" for i in ts]
    mul, sub, add = _ma_sql_ops()
    det = _det4(m, mul, sub, add)
    rows = []
    for jidx, jname in enumerate(ts):
        mj = [[rhs[r] if c == jidx else m[r][c] for c in range(4)] for r in range(4)]
        detj = _det4(mj, mul, sub, add)
        rows.append(
            f"SELECT '{jname}' AS state, d_{jname} AS n_out, "
            f"{dround(f'CAST(c_{jname}_{MA_ABSORB} AS DOUBLE) / d_{jname}', 6)}"
            f" AS p_direct, "
            f"{dround(f'({detj}) / ({det})', 6)} AS expected_steps FROM wide"
        )
    return f"""
    WITH seq AS (
        SELECT user_id, event_type AS src,
               LEAD(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS dst
        FROM events
    ), tr AS (
        SELECT src, dst FROM seq WHERE dst IS NOT NULL
    ), wide AS (
        SELECT {counts} FROM tr
    ), wide2 AS (SELECT *, {drow} FROM wide)
    {" UNION ALL ".join(rows).replace("FROM wide", "FROM wide2")}
    """


@register("ext_markov_absorption", _ma_oracle())
def ext_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-Markov-chain analysis of the session event chain: treating
    '{MA_ABSORB}' as the absorbing state, the expected number of steps from
    each transient event type until a purchase, t = (I - Q)^-1 * 1 — the
    closed-form 'how far is each state from conversion' number that
    ext_event_transition's one-step matrix and ext_window_funnel's fixed
    sequences cannot give (it sums over ALL paths of ALL lengths).

    Exactness: transition counts and row totals are exact integers; the
    linear system is solved by CRAMER'S RULE with the 4x4 determinants
    expanded in a FIXED cofactor order over (d_i*delta - c_ij) doubles —
    both engines evaluate the identical expression tree (generated from
    one Python template), then dround.

    Scale shape: one user-partitioned LEAD window + one pair-count
    aggregate collapse the corpus to a 4x5 count matrix; the solve is a
    scalar expression on one wide row."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    ts_ = MA_TRANSIENT
    wide = tr.agg(
        *[
            F.sum(
                F.when((F.col("src") == i) & (F.col("dst") == j), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"c_{i}_{j}")
            for i in ts_
            for j in ts_ + [MA_ABSORB]
        ]
    )
    for i in ts_:
        tot = None
        for j in ts_ + [MA_ABSORB]:
            c = F.col(f"c_{i}_{j}")
            tot = c if tot is None else tot + c
        wide = wide.withColumn(f"d_{i}", tot.cast("bigint"))
    wide = wide.localCheckpoint(eager=False)

    # Determinants built as SQL STRINGS through the same _det4 template
    # the oracle uses (bit-identical fixed-order arithmetic) and parsed
    # once: Column-operator construction of the five 4x4 cofactor trees
    # cost ~1 s of py4j round trips per invocation (see
    # ext_attr_markov_removal, same fix, r11).
    mul_s, sub_s, add_s = _ma_sql_ops()
    m = [
        [
            (
                f"(CAST(d_{i} AS DOUBLE) - c_{i}_{j})"
                if i == j
                else f"(0.0D - c_{i}_{j})"
            )
            for j in ts_
        ]
        for i in ts_
    ]
    rhs = [f"CAST(d_{i} AS DOUBLE)" for i in ts_]
    det = _det4(m, mul_s, sub_s, add_s)
    rows = []
    for jidx, jname in enumerate(ts_):
        mj = [[rhs[r] if c == jidx else m[r][c] for c in range(4)] for r in range(4)]
        detj = _det4(mj, mul_s, sub_s, add_s)
        rows.append(
            wide.select(
                F.lit(jname).alias("state"),
                F.col(f"d_{jname}").alias("n_out"),
                F.round(
                    F.col(f"c_{jname}_{MA_ABSORB}").cast("double")
                    / F.col(f"d_{jname}"),
                    6,
                ).alias("p_direct"),
                F.round(F.expr(f"({detj}) / ({det})"), 6).alias(
                    "expected_steps"
                ),
            )
        )
    out = rows[0]
    for r_ in rows[1:]:
        out = out.unionByName(r_)
    return out


# ---------------------------------------------------------------------------
# ext_mediation_sobel — Baron-Kenny mediation with the Sobel test
# ---------------------------------------------------------------------------


@register(
    "ext_mediation_sobel",
    f"""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    // {100_000} AS BIGINT) AS yv,
               CAST(COUNT(*) AS BIGINT) AS mv
        FROM orders GROUP BY 1
    ), g AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY mth) AS BIGINT) AS xv, yv, mv
        FROM m
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(xv) AS BIGINT) AS sx, CAST(SUM(mv) AS BIGINT) AS sm,
               CAST(SUM(yv) AS BIGINT) AS sy,
               CAST(SUM(xv * xv) AS BIGINT) AS sxx,
               CAST(SUM(mv * mv) AS BIGINT) AS smm,
               CAST(SUM(xv * mv) AS BIGINT) AS sxm,
               CAST(SUM(xv * yv) AS BIGINT) AS sxy,
               CAST(SUM(mv * yv) AS BIGINT) AS smy
        FROM g
    ), c AS (
        SELECT n,
            CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS cxx,
            CAST(n AS DOUBLE) * smm - CAST(sm AS DOUBLE) * sm AS cmm,
            CAST(n AS DOUBLE) * sxm - CAST(sx AS DOUBLE) * sm AS cxm,
            CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS cxy,
            CAST(n AS DOUBLE) * smy - CAST(sm AS DOUBLE) * sy AS cmy
        FROM s
    ), coef AS (
        SELECT n, cxx, cmm, cxm,
               cxm / cxx AS a,
               (cxx * cmy - cxm * cxy) / (cxx * cmm - cxm * cxm) AS b,
               cxy / cxx AS c_total,
               (cmm * cxy - cxm * cmy) / (cxx * cmm - cxm * cxm) AS c_direct
        FROM c
    )
    SELECT n AS n_months,
           {dround('a', 6)} AS a_x_to_m,
           {dround('b', 6)} AS b_m_to_y,
           {dround('c_total', 6)} AS c_total,
           {dround('c_direct', 6)} AS c_direct,
           {dround('a * b', 6)} AS indirect_effect,
           {dround('a * b / c_total', 6)} AS prop_mediated
    FROM coef
    """,
)
def ext_mediation_sobel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baron-Kenny mediation decomposition on the month grid: how much of
    the time trend in revenue (X = month index -> Y = revenue) flows
    THROUGH order volume (M)? Reports the path coefficients a (X->M),
    b (M->Y | X), the total and direct effects, the indirect effect a*b
    and the proportion mediated — the causal-DECOMPOSITION question none
    of the effect-estimate keys (IPW/post-strat/DID/RDD) address: they say
    WHETHER X moves Y, this says through WHICH channel.

    Exactness: closed-form OLS from nine exact integer moments (kilodollar
    revenue units); every coefficient is a fixed centered-moment
    expression (identical op order both engines), then dround. Note
    a*b == c_total - c_direct (the classic identity) — a free internal
    consistency check on the algebra.

    Scale shape: one month-grid aggregate collapses the corpus; the
    decomposition is one scalar row."""
    mrev = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mth"))
        .agg(
            F.floor(
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                / 100_000
            )
            .cast("bigint")
            .alias("yv"),
            F.count(F.lit(1)).cast("bigint").alias("mv"),
        )
    )
    g = mrev.select(
        F.row_number().over(Window.orderBy("mth")).cast("bigint").alias("xv"),
        "yv",
        "mv",
    )
    s = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("xv").cast("bigint").alias("sx"),
        F.sum("mv").cast("bigint").alias("sm"),
        F.sum("yv").cast("bigint").alias("sy"),
        F.sum(F.col("xv") * F.col("xv")).cast("bigint").alias("sxx"),
        F.sum(F.col("mv") * F.col("mv")).cast("bigint").alias("smm"),
        F.sum(F.col("xv") * F.col("mv")).cast("bigint").alias("sxm"),
        F.sum(F.col("xv") * F.col("yv")).cast("bigint").alias("sxy"),
        F.sum(F.col("mv") * F.col("yv")).cast("bigint").alias("smy"),
    )
    nd = F.col("n").cast("double")
    cxx = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    cmm = nd * F.col("smm") - F.col("sm").cast("double") * F.col("sm")
    cxm = nd * F.col("sxm") - F.col("sx").cast("double") * F.col("sm")
    cxy = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    cmy = nd * F.col("smy") - F.col("sm").cast("double") * F.col("sy")
    a = cxm / cxx
    b = (cxx * cmy - cxm * cxy) / (cxx * cmm - cxm * cxm)
    c_total = cxy / cxx
    c_direct = (cmm * cxy - cxm * cmy) / (cxx * cmm - cxm * cxm)
    return s.select(
        F.col("n").alias("n_months"),
        F.round(a, 6).alias("a_x_to_m"),
        F.round(b, 6).alias("b_m_to_y"),
        F.round(c_total, 6).alias("c_total"),
        F.round(c_direct, 6).alias("c_direct"),
        F.round(a * b, 6).alias("indirect_effect"),
        F.round(a * b / c_total, 6).alias("prop_mediated"),
    )


# ---------------------------------------------------------------------------
# ext_jackknife_ratio — delete-one-group jackknife SE for a ratio metric
# ---------------------------------------------------------------------------


@register(
    "ext_jackknife_ratio",
    f"""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate) AS mth,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS s_i,
               CAST(COUNT(*) AS BIGINT) AS n_i
        FROM orders GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS grp,
               CAST(SUM(s_i) AS BIGINT) AS s,
               CAST(SUM(n_i) AS BIGINT) AS n
        FROM m
    ), loo AS (
        SELECT m.mth,
               CAST(tot.s - m.s_i AS DOUBLE) / (tot.n - m.n_i) AS r_i,
               tot.grp, tot.s, tot.n
        FROM m, tot
    ), folds AS (
        SELECT MAX(grp) AS grp, MAX(s) AS s, MAX(n) AS n,
               list_reduce(list(r_i ORDER BY mth), (p, q) -> p + q) AS sr,
               list_reduce(list(r_i * r_i ORDER BY mth), (p, q) -> p + q)
                   AS srr
        FROM loo
    )
    SELECT CAST(grp AS BIGINT) AS n_groups,
           {dround('CAST(s AS DOUBLE) / n / 100.0', 6)} AS ratio_full,
           {dround('sqrt((CAST(grp AS DOUBLE) - 1.0) / grp'
                   ' * (srr - sr * sr / grp)) / 100.0', 6)} AS jk_se
    FROM folds
    """,
)
def ext_jackknife_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP jackknife standard error for the revenue-per-order
    ratio, deleting one month at a time: the classical resampling SE for
    RATIO metrics, whose naive per-row variance is biased because
    numerator and denominator co-vary (ext_bootstrap_ci resamples with
    multiplier weights; the jackknife is its deterministic, closed-form
    sibling — every leave-one-out replicate is computed ALGEBRAICALLY from
    group totals, no resampling at all).

    Exactness: month totals are exact cents/count integers; each replicate
    ratio (S - s_i)/(N - n_i) is ONE division of exact integers; the sum
    and sum-of-squares of replicates fold IN MONTH ORDER on both engines;
    the SE is a fixed expression of the folds, then dround.

    Scale shape: one month-grid aggregate collapses the corpus; the
    replicates are grid-sized algebra — the delete-one-group construction
    is exactly how jackknife scales (delete-one-ROW would be n replicates;
    delete-one-group is #groups)."""
    m = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mth"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("s_i"),
            F.count(F.lit(1)).cast("bigint").alias("n_i"),
        )
    )
    tot = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("grp"),
        F.sum("s_i").cast("bigint").alias("s"),
        F.sum("n_i").cast("bigint").alias("n"),
    )
    loo = m.crossJoin(F.broadcast(tot)).select(
        "mth",
        ((F.col("s") - F.col("s_i")).cast("double") / (F.col("n") - F.col("n_i"))).alias("r_i"),
        "grp",
        "s",
        "n",
    )

    def fold(expr):
        return F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("mth", expr.alias("v")))),
                lambda st: st["v"],
            ),
            F.lit(0.0),
            lambda p, q: p + q,
        )

    folds = loo.agg(
        F.max("grp").alias("grp"),
        F.max("s").alias("s"),
        F.max("n").alias("n"),
        fold(F.col("r_i")).alias("sr"),
        fold(F.col("r_i") * F.col("r_i")).alias("srr"),
    )
    gd = F.col("grp").cast("double")
    return folds.select(
        F.col("grp").cast("bigint").alias("n_groups"),
        F.round(F.col("s").cast("double") / F.col("n") / 100.0, 6).alias(
            "ratio_full"
        ),
        F.round(
            F.sqrt(
                (gd - 1.0) / F.col("grp")
                * (F.col("srr") - F.col("sr") * F.col("sr") / F.col("grp"))
            )
            / 100.0,
            6,
        ).alias("jk_se"),
    )
