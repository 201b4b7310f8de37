"""Round-4 batch-F operators: distributed ML / graph primitives for the
training-data pipeline — bounded-round Lloyd k-means on integer-quantized
embeddings, degree-capped common-neighbor link prediction, reciprocal
nearest-neighbor pairing, and leave-one-out k-NN label evaluation.

Every key keeps the registry's exactness disciplines (scale_ops.py
header): integer quantization before any cross-engine float,
ratio-of-identical-integers for doubles, FLOOR (never engine-default int
casts) for quantization steps, total-order tiebreaks, terminal dround(6).

New named patterns this module demonstrates:

- ext_kmeans_lloyd: iterative ML made hash-checkable — embedding
  components are FLOOR-quantized to integer micro-units once, and every
  round's centroid is itself re-quantized to integer micro-units
  (FLOOR of an exact ratio-of-int64 double), so assignments compare
  exact int64 squared distances and the whole iteration is
  float-determinism-free on both engines.
- ext_graph_link_predict: the production answer to hub fan-out — the
  wedge join runs on an EXPLICITLY capped adjacency (top-{LP_MAXDEG}
  neighbors per node by id), bounding work at nodes * cap^2 instead of
  sum(deg^2) (298M wedges at sf0.1 uncapped; 8.7M capped). The cap is
  part of the key's contract and the oracle replays it.
- ext_embed_reciprocal_nn / ext_embed_knn_classify: the rounded-cosine
  total order (cosine@6dp DESC, id ASC) from ext_topk_cosine reused so
  argmax-style picks (nearest neighbor, majority label) can never flip
  on a last-ulp dot-product difference.

Reference parity: the reference exposes only dbt SQL models
(/root/reference/models/*.sql); these keys are beyond-reference
analytics surface mandated by the build brief.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load
from . import dround, register

# ---------------------------------------------------------------------------
# ext_kmeans_lloyd — bounded-round Lloyd k-means on quantized embeddings
# ---------------------------------------------------------------------------

KM_K = 4  # clusters (seeds = the K lowest vec_ids)
KM_ROUNDS = 3  # Lloyd rounds (bounded-budget contract, both engines)
KM_SCALE = 1_000_000  # micro-unit quantization of float32 components

# Quantized points, tidy (vec_id, dim, q) — shared by the oracle builder.
_KM_PTS_SQL = f"""pts AS MATERIALIZED (
        SELECT vec_id, CAST(pos - 1 AS INTEGER) AS dim,
               CAST(FLOOR(x * {KM_SCALE}) AS BIGINT) AS q
        FROM (
            SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
                   generate_subscripts(embedding, 1) AS pos
            FROM embeddings
        )
    )"""


def _kmeans_oracle() -> str:
    lines = [
        f"""
    WITH {_KM_PTS_SQL},
    c0 AS MATERIALIZED (
        SELECT vec_id AS cluster, dim, q AS c FROM pts WHERE vec_id < {KM_K}
    )"""
    ]
    for r in range(1, KM_ROUNDS + 1):
        lines.append(
            f""", d{r} AS MATERIALIZED (
        SELECT p.vec_id, c.cluster,
               CAST(SUM((p.q - c.c) * (p.q - c.c)) AS BIGINT) AS dist2
        FROM pts p JOIN c{r - 1} c ON p.dim = c.dim
        GROUP BY p.vec_id, c.cluster
    ), a{r} AS MATERIALIZED (
        SELECT vec_id, cluster, dist2 FROM d{r}
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist2, cluster) = 1
    ), c{r} AS MATERIALIZED (
        SELECT a.cluster, p.dim,
               CAST(FLOOR(CAST(CAST(SUM(p.q) AS BIGINT) AS DOUBLE)
                          / COUNT(*)) AS BIGINT) AS c
        FROM a{r} a JOIN pts p ON a.vec_id = p.vec_id
        GROUP BY a.cluster, p.dim
    )"""
        )
    stats = "\n    UNION ALL\n".join(
        f"""    SELECT {r} AS round, cluster,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(dist2) AS BIGINT) AS inertia
    FROM a{r} GROUP BY cluster"""
        for r in range(1, KM_ROUNDS + 1)
    )
    return "".join(lines) + f"\n{stats}\n    ORDER BY round, cluster\n"


@register("ext_kmeans_lloyd", _kmeans_oracle())
def ext_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round Lloyd k-means over the embedding corpus (K = KM_K,
    KM_ROUNDS rounds, seeds = the K lowest vec_ids), reporting per-round
    cluster sizes and exact integer inertia — the clustering pass behind
    corpus curation (topic balancing, IVF coarse quantizers, dedup
    pre-grouping). Same bounded-iteration contract as ext_graph_pagerank
    / ext_graph_kcore: a fixed round budget is the honest distributed
    form.

    Determinism: components are FLOOR-quantized once to integer
    micro-units (KM_SCALE); each round's centroid component is
    re-quantized to FLOOR(sum/count) where sum <= 2^53 stays exact in
    the double divide, so squared distances are exact int64 and the
    argmin tiebreak (dist2, cluster) is a total order. No float ever
    crosses engines.

    Scale shape: points live in tidy (vec_id, dim, q) form; each round
    is one broadcast hash join of the K*64-row centroid table onto the
    point partitions, a (vec_id, cluster)-keyed partial-agg distance
    reduce, a vec_id-keyed argmin, and a (cluster, dim) centroid reduce
    — all map-side combined, no driver-side state; per-round frames are
    lazily localCheckpointed so lineage stays linear in rounds. int64
    bounds: |q| <= 5e5 so dist2 <= 64 * (1.1e6)^2 ~ 7.7e13; inertia
    adds N of those (widened to decimal(38,0) before the final sum, cast
    back for the report); centroid sums stay double-exact below 2^53 ~
    9e15, i.e. up to ~1.8e10 points per cluster — beyond that, switch
    the divide to decimal. Cited parity anchor: /root/reference/models
    (no ML ops in the reference; beyond-reference surface)."""
    emb = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim", "x")
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("x").cast("double") * KM_SCALE).cast("long").alias("q"),
    ).localCheckpoint(eager=False)

    cent = (
        pts.filter(F.col("vec_id") < KM_K)
        .select(F.col("vec_id").alias("cluster"), "dim", F.col("q").alias("c"))
    )
    stats = []
    for r in range(1, KM_ROUNDS + 1):
        dist = (
            pts.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cluster")
            .agg(
                F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
                .alias("dist2")
            )
        )
        assign = (
            dist.groupBy("vec_id")
            .agg(F.min(F.struct("dist2", "cluster")).alias("m"))
            .select(
                "vec_id",
                F.col("m.cluster").alias("cluster"),
                F.col("m.dist2").alias("dist2"),
            )
            .localCheckpoint(eager=False)  # linear lineage across rounds
        )
        cent = (
            assign.select("vec_id", "cluster")
            .join(pts, "vec_id")
            .groupBy("cluster", "dim")
            .agg(
                F.floor(
                    F.sum("q").cast("double") / F.count(F.lit(1))
                ).cast("long").alias("c")
            )
            .localCheckpoint(eager=False)
        )
        stats.append(
            assign.groupBy("cluster").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_points"),
                F.sum(F.col("dist2").cast("decimal(38,0)"))
                .cast("bigint")
                .alias("inertia"),
            ).select(F.lit(r).alias("round"), "cluster", "n_points", "inertia")
        )
    out = stats[0]
    for s_df in stats[1:]:
        out = out.unionByName(s_df)
    return out.orderBy("round", "cluster")


# ---------------------------------------------------------------------------
# ext_graph_link_predict — degree-capped common-neighbor link prediction
# ---------------------------------------------------------------------------

LP_MAXDEG = 30  # per-node adjacency cap (lowest-id neighbors kept)
LP_TOPN = 25  # reported candidate pairs


@register(
    "ext_graph_link_predict",
    f"""
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), adj AS MATERIALIZED (
        SELECT node, nbr FROM (
            SELECT u AS node, v AS nbr FROM e0
            UNION ALL
            SELECT v AS node, u AS nbr FROM e0
        )
        QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY nbr)
                <= {LP_MAXDEG}
    ), deg AS MATERIALIZED (
        -- reverse degree: in how many capped lists does this node appear?
        SELECT nbr AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM adj GROUP BY nbr
    ), cand AS MATERIALIZED (
        SELECT x.nbr AS a, y.nbr AS b, CAST(COUNT(*) AS BIGINT) AS cn
        FROM adj x JOIN adj y ON x.node = y.node AND x.nbr < y.nbr
        GROUP BY x.nbr, y.nbr
    ), nonedge AS (
        SELECT c.a, c.b, c.cn FROM cand c
        LEFT JOIN e0 ON e0.u = c.a AND e0.v = c.b
        WHERE e0.u IS NULL
    )
    SELECT n.a AS node_a, n.b AS node_b, n.cn AS common_neighbors,
           da.deg AS deg_a, db.deg AS deg_b,
           {dround('n.cn * 1.0 / (da.deg + db.deg - n.cn)', 6)} AS jaccard
    FROM nonedge n
    JOIN deg da ON da.node = n.a
    JOIN deg db ON db.node = n.b
    ORDER BY n.cn DESC, n.a, n.b
    LIMIT {LP_TOPN}
    """,
)
def ext_graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the co-purchase graph: the top-{LP_TOPN}
    NON-adjacent part pairs by common-neighbor count, with the Jaccard
    coefficient of their neighborhoods — the classic recommender /
    graph-completion screen.

    The adjacency is explicitly capped at the {LP_MAXDEG} lowest-id
    neighbors per node BEFORE the wedge join ('no silent caps': the cap
    is the key's documented contract, replayed identically by the
    oracle). Uncapped, wedge work is sum(deg^2) — 298M rows at sf0.1 and
    quadratic in hub degree at 100 TB; capped it is <= nodes * C(cap,2)
    (~8.7M), the standard production bound (DIMSUM-style neighborhood
    capping). The scored sets are the REVERSE capped neighborhoods
    R(x) = {{z : x in adjcap(z)}} — cn = |R(a) ∩ R(b)| is exactly what
    the capped wedge join counts, and deg is |R(x)|, so the Jaccard
    denominator |R(a) ∪ R(b)| is always >= 1 for any emitted pair
    (co-citation Jaccard with capped citing lists).

    Determinism: counts and degrees are exact integers; jaccard divides
    identical int64s (IEEE-identical both engines), dround(6); the
    top-{LP_TOPN} order (cn DESC, a, b) is a total order.

    Scale shape: the adjacency is per-node sorted neighbor arrays
    (ext/graph.py:adjacency_sets — one node-keyed fold, no edge
    distinct, no directional union); the degree cap is an array slice
    (the lowest-id neighbors ARE the sorted prefix — the node-keyed
    row_number window disappears), and the wedge "self-join" is in-row
    pair enumeration inside each capped array (every (a < b) wedge
    through a middle node is a pair within its sorted capped
    neighborhood — no join at all), into one (a,b)-keyed count reduce,
    an anti join against the edge list (re-derived from the same arrays
    map-side), then TakeOrdered — no driver-side state. Cited parity
    anchor: /root/reference/models (no graph ops in the reference;
    beyond-reference surface)."""
    from ..ext.graph import _PAIR_EXPR, shared_adjacency

    # session-shared persisted adjacency (ext/graph.py:_GRAPH_CACHE)
    adj = shared_adjacency(
        spark,
        sf_dir,
        lambda: load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ),
    )  # 3 consumers
    cap = adj.select("node", F.slice("nbrs", 1, LP_MAXDEG).alias("ps"))
    deg = (
        cap.select(F.explode("ps").alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    cand = (
        cap.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select(F.col("p.u").alias("a"), F.col("p.v").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cn"))
    )
    # Edge screen WITHOUT materializing the edge list: (a, b) with a < b
    # is an edge iff b ∈ nbrs(a) (adj is symmetric), so join the wedge
    # pairs to the per-node neighbor ARRAYS once on a and test membership
    # in-row. The previous two-key anti join against the exploded (u, v)
    # list rebuilt+broadcast ~1.2M edge rows per invocation — the key's
    # single largest stage (profiled 1.9-3.8 s of its 2.5-6 s) — where
    # the array side is only |nodes| rows (§2.3 "shuffle keys and
    # metadata instead of payloads"; here: don't explode at all). Every
    # cand.a is a node of adj by construction (it appears in some capped
    # neighborhood, and adjacency is symmetric), so the inner join drops
    # nothing the anti join kept.
    nonedge = (
        cand.join(
            adj.select(F.col("node").alias("a"), F.col("nbrs").alias("_na")),
            "a",
        )
        .filter(~F.array_contains("_na", F.col("b")))
        .drop("_na")
    )
    return (
        nonedge.join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), "a")
        .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), "b")
        .select(
            F.col("a").alias("node_a"),
            F.col("b").alias("node_b"),
            F.col("cn").alias("common_neighbors"),
            "deg_a",
            "deg_b",
            F.round(
                F.col("cn") * 1.0 / (F.col("deg_a") + F.col("deg_b") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("common_neighbors"), "node_a", "node_b")
        .limit(LP_TOPN)
    )


ext_graph_link_predict.__doc__ = ext_graph_link_predict.__doc__.replace(
    "{LP_TOPN}", str(LP_TOPN)
).replace("{LP_MAXDEG}", str(LP_MAXDEG))


# ---------------------------------------------------------------------------
# shared: all-pairs rounded cosine over the embedding corpus
# ---------------------------------------------------------------------------

# DuckDB twin of _topk_scored()'s semantics — rounded cosine for every
# ordered pair (the oracle brute-forces what the Spark side prunes).
_SCORED_SQL = f"""e AS MATERIALIZED (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), scored AS MATERIALIZED (
        SELECT a.vec_id AS qid, b.vec_id AS nid, b.label AS nlabel,
               {dround('list_cosine_similarity(a.v, b.v)', 6)} AS cosine
        FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )"""


PROBE_MAX = 65_536  # loud bound on the collected probe matrix (no silent cap)
_NN_MARGIN = 4e-6  # raw-score slack covering 6dp rounding + both engines' ulps

# Memoized probe-side broadcasts, keyed by (applicationId, sf_dir). All six
# _topk_scored consumers (reciprocal_nn, knn_classify, mrr, ndcg, outlier_knn,
# lof) probe the IDENTICAL (ids, matrix, norms) trio for a given corpus, so
# re-broadcasting per call both wastes executor memory and — worse — leaks:
# a long bench session (3 passes x ~6 consumers) accumulated 45+ live
# embedding-matrix broadcasts, degrading sibling keys 2-4x. The cache keeps
# AT MOST ONE live trio per Spark application: a lookup miss first unpersists
# every cached entry (other sf_dirs, dead sessions) before broadcasting anew.
# Assumptions (shared with the graph / PCA / IVF caches): sf_dir parquet is
# immutable for the application's lifetime (the key carries no data
# fingerprint), and callers are a single driver thread (_PROBE_LOCK
# serializes the miss path so concurrent first calls can't double-build and
# orphan a live broadcast trio).
_PROBE_CACHE: dict = {}
_PROBE_LOCK = threading.RLock()


def _probe_broadcasts(spark: SparkSession, sf_dir: str):
    """Return (b_ids, b_mat, b_norms) broadcasts for sf_dir's embeddings,
    memoized per (applicationId, sf_dir) with single-entry eviction."""
    key = (spark.sparkContext.applicationId, sf_dir)
    with _PROBE_LOCK:
        hit = _PROBE_CACHE.get(key)
        if hit is not None:
            return hit
        clear_probe_cache()
        trio = _probe_build(spark, sf_dir)
        _PROBE_CACHE[key] = trio
        return trio


def _probe_build(spark: SparkSession, sf_dir: str):
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    pdf = emb.select("vec_id", "embedding").toPandas()
    if len(pdf) > PROBE_MAX:
        raise ValueError(
            f"brute-force probe matrix has {len(pdf)} rows > PROBE_MAX="
            f"{PROBE_MAX}; sample the corpus or use the ext_ann_* keys"
        )
    order = np.argsort(pdf["vec_id"].to_numpy())
    ids = pdf["vec_id"].to_numpy()[order]
    mat = np.stack(pdf["embedding"].to_numpy()[order]).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    return (
        spark.sparkContext.broadcast(ids),
        spark.sparkContext.broadcast(mat),
        spark.sparkContext.broadcast(norms),
    )


def clear_probe_cache() -> None:
    """Unpersist and drop every cached probe broadcast. _probe_broadcasts
    calls this on every cache miss, so a session never holds more than one
    live trio; long-lived sessions done with the embedding family can call
    it directly to release the executor memory (bench.py deliberately does
    NOT — the warm trio is session-index state, see its protocol note)."""
    with _PROBE_LOCK:
        for cached in _PROBE_CACHE.values():
            for b in cached:
                try:
                    b.unpersist(blocking=False)
                except Exception:
                    pass  # session already stopped; nothing to free
        _PROBE_CACHE.clear()


def _topk_scored(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(qid, nid, nlabel, cosine@6dp, rk) for each vector's top-k
    neighbors by the registry's total order (cosine@6dp DESC, nid ASC).

    Two-stage exact top-k — the production shape for bounded-corpus
    rerank stages:

    1. CANDIDATE PRUNE (numpy, Arrow-batched mapInPandas): the probe
       matrix (this corpus, <= PROBE_MAX rows — a loud error beyond
       that; at 100 TB the probe side of an evaluation pass is a bounded
       sample by construction) is matmul'd against each corpus batch;
       rows keep every neighbor within _NN_MARGIN of their k-th best
       raw score. BLAS summation order differs from the engines' fold,
       so numpy scores are NEVER emitted — they only gate candidacy,
       and the margin absorbs far more than the ~1e-15 disagreement.
    2. EXACT RERANK (JVM fold): the surviving ~k rows per vector get
       the same left-to-right zip-fold cosine DuckDB's sequential
       list_cosine_similarity computes, bit-identical, then the rounded
       window rank. The 4M-pair fold join this replaces ran 26 s at
       sf0.1; the pruned rerank folds ~N*k rows.
    """
    import numpy as np

    emb = load(spark, sf_dir, "embeddings")
    b_ids, b_mat, b_norms = _probe_broadcasts(spark, sf_dir)

    def gen(batches):
        import pandas as pd

        m, n, i = b_mat.value, b_norms.value, b_ids.value
        for b in batches:
            v = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            vn = np.linalg.norm(v, axis=1)
            s = (v @ m.T) / np.outer(vn, n)
            qid = b["vec_id"].to_numpy()
            s[i[None, :] == qid[:, None]] = -np.inf  # self-exclusion
            kk = min(k, s.shape[1] - 1)
            kth = np.partition(s, -kk, axis=1)[:, -kk]
            keep = s >= (kth[:, None] - _NN_MARGIN)
            rows, cols = np.nonzero(keep)
            yield pd.DataFrame({"qid": qid[rows], "nid": i[cols]})

    cand = emb.select("vec_id", "embedding").mapInPandas(
        gen, schema="qid long, nid long"
    )

    from ..ext import similarity as sim

    side = sim.with_norm(emb)
    qa = side.select(
        F.col("vec_id").alias("qid"),
        F.col("_v").alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    cb = side.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("nlabel"),
        F.col("_v").alias("_cv"),
        F.col("_norm").alias("_cn"),
    )
    return (
        cand.join(F.broadcast(qa), "qid")
        .join(F.broadcast(cb), "nid")
        .select(
            "qid",
            "nid",
            "nlabel",
            F.round(
                sim.cosine(F.col("_qv"), F.col("_qn"), F.col("_cv"), F.col("_cn")),
                6,
            ).alias("cosine"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cosine"), "nid")
            ),
        )
        .filter(F.col("rk") <= k)
    )


# ---------------------------------------------------------------------------
# ext_embed_reciprocal_nn — mutual nearest-neighbor pairs
# ---------------------------------------------------------------------------


@register(
    "ext_embed_reciprocal_nn",
    f"""
    WITH {_SCORED_SQL}, t1 AS MATERIALIZED (
        SELECT qid, nid, cosine FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, nid) = 1
    )
    SELECT m1.qid AS vec_a, m1.nid AS vec_b, m1.cosine
    FROM t1 m1 JOIN t1 m2 ON m1.nid = m2.qid AND m2.nid = m1.qid
    WHERE m1.qid < m1.nid
    """,
)
def ext_embed_reciprocal_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal nearest-neighbor pairs: (a, b) where b is a's top-1
    cosine neighbor AND a is b's — the high-precision pairing primitive
    behind bitext mining, record-linkage seeding, and semantic-dup
    anchoring (a strictly stronger signal than one-directional top-1).

    Determinism: top-1 is picked on the ROUNDED cosine with an id
    tiebreak (ext_topk_cosine's total order); the rounded cosine is
    symmetric (same zip-fold in the same dim order both directions), so
    mutuality is well-defined.

    Scale shape: brute-force all-pairs scoring is the deliberately
    bounded verify-stage primitive (the ANN family is the 100 TB path);
    the mutual check itself is one qid-keyed self-join of the N-row
    top-1 table. Cited parity anchor: /root/reference/models (no vector
    ops in the reference; beyond-reference surface)."""
    t1 = (
        _topk_scored(spark, sf_dir, k=1)
        .select("qid", "nid", "cosine")
        .localCheckpoint(eager=False)  # both sides of the mutual join
    )
    m2 = t1.select(F.col("qid").alias("b_qid"), F.col("nid").alias("b_nid"))
    return (
        t1.join(m2, (t1.nid == F.col("b_qid")) & (t1.qid == F.col("b_nid")))
        .filter(F.col("qid") < F.col("nid"))
        .select(
            F.col("qid").alias("vec_a"),
            F.col("nid").alias("vec_b"),
            "cosine",
        )
    )


# ---------------------------------------------------------------------------
# ext_embed_knn_classify — leave-one-out k-NN label evaluation
# ---------------------------------------------------------------------------

KNN_K = 5  # neighbors voting


@register(
    "ext_embed_knn_classify",
    f"""
    WITH {_SCORED_SQL}, topk AS MATERIALIZED (
        SELECT qid, nlabel FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, nid) <= {KNN_K}
    ), votes AS (
        SELECT qid, nlabel, COUNT(*) AS cnt FROM topk GROUP BY qid, nlabel
    ), pred AS (
        SELECT qid, nlabel AS pred FROM votes
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cnt DESC, nlabel) = 1
    )
    SELECT e.label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           {dround('''SUM(CASE WHEN p.pred = e.label THEN 1 ELSE 0 END)
                      * 1.0 / COUNT(*)''', 6)} AS accuracy
    FROM e JOIN pred p ON p.qid = e.vec_id
    GROUP BY e.label
    ORDER BY e.label
    """,
)
def ext_embed_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out k-NN label evaluation (k = KNN_K): each vector is
    classified by majority label among its k nearest neighbors
    (excluding itself) and scored against its own label, reported as
    per-label accuracy — the standard embedding-quality probe (how
    label-separable is the space?), complementing
    ext_embed_centroid_classify's parametric sibling.

    Determinism: neighbor rank is (cosine@6dp DESC, nid) — a total
    order; the majority vote tiebreaks (count DESC, label ASC); the
    accuracy divides identical integers, dround(6).

    Scale shape: same bounded brute-force scoring primitive as
    ext_embed_reciprocal_nn (ANN buckets replace it at 100 TB); the
    vote and the accuracy rollup are qid- and label-keyed reduces with
    map-side combine. Cited parity anchor: /root/reference/models (no
    vector ops in the reference; beyond-reference surface)."""
    topk = _topk_scored(spark, sf_dir, k=KNN_K).select("qid", "nlabel")
    pred = (
        topk.groupBy("qid", "nlabel")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "prk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cnt"), "nlabel")
            ),
        )
        .filter(F.col("prk") == 1)
        .select("qid", F.col("nlabel").alias("pred"))
    )
    truth = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    hit = F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0))
    return (
        truth.join(pred, truth.vec_id == pred.qid)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            hit.cast("bigint").alias("n_correct"),
            F.round(hit * 1.0 / F.count(F.lit(1)), 6).alias("accuracy"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# ext_attr_shapley — exact Shapley-value marketing attribution
# ---------------------------------------------------------------------------

# Non-purchase channels, bit per channel (alphabetical).
ATTR_CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]
_N_CH = len(ATTR_CHANNELS)  # 4 -> 16 coalition masks, weights over 4! = 24

_SHAP_MASK_SQL = " + ".join(
    f"MAX(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END) * {bit}"
    for ch, bit in ATTR_CHANNELS
)
_SHAP_W_SQL = """CASE bit_count(v0.mask) WHEN 0 THEN 6 WHEN 1 THEN 2
                      WHEN 2 THEN 2 ELSE 6 END / 24.0"""
_SHAP_CH_VALUES = ", ".join(f"('{ch}', {bit})" for ch, bit in ATTR_CHANNELS)


@register(
    "ext_attr_shapley",
    f"""
    WITH per_user AS MATERIALIZED (
        SELECT user_id,
               {_SHAP_MASK_SQL} AS mask,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY user_id
    ), stats AS (
        SELECT mask, COUNT(*) AS u, SUM(conv) AS c FROM per_user GROUP BY mask
    ), v AS MATERIALIZED (
        SELECT m.mask, COALESCE(s.u, 0) AS u, COALESCE(s.c, 0) AS c,
               CASE WHEN COALESCE(s.u, 0) > 0
                    THEN COALESCE(s.c, 0) * 1.0 / s.u ELSE 0.0 END AS v
        FROM (SELECT unnest(generate_series(0, 15)) AS mask) m
        LEFT JOIN stats s ON s.mask = m.mask
    ), ch AS (
        SELECT * FROM (VALUES {_SHAP_CH_VALUES}) AS t(channel, bit)
    ), terms AS (
        SELECT ch.channel,
               CAST(ROUND(({_SHAP_W_SQL}) * (v1.v - v0.v) * 1000000000.0)
                    AS BIGINT) AS units
        FROM ch
        JOIN v v0 ON (v0.mask & ch.bit) = 0
        JOIN v v1 ON v1.mask = v0.mask + ch.bit
    ), diag AS (
        SELECT ch.channel,
               CAST(SUM(s.u) AS BIGINT) AS n_users,
               CAST(SUM(s.c) AS BIGINT) AS n_conversions
        FROM ch JOIN v s ON (s.mask & ch.bit) <> 0
        GROUP BY ch.channel
    )
    SELECT t.channel, d.n_users, d.n_conversions,
           {dround('SUM(t.units) / 1000000000.0', 6)} AS shapley_value
    FROM terms t JOIN diag d ON d.channel = t.channel
    GROUP BY t.channel, d.n_users, d.n_conversions
    ORDER BY t.channel
    """,
)
def ext_attr_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value conversion attribution over the four
    non-purchase channels: each user's touch coalition is a 4-bit mask,
    v(S) = conversion rate of users whose coalition is exactly S, and
    each channel's Shapley value sums the weighted marginal lifts
    |S|!(n-1-|S|)!/n! * (v(S+i) - v(S)) over all 8 coalitions without it
    — the game-theoretic attribution model that first/last-touch
    (ext_session_attribution) approximates, exactly computable because
    the channel set is small (2^4 coalitions).

    Determinism: v is a ratio of exact integers; the weight is a ratio
    of small integer literals; every marginal term is snapped to integer
    1e-9 units per coalition BEFORE summing (the ext_drift_psi
    discipline), so the 8-term sum is an exact BIGINT reduce.

    Scale shape: ONE user-keyed aggregate builds coalitions (map-side
    combined bitmask OR), collapsing the corpus to <= 16 mask rows;
    everything after runs on the 16-row grid joined to a 4-row channel
    table — driver-free and constant-size at any corpus scale. Cited
    parity anchor: /root/reference/models (attribution is
    beyond-reference surface)."""
    ev = load(spark, sf_dir, "events")
    mask = None
    for ch, bit in ATTR_CHANNELS:
        t = F.max(F.when(F.col("event_type") == ch, 1).otherwise(0)) * bit
        mask = t if mask is None else mask + t
    per_user = ev.groupBy("user_id").agg(
        mask.alias("mask"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        ),
    )
    stats = per_user.groupBy("mask").agg(
        F.count(F.lit(1)).alias("u"), F.sum("conv").alias("c")
    )
    universe = spark.range(16).select(F.col("id").cast("int").alias("mask"))
    v = (
        universe.join(F.broadcast(stats), "mask", "left")
        .select(
            "mask",
            F.coalesce("u", F.lit(0)).alias("u"),
            F.coalesce("c", F.lit(0)).alias("c"),
            F.when(
                F.coalesce("u", F.lit(0)) > 0,
                F.coalesce("c", F.lit(0)) * 1.0 / F.col("u"),
            )
            .otherwise(F.lit(0.0))
            .alias("v"),
        )
        .localCheckpoint(eager=False)  # feeds v0, v1 and the diagnostics
    )
    chan = spark.createDataFrame(ATTR_CHANNELS, ["channel", "bit"])
    v0 = v.select(F.col("mask"), F.col("v").alias("v0"))
    v1 = v.select(F.col("mask").alias("mask1"), F.col("v").alias("v1"))
    s = F.bit_count(F.col("mask"))
    wnum = (
        F.when(s == 0, 6).when(s == 1, 2).when(s == 2, 2).otherwise(6)
    )
    terms = (
        F.broadcast(chan)
        .join(v0, (F.col("mask").bitwiseAND(F.col("bit"))) == 0)
        .join(v1, F.col("mask1") == F.col("mask") + F.col("bit"))
        .select(
            "channel",
            F.round((wnum / 24.0) * (F.col("v1") - F.col("v0")) * 1e9, 0)
            .cast("bigint")
            .alias("units"),
        )
    )
    diag = (
        F.broadcast(chan)
        .join(v, (F.col("mask").bitwiseAND(F.col("bit"))) != 0)
        .groupBy("channel")
        .agg(
            F.sum("u").cast("bigint").alias("n_users"),
            F.sum("c").cast("bigint").alias("n_conversions"),
        )
    )
    return (
        terms.groupBy("channel")
        .agg(F.round(F.sum("units") / 1e9, 6).alias("shapley_value"))
        .join(diag, "channel")
        .select("channel", "n_users", "n_conversions", "shapley_value")
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# ext_graph_bfs_reach — bounded-hop multi-source BFS reachability
# ---------------------------------------------------------------------------

BFS_SEED_MAX = 3  # seeds: co-purchase nodes with part key <= this
BFS_HOPS = 4  # hop budget (bounded-iteration contract, both engines)


def _bfs_oracle() -> str:
    head = f"""
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), adj AS MATERIALIZED (
        SELECT u AS node, v AS nbr FROM e0
        UNION ALL
        SELECT v AS node, u AS nbr FROM e0
    ), f0 AS MATERIALIZED (
        SELECT DISTINCT node FROM adj WHERE node <= {BFS_SEED_MAX}
    ), vis0 AS MATERIALIZED (SELECT node FROM f0)"""
    rounds = []
    for r in range(1, BFS_HOPS + 1):
        rounds.append(
            f""", f{r} AS MATERIALIZED (
        SELECT DISTINCT a.nbr AS node
        FROM f{r - 1} f JOIN adj a ON a.node = f.node
        LEFT JOIN vis{r - 1} x ON x.node = a.nbr
        WHERE x.node IS NULL
    ), vis{r} AS MATERIALIZED (
        SELECT node FROM vis{r - 1} UNION ALL SELECT node FROM f{r}
    )"""
        )
    stats = "\n    UNION ALL\n".join(
        f"""    SELECT {r} AS hop,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM f{r}) AS n_new,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM vis{r}) AS n_reached"""
        for r in range(0, BFS_HOPS + 1)
    )
    return head + "".join(rounds) + f"\n{stats}\n    ORDER BY hop\n"


@register("ext_graph_bfs_reach", _bfs_oracle())
def ext_graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop multi-source BFS over the co-purchase graph (seeds =
    nodes with part key <= BFS_SEED_MAX, BFS_HOPS hop budget): each hop
    expands the frontier through the adjacency and subtracts everything
    already visited, reporting newly-reached and cumulative node counts
    per hop — the reachability / influence-radius primitive behind
    recall expansion and contamination-spread audits, with the same
    bounded-iteration contract as ext_graph_kcore / ext_kmeans_lloyd.

    Determinism: pure exact set algebra on integer node ids — distinct,
    anti join, union — no floats anywhere.

    Scale shape: the adjacency is per-node neighbor ARRAYS built with
    one node-keyed collect_set (ext/graph.py:adjacency_sets — no
    pair-level distinct, no directional union doubling); each hop is
    one hash join of the (small) frontier against it, an explode, a
    distinct, and an anti join against the visited set; frontier and
    visited are lazily localCheckpointed so lineage stays linear in
    hops. Frontier joins broadcast while small and shuffle-join once
    they grow — AQE picks per hop. Cited parity anchor:
    /root/reference/models (no graph ops in the reference;
    beyond-reference surface)."""
    from ..ext.graph import shared_adjacency

    # session-shared persisted adjacency (ext/graph.py:_GRAPH_CACHE)
    adj = shared_adjacency(
        spark,
        sf_dir,
        lambda: load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ),
    )  # reused every hop
    frontier = (
        adj.filter(F.col("node") <= BFS_SEED_MAX)
        .select("node")
        .localCheckpoint(eager=False)  # adjacency keys are already distinct
    )
    visited = frontier
    stats = [
        frontier.agg(
            F.lit(0).alias("hop"),
            F.count(F.lit(1)).cast("bigint").alias("n_new"),
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
        )
    ]
    for r in range(1, BFS_HOPS + 1):
        frontier = (
            frontier.join(adj, "node")
            .select(F.explode("nbrs").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(frontier).localCheckpoint(eager=False)
        n_new = frontier.agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
        n_vis = visited.agg(F.count(F.lit(1)).cast("bigint").alias("n_reached"))
        stats.append(
            n_new.crossJoin(n_vis).select(
                F.lit(r).alias("hop"), "n_new", "n_reached"
            )
        )
    out = stats[0]
    for s_df in stats[1:]:
        out = out.unionByName(s_df)
    return out.orderBy("hop")


# ---------------------------------------------------------------------------
# ext_promo_effect_did — difference-in-differences promo revenue screen
# ---------------------------------------------------------------------------

DID_PRE_YEAR = 1995
DID_POST_YEAR = 1996

_DID_CENTS = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


def _did_cell_sql(grp: str, year: int, what: str) -> str:
    cond = f"promo = {grp} AND yr = {year}"
    if what == "n":
        return f"CAST(COUNT(*) FILTER (WHERE {cond}) AS BIGINT)"
    return f"SUM(cents) FILTER (WHERE {cond}) * 1.0 / COUNT(*) FILTER (WHERE {cond})"


@register(
    "ext_promo_effect_did",
    f"""
    WITH li AS (
        SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo,
               EXTRACT(year FROM l.l_shipdate) AS yr,
               {_DID_CENTS} AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE EXTRACT(year FROM l.l_shipdate) IN ({DID_PRE_YEAR}, {DID_POST_YEAR})
    )
    SELECT {_did_cell_sql(1, DID_PRE_YEAR, 'n')} AS n_promo_pre,
           {_did_cell_sql(1, DID_POST_YEAR, 'n')} AS n_promo_post,
           {_did_cell_sql(0, DID_PRE_YEAR, 'n')} AS n_other_pre,
           {_did_cell_sql(0, DID_POST_YEAR, 'n')} AS n_other_post,
           {dround(_did_cell_sql(1, DID_PRE_YEAR, 'mean'), 6)} AS mean_promo_pre_cents,
           {dround(_did_cell_sql(1, DID_POST_YEAR, 'mean'), 6)} AS mean_promo_post_cents,
           {dround(_did_cell_sql(0, DID_PRE_YEAR, 'mean'), 6)} AS mean_other_pre_cents,
           {dround(_did_cell_sql(0, DID_POST_YEAR, 'mean'), 6)} AS mean_other_post_cents,
           {dround(f"(({_did_cell_sql(1, DID_POST_YEAR, 'mean')}) - ({_did_cell_sql(1, DID_PRE_YEAR, 'mean')})) - (({_did_cell_sql(0, DID_POST_YEAR, 'mean')}) - ({_did_cell_sql(0, DID_PRE_YEAR, 'mean')}))", 6)} AS did_effect_cents
    FROM li
    """,
)
def ext_promo_effect_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences revenue screen for promo parts: mean
    line revenue (exact cents) of PROMO-type vs other parts in
    {DID_PRE_YEAR} (pre) vs {DID_POST_YEAR} (post); the DiD effect is
    (promo_post - promo_pre) - (other_post - other_pre) — the standard
    causal panel estimator, here as a one-pass conditional aggregate
    (the causal-screen sibling of ext_price_elasticity's OLS).

    Determinism: every cell mean is a ratio of exact integer cent sums
    and counts; the effect combines those identical doubles through an
    identical expression tree (IEEE ops bit-identical), dround(6).

    Scale shape: the year filter pushes to the lineitem scan; one
    broadcast-able dimension join on partkey; ONE map-side-combined
    scalar aggregate — no shuffle wider than the 8 conditional cells.
    Cited parity anchor: /root/reference/models (no causal ops in the
    reference; beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("promo"),
    )
    yr = F.year("l_shipdate")
    base = (
        li.filter(yr.isin(DID_PRE_YEAR, DID_POST_YEAR))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            yr.alias("yr"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .join(F.broadcast(pt), "p_partkey")
    )

    def cell_n(grp, year):
        return F.count(
            F.when((F.col("promo") == grp) & (F.col("yr") == year), 1)
        ).cast("bigint")

    def cell_mean(grp, year):
        cond = (F.col("promo") == grp) & (F.col("yr") == year)
        return (
            F.sum(F.when(cond, F.col("cents"))) * 1.0 / F.count(F.when(cond, 1))
        )

    did = (cell_mean(1, DID_POST_YEAR) - cell_mean(1, DID_PRE_YEAR)) - (
        cell_mean(0, DID_POST_YEAR) - cell_mean(0, DID_PRE_YEAR)
    )
    return base.agg(
        cell_n(1, DID_PRE_YEAR).alias("n_promo_pre"),
        cell_n(1, DID_POST_YEAR).alias("n_promo_post"),
        cell_n(0, DID_PRE_YEAR).alias("n_other_pre"),
        cell_n(0, DID_POST_YEAR).alias("n_other_post"),
        F.round(cell_mean(1, DID_PRE_YEAR), 6).alias("mean_promo_pre_cents"),
        F.round(cell_mean(1, DID_POST_YEAR), 6).alias("mean_promo_post_cents"),
        F.round(cell_mean(0, DID_PRE_YEAR), 6).alias("mean_other_pre_cents"),
        F.round(cell_mean(0, DID_POST_YEAR), 6).alias("mean_other_post_cents"),
        F.round(did, 6).alias("did_effect_cents"),
    )


ext_promo_effect_did.__doc__ = ext_promo_effect_did.__doc__.replace(
    "{DID_PRE_YEAR}", str(DID_PRE_YEAR)
).replace("{DID_POST_YEAR}", str(DID_POST_YEAR))


# ---------------------------------------------------------------------------
# ext_events_burst_hours — exact-integer Poisson burst detection
# ---------------------------------------------------------------------------

BURST_K = 3  # flag hours more than K sigma above the type's hourly rate


@register(
    "ext_events_burst_hours",
    f"""
    WITH h AS (
        SELECT event_type, CAST(ts AS DATE) AS event_date,
               EXTRACT(hour FROM ts) AS event_hour,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2, 3
    ), win AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS hours FROM (
            SELECT DISTINCT CAST(ts AS DATE), EXTRACT(hour FROM ts) FROM events
        )
    ), tot AS (
        SELECT event_type, CAST(SUM(n_events) AS BIGINT) AS total FROM h
        GROUP BY event_type
    )
    SELECT h.event_type, h.event_date,
           CAST(h.event_hour AS INTEGER) AS event_hour, h.n_events,
           {dround('t.total * 1.0 / w.hours', 6)} AS expected_per_hour
    FROM h JOIN tot t ON t.event_type = h.event_type
    CROSS JOIN win w
    WHERE h.n_events * w.hours > t.total
      AND (h.n_events * w.hours - t.total) * (h.n_events * w.hours - t.total)
          > {BURST_K * BURST_K} * t.total * w.hours
    ORDER BY h.event_type, h.event_date, event_hour
    """,
)
def ext_events_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson burst detection on the event stream: an (event_type,
    date, hour) cell is a burst when its count exceeds the type's global
    hourly rate by more than {BURST_K} sigma — c > lambda +
    {BURST_K}*sqrt(lambda) — the ops alarm for traffic spikes /
    scraper storms, complementing ext_anomaly_rolling_z's rolling-window
    sibling with a rate-based global baseline.

    Determinism: the sigma test is the EXACT integer cross-
    multiplication (c*H - N)^2 > K^2 * N * H (H = observed hours,
    N = type total), so no sqrt or float rate is ever compared; the
    reported expected rate divides identical integers, dround(6).

    Scale shape: one (type, date, hour)-keyed count (map-side combined),
    a per-type total over those cells, a distinct-hour scalar, and a
    broadcast join back — the corpus shuffles once on the cell key.
    int64 bound: c*H < 2^63 up to ~1e9 events/hour against ~1e10
    observed hours — widen to decimal beyond. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    ev = load(spark, sf_dir, "events")
    # r10: events is scanned ONCE — the cell grid is pinned (it feeds the
    # per-type totals AND the burst filter), and the observed-hour count
    # collapses out of it (an (date, hour) pair is observed iff some cell
    # has it — identical sets) instead of a second corpus distinct (plan
    # audit: 3 events scans -> 1)
    cell = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("event_date"),
        F.hour("ts").alias("event_hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events")).localCheckpoint(
        eager=False
    )
    win = (
        cell.select("event_date", "event_hour")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("hours"))
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("n_events").cast("bigint").alias("total")
    )
    dev = F.col("n_events") * F.col("hours") - F.col("total")
    return (
        cell.join(F.broadcast(tot), "event_type")
        .crossJoin(F.broadcast(win))
        .filter(
            (F.col("n_events") * F.col("hours") > F.col("total"))
            & (dev * dev > BURST_K * BURST_K * F.col("total") * F.col("hours"))
        )
        .select(
            "event_type",
            "event_date",
            F.col("event_hour").cast("int").alias("event_hour"),
            "n_events",
            F.round(F.col("total") * 1.0 / F.col("hours"), 6).alias(
                "expected_per_hour"
            ),
        )
        .orderBy("event_type", "event_date", "event_hour")
    )


ext_events_burst_hours.__doc__ = ext_events_burst_hours.__doc__.replace(
    "{BURST_K}", str(BURST_K)
)


# ---------------------------------------------------------------------------
# ext_embed_outlier_knn — kNN-distance outlier mining in embedding space
# ---------------------------------------------------------------------------

OUTLIER_TOPN = 25  # most-isolated vectors reported


@register(
    "ext_embed_outlier_knn",
    f"""
    WITH {_SCORED_SQL}, k5 AS (
        SELECT qid, cosine FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, nid) = {KNN_K}
    )
    SELECT e.vec_id, e.label, k5.cosine AS knn_cosine
    FROM k5 JOIN e ON e.vec_id = k5.qid
    ORDER BY k5.cosine, e.vec_id
    LIMIT {OUTLIER_TOPN}
    """,
)
def ext_embed_outlier_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-distance outlier mining: each vector's isolation score is the
    cosine to its KNN_K-th nearest neighbor (low = isolated); the
    {OUTLIER_TOPN} most isolated vectors are reported — the standard
    density-based outlier screen for embedding corpora (garbage
    documents, encoder failures, off-distribution samples), the
    unsupervised sibling of ext_embed_knn_classify.

    Determinism: the k-th neighbor is picked on the rounded-cosine total
    order (cosine@6dp DESC, nid); the final report orders (cosine ASC,
    vec_id) — both total orders.

    Scale shape: reuses the two-stage exact top-k primitive
    (_topk_scored: numpy matmul candidate prune -> bit-exact JVM fold
    rerank); the report is a TakeOrdered over N rows. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    k5 = _topk_scored(spark, sf_dir, k=KNN_K).filter(F.col("rk") == KNN_K)
    own = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    return (
        k5.join(own, k5.qid == own.vec_id)
        .select("vec_id", "label", F.col("cosine").alias("knn_cosine"))
        .orderBy("knn_cosine", "vec_id")
        .limit(OUTLIER_TOPN)
    )


ext_embed_outlier_knn.__doc__ = ext_embed_outlier_knn.__doc__.replace(
    "{OUTLIER_TOPN}", str(OUTLIER_TOPN)
)


# ---------------------------------------------------------------------------
# ext_anova_quantity — one-way ANOVA F-test of quantity across return flags
# ---------------------------------------------------------------------------


@register(
    "ext_anova_quantity",
    f"""
    WITH d AS (
        SELECT l_returnflag AS grp,
               CAST(FLOOR(l_quantity) AS BIGINT) AS d
        FROM lineitem
    ), g AS (
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n_g,
               CAST(SUM(d) AS BIGINT) AS s_g,
               CAST(SUM(d * d) AS BIGINT) AS q_g
        FROM d GROUP BY grp
    ), gt AS (
        SELECT CAST(SUM(n_g) AS BIGINT) AS n,
               CAST(SUM(s_g) AS BIGINT) AS s,
               CAST(SUM(q_g) AS BIGINT) AS q,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(CAST(ROUND(s_g * 1.0 * s_g / n_g * 1000000000.0)
                             AS BIGINT)) AS BIGINT) AS bterm_units
        FROM g
    ), u AS (
        SELECT k, n,
               bterm_units
                   - CAST(ROUND(s * 1.0 * s / n * 1000000000.0) AS BIGINT)
                   AS ssb_units,
               q * 1000000000
                   - CAST(ROUND(s * 1.0 * s / n * 1000000000.0) AS BIGINT)
                   AS sst_units
        FROM gt
    )
    SELECT k AS k_groups, n AS n_lines,
           {dround('ssb_units / 1000000000.0', 6)} AS ss_between,
           {dround('(sst_units - ssb_units) / 1000000000.0', 6)} AS ss_within,
           {dround('''(ssb_units * 1.0 / (k - 1))
                      / ((sst_units - ssb_units) * 1.0 / (n - k))''', 6)}
               AS f_stat
    FROM u
    """,
)
def ext_anova_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test: does mean line quantity differ across
    return-flag groups? Reports between/within sums of
    squares and the F statistic — the k-group generalization of
    ext_ab_ztest, completing the classical-stats family (chi2, KS,
    runs, Mann-Kendall).

    Determinism: quantities are exactly integral, so each
    group's n, sum, and sum-of-squares are exact; every between-group
    term S_g^2/n_g is a ratio of exact ints snapped to integer 1e-9
    units BEFORE the cross-group sum (ext_drift_psi discipline), and
    SST = Q - S^2/n works in the same units, so F divides identical
    integer-derived doubles. int64/double bounds: S_g^2 < 2^53 up to
    ~9.5e7 total quantity units per group; Q*1e9 < 2^63 up to ~9e9
    squared-quantity units — widen to decimal beyond (documented,
    sf<=1 safe).

    Scale shape: ONE map-side-combined aggregate to a #flags-row grid;
    all ANOVA algebra runs on those 3 rows plus one scalar. Cited
    parity anchor: /root/reference/models (beyond-reference
    surface)."""
    li = load(spark, sf_dir, "lineitem")
    d = li.select(
        F.col("l_returnflag").alias("grp"),
        F.floor(F.col("l_quantity")).cast("bigint").alias("d"),
    )
    g = d.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("d").cast("bigint").alias("s_g"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("q_g"),
    )
    gt = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").cast("bigint").alias("q"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(
            F.round(F.col("s_g") * 1.0 * F.col("s_g") / F.col("n_g") * 1e9, 0)
            .cast("bigint")
        ).cast("bigint").alias("bterm_units"),
    )
    gterm = F.round(F.col("s") * 1.0 * F.col("s") / F.col("n") * 1e9, 0).cast(
        "bigint"
    )
    u = gt.select(
        "k",
        "n",
        (F.col("bterm_units") - gterm).alias("ssb_units"),
        (F.col("q") * F.lit(1_000_000_000) - gterm).alias("sst_units"),
    )
    return u.select(
        F.col("k").alias("k_groups"),
        F.col("n").alias("n_lines"),
        F.round(F.col("ssb_units") / 1e9, 6).alias("ss_between"),
        F.round((F.col("sst_units") - F.col("ssb_units")) / 1e9, 6).alias(
            "ss_within"
        ),
        F.round(
            (F.col("ssb_units") * 1.0 / (F.col("k") - 1))
            / ((F.col("sst_units") - F.col("ssb_units")) * 1.0 / (F.col("n") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# ext_split_order_screen — same-customer same-day multi-order audit
# ---------------------------------------------------------------------------


@register(
    "ext_split_order_screen",
    """
    WITH grp AS (
        SELECT o_custkey, o_orderdate,
               CAST(COUNT(*) AS BIGINT) AS orders_in_day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY o_custkey, o_orderdate
        HAVING COUNT(*) >= 2
    )
    SELECT orders_in_day,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(orders_in_day) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM grp GROUP BY orders_in_day
    ORDER BY orders_in_day
    """,
)
def ext_split_order_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-order audit screen: customers placing 2+ orders on the same
    calendar day (the classic approval-threshold-evasion / duplicate-
    entry pattern), bucketed by orders-per-day with group counts and
    exact-cent totals — the transactional-audit sibling of
    ext_benford_digits.

    Determinism: counting and exact integer cents only.

    Scale shape: one (custkey, date)-keyed aggregate (map-side
    combined), HAVING prunes to the rare multi-order groups, then a
    <=#distinct-counts-row rollup. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    grp = (
        o.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("orders_in_day"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
        .filter(F.col("orders_in_day") >= 2)
    )
    return (
        grp.groupBy("orders_in_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("orders_in_day").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("orders_in_day")
    )


# ---------------------------------------------------------------------------
# ext_text_hapax — hapax-legomena vocabulary richness per source
# ---------------------------------------------------------------------------


@register(
    "ext_text_hapax",
    """
    WITH tf AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM (
            SELECT source,
                   unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                       AS token
            FROM documents
        ) GROUP BY source, token
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS hapax,
           CAST(ROUND(COUNT(*) FILTER (WHERE c = 1) * 1.0 / COUNT(*), 6)
                AS DOUBLE) AS hapax_share,
           CAST(ROUND(COUNT(*) * 1.0 / SUM(c), 6) AS DOUBLE) AS ttr
    FROM tf GROUP BY source ORDER BY source
    """,
)
def ext_text_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax-legomena profile per source: tokens seen exactly once as a
    share of the vocabulary, plus the source-level type-token ratio —
    the vocabulary-richness diagnostic that flags template-heavy or
    boilerplate sources (low hapax share) vs noisy/OCR sources
    (abnormally high), complementing ext_text_ttr (per-doc) and
    ext_text_heaps_law (corpus growth).

    Determinism: exact integer term frequencies; both ratios divide
    identical integers and round at 6dp (ratio-of-int doubles are
    bit-identical, so plain ROUND is safe: the unrounded doubles are
    already equal).

    Scale shape: explode -> one (source, token)-keyed count (the only
    corpus-sized shuffle, map-side combined), then a #sources-row
    rollup. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    from ..ext import text as tx

    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(tx.tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return (
        tf.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("vocab"),
            hapax.cast("bigint").alias("hapax"),
            F.round(hapax * 1.0 / F.count(F.lit(1)), 6).alias("hapax_share"),
            F.round(F.count(F.lit(1)) * 1.0 / F.sum("c"), 6).alias("ttr"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# ext_retrieval_mrr — label-relevance retrieval evaluation (MRR / recall)
# ---------------------------------------------------------------------------

MRR_K = 10  # ranking depth for MRR@k / recall@k


@register(
    "ext_retrieval_mrr",
    f"""
    WITH {_SCORED_SQL}, topk AS MATERIALIZED (
        SELECT qid, nlabel, rk FROM (
            SELECT qid, nlabel,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, nid) AS rk
            FROM scored
        ) WHERE rk <= {MRR_K}
    ), firsthit AS (
        SELECT e.vec_id, e.label,
               MIN(t.rk) FILTER (WHERE t.nlabel = e.label) AS first_rank
        FROM e LEFT JOIN topk t ON t.qid = e.vec_id
        GROUP BY e.vec_id, e.label
    ), rr AS (
        SELECT label,
               CASE WHEN first_rank IS NOT NULL
                    THEN CAST(ROUND(1000000000.0 * (1.0 / first_rank))
                         AS BIGINT) ELSE 0 END AS rr_units,
               CASE WHEN first_rank IS NOT NULL THEN 1 ELSE 0 END AS hit
        FROM firsthit
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           {dround('SUM(rr_units) * 1.0 / COUNT(*) / 1000000000.0', 6)}
               AS mean_mrr,
           {dround('SUM(hit) * 1.0 / COUNT(*)', 6)} AS recall_at_k
    FROM rr GROUP BY label ORDER BY label
    """,
)
def ext_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation with label-match relevance: every vector
    queries the corpus (leave-one-out), a neighbor is relevant when it
    shares the query's label, and each label reports MRR@{MRR_K} and
    recall@{MRR_K} — the IR-style embedding-quality probe completing
    the eval family (ext_embed_knn_classify votes, this ranks).

    Determinism: ranks come from the rounded-cosine total order;
    each reciprocal rank 1/rank is a ratio of small ints snapped to
    integer 1e-9 units per query BEFORE the label mean (ext_drift_psi
    discipline); means divide identical integers.

    Scale shape: the two-stage exact top-k primitive again (numpy
    prune -> JVM fold rerank), then label-keyed reduces. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    topk = _topk_scored(spark, sf_dir, k=MRR_K)
    own = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("qid"), "label"
    )
    fh = (
        own.join(topk.select("qid", "nlabel", "rk"), "qid", "left")
        .groupBy("qid", "label")
        .agg(
            F.min(F.when(F.col("nlabel") == F.col("label"), F.col("rk"))).alias(
                "first_rank"
            )
        )
    )
    rr_units = F.when(
        F.col("first_rank").isNotNull(),
        F.round(1e9 * (1.0 / F.col("first_rank")), 0).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    hit = F.when(F.col("first_rank").isNotNull(), 1).otherwise(0)
    return (
        fh.select("label", rr_units.alias("rr_units"), hit.alias("hit"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.round(
                F.sum("rr_units") * 1.0 / F.count(F.lit(1)) / 1e9, 6
            ).alias("mean_mrr"),
            F.round(F.sum("hit") * 1.0 / F.count(F.lit(1)), 6).alias(
                "recall_at_k"
            ),
        )
        .orderBy("label")
    )


ext_retrieval_mrr.__doc__ = ext_retrieval_mrr.__doc__.replace(
    "{MRR_K}", str(MRR_K)
)


# ---------------------------------------------------------------------------
# ext_hist2d_qty_discount — bivariate density grid (quantity x discount)
# ---------------------------------------------------------------------------


@register(
    "ext_hist2d_qty_discount",
    """
    SELECT CAST(FLOOR(l_quantity) AS INTEGER) AS qty,
           CAST(ROUND(l_discount * 100) AS INTEGER) AS disc_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    GROUP BY 1, 2 ORDER BY qty, disc_pct
    """,
)
def ext_hist2d_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate density grid over (quantity, discount-percent): line
    counts and exact-cent revenue per cell — the 2-D histogram behind
    pricing heatmaps and discount-policy audits (the numeric sibling of
    ext_activity_heatmap's day x hour grid).

    Determinism: both bucket keys quantize by FLOOR/ROUND of exactly-
    representable values; counts and cents are exact integers.

    Scale shape: ONE map-side-combined aggregate onto a value-bounded
    grid (<= 50 quantities x 11 discounts) — constant output size at
    any corpus scale. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.floor("l_quantity").cast("int").alias("qty"),
            F.round(F.col("l_discount") * 100, 0).cast("int").alias("disc_pct"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("qty", "disc_pct")
    )


# ---------------------------------------------------------------------------
# ext_seq_pattern_v — CEP-style V-shape pattern detection on daily revenue
# ---------------------------------------------------------------------------


@register(
    "ext_seq_pattern_v",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ), lagged AS (
        SELECT d, cents,
               LAG(cents, 1) OVER (ORDER BY d) AS c1,
               LAG(cents, 2) OVER (ORDER BY d) AS c2
        FROM daily
    ), v AS (
        SELECT date_trunc('month', d)::DATE AS month,
               cents - c1 AS rebound_cents
        FROM lagged WHERE c2 > c1 AND c1 < cents
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_v_patterns,
           CAST(MAX(rebound_cents) AS BIGINT) AS max_rebound_cents
    FROM v GROUP BY month ORDER BY month
    """,
)
def ext_seq_pattern_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-style sequence-pattern detection (the MATCH_RECOGNIZE /
    Flink-CEP shape expressed through windows): a V-pattern fires on
    any day whose revenue fell the previous step and rebounds today
    (down-then-up over three consecutive trading days); reported
    per month with the strongest rebound — the pattern-over-ordered-
    stream operator family, distinct from anomaly scoring (which asks
    'how far', not 'what shape').

    Determinism: daily revenue in exact integer cents; the pattern
    predicate and rebound are exact integer comparisons/differences.

    Scale shape: the corpus collapses to the ~2.4k-day series first
    (map-side combined), so the global LAG window is post-aggregation
    bounded (the win_lag_12_global discipline), then a <=#months
    rollup. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("d")
    lagged = daily.select(
        "d",
        "cents",
        F.lag("cents", 1).over(w).alias("c1"),
        F.lag("cents", 2).over(w).alias("c2"),
    )
    v = lagged.filter(
        (F.col("c2") > F.col("c1")) & (F.col("c1") < F.col("cents"))
    ).select(
        F.date_trunc("month", "d").cast("date").alias("month"),
        (F.col("cents") - F.col("c1")).alias("rebound_cents"),
    )
    return (
        v.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_v_patterns"),
            F.max("rebound_cents").cast("bigint").alias("max_rebound_cents"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# ext_seq_error_retry — error-recovery sequence classification per user
# ---------------------------------------------------------------------------

RETRY_WINDOW_S = 300  # follow-up window after an error event


@register(
    "ext_seq_error_retry",
    f"""
    WITH seq AS (
        SELECT event_type,
               LEAD(event_type) OVER w AS next_type,
               LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), cls AS (
        SELECT CASE
                 WHEN next_type IS NULL
                      OR gap_us > {RETRY_WINDOW_S} * 1000000 THEN 'abandoned'
                 WHEN next_type = 'error' THEN 'repeat_error'
                 ELSE next_type
               END AS outcome
        FROM seq WHERE event_type = 'error'
    )
    SELECT outcome, CAST(COUNT(*) AS BIGINT) AS n_errors
    FROM cls GROUP BY outcome ORDER BY outcome
    """,
)
def ext_seq_error_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-recovery sequence classification (the A-then-B CEP
    pattern): for every error event, the user's NEXT event within
    {RETRY_WINDOW_S}s classifies the outcome — another error
    (repeat_error), a successful action (its event type), or nothing
    in the window (abandoned) — the error-UX funnel that pairs with
    ext_seq_pattern_v's shape detection and ext_event_transition's
    unconditioned Markov matrix.

    Determinism: stream order is the (ts, event_id) total order; gaps
    compare exact integer microseconds (epoch_us vs unix_micros — the
    ext_littles_law discipline); outcomes are string equality.

    Scale shape: ONE user-keyed shuffle for the LEAD window, then a
    map-side-combined rollup onto <= #event_types+2 rows. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        (F.lead(us).over(w) - us).alias("gap_us"),
    )
    cls = seq.filter(F.col("event_type") == "error").select(
        F.when(
            F.col("next_type").isNull()
            | (F.col("gap_us") > RETRY_WINDOW_S * 1_000_000),
            F.lit("abandoned"),
        )
        .when(F.col("next_type") == "error", F.lit("repeat_error"))
        .otherwise(F.col("next_type"))
        .alias("outcome")
    )
    return (
        cls.groupBy("outcome")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_errors"))
        .orderBy("outcome")
    )


ext_seq_error_retry.__doc__ = ext_seq_error_retry.__doc__.replace(
    "{RETRY_WINDOW_S}", str(RETRY_WINDOW_S)
)


# ---------------------------------------------------------------------------
# ext_ohlc_weekly — weekly OHLC candles of daily revenue
# ---------------------------------------------------------------------------


@register(
    "ext_ohlc_weekly",
    """
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    )
    SELECT date_trunc('week', d)::DATE AS week,
           CAST(arg_min(cents, d) AS BIGINT) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(arg_max(cents, d) AS BIGINT) AS close_cents,
           CAST(SUM(cents) AS BIGINT) AS volume_cents,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM daily GROUP BY 1 ORDER BY week
    """,
)
def ext_ohlc_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly OHLC candles over the daily revenue series: open/close =
    the first/last trading day's revenue in the ISO week, high/low =
    the extreme days, plus weekly volume — the downsample-to-candles
    operator every monitoring/finance stack runs (min_by/max_by keyed
    on the date makes it one aggregate, no self-joins).

    Determinism: daily cents are exact integers; open/close pick by
    the unique date key (arg_min/arg_max == F.min_by/F.max_by), so no
    tie ambiguity exists.

    Scale shape: corpus collapses to the day series (map-side
    combined), then ONE week-keyed aggregate over ~2.4k rows — both
    engines truncate weeks to Monday. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    return (
        daily.groupBy(F.date_trunc("week", "d").cast("date").alias("week"))
        .agg(
            F.min_by("cents", "d").cast("bigint").alias("open_cents"),
            F.max("cents").cast("bigint").alias("high_cents"),
            F.min("cents").cast("bigint").alias("low_cents"),
            F.max_by("cents", "d").cast("bigint").alias("close_cents"),
            F.sum("cents").cast("bigint").alias("volume_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# ext_forecast_backtest — naive vs seasonal-naive backtest (exact WAPE)
# ---------------------------------------------------------------------------

SNAIVE_LAG = 12  # seasonal-naive lag in months


@register(
    "ext_forecast_backtest",
    f"""
    WITH m AS (
        SELECT r.r_name AS region,
               date_trunc('month', o.o_orderdate)::DATE AS month,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
    ), lagged AS (
        SELECT region, month, cents,
               LAG(cents, 1) OVER w AS l1,
               LAG(cents, {SNAIVE_LAG}) OVER w AS l12
        FROM m WINDOW w AS (PARTITION BY region ORDER BY month)
    ), ev AS (
        SELECT region, cents,
               ABS(cents - l1) AS e1, ABS(cents - l12) AS e12
        FROM lagged WHERE l1 IS NOT NULL AND l12 IS NOT NULL
    )
    SELECT region,
           CAST(COUNT(*) AS BIGINT) AS n_months_evaluated,
           {dround('SUM(e1) * 1.0 / SUM(cents)', 6)} AS wape_naive,
           {dround('SUM(e12) * 1.0 / SUM(cents)', 6)} AS wape_seasonal,
           CASE WHEN SUM(e12) < SUM(e1) THEN 'seasonal_naive'
                WHEN SUM(e1) < SUM(e12) THEN 'naive' ELSE 'tie' END
               AS better_model
    FROM ev GROUP BY region ORDER BY region
    """,
)
def ext_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtesting: one-step-ahead naive (last month) vs
    seasonal-naive (same month last year) forecasts replayed over each
    region's monthly revenue, scored by WAPE — the accuracy-evaluation
    op that closes the forecasting family (ext_ses_forecast /
    ext_croston_forecast produce forecasts; this key says which
    baseline to beat). Months without both baselines are excluded
    (first {SNAIVE_LAG} + 1 months of each region).

    Determinism: WAPE = sum|err| / sum|actual| is a ratio of exact
    integer cent sums — no per-row division at all; the winner verdict
    compares exact integers.

    Scale shape: corpus collapses to the (region, month) grid behind
    broadcast dimension joins; the LAG windows run region-partitioned
    over ~80 rows each; final rollup is 5 rows. Cited parity anchor:
    /root/reference/models (forecast evaluation is beyond-reference
    surface)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    m = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("region").orderBy("month")
    ev = (
        m.select(
            "region",
            "cents",
            F.lag("cents", 1).over(w).alias("l1"),
            F.lag("cents", SNAIVE_LAG).over(w).alias("l12"),
        )
        .filter(F.col("l1").isNotNull() & F.col("l12").isNotNull())
        .select(
            "region",
            "cents",
            F.abs(F.col("cents") - F.col("l1")).alias("e1"),
            F.abs(F.col("cents") - F.col("l12")).alias("e12"),
        )
    )
    return (
        ev.groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_months_evaluated"),
            F.round(F.sum("e1") * 1.0 / F.sum("cents"), 6).alias("wape_naive"),
            F.round(F.sum("e12") * 1.0 / F.sum("cents"), 6).alias(
                "wape_seasonal"
            ),
            F.when(F.sum("e12") < F.sum("e1"), "seasonal_naive")
            .when(F.sum("e1") < F.sum("e12"), "naive")
            .otherwise("tie")
            .alias("better_model"),
        )
        .orderBy("region")
    )


ext_forecast_backtest.__doc__ = ext_forecast_backtest.__doc__.replace(
    "{SNAIVE_LAG}", str(SNAIVE_LAG)
)


# ---------------------------------------------------------------------------
# ext_sketch_kmv_setops — theta-style set operations on KMV sketches
# ---------------------------------------------------------------------------

KMV_SET_K = 64  # minimum hash values kept per pair-union sketch


@register(
    "ext_sketch_kmv_setops",
    None,  # oracle attached below (needs the md5 helper)
)
def ext_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on KMV sketches: for every pair
    of event types, the union sketch is the {KMV_SET_K} smallest user-id
    hashes across both sides, theta = kth_hash/2^32, and the
    intersection estimate counts shared members inside the sketch
    divided by theta — the Druid/DataSketches set-algebra capability
    that plain HLL cannot provide (ext_sketch_kmv is the single-set
    sibling; exact counts ride along so the error is visible).

    Determinism: md5-derived 32-bit hashes are identical integers on
    both engines; sketch membership is a (h) total order (hashes are
    distinct per user by construction of the id space); every estimate
    divides identical exact integers, dround(6).

    Scale shape: ONE distinct-collapse of (type, user, h), a 4x
    pair-fanout join against the 10-row pair table, a pair-keyed top-k
    window (mergeable KMV state: at scale each partition keeps its own
    k minima first), and a 10-row rollup. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    from .llm_ops import _spark_md5_32

    ev = load(spark, sf_dir, "events")
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    pairs = spark.createDataFrame(
        [(a, b) for a in sorted(types) for b in sorted(types) if a < b],
        ["type_a", "type_b"],
    )
    h = _spark_md5_32(F.concat(F.lit("kmv:"), F.col("user_id").cast("string")))
    hashed = ev.select("event_type", h.alias("h")).distinct()
    fan = pairs.join(
        F.broadcast(hashed).hint("broadcast"),
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")),
    )
    flags = fan.groupBy("type_a", "type_b", "h").agg(
        F.max((F.col("event_type") == F.col("type_a")).cast("int")).alias("in_a"),
        F.max((F.col("event_type") == F.col("type_b")).cast("int")).alias("in_b"),
    )
    w_rk = Window.partitionBy("type_a", "type_b").orderBy("h")
    ranked = flags.withColumn("rk", F.row_number().over(w_rk))
    exact = flags.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias(
            "exact_intersection"
        ),
    )
    sk = (
        ranked.filter(F.col("rk") <= KMV_SET_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.max("h").cast("bigint").alias("kth_hash"),
            F.count(F.lit(1)).cast("bigint").alias("n_sketch"),
            F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias(
                "n_shared_sketch"
            ),
        )
    )
    est_union = F.when(
        F.col("exact_union") <= KMV_SET_K, F.col("exact_union") * 1.0
    ).otherwise((KMV_SET_K - 1) * 4294967296.0 / F.col("kth_hash"))
    est_inter = F.when(
        F.col("exact_union") <= KMV_SET_K, F.col("exact_intersection") * 1.0
    ).otherwise(F.col("n_shared_sketch") * 4294967296.0 / F.col("kth_hash"))
    return (
        sk.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "exact_union",
            "exact_intersection",
            "n_shared_sketch",
            F.round(est_union, 6).alias("est_union"),
            F.round(est_inter, 6).alias("est_intersection"),
        )
        .orderBy("type_a", "type_b")
    )


ext_sketch_kmv_setops.__doc__ = ext_sketch_kmv_setops.__doc__.replace(
    "{KMV_SET_K}", str(KMV_SET_K)
)


def _kmv_setops_oracle() -> str:
    from .llm_ops import _md5_32

    h = _md5_32("'kmv:' || CAST(user_id AS VARCHAR)")
    return f"""
    WITH hashed AS MATERIALIZED (
        SELECT DISTINCT event_type, {h} AS h FROM events
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM hashed) a
        JOIN (SELECT DISTINCT event_type FROM hashed) b
          ON a.event_type < b.event_type
    ), flags AS MATERIALIZED (
        SELECT p.type_a, p.type_b, x.h,
               MAX(CASE WHEN x.event_type = p.type_a THEN 1 ELSE 0 END) AS in_a,
               MAX(CASE WHEN x.event_type = p.type_b THEN 1 ELSE 0 END) AS in_b
        FROM pairs p JOIN hashed x
          ON x.event_type = p.type_a OR x.event_type = p.type_b
        GROUP BY p.type_a, p.type_b, x.h
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY type_a, type_b ORDER BY h)
                      AS rk
        FROM flags
    ), exact AS (
        SELECT type_a, type_b,
               CAST(COUNT(*) AS BIGINT) AS exact_union,
               CAST(SUM(in_a * in_b) AS BIGINT) AS exact_intersection
        FROM flags GROUP BY type_a, type_b
    ), sk AS (
        SELECT type_a, type_b,
               CAST(MAX(h) AS BIGINT) AS kth_hash,
               CAST(SUM(in_a * in_b) AS BIGINT) AS n_shared_sketch
        FROM ranked WHERE rk <= {KMV_SET_K} GROUP BY type_a, type_b
    )
    SELECT e.type_a, e.type_b, e.exact_union, e.exact_intersection,
           s.n_shared_sketch,
           {dround(f'''CASE WHEN e.exact_union <= {KMV_SET_K}
                       THEN e.exact_union * 1.0
                       ELSE ({KMV_SET_K} - 1) * 4294967296.0 / s.kth_hash
                       END''', 6)} AS est_union,
           {dround(f'''CASE WHEN e.exact_union <= {KMV_SET_K}
                       THEN e.exact_intersection * 1.0
                       ELSE s.n_shared_sketch * 4294967296.0 / s.kth_hash
                       END''', 6)} AS est_intersection
    FROM sk s JOIN exact e
      ON e.type_a = s.type_a AND e.type_b = s.type_b
    ORDER BY e.type_a, e.type_b
    """


from . import ORACLE as _ORACLE  # noqa: E402

_ORACLE["ext_sketch_kmv_setops"] = _kmv_setops_oracle()


# ---------------------------------------------------------------------------
# ext_bizday_lag — business-day (Mon-Fri) arithmetic on ship lag
# ---------------------------------------------------------------------------

# Weekdays from the Monday epoch 1970-01-05 through day offset e (>= 0):
# 5 full weeks' worth per 7 days plus min(e%7 + 1, 5) in the tail.
_BIZ_EPOCH = "DATE '1970-01-05'"


def _bizdays_sql(datecol: str) -> str:
    e = f"datediff('day', {_BIZ_EPOCH}, {datecol})"
    return (
        f"(5 * CAST(FLOOR(({e}) / 7.0) AS BIGINT)"
        f" + LEAST(({e}) % 7 + 1, 5))"
    )


@register(
    "ext_bizday_lag",
    f"""
    WITH l AS (
        SELECT o.o_orderpriority AS priority,
               ({_bizdays_sql('l.l_shipdate')})
                   - ({_bizdays_sql('o.o_orderdate')}) AS bizdays
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(MIN(bizdays) AS BIGINT) AS min_bizdays,
           CAST(MAX(bizdays) AS BIGINT) AS max_bizdays,
           {dround('SUM(bizdays) * 1.0 / COUNT(*)', 6)} AS mean_bizdays
    FROM l GROUP BY priority ORDER BY priority
    """,
)
def ext_bizday_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (Mon-Fri) order-to-ship lag per order priority —
    calendar arithmetic the SLA world actually uses (5 calendar days
    over a weekend is 3 business days). The weekday count W(d) is a
    CLOSED-FORM integer expression from a fixed Monday epoch
    (5*floor(e/7) + min(e%7+1, 5)), so the lag W(ship) - W(ordered)
    needs no calendar table, no explode, no join against a date spine.

    Determinism: pure integer date arithmetic (datediff/floor/mod) —
    identical on both engines; the mean divides exact integers.

    Scale shape: the orderkey join is the only shuffle (co-partitioned
    fact-to-fact); the rollup lands on 5 priority rows, map-side
    combined. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )

    def bizdays(col):
        e = F.datediff(col, F.lit("1970-01-05").cast("date"))
        return 5 * F.floor(e / 7.0).cast("bigint") + F.least(
            e % 7 + 1, F.lit(5)
        )

    lag = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_orderpriority").alias("priority"),
            (bizdays(F.col("l_shipdate")) - bizdays(F.col("o_orderdate"))).alias(
                "bizdays"
            ),
        )
    )
    return (
        lag.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.min("bizdays").cast("bigint").alias("min_bizdays"),
            F.max("bizdays").cast("bigint").alias("max_bizdays"),
            F.round(F.sum("bizdays") * 1.0 / F.count(F.lit(1)), 6).alias(
                "mean_bizdays"
            ),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# ext_nb_langid — multinomial naive-Bayes language classifier (exact units)
# ---------------------------------------------------------------------------


def _nb_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang_pred) from the exact-units multinomial NB pipeline
    (shared by ext_nb_langid and ext_mcnemar_test — one implementation,
    so the two keys' oracles can never drift)."""
    from ..ext import text as tx

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tx.tokens(F.col("text"))).alias("token")
    ).localCheckpoint(eager=False)  # feeds classes, vocab, counts, scoring
    classes = toks.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    vocab = toks.select("token").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    cnt = toks.groupBy(F.col("lang").alias("cls"), "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    grid = (
        vocab.crossJoin(F.broadcast(classes))
        .crossJoin(F.broadcast(vsize))
        .join(F.broadcast(cnt), ["token", "cls"], "left")
        .select(
            "token",
            "cls",
            F.round(
                F.log(
                    (F.coalesce("c", F.lit(0)) + 1.0)
                    / (F.col("n_tok") + F.col("v"))
                )
                * 1e9,
                0,
            )
            .cast("bigint")
            .alias("units"),
        )
    )
    nd = toks.groupBy(F.col("lang").alias("cls")).agg(
        F.countDistinct("doc_id").alias("nd")
    )
    prior = (
        nd.crossJoin(F.broadcast(nd.agg(F.sum("nd").alias("tot"))))
        .select(
            "cls",
            F.round(F.log(F.col("nd") * 1.0 / F.col("tot")) * 1e9, 0)
            .cast("bigint")
            .alias("prior_units"),
        )
    )
    scored = (
        toks.join(F.broadcast(grid), "token")
        .groupBy("doc_id", "cls")
        .agg(F.sum("units").cast("bigint").alias("tok_units"))
        .join(F.broadcast(prior), "cls")
        .select(
            "doc_id",
            "cls",
            (F.col("tok_units") + F.col("prior_units")).alias("score_units"),
        )
    )
    pred = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("score_units"), "cls"
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("cls").alias("lang_pred"))
    )
    return pred


@register(
    "ext_nb_langid",
    f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id, lang,
               unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS token
        FROM documents
    ), classes AS MATERIALIZED (
        SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM toks GROUP BY lang
    ), vocab AS MATERIALIZED (
        SELECT DISTINCT token FROM toks
    ), vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    cnt AS (
        SELECT lang AS cls, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks GROUP BY lang, token
    ), grid AS MATERIALIZED (
        SELECT vo.token, cl.cls,
               CAST(ROUND(ln((COALESCE(ct.c, 0) + 1.0) / (cl.n_tok + vs.v))
                          * 1000000000.0) AS BIGINT) AS units
        FROM vocab vo
        CROSS JOIN classes cl
        CROSS JOIN vsize vs
        LEFT JOIN cnt ct ON ct.token = vo.token AND ct.cls = cl.cls
    ), prior AS (
        SELECT cls,
               CAST(ROUND(ln(nd * 1.0 / (SELECT SUM(nd) FROM (
                   SELECT COUNT(DISTINCT doc_id) AS nd FROM toks GROUP BY lang
               ))) * 1000000000.0) AS BIGINT) AS prior_units
        FROM (SELECT lang AS cls, COUNT(DISTINCT doc_id) AS nd
              FROM toks GROUP BY lang)
    ), scored AS (
        SELECT t.doc_id, g.cls,
               CAST(SUM(g.units) AS BIGINT)
                   + ANY_VALUE(p.prior_units) AS score_units
        FROM toks t
        JOIN grid g ON g.token = t.token
        JOIN prior p ON p.cls = g.cls
        GROUP BY t.doc_id, g.cls
    ), pred AS (
        SELECT doc_id, cls AS lang_pred FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score_units DESC, cls) = 1
    )
    SELECT d.lang AS lang_declared, p.lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    GROUP BY d.lang, p.lang_pred
    ORDER BY lang_declared, lang_pred
    """,
)
def ext_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language classifier trained and scored
    in one pass (Laplace-smoothed unigram likelihoods per declared
    lang, log-prior included), reported as the declared-vs-predicted
    confusion matrix — distributed supervised ML with the registry's
    exactness contract: every log-likelihood ln((c+1)/(N_c+V)) is a
    ratio of exact integers snapped to integer 1e-9 units per
    (token, class) BEFORE any per-document sum, so scores are exact
    BIGINTs and the argmax (units DESC, class) is a total order.
    (Empty documents never enter: scoring is driven off the token
    stream itself.)

    Scale shape: training is one (class, token) count (map-side
    combined, bounded by vocab x classes); the model grid broadcasts;
    scoring is one (doc, class)-keyed reduce over the exploded token
    stream — the corpus shuffles once. Cited parity anchor:
    /root/reference/models (no ML ops in the reference;
    beyond-reference surface)."""
    pred = _nb_predict(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.col("lang").alias("lang_declared"))
        .join(pred, "doc_id")
        .groupBy("lang_declared", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang_declared", "lang_pred")
    )


# ---------------------------------------------------------------------------
# ext_seq_basket_pairs — sequential market-basket pairs (A then later B)
# ---------------------------------------------------------------------------

SEQ_PAIR_TOPN = 25


@register(
    "ext_seq_basket_pairs",
    f"""
    WITH cpd AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part,
               o.o_orderdate AS d
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), pairs AS (
        SELECT DISTINCT a.cust, a.part AS part_from, b.part AS part_to
        FROM cpd a JOIN cpd b
          ON a.cust = b.cust AND a.d < b.d AND a.part <> b.part
    )
    SELECT part_from, part_to, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM pairs GROUP BY part_from, part_to
    ORDER BY n_customers DESC, part_from, part_to
    LIMIT {SEQ_PAIR_TOPN}
    """,
)
def ext_seq_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENTIAL market-basket pairs: part A bought on an earlier
    order date than part B by the same customer, ranked by how many
    distinct customers exhibit the sequence — the temporal sibling of
    ext_basket_pairs (same basket) and ext_assoc_rules (co-occurrence):
    this is what next-purchase recommenders and replenishment models
    mine.

    Determinism: distinct-set algebra and exact counts; the top-N
    order (support DESC, part_from, part_to) is a total order.

    Scale shape: "customer bought A on SOME date strictly before SOME
    purchase of B" is exactly min_date(A) < max_date(B), so the
    sequence join runs on the (cust, part) grid with per-part min/max
    dates — the date multiplicity never enters the join, and each
    surviving (cust, from, to) row is unique BY CONSTRUCTION, so the
    corpus-sized post-join DISTINCT the naive shape pays (every
    d1<d2 date combination materialized, then deduped) disappears.
    One cust-keyed repartition feeds both the grid aggregate and the
    self-join (subset-clustering satisfies both), then one (from, to)
    map-side-combined count and TakeOrdered. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("part"),
            F.col("o_orderdate").alias("d"),
        )
        # One shuffle serves the agg AND the join. The partition count is
        # EXPLICIT (slots, scale-adaptive) so AQE's byte-based coalescing
        # cannot fold it down: the downstream per-customer pair fan-out
        # multiplies each input row ~40x, so sizing this exchange by its
        # input bytes serializes the join stage (§2.5 — partition by the
        # work produced, not the bytes carried).
        .repartition(
            spark.sparkContext.defaultParallelism, "cust"
        )
        .groupBy("cust", "part")
        .agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
        .localCheckpoint(eager=False)  # both sides of the sequence join
    )
    a = cp.select("cust", F.col("part").alias("part_from"), "dmin")
    b = cp.select("cust", F.col("part").alias("part_to"), "dmax")
    return (
        a.join(b, "cust")
        .filter(
            (F.col("dmin") < F.col("dmax"))
            & (F.col("part_from") != F.col("part_to"))
        )
        .groupBy("part_from", "part_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy(F.desc("n_customers"), "part_from", "part_to")
        .limit(SEQ_PAIR_TOPN)
    )


# ---------------------------------------------------------------------------
# ext_simpson_screen — Simpson's-paradox direction-reversal audit
# ---------------------------------------------------------------------------


@register(
    "ext_simpson_screen",
    """
    WITH l AS (
        SELECT p.p_brand AS brand,
               CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS promo,
               CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT) AS cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), cells AS MATERIALIZED (
        SELECT brand,
               CAST(SUM(CASE WHEN promo = 1 THEN cents END) AS BIGINT) AS sp,
               CAST(COUNT(*) FILTER (WHERE promo = 1) AS BIGINT) AS np,
               CAST(SUM(CASE WHEN promo = 0 THEN cents END) AS BIGINT) AS so,
               CAST(COUNT(*) FILTER (WHERE promo = 0) AS BIGINT) AS no
        FROM l GROUP BY brand
    ), tot AS (
        SELECT CAST(SUM(sp) AS BIGINT) AS sp, CAST(SUM(np) AS BIGINT) AS np,
               CAST(SUM(so) AS BIGINT) AS so, CAST(SUM(no) AS BIGINT) AS no
        FROM cells
    )
    SELECT c.brand, c.np AS n_promo, c.no AS n_other,
           CAST(ROUND(c.sp * 1.0 / c.np, 6) AS DOUBLE) AS mean_promo_cents,
           CAST(ROUND(c.so * 1.0 / c.no, 6) AS DOUBLE) AS mean_other_cents,
           CASE WHEN c.sp * c.no > c.so * c.np THEN 1
                WHEN c.sp * c.no < c.so * c.np THEN -1 ELSE 0 END
               AS brand_direction,
           CASE WHEN t.sp * t.no > t.so * t.np THEN 1
                WHEN t.sp * t.no < t.so * t.np THEN -1 ELSE 0 END
               AS overall_direction,
           CAST(CASE WHEN (CASE WHEN c.sp * c.no > c.so * c.np THEN 1
                                WHEN c.sp * c.no < c.so * c.np THEN -1
                                ELSE 0 END)
                          * (CASE WHEN t.sp * t.no > t.so * t.np THEN 1
                                  WHEN t.sp * t.no < t.so * t.np THEN -1
                                  ELSE 0 END) = -1
                     THEN 1 ELSE 0 END AS INTEGER) AS simpson_flip
    FROM cells c CROSS JOIN tot t
    WHERE c.np > 0 AND c.no > 0
    ORDER BY c.brand
    """,
)
def ext_simpson_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: does the promo-vs-other mean-revenue
    comparison REVERSE direction inside a brand relative to the overall
    corpus? Flags every brand whose within-stratum direction opposes the
    aggregate direction — the classic confounding audit run before
    trusting any aggregate A/B-style comparison (the diagnostic sibling
    of ext_promo_effect_did).

    Determinism: every direction verdict is the exact integer cross-
    multiplication sp*no vs so*np — no mean is ever compared as a
    float; reported means divide identical integers (plain ROUND safe
    on already-identical doubles). int128 note: the cross products stay
    under 2^63 up to ~3e9 cents x 3e9 lines per cell; widen to
    decimal(38,0) beyond (documented).

    Scale shape: one broadcast dimension join, ONE brand-keyed
    conditional aggregate (map-side combined, 25 cells), and a scalar
    total — all verdict algebra on the 25-row grid. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_brand").alias("brand"),
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("promo"),
    )
    l = li.select(
        F.col("l_partkey").alias("p_partkey"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("bigint")
        .alias("cents"),
    ).join(F.broadcast(pt), "p_partkey")
    cells = l.groupBy("brand").agg(
        F.sum(F.when(F.col("promo") == 1, F.col("cents"))).cast("bigint").alias("sp"),
        F.count(F.when(F.col("promo") == 1, 1)).cast("bigint").alias("np"),
        F.sum(F.when(F.col("promo") == 0, F.col("cents"))).cast("bigint").alias("so"),
        F.count(F.when(F.col("promo") == 0, 1)).cast("bigint").alias("no"),
    ).localCheckpoint(eager=False)  # feeds the per-brand rows AND the total
    tot = cells.agg(
        F.sum("sp").cast("bigint").alias("tsp"),
        F.sum("np").cast("bigint").alias("tnp"),
        F.sum("so").cast("bigint").alias("tso"),
        F.sum("no").cast("bigint").alias("tno"),
    )

    def direction(s1, n1, s2, n2):
        return (
            F.when(F.col(s1) * F.col(n2) > F.col(s2) * F.col(n1), 1)
            .when(F.col(s1) * F.col(n2) < F.col(s2) * F.col(n1), -1)
            .otherwise(0)
        )

    bd = direction("sp", "np", "so", "no")
    od = direction("tsp", "tnp", "tso", "tno")
    return (
        cells.crossJoin(F.broadcast(tot))
        .filter((F.col("np") > 0) & (F.col("no") > 0))
        .select(
            "brand",
            F.col("np").alias("n_promo"),
            F.col("no").alias("n_other"),
            F.round(F.col("sp") * 1.0 / F.col("np"), 6).alias("mean_promo_cents"),
            F.round(F.col("so") * 1.0 / F.col("no"), 6).alias("mean_other_cents"),
            bd.alias("brand_direction"),
            od.alias("overall_direction"),
            F.when(bd * od == -1, 1).otherwise(0).cast("int").alias("simpson_flip"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# ext_graph_modularity — partition quality of the label-prop communities
# ---------------------------------------------------------------------------

MOD_ROUNDS = 3  # same round budget as ext_graph_label_prop
MOD_MIN_SUPPORT = 2  # same edge support floor
MOD_TOPN = 20  # largest communities reported


def _modularity_oracle() -> str:
    base = f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), edges AS MATERIALIZED (
        SELECT a.pk AS src, b.pk AS dst
        FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        GROUP BY 1, 2
        HAVING COUNT(*) >= {MOD_MIN_SUPPORT}
    ), sym AS MATERIALIZED (
        SELECT src, dst FROM edges
        UNION ALL
        SELECT dst AS src, src AS dst FROM edges
    ), lab0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS lab FROM sym
    )"""
    its = []
    for t in range(1, MOD_ROUNDS + 1):
        its.append(
            f"""lab{t} AS MATERIALIZED (
        SELECT l.node, LEAST(l.lab, MIN(n.lab)) AS lab
        FROM lab{t - 1} l
        JOIN sym e ON e.src = l.node
        JOIN lab{t - 1} n ON n.node = e.dst
        GROUP BY l.node, l.lab
    )"""
        )
    return (
        base
        + ", "
        + ", ".join(its)
        + f""", m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM edges),
    deg AS (
        SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY src
    ), comm AS MATERIALIZED (
        SELECT l.lab AS community,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(d.deg) AS BIGINT) AS degree_sum
        FROM lab{MOD_ROUNDS} l JOIN deg d ON d.node = l.node
        GROUP BY l.lab
    ), internal AS (
        SELECT la.lab AS community, CAST(COUNT(*) AS BIGINT) AS internal_edges
        FROM edges e
        JOIN lab{MOD_ROUNDS} la ON la.node = e.src
        JOIN lab{MOD_ROUNDS} lb ON lb.node = e.dst
        WHERE la.lab = lb.lab
        GROUP BY la.lab
    ), terms AS MATERIALIZED (
        SELECT c.community, c.n_nodes, c.degree_sum,
               COALESCE(i.internal_edges, 0) AS internal_edges,
               CAST(ROUND((COALESCE(i.internal_edges, 0) * 1.0 / m.m
                           - (c.degree_sum * 1.0 / (2 * m.m))
                             * (c.degree_sum * 1.0 / (2 * m.m)))
                          * 1000000000.0) AS BIGINT) AS units
        FROM comm c
        LEFT JOIN internal i ON i.community = c.community
        CROSS JOIN m
    )
    SELECT community, n_nodes, degree_sum, internal_edges,
           {dround('units / 1000000000.0', 6)} AS modularity_term,
           {dround('SUM(units) OVER () / 1000000000.0', 6)} AS q_total
    FROM terms
    QUALIFY ROW_NUMBER() OVER (ORDER BY n_nodes DESC, community)
            <= {MOD_TOPN}
    ORDER BY n_nodes DESC, community
    """
    )


@register("ext_graph_modularity", _modularity_oracle())
def ext_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity Q of the bounded-round min-label communities (same
    graph, support floor, and round budget as ext_graph_label_prop):
    per community, internal-edge count, degree sum, and its modularity
    term e_c/m - (d_c/2m)^2; Q totals every term — the partition-
    QUALITY metric that tells you whether the communities the budget
    found are real structure (Q >> 0) or noise (Q ~ 0). Reported for
    the {MOD_TOPN} largest communities with the global Q on each row.

    Determinism: counts and degrees are exact integers; each
    community's term is identical-double algebra snapped to integer
    1e-9 units before the global window sum (ext_drift_psi
    discipline).

    Scale shape: the propagation rounds are node-keyed join+reduce
    supersteps (Pregel pattern, lazily checkpointed); the modularity
    pass adds one degree reduce, one label-keyed internal-edge count,
    and community-grid algebra; the global window runs over community
    rows, never the corpus. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    from ..ext.graph import pairs_from_baskets, shared_baskets

    # session-shared basket index (ext/graph.py:_GRAPH_CACHE)
    bas = shared_baskets(
        spark,
        sf_dir,
        lambda: load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ),
    )
    edges = (
        pairs_from_baskets(bas, count=True)
        .filter(F.col("support") >= MOD_MIN_SUPPORT)
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .localCheckpoint(eager=False)  # feeds sym, m, internal-edge count
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    lab = sym.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    )
    for _ in range(MOD_ROUNDS):
        nbr = (
            sym.join(
                lab.select(F.col("node").alias("dst"), F.col("lab").alias("nlab")),
                "dst",
            )
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("nlab").alias("nbr_min"))
        )
        lab = (
            lab.join(nbr, "node")
            .select("node", F.least(F.col("lab"), F.col("nbr_min")).alias("lab"))
            .localCheckpoint(eager=False)
        )
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    comm = (
        lab.join(deg, "node")
        .groupBy(F.col("lab").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("bigint").alias("degree_sum"),
        )
    )
    la = lab.select(F.col("node").alias("src"), F.col("lab").alias("lab_a"))
    lb = lab.select(F.col("node").alias("dst"), F.col("lab").alias("lab_b"))
    internal = (
        edges.join(la, "src")
        .join(lb, "dst")
        .filter(F.col("lab_a") == F.col("lab_b"))
        .groupBy(F.col("lab_a").alias("community"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("internal_edges"))
    )
    half = F.col("degree_sum") * 1.0 / (2 * F.col("m"))
    terms = (
        comm.join(internal, "community", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "community",
            "n_nodes",
            "degree_sum",
            F.coalesce("internal_edges", F.lit(0)).cast("bigint").alias(
                "internal_edges"
            ),
            F.round(
                (
                    F.coalesce("internal_edges", F.lit(0)) * 1.0 / F.col("m")
                    - half * half
                )
                * 1e9,
                0,
            )
            .cast("bigint")
            .alias("units"),
        )
    )
    w_all = Window.partitionBy()
    w_rk = Window.orderBy(F.desc("n_nodes"), "community")
    return (
        terms.select(
            "community",
            "n_nodes",
            "degree_sum",
            "internal_edges",
            F.round(F.col("units") / 1e9, 6).alias("modularity_term"),
            F.round(F.sum("units").over(w_all) / 1e9, 6).alias("q_total"),
            F.row_number().over(w_rk).alias("rk"),
        )
        .filter(F.col("rk") <= MOD_TOPN)
        .drop("rk")
        .orderBy(F.desc("n_nodes"), "community")
    )


ext_graph_modularity.__doc__ = ext_graph_modularity.__doc__.replace(
    "{MOD_TOPN}", str(MOD_TOPN)
)


# ---------------------------------------------------------------------------
# ext_forecast_reconcile — top-down hierarchical forecast allocation
# ---------------------------------------------------------------------------

RECON_TRAIL = 12  # trailing months used for allocation shares


@register(
    "ext_forecast_reconcile",
    f"""
    WITH nm AS MATERIALIZED (
        SELECT r.r_name AS region, n.n_name AS nation,
               date_trunc('month', o.o_orderdate)::DATE AS month,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2, 3
    ), last AS (SELECT MAX(month) AS lm FROM nm),
    regf AS (
        SELECT region, CAST(SUM(cents) AS BIGINT) AS region_forecast_cents
        FROM nm, last WHERE month = lm GROUP BY region
    ), trail AS (
        SELECT region, nation, CAST(SUM(cents) AS BIGINT) AS nation_trailing_cents
        FROM nm, last
        WHERE month > (lm - INTERVAL {RECON_TRAIL} MONTH) AND month <= lm
        GROUP BY region, nation
    ), regt AS (
        SELECT region, CAST(SUM(nation_trailing_cents) AS BIGINT)
                   AS region_trailing_cents
        FROM trail GROUP BY region
    )
    SELECT t.region, t.nation,
           (SELECT lm FROM last) AS last_month,
           f.region_forecast_cents,
           t.nation_trailing_cents,
           g.region_trailing_cents,
           CAST(ROUND(f.region_forecast_cents
                      * (t.nation_trailing_cents * 1.0
                         / g.region_trailing_cents)) AS BIGINT)
               AS alloc_forecast_cents
    FROM trail t
    JOIN regf f ON f.region = t.region
    JOIN regt g ON g.region = t.region
    ORDER BY t.region, t.nation
    """,
)
def ext_forecast_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-down hierarchical forecast reconciliation: the region-level
    next-month naive forecast (last observed month's revenue) is
    allocated down to nations proportionally to each nation's trailing-
    {RECON_TRAIL}-month revenue share — the standard coherent-forecast
    move (forecast where the signal is stable, allocate where it isn't)
    that completes the forecasting family (ext_ses_forecast predicts,
    ext_forecast_backtest scores, this key distributes).

    Determinism: all revenue is exact integer cents; the allocation
    multiplies a ratio of identical integers by an exact integer in an
    identical expression tree and ROUNDs once to integer cents.

    Scale shape: the corpus collapses to the (region, nation, month)
    grid behind broadcast dimension joins; everything after runs on
    ~25 nation rows and a scalar last-month. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nm = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .localCheckpoint(eager=False)  # feeds last-month, forecast, trailing
    )
    last = nm.agg(F.max("month").alias("lm"))
    regf = (
        nm.crossJoin(F.broadcast(last))
        .filter(F.col("month") == F.col("lm"))
        .groupBy("region")
        .agg(F.sum("cents").cast("bigint").alias("region_forecast_cents"))
    )
    trail = (
        nm.crossJoin(F.broadcast(last))
        .filter(
            (F.col("month") > F.add_months(F.col("lm"), -RECON_TRAIL))
            & (F.col("month") <= F.col("lm"))
        )
        .groupBy("region", "nation")
        .agg(F.sum("cents").cast("bigint").alias("nation_trailing_cents"))
    )
    regt = trail.groupBy("region").agg(
        F.sum("nation_trailing_cents").cast("bigint").alias(
            "region_trailing_cents"
        )
    )
    return (
        trail.join(F.broadcast(regf), "region")
        .join(F.broadcast(regt), "region")
        .crossJoin(F.broadcast(last.select(F.col("lm").alias("last_month"))))
        .select(
            "region",
            "nation",
            "last_month",
            "region_forecast_cents",
            "nation_trailing_cents",
            "region_trailing_cents",
            F.round(
                F.col("region_forecast_cents")
                * (
                    F.col("nation_trailing_cents")
                    * 1.0
                    / F.col("region_trailing_cents")
                ),
                0,
            )
            .cast("bigint")
            .alias("alloc_forecast_cents"),
        )
        .orderBy("region", "nation")
    )


ext_forecast_reconcile.__doc__ = ext_forecast_reconcile.__doc__.replace(
    "{RECON_TRAIL}", str(RECON_TRAIL)
)


# ---------------------------------------------------------------------------
# ext_ab_srm_check — sample-ratio-mismatch guardrail
# ---------------------------------------------------------------------------

_SRM_CHI2_X1E4 = 38415  # chi-square 5% critical value (1 dof) * 1e4


@register(
    "ext_ab_srm_check",
    f"""
    WITH arms AS (
        SELECT CASE WHEN ({{h}}) % 2 = 0 THEN 0 ELSE 1 END AS arm
        FROM customer
    ), c AS (
        SELECT CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_arm0,
               CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_arm1
        FROM arms
    )
    SELECT n_arm0, n_arm1,
           {dround('''(n_arm0 - n_arm1) * 1.0 * (n_arm0 - n_arm1)
                      / (n_arm0 + n_arm1)''', 6)} AS chi2,
           CAST(CASE WHEN (n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 10000
                          > {_SRM_CHI2_X1E4} * (n_arm0 + n_arm1)
                     THEN 1 ELSE 0 END AS INTEGER) AS srm_detected
    FROM c
    """,
)
def ext_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: customers are hash-assigned to
    two arms (deterministic md5 split — the registry's reproducible
    randomization) and the observed split is chi-square-tested against
    50/50 — the first sanity check every experimentation platform runs
    before reading any metric (a failed SRM invalidates the
    experiment).

    Determinism: the verdict is the exact integer cross-multiplication
    (n0-n1)^2 * 1e4 > chi2_crit*1e4 * (n0+n1) — the ext_mann_kendall
    threshold discipline; the reported chi2 divides identical
    integers.

    Scale shape: one narrow map + ONE scalar conditional count —
    embarrassingly parallel. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    from .llm_ops import _spark_md5_32

    cust = load(spark, sf_dir, "customer")
    arm = (
        _spark_md5_32(F.concat(F.lit("srm:"), F.col("c_custkey").cast("string")))
        % 2
    )
    c = cust.select(arm.alias("arm")).agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("n_arm0"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("n_arm1"),
    )
    diff = F.col("n_arm0") - F.col("n_arm1")
    tot = F.col("n_arm0") + F.col("n_arm1")
    return c.select(
        "n_arm0",
        "n_arm1",
        F.round(diff * 1.0 * diff / tot, 6).alias("chi2"),
        F.when(diff * diff * 10000 > _SRM_CHI2_X1E4 * tot, 1)
        .otherwise(0)
        .cast("int")
        .alias("srm_detected"),
    )


# attach the md5 expression into the oracle template
from .llm_ops import _md5_32 as _md5_32_sql  # noqa: E402

_ORACLE["ext_ab_srm_check"] = _ORACLE["ext_ab_srm_check"].replace(
    "{h}", _md5_32_sql("'srm:' || CAST(c_custkey AS VARCHAR)")
)


# ---------------------------------------------------------------------------
# ext_metric_cuped — CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

CUPED_PRE_YEAR = 1996
CUPED_POST_YEAR = 1997


@register(
    "ext_metric_cuped",
    f"""
    WITH per_user AS MATERIALIZED (
        SELECT o_custkey,
               CASE WHEN ({{h}}) % 2 = 0 THEN 0 ELSE 1 END AS arm,
               CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate)
                                  = {CUPED_PRE_YEAR}
                             THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate)
                                  = {CUPED_POST_YEAR}
                             THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS y
        FROM orders GROUP BY o_custkey
    ), pooled AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
               CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        FROM per_user
    ), th AS (
        SELECT CAST(n AS BIGINT) AS n,
               CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                   AS theta,
               CAST(sx AS BIGINT) * 1.0 / CAST(n AS BIGINT) AS mean_x
        FROM pooled
    ), adj AS (
        SELECT u.arm, u.y,
               CAST(ROUND((u.y - t.theta * (u.x - t.mean_x)) * 1000000.0)
                    AS BIGINT) AS adj_units,
               t.theta
        FROM per_user u CROSS JOIN th t
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           {dround('SUM(y) * 1.0 / COUNT(*)', 6)} AS mean_post_cents,
           {dround('SUM(adj_units) * 1.0 / COUNT(*) / 1000000.0', 6)}
               AS mean_cuped_cents,
           {dround('ANY_VALUE(theta)', 6)} AS theta
    FROM adj GROUP BY arm ORDER BY arm
    """,
)
def ext_metric_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout: per-customer post-
    period spend ({CUPED_POST_YEAR}) adjusted by the pre-period
    covariate ({CUPED_PRE_YEAR}) with the pooled OLS theta =
    cov(x,y)/var(x), reported per hash-assigned arm — the standard
    variance-reduction technique every experimentation platform ships
    (same deterministic arm assignment as ext_ab_srm_check).

    Determinism: theta's numerator/denominator are exact 128-bit
    integers (n*Sxy - Sx*Sy over HUGEINT / decimal(38,0)), converted
    to double through the string path on the DuckDB side (HUGEINT ->
    DOUBLE is not correctly rounded above 2^53; VARCHAR -> DOUBLE is,
    and matches Spark's BigDecimal.doubleValue); each user's adjusted
    metric is snapped to integer micro-cent units before the arm mean.

    Scale shape: ONE custkey-keyed conditional aggregate builds the
    panel; pooled moments are one scalar reduce; the adjustment is a
    narrow map against broadcast scalars; arm rollup is 2 rows. Cited
    parity anchor: /root/reference/models (beyond-reference
    surface)."""
    from .llm_ops import _spark_md5_32

    o = load(spark, sf_dir, "orders")
    arm = (
        _spark_md5_32(F.concat(F.lit("cuped:"), F.col("o_custkey").cast("string")))
        % 2
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    yr = F.year("o_orderdate")
    per_user = o.groupBy("o_custkey").agg(
        F.max(arm).alias("arm"),
        F.sum(F.when(yr == CUPED_PRE_YEAR, cents).otherwise(0))
        .cast("bigint")
        .alias("x"),
        F.sum(F.when(yr == CUPED_POST_YEAR, cents).otherwise(0))
        .cast("bigint")
        .alias("y"),
    ).localCheckpoint(eager=False)  # feeds pooled moments AND the readout
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("x")) * dec(F.col("y"))).alias("sxy"),
        F.sum(dec(F.col("x")) * dec(F.col("x"))).alias("sxx"),
    )
    th = pooled.select(
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
        ).alias("theta"),
        (
            F.col("sx").cast("bigint") * 1.0 / F.col("n").cast("bigint")
        ).alias("mean_x"),
    )
    adj = per_user.crossJoin(F.broadcast(th)).select(
        "arm",
        "y",
        F.round(
            (F.col("y") - F.col("theta") * (F.col("x") - F.col("mean_x")))
            * 1e6,
            0,
        )
        .cast("bigint")
        .alias("adj_units"),
        "theta",
    )
    return (
        adj.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.sum("y") * 1.0 / F.count(F.lit(1)), 6).alias(
                "mean_post_cents"
            ),
            F.round(
                F.sum("adj_units") * 1.0 / F.count(F.lit(1)) / 1e6, 6
            ).alias("mean_cuped_cents"),
            F.round(F.first("theta"), 6).alias("theta"),
        )
        .orderBy("arm")
    )


ext_metric_cuped.__doc__ = ext_metric_cuped.__doc__.replace(
    "{CUPED_PRE_YEAR}", str(CUPED_PRE_YEAR)
).replace("{CUPED_POST_YEAR}", str(CUPED_POST_YEAR))

_ORACLE["ext_metric_cuped"] = _ORACLE["ext_metric_cuped"].replace(
    "{h}", _md5_32_sql("'cuped:' || CAST(o_custkey AS VARCHAR)")
)


# ---------------------------------------------------------------------------
# ext_sketch_ams_f2 — AMS second-frequency-moment sketch (exact integers)
# ---------------------------------------------------------------------------

AMS_LANES = 16  # independent +/-1 projections


def _ams_oracle() -> str:
    from .llm_ops import _md5_32

    h = _md5_32("'ams:' || CAST(l_partkey AS VARCHAR)")
    lanes = ", ".join(
        f"""CAST(SUM(CASE WHEN (({h}) >> {i}) & 1 = 0
                 THEN 1 ELSE -1 END) AS BIGINT) AS z{i}"""
        for i in range(AMS_LANES)
    )
    zsq = " + ".join(f"z{i} * z{i}" for i in range(AMS_LANES))
    return f"""
    WITH lanes AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, {lanes}
        FROM lineitem
    ), exact AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(SUM(c * c) AS BIGINT) AS exact_f2
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c
              FROM lineitem GROUP BY l_partkey)
    )
    SELECT l.n_rows, e.n_distinct, e.exact_f2,
           {dround(f'({zsq}) * 1.0 / {AMS_LANES}', 6)} AS est_f2,
           {dround(f'ABS(({zsq}) * 1.0 / {AMS_LANES} - e.exact_f2) / e.exact_f2', 6)}
               AS rel_err
    FROM lanes l CROSS JOIN exact e
    """


@register("ext_sketch_ams_f2", _ams_oracle())
def ext_sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (Alon-Matias-Szegedy) second-frequency-moment sketch over
    part keys: {AMS_LANES} +/-1 projections (independent BITS of one
    md5 draw per key — one hash computation per row, not {AMS_LANES}),
    each lane's running sum Z squares into an F2 estimate, averaged across
    lanes — the classic one-pass self-join-size / skew estimator that
    completes the sketch family (Bloom membership, CountMin frequency,
    HLL/KMV cardinality, AMS moments). The exact F2 rides along so the
    error is visible.

    Determinism: every lane sum is an exact integer of md5-derived
    signs; the estimate and relative error divide identical integers,
    dround(6).

    Scale shape: ALL lanes compute in ONE map-side-combined scalar
    aggregate over the scan (no shuffle at all for the sketch); the
    exact check is one partkey-keyed count. int64 bound: |Z| <= rows,
    Z^2 sums need rows^2 * lanes < 2^63 — fine to ~7e8 rows; widen
    beyond (documented). Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    from .llm_ops import _spark_md5_32

    li = load(spark, sf_dir, "lineitem")
    h = _spark_md5_32(
        F.concat(F.lit("ams:"), F.col("l_partkey").cast("string"))
    )
    li = li.withColumn("_h", h)  # one md5 per row; lanes slice its bits
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for i in range(AMS_LANES):
        sign = F.when(
            F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 0, 1
        ).otherwise(-1)
        aggs.append(F.sum(sign).cast("bigint").alias(f"z{i}"))
    lanes = li.agg(*aggs)
    exact = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("exact_f2"),
        )
    )
    zsq = None
    for i in range(AMS_LANES):
        t = F.col(f"z{i}") * F.col(f"z{i}")
        zsq = t if zsq is None else zsq + t
    est = zsq * 1.0 / AMS_LANES
    return lanes.crossJoin(F.broadcast(exact)).select(
        "n_rows",
        "n_distinct",
        "exact_f2",
        F.round(est, 6).alias("est_f2"),
        F.round(F.abs(est - F.col("exact_f2")) / F.col("exact_f2"), 6).alias(
            "rel_err"
        ),
    )


ext_sketch_ams_f2.__doc__ = ext_sketch_ams_f2.__doc__.replace(
    "{AMS_LANES}", str(AMS_LANES)
)


# ---------------------------------------------------------------------------
# ext_eval_auc — exact ROC AUC via the Mann-Whitney midrank identity
# ---------------------------------------------------------------------------


@register(
    "ext_eval_auc",
    """
    WITH scored AS (
        SELECT CAST(FLOOR(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 100) AS BIGINT) / 100.0) AS BIGINT)
                   AS dollars,
               CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS label
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), grid AS (
        SELECT dollars,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(label) AS BIGINT) AS pos
        FROM scored GROUP BY dollars
    ), ranked AS (
        SELECT dollars, cnt, pos,
               SUM(cnt) OVER (ORDER BY dollars) AS cum
        FROM grid
    ), agg AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS n1,
               CAST(SUM(cnt - pos) AS BIGINT) AS n0,
               CAST(SUM(pos * (2 * cum - cnt + 1)) AS BIGINT) AS r1x2
        FROM ranked
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u_x2,
           CAST(ROUND((r1x2 - n1 * (n1 + 1)) * 1.0 / (2 * n1 * n0), 6)
                AS DOUBLE) AS auc
    FROM agg
    """,
)
def ext_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT ROC AUC through the Mann-Whitney identity: does line
    revenue (the score) separate PROMO parts (the label)? AUC =
    (R1 - n1(n1+1)/2) / (n1*n0) with tie-corrected midranks — the
    ranking metric that completes the eval family (confusion,
    calibration, lift, threshold sweep, MRR) without ever sorting the
    corpus per label.

    Determinism: scores quantize to whole dollars (FLOOR of exact
    cents); midranks use the 2x-integer identity (2*midrank =
    2*cum - cnt + 1, the ext_spearman_corr discipline), so U is an
    exact BIGINT and AUC divides exact integers (plain ROUND safe on
    already-identical doubles). int64 bound: R1x2 <= n1 * 2N and
    2*n1*n0 — widen to decimal beyond ~1e9 lines (documented).

    Scale shape: the corpus collapses to the value-bounded dollar grid
    first (map-side combined); the rank cumsum windows over grid rows,
    never lines; one scalar reduce finishes. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_type").startswith("PROMO"), 1).otherwise(0).alias("label"),
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    scored = li.select(
        F.col("l_partkey").alias("p_partkey"),
        F.floor(cents / 100.0).cast("bigint").alias("dollars"),
    ).join(F.broadcast(pt), "p_partkey")
    grid = scored.groupBy("dollars").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    w = Window.orderBy("dollars").rowsBetween(Window.unboundedPreceding, 0)
    ranked = grid.select(
        "cnt", "pos", F.sum("cnt").over(w).alias("cum")
    )
    agg = ranked.agg(
        F.sum("pos").cast("bigint").alias("n1"),
        F.sum(F.col("cnt") - F.col("pos")).cast("bigint").alias("n0"),
        F.sum(F.col("pos") * (2 * F.col("cum") - F.col("cnt") + 1))
        .cast("bigint")
        .alias("r1x2"),
    )
    u_x2 = F.col("r1x2") - F.col("n1") * (F.col("n1") + 1)
    return agg.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        u_x2.cast("bigint").alias("u_x2"),
        F.round(u_x2 * 1.0 / (2 * F.col("n1") * F.col("n0")), 6).alias("auc"),
    )


# ---------------------------------------------------------------------------
# ext_fd_discovery — functional-dependency discovery over part attributes
# ---------------------------------------------------------------------------

# Constraint (ADVICE r10): the single-scan probe encodes each candidate as
# a 'lhs|rhs' string and casts the probed VALUES to string for
# countDistinct, so candidates must keep cast-to-string injective column
# types (string/int — NOT float/decimal, where distinct values can share a
# string form) and '|'-free column names. All current candidates satisfy
# both; revisit the probe's struct-grouping alternative before adding one
# that doesn't.
FD_CANDIDATES = [
    ("p_partkey", "p_name"),
    ("p_name", "p_brand"),
    ("p_name", "p_type"),
    ("p_brand", "p_type"),
    ("p_type", "p_size"),
]


def _fd_oracle() -> str:
    parts = []
    for lhs, rhs in FD_CANDIDATES:
        parts.append(
            f"""    SELECT '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(COUNT(*) AS BIGINT) AS n_lhs_values,
           CAST(COUNT(*) FILTER (WHERE nd > 1) AS BIGINT) AS n_violating,
           CAST(CASE WHEN COUNT(*) FILTER (WHERE nd > 1) = 0
                     THEN 1 ELSE 0 END AS INTEGER) AS fd_holds
    FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd FROM part GROUP BY {lhs})"""
        )
    return (
        "\n    UNION ALL\n".join(parts) + "\n    ORDER BY lhs, rhs\n"
    )


@register("ext_fd_discovery", _fd_oracle())
def ext_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over part attributes: for each
    candidate A -> B, does every A value map to exactly one B value?
    Reports determinant cardinality, violating-value count, and the
    verdict — the schema-profiling op behind normalization advice, key
    inference, and dimension-model validation (the column-pair sibling
    of ext_fk_discovery's cross-table containment).

    Determinism: pure distinct counting.

    Scale shape (r10 single-scan rewrite): ONE part scan explodes each
    row into its 5 (candidate, lhs-value, rhs-value) probes (values
    stringified — injective for these string/int columns), one
    (candidate, lhs)-keyed COUNT DISTINCT aggregate, one candidate-keyed
    scalar fold to the 5-row report — the prior per-candidate loop
    scanned part 5 times and unioned 5 two-level aggregates (plan
    audit: 5 scans / 10 Exchanges). Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    pt = load(spark, sf_dir, "part")
    probes = pt.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{lhs}|{rhs}").alias("cand"),
                        F.col(lhs).cast("string").alias("lv"),
                        F.col(rhs).cast("string").alias("rv"),
                    )
                    for lhs, rhs in FD_CANDIDATES
                ]
            )
        ).alias("x")
    ).select("x.cand", "x.lv", "x.rv")
    g = probes.groupBy("cand", "lv").agg(F.countDistinct("rv").alias("nd"))
    viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
    rep = g.groupBy("cand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lhs_values"),
        viol.cast("bigint").alias("n_violating"),
        F.when(viol == 0, 1).otherwise(0).cast("int").alias("fd_holds"),
    )
    return rep.select(
        F.split("cand", "\\|").getItem(0).alias("lhs"),
        F.split("cand", "\\|").getItem(1).alias("rhs"),
        "n_lhs_values",
        "n_violating",
        "fd_holds",
    ).orderBy("lhs", "rhs")


# ---------------------------------------------------------------------------
# ext_ab_power_analysis — sample-size calculation from observed variance
# ---------------------------------------------------------------------------

POWER_CONST = 15.697757024450002  # 2 * (z_0.975 + z_0.80)^2
POWER_MDE = 0.01  # minimum detectable effect: 1% of the mean


@register(
    "ext_ab_power_analysis",
    f"""
    WITH v AS (
        SELECT c.c_mktsegment AS segment,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), m AS (
        SELECT segment,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(cents) AS HUGEINT) AS s,
               CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q
        FROM v GROUP BY segment
    ), st AS (
        SELECT segment, CAST(n AS BIGINT) AS n_orders,
               CAST(s AS BIGINT) * 1.0 / CAST(n AS BIGINT) AS mean_cents,
               CAST(CAST(n * q - s * s AS VARCHAR) AS DOUBLE)
                   / CAST(CAST(n * (n - 1) AS VARCHAR) AS DOUBLE)
                   AS var_cents2
        FROM m
    )
    SELECT segment, n_orders,
           {dround('mean_cents', 6)} AS mean_cents,
           {dround('var_cents2', 6)} AS var_cents2,
           CAST(CEIL({POWER_CONST} * var_cents2
                     / (({POWER_MDE}) * mean_cents
                        * ({POWER_MDE}) * mean_cents)) AS BIGINT)
               AS n_required_per_arm
    FROM st ORDER BY segment
    """,
)
def ext_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B power analysis from observed moments: per market segment,
    the sample size per arm required to detect a {POWER_MDE:.0%} lift
    in mean order value at 5% significance / 80% power — n = 2 *
    (z_a + z_b)^2 * sigma^2 / (MDE * mean)^2 — the experiment-design
    op that pairs with ext_ab_ztest (the readout), ext_ab_srm_check
    (the guardrail), and ext_metric_cuped (the variance reducer).

    Determinism: moments are exact 128-bit integers; the variance
    divides them through the string-path double conversion (the
    ext_metric_cuped discipline); the z-constant is one shared IEEE
    literal, so every double op is identical; CEIL lands on identical
    doubles.

    Scale shape: ONE segment-keyed aggregate (map-side combined, 5
    rows) behind a broadcast customer join; all design algebra on the
    5-row grid. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    v = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("segment"), cents.alias("cents")
    )
    dec = lambda col: col.cast("decimal(38,0)")  # noqa: E731
    m = v.groupBy("segment").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("cents"))).alias("s"),
        F.sum(dec(F.col("cents")) * dec(F.col("cents"))).alias("q"),
    )
    mean_c = F.col("s").cast("bigint") * 1.0 / F.col("n").cast("bigint")
    var_c = (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast(
        "double"
    ) / (F.col("n") * (F.col("n") - 1)).cast("double")
    st = m.select(
        "segment",
        F.col("n").cast("bigint").alias("n_orders"),
        mean_c.alias("mean_cents"),
        var_c.alias("var_cents2"),
    )
    return st.select(
        "segment",
        "n_orders",
        F.round("mean_cents", 6).alias("mean_cents"),
        F.round("var_cents2", 6).alias("var_cents2"),
        F.ceil(
            POWER_CONST
            * F.col("var_cents2")
            / (
                POWER_MDE
                * F.col("mean_cents")
                * POWER_MDE
                * F.col("mean_cents")
            )
        )
        .cast("bigint")
        .alias("n_required_per_arm"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# ext_cogroup_reconcile — two-table per-key reconciliation via cogroup
# ---------------------------------------------------------------------------


@register(
    "ext_cogroup_reconcile",
    """
    WITH o AS (
        SELECT o_custkey AS custkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS order_cents
        FROM orders GROUP BY o_custkey
    ), e AS (
        SELECT user_id AS custkey,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase_events
        FROM events GROUP BY user_id
    )
    SELECT COALESCE(o.custkey, e.custkey) AS custkey,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(o.order_cents, 0) AS order_cents,
           COALESCE(e.n_events, 0) AS n_events,
           COALESCE(e.n_purchase_events, 0) AS n_purchase_events
    FROM o FULL OUTER JOIN e ON o.custkey = e.custkey
    ORDER BY custkey
    """,
)
def ext_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-table per-key reconciliation through the COGROUP Pandas API
    (groupBy(...).cogroup(...).applyInPandas): each customer's order
    slice and event slice arrive together in one Python function — the
    escape hatch for per-entity logic that genuinely needs BOTH streams
    side by side (complex matching, imperative reconciliation). Here
    the body computes per-side counts and exact cents so the whole
    Pandas path is hash-checked against a FULL OUTER JOIN oracle —
    cogroup is the only registry surface the other 380+ keys don't
    exercise. The cogroup key is a COARSE bucket (custkey % 256), not
    the customer: cogroup invokes Python once per key, so keying by
    customer costs one call per entity (measured 48 s at sf0.1);
    bucketing amortizes to 256 vectorized pandas-groupby calls.

    Determinism: counting and exact integer cents inside each
    single-key group; output order is the custkey total order.

    Scale shape: cogroup shuffles both tables ONCE on the key and
    streams Arrow batches per key group — the same one-shuffle cost as
    the equivalent join, with Python only per group. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    import pandas as pd

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        (F.col("o_custkey") % 256).alias("bucket"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    e = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey"),
        (F.col("user_id") % 256).alias("bucket"),
        "event_type",
    )

    def reconcile(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-bucket: pandas groupby does the per-customer
        # work; the cogroup key is the COARSE bucket (256 Python calls,
        # not one per customer — one-call-per-key cogroup measured 48 s
        # at sf0.1, bucketed runs ~2 s)
        # the empty fallbacks are typed int64: an object-dtype empty frame
        # makes the post-join .fillna(0) silently downcast (pandas
        # FutureWarning — behavior flips in a future pandas and would
        # change the Arrow-boundary dtypes under the oracle)
        lo = (
            left.groupby("custkey")["cents"].agg(["size", "sum"])
            if len(left)
            else pd.DataFrame(columns=["size", "sum"]).astype("int64")
        )
        ro = (
            right.assign(p=(right["event_type"] == "purchase").astype("int64"))
            .groupby("custkey")["p"]
            .agg(["size", "sum"])
            if len(right)
            else pd.DataFrame(columns=["size", "sum"]).astype("int64")
        )
        m = lo.join(ro, how="outer", lsuffix="_o", rsuffix="_e").fillna(0)
        if m.empty:
            return pd.DataFrame(
                columns=[
                    "custkey",
                    "n_orders",
                    "order_cents",
                    "n_events",
                    "n_purchase_events",
                ]
            ).astype("int64")
        return pd.DataFrame(
            {
                "custkey": m.index.astype("int64"),
                "n_orders": m["size_o"].astype("int64"),
                "order_cents": m["sum_o"].astype("int64"),
                "n_events": m["size_e"].astype("int64"),
                "n_purchase_events": m["sum_e"].astype("int64"),
            }
        )

    # Explicit slot-count repartition on the cogroup key: the cogroup's
    # own exchange is AQE-coalesced by BYTES (a few MB here), which packed
    # all 256 Python bucket-calls onto a couple of tasks; pre-partitioning
    # with a user-specified count satisfies the cogroup's required
    # distribution (no extra exchange in the plan) and keeps the pandas
    # work on all slots (§2.5; measured 2.2 -> 1.2 s at sf0.1 in the
    # minPartitionSize A/B that located this).
    slots = spark.sparkContext.defaultParallelism
    out = (
        o.repartition(slots, "bucket")
        .groupBy("bucket")
        .cogroup(e.repartition(slots, "bucket").groupBy("bucket"))
        .applyInPandas(
            reconcile,
            schema=(
                "custkey long, n_orders long, order_cents long, "
                "n_events long, n_purchase_events long"
            ),
        )
    )
    return out.orderBy("custkey")


# ---------------------------------------------------------------------------
# ext_lsh_bucket_stats — MinHash LSH band/bucket health diagnostic
# ---------------------------------------------------------------------------

LSHSTAT_PERM = 16
LSHSTAT_BANDS = 4


def _lsh_bucket_oracle() -> str:
    from ..ext.dedup import MINHASH_P, minhash_coeffs

    r = LSHSTAT_PERM // LSHSTAT_BANDS
    coeffs = minhash_coeffs(LSHSTAT_PERM)
    nib_val = " + ".join(
        f"(instr('0123456789abcdef', substr(md5(shingle), {i}, 1)) - 1) * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    sig_cols = ",\n               ".join(
        f"MIN((v * {a} + {b}) % {MINHASH_P}) AS sig{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    band_cols = ",\n               ".join(
        "md5({}) AS mband{}".format(
            " || ',' || ".join(
                f"CAST(sig{t * r + j} AS VARCHAR)" for j in range(r)
            ),
            t,
        )
        for t in range(LSHSTAT_BANDS)
    )
    bucket_union = "\n        UNION ALL\n        ".join(
        f"SELECT {t} AS band, mband{t} AS bk FROM banded"
        for t in range(LSHSTAT_BANDS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ), sh0 AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(generate_series(1, len(l) - 2),
                                     i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]))
                   AS shingle
        FROM toks
    ), sh AS (
        SELECT doc_id, shingle, CAST({nib_val} AS BIGINT) AS v FROM sh0
    ), sigs AS (
        SELECT doc_id, {sig_cols}
        FROM sh GROUP BY doc_id
    ), banded AS (
        SELECT doc_id, {band_cols} FROM sigs
    ), bk AS (
        SELECT band, bk, CAST(COUNT(*) AS BIGINT) AS sz FROM (
        {bucket_union}
        ) GROUP BY band, bk
    )
    SELECT band,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(MAX(sz) AS BIGINT) AS max_bucket,
           CAST(SUM(sz * (sz - 1) / 2) AS BIGINT) AS candidate_pairs
    FROM bk GROUP BY band ORDER BY band
    """


@register("ext_lsh_bucket_stats", _lsh_bucket_oracle())
def ext_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH bucket health diagnostic: per band, the bucket
    count, the largest bucket, and the candidate-pair bill
    sum(C(size,2)) — the report that decides whether a banding
    configuration will melt a reducer before you run the dedup (a few
    mega-buckets = quadratic blowup; all-singleton buckets = zero
    recall). Same md5 base hash, affine permutations, and band hashing
    as ext_dedup_minhash_banded (constants from ext/dedup.py, so the
    diagnostic can never drift from the operator it diagnoses).

    Determinism: signatures are exact modular integer arithmetic on
    md5-derived values; everything reported is a count.

    Scale shape: the shingle explode + per-doc signature aggregate is
    the dedup pipeline's own first stage; bucket stats are one
    (band, bucket)-keyed count plus a {LSHSTAT_BANDS}-row rollup — the
    candidate JOIN itself never runs. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    from ..ext.dedup import MINHASH_P, minhash_coeffs, shingles
    from ..sources.readers import spread

    r = LSHSTAT_PERM // LSHSTAT_BANDS
    coeffs = minhash_coeffs(LSHSTAT_PERM)
    docs = load(spark, sf_dir, "documents")
    sh = (
        spread(docs.select("doc_id", "text"))
        .select("doc_id", F.explode(shingles(F.col("text"), 3)).alias("shingle"))
        .dropDuplicates(["doc_id", "shingle"])
        .select(
            "doc_id",
            F.conv(
                F.substring(F.md5(F.col("shingle").cast("binary")), 1, 8), 16, 10
            )
            .cast("bigint")
            .alias("v"),
        )
    )
    sigs = sh.groupBy("doc_id").agg(
        *[
            F.min((F.col("v") * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(
                f"sig{i}"
            )
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    banded = sigs.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"sig{t * r + j}").cast("string")
                        for j in range(r)
                    ],
                ).cast("binary")
            ).alias(f"mband{t}")
            for t in range(LSHSTAT_BANDS)
        ],
    ).localCheckpoint(eager=False)  # one bucket scan per band
    buckets = None
    for t in range(LSHSTAT_BANDS):
        b = banded.select(
            F.lit(t).alias("band"), F.col(f"mband{t}").alias("bk")
        )
        buckets = b if buckets is None else buckets.unionByName(b)
    bk = buckets.groupBy("band", "bk").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return (
        bk.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.max("sz").cast("bigint").alias("max_bucket"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
            .cast("bigint")
            .alias("candidate_pairs"),
        )
        .orderBy("band")
    )


ext_lsh_bucket_stats.__doc__ = ext_lsh_bucket_stats.__doc__.replace(
    "{LSHSTAT_BANDS}", str(LSHSTAT_BANDS)
)


# ---------------------------------------------------------------------------
# ext_table_fingerprint — order-independent XOR row-checksum fingerprint
# ---------------------------------------------------------------------------


def _fingerprint_oracle() -> str:
    from .llm_ops import _md5_32

    row_repr = (
        "CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)"
        " || '|' || o_orderstatus || '|' || "
        "CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR)"
    )
    return f"""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(bit_xor({_md5_32(row_repr)}) AS BIGINT) AS xor_fingerprint,
           CAST(SUM({_md5_32(row_repr)}) AS BIGINT) AS sum_fingerprint
    FROM orders GROUP BY o_orderstatus ORDER BY status
    """


@register("ext_table_fingerprint", _fingerprint_oracle())
def ext_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprint for replication audits: each
    row canonicalizes to a string (keys, status, exact cents), hashes
    to a 32-bit integer, and per-status XOR + SUM aggregates give two
    commutative checksums — compare fingerprints across replicas /
    engines / time-travel snapshots without moving rows (the
    cheap-probe sibling of ext_table_diff, which localizes the
    differences once a fingerprint mismatches).

    Determinism: md5-derived integers and commutative integer
    aggregates (XOR and SUM are order-free by construction — that is
    the point of the op).

    Scale shape: one narrow map + ONE status-keyed aggregate, map-side
    combined; no shuffle wider than 3 status rows. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    from .llm_ops import _spark_md5_32

    o = load(spark, sf_dir, "orders")
    row_repr = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
    )
    h = _spark_md5_32(row_repr)
    return (
        o.select(F.col("o_orderstatus").alias("status"), h.alias("h"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.expr("bit_xor(h)").cast("bigint").alias("xor_fingerprint"),
            F.sum("h").cast("bigint").alias("sum_fingerprint"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# ext_dow_quantile_bands — day-of-week control bands via exact order stats
# ---------------------------------------------------------------------------

DOW_BAND_PS = [10, 50, 90]  # percentile bands reported


def _dow_band_sql(p: int) -> str:
    """Exact order-statistic percentile over the per-dow day series:
    rank-space interpolation ((100-f)*v_lo + f*v_hi)/100 in integers."""
    return f"""CAST(ROUND((
        (100 - ((MAX(n) - 1) * {p}) % 100)
          * MAX(CASE WHEN rk = 1 + ((n - 1) * {p}) // 100 THEN cents END)
        + (((MAX(n) - 1) * {p}) % 100)
          * MAX(CASE WHEN rk = 1 + ((n - 1) * {p}) // 100 + 1 THEN cents END
                    ) ) / 100.0, 6) AS DOUBLE)"""


@register(
    "ext_dow_quantile_bands",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    ), ranked AS (
        SELECT isodow(d) AS dow, cents,
               ROW_NUMBER() OVER (PARTITION BY isodow(d)
                                  ORDER BY cents, d) AS rk,
               COUNT(*) OVER (PARTITION BY isodow(d)) AS n
        FROM daily
    ), pad AS (
        SELECT dow, cents, rk, n FROM ranked
        UNION ALL
        SELECT dow, cents, rk + 1 AS rk, n FROM ranked WHERE rk = n
    )
    SELECT CAST(dow AS INTEGER) AS dow,
           CAST(ANY_VALUE(n) AS BIGINT) AS n_days,
           {_dow_band_sql(10)} AS p10_cents,
           {_dow_band_sql(50)} AS p50_cents,
           {_dow_band_sql(90)} AS p90_cents
    FROM pad GROUP BY dow ORDER BY dow
    """,
)
def ext_dow_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week control bands: exact p10/p50/p90 of daily revenue
    per ISO weekday — the seasonal envelope ops teams chart live
    traffic against (ext_anomaly_rolling_z scores points; this key
    draws the expected band). Quantiles assemble from EXACT order
    statistics with integer rank-space interpolation — never an
    engine quantile function (the interpolation-trap discipline).

    Determinism: ranks order by (cents, date) — a total order; the
    interpolated value combines two exact integers with integer
    weights before ONE terminal rounding (plain ROUND safe on
    identical doubles). The rk = n row is duplicated at rk = n + 1 so
    the v_hi lookup at the top edge always lands (p = 100 boundary
    guard), on both engines.

    Scale shape: the corpus collapses to the ~2.4k-day series first;
    rank windows partition by weekday (~350 rows each); the rollup is
    7 rows. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    dow = ((F.dayofweek("d") + 5) % 7) + 1  # ISO: Monday=1 .. Sunday=7
    dd = daily.select(dow.alias("dow"), "cents", "d")
    w = Window.partitionBy("dow").orderBy("cents", "d")
    ranked = dd.select(
        "dow",
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("dow")).alias("n"),
    )
    pad = ranked.unionByName(
        ranked.filter(F.col("rk") == F.col("n")).select(
            "dow", "cents", (F.col("rk") + 1).alias("rk"), "n"
        )
    )

    def band(p):
        lo_rk = 1 + F.floor((F.col("n") - 1) * p / 100)  # per-row, in agg
        v_lo = F.max(F.when(F.col("rk") == lo_rk, F.col("cents")))
        v_hi = F.max(F.when(F.col("rk") == lo_rk + 1, F.col("cents")))
        frac = ((F.max("n") - 1) * p) % 100  # n constant per dow group
        return F.round(((100 - frac) * v_lo + frac * v_hi) / 100.0, 6)

    agg = [
        F.first("n").cast("bigint").alias("n_days"),
        band(10).alias("p10_cents"),
        band(50).alias("p50_cents"),
        band(90).alias("p90_cents"),
    ]
    return (
        pad.groupBy(F.col("dow").cast("int").alias("dow"))
        .agg(*agg)
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# ext_class_centroid_sim — inter-class centroid cosine separation matrix
# ---------------------------------------------------------------------------


@register(
    "ext_class_centroid_sim",
    f"""
    WITH {_KM_PTS_SQL},
    lab AS (SELECT vec_id, label FROM embeddings),
    sums AS MATERIALIZED (
        SELECT l.label, p.dim,
               CAST(SUM(p.q) AS BIGINT) AS s
        FROM pts p JOIN lab l ON l.vec_id = p.vec_id
        GROUP BY l.label, p.dim
    ), pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(SUM(CAST(a.s AS HUGEINT) * b.s) AS HUGEINT) AS dot
        FROM sums a JOIN sums b ON a.dim = b.dim AND a.label < b.label
        GROUP BY a.label, b.label
    ), norms AS (
        SELECT label, CAST(SUM(CAST(s AS HUGEINT) * s) AS HUGEINT) AS n2
        FROM sums GROUP BY label
    )
    SELECT p.label_a, p.label_b,
           {dround('''CAST(CAST(p.dot AS VARCHAR) AS DOUBLE)
                      / (sqrt(CAST(CAST(na.n2 AS VARCHAR) AS DOUBLE))
                         * sqrt(CAST(CAST(nb.n2 AS VARCHAR) AS DOUBLE)))''', 6)}
               AS centroid_cosine
    FROM pairs p
    JOIN norms na ON na.label = p.label_a
    JOIN norms nb ON nb.label = p.label_b
    ORDER BY p.label_a, p.label_b
    """,
)
def ext_class_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-class separation matrix: cosine similarity between every
    pair of label centroids in embedding space — the diagnostic that
    says whether classes are geometrically separable before anyone
    trains on them (pairs ext_embed_centroids' raw vectors and
    ext_embed_knn_classify's behavioral answer with the geometric one).

    Determinism: centroid cosines compute on exact integer dimension
    sums (counts cancel in the cosine, so no division happens until
    the end); dot and norm-squares widen to 128-bit, convert to double
    through the string path (the ext_metric_cuped discipline), and
    sqrt is IEEE-correctly-rounded on both engines — every double op
    identical, dround(6).

    Scale shape: one (label, dim)-keyed sum over the tidy quantized
    points (map-side combined, bounded by labels x dims), then all
    pair algebra on the 640-row sum grid. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    emb = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    ).select(
        "label",
        "dim",
        F.floor(F.col("x").cast("double") * KM_SCALE).cast("long").alias("q"),
    )
    sums = (
        pts.groupBy("label", "dim")
        .agg(F.sum("q").cast("bigint").alias("s"))
        .localCheckpoint(eager=False)  # both pair sides + norms
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    a = sums.select(
        F.col("label").alias("label_a"), "dim", F.col("s").alias("sa")
    )
    b = sums.select(
        F.col("label").alias("label_b"), "dim", F.col("s").alias("sb")
    )
    pairs = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(dec(F.col("sa")) * dec(F.col("sb"))).alias("dot"))
    )
    norms = sums.groupBy("label").agg(
        F.sum(dec(F.col("s")) * dec(F.col("s"))).alias("n2")
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("n2").alias("nb2"))
    return (
        pairs.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                ),
                6,
            ).alias("centroid_cosine"),
        )
        .orderBy("label_a", "label_b")
    )


# ---------------------------------------------------------------------------
# ext_ts_durbin_watson — residual autocorrelation of the monthly trend
# ---------------------------------------------------------------------------


@register(
    "ext_ts_durbin_watson",
    f"""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate)::DATE AS month,
               CAST(FLOOR(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                               AS BIGINT) / 100.0) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY month) AS t, y FROM m
    ), s AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(t) AS HUGEINT) AS st,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(CAST(t AS HUGEINT) * t) AS HUGEINT) AS stt,
               CAST(SUM(CAST(t AS HUGEINT) * y) AS HUGEINT) AS sty
        FROM idx
    ), fit AS (
        SELECT n, st, sy,
               n * sty - st * sy AS bnum,
               n * stt - st * st AS bden
        FROM s
    ), res AS MATERIALIZED (
        SELECT i.t,
               CAST(f.n * f.bden AS HUGEINT) * i.y
                   - f.n * f.bnum * i.t
                   - (f.sy * f.bden - f.bnum * f.st) AS e
        FROM idx i CROSS JOIN fit f
    ), dsum AS (
        SELECT CAST(SUM(e * e) AS HUGEINT) AS se2,
               CAST(SUM(CASE WHEN lag_e IS NULL THEN 0
                             ELSE (e - lag_e) * (e - lag_e) END) AS HUGEINT)
                   AS sd2
        FROM (SELECT e, LAG(e) OVER (ORDER BY t) AS lag_e FROM res)
    )
    SELECT CAST(f.n AS BIGINT) AS n_months,
           {dround('''CAST(CAST(f.bnum AS VARCHAR) AS DOUBLE)
                      / CAST(CAST(f.bden AS VARCHAR) AS DOUBLE)''', 6)}
               AS trend_slope_dollars,
           {dround('''CAST(CAST(d.sd2 AS VARCHAR) AS DOUBLE)
                      / CAST(CAST(d.se2 AS VARCHAR) AS DOUBLE)''', 6)}
               AS durbin_watson,
           CAST(CASE WHEN 2 * d.sd2 < 3 * d.se2 THEN 1 ELSE 0 END AS INTEGER)
               AS positive_autocorr
    FROM fit f CROSS JOIN dsum d
    """,
)
def ext_ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson residual-autocorrelation test on the monthly
    revenue trend: fit the OLS line (ext_trend_ols's fit), then
    DW = sum((e_t - e_{{t-1}})^2) / sum(e_t^2) over the residuals —
    the regression diagnostic that says whether the trend line's
    errors are independent (DW ~ 2) or positively autocorrelated
    (DW -> 0, flagged at DW < 1.5 by exact cross-multiplication
    2*SD2 < 3*SE2).

    Determinism: monthly revenue quantizes to whole dollars (keeps
    residual squares inside decimal(38,0)/HUGEINT: scaled residuals
    e = nD*y - nB*t - c are exact 128-bit integers — the fraction-free
    OLS residual); every reported double converts through the string
    path and divides identical integers.

    Scale shape: the corpus collapses to ~80 month rows; everything
    after is window + scalar algebra on that series. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.floor(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            / 100.0
        )
        .cast("bigint")
        .alias("y")
    )
    idx = m.select(
        F.row_number().over(Window.orderBy("month")).alias("t"), "y"
    ).localCheckpoint(eager=False)  # feeds moments AND residuals
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = idx.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("t"))).alias("st"),
        F.sum(dec(F.col("y"))).alias("sy"),
        F.sum(dec(F.col("t")) * dec(F.col("t"))).alias("stt"),
        F.sum(dec(F.col("t")) * dec(F.col("y"))).alias("sty"),
    )
    fit = s.select(
        "n",
        "st",
        "sy",
        (F.col("n") * F.col("sty") - F.col("st") * F.col("sy")).alias("bnum"),
        (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).alias("bden"),
    )
    res = idx.crossJoin(F.broadcast(fit)).select(
        "t",
        (
            F.col("n") * F.col("bden") * dec(F.col("y"))
            - F.col("n") * F.col("bnum") * dec(F.col("t"))
            - (F.col("sy") * F.col("bden") - F.col("bnum") * F.col("st"))
        ).alias("e"),
    )
    w = Window.orderBy("t")
    lagged = res.select("e", F.lag("e").over(w).alias("lag_e"))
    dsum = lagged.agg(
        F.sum(F.col("e") * F.col("e")).alias("se2"),
        F.sum(
            F.when(F.col("lag_e").isNull(), F.lit(0).cast("decimal(38,0)"))
            .otherwise((F.col("e") - F.col("lag_e")) * (F.col("e") - F.col("lag_e")))
        ).alias("sd2"),
    )
    return (
        fit.crossJoin(F.broadcast(dsum))
        .select(
            F.col("n").cast("bigint").alias("n_months"),
            F.round(
                F.col("bnum").cast("double") / F.col("bden").cast("double"), 6
            ).alias("trend_slope_dollars"),
            F.round(
                F.col("sd2").cast("double") / F.col("se2").cast("double"), 6
            ).alias("durbin_watson"),
            F.when(2 * F.col("sd2") < 3 * F.col("se2"), 1)
            .otherwise(0)
            .cast("int")
            .alias("positive_autocorr"),
        )
    )


# ---------------------------------------------------------------------------
# ext_markov_entropy_rate — entropy rate of the user event-type chain
# ---------------------------------------------------------------------------


@register(
    "ext_markov_entropy_rate",
    f"""
    WITH seq AS (
        SELECT event_type AS cur, LEAD(event_type) OVER w AS nxt
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tr AS MATERIALIZED (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS nij
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ), rows_ AS (
        SELECT cur, CAST(SUM(nij) AS BIGINT) AS ni FROM tr GROUP BY cur
    ), tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM tr),
    terms AS MATERIALIZED (
        SELECT t.cur, t.nij, r.ni, o.n,
               CAST(ROUND(-(r.ni * 1.0 / o.n) * (t.nij * 1.0 / r.ni)
                          * ln(t.nij * 1.0 / r.ni) * 1000000000.0)
                    AS BIGINT) AS units
        FROM tr t JOIN rows_ r ON r.cur = t.cur CROSS JOIN tot o
    )
    SELECT cur AS state,
           CAST(ANY_VALUE(ni) AS BIGINT) AS n_from,
           {dround('ANY_VALUE(ni) * 1.0 / ANY_VALUE(n)', 6)} AS pi,
           {dround('SUM(units) / 1000000000.0', 6)} AS weighted_row_entropy,
           {dround('SUM(SUM(units)) OVER () / 1000000000.0', 6)}
               AS entropy_rate_nats
    FROM terms GROUP BY cur ORDER BY state
    """,
)
def ext_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user behavior chain: with empirical
    transition probabilities P(j|i) (ext_event_transition's matrix)
    and source-state weights pi_i, H = -sum_i pi_i sum_j P(j|i) ln
    P(j|i) — the single number that says how predictable user journeys
    are (low = scripted flows, high = noise), per-state contributions
    reported with the global rate on every row.

    Determinism: every probability is a ratio of exact transition
    counts; each (i,j) term is snapped to integer 1e-9 units BEFORE
    any sum (ext_drift_psi discipline), so state and global rollups
    are exact BIGINT reduces.

    Scale shape: ONE user-keyed LEAD window (the sequence shuffle),
    a transition-matrix count bounded by #event_types^2, and
    grid-sized algebra after. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    tr = seq.groupBy("cur", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("nij")
    ).localCheckpoint(eager=False)  # feeds row sums AND the term grid
    rows_ = tr.groupBy("cur").agg(F.sum("nij").cast("bigint").alias("ni"))
    tot = tr.agg(F.sum("nij").cast("bigint").alias("n"))
    pij = F.col("nij") * 1.0 / F.col("ni")
    terms = (
        tr.join(F.broadcast(rows_), "cur")
        .crossJoin(F.broadcast(tot))
        .select(
            "cur",
            "ni",
            "n",
            F.round(
                -(F.col("ni") * 1.0 / F.col("n")) * pij * F.log(pij) * 1e9, 0
            )
            .cast("bigint")
            .alias("units"),
        )
    )
    w_all = Window.partitionBy()
    per_state = terms.groupBy("cur").agg(
        F.first("ni").cast("bigint").alias("n_from"),
        F.round(F.first("ni") * 1.0 / F.first("n"), 6).alias("pi"),
        F.sum("units").alias("state_units"),
    )
    return per_state.select(
        F.col("cur").alias("state"),
        "n_from",
        "pi",
        F.round(F.col("state_units") / 1e9, 6).alias("weighted_row_entropy"),
        F.round(F.sum("state_units").over(w_all) / 1e9, 6).alias(
            "entropy_rate_nats"
        ),
    ).orderBy("state")


# ---------------------------------------------------------------------------
# ext_overdispersion_check — index-of-dispersion test on hourly arrivals
# ---------------------------------------------------------------------------


@register(
    "ext_overdispersion_check",
    f"""
    WITH h AS (
        SELECT event_type, CAST(ts AS DATE) AS d, EXTRACT(hour FROM ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2, 3
    ), win AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT DISTINCT CAST(ts AS DATE), EXTRACT(hour FROM ts) FROM events
        )
    ), m AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q
        FROM h GROUP BY event_type
    )
    SELECT event_type, w.n AS n_hours, m.s AS n_events,
           {dround('m.s * 1.0 / w.n', 6)} AS mean_per_hour,
           {dround('''(w.n * m.q - m.s * m.s) * 1.0
                      / ((w.n - 1) * m.s)''', 6)} AS dispersion_index,
           CAST(CASE WHEN w.n * m.q - m.s * m.s > (w.n - 1) * m.s
                     THEN 1 ELSE 0 END AS INTEGER) AS overdispersed
    FROM m CROSS JOIN win w
    ORDER BY event_type
    """,
)
def ext_overdispersion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion (variance-to-mean) test on hourly arrivals
    per event type: a Poisson process has index 1; index > 1 means
    bursty/clumped arrivals — the distributional companion to
    ext_events_burst_hours (which flags WHICH hours; this key says
    whether the process is Poisson at all, deciding if that alarm's
    model even applies). Empty hours count (the observation window is
    every hour with any activity), so the mean is S/N over the full
    window.

    Determinism: the verdict is the exact integer cross-multiplication
    n*Q - S^2 > (n-1)*S; reported ratios divide identical integers.

    Scale shape: one (type, date, hour)-keyed count, a distinct-hour
    scalar, and a #types-row rollup — all map-side combined. Cited
    parity anchor: /root/reference/models (beyond-reference
    surface)."""
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        F.hour("ts").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    win = (
        ev.select(F.to_date("ts").alias("d"), F.hour("ts").alias("hr"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    m = h.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("q"),
    )
    d_num = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        m.crossJoin(F.broadcast(win))
        .select(
            "event_type",
            F.col("n").alias("n_hours"),
            F.col("s").alias("n_events"),
            F.round(F.col("s") * 1.0 / F.col("n"), 6).alias("mean_per_hour"),
            F.round(d_num * 1.0 / ((F.col("n") - 1) * F.col("s")), 6).alias(
                "dispersion_index"
            ),
            F.when(d_num > (F.col("n") - 1) * F.col("s"), 1)
            .otherwise(0)
            .cast("int")
            .alias("overdispersed"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# ext_udtf_installments — Python UDTF payment-schedule expansion
# ---------------------------------------------------------------------------

INSTALLMENTS = 3  # equal monthly installments per open order


@register(
    "ext_udtf_installments",
    f"""
    WITH open_orders AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderstatus = 'O'
    ), inst AS (
        SELECT o_orderkey,
               i AS installment_no,
               CAST(cents // {INSTALLMENTS}
                    + CASE WHEN i = 1 THEN cents % {INSTALLMENTS} ELSE 0 END
                    AS BIGINT) AS inst_cents
        FROM open_orders,
             (SELECT unnest(generate_series(1, {INSTALLMENTS})) AS i)
    )
    SELECT CAST(installment_no AS INTEGER) AS installment_no,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(inst_cents) AS BIGINT) AS total_cents
    FROM inst GROUP BY installment_no ORDER BY installment_no
    """,
)
def ext_udtf_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payment-schedule expansion through a Python UDTF (Spark 4
    user-defined TABLE function): every open order lateral-expands into
    {INSTALLMENTS} installments with an exact cent split (floor share
    per installment, remainder cents on the first), rolled up per
    installment number — the 1:N generator API surface none of the
    other keys exercise (explode covers array fan-out; a UDTF runs
    arbitrary Python per input row and yields rows).

    Determinism: integer floor/mod arithmetic inside the UDTF; the
    oracle replays it with generate_series.

    Scale shape: UDTFs evaluate row-at-a-time in Python — the
    documented cost of this API (use explode/sequence for anything
    expressible as columns; a UDTF is for generator logic that needs
    real Python). The status filter pushes to the scan, and the
    rollup collapses to {INSTALLMENTS} rows map-side. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="installment_no int, inst_cents long")
    class Installments:
        def eval(self, cents: int):
            base = cents // INSTALLMENTS
            rem = cents % INSTALLMENTS
            for i in range(1, INSTALLMENTS + 1):
                yield i, base + (rem if i == 1 else 0)

    spark.udtf.register("pay_installments", Installments)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents")
    ).createOrReplaceTempView("_open_orders_cents")
    inst = spark.sql(
        "SELECT i.installment_no, i.inst_cents "
        "FROM _open_orders_cents o, LATERAL pay_installments(o.cents) i"
    )
    return (
        inst.groupBy(F.col("installment_no").cast("int").alias("installment_no"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("inst_cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("installment_no")
    )


ext_udtf_installments.__doc__ = ext_udtf_installments.__doc__.replace(
    "{INSTALLMENTS}", str(INSTALLMENTS)
)


# ---------------------------------------------------------------------------
# ext_safety_stock — z-service-level safety stock from demand variability
# ---------------------------------------------------------------------------

Z95_SERVICE = 1.644854  # one-sided 95% service level z


@register(
    "ext_safety_stock",
    f"""
    WITH d AS (
        SELECT p.p_brand AS brand,
               date_trunc('month', l.l_shipdate)::DATE AS month,
               CAST(SUM(CAST(FLOOR(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ), m AS (
        SELECT brand,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(qty) AS HUGEINT) AS s,
               CAST(SUM(CAST(qty AS HUGEINT) * qty) AS HUGEINT) AS q
        FROM d GROUP BY brand
    )
    SELECT brand, CAST(n AS BIGINT) AS n_months,
           {dround('CAST(s AS BIGINT) * 1.0 / CAST(n AS BIGINT)', 6)}
               AS mean_monthly_qty,
           {dround('''sqrt(CAST(CAST(n * q - s * s AS VARCHAR) AS DOUBLE)
                      / CAST(CAST(n * (n - 1) AS VARCHAR) AS DOUBLE))''', 6)}
               AS sigma_monthly_qty,
           CAST(CEIL({Z95_SERVICE}
                     * sqrt(CAST(CAST(n * q - s * s AS VARCHAR) AS DOUBLE)
                            / CAST(CAST(n * (n - 1) AS VARCHAR) AS DOUBLE)))
                AS BIGINT) AS safety_stock_units
    FROM m ORDER BY brand
    """,
)
def ext_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety-stock recommendation per brand at a 95% service level:
    SS = z * sigma(monthly demand) for a one-month replenishment lead —
    the inventory-planning op that consumes ext_demand_xyz's
    variability classes and turns them into order-up-to units
    (CEIL'd: you can't stock fractional units).

    Determinism: demand moments are exact 128-bit integers; sigma
    converts through the string path (ext_metric_cuped discipline) and
    sqrt is IEEE-exact; the z constant is one shared literal, so CEIL
    lands on identical doubles.

    Scale shape: one (brand, month) aggregate behind a broadcast part
    join, then scalar algebra on 25 brand rows. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    d = (
        li.select(
            F.col("l_partkey").alias("p_partkey"),
            F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
            F.floor("l_quantity").cast("bigint").alias("u"),
        )
        .join(F.broadcast(pt), "p_partkey")
        .groupBy("brand", "month")
        .agg(F.sum("u").cast("bigint").alias("qty"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = d.groupBy("brand").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("qty"))).alias("s"),
        F.sum(dec(F.col("qty")) * dec(F.col("qty"))).alias("q"),
    )
    sigma = F.sqrt(
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    return m.select(
        "brand",
        F.col("n").cast("bigint").alias("n_months"),
        F.round(
            F.col("s").cast("bigint") * 1.0 / F.col("n").cast("bigint"), 6
        ).alias("mean_monthly_qty"),
        F.round(sigma, 6).alias("sigma_monthly_qty"),
        F.ceil(Z95_SERVICE * sigma).cast("bigint").alias("safety_stock_units"),
    ).orderBy("brand")


# ---------------------------------------------------------------------------
# ext_eb_shrinkage — empirical-Bayes smoothed return-rate ranking
# ---------------------------------------------------------------------------

EB_PRIOR_M = 20  # pseudo-count prior strength
EB_TOPN = 25  # largest shrinkage movers reported


@register(
    "ext_eb_shrinkage",
    f"""
    WITH per_part AS (
        SELECT l_partkey AS partkey,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_returns
        FROM lineitem GROUP BY l_partkey
    ), g AS (
        SELECT CAST(SUM(n_lines) AS BIGINT) AS tn,
               CAST(SUM(n_returns) AS BIGINT) AS tr FROM per_part
    ), sc AS (
        SELECT p.partkey, p.n_lines, p.n_returns,
               p.n_returns * 1.0 / p.n_lines AS raw_rate,
               (p.n_returns + {EB_PRIOR_M} * (g.tr * 1.0 / g.tn))
                   / (p.n_lines + {EB_PRIOR_M}) AS shrunk_rate
        FROM per_part p CROSS JOIN g
    )
    SELECT partkey, n_lines, n_returns,
           {dround('raw_rate', 6)} AS raw_rate,
           {dround('shrunk_rate', 6)} AS shrunk_rate,
           {dround('ABS(raw_rate - shrunk_rate)', 6)} AS shrink_delta
    FROM sc
    ORDER BY {dround('ABS(raw_rate - shrunk_rate)', 6)} DESC, partkey
    LIMIT {EB_TOPN}
    """,
)
def ext_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes smoothed return-rate ranking: every part's raw
    return rate shrinks toward the corpus rate with pseudo-count
    strength {EB_PRIOR_M} — (x + M*p)/(n + M) — and the {EB_TOPN}
    parts the prior moves MOST are reported (these are exactly the
    small-sample parts whose raw rates were noise). The Bayesian
    sibling of ext_return_rate_wilson's frequentist interval.

    Determinism: rates combine exact integers through identical
    expression trees; the report orders on the ROUNDED delta with a
    partkey tiebreak — a total order.

    Scale shape: one partkey-keyed conditional aggregate (map-side
    combined), a broadcast scalar prior, narrow algebra, TakeOrdered
    {EB_TOPN}. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("n_returns"),
    )
    g = per_part.agg(
        F.sum("n_lines").cast("bigint").alias("tn"),
        F.sum("n_returns").cast("bigint").alias("tr"),
    )
    raw = F.col("n_returns") * 1.0 / F.col("n_lines")
    shrunk = (
        F.col("n_returns") + EB_PRIOR_M * (F.col("tr") * 1.0 / F.col("tn"))
    ) / (F.col("n_lines") + EB_PRIOR_M)
    return (
        per_part.crossJoin(F.broadcast(g))
        .select(
            "partkey",
            "n_lines",
            "n_returns",
            F.round(raw, 6).alias("raw_rate"),
            F.round(shrunk, 6).alias("shrunk_rate"),
            F.round(F.abs(raw - shrunk), 6).alias("shrink_delta"),
        )
        .orderBy(F.desc("shrink_delta"), "partkey")
        .limit(EB_TOPN)
    )


ext_eb_shrinkage.__doc__ = ext_eb_shrinkage.__doc__.replace(
    "{EB_PRIOR_M}", str(EB_PRIOR_M)
).replace("{EB_TOPN}", str(EB_TOPN))


# ---------------------------------------------------------------------------
# ext_arrow_length_hist — Arrow-native batch processing via mapInArrow
# ---------------------------------------------------------------------------

LEN_BUCKET_W = 64  # byte-length bucket width


@register(
    "ext_arrow_length_hist",
    f"""
    SELECT CAST(FLOOR(strlen(text) / {LEN_BUCKET_W}.0) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
    FROM documents GROUP BY 1 ORDER BY bucket
    """,
)
def ext_arrow_length_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document byte-length histogram computed through mapInArrow — the
    Arrow-NATIVE Python path (pyarrow RecordBatch in, RecordBatch out,
    zero pandas conversion): per batch, pyarrow.compute derives lengths
    and bucket ids columnar-side, and Spark finishes the bucket rollup.
    The registry's other Python escapes are pandas-based (mapInPandas /
    cogroup / pandas_udf); mapInArrow is the lowest-overhead variant —
    use it when the Python work is itself columnar (codec shims,
    tensor slicing) and the pandas materialization would only add
    copies.

    Determinism: byte lengths and integer bucket arithmetic only
    (corpus is ASCII, so DuckDB strlen == Arrow binary_length).

    Scale shape: a narrow Arrow-batch map (no shuffle) followed by ONE
    bucket-keyed rollup, map-side combined. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load(spark, sf_dir, "documents").select("text")

    def lengths(batches):
        for batch in batches:
            n = pc.binary_length(batch.column(0))
            bucket = pc.cast(
                pc.floor(pc.divide(pc.cast(n, pa.float64()), LEN_BUCKET_W)),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [bucket, pc.cast(n, pa.int64())], ["bucket", "nbytes"]
            )

    mapped = docs.mapInArrow(lengths, schema="bucket long, nbytes long")
    return (
        mapped.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# ext_recency_weighted_ltv — exponential time-decay customer scoring
# ---------------------------------------------------------------------------

LTV_HALF_LIFE_DAYS = 365.0  # decay half-life
LTV_TOPN = 25


@register(
    "ext_recency_weighted_ltv",
    f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS mxd FROM orders),
    per_order AS (
        SELECT o_custkey,
               CAST(ROUND(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                          * pow(2.0, -(datediff('day', o_orderdate, mx.mxd))
                                      / {LTV_HALF_LIFE_DAYS})
                          * 1000.0) AS BIGINT) AS mu
        FROM orders CROSS JOIN mx
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dround('SUM(mu) / 100000.0', 6)} AS decayed_ltv_dollars
    FROM per_order GROUP BY o_custkey
    ORDER BY SUM(mu) DESC, o_custkey
    LIMIT {LTV_TOPN}
    """,
)
def ext_recency_weighted_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted customer value: every order's exact cents decay
    by 2^(-age/half-life) from the corpus's latest order date, and the
    {LTV_TOPN} highest decayed-LTV customers are reported — the scoring
    behind win-back targeting and churn-weighted CLV (the decayed
    sibling of ext_customer_rfm's hard recency buckets).

    Determinism: the decay multiplies an exact integer by pow(2, -k/h)
    of an identical integer ratio; pow may differ by an ulp across
    libm builds, so every order's decayed value snaps to integer
    MILLI-cent units per row before the customer sum (1-ulp relative
    error ~1e-16 on <=1e7 cents is far below the 1e-3-cent snap) — the
    ranking then orders exact BIGINTs with a custkey tiebreak.

    Scale shape: a scalar max-date broadcast, a narrow decay map, ONE
    custkey-keyed sum (map-side combined), TakeOrdered {LTV_TOPN}.
    Cited parity anchor: /root/reference/models (beyond-reference
    surface)."""
    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    age = F.datediff(F.col("mxd"), F.col("o_orderdate"))
    mu = F.round(
        cents * F.pow(F.lit(2.0), -age / LTV_HALF_LIFE_DAYS) * 1000.0, 0
    ).cast("bigint")
    return (
        o.crossJoin(F.broadcast(mx))
        .select(F.col("o_custkey").alias("custkey"), mu.alias("mu"))
        .groupBy("custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("mu").alias("smu"),
        )
        .orderBy(F.desc("smu"), "custkey")
        .limit(LTV_TOPN)
        .select(
            "custkey",
            "n_orders",
            F.round(F.col("smu") / 100000.0, 6).alias("decayed_ltv_dollars"),
        )
    )


ext_recency_weighted_ltv.__doc__ = ext_recency_weighted_ltv.__doc__.replace(
    "{LTV_TOPN}", str(LTV_TOPN)
)


# ---------------------------------------------------------------------------
# ext_tail_index_hill — Hill estimator of the revenue power-law tail
# ---------------------------------------------------------------------------

HILL_K = 100  # tail order statistics used


@register(
    "ext_tail_index_hill",
    f"""
    WITH d AS (
        SELECT o_orderkey,
               CAST(FLOOR(CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0)
                    AS BIGINT) AS dollars
        FROM orders
    ), top AS MATERIALIZED (
        SELECT o_orderkey, dollars,
               ROW_NUMBER() OVER (ORDER BY dollars DESC, o_orderkey) AS rk
        FROM d
        QUALIFY ROW_NUMBER() OVER (ORDER BY dollars DESC, o_orderkey)
                <= {HILL_K} + 1
    ), xk AS (SELECT dollars AS xk1 FROM top WHERE rk = {HILL_K} + 1),
    terms AS (
        SELECT CAST(ROUND(ln(t.dollars * 1.0 / x.xk1) * 1000000000.0)
                    AS BIGINT) AS units
        FROM top t CROSS JOIN xk x WHERE t.rk <= {HILL_K}
    )
    SELECT {HILL_K} AS k,
           (SELECT CAST(xk1 AS BIGINT) FROM xk) AS x_k1_dollars,
           {dround(f'SUM(units) * 1.0 / {HILL_K} / 1000000000.0', 6)}
               AS hill_inv_alpha,
           {dround(f'{HILL_K} * 1000000000.0 / SUM(units)', 6)} AS tail_alpha
    FROM terms
    """,
)
def ext_tail_index_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the revenue tail index: over the top
    {HILL_K} order values, 1/alpha = mean ln(x_i / x_(k+1)) — the
    standard heavy-tail exponent estimate that quantifies what
    ext_part_pareto and ext_spend_gini only rank (alpha ~ 1-2 = true
    power-law whale regime; large alpha = thin tail).

    Determinism: values quantize to whole dollars; the top-(k+1) set
    is a (dollars DESC, orderkey) total order; each log-ratio of
    identical integers snaps to 1e-9 units per row before the mean
    (ext_drift_psi discipline).

    Scale shape: TakeOrdered {HILL_K}+1 over the scan (no global
    sort), then scalar algebra on k rows. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.floor(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100.0
        )
        .cast("bigint")
        .alias("dollars"),
    )
    top = (
        d.orderBy(F.desc("dollars"), "o_orderkey")
        .limit(HILL_K + 1)
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("dollars"), "o_orderkey")),
        )
        .localCheckpoint(eager=False)  # feeds x_(k+1) and the k terms
    )
    xk = top.filter(F.col("rk") == HILL_K + 1).select(
        F.col("dollars").alias("xk1")
    )
    terms = (
        top.filter(F.col("rk") <= HILL_K)
        .crossJoin(F.broadcast(xk))
        .select(
            F.round(F.log(F.col("dollars") * 1.0 / F.col("xk1")) * 1e9, 0)
            .cast("bigint")
            .alias("units")
        )
    )
    return terms.crossJoin(F.broadcast(xk)).agg(
        F.lit(HILL_K).alias("k"),
        F.first("xk1").cast("bigint").alias("x_k1_dollars"),
        F.round(F.sum("units") * 1.0 / HILL_K / 1e9, 6).alias("hill_inv_alpha"),
        F.round(HILL_K * 1e9 / F.sum("units"), 6).alias("tail_alpha"),
    )


ext_tail_index_hill.__doc__ = ext_tail_index_hill.__doc__.replace(
    "{HILL_K}", str(HILL_K)
)


# ---------------------------------------------------------------------------
# ext_conformal_interval — split-conformal prediction band per priority
# ---------------------------------------------------------------------------

CONF_LEVEL = 90  # conformal coverage percent


@register(
    "ext_conformal_interval",
    f"""
    WITH d AS (
        SELECT o_orderpriority AS priority,
               CAST(FLOOR(CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0)
                    AS BIGINT) AS v
        FROM orders
    ), grid AS (
        SELECT priority, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM d GROUP BY priority, v
    ), st AS (
        SELECT priority, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(v * c) AS BIGINT) AS s
        FROM grid GROUP BY priority
    ), resid AS (
        SELECT g.priority, g.c, s.n, s.s,
               ABS(s.n * g.v - s.s) AS r
        FROM grid g JOIN st s ON s.priority = g.priority
    ), ranked AS (
        SELECT priority, r, n, s,
               SUM(c) OVER (PARTITION BY priority ORDER BY r, c) AS cum
        FROM resid
    ), q AS (
        SELECT priority, n, s, MIN(r) AS qr
        FROM ranked
        WHERE cum >= CAST(CEIL({CONF_LEVEL} / 100.0 * (n + 1)) AS BIGINT)
        GROUP BY priority, n, s
    )
    SELECT priority, n AS n_orders,
           {dround('s * 1.0 / n', 6)} AS mean_dollars,
           {dround('qr * 1.0 / n', 6)} AS q_resid_dollars,
           {dround('(s - qr) * 1.0 / n', 6)} AS lo_dollars,
           {dround('(s + qr) * 1.0 / n', 6)} AS hi_dollars
    FROM q ORDER BY priority
    """,
)
def ext_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction band per order priority: the
    {CONF_LEVEL}% empirical quantile of |value - group mean| gives a
    distribution-free interval mean +/- q that covers a fresh order
    with >= {CONF_LEVEL}% probability (the ceil((n+1)q)/n rank is the
    standard conformal correction) — modern uncertainty quantification
    with zero distributional assumptions, the coverage-guaranteed
    sibling of ext_ab_power_analysis's parametric sigma.

    Determinism: values quantize to whole dollars and residuals are
    the EXACT integers |n*v - S| (mean never materializes as a float);
    the conformal rank picks the minimal residual whose weighted
    cumulative count crosses the exact ceil threshold — integer
    algebra end to end, with every reported double dividing identical
    integers.

    Scale shape: the corpus collapses to the value-bounded
    (priority, dollar) grid first; residual ranking windows over grid
    rows, never orders; the report is 5 rows. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100.0
        )
        .cast("bigint")
        .alias("v"),
    )
    grid = d.groupBy("priority", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    st = grid.groupBy("priority").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("bigint").alias("s"),
    )
    resid = grid.join(st, "priority").select(
        "priority",
        "c",
        "n",
        "s",
        F.abs(F.col("n") * F.col("v") - F.col("s")).alias("r"),
    )
    w = Window.partitionBy("priority").orderBy("r", "c").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = resid.select(
        "priority", "r", "n", "s", F.sum("c").over(w).alias("cum")
    )
    thresh = F.ceil(CONF_LEVEL / 100.0 * (F.col("n") + 1)).cast("bigint")
    q = (
        ranked.filter(F.col("cum") >= thresh)
        .groupBy("priority", "n", "s")
        .agg(F.min("r").alias("qr"))
    )
    return q.select(
        "priority",
        F.col("n").alias("n_orders"),
        F.round(F.col("s") * 1.0 / F.col("n"), 6).alias("mean_dollars"),
        F.round(F.col("qr") * 1.0 / F.col("n"), 6).alias("q_resid_dollars"),
        F.round((F.col("s") - F.col("qr")) * 1.0 / F.col("n"), 6).alias(
            "lo_dollars"
        ),
        F.round((F.col("s") + F.col("qr")) * 1.0 / F.col("n"), 6).alias(
            "hi_dollars"
        ),
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# ext_spectral_period — DFT power scan of the monthly revenue series
# ---------------------------------------------------------------------------

SPEC_MAX_K = 12  # harmonics scanned
TWO_PI = 6.283185307179586


@register(
    "ext_spectral_period",
    f"""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate)::DATE AS month,
               CAST(FLOOR(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                               AS BIGINT) / 100.0) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY month) - 1 AS t, y,
               COUNT(*) OVER () AS n
        FROM m
    ), terms AS MATERIALIZED (
        SELECT k.k,
               CAST(SUM(CAST(ROUND(y * cos({TWO_PI} * k.k * t / n)
                                   * 1000000.0) AS BIGINT)) AS HUGEINT) AS c,
               CAST(SUM(CAST(ROUND(y * sin({TWO_PI} * k.k * t / n)
                                   * 1000000.0) AS BIGINT)) AS HUGEINT) AS s
        FROM idx CROSS JOIN (SELECT unnest(generate_series(1, {SPEC_MAX_K}))
                             AS k) k
        GROUP BY k.k
    ), pw AS (
        SELECT k, c * c + s * s AS p2 FROM terms
    )
    SELECT CAST(k AS INTEGER) AS k,
           {dround('''CAST(CAST(p2 AS VARCHAR) AS DOUBLE)
                      / CAST(CAST(SUM(p2) OVER () AS VARCHAR) AS DOUBLE)''', 6)}
               AS power_share,
           CAST(CASE WHEN p2 = MAX(p2) OVER () THEN 1 ELSE 0 END AS INTEGER)
               AS is_dominant
    FROM pw ORDER BY k
    """,
)
def ext_spectral_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT power scan over the monthly revenue series: for harmonics
    k = 1..{SPEC_MAX_K}, the spectral power share |X_k|^2 / sum —
    the frequency-domain seasonality detector (a dominant k = 12/m
    harmonic means an m-month cycle), complementing
    ext_ts_autocorrelation's lag-domain view.

    Determinism: each cos/sin term multiplies an exact integer by a
    trig value of identical doubles and snaps to integer micro-units
    per (t, k) BEFORE summing (libm's last-ulp spread is ~1e-7 of the
    snapped product — divergence is bounded at one unit per term, far
    inside the terminal dround(6) of the normalized share); power
    squares widen to 128-bit and convert through the string path.

    Scale shape: corpus collapses to ~80 month rows; the k-fanout is
    {SPEC_MAX_K}x that grid; window algebra on {SPEC_MAX_K} rows.
    Cited parity anchor: /root/reference/models (beyond-reference
    surface)."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.floor(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            / 100.0
        )
        .cast("bigint")
        .alias("y")
    )
    idx = m.select(
        (F.row_number().over(Window.orderBy("month")) - 1).alias("t"),
        "y",
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    ks = spark.range(1, SPEC_MAX_K + 1).select(F.col("id").cast("int").alias("k"))
    arg = TWO_PI * F.col("k") * F.col("t") / F.col("n")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    terms = (
        idx.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(
                F.round(F.col("y") * F.cos(arg) * 1e6, 0).cast("bigint")
            ).cast("decimal(38,0)").alias("c"),
            F.sum(
                F.round(F.col("y") * F.sin(arg) * 1e6, 0).cast("bigint")
            ).cast("decimal(38,0)").alias("s"),
        )
    )
    pw = terms.select(
        "k", (dec(F.col("c")) * F.col("c") + dec(F.col("s")) * F.col("s")).alias("p2")
    )
    w_all = Window.partitionBy()
    return pw.select(
        F.col("k").cast("int").alias("k"),
        F.round(
            F.col("p2").cast("double")
            / F.sum("p2").over(w_all).cast("double"),
            6,
        ).alias("power_share"),
        F.when(F.col("p2") == F.max("p2").over(w_all), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_dominant"),
    ).orderBy("k")


ext_spectral_period.__doc__ = ext_spectral_period.__doc__.replace(
    "{SPEC_MAX_K}", str(SPEC_MAX_K)
)


# ---------------------------------------------------------------------------
# ext_spc_rules — statistical process control with Western Electric rules
# ---------------------------------------------------------------------------

SPC_RUN_LEN = 8  # consecutive same-side days for the run rule


@register(
    "ext_spc_rules",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(FLOOR(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                               AS BIGINT) / 100.0) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), st AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(y) AS HUGEINT) AS s,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS q
        FROM daily
    ), z AS MATERIALIZED (
        SELECT d.d, d.y, st.n, st.s,
               CAST(st.n AS HUGEINT) * d.y - st.s AS dev,
               st.n * st.q - st.s * st.s AS var_num
        FROM daily d CROSS JOIN st
    ), flags AS (
        SELECT d, y, dev,
               CASE WHEN dev * dev * (n - 1) > 9 * var_num * n
                    THEN 1 ELSE 0 END AS rule_3sigma,
               CASE WHEN SUM(CASE WHEN dev > 0 THEN 1 ELSE 0 END)
                         OVER (ORDER BY d ROWS BETWEEN {SPC_RUN_LEN - 1}
                               PRECEDING AND CURRENT ROW) = {SPC_RUN_LEN}
                         OR SUM(CASE WHEN dev < 0 THEN 1 ELSE 0 END)
                            OVER (ORDER BY d ROWS BETWEEN {SPC_RUN_LEN - 1}
                                  PRECEDING AND CURRENT ROW) = {SPC_RUN_LEN}
                    THEN 1 ELSE 0 END AS rule_run
        FROM z
    )
    SELECT d AS day, y AS dollars,
           CAST(rule_3sigma AS INTEGER) AS rule_3sigma,
           CAST(rule_run AS INTEGER) AS rule_run{SPC_RUN_LEN}
    FROM flags WHERE rule_3sigma = 1 OR rule_run = 1
    ORDER BY day
    """,
)
def ext_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process control on daily revenue with two Western
    Electric rules: rule 1 flags days beyond 3 sigma of the center
    line; rule 2 flags the {SPC_RUN_LEN}th consecutive day on the same
    side of it (a mean SHIFT that never trips 3 sigma) — the
    control-chart op behind ops dashboards, complementing
    ext_anomaly_rolling_z (rolling local z) with fixed control limits
    + run-length logic.

    Determinism: both rules are exact integer algebra — the sigma test
    is the cross-multiplication dev^2*(n-1) > 9*var_num*n on 128-bit
    deviations dev = n*y - S (the mean never floats), and the run rule
    counts sign flags in an exact window.

    Scale shape: corpus collapses to the day series; one scalar moment
    reduce broadcast back; the run window orders the ~2.4k-row series.
    Cited parity anchor: /root/reference/models (beyond-reference
    surface)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.floor(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            / 100.0
        )
        .cast("bigint")
        .alias("y")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("y"))).alias("s"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("q"),
    )
    z = daily.crossJoin(F.broadcast(st)).select(
        "d",
        "y",
        "n",
        (F.col("n") * dec(F.col("y")) - F.col("s")).alias("dev"),
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).alias("var_num"),
    )
    w_run = Window.orderBy("d").rowsBetween(-(SPC_RUN_LEN - 1), 0)
    above = F.sum(F.when(F.col("dev") > 0, 1).otherwise(0)).over(w_run)
    below = F.sum(F.when(F.col("dev") < 0, 1).otherwise(0)).over(w_run)
    flags = z.select(
        "d",
        "y",
        F.when(
            F.col("dev") * F.col("dev") * (F.col("n") - 1)
            > 9 * F.col("var_num") * F.col("n"),
            1,
        )
        .otherwise(0)
        .alias("rule_3sigma"),
        F.when((above == SPC_RUN_LEN) | (below == SPC_RUN_LEN), 1)
        .otherwise(0)
        .alias("rule_run"),
    )
    return (
        flags.filter((F.col("rule_3sigma") == 1) | (F.col("rule_run") == 1))
        .select(
            F.col("d").cast("date").alias("day"),
            F.col("y").alias("dollars"),
            F.col("rule_3sigma").cast("int").alias("rule_3sigma"),
            F.col("rule_run").cast("int").alias(f"rule_run{SPC_RUN_LEN}"),
        )
        .orderBy("day")
    )


ext_spc_rules.__doc__ = ext_spc_rules.__doc__.replace(
    "{SPC_RUN_LEN}", str(SPC_RUN_LEN)
)


# ---------------------------------------------------------------------------
# ext_ipf_raking — iterative proportional fitting to uniform margins
# ---------------------------------------------------------------------------

IPF_ROUNDS = 2  # full row+column scaling rounds (bounded-budget contract)
IPF_UNIT = 1_000_000  # weights carried as integer micro-units


def _ipf_oracle() -> str:
    lines = [
        f"""
    WITH cells AS MATERIALIZED (
        SELECT o_orderpriority AS pri, o_orderstatus AS st,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1, 2
    ), dims AS (
        SELECT CAST(COUNT(DISTINCT pri) AS BIGINT) AS nr,
               CAST(COUNT(DISTINCT st) AS BIGINT) AS nc,
               CAST(SUM(n) AS BIGINT) AS tot
        FROM cells
    ), w0 AS MATERIALIZED (
        SELECT pri, st, n, CAST(n AS BIGINT) * {IPF_UNIT} AS w
        FROM cells
    )"""
    ]
    prev = "w0"
    for r in range(1, IPF_ROUNDS + 1):
        lines.append(
            f""", r{r} AS MATERIALIZED (
        SELECT c.pri, c.st, c.n,
               CAST(ROUND(c.w * ((d.tot * 1.0 * {IPF_UNIT} / d.nr)
                                 / rs.rw)) AS BIGINT) AS w
        FROM {prev} c
        JOIN (SELECT pri, CAST(SUM(w) AS BIGINT) AS rw FROM {prev}
              GROUP BY pri) rs ON rs.pri = c.pri
        CROSS JOIN dims d
    ), c{r} AS MATERIALIZED (
        SELECT c.pri, c.st, c.n,
               CAST(ROUND(c.w * ((d.tot * 1.0 * {IPF_UNIT} / d.nc)
                                 / cs.cw)) AS BIGINT) AS w
        FROM r{r} c
        JOIN (SELECT st, CAST(SUM(w) AS BIGINT) AS cw FROM r{r}
              GROUP BY st) cs ON cs.st = c.st
        CROSS JOIN dims d
    )"""
        )
        prev = f"c{r}"
    lines.append(
        f"""
    SELECT pri AS priority, st AS status, n AS n_orders,
           {dround(f'w / {IPF_UNIT}.0', 6)} AS raked_weight
    FROM {prev} ORDER BY priority, status
    """
    )
    return "".join(lines)


@register("ext_ipf_raking", _ipf_oracle())
def ext_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (survey raking): the
    (priority x status) order-count table is alternately row- and
    column-scaled toward UNIFORM margins for {IPF_ROUNDS} full rounds
    — the weighting technique survey statistics and panel calibration
    run to make a sample's margins match a population's, under the
    registry's bounded-iteration contract (ext_kmeans_lloyd /
    ext_graph_kcore).

    Determinism: weights live as integer micro-units; each half-round
    multiplies by a target/margin ratio of exact integers and
    re-snaps to integer units (quantized-IPF contract — both engines
    round the identical product), so every margin sum downstream is an
    exact BIGINT reduce.

    Scale shape: ONE corpus aggregate to the 15-cell grid; every
    scaling half-round is grid-sized joins against 5- and 3-row margin
    tables. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dims = cells.agg(
        F.countDistinct("pri").cast("bigint").alias("nr"),
        F.countDistinct("st").cast("bigint").alias("nc"),
        F.sum("n").cast("bigint").alias("tot"),
    )
    w = cells.select(
        "pri", "st", "n", (F.col("n") * IPF_UNIT).cast("bigint").alias("w")
    ).localCheckpoint(eager=False)
    for _ in range(IPF_ROUNDS):
        rs = w.groupBy("pri").agg(F.sum("w").cast("bigint").alias("rw"))
        w = (
            w.join(rs, "pri")
            .crossJoin(F.broadcast(dims))
            .select(
                "pri",
                "st",
                "n",
                F.round(
                    F.col("w")
                    * (
                        (F.col("tot") * 1.0 * IPF_UNIT / F.col("nr"))
                        / F.col("rw")
                    ),
                    0,
                )
                .cast("bigint")
                .alias("w"),
            )
        )
        cs = w.groupBy("st").agg(F.sum("w").cast("bigint").alias("cw"))
        w = (
            w.join(cs, "st")
            .crossJoin(F.broadcast(dims))
            .select(
                "pri",
                "st",
                "n",
                F.round(
                    F.col("w")
                    * (
                        (F.col("tot") * 1.0 * IPF_UNIT / F.col("nc"))
                        / F.col("cw")
                    ),
                    0,
                )
                .cast("bigint")
                .alias("w"),
            )
            .localCheckpoint(eager=False)  # linear lineage across rounds
        )
    return w.select(
        F.col("pri").alias("priority"),
        F.col("st").alias("status"),
        F.col("n").alias("n_orders"),
        F.round(F.col("w") / float(IPF_UNIT), 6).alias("raked_weight"),
    ).orderBy("priority", "status")


ext_ipf_raking.__doc__ = ext_ipf_raking.__doc__.replace(
    "{IPF_ROUNDS}", str(IPF_ROUNDS)
)


# ---------------------------------------------------------------------------
# ext_join_size_estimate — AMS inner-product join-cardinality estimation
# ---------------------------------------------------------------------------

JSE_LANES = 16  # +/-1 lanes shared with the F2 sketch discipline


def _jse_oracle() -> str:
    from .llm_ops import _md5_32

    h_o = _md5_32("'ams:' || CAST(o_orderkey AS VARCHAR)")
    h_l = _md5_32("'ams:' || CAST(l_orderkey AS VARCHAR)")
    zo = ", ".join(
        f"""CAST(SUM(CASE WHEN (({h_o}) >> {i}) & 1 = 0 THEN 1 ELSE -1 END)
             AS BIGINT) AS zo{i}"""
        for i in range(JSE_LANES)
    )
    zl = ", ".join(
        f"""CAST(SUM(CASE WHEN (({h_l}) >> {i}) & 1 = 0 THEN 1 ELSE -1 END)
             AS BIGINT) AS zl{i}"""
        for i in range(JSE_LANES)
    )
    prod = " + ".join(f"o.zo{i} * l.zl{i}" for i in range(JSE_LANES))
    return f"""
    WITH o AS (SELECT {zo} FROM orders),
    l AS (SELECT {zl} FROM lineitem),
    exact AS (
        SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS exact_join_rows
        FROM (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
              FROM orders GROUP BY 1) a
        JOIN (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS c
              FROM lineitem GROUP BY 1) b ON a.k = b.k
    )
    SELECT e.exact_join_rows,
           {dround(f'({prod}) * 1.0 / {JSE_LANES}', 6)} AS est_join_rows,
           {dround(f'''ABS(({prod}) * 1.0 / {JSE_LANES} - e.exact_join_rows)
                       / e.exact_join_rows''', 6)} AS rel_err
    FROM o CROSS JOIN l CROSS JOIN exact e
    """


@register("ext_join_size_estimate", _jse_oracle())
def ext_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation WITHOUT running the join: the AMS
    inner-product identity |A join B| ~ mean_lanes(Z_A * Z_B) over
    shared +/-1 hash lanes — the sketch a cost-based optimizer (or a
    pre-flight job-size guard) consults before committing to a shuffle
    plan; the exact key-count join rides along to expose the error.
    Completes the AMS family (ext_sketch_ams_f2 is the self-join /
    skew case; this is the two-table inner product).

    Determinism: both sides' lane sums are exact integers of the SAME
    md5-derived sign bits (one hash per row, bits sliced); estimates
    divide identical integers, dround(6).

    Scale shape: each side computes all lanes in ONE map-side scalar
    aggregate over its scan — the estimator never shuffles either
    table; only the exact check joins (orderkey-keyed count tables).
    Cited parity anchor: /root/reference/models (beyond-reference
    surface)."""
    from .llm_ops import _spark_md5_32

    def lanes(df, keycol, prefix):
        h = _spark_md5_32(
            F.concat(F.lit("ams:"), F.col(keycol).cast("string"))
        )
        d = df.withColumn("_h", h)
        aggs = []
        for i in range(JSE_LANES):
            sign = F.when(
                F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 0, 1
            ).otherwise(-1)
            aggs.append(F.sum(sign).cast("bigint").alias(f"{prefix}{i}"))
        return d.agg(*aggs)

    o = load(spark, sf_dir, "orders").select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    zo = lanes(o, "o_orderkey", "zo")
    zl = lanes(li, "l_orderkey", "zl")
    a = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("ca")
    )
    b = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cb")
    )
    exact = (
        a.join(b, "k")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("exact_join_rows"))
    )
    prod = None
    for i in range(JSE_LANES):
        t = F.col(f"zo{i}") * F.col(f"zl{i}")
        prod = t if prod is None else prod + t
    est = prod * 1.0 / JSE_LANES
    return (
        zo.crossJoin(F.broadcast(zl))
        .crossJoin(F.broadcast(exact))
        .select(
            "exact_join_rows",
            F.round(est, 6).alias("est_join_rows"),
            F.round(
                F.abs(est - F.col("exact_join_rows")) / F.col("exact_join_rows"),
                6,
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# ext_part_vintage_revenue — revenue by part age (vintage analysis)
# ---------------------------------------------------------------------------

VINTAGE_BUCKET_MONTHS = 6


@register(
    "ext_part_vintage_revenue",
    f"""
    WITH first_ship AS MATERIALIZED (
        SELECT l_partkey, MIN(date_trunc('month', l_shipdate)::DATE) AS fm
        FROM lineitem GROUP BY l_partkey
    ), aged AS (
        SELECT CAST(FLOOR(((EXTRACT(year FROM l.l_shipdate) * 12
                            + EXTRACT(month FROM l.l_shipdate))
                           - (EXTRACT(year FROM f.fm) * 12
                              + EXTRACT(month FROM f.fm)))
                          / {VINTAGE_BUCKET_MONTHS}.0) AS BIGINT) AS age_bucket,
               CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
                    AS BIGINT) AS cents
        FROM lineitem l JOIN first_ship f ON f.l_partkey = l.l_partkey
    ), g AS (
        SELECT age_bucket, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(cents) AS BIGINT) AS revenue_cents
        FROM aged GROUP BY age_bucket
    )
    SELECT age_bucket, n_lines, revenue_cents,
           {dround('revenue_cents * 1.0 / SUM(revenue_cents) OVER ()', 6)}
               AS revenue_share
    FROM g ORDER BY age_bucket
    """,
)
def ext_part_vintage_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vintage analysis of revenue by PART age: every line item is
    bucketed by how many {VINTAGE_BUCKET_MONTHS}-month periods have
    passed since its part's first-ever shipment, and each vintage
    bucket reports its revenue share — the product-lifecycle
    decomposition (how much revenue rides on recently-introduced
    parts?) that complements ext_new_vs_returning's customer-side
    split.

    Determinism: ages are exact month arithmetic (year*12 + month on
    both engines); FLOOR-bucketed; revenue in exact cents; the share
    divides identical integers.

    Scale shape: one partkey-keyed MIN (map-side combined), a
    partkey-keyed join back (co-partitioned fact-to-derived), one
    bucket rollup; the share window runs over <= a dozen bucket rows.
    Cited parity anchor: /root/reference/models (beyond-reference
    surface)."""
    li = load(spark, sf_dir, "lineitem")
    first_ship = li.groupBy("l_partkey").agg(
        F.min(F.date_trunc("month", "l_shipdate").cast("date")).alias("fm")
    )
    months = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731
    aged = li.join(first_ship, "l_partkey").select(
        F.floor(
            (months(F.col("l_shipdate")) - months(F.col("fm")))
            / float(VINTAGE_BUCKET_MONTHS)
        )
        .cast("bigint")
        .alias("age_bucket"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0)
        .cast("bigint")
        .alias("cents"),
    )
    g = aged.groupBy("age_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    w_all = Window.partitionBy()
    return g.select(
        "age_bucket",
        "n_lines",
        "revenue_cents",
        F.round(
            F.col("revenue_cents") * 1.0 / F.sum("revenue_cents").over(w_all),
            6,
        ).alias("revenue_share"),
    ).orderBy("age_bucket")


ext_part_vintage_revenue.__doc__ = ext_part_vintage_revenue.__doc__.replace(
    "{VINTAGE_BUCKET_MONTHS}", str(VINTAGE_BUCKET_MONTHS)
)


# ---------------------------------------------------------------------------
# ext_design_effect — effective sample size of the raked weights
# ---------------------------------------------------------------------------


def _deff_oracle() -> str:
    # reuse the IPF chain, then Kish's formula over per-order weights
    chain = _ipf_oracle()
    cut = chain.rindex("SELECT pri AS priority")
    return (
        chain[:cut].rstrip()
        + ", "
        + f"""u AS (
        SELECT n, w,
               CAST(ROUND(CAST(w AS HUGEINT) * w * 1.0 / n) AS HUGEINT) AS w2n
        FROM c{IPF_ROUNDS}
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_orders,
           {dround(f'''(CAST(CAST(SUM(CAST(w AS HUGEINT)) AS VARCHAR) AS DOUBLE)
                        * CAST(CAST(SUM(CAST(w AS HUGEINT)) AS VARCHAR) AS DOUBLE))
                       / CAST(CAST(SUM(w2n) AS VARCHAR) AS DOUBLE)
                       / {IPF_UNIT}.0 * 1.0''', 6)} AS n_effective,
           {dround(f'''SUM(n) * CAST(CAST(SUM(w2n) AS VARCHAR) AS DOUBLE)
                       / (CAST(CAST(SUM(CAST(w AS HUGEINT)) AS VARCHAR) AS DOUBLE)
                          * CAST(CAST(SUM(CAST(w AS HUGEINT)) AS VARCHAR) AS DOUBLE))
                       * {IPF_UNIT}.0''', 6)} AS design_effect
    FROM u
    """
    )


@register("ext_design_effect", _deff_oracle())
def ext_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish design effect of the raked weights: with each order
    carrying its cell's raked weight w_c/n_c, DEFF = n * sum(w_i^2) /
    (sum w_i)^2 and n_eff = n / DEFF — the price in effective sample
    size that ext_ipf_raking's calibration charges (DEFF = 1 means
    free; 1.5 means variance as if a third of the sample vanished).
    Cell-level identity: sum_i w_i^2 = sum_cells w_c^2 / n_c.

    Determinism: per-cell w^2/n snaps to integer units (ROUND of an
    identical integer-derived double); the Kish ratio converts 128-bit
    sums through the string path.

    Scale shape: the IPF grid pipeline (15 cells) plus one scalar
    reduce — corpus-sized work is the single cells aggregate. Cited
    parity anchor: /root/reference/models (beyond-reference
    surface)."""
    # rebuild the raked grid exactly as ext_ipf_raking does
    o = load(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    dims = cells.agg(
        F.countDistinct("pri").cast("bigint").alias("nr"),
        F.countDistinct("st").cast("bigint").alias("nc"),
        F.sum("n").cast("bigint").alias("tot"),
    )
    w = cells.select(
        "pri", "st", "n", (F.col("n") * IPF_UNIT).cast("bigint").alias("w")
    ).localCheckpoint(eager=False)
    for _ in range(IPF_ROUNDS):
        rs = w.groupBy("pri").agg(F.sum("w").cast("bigint").alias("rw"))
        w = w.join(rs, "pri").crossJoin(F.broadcast(dims)).select(
            "pri", "st", "n",
            F.round(
                F.col("w")
                * ((F.col("tot") * 1.0 * IPF_UNIT / F.col("nr")) / F.col("rw")),
                0,
            ).cast("bigint").alias("w"),
        )
        cs = w.groupBy("st").agg(F.sum("w").cast("bigint").alias("cw"))
        w = (
            w.join(cs, "st")
            .crossJoin(F.broadcast(dims))
            .select(
                "pri", "st", "n",
                F.round(
                    F.col("w")
                    * ((F.col("tot") * 1.0 * IPF_UNIT / F.col("nc")) / F.col("cw")),
                    0,
                ).cast("bigint").alias("w"),
            )
            .localCheckpoint(eager=False)
        )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    u = w.select(
        "n",
        "w",
        F.round(dec(F.col("w")) * F.col("w") * 1.0 / F.col("n"), 0)
        .cast("decimal(38,0)")
        .alias("w2n"),
    )
    agg = u.agg(
        F.sum("n").cast("bigint").alias("n_orders"),
        F.sum(dec(F.col("w"))).alias("sw"),
        F.sum("w2n").alias("sw2n"),
    )
    sw_d = F.col("sw").cast("double")
    return agg.select(
        "n_orders",
        F.round(
            (sw_d * sw_d) / F.col("sw2n").cast("double") / IPF_UNIT * 1.0, 6
        ).alias("n_effective"),
        F.round(
            F.col("n_orders")
            * F.col("sw2n").cast("double")
            / (sw_d * sw_d)
            * IPF_UNIT,
            6,
        ).alias("design_effect"),
    )


# ---------------------------------------------------------------------------
# ext_lof_outliers — Local Outlier Factor over the pruned kNN graph
# ---------------------------------------------------------------------------

LOF_TOPN = 25


@register(
    "ext_lof_outliers",
    f"""
    WITH {_SCORED_SQL}, topk AS MATERIALIZED (
        SELECT qid, nid, 1.0 - cosine AS dist,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, nid) AS rk
        FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, nid) <= {KNN_K}
    ), kdist AS (
        SELECT qid AS node, dist AS kd FROM topk WHERE rk = {KNN_K}
    ), reach AS (
        SELECT t.qid,
               CAST(ROUND(GREATEST(k.kd, t.dist) * 1000000.0) AS BIGINT)
                   AS r_units
        FROM topk t JOIN kdist k ON k.node = t.nid
    ), lrd AS MATERIALIZED (
        SELECT qid,
               CAST(ROUND({KNN_K} * 1000000.0 * 1000000000.0 / SUM(r_units))
                    AS BIGINT) AS lrd_units
        FROM reach GROUP BY qid
    ), lof AS (
        SELECT t.qid,
               CAST(SUM(ln.lrd_units) AS BIGINT) AS sum_nbr,
               ANY_VALUE(lp.lrd_units) AS own
        FROM topk t
        JOIN lrd ln ON ln.qid = t.nid
        JOIN lrd lp ON lp.qid = t.qid
        GROUP BY t.qid
    )
    SELECT l.qid AS vec_id, e.label,
           {dround(f'l.sum_nbr * 1.0 / ({KNN_K} * l.own)', 6)} AS lof
    FROM lof l JOIN e ON e.vec_id = l.qid
    ORDER BY {dround(f'l.sum_nbr * 1.0 / ({KNN_K} * l.own)', 6)} DESC, l.qid
    LIMIT {LOF_TOPN}
    """,
)
def ext_lof_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor (k = KNN_K) over the embedding corpus: a
    vector's LOF is the mean ratio of its neighbors' local
    reachability densities to its own — the density-RATIO upgrade of
    ext_embed_outlier_knn (which flags globally sparse points; LOF
    flags points sparse RELATIVE to their neighborhood, catching
    outliers next to dense clusters). Top {LOF_TOPN} reported.

    Determinism: distances derive from the 6dp-rounded cosine;
    reachability snaps to integer micro-units per edge and lrd to
    integer units per node BEFORE any sum (float addition order can
    never reorder the result); LOF divides exact integers; the report
    orders (lof@6dp DESC, vec_id).

    Scale shape: rides the two-stage exact top-k primitive once, then
    three node-keyed joins over the N*k edge table — no additional
    corpus-sized work. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    topk = (
        _topk_scored(spark, sf_dir, k=KNN_K)
        .select("qid", "nid", (1.0 - F.col("cosine")).alias("dist"), "rk")
        .localCheckpoint(eager=False)  # feeds kdist, reach, and the LOF join
    )
    kdist = topk.filter(F.col("rk") == KNN_K).select(
        F.col("qid").alias("nid"), F.col("dist").alias("kd")
    )
    reach = topk.join(kdist, "nid").select(
        "qid",
        F.round(F.greatest(F.col("kd"), F.col("dist")) * 1e6, 0)
        .cast("bigint")
        .alias("r_units"),
    )
    lrd = reach.groupBy("qid").agg(
        F.round(KNN_K * 1e6 * 1e9 / F.sum("r_units"), 0)
        .cast("bigint")
        .alias("lrd_units")
    ).localCheckpoint(eager=False)  # joined twice below
    ln_ = lrd.select(F.col("qid").alias("nid"), F.col("lrd_units").alias("nbr_u"))
    lp = lrd.select("qid", F.col("lrd_units").alias("own_u"))
    lof = (
        topk.join(ln_, "nid")
        .join(lp, "qid")
        .groupBy("qid")
        .agg(
            F.sum("nbr_u").cast("bigint").alias("sum_nbr"),
            F.first("own_u").alias("own"),
        )
    )
    own = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    score = F.round(F.col("sum_nbr") * 1.0 / (KNN_K * F.col("own")), 6)
    return (
        lof.join(own, lof.qid == own.vec_id)
        .select("vec_id", "label", score.alias("lof"))
        .orderBy(F.desc("lof"), "vec_id")
        .limit(LOF_TOPN)
    )


ext_lof_outliers.__doc__ = ext_lof_outliers.__doc__.replace(
    "{LOF_TOPN}", str(LOF_TOPN)
)


# ---------------------------------------------------------------------------
# ext_rank_biased_overlap — RBO between two yearly revenue rankings
# ---------------------------------------------------------------------------

RBO_P = 0.9  # top-weight parameter
RBO_DEPTH = 50
RBO_Y1 = 1996
RBO_Y2 = 1997


def _rbo_rank_sql(year: int) -> str:
    return f"""
        SELECT l_partkey AS pk,
               ROW_NUMBER() OVER (
                   ORDER BY SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                           * 100) AS BIGINT)) DESC, l_partkey)
                   AS rk
        FROM lineitem WHERE EXTRACT(year FROM l_shipdate) = {year}
        GROUP BY l_partkey
        QUALIFY ROW_NUMBER() OVER (
                   ORDER BY SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                           * 100) AS BIGINT)) DESC, l_partkey)
                <= {RBO_DEPTH}"""


@register(
    "ext_rank_biased_overlap",
    f"""
    WITH ra AS MATERIALIZED ({_rbo_rank_sql(RBO_Y1)}
    ), rb AS MATERIALIZED ({_rbo_rank_sql(RBO_Y2)}
    ), joint AS (
        SELECT GREATEST(ra.rk, rb.rk) AS m
        FROM ra JOIN rb ON ra.pk = rb.pk
    ), depths AS (
        SELECT unnest(generate_series(1, {RBO_DEPTH})) AS d
    ), ov AS (
        SELECT d.d,
               CAST((SELECT COUNT(*) FROM joint j WHERE j.m <= d.d) AS BIGINT)
                   AS overlap
        FROM depths d
    ), terms AS (
        SELECT d, overlap,
               CAST(ROUND((1.0 - {RBO_P}) * pow({RBO_P}, d - 1)
                          * (overlap * 1.0 / d) * 1000000000.0) AS BIGINT)
                   AS units
        FROM ov
    )
    SELECT {RBO_DEPTH} AS depth,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM joint) AS n_common,
           {dround('SUM(units) / 1000000000.0', 6)} AS rbo_score
    FROM terms
    """,
)
def ext_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (p = {RBO_P}) between consecutive years'
    top-{RBO_DEPTH} part revenue rankings: RBO = (1-p) sum p^(d-1) *
    overlap@d / d — the top-weighted ranking-similarity metric (unlike
    Spearman, it cares most about the head and handles non-conjoint
    lists), quantifying how stable the best-seller list actually is
    year over year.

    Determinism: both rankings are (revenue DESC, partkey) total
    orders; overlap@d counts exact integers; each depth's term snaps
    to integer 1e-9 units (pow's last-ulp spread is absorbed by the
    snap, ext_recency_weighted_ltv discipline) before the sum.

    Scale shape: each ranking is a TakeOrdered {RBO_DEPTH} over a
    year-filtered aggregate; everything after runs on <= {RBO_DEPTH}
    rows x the depth grid. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")

    def rank_year(year):
        g = (
            li.filter(F.year("l_shipdate") == year)
            .groupBy(F.col("l_partkey").alias("pk"))
            .agg(F.sum(cents).alias("rev"))
        )
        return (
            g.orderBy(F.desc("rev"), "pk")
            .limit(RBO_DEPTH)
            .withColumn(
                "rk", F.row_number().over(Window.orderBy(F.desc("rev"), "pk"))
            )
            .select("pk", "rk")
        )

    ra = rank_year(RBO_Y1)
    rb = rank_year(RBO_Y2).select(
        F.col("pk"), F.col("rk").alias("rk_b")
    )
    joint = (
        ra.join(rb, "pk")
        .select(F.greatest("rk", "rk_b").alias("m"))
        .localCheckpoint(eager=False)  # overlap curve + the common count
    )
    depths = spark.range(1, RBO_DEPTH + 1).select(
        F.col("id").cast("int").alias("d")
    )
    ov = (
        depths.join(joint, F.col("m") <= F.col("d"), "left")
        .groupBy("d")
        .agg(F.count("m").cast("bigint").alias("overlap"))
    )
    terms = ov.select(
        F.round(
            (1.0 - RBO_P)
            * F.pow(F.lit(RBO_P), F.col("d") - 1)
            * (F.col("overlap") * 1.0 / F.col("d"))
            * 1e9,
            0,
        )
        .cast("bigint")
        .alias("units")
    )
    n_common = joint.agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    return (
        terms.agg(F.sum("units").alias("su"))
        .crossJoin(F.broadcast(n_common))
        .select(
            F.lit(RBO_DEPTH).alias("depth"),
            "n_common",
            F.round(F.col("su") / 1e9, 6).alias("rbo_score"),
        )
    )


ext_rank_biased_overlap.__doc__ = ext_rank_biased_overlap.__doc__.replace(
    "{RBO_P}", str(RBO_P)
).replace("{RBO_DEPTH}", str(RBO_DEPTH))


# ---------------------------------------------------------------------------
# ext_bcg_matrix — growth-share quadrant classification per brand
# ---------------------------------------------------------------------------

BCG_Y1 = 1996
BCG_Y2 = 1997


@register(
    "ext_bcg_matrix",
    f"""
    WITH b AS MATERIALIZED (
        SELECT p.p_brand AS brand,
               CAST(SUM(CASE WHEN EXTRACT(year FROM l.l_shipdate) = {BCG_Y1}
                             THEN CAST(ROUND(l.l_extendedprice
                                             * (1 - l.l_discount) * 100)
                                  AS BIGINT) ELSE 0 END) AS BIGINT) AS rev1,
               CAST(SUM(CASE WHEN EXTRACT(year FROM l.l_shipdate) = {BCG_Y2}
                             THEN CAST(ROUND(l.l_extendedprice
                                             * (1 - l.l_discount) * 100)
                                  AS BIGINT) ELSE 0 END) AS BIGINT) AS rev2
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE EXTRACT(year FROM l.l_shipdate) IN ({BCG_Y1}, {BCG_Y2})
        GROUP BY p.p_brand
    ), t AS (
        SELECT CAST(SUM(rev1) AS BIGINT) AS t1,
               CAST(SUM(rev2) AS BIGINT) AS t2,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM b
    )
    SELECT b.brand, b.rev1 AS rev1_cents, b.rev2 AS rev2_cents,
           {dround('b.rev2 * 1.0 / t.t2', 6)} AS share_y2,
           {dround('(b.rev2 - b.rev1) * 1.0 / b.rev1', 6)} AS yoy_growth,
           CASE WHEN CAST(b.rev2 AS HUGEINT) * t.t1 > CAST(b.rev1 AS HUGEINT) * t.t2
                THEN (CASE WHEN b.rev2 * t.nb > t.t2
                           THEN 'star' ELSE 'question_mark' END)
                ELSE (CASE WHEN b.rev2 * t.nb > t.t2
                           THEN 'cash_cow' ELSE 'dog' END)
           END AS quadrant
    FROM b CROSS JOIN t
    ORDER BY b.brand
    """,
)
def ext_bcg_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-share (BCG) quadrant classification per brand: growth =
    does the brand's {BCG_Y1}->{BCG_Y2} revenue growth beat the market
    (rev2*T1 > rev1*T2), share = is its {BCG_Y2} share above the
    equal-share line (rev2*n_brands > T2) — stars / cash cows /
    question marks / dogs, the portfolio-strategy screen that turns
    ext_price_volume_mix's bridges into a decision grid.

    Determinism: every quadrant verdict is an exact integer
    cross-multiplication (widened to 128-bit where products could
    wrap); reported ratios divide identical integers.

    Scale shape: the two-year filter pushes to the scan behind a
    broadcast part join; ONE brand-keyed conditional aggregate
    (25 cells) and a scalar total. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    yr = F.year("l_shipdate")
    b = (
        li.filter(yr.isin(BCG_Y1, BCG_Y2))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            yr.alias("yr"),
            cents.alias("cents"),
        )
        .join(F.broadcast(pt), "p_partkey")
        .groupBy("brand")
        .agg(
            F.sum(F.when(F.col("yr") == BCG_Y1, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("rev1"),
            F.sum(F.when(F.col("yr") == BCG_Y2, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("rev2"),
        )
        .localCheckpoint(eager=False)  # feeds rows AND the scalar total
    )
    t = b.agg(
        F.sum("rev1").cast("bigint").alias("t1"),
        F.sum("rev2").cast("bigint").alias("t2"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    grower = dec(F.col("rev2")) * F.col("t1") > dec(F.col("rev1")) * F.col("t2")
    big = F.col("rev2") * F.col("nb") > F.col("t2")
    return (
        b.crossJoin(F.broadcast(t))
        .select(
            "brand",
            F.col("rev1").alias("rev1_cents"),
            F.col("rev2").alias("rev2_cents"),
            F.round(F.col("rev2") * 1.0 / F.col("t2"), 6).alias("share_y2"),
            F.round(
                (F.col("rev2") - F.col("rev1")) * 1.0 / F.col("rev1"), 6
            ).alias("yoy_growth"),
            F.when(grower & big, "star")
            .when(grower & ~big, "question_mark")
            .when(~grower & big, "cash_cow")
            .otherwise("dog")
            .alias("quadrant"),
        )
        .orderBy("brand")
    )


ext_bcg_matrix.__doc__ = ext_bcg_matrix.__doc__.replace(
    "{BCG_Y1}", str(BCG_Y1)
).replace("{BCG_Y2}", str(BCG_Y2))


# ---------------------------------------------------------------------------
# ext_price_indices — Laspeyres / Paasche / Fisher price indices
# ---------------------------------------------------------------------------

PIDX_Y1 = 1996
PIDX_Y2 = 1997


@register(
    "ext_price_indices",
    f"""
    WITH py AS MATERIALIZED (
        SELECT l_partkey AS pk, EXTRACT(year FROM l_shipdate) AS yr,
               CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS q,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev
        FROM lineitem
        WHERE EXTRACT(year FROM l_shipdate) IN ({PIDX_Y1}, {PIDX_Y2})
        GROUP BY 1, 2
    ), m AS MATERIALIZED (
        SELECT a.pk, a.q AS q1, a.rev AS r1, b.q AS q2, b.rev AS r2
        FROM py a JOIN py b ON a.pk = b.pk
        WHERE a.yr = {PIDX_Y1} AND b.yr = {PIDX_Y2}
          AND a.q > 0 AND b.q > 0
    ), terms AS (
        SELECT
            CAST(ROUND(r2 * 1000.0 * q1 / q2) AS BIGINT) AS p2q1,
            r1 * 1000 AS p1q1,
            r2 * 1000 AS p2q2,
            CAST(ROUND(r1 * 1000.0 * q2 / q1) AS BIGINT) AS p1q2
        FROM m
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM m) AS n_parts_matched,
           {dround('SUM(p2q1) * 1.0 / SUM(p1q1)', 6)} AS laspeyres,
           {dround('SUM(p2q2) * 1.0 / SUM(p1q2)', 6)} AS paasche,
           {dround('''sqrt((SUM(p2q1) * 1.0 / SUM(p1q1))
                           * (SUM(p2q2) * 1.0 / SUM(p1q2)))''', 6)} AS fisher
    FROM terms
    """,
)
def ext_price_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-number theory on the part catalog: Laspeyres (base-period
    basket), Paasche (current basket), and Fisher (their geometric
    mean) price indices between {PIDX_Y1} and {PIDX_Y2}, using each
    part's average unit price — the inflation-measurement op behind
    pricing dashboards, complementing ext_price_volume_mix (which
    decomposes revenue; this isolates pure price movement).

    Determinism: each part's cross-term p2*q1 = rev2*q1/q2 snaps to
    integer milli-cent units per part (exact double products below
    2^53); index ratios divide exact integer sums; Fisher's sqrt is
    IEEE-exact on identical doubles.

    Scale shape: one (part, year) aggregate with the year filter
    pushed to the scan, a partkey self-join of the two year slices,
    then scalar reduces. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    py = (
        li.filter(yr.isin(PIDX_Y1, PIDX_Y2))
        .groupBy(F.col("l_partkey").alias("pk"), yr.alias("yr"))
        .agg(
            F.sum(F.floor("l_quantity").cast("bigint")).cast("bigint").alias("q"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("rev"),
        )
    )
    a = py.filter((F.col("yr") == PIDX_Y1) & (F.col("q") > 0)).select(
        "pk", F.col("q").alias("q1"), F.col("rev").alias("r1")
    )
    b = py.filter((F.col("yr") == PIDX_Y2) & (F.col("q") > 0)).select(
        "pk", F.col("q").alias("q2"), F.col("rev").alias("r2")
    )
    m = a.join(b, "pk").localCheckpoint(eager=False)  # terms + count
    terms = m.select(
        F.round(F.col("r2") * 1000.0 * F.col("q1") / F.col("q2"), 0)
        .cast("bigint")
        .alias("p2q1"),
        (F.col("r1") * 1000).alias("p1q1"),
        (F.col("r2") * 1000).alias("p2q2"),
        F.round(F.col("r1") * 1000.0 * F.col("q2") / F.col("q1"), 0)
        .cast("bigint")
        .alias("p1q2"),
    )
    n = m.agg(F.count(F.lit(1)).cast("bigint").alias("n_parts_matched"))
    lasp = F.sum("p2q1") * 1.0 / F.sum("p1q1")
    paas = F.sum("p2q2") * 1.0 / F.sum("p1q2")
    return (
        terms.agg(
            F.round(lasp, 6).alias("laspeyres"),
            F.round(paas, 6).alias("paasche"),
            F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
        )
        .crossJoin(F.broadcast(n))
        .select("n_parts_matched", "laspeyres", "paasche", "fisher")
    )


ext_price_indices.__doc__ = ext_price_indices.__doc__.replace(
    "{PIDX_Y1}", str(PIDX_Y1)
).replace("{PIDX_Y2}", str(PIDX_Y2))


# ---------------------------------------------------------------------------
# ext_hurst_exponent — long-memory detection via rescaled-range analysis
# ---------------------------------------------------------------------------

HURST_WINDOWS = [8, 16, 32, 64, 128]


def _hurst_oracle() -> str:
    per_n = []
    for n in HURST_WINDOWS:
        per_n.append(
            f"""    SELECT {n} AS n_window, blk,
           CAST(MAX(c) - MIN(c) AS HUGEINT) AS r_scaled,
           CAST({n} AS HUGEINT) * CAST(SUM(y * y) AS HUGEINT)
               - CAST(SUM(y) AS HUGEINT) * CAST(SUM(y) AS HUGEINT) AS s2_num
    FROM (
        SELECT blk, y,
               {n} * SUM(y) OVER (PARTITION BY blk ORDER BY t)
                   - ROW_NUMBER() OVER (PARTITION BY blk ORDER BY t)
                     * SUM(y) OVER (PARTITION BY blk) AS c
        FROM (
            SELECT t, y, CAST((t - 1) // {n} AS BIGINT) AS blk
            FROM idx WHERE t <= (nn // {n}) * {n}
        )
    ) GROUP BY blk"""
        )
    blocks = "\n    UNION ALL\n".join(per_n)
    return f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(FLOOR(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                               AS BIGINT) / 100.0) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY d) AS t, y,
               COUNT(*) OVER () AS nn
        FROM daily
    ), blocks AS MATERIALIZED (
{blocks}
    ), lnrs AS MATERIALIZED (
        SELECT n_window,
               CAST(ROUND(ln(CAST(CAST(r_scaled AS VARCHAR) AS DOUBLE)
                             / sqrt(CAST(CAST(s2_num AS VARCHAR) AS DOUBLE)))
                          * 1000000000.0) AS BIGINT) AS units
        FROM blocks WHERE s2_num > 0 AND r_scaled > 0
    ), pts AS MATERIALIZED (
        SELECT n_window, CAST(COUNT(*) AS BIGINT) AS n_blocks,
               SUM(units) * 1.0 / COUNT(*) / 1000000000.0 AS mean_ln_rs,
               ln(n_window * 1.0) AS lx
        FROM lnrs GROUP BY n_window
    ), fit AS (
        SELECT (COUNT(*) * SUM(lx * mean_ln_rs) - SUM(lx) * SUM(mean_ln_rs))
               / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx)) AS h
        FROM pts
    )
    SELECT p.n_window, p.n_blocks,
           {dround('p.mean_ln_rs', 6)} AS mean_ln_rs,
           {dround('f.h', 6)} AS hurst_exponent
    FROM pts p CROSS JOIN fit f
    ORDER BY p.n_window
    """


@register("ext_hurst_exponent", _hurst_oracle())
def ext_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue via rescaled-range (R/S)
    analysis: the series splits into blocks of 8..128 days, each
    block's range-of-cumulative-deviations over its std gives R/S, and
    the slope of mean ln(R/S) against ln(n) is H — the long-memory
    detector (H ~ 0.5 random walk, H > 0.5 trending/persistent) that
    complements ext_ts_autocorrelation's short-lag view.

    Determinism: cumulative deviations are EXACT integers (c_k =
    n*cumsum - k*S, the fraction-free centering), so R is integer and
    S^2's numerator is 128-bit integer; ln(R/sqrt(s2)) applies to
    identical string-path doubles and snaps to 1e-9 units per block;
    the 5-point OLS slope runs on identical frozen means.

    Scale shape: corpus collapses to the day series; each window size
    is a block-partitioned window pass over ~2.4k rows; the fit is 5
    points. Degenerate blocks (zero variance/range) are excluded on
    both engines. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.floor(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            / 100.0
        )
        .cast("bigint")
        .alias("y")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("d")).alias("t"),
        "y",
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nn"),
    ).localCheckpoint(eager=False)  # reused per window size
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    blocks = None
    for n in HURST_WINDOWS:
        base = idx.filter(
            F.col("t") <= F.floor(F.col("nn") / n) * n
        ).select(
            "t", "y", F.floor((F.col("t") - 1) / n).cast("bigint").alias("blk")
        )
        wb = Window.partitionBy("blk").orderBy("t")
        wall = Window.partitionBy("blk")
        c = (
            n * F.sum("y").over(wb.rowsBetween(Window.unboundedPreceding, 0))
            - F.row_number().over(wb) * F.sum("y").over(wall)
        )
        blk = (
            base.select("blk", "y", c.alias("c"))
            .groupBy("blk")
            .agg(
                (F.max("c") - F.min("c")).cast("decimal(38,0)").alias("r_scaled"),
                (
                    F.lit(n) * F.sum(dec(F.col("y")) * F.col("y"))
                    - F.sum(dec(F.col("y"))) * F.sum(dec(F.col("y")))
                ).alias("s2_num"),
            )
            .select(F.lit(n).alias("n_window"), "r_scaled", "s2_num")
        )
        blocks = blk if blocks is None else blocks.unionByName(blk)
    lnrs = blocks.filter(
        (F.col("s2_num") > 0) & (F.col("r_scaled") > 0)
    ).select(
        "n_window",
        F.round(
            F.log(
                F.col("r_scaled").cast("double")
                / F.sqrt(F.col("s2_num").cast("double"))
            )
            * 1e9,
            0,
        )
        .cast("bigint")
        .alias("units"),
    )
    pts = lnrs.groupBy("n_window").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        (F.sum("units") * 1.0 / F.count(F.lit(1)) / 1e9).alias("mean_ln_rs"),
    ).withColumn("lx", F.log(F.col("n_window") * 1.0)).localCheckpoint(
        eager=False
    )
    fit = pts.agg(
        (
            (
                F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("mean_ln_rs"))
                - F.sum("lx") * F.sum("mean_ln_rs")
            )
            / (
                F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("lx"))
                - F.sum("lx") * F.sum("lx")
            )
        ).alias("h")
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            "n_window",
            "n_blocks",
            F.round("mean_ln_rs", 6).alias("mean_ln_rs"),
            F.round("h", 6).alias("hurst_exponent"),
        )
        .orderBy("n_window")
    )


# ---------------------------------------------------------------------------
# ext_adstock_transform — geometric adstock with frozen integer weights
# ---------------------------------------------------------------------------

ADSTOCK_LAMBDA = 0.7
ADSTOCK_K = 14
# round(lambda^k * 1e9) precomputed so BOTH engines use the same integer
# weights — no pow() ever runs at query time.
ADSTOCK_W = [
    1000000000, 700000000, 490000000, 343000000, 240100000, 168070000,
    117649000, 82354300, 57648010, 40353607, 28247525, 19773267,
    13841287, 9688901,
]


@register(
    "ext_adstock_transform",
    f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'click' GROUP BY 1
    ), spine AS MATERIALIZED (
        SELECT r.d, COALESCE(daily.x, 0) AS x
        FROM (SELECT unnest(generate_series((SELECT MIN(d) FROM daily),
                                            (SELECT MAX(d) FROM daily),
                                            INTERVAL 1 DAY))::DATE AS d) r
        LEFT JOIN daily ON daily.d = r.d
    ), ad AS (
        SELECT d, x,
               {" + ".join(f"COALESCE(LAG(x, {k}) OVER (ORDER BY d), 0) * {w}" for k, w in enumerate(ADSTOCK_W))}
                   AS a_units
        FROM spine
    )
    SELECT date_trunc('week', d)::DATE AS week,
           CAST(SUM(x) AS BIGINT) AS raw_clicks,
           {dround('SUM(a_units) / 1000000000.0', 6)} AS adstocked_clicks,
           {dround('SUM(a_units) / 1000000000.0 / NULLIF(SUM(x), 0)', 6)}
               AS carryover_ratio
    FROM ad GROUP BY 1 ORDER BY week
    """,
)
def ext_adstock_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric adstock (advertising carryover) of daily click volume:
    a_t = sum_k lambda^k x_(t-k) truncated at {ADSTOCK_K} lags
    (lambda = {ADSTOCK_LAMBDA}) over a gap-filled day spine, rolled up
    monthly — the marketing-mix-model transform that distributes
    impact over time, the continuous sibling of ext_attr_shapley's
    discrete credit assignment.

    Determinism: the decay weights are PRE-ROUNDED integer literals
    (round(lambda^k * 1e9) baked into both engines), so the transform
    is pure integer lag algebra — pow() never executes at query time
    and no float can diverge. The day spine is explicit (missing days
    carry zero but still decay history), identical on both engines.

    Scale shape: corpus collapses to the day series; the spine join is
    calendar-sized; the {ADSTOCK_K}-lag window is one ordered pass
    over ~2.4k rows; weekly rollup ends it. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.filter(F.col("event_type") == "click").groupBy(
        F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    rng = daily.agg(
        F.min("d").alias("lo"), F.max("d").alias("hi")
    )
    spine = (
        rng.select(
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
        )
        .join(daily, "d", "left")
        .select("d", F.coalesce("x", F.lit(0)).alias("x"))
    )
    w = Window.orderBy("d")
    a_units = None
    for k, wt in enumerate(ADSTOCK_W):
        t = F.coalesce(F.lag("x", k).over(w), F.lit(0)) * wt
        a_units = t if a_units is None else a_units + t
    ad = spine.select("d", "x", a_units.alias("a_units"))
    return (
        ad.groupBy(F.date_trunc("week", "d").cast("date").alias("week"))
        .agg(
            F.sum("x").cast("bigint").alias("raw_clicks"),
            F.round(F.sum("a_units") / 1e9, 6).alias("adstocked_clicks"),
            F.round(
                F.sum("a_units") / 1e9 / F.nullif(F.sum("x"), F.lit(0)), 6
            ).alias("carryover_ratio"),
        )
        .orderBy("week")
    )


ext_adstock_transform.__doc__ = ext_adstock_transform.__doc__.replace(
    "{ADSTOCK_K}", str(ADSTOCK_K)
).replace("{ADSTOCK_LAMBDA}", str(ADSTOCK_LAMBDA))


# ---------------------------------------------------------------------------
# ext_sprt_sequential — sequential probability ratio test, pure integers
# ---------------------------------------------------------------------------

# H0: purchase share p0 = 0.19; H1: p1 = 0.21; alpha = beta = 0.05.
# Per-trial log-LR contributions and the decision boundary, pre-rounded to
# integer 1e-9 units so both engines run pure integer accumulation.
SPRT_L_SUCCESS = 100083459  # round(ln(p1/p0) * 1e9)
SPRT_L_FAILURE = -25001302  # round(ln((1-p1)/(1-p0)) * 1e9)
SPRT_BOUND = 2944438979  # round(ln((1-beta)/alpha) * 1e9) = ln(19)


@register(
    "ext_sprt_sequential",
    f"""
    WITH arm1 AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_trials,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_success
        FROM events
        WHERE ({{h}}) % 2 = 1
        GROUP BY 1
    ), cum AS (
        SELECT day, n_trials, n_success,
               SUM(n_success * {SPRT_L_SUCCESS}
                   + (n_trials - n_success) * {SPRT_L_FAILURE})
                   OVER (ORDER BY day) AS cum_units
        FROM arm1
    )
    SELECT day, n_trials, n_success,
           {dround('cum_units / 1000000000.0', 6)} AS cum_llr,
           CASE WHEN cum_units >= {SPRT_BOUND} THEN 'accept_h1'
                WHEN cum_units <= -{SPRT_BOUND} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum ORDER BY day
    """,
)
def ext_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test replayed over the
    treatment arm's event stream day by day (H0: purchase share 0.19
    vs H1: 0.21, alpha = beta = 5%): the cumulative log-likelihood
    ratio and the day-by-day decision — the sequential-testing op that
    says WHEN an experiment could have stopped, completing the
    experimentation suite (ext_ab_ztest fixed-horizon readout,
    ext_ab_srm_check guardrail, ext_metric_cuped variance,
    ext_ab_power_analysis design).

    Determinism: per-trial log-LR contributions and the ln(19)
    boundary are PRE-ROUNDED integer literals, so the replay is pure
    integer accumulation — no ln() at query time (the
    ext_adstock_transform discipline); decisions compare exact
    integers.

    Scale shape: one hash-filtered day aggregate (map-side combined),
    a ~30-row ordered cumsum, constant output. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    from .llm_ops import _spark_md5_32

    ev = load(spark, sf_dir, "events")
    arm = (
        _spark_md5_32(F.concat(F.lit("sprt:"), F.col("user_id").cast("string")))
        % 2
    )
    arm1 = (
        ev.filter(arm == 1)
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trials"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("n_success"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = arm1.select(
        "day",
        "n_trials",
        "n_success",
        F.sum(
            F.col("n_success") * SPRT_L_SUCCESS
            + (F.col("n_trials") - F.col("n_success")) * SPRT_L_FAILURE
        )
        .over(w)
        .alias("cum_units"),
    )
    return cum.select(
        "day",
        "n_trials",
        "n_success",
        F.round(F.col("cum_units") / 1e9, 6).alias("cum_llr"),
        F.when(F.col("cum_units") >= SPRT_BOUND, "accept_h1")
        .when(F.col("cum_units") <= -SPRT_BOUND, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


from .llm_ops import _md5_32 as _md5sql  # noqa: E402

_ORACLE["ext_sprt_sequential"] = _ORACLE["ext_sprt_sequential"].replace(
    "{h}", _md5sql("'sprt:' || CAST(user_id AS VARCHAR)")
)


# ---------------------------------------------------------------------------
# ext_pacf — partial autocorrelation via unrolled Durbin-Levinson
# ---------------------------------------------------------------------------

PACF_MAX_LAG = 6


def _pacf_dl_steps():
    """Generate the Durbin-Levinson recursion symbolically: returns a
    list of (name, expr_fn) where expr_fn maps a dict of prior symbol
    SQL snippets to this symbol's SQL. phi[k][j] names are fkj."""
    steps = []
    steps.append(("f11", lambda s: "r1"))
    for k in range(2, PACF_MAX_LAG + 1):
        num = f"r{k} - (" + " + ".join(
            f"f{k-1}{j} * r{k-j}" for j in range(1, k)
        ) + ")"
        den = "1.0 - (" + " + ".join(
            f"f{k-1}{j} * r{j}" for j in range(1, k)
        ) + ")"
        steps.append((f"f{k}{k}", lambda s, n=num, d=den: f"({n}) / ({d})"))
        for j in range(1, k):
            steps.append(
                (
                    f"f{k}{j}",
                    lambda s, k=k, j=j: f"f{k-1}{j} - f{k}{k} * f{k-1}{k-j}",
                )
            )
    return steps


def _pacf_oracle() -> str:
    acov = ",\n               ".join(
        f"""CAST(SUM(CASE WHEN t <= nn - {k}
                 THEN dev * dev_l{k} ELSE 0 END) AS HUGEINT) AS a{k}"""
        for k in range(1, PACF_MAX_LAG + 1)
    )
    lags = ",\n               ".join(
        f"LEAD(dev, {k}) OVER (ORDER BY t) AS dev_l{k}"
        for k in range(1, PACF_MAX_LAG + 1)
    )
    rhos = ", ".join(
        f"""CAST(CAST(a{k} AS VARCHAR) AS DOUBLE)
            / CAST(CAST(a0 AS VARCHAR) AS DOUBLE) AS r{k}"""
        for k in range(1, PACF_MAX_LAG + 1)
    )
    # chain the DL steps as successive CTE levels
    chain = []
    prev = "rho"
    acc = []
    for name, fn in _pacf_dl_steps():
        acc_cols = ", ".join(acc) + (", " if acc else "")
        chain.append(
            f"s_{name} AS (SELECT *, {fn(None)} AS {name} FROM {prev})"
        )
        acc.append(name)
        prev = f"s_{name}"
    pacf_rows = "\n    UNION ALL\n".join(
        f"    SELECT {k} AS lag, {dround(f'r{k}', 6)} AS acf, "
        f"{dround(f'f{k}{k}', 6)} AS pacf FROM {prev}"
        for k in range(1, PACF_MAX_LAG + 1)
    )
    return f"""
    WITH m AS (
        SELECT date_trunc('month', o_orderdate)::DATE AS month,
               CAST(FLOOR(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                               AS BIGINT) / 100.0) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), idx AS MATERIALIZED (
        SELECT ROW_NUMBER() OVER (ORDER BY month) AS t, y,
               COUNT(*) OVER () AS nn,
               CAST(COUNT(*) OVER () AS HUGEINT) * y
                   - CAST(SUM(y) OVER () AS HUGEINT) AS dev
        FROM m
    ), lagged AS MATERIALIZED (
        SELECT t, nn, dev,
               {lags}
        FROM idx
    ), acv AS (
        SELECT CAST(SUM(dev * dev) AS HUGEINT) AS a0,
               {acov}
        FROM lagged
    ), rho AS (
        SELECT {rhos}
        FROM acv
    ), {", ".join(chain)}
    {pacf_rows}
    ORDER BY lag
    """


@register("ext_pacf", _pacf_oracle())
def ext_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation function of monthly revenue (lags 1..
    {PACF_MAX_LAG}) via the Durbin-Levinson recursion — the Box-
    Jenkins order-selection diagnostic (AR(p) shows p significant
    PACF spikes) completing ext_ts_autocorrelation's ACF with the
    conditional version.

    Determinism: autocovariances are fraction-free 128-bit integers
    (dev = n*y - S, the ext_ts_durbin_watson discipline), so every
    rho is a ratio of identical integers via the string path; the DL
    recursion is pure scalar double algebra on those identical rhos —
    unrolled IDENTICALLY on both engines (generated from one symbolic
    recursion), so every phi matches bit-for-bit before the terminal
    dround(6).

    Scale shape: corpus collapses to ~80 month rows; lag products are
    one window pass; the recursion is scalar algebra on a single row.
    Cited parity anchor: /root/reference/models (beyond-reference
    surface)."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.floor(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            / 100.0
        )
        .cast("bigint")
        .alias("y")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w_all = Window.partitionBy()
    idx = m.select(
        F.row_number().over(Window.orderBy("month")).alias("t"),
        "y",
        F.count(F.lit(1)).over(w_all).alias("nn"),
        (
            dec(F.count(F.lit(1)).over(w_all)) * F.col("y")
            - dec(F.sum("y").over(w_all))
        ).alias("dev"),
    )
    w_t = Window.orderBy("t")
    lag_cols = [
        F.lead("dev", k).over(w_t).alias(f"dev_l{k}")
        for k in range(1, PACF_MAX_LAG + 1)
    ]
    lagged = idx.select("t", "nn", "dev", *lag_cols)
    acv = lagged.agg(
        F.sum(F.col("dev") * F.col("dev")).alias("a0"),
        *[
            F.sum(
                F.when(
                    F.col("t") <= F.col("nn") - k,
                    F.col("dev") * F.col(f"dev_l{k}"),
                ).otherwise(F.lit(0).cast("decimal(38,0)"))
            ).alias(f"a{k}")
            for k in range(1, PACF_MAX_LAG + 1)
        ],
    )
    row = acv.select(
        *[
            (F.col(f"a{k}").cast("double") / F.col("a0").cast("double")).alias(
                f"r{k}"
            )
            for k in range(1, PACF_MAX_LAG + 1)
        ]
    )
    # unroll DL identically to the oracle, via Spark expr on the same SQL
    for name, fn in _pacf_dl_steps():
        row = row.withColumn(name, F.expr(fn(None)))
    # r10: emit the per-lag rows by exploding an array of structs over the
    # single recursion row — the prior per-lag unionByName planned the whole
    # orders-scan + month-window subtree once PER LAG (6 scans of orders)
    report = F.array(
        *[
            F.struct(
                F.lit(k).alias("lag"),
                F.col(f"r{k}").alias("acf"),
                F.col(f"f{k}{k}").alias("pacf"),
            )
            for k in range(1, PACF_MAX_LAG + 1)
        ]
    )
    return (
        row.select(F.explode(report).alias("x"))
        .select(
            F.col("x.lag").alias("lag"),
            F.round("x.acf", 6).alias("acf"),
            F.round("x.pacf", 6).alias("pacf"),
        )
        .orderBy("lag")
    )


ext_pacf.__doc__ = ext_pacf.__doc__.replace("{PACF_MAX_LAG}", str(PACF_MAX_LAG))


# ---------------------------------------------------------------------------
# ext_brand_customer_overlap — brand-pair customer-base Jaccard
# ---------------------------------------------------------------------------

BRAND_OV_TOPN = 25


@register(
    "ext_brand_customer_overlap",
    f"""
    WITH cb AS MATERIALIZED (
        SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
    ), sz AS (
        SELECT brand, CAST(COUNT(*) AS BIGINT) AS n FROM cb GROUP BY brand
    ), inter AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM cb a JOIN cb b ON a.cust = b.cust AND a.brand < b.brand
        GROUP BY a.brand, b.brand
    )
    SELECT i.brand_a, i.brand_b, i.n_common,
           sa.n AS n_a, sb.n AS n_b,
           {dround('i.n_common * 1.0 / (sa.n + sb.n - i.n_common)', 6)}
               AS jaccard
    FROM inter i
    JOIN sz sa ON sa.brand = i.brand_a
    JOIN sz sb ON sb.brand = i.brand_b
    ORDER BY {dround('i.n_common * 1.0 / (sa.n + sb.n - i.n_common)', 6)}
             DESC, i.brand_a, i.brand_b
    LIMIT {BRAND_OV_TOPN}
    """,
)
def ext_brand_customer_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-pair customer-base overlap: Jaccard of the two brands'
    distinct buyer sets, top {BRAND_OV_TOPN} pairs — the
    assortment/partnership screen (high overlap = substitutes or
    bundle candidates; low = distinct audiences), the brand-level
    sibling of ext_basket_pairs (same order) and
    ext_seq_basket_pairs (across time).

    Determinism: distinct-set counting; the Jaccard divides identical
    integers and the report orders (jaccard@6dp DESC, pair) — a total
    order.

    Scale shape: one (cust, brand) distinct collapse (the only
    corpus-sized shuffle), then a cust-keyed pair join whose fan-out
    is bounded by brands-per-customer squared (<= C(25,2) per
    customer), a pair-keyed count, and TakeOrdered. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pt = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    cb = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select(F.col("o_custkey").alias("cust"), "brand")
        # Explicit slot-count cust partitioning: it satisfies the
        # distinct's (cust, brand) clustering (no extra exchange), the
        # checkpoint inherits it, and the pair join below reuses it —
        # byte-based AQE coalescing otherwise serialized the
        # brands-per-customer² fan-out (§2.5, the seq_basket_pairs fix).
        .repartition(spark.sparkContext.defaultParallelism, "cust")
        .distinct()
        .localCheckpoint(eager=False)  # sizes + both pair sides
    )
    sz = cb.groupBy("brand").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    a = cb.select("cust", F.col("brand").alias("brand_a"))
    b = cb.select("cust", F.col("brand").alias("brand_b"))
    inter = (
        a.join(b, "cust")
        .filter(F.col("brand_a") < F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = sz.select(F.col("brand").alias("brand_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("brand").alias("brand_b"), F.col("n").alias("n_b"))
    jac = F.round(
        F.col("n_common")
        * 1.0
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        6,
    )
    return (
        inter.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .select("brand_a", "brand_b", "n_common", "n_a", "n_b", jac.alias("jaccard"))
        .orderBy(F.desc("jaccard"), "brand_a", "brand_b")
        .limit(BRAND_OV_TOPN)
    )


ext_brand_customer_overlap.__doc__ = ext_brand_customer_overlap.__doc__.replace(
    "{BRAND_OV_TOPN}", str(BRAND_OV_TOPN)
)


# ---------------------------------------------------------------------------
# ext_cohens_kappa — chance-corrected agreement, exact integer algebra
# ---------------------------------------------------------------------------

from .extensions import LANGID_CASE_SQL as _LANGID_SQL  # noqa: E402


@register(
    "ext_cohens_kappa",
    f"""
    WITH pairs AS MATERIALIZED (
        SELECT lang AS a, {_LANGID_SQL} AS b FROM documents
    ), cm AS MATERIALIZED (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY a, b
    ), marg AS (
        SELECT COALESCE(ra.lab, cb.lab) AS lab,
               COALESCE(ra.rn, 0) AS rn, COALESCE(cb.cn, 0) AS cn
        FROM (SELECT a AS lab, CAST(SUM(n) AS BIGINT) AS rn
              FROM cm GROUP BY a) ra
        FULL OUTER JOIN (SELECT b AS lab, CAST(SUM(n) AS BIGINT) AS cn
                         FROM cm GROUP BY b) cb ON ra.lab = cb.lab
    ), agg AS (
        SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM cm) AS nn,
               (SELECT CAST(SUM(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT)
                FROM cm) AS diag,
               CAST(SUM(CAST(rn AS HUGEINT) * cn) AS HUGEINT) AS chance
        FROM marg
    )
    SELECT nn AS n_docs, diag AS n_agree,
           {dround('diag * 1.0 / nn', 6)} AS observed_agreement,
           {dround('''CAST(CAST(chance AS VARCHAR) AS DOUBLE)
                      / (nn * 1.0 * nn)''', 6)} AS chance_agreement,
           {dround('''CAST(CAST(CAST(nn AS HUGEINT) * diag - chance
                               AS VARCHAR) AS DOUBLE)
                      / CAST(CAST(CAST(nn AS HUGEINT) * nn - chance
                                  AS VARCHAR) AS DOUBLE)''', 6)} AS kappa
    FROM agg
    """,
)
def ext_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the declared document language and the
    character-class lang-id heuristic (ext_text_langid's predictor):
    chance-corrected agreement kappa = (N*D - sum r_l*c_l) /
    (N^2 - sum r_l*c_l) — the inter-rater metric that exposes when a
    classifier's raw accuracy is just marginal-distribution luck
    (complementing ext_eval_confusion's raw matrix).

    Determinism: the whole statistic is exact integer algebra — D and
    the marginal products widen to 128-bit, and kappa divides two
    string-path doubles of identical integers.

    Scale shape: ONE (declared, predicted) aggregate (bounded by
    #langs^2) and grid-sized marginal algebra after. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    from ..ext import text as tx

    docs = load(spark, sf_dir, "documents")
    cm = docs.select(
        F.col("lang").alias("a"), tx.lang_id(F.col("text")).alias("b")
    ).groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cm = cm.localCheckpoint(eager=False)  # marginals + diagonal + total
    ra = cm.groupBy(F.col("a").alias("lab")).agg(
        F.sum("n").cast("bigint").alias("rn")
    )
    cb = cm.groupBy(F.col("b").alias("lab")).agg(
        F.sum("n").cast("bigint").alias("cn")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    marg = ra.join(cb, "lab", "full_outer").select(
        F.coalesce("rn", F.lit(0)).alias("rn"),
        F.coalesce("cn", F.lit(0)).alias("cn"),
    )
    chance = marg.agg(
        F.sum(dec(F.col("rn")) * F.col("cn")).alias("chance")
    )
    tot = cm.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("diag"),
    )
    return (
        tot.crossJoin(F.broadcast(chance))
        .select(
            F.col("nn").alias("n_docs"),
            F.col("diag").alias("n_agree"),
            F.round(F.col("diag") * 1.0 / F.col("nn"), 6).alias(
                "observed_agreement"
            ),
            F.round(
                F.col("chance").cast("double") / (F.col("nn") * 1.0 * F.col("nn")),
                6,
            ).alias("chance_agreement"),
            F.round(
                (dec(F.col("nn")) * F.col("diag") - F.col("chance")).cast(
                    "double"
                )
                / (dec(F.col("nn")) * F.col("nn") - F.col("chance")).cast(
                    "double"
                ),
                6,
            ).alias("kappa"),
        )
    )


# ---------------------------------------------------------------------------
# ext_mcnemar_test — paired classifier comparison on shared documents
# ---------------------------------------------------------------------------


def _mcnemar_oracle() -> str:
    nb = _ORACLE["ext_nb_langid"]
    cut = nb.rindex("SELECT d.lang AS lang_declared")
    return (
        nb[:cut].rstrip().rstrip(",")
        + f""", judged AS (
        SELECT d.doc_id,
               CASE WHEN ({_LANGID_SQL}) = d.lang THEN 1 ELSE 0 END AS h_ok,
               CASE WHEN p.lang_pred = d.lang THEN 1 ELSE 0 END AS nb_ok
        FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    ), cells AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN h_ok = 1 AND nb_ok = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b,
               CAST(SUM(CASE WHEN h_ok = 0 AND nb_ok = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c
        FROM judged
    )
    SELECT n_docs, b AS heuristic_only_correct, c AS nb_only_correct,
           {dround('''CASE WHEN b + c > 0
                      THEN (b - c) * 1.0 * (b - c) / (b + c)
                      ELSE 0.0 END''', 6)} AS mcnemar_chi2,
           CAST(CASE WHEN (b - c) * (b - c) * 10000 > 38415 * (b + c)
                     THEN 1 ELSE 0 END AS INTEGER) AS significant
    FROM cells
    """
    )


@register("ext_mcnemar_test", _mcnemar_oracle())
def ext_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between the two language classifiers the
    registry ships — the character-class heuristic (ext_text_langid)
    and the naive-Bayes model (ext_nb_langid) — on the SAME documents:
    only the discordant cells matter (b = heuristic right & NB wrong,
    c = the reverse), chi2 = (b-c)^2/(b+c) with the 5% verdict by
    exact integer cross-multiplication. THE correct way to compare two
    classifiers on one test set (unpaired accuracy comparison wastes
    the pairing).

    Determinism: both predictors are deterministic; cells are exact
    integers; the verdict is the ext_mann_kendall threshold
    discipline. The NB pipeline is shared code/SQL with ext_nb_langid
    (one implementation, oracles cannot drift).

    Scale shape: the NB scoring pass (one token-stream reduce) plus a
    narrow heuristic map and ONE scalar conditional count. Cited
    parity anchor: /root/reference/models (beyond-reference
    surface)."""
    from ..ext import text as tx

    pred = _nb_predict(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    judged = (
        docs.select(
            "doc_id",
            "lang",
            (tx.lang_id(F.col("text")) == F.col("lang")).cast("int").alias("h_ok"),
        )
        .join(pred, "doc_id")
        .select(
            "h_ok",
            (F.col("lang_pred") == F.col("lang")).cast("int").alias("nb_ok"),
        )
    )
    cells = judged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when((F.col("h_ok") == 1) & (F.col("nb_ok") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when((F.col("h_ok") == 0) & (F.col("nb_ok") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    d = F.col("b") - F.col("c")
    t = F.col("b") + F.col("c")
    return cells.select(
        "n_docs",
        F.col("b").alias("heuristic_only_correct"),
        F.col("c").alias("nb_only_correct"),
        F.round(
            F.when(t > 0, d * 1.0 * d / t).otherwise(F.lit(0.0)), 6
        ).alias("mcnemar_chi2"),
        F.when(d * d * 10000 > 38415 * t, 1)
        .otherwise(0)
        .cast("int")
        .alias("significant"),
    )


# ---------------------------------------------------------------------------
# ext_capture_recapture — Chapman population estimate of the catalog
# ---------------------------------------------------------------------------

CR_Y1 = 1996
CR_Y2 = 1997


@register(
    "ext_capture_recapture",
    f"""
    WITH s1 AS (
        SELECT DISTINCT l_partkey FROM lineitem
        WHERE EXTRACT(year FROM l_shipdate) = {CR_Y1}
    ), s2 AS (
        SELECT DISTINCT l_partkey FROM lineitem
        WHERE EXTRACT(year FROM l_shipdate) = {CR_Y2}
    ), c AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM s1 JOIN s2 USING (l_partkey)) AS m,
               (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)
                FROM lineitem) AS observed_total
    )
    SELECT n1 AS n_year1, n2 AS n_year2, m AS n_both, observed_total,
           {dround('''(n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0''', 6)}
               AS chapman_estimate,
           {dround('''((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0)
                      / observed_total''', 6)} AS coverage_ratio
    FROM c
    """,
)
def ext_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-recapture (Chapman) estimate of the active part
    population: treating {CR_Y1} and {CR_Y2} purchases as two
    independent sightings, N^ = (n1+1)(n2+1)/(m+1) - 1 estimates how
    many parts are ACTUALLY in circulation — the ecology estimator
    data teams reuse to answer 'how much of the catalog has my crawl /
    dedup / join actually seen?' (coverage_ratio vs the observed
    distinct count).

    Determinism: three distinct counts and one intersection; the
    estimate combines exact integers through an identical expression
    tree.

    Scale shape (r10 single-scan rewrite): ONE lineitem pass folds to a
    per-partkey sighting bitmap (map-side-combined max of two year
    flags — the partkey shuffle carries 2 small ints, guide §2.3), then
    one scalar aggregate reads n1/n2/m/observed off the bitmap — the
    prior shape re-scanned lineitem per sighting set (two distincts,
    their counts, the intersection join and the global distinct: 5
    scans, 3 shuffles). Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    sightings = (
        li.select("l_partkey", yr.alias("y"))
        .groupBy("l_partkey")
        .agg(
            F.max(F.when(F.col("y") == CR_Y1, 1).otherwise(0)).alias("in1"),
            F.max(F.when(F.col("y") == CR_Y2, 1).otherwise(0)).alias("in2"),
        )
    )
    one = sightings.agg(
        F.sum("in1").cast("bigint").alias("n1"),
        F.sum("in2").cast("bigint").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("observed_total"),
    )
    est = (F.col("n1") + 1.0) * (F.col("n2") + 1.0) / (F.col("m") + 1.0) - 1.0
    return one.select(
        F.col("n1").alias("n_year1"),
        F.col("n2").alias("n_year2"),
        F.col("m").alias("n_both"),
        "observed_total",
        F.round(est, 6).alias("chapman_estimate"),
        F.round(est / F.col("observed_total"), 6).alias("coverage_ratio"),
    )


ext_capture_recapture.__doc__ = ext_capture_recapture.__doc__.replace(
    "{CR_Y1}", str(CR_Y1)
).replace("{CR_Y2}", str(CR_Y2))


# ---------------------------------------------------------------------------
# ext_evt_gumbel — extreme-value (Gumbel) fit on monthly revenue maxima
# ---------------------------------------------------------------------------

EVT_GAMMA = 0.5772156649015329  # Euler-Mascheroni
EVT_SQRT6_PI = 0.779696801233676  # sqrt(6)/pi
EVT_Y12 = 2.441716398881459  # -ln(-ln(1 - 1/12)): 12-block return level


@register(
    "ext_evt_gumbel",
    f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(FLOOR(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                               AS BIGINT) / 100.0) AS BIGINT) AS y
        FROM orders GROUP BY 1
    ), bm AS MATERIALIZED (
        SELECT date_trunc('month', d)::DATE AS month,
               CAST(MAX(y) AS BIGINT) AS mx
        FROM daily GROUP BY 1
    ), mom AS (
        SELECT CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(mx) AS HUGEINT) AS s,
               CAST(SUM(CAST(mx AS HUGEINT) * mx) AS HUGEINT) AS q
        FROM bm
    ), fit AS (
        SELECT CAST(n AS BIGINT) AS n_blocks,
               CAST(s AS BIGINT) * 1.0 / CAST(n AS BIGINT) AS mean_max,
               sqrt(CAST(CAST(n * q - s * s AS VARCHAR) AS DOUBLE)
                    / CAST(CAST(n * (n - 1) AS VARCHAR) AS DOUBLE)) AS sd
        FROM mom
    )
    SELECT n_blocks,
           {dround('mean_max', 6)} AS mean_block_max,
           {dround('sd * {EVT_SQRT6_PI}', 6)} AS gumbel_beta,
           {dround('mean_max - {EVT_GAMMA} * (sd * {EVT_SQRT6_PI})', 6)}
               AS gumbel_mu,
           {dround('''mean_max - {EVT_GAMMA} * (sd * {EVT_SQRT6_PI})
                      + (sd * {EVT_SQRT6_PI}) * {EVT_Y12}''', 6)}
               AS return_level_12
    FROM fit
    """.replace("{EVT_SQRT6_PI}", repr(EVT_SQRT6_PI))
    .replace("{EVT_GAMMA}", repr(EVT_GAMMA))
    .replace("{EVT_Y12}", repr(EVT_Y12)),
)
def ext_evt_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis of daily revenue: monthly block maxima
    fit a Gumbel distribution by method of moments (beta = sd*sqrt6/pi,
    mu = mean - gamma*beta), and the 12-block return level says what
    peak a typical YEAR should produce — the capacity-planning /
    risk-sizing op (dimension for the expected annual peak, not the
    mean), extending ext_dow_quantile_bands' envelopes into the tail.

    Determinism: block maxima are exact integers; moments widen to
    128-bit with string-path conversion; gamma, sqrt(6)/pi, and the
    return-level factor are shared IEEE literals, so every derived
    double is identical.

    Scale shape: day collapse -> ~80 block maxima -> one scalar moment
    reduce. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.floor(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            / 100.0
        )
        .cast("bigint")
        .alias("y")
    )
    bm = daily.groupBy(
        F.date_trunc("month", "d").cast("date").alias("month")
    ).agg(F.max("y").cast("bigint").alias("mx"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = bm.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dec(F.col("mx"))).alias("s"),
        F.sum(dec(F.col("mx")) * dec(F.col("mx"))).alias("q"),
    )
    mean_max = F.col("s").cast("bigint") * 1.0 / F.col("n").cast("bigint")
    sd = F.sqrt(
        (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n") * (F.col("n") - 1)).cast("double")
    )
    beta = sd * EVT_SQRT6_PI
    mu = mean_max - EVT_GAMMA * beta
    return mom.select(
        F.col("n").cast("bigint").alias("n_blocks"),
        F.round(mean_max, 6).alias("mean_block_max"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(mu + beta * EVT_Y12, 6).alias("return_level_12"),
    )


# ---------------------------------------------------------------------------
# ext_jl_projection — Johnson-Lindenstrauss distortion audit
# ---------------------------------------------------------------------------

JL_OUT_DIMS = 16
JL_PROBE = 50  # vectors in the pairwise-distance probe


def _jl_sign_sql(j: int, d: int) -> str:
    from .llm_ops import _md5_32

    h = _md5_32(f"'jl{j}:' || CAST({d} AS VARCHAR)")
    return f"CASE WHEN ({h}) % 2 = 0 THEN 1 ELSE -1 END"


def _jl_oracle() -> str:
    # projected coordinate j = sum_d sign(j,d) * q_d  (exact integers)
    proj_cols = ", ".join(
        f"""CAST(SUM((CASE WHEN ({{md5}}) % 2 = 0 THEN 1 ELSE -1 END) * q)
             AS BIGINT) AS p{j}""".replace(
            "{md5}",
            "(instr('0123456789abcdef', substr(md5('jl"
            + str(j)
            + ":' || CAST(dim AS VARCHAR)), 1, 1)) - 1) * 268435456 + "
            "(instr('0123456789abcdef', substr(md5('jl"
            + str(j)
            + ":' || CAST(dim AS VARCHAR)), 2, 1)) - 1) * 16777216 + "
            "(instr('0123456789abcdef', substr(md5('jl"
            + str(j)
            + ":' || CAST(dim AS VARCHAR)), 3, 1)) - 1) * 1048576 + "
            "(instr('0123456789abcdef', substr(md5('jl"
            + str(j)
            + ":' || CAST(dim AS VARCHAR)), 4, 1)) - 1) * 65536 + "
            "(instr('0123456789abcdef', substr(md5('jl"
            + str(j)
            + ":' || CAST(dim AS VARCHAR)), 5, 1)) - 1) * 4096 + "
            "(instr('0123456789abcdef', substr(md5('jl"
            + str(j)
            + ":' || CAST(dim AS VARCHAR)), 6, 1)) - 1) * 256 + "
            "(instr('0123456789abcdef', substr(md5('jl"
            + str(j)
            + ":' || CAST(dim AS VARCHAR)), 7, 1)) - 1) * 16 + "
            "(instr('0123456789abcdef', substr(md5('jl"
            + str(j)
            + ":' || CAST(dim AS VARCHAR)), 8, 1)) - 1)",
        )
        for j in range(JL_OUT_DIMS)
    )
    d2p = " + ".join(
        f"(a.p{j} - b.p{j}) * 1.0 * (a.p{j} - b.p{j})" for j in range(JL_OUT_DIMS)
    )
    return f"""
    WITH {_KM_PTS_SQL},
    probe AS MATERIALIZED (
        SELECT * FROM pts WHERE vec_id < {JL_PROBE}
    ), proj AS MATERIALIZED (
        SELECT vec_id, {proj_cols}
        FROM probe GROUP BY vec_id
    ), od AS MATERIALIZED (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               CAST(SUM((a.q - b.q) * (a.q - b.q)) AS BIGINT) AS d2
        FROM probe a JOIN probe b
          ON a.dim = b.dim AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id
    ), ratio AS (
        SELECT CAST(ROUND(({d2p}) / ({JL_OUT_DIMS}.0 / 64.0)
                          / od.d2 * 1000000000.0) AS BIGINT) AS r_units
        FROM od
        JOIN proj a ON a.vec_id = od.va
        JOIN proj b ON b.vec_id = od.vb
        WHERE od.d2 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           {dround('SUM(r_units) * 1.0 / COUNT(*) / 1000000000.0', 6)}
               AS mean_distortion,
           {dround('MAX(r_units) / 1000000000.0', 6)} AS max_distortion,
           {dround('MIN(r_units) / 1000000000.0', 6)} AS min_distortion
    FROM ratio
    """


@register("ext_jl_projection", _jl_oracle())
def ext_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection audit: the 64-dim
    quantized embeddings project to {JL_OUT_DIMS} dims through a +/-1
    md5-sign matrix, and a {JL_PROBE}-vector probe reports the
    scaled pairwise squared-distance distortion (E[ratio] = 1 under
    JL) — the dimensionality-reduction primitive the ANN/LSH family
    implicitly relies on, here with its distortion made measurable
    (ext_embed_pca_power is the data-aware sibling; JL is the
    oblivious one).

    Determinism: projections are exact integer sums of +/-1-signed
    quantized components; original and projected squared distances are
    exact integers; each pair's distortion ratio snaps to 1e-9 units
    (ratio of identical integer-derived doubles).

    Scale shape: the projection is one (vec, out-dim) reduce over the
    tidy points — at corpus scale it is a narrow map-side matmul
    against a broadcast sign matrix; the distance probe is
    deliberately bounded ({JL_PROBE} vectors, C(n,2) pairs). Cited
    parity anchor: /root/reference/models (beyond-reference
    surface)."""
    from .llm_ops import _spark_md5_32

    emb = load(spark, sf_dir, "embeddings")
    pts = emb.filter(F.col("vec_id") < JL_PROBE).select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim", "x")
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("x").cast("double") * KM_SCALE).cast("long").alias("q"),
    ).localCheckpoint(eager=False)  # feeds projection AND original dists
    proj_aggs = []
    for j in range(JL_OUT_DIMS):
        sign = F.when(
            _spark_md5_32(
                F.concat(F.lit(f"jl{j}:"), F.col("dim").cast("string"))
            )
            % 2
            == 0,
            1,
        ).otherwise(-1)
        proj_aggs.append(F.sum(sign * F.col("q")).cast("bigint").alias(f"p{j}"))
    proj = pts.groupBy("vec_id").agg(*proj_aggs)
    a = pts.select(F.col("vec_id").alias("va"), "dim", F.col("q").alias("qa"))
    b = pts.select(F.col("vec_id").alias("vb"), "dim", F.col("q").alias("qb"))
    od = (
        a.join(b, "dim")
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(
            F.sum((F.col("qa") - F.col("qb")) * (F.col("qa") - F.col("qb")))
            .cast("bigint")
            .alias("d2")
        )
        .filter(F.col("d2") > 0)
    )
    pa = proj.select(
        F.col("vec_id").alias("va"), *[F.col(f"p{j}").alias(f"a{j}") for j in range(JL_OUT_DIMS)]
    )
    pb = proj.select(
        F.col("vec_id").alias("vb"), *[F.col(f"p{j}").alias(f"b{j}") for j in range(JL_OUT_DIMS)]
    )
    d2p = None
    for j in range(JL_OUT_DIMS):
        t = (F.col(f"a{j}") - F.col(f"b{j}")) * 1.0 * (
            F.col(f"a{j}") - F.col(f"b{j}")
        )
        d2p = t if d2p is None else d2p + t
    ratio = (
        od.join(F.broadcast(pa), "va")
        .join(F.broadcast(pb), "vb")
        .select(
            F.round(
                d2p / (JL_OUT_DIMS / 64.0) / F.col("d2") * 1e9, 0
            )
            .cast("bigint")
            .alias("r_units")
        )
    )
    return ratio.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.sum("r_units") * 1.0 / F.count(F.lit(1)) / 1e9, 6).alias(
            "mean_distortion"
        ),
        F.round(F.max("r_units") / 1e9, 6).alias("max_distortion"),
        F.round(F.min("r_units") / 1e9, 6).alias("min_distortion"),
    )


ext_jl_projection.__doc__ = ext_jl_projection.__doc__.replace(
    "{JL_OUT_DIMS}", str(JL_OUT_DIMS)
).replace("{JL_PROBE}", str(JL_PROBE))


# ---------------------------------------------------------------------------
# ext_retrieval_ndcg — NDCG@k with frozen logarithmic discounts
# ---------------------------------------------------------------------------

# round(1e9 / log2(1 + r)) for ranks 1..10 — shared integer literals, so
# the discount curve never touches libm at query time.
NDCG_DISC = [
    1000000000, 630929754, 500000000, 430676558, 386852807,
    356207187, 333333333, 315464877, 301029996, 289064826,
]


def _ndcg_oracle() -> str:
    disc_case = "CASE rk " + " ".join(
        f"WHEN {r + 1} THEN {w}" for r, w in enumerate(NDCG_DISC)
    ) + " END"
    ideal = ", ".join(str(w) for w in NDCG_DISC)
    return f"""
    WITH {_SCORED_SQL}, topk AS MATERIALIZED (
        SELECT qid, nlabel, rk FROM (
            SELECT qid, nlabel,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, nid) AS rk
            FROM scored
        ) WHERE rk <= {MRR_K}
    ), gains AS (
        SELECT e.vec_id, e.label,
               CAST(COALESCE(SUM(CASE WHEN t.nlabel = e.label
                                      THEN {disc_case} END), 0) AS BIGINT)
                   AS dcg_units,
               CAST(LEAST((SELECT COUNT(*) - 1 FROM e e2
                           WHERE e2.label = e.label), {MRR_K}) AS BIGINT)
                   AS n_rel
        FROM e LEFT JOIN topk t ON t.qid = e.vec_id
        GROUP BY e.vec_id, e.label
    ), ideal AS (
        SELECT k, CAST(SUM(w) OVER (ORDER BY k) AS BIGINT) AS iunits
        FROM (SELECT ROW_NUMBER() OVER () AS k, w
              FROM (SELECT unnest([{ideal}]) AS w))
    ), nd AS (
        SELECT g.label,
               CAST(ROUND(g.dcg_units * 1000000000.0 / i.iunits) AS BIGINT)
                   AS ndcg_units
        FROM gains g JOIN ideal i ON i.k = g.n_rel
        WHERE g.n_rel > 0
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           {dround('SUM(ndcg_units) * 1.0 / COUNT(*) / 1000000000.0', 6)}
               AS mean_ndcg
    FROM nd GROUP BY label ORDER BY label
    """


@register("ext_retrieval_ndcg", _ndcg_oracle())
def ext_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{MRR_K} with label-match relevance: each query's discounted
    cumulative gain over its top-{MRR_K} neighbors, normalized by the
    ideal DCG for its achievable relevant count — the industry-standard
    graded ranking metric completing the retrieval-eval family
    (ext_retrieval_mrr ranks the FIRST hit; NDCG scores the whole
    list).

    Determinism: the 1/log2(1+r) discount curve is PRE-ROUNDED integer
    literals (no log at query time, ext_sprt_sequential discipline);
    DCG and ideal-DCG are exact integer sums; each query's NDCG snaps
    to 1e-9 units before the label mean.

    Scale shape: the pruned top-k primitive once, then label-keyed
    reduces; the ideal table is {MRR_K} rows. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    topk = _topk_scored(spark, sf_dir, k=MRR_K)
    own = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("qid"), "label"
    )
    label_sizes = own.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_label")
    )
    disc = F.create_map(
        *[x for r, w in enumerate(NDCG_DISC) for x in (F.lit(r + 1), F.lit(w))]
    )
    gains = (
        own.join(
            topk.select("qid", "nlabel", "rk"), "qid", "left"
        )
        .groupBy("qid", "label")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("nlabel") == F.col("label"),
                        disc[F.col("rk")],
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("dcg_units")
        )
        .join(F.broadcast(label_sizes), "label")
        .withColumn(
            "n_rel",
            F.least(F.col("n_label") - 1, F.lit(MRR_K)).cast("bigint"),
        )
    )
    ideal_rows = [(k + 1, sum(NDCG_DISC[: k + 1])) for k in range(MRR_K)]
    ideal = spark.createDataFrame(ideal_rows, ["n_rel", "iunits"])
    nd = (
        gains.filter(F.col("n_rel") > 0)
        .join(F.broadcast(ideal), "n_rel")
        .select(
            "label",
            F.round(F.col("dcg_units") * 1e9 / F.col("iunits"), 0)
            .cast("bigint")
            .alias("ndcg_units"),
        )
    )
    return (
        nd.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.round(
                F.sum("ndcg_units") * 1.0 / F.count(F.lit(1)) / 1e9, 6
            ).alias("mean_ndcg"),
        )
        .orderBy("label")
    )


ext_retrieval_ndcg.__doc__ = ext_retrieval_ndcg.__doc__.replace(
    "{MRR_K}", str(MRR_K)
)


# ---------------------------------------------------------------------------
# ext_theil_decomposition — decomposable inequality (within/between nations)
# ---------------------------------------------------------------------------


@register(
    "ext_theil_decomposition",
    f"""
    WITH cust AS MATERIALIZED (
        SELECT o.o_custkey, n.n_name AS nation,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS s
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY o.o_custkey, n.n_name
    ), nat AS MATERIALIZED (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(s) AS BIGINT) AS sg
        FROM cust GROUP BY nation
    ), tot AS (
        SELECT CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS st
        FROM nat
    ), within_u AS (
        SELECT c.nation,
               CAST(ROUND((c.s * 1.0 * a.ng / a.sg)
                          * ln(c.s * 1.0 * a.ng / a.sg)
                          * 1000000000.0) AS BIGINT) AS u
        FROM cust c JOIN nat a ON a.nation = c.nation
    ), within AS (
        SELECT nation, CAST(SUM(u) AS BIGINT) AS su FROM within_u
        GROUP BY nation
    ), rows_ AS MATERIALIZED (
        SELECT a.nation, a.ng, a.sg,
               a.sg * 1.0 / t.st AS share,
               w.su * 1.0 / a.ng / 1000000000.0 AS t_within,
               CAST(ROUND((a.sg * 1.0 / t.st)
                          * ln((a.sg * 1.0 / t.st) / (a.ng * 1.0 / t.n))
                          * 1000000000.0) AS BIGINT) AS between_u,
               CAST(ROUND((a.sg * 1.0 / t.st)
                          * (w.su * 1.0 / a.ng / 1000000000.0)
                          * 1000000000.0) AS BIGINT) AS contrib_u
        FROM nat a JOIN within w ON w.nation = a.nation CROSS JOIN tot t
    )
    SELECT nation, ng AS n_customers,
           {dround('share', 6)} AS spend_share,
           {dround('t_within', 6)} AS theil_within,
           {dround('SUM(between_u) OVER () / 1000000000.0', 6)}
               AS theil_between,
           {dround('''(SUM(between_u) OVER () + SUM(contrib_u) OVER ())
                      / 1000000000.0''', 6)} AS theil_total
    FROM rows_ ORDER BY nation
    """,
)
def ext_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality decomposition of customer spend by nation:
    total inequality = between-nation + spend-share-weighted
    within-nation terms — the decomposability that Gini lacks
    (ext_spend_gini ranks overall concentration; this key says WHERE
    the inequality lives: across geographies or inside them).

    Determinism: every entropy term (s_i*n_g/S_g)*ln(...) is computed
    from ratios of exact integers and snapped to 1e-9 units per
    customer / per nation BEFORE any sum (ext_drift_psi discipline);
    totals are window sums of exact integers over the 25-nation grid.

    Scale shape: one custkey aggregate behind broadcast dims (the only
    corpus shuffle), a nation rollup, a per-customer term map joined
    to 25 nation rows, and grid-sized algebra. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("o_custkey", F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("s")
        )
        .localCheckpoint(eager=False)  # nation rollup + per-customer terms
    )
    nat = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("s").cast("bigint").alias("sg"),
    ).localCheckpoint(eager=False)
    tot = nat.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum("sg").cast("bigint").alias("st"),
    )
    r = F.col("s") * 1.0 * F.col("ng") / F.col("sg")
    within = (
        cust.join(F.broadcast(nat), "nation")
        .select(
            "nation",
            F.round(r * F.log(r) * 1e9, 0).cast("bigint").alias("u"),
        )
        .groupBy("nation")
        .agg(F.sum("u").cast("bigint").alias("su"))
    )
    share = F.col("sg") * 1.0 / F.col("st")
    t_within = F.col("su") * 1.0 / F.col("ng") / 1e9
    rows_ = (
        nat.join(within, "nation")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            "ng",
            share.alias("share"),
            t_within.alias("t_within"),
            F.round(
                share * F.log(share / (F.col("ng") * 1.0 / F.col("n"))) * 1e9,
                0,
            )
            .cast("bigint")
            .alias("between_u"),
            F.round(share * t_within * 1e9, 0).cast("bigint").alias("contrib_u"),
        )
    )
    w_all = Window.partitionBy()
    return rows_.select(
        "nation",
        F.col("ng").alias("n_customers"),
        F.round("share", 6).alias("spend_share"),
        F.round("t_within", 6).alias("theil_within"),
        F.round(F.sum("between_u").over(w_all) / 1e9, 6).alias("theil_between"),
        F.round(
            (F.sum("between_u").over(w_all) + F.sum("contrib_u").over(w_all))
            / 1e9,
            6,
        ).alias("theil_total"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# ext_grid_density_clusters — deterministic grid-based density clustering
# ---------------------------------------------------------------------------

GRID_G = 30  # cells per unit along each axis
GRID_MINPTS = 5  # density threshold per cell
GRID_OFF = 100  # id offset keeping cell ids positive
GRID_TOPN = 15


@register(
    "ext_grid_density_clusters",
    f"""
    WITH RECURSIVE pts AS (
        SELECT CAST(FLOOR(embedding[1] * {GRID_G}) AS BIGINT) AS q0,
               CAST(FLOOR(embedding[2] * {GRID_G}) AS BIGINT) AS q1
        FROM embeddings
    ), cells AS (
        SELECT q0, q1, (q0 + {GRID_OFF}) * 1000 + (q1 + {GRID_OFF}) AS cid,
               CAST(COUNT(*) AS BIGINT) AS n_points
        FROM pts GROUP BY q0, q1
        HAVING COUNT(*) >= {GRID_MINPTS}
    ), edges AS (
        SELECT a.cid AS u, b.cid AS v
        FROM cells a JOIN cells b
          ON abs(a.q0 - b.q0) <= 1 AND abs(a.q1 - b.q1) <= 1
         AND a.cid <> b.cid
    ), reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
    ), comp AS (
        SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
    ), labeled AS (
        SELECT c.cid, COALESCE(p.component, c.cid) AS cluster_id, c.n_points
        FROM cells c LEFT JOIN comp p ON p.node = c.cid
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n_points) AS BIGINT) AS n_points
    FROM labeled GROUP BY cluster_id
    ORDER BY n_points DESC, cluster_id
    LIMIT {GRID_TOPN}
    """,
)
def ext_grid_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based density clustering (the deterministic DBSCAN
    relative): embeddings bucket into a {GRID_G}x{GRID_G}-per-unit
    grid on their first two dimensions, cells with >= {GRID_MINPTS}
    points are dense, 8-adjacent dense cells merge via connected
    components, and the {GRID_TOPN} largest clusters report — the
    density-clustering family's entry (ext_kmeans_lloyd partitions
    everything; density clustering finds arbitrary-shape blobs and
    leaves sparse noise out).

    Determinism: FLOOR bucketing of identical doubles, exact counting,
    and min-label components (no tie exists under min).

    Scale shape: ONE corpus aggregate to the bounded cell grid
    (map-side combined); the cell graph is resolution-bounded, so
    components resolve with a driver-side union-find on the collected
    edge list (recursive-CTE closure in the oracle) and broadcast
    back; the rollup runs on <= a few hundred cells. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    emb = load(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.floor(F.col("embedding")[0].cast("double") * GRID_G)
        .cast("bigint")
        .alias("q0"),
        F.floor(F.col("embedding")[1].cast("double") * GRID_G)
        .cast("bigint")
        .alias("q1"),
    )
    cells = (
        pts.groupBy("q0", "q1")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
        .filter(F.col("n_points") >= GRID_MINPTS)
        .withColumn(
            "cid", (F.col("q0") + GRID_OFF) * 1000 + (F.col("q1") + GRID_OFF)
        )
        .localCheckpoint(eager=False)  # adjacency sides + final labeling
    )
    a = cells.select(
        F.col("cid").alias("doc_a"), F.col("q0").alias("a0"), F.col("q1").alias("a1")
    )
    b = cells.select(
        F.col("cid").alias("doc_b"), F.col("q0").alias("b0"), F.col("q1").alias("b1")
    )
    edges = a.join(
        b,
        (F.abs(F.col("a0") - F.col("b0")) <= 1)
        & (F.abs(F.col("a1") - F.col("b1")) <= 1)
        & (F.col("doc_a") < F.col("doc_b")),
    ).select("doc_a", "doc_b")
    # The cell graph is bounded by grid RESOLUTION ((2*GRID_G)^2 cells max),
    # not corpus size, so components resolve driver-side: collect the tiny
    # edge list, min-label union-find in Python, broadcast the mapping back
    # (the ext_ann_ivf small-state discipline; iterative DataFrame CC here
    # costs ~20 Spark rounds of fixed overhead for a few dozen rows).
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for ra, rb in edges.collect():
        xa, xb = find(ra), find(rb)
        if xa != xb:
            lo, hi = (xa, xb) if xa < xb else (xb, xa)
            parent[hi] = lo
    mapping = [(k, find(k)) for k in list(parent)]
    if mapping:
        comp = spark.createDataFrame(mapping, ["node", "component"])
        labeled = cells.join(
            F.broadcast(comp), cells.cid == comp.node, "left"
        ).select(
            F.coalesce("component", F.col("cid")).alias("cluster_id"),
            "n_points",
        )
    else:
        labeled = cells.select(
            F.col("cid").alias("cluster_id"), "n_points"
        )
    return (
        labeled.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            F.sum("n_points").cast("bigint").alias("n_points"),
        )
        .orderBy(F.desc("n_points"), "cluster_id")
        .limit(GRID_TOPN)
    )


ext_grid_density_clusters.__doc__ = ext_grid_density_clusters.__doc__.replace(
    "{GRID_G}", str(GRID_G)
).replace("{GRID_MINPTS}", str(GRID_MINPTS)).replace(
    "{GRID_TOPN}", str(GRID_TOPN)
)


# ---------------------------------------------------------------------------
# ext_kendall_tau — tau-b rank correlation on the collapsed value grid
# ---------------------------------------------------------------------------


@register(
    "ext_kendall_tau",
    f"""
    WITH cells AS MATERIALIZED (
        SELECT CAST(FLOOR(l_quantity) AS BIGINT) AS x,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS y,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM lineitem GROUP BY 1, 2
    ), n AS (SELECT CAST(SUM(c) AS HUGEINT) AS n FROM cells),
    cd AS (
        SELECT CAST(SUM(CASE WHEN b.x > a.x AND b.y > a.y
                             THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END)
                    AS HUGEINT) AS conc,
               CAST(SUM(CASE WHEN b.x > a.x AND b.y < a.y
                             THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END)
                    AS HUGEINT) AS disc
        FROM cells a CROSS JOIN cells b
    ), ties AS (
        SELECT (SELECT CAST(SUM(CAST(tc AS HUGEINT) * (tc - 1) / 2)
                            AS HUGEINT)
                FROM (SELECT SUM(c) AS tc FROM cells GROUP BY x)) AS t1,
               (SELECT CAST(SUM(CAST(tc AS HUGEINT) * (tc - 1) / 2)
                            AS HUGEINT)
                FROM (SELECT SUM(c) AS tc FROM cells GROUP BY y)) AS t2
    )
    SELECT CAST(n.n AS BIGINT) AS n_lines,
           CAST(cd.conc AS BIGINT) AS concordant,
           CAST(cd.disc AS BIGINT) AS discordant,
           {dround('''CAST(CAST(cd.conc - cd.disc AS VARCHAR) AS DOUBLE)
                      / sqrt(CAST(CAST((n.n * (n.n - 1) / 2 - t.t1)
                                       * (n.n * (n.n - 1) / 2 - t.t2)
                                  AS VARCHAR) AS DOUBLE))''', 6)} AS tau_b
    FROM cd CROSS JOIN n CROSS JOIN ties t
    """,
)
def ext_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between line quantity and discount, computed
    ENTIRELY on the collapsed (quantity, discount) value grid:
    concordant/discordant pair counts come from cell-count products
    (each of the 550^2 cell pairs, never the n^2 line pairs), with the
    standard tie corrections — the third rank-correlation after
    ext_spearman_corr and ext_eval_auc's Mann-Whitney, preferred when
    ties dominate (both axes here are heavily tied).

    Determinism: all counts are exact 128-bit integers; tau divides a
    string-path double by an IEEE-exact sqrt of another.

    Scale shape: ONE map-side aggregate onto the value-bounded grid,
    then a grid^2 cross join (~300k cell pairs — constant in corpus
    size) and scalar algebra. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.floor("l_quantity").cast("bigint").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c")).localCheckpoint(
        eager=False
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    n = cells.agg(F.sum("c").cast("decimal(38,0)").alias("n"))
    a = cells.select(
        F.col("x").alias("xa"), F.col("y").alias("ya"), F.col("c").alias("ca")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    cd = a.crossJoin(b).agg(
        F.sum(
            F.when(
                (F.col("xb") > F.col("xa")) & (F.col("yb") > F.col("ya")),
                dec(F.col("ca")) * F.col("cb"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("conc"),
        F.sum(
            F.when(
                (F.col("xb") > F.col("xa")) & (F.col("yb") < F.col("ya")),
                dec(F.col("ca")) * F.col("cb"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("disc"),
    )
    t1 = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("tc"))
        .agg(F.sum(dec(F.col("tc")) * (F.col("tc") - 1) / 2).alias("t1"))
    )
    t2 = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("tc"))
        .agg(F.sum(dec(F.col("tc")) * (F.col("tc") - 1) / 2).alias("t2"))
    )
    n0 = F.col("n") * (F.col("n") - 1) / 2
    return (
        cd.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(t2))
        .select(
            F.col("n").cast("bigint").alias("n_lines"),
            F.col("conc").cast("bigint").alias("concordant"),
            F.col("disc").cast("bigint").alias("discordant"),
            F.round(
                (F.col("conc") - F.col("disc")).cast("double")
                / F.sqrt(
                    ((n0 - F.col("t1")) * (n0 - F.col("t2"))).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )


# ---------------------------------------------------------------------------
# ext_wilcoxon_signed_rank — paired yearly revenue shift test per part
# ---------------------------------------------------------------------------

WSR_Y1 = 1996
WSR_Y2 = 1997


@register(
    "ext_wilcoxon_signed_rank",
    f"""
    WITH py AS MATERIALIZED (
        SELECT l_partkey AS pk, EXTRACT(year FROM l_shipdate) AS yr,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem
        WHERE EXTRACT(year FROM l_shipdate) IN ({WSR_Y1}, {WSR_Y2})
        GROUP BY 1, 2
    ), d AS (
        SELECT CAST(FLOOR(ABS(b.rev - a.rev) / 100.0) AS BIGINT) AS ad,
               CASE WHEN b.rev > a.rev THEN 1 ELSE 0 END AS pos
        FROM py a JOIN py b ON a.pk = b.pk
        WHERE a.yr = {WSR_Y1} AND b.yr = {WSR_Y2} AND a.rev <> b.rev
    ), grid AS (
        SELECT ad, CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(pos) AS BIGINT) AS np
        FROM d GROUP BY ad
    ), ranked AS (
        SELECT ad, cnt, np, SUM(cnt) OVER (ORDER BY ad) AS cum
        FROM grid
    ), agg AS (
        SELECT CAST(SUM(cnt) AS HUGEINT) AS n,
               CAST(SUM(np * (2 * cum - cnt + 1)) AS HUGEINT) AS wp_x2
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(wp_x2 AS BIGINT) AS w_plus_x2,
           {dround('''CAST(CAST(2 * wp_x2 - n * (n + 1) AS VARCHAR) AS DOUBLE)
                      / sqrt(CAST(CAST(n * (n + 1) * (2 * n + 1) 
                                  AS VARCHAR) AS DOUBLE)
                             * (2.0 / 3.0))''', 6)} AS z_stat,
           CAST(CASE WHEN (2 * wp_x2 - n * (n + 1))
                          * (2 * wp_x2 - n * (n + 1)) * 30000
                          > 76832 * (n * (n + 1) * (2 * n + 1))
                     THEN 1 ELSE 0 END AS INTEGER) AS significant
    FROM agg
    """,
)
def ext_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test: did per-part revenue SHIFT between
    {WSR_Y1} and {WSR_Y2}? Nonzero paired differences rank by absolute
    dollar magnitude (midranks on the collapsed |d| grid), W+ sums the
    positive ranks, and the normal approximation z = (W+ - n(n+1)/4) /
    sqrt(n(n+1)(2n+1)/24) tests symmetry — the PAIRED nonparametric
    test completing the family (ext_two_sample_ks unpaired
    distributions, ext_eval_auc unpaired ranks, McNemar paired
    binary; this is paired ordinal).

    Determinism: |d| quantizes to whole dollars; midranks use the
    2x-integer identity; W+ and the z's numerator/denominator are
    exact 128-bit integers (z^2 = 3*num^2/(2*den), so the 5% verdict
    is the cross-multiplication 30000*num^2 > 76832*den; the reported
    z uses string-path doubles and IEEE sqrt).

    Scale shape: one (part, year) aggregate with pushed filters, a
    partkey pair join, the value-bounded |d| grid cumsum, scalar
    output. Cited parity anchor: /root/reference/models
    (beyond-reference surface)."""
    li = load(spark, sf_dir, "lineitem")
    yr = F.year("l_shipdate")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    py = (
        li.filter(yr.isin(WSR_Y1, WSR_Y2))
        .groupBy(F.col("l_partkey").alias("pk"), yr.alias("yr"))
        .agg(F.sum(cents).cast("bigint").alias("rev"))
    )
    a = py.filter(F.col("yr") == WSR_Y1).select("pk", F.col("rev").alias("r1"))
    b = py.filter(F.col("yr") == WSR_Y2).select("pk", F.col("rev").alias("r2"))
    d = (
        a.join(b, "pk")
        .filter(F.col("r1") != F.col("r2"))
        .select(
            F.floor(F.abs(F.col("r2") - F.col("r1")) / 100.0)
            .cast("bigint")
            .alias("ad"),
            F.when(F.col("r2") > F.col("r1"), 1).otherwise(0).alias("pos"),
        )
    )
    grid = d.groupBy("ad").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, 0)
    ranked = grid.select(
        "cnt", "np", F.sum("cnt").over(w).alias("cum")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.sum("cnt").cast("decimal(38,0)").alias("n"),
        F.sum(
            dec(F.col("np")) * (2 * F.col("cum") - F.col("cnt") + 1)
        ).alias("wp_x2"),
    )
    num = 2 * F.col("wp_x2") - F.col("n") * (F.col("n") + 1)
    den = F.col("n") * (F.col("n") + 1) * (2 * F.col("n") + 1)
    return agg.select(
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("wp_x2").cast("bigint").alias("w_plus_x2"),
        F.round(
            num.cast("double") / F.sqrt(den.cast("double") * (2.0 / 3.0)), 6
        ).alias("z_stat"),
        F.when(num * num * 30000 > 76832 * den, 1)
        .otherwise(0)
        .cast("int")
        .alias("significant"),
    )


ext_wilcoxon_signed_rank.__doc__ = ext_wilcoxon_signed_rank.__doc__.replace(
    "{WSR_Y1}", str(WSR_Y1)
).replace("{WSR_Y2}", str(WSR_Y2))


# ---------------------------------------------------------------------------
# ext_permutation_test — deterministic sign-flip permutation test
# ---------------------------------------------------------------------------

PERM_K = 64  # pseudo-permutations (bits of two md5 draws)


def _perm_oracle() -> str:
    from .llm_ops import _md5_32

    h0 = _md5_32("'perm0:' || CAST(o_custkey AS VARCHAR)")
    h1 = _md5_32("'perm1:' || CAST(o_custkey AS VARCHAR)")
    lanes = ", ".join(
        f"""CAST(SUM(CASE WHEN (({h0 if k < 32 else h1}) >> {k % 32}) & 1 = 0
                 THEN d ELSE -d END) AS HUGEINT) AS z{k}"""
        for k in range(PERM_K)
    )
    extreme = " + ".join(
        f"CASE WHEN ABS(z{k}) >= ABS(obs) THEN 1 ELSE 0 END"
        for k in range(PERM_K)
    )
    return f"""
    WITH panel AS MATERIALIZED (
        SELECT o_custkey,
               CAST(SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
                             THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                             ELSE 0 END)
                    - SUM(CASE WHEN EXTRACT(year FROM o_orderdate) = 1996
                               THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS d
        FROM orders GROUP BY o_custkey
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(d) AS HUGEINT) AS obs,
               {lanes}
        FROM panel
    )
    SELECT n AS n_customers,
           CAST(obs AS BIGINT) AS observed_sum_cents,
           CAST({extreme} AS BIGINT) AS n_extreme,
           {dround(f'({extreme}) * 1.0 / {PERM_K}', 6)} AS p_value_est
    FROM s
    """


@register("ext_permutation_test", _perm_oracle())
def ext_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-flip permutation test of the 1996->1997 per-customer spend
    change: under H0 (no systematic change) each customer's difference
    is symmetric, so {PERM_K} deterministic md5-bit sign patterns
    build the permutation distribution of the summed difference and
    the p-value is the share of permuted |sums| at least as extreme —
    the assumption-free resampling test completing the family
    (ext_bootstrap_ci resamples for INTERVALS; this permutes for
    TESTS), with the registry's reproducible-randomness contract.

    Determinism: every permuted sum is an exact 128-bit integer of
    md5-bit signs (bits sliced from two hashes per customer — the
    ext_sketch_ams_f2 discipline); the extremity count is integer
    comparison.

    Scale shape: ONE custkey panel aggregate, then ALL {PERM_K}
    permuted sums in a single map-side scalar aggregate — no shuffle
    beyond the panel build. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    from .llm_ops import _spark_md5_32

    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    yr = F.year("o_orderdate")
    panel = o.groupBy("o_custkey").agg(
        (
            F.sum(F.when(yr == 1997, cents).otherwise(0))
            - F.sum(F.when(yr == 1996, cents).otherwise(0))
        )
        .cast("bigint")
        .alias("d")
    )
    h0 = _spark_md5_32(
        F.concat(F.lit("perm0:"), F.col("o_custkey").cast("string"))
    )
    h1 = _spark_md5_32(
        F.concat(F.lit("perm1:"), F.col("o_custkey").cast("string"))
    )
    # The replicates ride ONE exploded aggregate keyed by replicate id
    # instead of a {PERM_K}+2-column wide aggregate: the wide form's
    # per-invocation analysis/optimization of the 66-expression decimal
    # tree cost ~1.8 s of pure driver time (profile_key: build 1.7-2.5 s,
    # exec 0.7 s) — §7.3 "very large plans spend minutes in planning".
    # k = -1 carries the unsigned (observed) sum; the md5 draws are
    # computed once per customer row BEFORE the explode, exactly as the
    # wide form evaluated them. Every permuted sum is the identical exact
    # decimal(38,0) regardless of grouping, so results are bit-equal.
    exp_ = (
        panel.withColumn("_h0", h0)
        .withColumn("_h1", h1)
        .select(
            "d",
            "_h0",
            "_h1",
            F.explode(F.sequence(F.lit(-1), F.lit(PERM_K - 1))).alias("k"),
        )
    )
    # shiftright with a COLUMN shift amount needs the SQL form (the PySpark
    # helper only takes an int literal); for k = -1 the branch below never
    # reads the bit, and Java's shift semantics make it well-defined anyway
    bit = F.expr("shiftright(CASE WHEN k < 32 THEN _h0 ELSE _h1 END, k % 32) & 1")
    sd = F.when((F.col("k") == -1) | (bit == 0), F.col("d")).otherwise(
        -F.col("d")
    )
    z = exp_.groupBy("k").agg(
        F.sum(sd.cast("decimal(38,0)")).alias("z"),
        F.count(F.lit(1)).cast("bigint").alias("nn"),
    )
    w_all = Window.partitionBy()  # 65 rows — a scalar-sized frame
    zz = z.withColumn(
        "obs", F.max(F.when(F.col("k") == -1, F.col("z"))).over(w_all)
    )
    return (
        zz.filter(F.col("k") >= 0)
        .agg(
            F.max("nn").alias("n"),  # panel size (identical in every group)
            F.max("obs").alias("obs"),
            F.sum(
                F.when(F.abs(F.col("z")) >= F.abs(F.col("obs")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_extreme"),
        )
        .select(
            F.col("n").alias("n_customers"),
            F.col("obs").cast("bigint").alias("observed_sum_cents"),
            F.col("n_extreme"),
            F.round(F.col("n_extreme") * 1.0 / PERM_K, 6).alias("p_value_est"),
        )
    )


ext_permutation_test.__doc__ = ext_permutation_test.__doc__.replace(
    "{PERM_K}", str(PERM_K)
)


# ---------------------------------------------------------------------------
# ext_qte — quantile treatment effects between hash-assigned arms
# ---------------------------------------------------------------------------

QTE_PS = [10, 50, 90]


def _qte_band_sql(p: int) -> str:
    return f"""CAST(ROUND((
        (100 - ((MAX(n) - 1) * {p}) % 100)
          * MAX(CASE WHEN rk = 1 + ((n - 1) * {p}) // 100 THEN v END)
        + (((MAX(n) - 1) * {p}) % 100)
          * MAX(CASE WHEN rk = 1 + ((n - 1) * {p}) // 100 + 1 THEN v END)
        ) / 100.0, 6) AS DOUBLE)"""


@register(
    "ext_qte",
    f"""
    WITH arms AS (
        SELECT CASE WHEN ({{h}}) % 2 = 0 THEN 0 ELSE 1 END AS arm,
               CAST(FLOOR(CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0)
                    AS BIGINT) AS v
        FROM orders
    ), ranked AS (
        SELECT arm, v,
               ROW_NUMBER() OVER (PARTITION BY arm ORDER BY v) AS rk,
               COUNT(*) OVER (PARTITION BY arm) AS n
        FROM arms
    ), pad AS (
        SELECT arm, v, rk, n FROM ranked
        UNION ALL
        SELECT arm, v, rk + 1 AS rk, n FROM ranked WHERE rk = n
    ), q AS (
        SELECT arm,
               CAST(ANY_VALUE(n) AS BIGINT) AS n_orders,
               {_qte_band_sql(10)} AS p10,
               {_qte_band_sql(50)} AS p50,
               {_qte_band_sql(90)} AS p90
        FROM pad GROUP BY arm
    )
    SELECT a.n_orders AS n_arm0, b.n_orders AS n_arm1,
           a.p10 AS p10_arm0, b.p10 AS p10_arm1,
           {dround('b.p10 - a.p10', 6)} AS qte_p10,
           a.p50 AS p50_arm0, b.p50 AS p50_arm1,
           {dround('b.p50 - a.p50', 6)} AS qte_p50,
           a.p90 AS p90_arm0, b.p90 AS p90_arm1,
           {dround('b.p90 - a.p90', 6)} AS qte_p90
    FROM (SELECT * FROM q WHERE arm = 0) a
    CROSS JOIN (SELECT * FROM q WHERE arm = 1) b
    """,
)
def ext_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects between the hash-assigned arms:
    exact p10/p50/p90 of order value per arm and their differences —
    the distributional readout that mean-based tests miss entirely
    (a treatment can move the tail without moving the mean;
    ext_ab_ztest sees nothing, QTE does).

    Determinism: the same deterministic arm hash as ext_ab_srm_check;
    quantiles assemble from exact order statistics with integer
    rank-space interpolation (the ext_dow_quantile_bands discipline,
    including the top-edge pad row).

    Scale shape: values quantize to dollars; per-arm rank windows run
    over the corpus ONCE (at 100 TB swap for the value-grid cumsum
    pick used by ext_conformal_interval — kept exact-rank here because
    the window also serves the pad). Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    from .llm_ops import _spark_md5_32

    o = load(spark, sf_dir, "orders")
    arm = (
        _spark_md5_32(F.concat(F.lit("srm:"), F.col("o_custkey").cast("string")))
        % 2
    )
    arms = o.select(
        arm.alias("arm"),
        F.floor(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100.0
        )
        .cast("bigint")
        .alias("v"),
    )
    w = Window.partitionBy("arm").orderBy("v")
    # r10: pin the two reused frames — `ranked` feeds both union branches of
    # the pad and `q` feeds both arm projections; unpinned, the plan replayed
    # the orders scan + per-arm rank window once per consumer (4 scans)
    ranked = arms.select(
        "arm",
        "v",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("arm")).alias("n"),
    ).localCheckpoint(eager=False)
    pad = ranked.unionByName(
        ranked.filter(F.col("rk") == F.col("n")).select(
            "arm", "v", (F.col("rk") + 1).alias("rk"), "n"
        )
    )

    def band(p):
        lo_rk = 1 + F.floor((F.col("n") - 1) * p / 100)
        v_lo = F.max(F.when(F.col("rk") == lo_rk, F.col("v")))
        v_hi = F.max(F.when(F.col("rk") == lo_rk + 1, F.col("v")))
        frac = ((F.max("n") - 1) * p) % 100
        return F.round(((100 - frac) * v_lo + frac * v_hi) / 100.0, 6)

    q = pad.groupBy("arm").agg(
        F.first("n").cast("bigint").alias("n_orders"),
        band(10).alias("p10"),
        band(50).alias("p50"),
        band(90).alias("p90"),
    ).localCheckpoint(eager=False)  # 2 rows; feeds both arm projections
    a = q.filter(F.col("arm") == 0).select(
        F.col("n_orders").alias("n_arm0"),
        F.col("p10").alias("p10_arm0"),
        F.col("p50").alias("p50_arm0"),
        F.col("p90").alias("p90_arm0"),
    )
    b = q.filter(F.col("arm") == 1).select(
        F.col("n_orders").alias("n_arm1"),
        F.col("p10").alias("p10_arm1"),
        F.col("p50").alias("p50_arm1"),
        F.col("p90").alias("p90_arm1"),
    )
    return a.crossJoin(b).select(
        "n_arm0",
        "n_arm1",
        "p10_arm0",
        "p10_arm1",
        F.round(F.col("p10_arm1") - F.col("p10_arm0"), 6).alias("qte_p10"),
        "p50_arm0",
        "p50_arm1",
        F.round(F.col("p50_arm1") - F.col("p50_arm0"), 6).alias("qte_p50"),
        "p90_arm0",
        "p90_arm1",
        F.round(F.col("p90_arm1") - F.col("p90_arm0"), 6).alias("qte_p90"),
    )


_ORACLE["ext_qte"] = _ORACLE["ext_qte"].replace(
    "{h}", _md5sql("'srm:' || CAST(o_custkey AS VARCHAR)")
)


# ---------------------------------------------------------------------------
# ext_rdd_screen — regression-discontinuity screen at a value cutoff
# ---------------------------------------------------------------------------

RDD_CUTOFF_DOLLARS = 150_000
RDD_BANDWIDTH = 15_000  # dollars each side


@register(
    "ext_rdd_screen",
    f"""
    WITH w AS (
        SELECT CAST(FLOOR(CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0)
                    AS BIGINT) AS v,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS hi
        FROM orders
        WHERE CAST(FLOOR(CAST(ROUND(o_totalprice * 100) AS BIGINT) / 100.0)
                   AS BIGINT)
              BETWEEN {RDD_CUTOFF_DOLLARS - RDD_BANDWIDTH}
                  AND {RDD_CUTOFF_DOLLARS + RDD_BANDWIDTH - 1}
    ), sides AS (
        SELECT CASE WHEN v >= {RDD_CUTOFF_DOLLARS} THEN 1 ELSE 0 END AS above,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(hi) AS BIGINT) AS n_hi
        FROM w GROUP BY 1
    )
    SELECT a.n AS n_below, b.n AS n_above,
           {dround('a.n_hi * 1.0 / a.n', 6)} AS high_priority_share_below,
           {dround('b.n_hi * 1.0 / b.n', 6)} AS high_priority_share_above,
           {dround('b.n_hi * 1.0 / b.n - a.n_hi * 1.0 / a.n', 6)}
               AS discontinuity,
           CAST(CASE WHEN (a.n - b.n) * (a.n - b.n) * 10000
                          > {_SRM_CHI2_X1E4} * (a.n + b.n)
                     THEN 1 ELSE 0 END AS INTEGER) AS density_jump_flag
    FROM (SELECT * FROM sides WHERE above = 0) a
    CROSS JOIN (SELECT * FROM sides WHERE above = 1) b
    """,
)
def ext_rdd_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-discontinuity screen at the {RDD_CUTOFF_DOLLARS}-
    dollar order-value cutoff: within a +/-{RDD_BANDWIDTH}-dollar
    bandwidth, does the high-priority share JUMP across the threshold
    (the local treatment effect), and does the running variable's
    density jump too (the McCrary manipulation check, via the SRM
    chi-square on side counts)? The threshold-based causal design
    completing DiD (ext_promo_effect_did) and randomized arms
    (ext_metric_cuped).

    Determinism: dollar quantization, exact integer counts, ratios of
    identical integers, and the density verdict by integer
    cross-multiplication.

    Scale shape: the bandwidth filter pushes to the scan; ONE two-cell
    conditional aggregate. Cited parity anchor:
    /root/reference/models (beyond-reference surface)."""
    o = load(spark, sf_dir, "orders")
    v = F.floor(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint") / 100.0
    ).cast("bigint")
    w = o.select(
        v.alias("v"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("hi"),
    ).filter(
        (F.col("v") >= RDD_CUTOFF_DOLLARS - RDD_BANDWIDTH)
        & (F.col("v") <= RDD_CUTOFF_DOLLARS + RDD_BANDWIDTH - 1)
    )
    sides = w.groupBy(
        F.when(F.col("v") >= RDD_CUTOFF_DOLLARS, 1).otherwise(0).alias("above")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("hi").cast("bigint").alias("n_hi"),
    )
    a = sides.filter(F.col("above") == 0).select(
        F.col("n").alias("n_below"), F.col("n_hi").alias("h_below")
    )
    b = sides.filter(F.col("above") == 1).select(
        F.col("n").alias("n_above"), F.col("n_hi").alias("h_above")
    )
    sb = F.col("h_below") * 1.0 / F.col("n_below")
    sa = F.col("h_above") * 1.0 / F.col("n_above")
    dd = F.col("n_below") - F.col("n_above")
    tt = F.col("n_below") + F.col("n_above")
    return a.crossJoin(b).select(
        "n_below",
        "n_above",
        F.round(sb, 6).alias("high_priority_share_below"),
        F.round(sa, 6).alias("high_priority_share_above"),
        F.round(sa - sb, 6).alias("discontinuity"),
        F.when(dd * dd * 10000 > _SRM_CHI2_X1E4 * tt, 1)
        .otherwise(0)
        .cast("int")
        .alias("density_jump_flag"),
    )


ext_rdd_screen.__doc__ = ext_rdd_screen.__doc__.replace(
    "{RDD_CUTOFF_DOLLARS}", str(RDD_CUTOFF_DOLLARS)
).replace("{RDD_BANDWIDTH}", str(RDD_BANDWIDTH))


# ---------------------------------------------------------------------------
# ext_burrows_delta — stylometric distance between sources
# ---------------------------------------------------------------------------

BD_TOP_WORDS = 20
BD_TOPN = 15


@register(
    "ext_burrows_delta",
    f"""
    WITH tf AS MATERIALIZED (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source,
                     unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                         AS token
              FROM documents) GROUP BY source, token
    ), topw AS MATERIALIZED (
        SELECT token FROM (
            SELECT token, SUM(c) AS tc FROM tf GROUP BY token
            ORDER BY tc DESC, token LIMIT {BD_TOP_WORDS}
        )
    ), st AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM tf GROUP BY source
    ), f AS MATERIALIZED (
        SELECT s.source, w.token,
               CAST(ROUND(COALESCE(x.c, 0) * 1000.0 * 1000000.0 / s.t)
                    AS BIGINT) AS fu
        FROM st s CROSS JOIN topw w
        LEFT JOIN tf x ON x.source = s.source AND x.token = w.token
    ), wstat AS MATERIALIZED (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(fu) AS HUGEINT) AS sx,
               CAST(SUM(CAST(fu AS HUGEINT) * fu) AS HUGEINT) AS q
        FROM f GROUP BY token
    ), z AS MATERIALIZED (
        SELECT f.source, f.token,
               CAST(ROUND(
                   (w.n * f.fu - CAST(w.sx AS BIGINT)) * 1.0
                   / sqrt(CAST(CAST((w.n * w.q - w.sx * w.sx) * w.n
                                    / (w.n - 1) AS VARCHAR) AS DOUBLE))
                   * 1000000000.0) AS BIGINT) AS zu
        FROM f JOIN wstat w ON w.token = f.token
        WHERE w.n * w.q - w.sx * w.sx > 0
    ), pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(SUM(ABS(a.zu - b.zu)) AS BIGINT) AS su,
               CAST(COUNT(*) AS BIGINT) AS nw
        FROM z a JOIN z b ON a.token = b.token AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT source_a, source_b,
           {dround('su * 1.0 / nw / 1000000000.0', 6)} AS delta
    FROM pairs
    ORDER BY {dround('su * 1.0 / nw / 1000000000.0', 6)}, source_a, source_b
    LIMIT {BD_TOPN}
    """,
)
def ext_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometry between sources: the {BD_TOP_WORDS}
    most frequent corpus words become style markers, each source's
    per-mille usage z-scores against the cross-source distribution,
    and Delta(a,b) = mean |z_a - z_b| — the authorship-attribution /
    template-provenance measure (two 'different' crawls with nearly
    identical function-word profiles are probably one pipeline),
    reported as the {BD_TOPN} most stylistically similar pairs.

    Determinism: per-mille frequencies snap to integer micro-units;
    word means/variances are exact 128-bit integers; each z snaps to
    1e-9 units (string-path sqrt input); Delta sums exact integers.
    Zero-variance markers are excluded on both engines.

    Scale shape: one (source, token) count (the only corpus shuffle),
    a {BD_TOP_WORDS}-row marker table, and sources x markers grid
    algebra; the pair join is sources^2 x markers. Cited parity
    anchor: /root/reference/models (beyond-reference surface)."""
    from ..ext import text as tx

    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("source", F.explode(tx.tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)  # top words + totals + freq grid
    )
    topw = (
        tf.groupBy("token")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), "token")
        .limit(BD_TOP_WORDS)
        .select("token")
    )
    st = tf.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    f = (
        st.crossJoin(F.broadcast(topw))
        .join(tf, ["source", "token"], "left")
        .select(
            "source",
            "token",
            F.round(F.coalesce("c", F.lit(0)) * 1000.0 * 1e6 / F.col("t"), 0)
            .cast("bigint")
            .alias("fu"),
        )
        .localCheckpoint(eager=False)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    wstat = f.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(F.col("fu"))).alias("sx"),
        F.sum(dec(F.col("fu")) * F.col("fu")).alias("q"),
    )
    var_num = F.col("n") * F.col("q") - F.col("sx") * F.col("sx")
    z = (
        f.join(F.broadcast(wstat), "token")
        .filter(var_num > 0)
        .select(
            "source",
            "token",
            F.round(
                (F.col("n") * F.col("fu") - F.col("sx").cast("bigint")) * 1.0
                / F.sqrt(
                    (var_num * F.col("n") / (F.col("n") - 1)).cast("double")
                )
                * 1e9,
                0,
            )
            .cast("bigint")
            .alias("zu"),
        )
    )
    a = z.select(F.col("source").alias("source_a"), "token", F.col("zu").alias("za"))
    b = z.select(F.col("source").alias("source_b"), "token", F.col("zu").alias("zb"))
    pairs = (
        a.join(b, "token")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.abs(F.col("za") - F.col("zb"))).cast("bigint").alias("su"),
            F.count(F.lit(1)).cast("bigint").alias("nw"),
        )
    )
    delta = F.round(F.col("su") * 1.0 / F.col("nw") / 1e9, 6)
    return (
        pairs.select("source_a", "source_b", delta.alias("delta"))
        .orderBy("delta", "source_a", "source_b")
        .limit(BD_TOPN)
    )


ext_burrows_delta.__doc__ = ext_burrows_delta.__doc__.replace(
    "{BD_TOP_WORDS}", str(BD_TOP_WORDS)
).replace("{BD_TOPN}", str(BD_TOPN))


# ---------------------------------------------------------------------------
# ext_shift_share — regional growth decomposition (shift-share analysis)
# ---------------------------------------------------------------------------

SS_Y1 = 1996
SS_Y2 = 1997


@register(
    "ext_shift_share",
    f"""
    WITH cell AS MATERIALIZED (
        SELECT n.n_name AS nation, p.p_brand AS brand,
               CAST(SUM(CASE WHEN EXTRACT(year FROM l.l_shipdate) = {SS_Y1}
                             THEN CAST(ROUND(l.l_extendedprice
                                             * (1 - l.l_discount) * 100)
                                  AS BIGINT) ELSE 0 END) AS BIGINT) AS r1,
               CAST(SUM(CASE WHEN EXTRACT(year FROM l.l_shipdate) = {SS_Y2}
                             THEN CAST(ROUND(l.l_extendedprice
                                             * (1 - l.l_discount) * 100)
                                  AS BIGINT) ELSE 0 END) AS BIGINT) AS r2
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE EXTRACT(year FROM l.l_shipdate) IN ({SS_Y1}, {SS_Y2})
        GROUP BY 1, 2
    ), ind AS MATERIALIZED (
        SELECT brand, CAST(SUM(r1) AS BIGINT) AS b1,
               CAST(SUM(r2) AS BIGINT) AS b2
        FROM cell GROUP BY brand
    ), tot AS (
        SELECT CAST(SUM(b1) AS BIGINT) AS t1, CAST(SUM(b2) AS BIGINT) AS t2
        FROM ind
    ), terms AS MATERIALIZED (
        SELECT c.nation,
               c.r2 - c.r1 AS actual,
               CAST(ROUND(c.r1 * ((t.t2 - t.t1) * 1.0 / t.t1) * 1000.0)
                    AS BIGINT) AS ns_mu,
               CAST(ROUND(c.r1 * ((i.b2 - i.b1) * 1.0 / i.b1
                                  - (t.t2 - t.t1) * 1.0 / t.t1) * 1000.0)
                    AS BIGINT) AS im_mu,
               CASE WHEN c.r1 > 0
                    THEN CAST(ROUND(c.r1 * ((c.r2 - c.r1) * 1.0 / c.r1
                                            - (i.b2 - i.b1) * 1.0 / i.b1)
                                    * 1000.0) AS BIGINT)
                    ELSE (c.r2 - c.r1) * 1000
                         - CAST(ROUND(c.r1 * ((i.b2 - i.b1) * 1.0 / i.b1)
                                      * 1000.0) AS BIGINT) END AS cs_mu
        FROM cell c
        JOIN ind i ON i.brand = c.brand
        CROSS JOIN tot t
    )
    SELECT nation,
           CAST(SUM(actual) AS BIGINT) AS actual_change_cents,
           {dround('SUM(ns_mu) / 1000.0 / 100.0', 6)} AS national_effect_dollars,
           {dround('SUM(im_mu) / 1000.0 / 100.0', 6)} AS industry_mix_dollars,
           {dround('SUM(cs_mu) / 1000.0 / 100.0', 6)} AS competitive_dollars
    FROM terms GROUP BY nation ORDER BY nation
    """,
)
def ext_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of each nation's {SS_Y1}->{SS_Y2}
    revenue change: national effect (what growing with the whole
    market would give), industry mix (being in fast/slow brands), and
    competitive shift (out/under-performing within each brand) — the
    regional-economics decomposition that explains WHY a geography
    grew, completing the growth-accounting family
    (ext_price_volume_mix decomposes price x volume; this decomposes
    geography x industry).

    Determinism: every (nation, brand) term multiplies exact integer
    cents by rate differences of identical integer ratios and snaps to
    MILLI-cent units per cell before the nation rollup; zero-base
    cells route the entire change into the competitive term
    (documented rule, both engines).

    Scale shape: the two-year filter pushes to the scan; one
    (nation, brand) conditional aggregate behind broadcast dims
    (<= 625 cells); all decomposition algebra on that grid. Cited
    parity anchor: /root/reference/models (beyond-reference
    surface)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pt = load(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_brand").alias("brand")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    yr = F.year("l_shipdate")
    cell = (
        li.filter(yr.isin(SS_Y1, SS_Y2))
        .select("l_orderkey", "l_partkey", yr.alias("yr"), cents.alias("cents"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("n_name").alias("nation"), "brand")
        .agg(
            F.sum(F.when(F.col("yr") == SS_Y1, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("r1"),
            F.sum(F.when(F.col("yr") == SS_Y2, F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("r2"),
        )
        .localCheckpoint(eager=False)  # industry rollup + the term grid
    )
    ind = cell.groupBy("brand").agg(
        F.sum("r1").cast("bigint").alias("b1"),
        F.sum("r2").cast("bigint").alias("b2"),
    )
    tot = ind.agg(
        F.sum("b1").cast("bigint").alias("t1"),
        F.sum("b2").cast("bigint").alias("t2"),
    )
    g_tot = (F.col("t2") - F.col("t1")) * 1.0 / F.col("t1")
    g_ind = (F.col("b2") - F.col("b1")) * 1.0 / F.col("b1")
    g_cell = (F.col("r2") - F.col("r1")) * 1.0 / F.col("r1")
    terms = (
        cell.join(F.broadcast(ind), "brand")
        .crossJoin(F.broadcast(tot))
        .select(
            "nation",
            (F.col("r2") - F.col("r1")).alias("actual"),
            F.round(F.col("r1") * g_tot * 1000.0, 0)
            .cast("bigint")
            .alias("ns_mu"),
            F.round(F.col("r1") * (g_ind - g_tot) * 1000.0, 0)
            .cast("bigint")
            .alias("im_mu"),
            F.when(
                F.col("r1") > 0,
                F.round(F.col("r1") * (g_cell - g_ind) * 1000.0, 0).cast(
                    "bigint"
                ),
            )
            .otherwise(
                (F.col("r2") - F.col("r1")) * 1000
                - F.round(F.col("r1") * g_ind * 1000.0, 0).cast("bigint")
            )
            .alias("cs_mu"),
        )
    )
    return (
        terms.groupBy("nation")
        .agg(
            F.sum("actual").cast("bigint").alias("actual_change_cents"),
            F.round(F.sum("ns_mu") / 1000.0 / 100.0, 6).alias(
                "national_effect_dollars"
            ),
            F.round(F.sum("im_mu") / 1000.0 / 100.0, 6).alias(
                "industry_mix_dollars"
            ),
            F.round(F.sum("cs_mu") / 1000.0 / 100.0, 6).alias(
                "competitive_dollars"
            ),
        )
        .orderBy("nation")
    )


ext_shift_share.__doc__ = ext_shift_share.__doc__.replace(
    "{SS_Y1}", str(SS_Y1)
).replace("{SS_Y2}", str(SS_Y2))
