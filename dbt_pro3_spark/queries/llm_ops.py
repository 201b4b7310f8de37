"""Training-data-pipeline operators beyond the §2.K core: PII redaction,
document chunking, deterministic splits, quota sampling, repetition-quality,
corpus composition reporting.

All pure Column expressions (JVM-side, codegen-friendly, no UDFs); each key
has an exact DuckDB oracle twin. Determinism discipline: anything that
samples or orders does so by md5 of a key, never by rand(), so both engines
produce bit-identical output and a re-run at 100 TB is reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..ext import text as tx
from ..sources.readers import load
from . import dround, register

# --- shared regexes (Java regex and DuckDB RE2 agree on these constructs) ---
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
LONGNUM_RE = r"[0-9]{9,}"

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

# DuckDB: whitespace tokens of a single-space-joined text column
_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"


def _md5_32(expr: str) -> str:
    """DuckDB SQL for the first 32 bits of md5(expr) as a BIGINT — the same
    nibble arithmetic the dedup oracles use; bit-identical to Spark's
    conv(substring(md5(x), 1, 8), 16, 10)."""
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1) * {16 ** (8 - i)}"
        for i in range(1, 9)
    )
    return f"({terms})"


def _spark_md5_32(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast("bigint")


@register(
    "ext_text_pii_redact",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(text, '{LONGNUM_RE}')) AS INTEGER) AS n_longnums,
           regexp_replace(regexp_replace(regexp_replace(text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g'),
               '{LONGNUM_RE}', '<NUM>', 'g') AS redacted_text
    FROM documents
    """,
)
def ext_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: emails, phone numbers, and long digit runs
    replaced with typed placeholders, with per-category match counts kept
    for audit. Narrow regexp expressions — no shuffle, whole-stage codegen;
    the standard pre-training scrub (reference has no text ops at all —
    this extends §2.K's text family)."""
    t = F.col("text")
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(LONGNUM_RE), 0)).alias("n_longnums"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ),
            LONGNUM_RE,
            "<NUM>",
        ).alias("redacted_text"),
    )


@register(
    "ext_text_chunk",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), sized AS (
        SELECT doc_id, l, len(l) AS n,
               CASE WHEN len(l) <= {CHUNK_TOKENS} THEN 0
                    ELSE CAST(CEIL(CAST(len(l) - {CHUNK_TOKENS} AS DOUBLE) / {CHUNK_STRIDE}) AS INTEGER)
               END AS last_chunk
        FROM toks WHERE len(l) > 0
    ), c AS (
        SELECT doc_id, n, l, unnest(generate_series(0, last_chunk)) AS chunk_id
        FROM sized
    )
    SELECT doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(LEAST({CHUNK_TOKENS}, n - chunk_id * {CHUNK_STRIDE}) AS INTEGER) AS n_chunk_tokens,
           array_to_string(list_slice(l, chunk_id * {CHUNK_STRIDE} + 1,
                                      chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ') AS chunk_text
    FROM c
    """,
)
def ext_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64 tokens, stride 48) — how long
    documents become model-sized training samples. The chunk fan-out is
    sequence+explode over array slices: one narrow expand, no shuffle, no
    UDF; chunk starts step by stride until the final window reaches the
    document tail (no fully-contained redundant tail chunk)."""
    toks = tx.tokens(F.col("text"))
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", toks.alias("l"), F.size(toks).alias("n")
    ).filter(F.col("n") > 0)
    last_chunk = (
        F.when(F.col("n") <= CHUNK_TOKENS, F.lit(0))
        .otherwise(
            F.ceil((F.col("n") - F.lit(CHUNK_TOKENS)).cast("double") / CHUNK_STRIDE)
        )
        .cast("int")
    )
    start = F.col("chunk_id") * CHUNK_STRIDE + 1
    return (
        sized.withColumn("chunk_id", F.explode(F.sequence(F.lit(0), last_chunk)))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.least(
                F.lit(CHUNK_TOKENS), F.col("n") - F.col("chunk_id") * CHUNK_STRIDE
            )
            .cast("int")
            .alias("n_chunk_tokens"),
            F.array_join(F.slice(F.col("l"), start, CHUNK_TOKENS), " ").alias(
                "chunk_text"
            ),
        )
    )


@register(
    "ext_data_split",
    f"""
    WITH b AS (
        SELECT doc_id, CAST({_md5_32("'doc:' || CAST(doc_id AS VARCHAR)")} % 100 AS INTEGER) AS bucket
        FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def ext_data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment: hash-bucket of the
    document id (salted md5), never rand() — the split is stable across
    runs, engines, and partitionings, and any worker can compute membership
    locally (narrow, no shuffle). This is how corpus splits stay consistent
    when the corpus is rebuilt at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.pmod(
        _spark_md5_32(F.concat(F.lit("doc:"), F.col("doc_id").cast("string"))), F.lit(100)
    ).cast("int")
    return docs.select("doc_id", bucket.alias("bucket")).select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "ext_sample_per_group",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5('s:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang, source, CAST(rn AS INTEGER) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def ext_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota sampling: at most N documents per (lang, source) cell, chosen
    by a deterministic hash order (md5 of the id — an unbiased but
    reproducible shuffle within each cell). ONE shuffle on the cell key;
    per-cell state is a bounded top-N, so a hot cell streams rather than
    materializing. This is the domain-mix rebalancing step of a corpus
    build."""
    docs = load(spark, sf_dir, "documents")
    order_key = F.md5(
        F.concat(F.lit("s:"), F.col("doc_id").cast("string")).cast("binary")
    )
    w = Window.partitionBy("lang", "source").orderBy(order_key, F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "ext_text_repetition",
    f"""
    WITH t AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ), per AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_distinct,
           {dround('CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)', 6)} AS distinct_ratio,
           {dround('CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)', 6)} AS top_token_ratio,
           CAST(CASE WHEN CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) > 0.125 THEN 1 ELSE 0 END AS INTEGER) AS rep_flag
    FROM per GROUP BY doc_id
    """,
)
def ext_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality metrics (the Gopher-rules family): distinct
    token ratio and top-token frequency ratio, with a repetition flag.
    explode -> two aggregations both keyed by doc_id, so the second
    groupBy reuses the first's hash partitioning — effectively one shuffle,
    partial aggregation map-side."""
    docs = load(spark, sf_dir, "documents")
    per = (
        docs.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top_ratio = F.max("c").cast("double") / F.sum("c").cast("double")
    return per.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c").cast("double"), 6).alias(
            "distinct_ratio"
        ),
        F.round(top_ratio, 6).alias("top_token_ratio"),
        (top_ratio > 0.125).cast("int").alias("rep_flag"),
    )


@register(
    "ext_docs_composition",
    f"""
    WITH per AS (
        SELECT lang, source,
               COUNT(*) AS n_docs,
               CAST(SUM(len({_TOKS_SQL})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, n_tokens,
           {dround('CAST(n_tokens AS DOUBLE) / SUM(CAST(n_tokens AS DOUBLE)) OVER ()', 6)} AS token_share
    FROM per
    """,
)
def ext_docs_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: documents and tokens per (lang, source)
    cell plus each cell's share of total tokens — the mix dashboard every
    corpus build is steered by. The token count is a narrow array length;
    the only shuffle is the groupBy on the (low-cardinality) cell key; the
    global-share window runs over the tiny aggregated result, not the
    corpus."""
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tx.tokens(F.col("text")))).alias("n_tokens"),
    )
    w = Window.partitionBy()
    return per.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.sum(F.col("n_tokens").cast("double")).over(w),
            6,
        ).alias("token_share"),
    )


BM25_TERMS = ["spark", "table", "merge"]
BM25_K1 = 1.2
BM25_B = 0.75


@register(
    "ext_text_bm25",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
        SELECT CAST(AVG(dl) AS DOUBLE) AS avgdl,
               CAST(COUNT(*) AS DOUBLE) AS n_docs
        FROM dl
    ), tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf FROM toks
        WHERE tok IN ({", ".join("'" + t + "'" for t in BM25_TERMS)})
        GROUP BY doc_id, tok
    ), df AS (
        SELECT tok, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY tok
    ), scored AS (
        SELECT tf.doc_id,
               SUM(
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * ({BM25_K1} + 1.0))
                   / (tf.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl))
               ) AS score
        FROM tf
        JOIN df ON tf.tok = df.tok
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
        GROUP BY tf.doc_id
    ), ranked AS (
        SELECT doc_id, {dround('score', 6)} AS bm25,
               ROW_NUMBER() OVER (ORDER BY {dround('score', 6)} DESC, doc_id) AS rk
        FROM scored
    )
    SELECT doc_id, bm25, CAST(rk AS INTEGER) AS rk FROM ranked WHERE rk <= 20
    """,
)
def ext_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (k1=1.2, b=0.75) — the lexical-search
    primitive of corpus curation (find documents about X to up/downsample).

    Plan shape at 100 TB: the token explode filters to the QUERY TERMS
    before any shuffle (a 3-element IN — the postings restriction), so the
    per-term tf aggregation shuffles only matching (doc, term) rows. Doc
    lengths aggregate once; idf and avgdl are 1-row/3-row broadcasts.
    Ranking sorts only the scored subset (docs containing >=1 term), and
    ties break on doc_id so the top-20 cut is deterministic on both
    engines (scores compared after 6-dp rounding)."""
    from ..sources.readers import spread

    docs = load(spark, sf_dir, "documents")
    toks = spread(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.avg("dl").cast("double").alias("avgdl"),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    tf = (
        toks.filter(F.col("tok").isin(BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * (F.col("tf") * (BM25_K1 + 1.0)) / denom).alias("score"))
    )
    return (
        scored.select("doc_id", F.round("score", 6).alias("bm25"))
        .withColumn("rk", F.row_number().over(Window.orderBy(F.desc("bm25"), F.col("doc_id"))))
        .filter(F.col("rk") <= 20)
    )


DECON_N = 4  # n-gram width; production decontamination uses 8-13 (see docstring)

PACK_CTX = 512  # context-window token budget
PACK_BUCKET = 256  # docs per prefix-sum bucket


@register(
    "ext_text_decontaminate",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), sized AS (
        SELECT doc_id, l, len(l) AS n FROM toks WHERE len(l) >= {DECON_N}
    ), pos AS (
        SELECT doc_id, l, unnest(generate_series(1, n - {DECON_N - 1})) AS i FROM sized
    ), grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(list_slice(l, i, i + {DECON_N - 1}), ' ') AS gram
        FROM pos
    ), bench AS (
        SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
    ), doc_tot AS (
        SELECT doc_id, COUNT(*) AS n_grams FROM grams WHERE doc_id % 97 <> 0 GROUP BY doc_id
    ), hits AS (
        SELECT g.doc_id, COUNT(*) AS n_shared
        FROM grams g JOIN bench USING (gram)
        WHERE g.doc_id % 97 <> 0
        GROUP BY g.doc_id
    )
    SELECT h.doc_id, n_shared, n_grams,
           {dround('CAST(n_shared AS DOUBLE) / n_grams', 4)} AS contamination
    FROM hits h JOIN doc_tot t ON h.doc_id = t.doc_id
    """,
)
def ext_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM n-gram-collision method):
    flag training documents sharing any token n-gram with a held-out eval
    set, reporting shared-gram count and contamination share per document.
    The eval set is deterministically carved from the corpus (doc_id % 97)
    so both engines see the identical benchmark; production pipelines use
    8-13-grams — the synthetic corpus's word entropy makes 4 the
    discriminating width here, and the width is a module constant.

    Scale shape: per-document DISTINCT n-grams via sequence+explode (one
    narrow expand, no lambda-HOF in the hot path), benchmark side reduced
    to a DISTINCT gram set — eval suites are tiny relative to the corpus,
    so the contamination join BROADCASTS; the only fact shuffle is the
    per-doc distinct/count aggregation, keyed by (doc_id, gram) md5-width
    not document text."""
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    sized = docs.select("doc_id", toks.alias("l"), F.size(toks).alias("n")).filter(
        F.col("n") >= DECON_N
    )
    # r10: the distinct gram stream feeds THREE consumers (the benchmark
    # side, the per-doc totals, the contamination join) — pinned so the
    # tokenize + explode + distinct pass over the corpus runs once, not
    # three times (plan audit: documents scanned 3x -> 1)
    grams = (
        sized.withColumn(
            "i", F.explode(F.sequence(F.lit(1), F.col("n") - (DECON_N - 1)))
        )
        .select(
            "doc_id",
            F.array_join(F.slice(F.col("l"), F.col("i"), DECON_N), " ").alias("gram"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    train = grams.filter(F.col("doc_id") % 97 != 0)
    doc_tot = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        train.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return hits.join(doc_tot, "doc_id").select(
        "doc_id",
        "n_shared",
        "n_grams",
        F.round(F.col("n_shared").cast("double") / F.col("n_grams"), 4).alias(
            "contamination"
        ),
    )


@register(
    "ext_text_pack",
    f"""
    WITH toks AS (
        SELECT doc_id, len({_TOKS_SQL}) AS n_tokens FROM documents
    ), t AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS cum_before
        FROM toks WHERE n_tokens > 0
    )
    SELECT doc_id, n_tokens,
           CAST(cum_before AS BIGINT) AS cum_before,
           CAST(FLOOR(cum_before / {PACK_CTX}) AS BIGINT) AS pack_first,
           CAST(FLOOR((cum_before + n_tokens - 1) / {PACK_CTX}) AS BIGINT) AS pack_last,
           CAST(FLOOR((cum_before + n_tokens - 1) / {PACK_CTX})
                - FLOOR(cum_before / {PACK_CTX}) + 1 AS BIGINT) AS n_packs
    FROM t
    """,
)
def ext_text_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chunk): documents are concatenated in
    deterministic doc_id order and cut into fixed {PACK_CTX}-token context
    windows — each document reports the pack range it lands in. This is
    the standard pre-training batching transform (every token position is
    used exactly once; documents may straddle pack boundaries).

    The global token prefix-sum is computed DISTRIBUTED, not with a
    single-partition window: doc_id-range buckets get a partitioned local
    cumsum, bucket subtotals (corpus_size / {PACK_BUCKET} rows) get a tiny
    ordered offset scan, and the broadcast offsets join back — the same
    two-level scan a 1000-executor prefix sum uses. The only ordered
    global window runs over the subtotal rows, bounded by n_docs/{PACK_BUCKET},
    never the corpus."""
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    sized = docs.select(
        "doc_id", F.size(toks).cast("bigint").alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    sized = sized.withColumn("bucket", F.floor(F.col("doc_id") / PACK_BUCKET))
    w_local = Window.partitionBy("bucket").orderBy("doc_id")
    local = sized.withColumn(
        "local_before", F.sum("n_tokens").over(w_local) - F.col("n_tokens")
    )
    subtot = sized.groupBy("bucket").agg(F.sum("n_tokens").alias("tot"))
    w_bucket = Window.orderBy("bucket")
    offsets = subtot.withColumn(
        "offset", (F.sum("tot").over(w_bucket) - F.col("tot")).cast("bigint")
    ).select("bucket", "offset")
    packed = local.join(F.broadcast(offsets), "bucket").withColumn(
        "cum_before", (F.col("offset") + F.col("local_before")).cast("bigint")
    )
    pack_first = F.floor(F.col("cum_before") / PACK_CTX)
    pack_last = F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / PACK_CTX)
    return packed.select(
        "doc_id",
        "n_tokens",
        "cum_before",
        pack_first.cast("bigint").alias("pack_first"),
        pack_last.cast("bigint").alias("pack_last"),
        (pack_last - pack_first + 1).cast("bigint").alias("n_packs"),
    )


QF_PCT = 0.3  # per-language quality percentile cut

_STOPWORDS_SQL = "('the','a','an','and','of','to','in','is','on','for')"

_SCORE_SQL = """CASE WHEN n_tokens BETWEEN 50 AND 5000 THEN CAST(0.5 AS DOUBLE) ELSE CAST(0.2 AS DOUBLE) END
             + CASE WHEN stop_ratio > 0.02 AND stop_ratio < 0.6 THEN CAST(0.3 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
             + CASE WHEN avg_len > 2.5 AND avg_len < 12 THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"""


@register(
    "ext_quality_filter",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, {_TOKS_SQL} AS l
        FROM documents
    ), feat AS (
        SELECT doc_id, lang,
               len(l) AS n_tokens,
               CAST(list_sum(list_transform(l, x -> len(x))) AS DOUBLE)
                   / NULLIF(CAST(len(l) AS DOUBLE), 0) AS avg_len,
               CAST(len(list_filter(l, x -> lower(x) IN {_STOPWORDS_SQL})) AS DOUBLE)
                   / NULLIF(CAST(len(l) AS DOUBLE), 0) AS stop_ratio
        FROM toks
    ), scored AS (
        SELECT doc_id, lang, {dround(_SCORE_SQL, 2)} AS quality_score
        FROM feat
    ), cuts AS (
        SELECT lang, {dround(f'quantile_cont(quality_score, {QF_PCT})', 6)} AS cut
        FROM scored GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.quality_score, c.cut
    FROM scored s JOIN cuts c ON s.lang = c.lang
    WHERE s.quality_score >= c.cut
    """,
)
def ext_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-based quality filtering, stratified by language: each
    language keeps only documents at or above its own P30 quality score —
    per-language cuts avoid the cross-lingual bias a single global
    threshold introduces (low-resource languages would be wiped out by an
    en-calibrated cut). The Gopher/C4-style curation pass, composed from
    ext_text_quality's features.

    Scale shape: scoring is narrow; the per-language percentile is one
    tiny aggregate (rows == languages) broadcast back over the corpus —
    no corpus re-shuffle. Both engines interpolate the same continuous
    percentile (Spark percentile == DuckDB quantile_cont) over the same
    2-dp-discrete scores, and membership is decided on 6-dp-rounded cuts,
    so the kept set is bit-identical."""
    from ..ext.text import quality_features

    docs = load(spark, sf_dir, "documents")
    scored = quality_features(docs).select("doc_id", "lang", "quality_score")
    # two consumers (percentile aggregate + membership join) — materialize
    # the narrow scored projection once; scoring HOFs over the full text
    # are the expensive part, not this 3-column table
    scored = scored.localCheckpoint(eager=False)
    cuts = scored.groupBy("lang").agg(
        F.round(F.expr(f"percentile(quality_score, {QF_PCT})"), 6).alias("cut")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .filter(F.col("quality_score") >= F.col("cut"))
        .select("doc_id", "lang", "quality_score", "cut")
    )


@register(
    "ext_mixture_resample",
    f"""
    WITH w AS (
        SELECT doc_id, source,
               0.5 + (CAST(regexp_extract(source, 'src([0-9]+)', 1) AS INTEGER) % 4) * 0.75 AS wt,
               {_md5_32("CAST(doc_id AS VARCHAR)")} / 4294967296.0 AS u
        FROM documents
    ), c AS (
        SELECT doc_id, source,
               CAST(FLOOR(wt) + CASE WHEN u < wt - FLOOR(wt) THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        FROM w
    )
    SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS epoch
    FROM c WHERE n_copies > 0
    """,
)
def ext_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-mixture resampling: each source gets an epoch weight (here
    derived from the source id -> {{0.5, 1.25, 2.0, 2.75}} so both engines
    share it without a literal map) and every document is emitted
    floor(weight) times plus one more with probability frac(weight) —
    gated by a DETERMINISTIC per-document hash, not rand(), so the
    realized mixture is reproducible run-to-run and engine-to-engine.
    This is how pre-training mixtures (epochs per source) are actually
    materialized; downweighted sources (wt < 1) subsample, upweighted
    ones repeat.

    Scale shape: narrow expressions + one explode — no shuffle at all;
    the hash gate u < frac(wt) compares exact dyadic rationals
    (md5_32/2^32) against exact quarter fractions, so membership can
    never flip between engines."""
    docs = load(spark, sf_dir, "documents")
    num = F.regexp_extract(F.col("source"), r"src([0-9]+)", 1).cast("int")
    wt = F.lit(0.5) + (num % 4).cast("double") * 0.75
    u = _spark_md5_32(F.col("doc_id").cast("string")) / F.lit(4294967296.0)
    n_copies = (
        F.floor(wt) + F.when(u < wt - F.floor(wt), F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")
    return (
        docs.select("doc_id", "source", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("n_copies"))).alias(
                "epoch"
            ),
        )
    )


@register(
    "ext_dedup_incremental",
    """
    WITH store AS (
        SELECT DISTINCT md5(lower(trim(text))) AS text_hash
        FROM documents WHERE doc_id % 5 <> 0
    ), batch AS (
        SELECT doc_id, md5(lower(trim(text))) AS text_hash
        FROM documents WHERE doc_id % 5 = 0
    ), novel AS (
        SELECT b.doc_id, b.text_hash
        FROM batch b LEFT JOIN store s ON b.text_hash = s.text_hash
        WHERE s.text_hash IS NULL
    )
    SELECT text_hash, MIN(doc_id) AS kept_id, COUNT(*) AS batch_dup_count
    FROM novel GROUP BY text_hash
    """,
)
def ext_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: a NEW ingest batch (doc_id % 5 = 0 plays the
    fresh crawl) is deduplicated against the fingerprint STORE of
    everything already ingested, then within itself — the production
    corpus-refresh shape, where re-hashing the historical corpus per
    batch would be quadratic-over-time. Only 16-byte hashes flow: the
    store side is a DISTINCT hash projection (at 100 TB this is the
    persisted fingerprint table, not a rescan), the anti-join shuffles
    hash keys only, and the within-batch dedup reuses the same hash
    partitioning — AQE collapses the two exchanges."""
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.col("text"))))
    store = (
        docs.filter(F.col("doc_id") % 5 != 0).select(h.alias("text_hash")).distinct()
    )
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", h.alias("text_hash")
    )
    return (
        batch.join(store, "text_hash", "left_anti")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("kept_id"),
            F.count(F.lit(1)).alias("batch_dup_count"),
        )
    )


VOCAB_K = 100


@register(
    "ext_text_vocab",
    f"""
    SELECT tok, COUNT(*) AS freq
    FROM (SELECT unnest({_TOKS_SQL}) AS tok FROM documents)
    GROUP BY tok
    ORDER BY freq DESC, tok
    LIMIT {VOCAB_K}
    """,
)
def ext_text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary extraction: top-{VOCAB_K} tokens by frequency with
    a deterministic token tiebreak — the input to tokenizer training and
    OOV analysis. explode + hash aggregate with map-side partial counts
    (the shuffle carries one row per DISTINCT token per partition, not
    per occurrence), then ORDER BY + LIMIT compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.col("tok"))
        .limit(VOCAB_K)
    )


@register(
    "ext_text_bpe_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), pairs AS (
        SELECT l[i] AS left_tok, l[i + 1] AS right_tok
        FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - 1)) AS i FROM toks
              WHERE len(l) >= 2)
    )
    SELECT left_tok, right_tok, COUNT(*) AS freq
    FROM pairs
    GROUP BY left_tok, right_tok
    ORDER BY freq DESC, left_tok, right_tok
    LIMIT {VOCAB_K}
    """,
)
def ext_text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-pair frequency counting — the inner statistic of BPE merge
    selection (which symbol pair to merge next) and of collocation
    mining. Pair fan-out is sequence+explode over (i, i+1) positions —
    narrow, no UDF; the aggregate shuffles one row per distinct pair per
    partition thanks to partial aggregation, and top-{VOCAB_K} is a
    per-partition heap. At tokenizer-training scale the distinct-pair
    space, not the corpus, bounds the shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    sized = docs.select(toks.alias("l"), F.size(toks).alias("n")).filter(
        F.col("n") >= 2
    )
    pairs = sized.withColumn(
        "i", F.explode(F.sequence(F.lit(1), F.col("n") - 1))
    ).select(
        F.element_at(F.col("l"), F.col("i")).alias("left_tok"),
        F.element_at(F.col("l"), F.col("i") + 1).alias("right_tok"),
    )
    return (
        pairs.groupBy("left_tok", "right_tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.col("left_tok"), F.col("right_tok"))
        .limit(VOCAB_K)
    )


@register(
    "ext_text_unigram_xent",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ), vocab AS (
        SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ), tot AS (
        SELECT SUM(cnt) AS total FROM vocab
    ), scored AS (
        SELECT t.doc_id, {dround('-ln(v.cnt / tot.total)', 9)} AS logp
        FROM toks t JOIN vocab v USING (tok), tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens, {dround('AVG(logp)', 6)} AS cross_entropy
    FROM scored GROUP BY doc_id
    """,
)
def ext_text_unigram_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy scoring — the cheap stand-in for
    perplexity-based quality filtering (KenLM-style): the corpus's own
    unigram distribution is the language model, and each document is
    scored by its mean -ln p(token). Surprising (OOV-heavy, gibberish)
    documents score high and get culled.

    Scale shape: the LM is the token-frequency table — bounded by VOCAB,
    not corpus size, so it broadcasts (shuffle-join if a web-scale vocab
    outgrows that); per-token log-probs are rounded at 9 dp before the
    per-doc mean (ln differs by ulps across engines' libm) and the mean
    at 6 dp, keeping the hash stable."""
    docs = load(spark, sf_dir, "documents")
    # toks feeds the vocab aggregate and the scoring join — checkpoint once
    toks = docs.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok")
    ).localCheckpoint(eager=False)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(-F.log(F.col("cnt") / F.col("total")), 9).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("logp"), 6).alias("cross_entropy"),
    )


DUP_NGRAM_N = 8


@register(
    "ext_text_dup_ngram_spans",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), sized AS (
        SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n_tokens FROM toks
    ), grams AS (
        SELECT doc_id, i, md5(array_to_string(l[i:i+{DUP_NGRAM_N - 1}], ' ')) AS g
        FROM (SELECT doc_id, l, unnest(generate_series(1, len(l) - {DUP_NGRAM_N - 1})) AS i
              FROM sized WHERE n_tokens >= {DUP_NGRAM_N})
    ), dupg AS (
        SELECT g FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2
    ), dup_pos AS (
        SELECT doc_id, i FROM grams JOIN dupg USING (g)
    ), dup_cnt AS (
        SELECT doc_id, COUNT(*) AS n_dup_ngrams FROM dup_pos GROUP BY doc_id
    ), cover AS (
        SELECT doc_id, COUNT(DISTINCT p) AS covered_tokens
        FROM (SELECT doc_id, unnest(generate_series(i, i + {DUP_NGRAM_N - 1})) AS p
              FROM dup_pos)
        GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_tokens,
           CAST(GREATEST(s.n_tokens - {DUP_NGRAM_N - 1}, 0) AS BIGINT) AS n_ngrams,
           CAST(COALESCE(d.n_dup_ngrams, 0) AS BIGINT) AS n_dup_ngrams,
           CAST(COALESCE(c.covered_tokens, 0) AS BIGINT) AS covered_tokens,
           {dround('COALESCE(c.covered_tokens, 0) * 1.0 / s.n_tokens', 6)} AS dup_token_ratio
    FROM sized s
    LEFT JOIN dup_cnt d USING (doc_id)
    LEFT JOIN cover c USING (doc_id)
    WHERE s.n_tokens > 0
    """,
)
def ext_text_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal duplicate-span detection (the exact-substring-dedup
    family of Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): every token 8-gram is hashed; 8-grams appearing in
    two or more distinct documents mark their token span as duplicated,
    and each document reports how many of its tokens sit under at least
    one cross-document duplicate span. Downstream, high dup_token_ratio
    docs get span-clipped or dropped.

    Scale shape — this is the hash-based stand-in for a distributed
    suffix array: the n-gram fan-out is sequence+explode (narrow); the
    duplicate-gram set comes from one groupBy on a 16-byte md5 key with
    partial aggregation; the join back is gram-hash-partitioned, never
    all-pairs; span coverage is a second explode bounded by 8x the
    duplicated positions. Everything is O(corpus tokens), shuffle keys
    are fixed-width hashes, and no step holds a whole document's gram
    set in one row."""
    n = DUP_NGRAM_N
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    sized = docs.select(
        "doc_id", toks.alias("l"), F.size(toks).cast("bigint").alias("n_tokens")
    )
    grams = (
        sized.filter(F.col("n_tokens") >= n)
        .withColumn("i", F.explode(F.sequence(F.lit(1), (F.col("n_tokens") - (n - 1)).cast("int"))))
        .select(
            "doc_id",
            "i",
            F.md5(F.concat_ws(" ", F.slice(F.col("l"), F.col("i"), n)).cast("binary")).alias("g"),
        )
    )
    # "appears in >= 2 distinct docs" is exactly min(doc_id) != max(doc_id),
    # computed as a WINDOW over the gram-partitioned stream (r10): the prior
    # aggregate-then-self-join shape shuffled the gram stream twice and ran
    # the tokenize+md5 scan once per side; one gram-keyed window computes the
    # per-gram min/max in the SAME single shuffle that the join needed, so
    # the corpus is tokenized and hashed exactly once. (A per-gram
    # countDistinct would plan an Expand over the gram stream — still
    # avoided.)
    w_g = Window.partitionBy("g")
    dup_pos = (
        grams.withColumn("lo", F.min("doc_id").over(w_g))
        .withColumn("hi", F.max("doc_id").over(w_g))
        .filter(F.col("lo") != F.col("hi"))
        .select("doc_id", "i")
    )
    # ONE pass over dup_pos for both stats (position count + span coverage):
    # positions i are already distinct per doc, so each contributes exactly
    # one span row with p == i — counting those IS the dup-ngram count,
    # leaving a single distinct column (p) so the aggregate plans as a
    # two-phase partial on (doc_id, p) with no Expand duplication.
    spans = dup_pos.select(
        "doc_id", "i", F.explode(F.sequence(F.col("i"), F.col("i") + (n - 1))).alias("p")
    )
    stats = spans.groupBy("doc_id").agg(
        F.sum((F.col("p") == F.col("i")).cast("int")).alias("n_dup_ngrams"),
        F.countDistinct("p").alias("covered_tokens"),
    )
    return (
        sized.drop("l")
        .filter(F.col("n_tokens") > 0)
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.greatest(F.col("n_tokens") - (n - 1), F.lit(0)).cast("bigint").alias("n_ngrams"),
            F.coalesce(F.col("n_dup_ngrams"), F.lit(0)).cast("bigint").alias("n_dup_ngrams"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("bigint").alias("covered_tokens"),
            F.round(
                F.coalesce(F.col("covered_tokens"), F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_token_ratio"),
        )
    )


@register(
    "ext_embed_quantize",
    f"""
    WITH vals AS (
        SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
        FROM (SELECT vec_id, embedding,
                     unnest(generate_series(1, len(embedding))) AS i
              FROM embeddings)
    ), bounds AS (
        SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM vals GROUP BY dim
    ), q AS (
        SELECT v.vec_id, v.x, b.mn, b.mx,
               LEAST(GREATEST(CAST(FLOOR((v.x - b.mn) / NULLIF(b.mx - b.mn, 0) * 255 + 0.5)
                                   AS INTEGER), 0), 255) AS code
        FROM vals v JOIN bounds b USING (dim)
    ), r AS (
        SELECT vec_id, code,
               ABS(x - (mn + code * (mx - mn) / 255)) AS err
        FROM q
    )
    SELECT vec_id,
           CAST(COUNT(*) AS INTEGER) AS n_dims,
           CAST(MIN(code) AS INTEGER) AS code_min,
           CAST(MAX(code) AS INTEGER) AS code_max,
           {dround('AVG(err)', 9)} AS mean_abs_err
    FROM r GROUP BY vec_id
    """,
)
def ext_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column (the SQ8 memory
    path of ANN indexes: 4x smaller vectors, distance on codes): trained
    per-dimension [min, max] bounds, each value encoded to an 8-bit code
    by floor((x-mn)/(mx-mn)*255 + 0.5), then per-vector reconstruction
    error reported — the quantizer's quality audit.

    Scale shape: training the quantizer is ONE aggregate over (dim) — at
    most d groups regardless of corpus size — broadcast back over the
    posexploded values; encode/decode are narrow arithmetic. All math is
    promoted to double on both engines (float32 -> float64 is exact), so
    codes are bit-identical; the error mean is rounded at 9 dp against
    summation-order noise."""
    emb = load(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    bounds = vals.groupBy("dim").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    rng = F.nullif(F.col("mx") - F.col("mn"), F.lit(0.0))
    code = F.least(
        F.greatest(
            F.floor((F.col("x") - F.col("mn")) / rng * 255 + 0.5).cast("int"),
            F.lit(0),
        ),
        F.lit(255),
    )
    q = vals.join(F.broadcast(bounds), "dim").select(
        "vec_id", "x", "mn", "mx", code.alias("code")
    )
    err = F.abs(
        F.col("x") - (F.col("mn") + F.col("code") * (F.col("mx") - F.col("mn")) / 255)
    )
    return (
        q.select("vec_id", "code", err.alias("err"))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_dims"),
            F.min("code").cast("int").alias("code_min"),
            F.max("code").cast("int").alias("code_max"),
            F.round(F.avg("err"), 9).alias("mean_abs_err"),
        )
    )


@register(
    "ext_curation_pipeline",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, text, {_TOKS_SQL} AS l FROM documents
    ), feat AS (
        SELECT doc_id, lang, text,
               len(l) AS n_tokens,
               CAST(list_sum(list_transform(l, x -> len(x))) AS DOUBLE)
                   / NULLIF(CAST(len(l) AS DOUBLE), 0) AS avg_len,
               CAST(len(list_filter(l, x -> lower(x) IN {_STOPWORDS_SQL})) AS DOUBLE)
                   / NULLIF(CAST(len(l) AS DOUBLE), 0) AS stop_ratio
        FROM toks
    ), scored AS (
        SELECT doc_id, lang, text, n_tokens, {dround(_SCORE_SQL, 2)} AS quality_score
        FROM feat
    ), cuts AS (
        SELECT lang, {dround(f'quantile_cont(quality_score, {QF_PCT})', 6)} AS cut
        FROM scored GROUP BY lang
    ), kept AS (
        SELECT s.* FROM scored s JOIN cuts c ON s.lang = c.lang
        WHERE s.quality_score >= c.cut
    ), deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY md5(lower(trim(text))) ORDER BY doc_id) AS rn
            FROM kept)
        WHERE rn = 1
    ), assigned AS (
        SELECT *,
               CASE WHEN CAST({_md5_32("'doc:' || CAST(doc_id AS VARCHAR)")} % 100 AS INTEGER) < 80
                         THEN 'train'
                    WHEN CAST({_md5_32("'doc:' || CAST(doc_id AS VARCHAR)")} % 100 AS INTEGER) < 90
                         THEN 'val'
                    ELSE 'test' END AS split
        FROM deduped
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           {dround('AVG(quality_score)', 6)} AS avg_quality
    FROM assigned GROUP BY split, lang
    """,
)
def ext_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone corpus-curation pipeline — the chained build a training-data
    user actually runs, composed from this library's own stages:
    per-language P30 quality filter -> exact near-identical dedup (keep
    lowest doc_id per normalized-text md5) -> deterministic hash-bucket
    train/val/test split -> per-(split, lang) corpus report (docs, tokens,
    mean quality).

    Scale shape, stage by stage: scoring is narrow; the percentile cut is
    a languages-sized aggregate broadcast back; dedup is ONE window over
    a 16-byte hash key (never the document text as shuffle key); split
    assignment is a local hash — no shuffle; the report aggregates to
    (splits x languages) rows. Two shuffles total for the whole pipeline,
    both on compact keys — at 100 TB the corpus streams through exactly
    twice."""
    docs = load(spark, sf_dir, "documents")
    scored = tx.quality_features(docs).select(
        "doc_id", "lang", "text", "n_tokens", "quality_score"
    )
    cuts = scored.groupBy("lang").agg(
        F.round(F.expr(f"percentile(quality_score, {QF_PCT})"), 6).alias("cut")
    )
    kept = (
        scored.join(F.broadcast(cuts), "lang")
        .filter(F.col("quality_score") >= F.col("cut"))
        .drop("cut")
    )
    dw = Window.partitionBy(
        F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    ).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(dw)).filter(F.col("rn") == 1).drop("rn")
    )
    bucket = F.pmod(
        _spark_md5_32(F.concat(F.lit("doc:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    ).cast("int")
    assigned = deduped.withColumn(
        "split",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"),
    )
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(F.avg("quality_score"), 6).alias("avg_quality"),
    )


CMS_D = 3      # sketch depth (independent hash rows)
CMS_W = 256    # sketch width (buckets per row)
CMS_TOPK = 20

_CMS_BUCKET_SQL = f"CAST({_md5_32(chr(39) + 'cms' + chr(39) + ' || CAST(i AS VARCHAR) || ' + chr(39) + ':' + chr(39) + ' || k')} % {CMS_W} AS INTEGER)"


@register(
    "ext_sketch_countmin",
    f"""
    WITH keyed AS (
        SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ), entries AS (
        SELECT i, {_CMS_BUCKET_SQL} AS bucket
        FROM keyed, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS i)
    ), sketch AS (
        SELECT i, bucket, COUNT(*) AS c FROM entries GROUP BY i, bucket
    ), exact AS (
        SELECT k, COUNT(*) AS exact_n FROM keyed GROUP BY k
    ), kb AS (
        SELECT k, exact_n, i, {_CMS_BUCKET_SQL} AS bucket
        FROM exact, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS i)
    ), est AS (
        SELECT k, exact_n, MIN(c) AS cms_est
        FROM kb JOIN sketch USING (i, bucket) GROUP BY k, exact_n
    )
    SELECT CAST(k AS BIGINT) AS user_id,
           CAST(exact_n AS BIGINT) AS exact_n,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_n AS BIGINT) AS overcount
    FROM est ORDER BY cms_est DESC, user_id LIMIT {CMS_TOPK}
    """,
)
def ext_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch as a DataFrame (heavy-hitter estimation): a
    {CMS_D}x{CMS_W} counter grid built by hashing every event's user into
    one bucket per hash row, point-estimated as the min across rows —
    reported for the top-{CMS_TOPK} estimated users next to their exact
    counts and the CMS's signature one-sided overcount.

    Unlike the opaque binary count_min_sketch() aggregate, this sketch IS
    a {CMS_D * CMS_W}-row table: mergeable across days by summing cells
    (same pattern as ext_sketch_merge's HLL rollup), queryable in SQL, and
    engine-portable — the md5-derived bucket hash makes it bit-identical
    in DuckDB, so the whole sketch is oracle-checked, not rows-only.

    Scale shape: the build is one groupBy over (row, bucket) — partial
    aggregation collapses the d-fold explode map-side, so the shuffle
    carries at most d*w counter rows per partition regardless of event
    count; the probe joins a broadcast sketch. Error bound (est - exact
    <= e*N/w with prob 1-(1/2)^d) is asserted in
    tests/test_approx_sketches.py."""
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(F.col("user_id").cast("string").alias("k"))
    bucket = F.pmod(
        _spark_md5_32(
            F.concat(F.lit("cms"), F.col("i").cast("string"), F.lit(":"), F.col("k"))
        ),
        F.lit(CMS_W),
    ).cast("int")
    rows_i = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("i")
    sketch = (
        keyed.select("k", rows_i)
        .select("i", bucket.alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact = keyed.groupBy("k").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select("k", "exact_n", rows_i).select(
        "k", "exact_n", "i", bucket.alias("bucket")
    )
    est = (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("k", "exact_n")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )
    return (
        est.select(
            F.col("k").cast("bigint").alias("user_id"),
            F.col("exact_n").cast("bigint").alias("exact_n"),
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("cms_est"), "user_id")
        .limit(CMS_TOPK)
    )


# ------------------------------------------------------- round-3 additions

LINEDEDUP_BLOCK = 8  # tokens per "line" block
LINEDEDUP_MAXDF = 4  # blocks in more docs than this are boilerplate


@register(
    "ext_text_line_dedup",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), blocks AS (
        SELECT doc_id,
               list_transform(
                   generate_series(0, CAST(CEIL(len(l) / {LINEDEDUP_BLOCK}.0) AS INTEGER) - 1),
                   i -> array_to_string(
                       list_slice(l, i * {LINEDEDUP_BLOCK} + 1, i * {LINEDEDUP_BLOCK} + {LINEDEDUP_BLOCK}), ' ')) AS bl
        FROM toks
    ), expl AS (
        SELECT doc_id, unnest(bl) AS block, generate_subscripts(bl, 1) AS pos
        FROM blocks
    ), hot AS (
        SELECT block FROM expl GROUP BY block
        HAVING COUNT(DISTINCT doc_id) > {LINEDEDUP_MAXDF}
    ), kept AS (
        SELECT doc_id, array_to_string(list(block ORDER BY pos), ' ') AS clean_text,
               COUNT(*) AS n_kept
        FROM expl ANTI JOIN hot USING (block)
        GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.bl) AS INTEGER) AS n_blocks,
           CAST(len(b.bl) - COALESCE(k.n_kept, 0) AS INTEGER) AS n_removed,
           COALESCE(k.clean_text, '') AS clean_text
    FROM blocks b LEFT JOIN kept k USING (doc_id)
    """,
)
def ext_text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate removal, the RefinedWeb/Gopher line-level
    dedup pass adapted to the corpus's single-line documents: split each
    document into consecutive {LINEDEDUP_BLOCK}-token blocks ("lines"),
    drop every block that occurs in more than {LINEDEDUP_MAXDF} distinct
    documents (headers, footers, license banners), and REWRITE the corpus
    from the surviving blocks in original order. Unlike the dedup pair
    detectors, this key mutates the text — the shape of an actual curation
    stage, not a report.

    Scale shape: one explode keyed by (block, doc) — the block table is the
    shuffle, sized by corpus tokens / {LINEDEDUP_BLOCK}; the hot-block list
    (df > {LINEDEDUP_MAXDF}) is tiny and BROADCAST anti-joined; the rewrite
    is one groupBy(doc_id) with an ordered collect_list — partitioned by
    document, never global. No pair join anywhere: boilerplate removal is
    frequency-based, so cost is linear in corpus size.
    """
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    nblocks = F.ceil(F.size("l") / F.lit(float(LINEDEDUP_BLOCK))).cast("int")
    # Guard the empty-token case explicitly: F.sequence(0, -1) defaults to
    # step -1 and yields [0, -1] (two phantom blocks) where DuckDB's
    # generate_series(0, -1) is empty — a zero-token document would
    # hash-diverge without this branch.
    block_list = F.when(
        F.size("l") > 0,
        F.transform(
            F.sequence(F.lit(0), nblocks - 1),
            lambda i: F.array_join(
                F.slice(F.col("l"), i * LINEDEDUP_BLOCK + 1, LINEDEDUP_BLOCK), " "
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    # blocks feeds three plan branches (hot-block df, kept re-aggregation,
    # final join) — checkpoint once so the tokenize+slice pipeline doesn't
    # re-run per branch
    blocks = (
        docs.select("doc_id", toks.alias("l"))
        .select("doc_id", block_list.alias("bl"))
        .localCheckpoint(eager=False)
    )
    expl = blocks.select(
        "doc_id", F.posexplode("bl").alias("pos0", "block")
    ).withColumn("pos", F.col("pos0") + 1)
    hot = (
        expl.groupBy("block")
        .agg(F.countDistinct("doc_id").alias("df_"))
        .filter(F.col("df_") > LINEDEDUP_MAXDF)
        .select("block")
    )
    kept = (
        expl.join(F.broadcast(hot), "block", "left_anti")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "block"))),
                    lambda r: r.getField("block"),
                ),
                " ",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        blocks.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.size("bl").alias("n_blocks"),
            (F.size("bl") - F.coalesce("n_kept", F.lit(0))).cast("int").alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


N_SHARDS = 8  # training shard fan-out


@register(
    "ext_data_shard",
    f"""
    WITH assigned AS (
        SELECT doc_id,
               {_md5_32("CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard_id,
               len({_TOKS_SQL}) AS n_tokens
        FROM documents
    )
    SELECT CAST(shard_id AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS docid_checksum,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM assigned GROUP BY shard_id
    """,
)
def ext_data_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment + per-shard manifest: every
    document hashes to one of {N_SHARDS} shards by md5(doc_id) — the
    shuffle-free, reproducible sharding a distributed training loader
    needs (same doc lands in the same shard on every run and engine,
    unlike a rand() or round-robin split). The manifest row per shard
    (doc/token counts, id checksum, id range) is what the loader validates
    before consuming a shard.

    Scale shape: assignment is a pure hash expression in the scan; the
    manifest is one {N_SHARDS}-group aggregate. The actual shard WRITE at
    production scale is df.write.partitionBy('shard_id') on this exact
    assignment column — demonstrated by sink_partition_overwrite; hash
    sharding also load-balances: shard skew is bounded by the hash, not by
    source ordering."""
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    assigned = docs.select(
        "doc_id",
        (_spark_md5_32(F.col("doc_id").cast("string")) % N_SHARDS).alias("shard_id"),
        F.size(toks).alias("n_tokens"),
    )
    return assigned.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("doc_id").cast("bigint").alias("docid_checksum"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


MAD_K = 3 * 1.4826  # the standard "3 sigma-equivalent" robust cut


@register(
    "ext_outlier_mad",
    f"""
    WITH med AS (
        SELECT event_type, {dround('quantile_cont(value, 0.5)', 6)} AS med
        FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med
        FROM events e JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, {dround('quantile_cont(abs(value - med), 0.5)', 6)} AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, d.value, d.med, m.mad
    FROM dev d JOIN mad m USING (event_type)
    WHERE abs(d.value - d.med) > {MAD_K} * m.mad
    """,
)
def ext_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per group: median absolute deviation, the
    estimator that (unlike mean/stddev z-scores) is not dragged by the
    outliers it is hunting. Flags events whose |value - median| exceeds
    3 x 1.4826 x MAD — the standard 3-sigma-equivalent robust cut used to
    quarantine corrupt numeric fields before training-data aggregation.

    Scale shape: two tiny per-group aggregates (rows == groups), each
    BROADCAST back over the fact scan; the fact table itself never
    re-shuffles. Median interpolation parity (Spark percentile ==
    DuckDB quantile_cont) is the same contract ext_quality_filter pins;
    both med and mad are 6-dp-rounded before the cut so membership is
    bit-identical."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    # r10: med and mad (rows == groups) are each consumed by two fact-side
    # branches — pinned so each percentile aggregate's fact scan runs once
    # (plan audit: events scanned 4x -> 3, the algorithmic floor: median
    # pass, MAD pass, flag pass)
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    ).localCheckpoint(eager=False)
    dev = ev.join(F.broadcast(med), "event_type")
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad")
    ).localCheckpoint(eager=False)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.abs(F.col("value") - F.col("med")) > MAD_K * F.col("mad"))
        .select("event_id", "event_type", "value", "med", "mad")
    )


BIGRAM_TOPK = 3
BIGRAM_MIN_W1 = 100


@register(
    "ext_text_bigram_lm",
    f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), big AS (
        SELECT l[i] AS w1, l[i+1] AS w2
        FROM toks, unnest(generate_series(1, len(l) - 1)) AS t(i)
    ), c AS (
        SELECT w1, w2, COUNT(*) AS n_pair FROM big GROUP BY 1, 2
    ), tot AS (
        SELECT w1, SUM(n_pair) AS n_w1 FROM c GROUP BY 1
    ), ranked AS (
        SELECT c.w1, c.w2, c.n_pair, tot.n_w1,
               ROW_NUMBER() OVER (PARTITION BY c.w1 ORDER BY c.n_pair DESC, c.w2) AS rk
        FROM c JOIN tot USING (w1)
    )
    SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair, CAST(n_w1 AS BIGINT) AS n_w1,
           CAST(rk AS INTEGER) AS rk,
           {dround('CAST(n_pair AS DOUBLE) / CAST(n_w1 AS DOUBLE)', 6)} AS p_cond
    FROM ranked WHERE rk <= {BIGRAM_TOPK} AND n_w1 >= {BIGRAM_MIN_W1}
    """,
)
def ext_text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics: for every frequent unigram
    (>= {BIGRAM_MIN_W1} occurrences as a bigram head), the top-{BIGRAM_TOPK}
    continuations with conditional probability P(w2|w1) — the count table
    a KenLM-style n-gram model, a contamination heuristic, or a
    next-token-entropy quality score is built from (ext_text_unigram_xent's
    bigram sibling; ext_text_bpe_pairs counts CHARACTER pairs, this one
    counts token transitions).

    Scale shape: explode to token transitions, ONE (w1, w2) hash aggregate
    (the shuffle, keyed by word pair), then head totals as a second tiny
    aggregate joined back; the ranking window partitions by w1 — vocabulary-
    sized, never corpus-sized. Zipf skew in w1 is absorbed by the two-level
    aggregate: partial map-side combines collapse hot heads before the
    shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    sized = docs.select(toks.alias("l"), F.size(toks).alias("n")).filter(
        F.col("n") >= 2
    )
    big = sized.withColumn(
        "i", F.explode(F.sequence(F.lit(1), F.col("n") - 1))
    ).select(
        F.element_at("l", F.col("i")).alias("w1"),
        F.element_at("l", F.col("i") + 1).alias("w2"),
    )
    c = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    tot = c.groupBy("w1").agg(F.sum("n_pair").alias("n_w1"))
    w = Window.partitionBy("w1").orderBy(F.desc("n_pair"), "w2")
    return (
        c.join(F.broadcast(tot.filter(F.col("n_w1") >= BIGRAM_MIN_W1)), "w1")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= BIGRAM_TOPK)
        .select(
            "w1", "w2", "n_pair", "n_w1", "rk",
            F.round(
                F.col("n_pair").cast("double") / F.col("n_w1").cast("double"), 6
            ).alias("p_cond"),
        )
    )


WINNOW_K = 4  # k-gram width (tokens)
WINNOW_W = 4  # winnowing window (consecutive k-gram hashes)
WINNOW_MIN_SHARED = 3
WINNOW_MAXDF = 16  # fingerprints in more docs are boilerplate — capped


def _winnow_oracle() -> str:
    nib = _md5_32("gram")
    return f"""
    WITH toks AS (
        SELECT doc_id, {_TOKS_SQL} AS l FROM documents
    ), grams AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(l, i, i + {WINNOW_K - 1}), ' ') AS gram
        FROM toks, unnest(generate_series(1, len(l) - {WINNOW_K - 1})) AS t(i)
    ), h AS (
        SELECT doc_id, pos, CAST({nib} AS BIGINT) AS hv FROM grams
    ), wmin AS (
        SELECT doc_id,
               MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS sel,
               COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS wn
        FROM h
    ), fp AS (
        SELECT DISTINCT doc_id, sel FROM wmin WHERE wn = {WINNOW_W}
    ), hot AS (
        SELECT sel FROM fp GROUP BY sel HAVING COUNT(*) > {WINNOW_MAXDF}
    ), capped AS (
        SELECT doc_id, sel FROM fp ANTI JOIN hot USING (sel)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
    FROM capped a JOIN capped b ON a.sel = b.sel AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    """


@register("ext_text_winnowing", _winnow_oracle())
def ext_text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every {WINNOW_K}-token gram, slide a window of
    {WINNOW_W} consecutive hashes keeping each window's minimum, and
    report document pairs sharing >= {WINNOW_MIN_SHARED} selected
    fingerprints. Winnowing GUARANTEES a shared run of
    {WINNOW_K + WINNOW_W - 1}+ tokens yields a shared fingerprint (the
    local-min selection is position-robust, unlike fixed-stride
    sampling), at a ~2/(w+1) sampling rate — the plagiarism/near-dup
    detector that catches REORDERED boilerplate MinHash's global
    signature dilutes away.

    Scale shape: gram hashing, the sliding window minima AND the
    per-document fingerprint dedup all run IN-ROW (transform over the
    token array, array_min over each W-slice of the bound hash array,
    array_distinct), so the token stream is never exploded into a
    doc-partitioned window shuffle and the (doc, fingerprint) distinct
    never happens — the first shuffle in the plan is already the
    fingerprint df aggregate at the ~2/(w+1) sampling rate; the pair
    join is an equi-join on the 8-byte fingerprint with the same
    stop-fingerprint df-cap as the Jaccard key (df > {WINNOW_MAXDF}
    excluded), bounding candidates at sum(min(df,cap)^2) — no all-pairs,
    no hot-key blowup. The md5-derived hash makes the whole selection
    bit-identical across engines, so even the window minima are
    hash-checked."""
    from ..sources.readers import spread

    docs = load(spark, sf_dir, "documents")
    toks = tx.tokens(F.col("text"))
    # only docs with at least one FULL window of W k-gram hashes survive
    # (the row-frame formulation dropped partial windows via wn == W)
    sized = spread(
        docs.select("doc_id", toks.alias("l"), F.size(toks).alias("n"))
    ).filter(F.col("n") >= WINNOW_K + WINNOW_W - 1)
    hvs = F.transform(
        F.sequence(F.lit(1), F.col("n") - (WINNOW_K - 1)),
        lambda pos: _spark_md5_32(
            F.array_join(F.slice(F.col("l"), pos, WINNOW_K), " ")
        ),
    )
    # TWO projections on purpose: "hvs" must be a bound column before the
    # window transform references it W times per element — CollapseProject
    # keeps the boundary for non-cheap multiply-referenced expressions, so
    # the gram-hash array evaluates once per document, not once per window
    hashed = sized.select("doc_id", F.col("n"), hvs.alias("hvs"))
    sels = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1), F.col("n") - (WINNOW_K - 1) - (WINNOW_W - 1)
            ),
            lambda i: F.array_min(F.slice(F.col("hvs"), i, WINNOW_W)),
        )
    )
    # fp feeds the df aggregate and BOTH self-join sides — checkpoint so
    # the in-row fingerprint pipeline runs once, not per branch
    fp = (
        hashed.select("doc_id", F.explode(sels).alias("sel"))
        .localCheckpoint(eager=False)
    )
    hot = (
        fp.groupBy("sel")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") > WINNOW_MAXDF)
        .select("sel")
    )
    capped = fp.join(F.broadcast(hot), "sel", "left_anti")
    a = capped.select(F.col("doc_id").alias("doc_a"), "sel")
    b = capped.select(F.col("doc_id").alias("doc_b"), "sel")
    return (
        a.join(b, "sel")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
