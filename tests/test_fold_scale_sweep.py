"""Doubled-rows sweep for the sequential-fold keys (VERDICT r6 item 7).

The varchar-state fold keys (Viterbi, Kalman, Holt-Winters, DTW,
Markov-absorption) claim a bounded-grid collapse: the corpus aggregates to
a ~30-element day grid BEFORE any sequential DP runs, so the fold cost is
O(grid), never O(rows). This sweep doubles the RAW row count of their
input tables (every event/order plus an id-shifted clone on the same days)
and asserts:

1. the day grid is UNCHANGED — the fold input did not grow with rows, and
2. strict driver-grade parity still holds against the DuckDB oracle on the
   doubled data (the totals double, the grid doesn't; both engines see the
   identical new parquet).

Together these pin the collapse claim as raw rows scale past sf0.1 —
an accidental O(rows) fold (e.g. folding per-event instead of per-day)
would show up as a grid-cardinality change or a blown-up runtime here.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from dbt_pro3_spark.queries import all_oracle, all_queries

from .parity import compare

SRC = "/root/testdata/sf0.1"
DOUBLED = ["events", "orders", "documents"]
FOLD_KEYS = [
    "ext_hmm_viterbi",
    "ext_kalman_filter",
    "ext_holt_winters",
    "ext_dtw_distance",
    "ext_markov_absorption",
]
# The dedup family on the doubled documents table: every document gains an
# id-shifted EXACT clone, so the corpus becomes maximally duplicate-dense —
# the regime where banding bugs square inside hot buckets and keep-lowest-id
# tie logic is exercised on every row. Parity against the oracle on the
# doubled corpus pins that the blocking/banding stages stay correct there.
DEDUP_KEYS = [
    "ext_dedup_exact",
    "ext_dedup_minhash_banded",
    "ext_dedup_simhash",
    "ext_dedup_ngram_jaccard",
    "ext_dedup_prefix_filter",
]
ID_SHIFT = 100_000_000  # clone ids stay unique and sort after originals


@pytest.fixture(scope="module")
def sf2x_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf0.2x")
    con = duckdb.connect()
    id_cols = {"events": "event_id", "orders": "o_orderkey", "documents": "doc_id"}
    for t in DOUBLED:
        src = f"{SRC}/{t}.parquet"
        idc = id_cols[t]
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}')"
        ).fetchall()]
        clone = ", ".join(
            f"{c} + {ID_SHIFT} AS {c}" if c == idc else c for c in cols
        )
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}') "
            f"UNION ALL SELECT {clone} FROM read_parquet('{src}')) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem", "embeddings"]:
        os.symlink(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def duck2x(sf2x_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf2x_dir}/{t}.parquet')"
        )
    return con


def test_doubling_preserves_the_day_grid(sf2x_dir):
    con = duckdb.connect()
    for t in ["events", "orders"]:
        n, days = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT CAST({'ts' if t == 'events' else 'o_orderdate'} AS DATE)) "
            f"FROM read_parquet('{sf2x_dir}/{t}.parquet')"
        ).fetchone()
        n0, days0 = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT CAST({'ts' if t == 'events' else 'o_orderdate'} AS DATE)) "
            f"FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()
        assert n == 2 * n0, t
        assert days == days0, f"{t}: fold-input grid grew with raw rows"


@pytest.mark.parametrize("name", FOLD_KEYS)
def test_fold_parity_at_doubled_rows(spark, sf2x_dir, duck2x, name):
    df = all_queries()[name](spark, sf2x_dir)
    errs = compare(df, duck2x, all_oracle()[name], name)
    assert not errs, "\n".join(errs)


@pytest.mark.parametrize("name", DEDUP_KEYS)
def test_dedup_parity_on_duplicate_dense_corpus(spark, sf2x_dir, duck2x, name):
    df = all_queries()[name](spark, sf2x_dir)
    errs = compare(df, duck2x, all_oracle()[name], name)
    assert not errs, "\n".join(errs)


def test_exact_dedup_sees_every_clone(spark, sf2x_dir):
    """Sanity anchor for the doubled corpus: every content group now has
    >= 2 members (each document gained an exact clone), every kept_id is
    an ORIGINAL id (MIN picks the un-shifted one), and the group count
    equals the original corpus's distinct-content count."""
    from pyspark.sql import functions as F

    df = all_queries()["ext_dedup_exact"](spark, sf2x_dir)
    row = df.agg(
        F.min("dup_count").alias("min_copies"),
        F.max("kept_id").alias("max_kept"),
        F.count(F.lit(1)).alias("n_groups"),
    ).collect()[0]
    assert row["min_copies"] >= 2
    assert row["max_kept"] < ID_SHIFT, "a clone id won a keep decision"
    n_orig_groups = (
        duckdb.connect()
        .execute(
            f"SELECT COUNT(DISTINCT md5(lower(trim(text)))) "
            f"FROM read_parquet('{SRC}/documents.parquet')"
        )
        .fetchone()[0]
    )
    assert row["n_groups"] == n_orig_groups


# ---------------------------------------------------------------------------
# Duplicate-row invariance for the graph family (round-7 adjacency rewrites)
# ---------------------------------------------------------------------------

# Keys whose first stage is a distinct/set collapse over lineitem: cloning
# every lineitem ROW VERBATIM (same orderkey — a duplicated fact feed, the
# classic at-least-once ingestion artifact) must leave the result
# IDENTICAL, because baskets collect to distinct part sets before any pair
# or hop math. An accidental count-sensitive stage (e.g. swapping
# collect_set for collect_list, or counting support off raw rows) breaks
# equality here immediately.
GRAPH_INVARIANT_KEYS = [
    "ext_graph_bfs_reach",
    "ext_graph_assortativity",
    "ext_graph_link_predict",
    "ext_seq_basket_pairs",
]


@pytest.fixture(scope="module")
def li2x_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("li2x")
    con = duckdb.connect()
    src = f"{SRC}/lineitem.parquet"
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{src}') "
        f"UNION ALL SELECT * FROM read_parquet('{src}')) "
        f"TO '{d}/lineitem.parquet' (FORMAT PARQUET)"
    )
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "events", "documents", "embeddings"]:
        os.symlink(f"{SRC}/{t}.parquet", f"{d}/{t}.parquet")
    return str(d)


@pytest.mark.parametrize("name", GRAPH_INVARIANT_KEYS)
def test_graph_keys_invariant_under_duplicated_lineitem(spark, li2x_dir, name):
    q = all_queries()[name]
    base = {tuple(r) for r in q(spark, SRC).collect()}
    doubled = {tuple(r) for r in q(spark, li2x_dir).collect()}
    assert base == doubled, f"{name} is sensitive to duplicated fact rows"
