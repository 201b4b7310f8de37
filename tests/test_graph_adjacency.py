"""Unit proofs for ext/graph.py:adjacency_sets — the per-node
neighbor-array adjacency the r7 graph rewrites (BFS, link-predict,
assortativity) hop through instead of a flat edge list."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbt_pro3_spark.ext.graph import adjacency_sets, order_part_pairs


def _li(spark, rows):
    return spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])


def test_adjacency_matches_edge_list(spark):
    # two overlapping baskets + a duplicate line that must not double-edge
    li = _li(
        spark,
        [(1, 10), (1, 20), (1, 30), (2, 20), (2, 30), (2, 40), (2, 20)],
    )
    adj = {r["node"]: r["nbrs"] for r in adjacency_sets(li).collect()}
    # ground truth from the (already unit-proven) distinct pair builder
    edges = order_part_pairs(li).collect()
    want: dict[int, set[int]] = {}
    for e in edges:
        want.setdefault(e["u"], set()).add(e["v"])
        want.setdefault(e["v"], set()).add(e["u"])
    assert set(adj) == set(want)
    for node, nbrs in adj.items():
        assert nbrs == sorted(want[node]), node  # sorted AND deduped
        assert node not in nbrs  # no self-loop


def test_adjacency_arrays_are_sorted_distinct(spark):
    # a part co-purchased with the same partner in MANY orders appears once
    li = _li(spark, [(o, p) for o in range(1, 6) for p in (7, 3, 9)])
    adj = {r["node"]: r["nbrs"] for r in adjacency_sets(li).collect()}
    assert adj == {3: [7, 9], 7: [3, 9], 9: [3, 7]}


def test_single_part_orders_yield_no_nodes(spark):
    # an order with one part has no pairs; the node must not appear
    li = _li(spark, [(1, 10), (2, 20), (2, 30)])
    adj = {r["node"]: r["nbrs"] for r in adjacency_sets(li).collect()}
    assert adj == {20: [30], 30: [20]}
