"""Connected-components clustering vs an independent union-find."""

from __future__ import annotations

from dbt_pro3_spark.ext.cluster import connected_components, dedup_keep_representative


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per component
    return {n: find(n) for n in nodes}


def test_components_match_union_find(spark):
    edges = [
        (1, 2), (2, 3), (3, 4),          # chain -> component 1
        (10, 11), (11, 10),              # duplicate/reversed edges
        (20, 21), (22, 21),              # star -> component 20
        (30, 31), (32, 33), (31, 32),    # merged late -> component 30
    ]
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    nodes = {n for e in edges for n in e}
    want_raw = _union_find(edges, nodes)
    # normalize union-find to min-id labels (path compression keeps min
    # because we always parent toward the smaller root)
    assert got == want_raw


def test_dedup_keep_representative(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id bigint")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], "doc_a bigint, doc_b bigint")
    out = {r.doc_id: (r.representative_id, r.is_kept) for r in
           dedup_keep_representative(docs, pairs).collect()}
    assert out[1] == (1, 1) and out[3] == (1, 0) and out[5] == (1, 0)
    assert out[6] == (6, 1) and out[7] == (6, 0)
    # untouched docs keep themselves
    assert out[0] == (0, 1) and out[2] == (2, 1) and out[4] == (4, 1)


def test_pagerank_matches_numpy(spark):
    """5-iteration DataFrame PageRank must match a numpy power iteration on
    the same edge list to float tolerance."""
    import numpy as np

    from dbt_pro3_spark.ext.cluster import pagerank

    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (0, 5), (5, 6), (6, 0)]
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {r["node"]: r["rank"] for r in pagerank(pairs).collect()}

    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({x for e in und for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in und:
        deg[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(5):
        nxt = np.full(n, 0.15 / n)
        for u, v in und:
            nxt[idx[v]] += 0.85 * r[idx[u]] / deg[idx[u]]
        r = nxt
    for node in nodes:
        assert abs(got[node] - r[idx[node]]) < 1e-6, (node, got[node], r[idx[node]])
