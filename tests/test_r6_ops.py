"""Algorithmic reference tests for the round-6 sequential-DP / numeric
operators: the oracle-parity suite proves Spark == DuckDB, but both sides
share my recurrence templates — these tests pin the recurrences against
INDEPENDENT plain-Python implementations (numpy/stdlib), so a shared
template bug cannot hide behind parity.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"


def _daily_series(duck, types):
    rows = duck.execute(
        f"""
        WITH ev AS (
            SELECT CAST(ts AS DATE) AS dd, event_type,
                   CAST(ROUND(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type IN ({", ".join(f"'{t}'" for t in types)})
        ), days AS (SELECT DISTINCT dd FROM ev)
        SELECT days.dd,
               {", ".join(
                   f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}'"
                   f" THEN cents END), 0) AS BIGINT) AS v{i}"
                   for i, t in enumerate(types)
               )}
        FROM days LEFT JOIN ev ON ev.dd = days.dd
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return [[r[i + 1] for r in rows] for i in range(len(types))]


def test_dtw_matches_reference_dp(spark, duck):
    from dbt_pro3_spark.queries import all_queries

    a, b = _daily_series(duck, ["click", "purchase"])
    n, m = len(a), len(b)
    inf = float("inf")
    dp = [[inf] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(a[i - 1] - b[j - 1])
            dp[i][j] = c + min(dp[i - 1][j - 1], dp[i - 1][j], dp[i][j - 1])
    row = all_queries()["ext_dtw_distance"](spark, SF_DIR).collect()[0]
    assert row["dtw_cents"] == dp[n][m]
    assert row["lockstep_cents"] == sum(abs(x - y) for x, y in zip(a, b))


def test_nw_alignment_matches_reference_dp(spark, duck):
    from dbt_pro3_spark.queries import all_queries
    from dbt_pro3_spark.queries.r6b_ops import NW_GAP, NW_LEN, NW_MATCH, NW_MISMATCH

    users = duck.execute(
        """
        SELECT user_id FROM events GROUP BY 1
        ORDER BY COUNT(*) DESC, user_id LIMIT 2
        """
    ).fetchall()
    seqs = []
    for (uid,) in users:
        rows = duck.execute(
            f"""
            SELECT substr(event_type, 1, 1) FROM events
            WHERE user_id = {uid} ORDER BY ts, event_id LIMIT {NW_LEN}
            """
        ).fetchall()
        seqs.append("".join(r[0] for r in rows))
    A, B = seqs
    n, m = len(A), len(B)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for j in range(m + 1):
        dp[0][j] = NW_GAP * j
    for i in range(1, n + 1):
        dp[i][0] = NW_GAP * i
        for j in range(1, m + 1):
            s = NW_MATCH if A[i - 1] == B[j - 1] else NW_MISMATCH
            dp[i][j] = max(
                dp[i - 1][j - 1] + s, dp[i - 1][j] + NW_GAP, dp[i][j - 1] + NW_GAP
            )
    row = all_queries()["ext_seq_alignment"](spark, SF_DIR).collect()[0]
    assert row["nw_score"] == dp[n][m]
    assert (row["user_a"], row["user_b"]) == (users[0][0], users[1][0])


def test_viterbi_matches_reference(spark, duck):
    from dbt_pro3_spark.queries import all_queries
    from dbt_pro3_spark.queries.r6b_ops import HMM

    # FULL daily totals (all types) and the exact median split
    rows = duck.execute(
        """
        WITH ev AS (SELECT CAST(ts AS DATE) AS dd,
                           CAST(ROUND(value * 100) AS BIGINT) AS cents
                    FROM events)
        SELECT dd, CAST(SUM(cents) AS BIGINT) FROM ev GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    totals = [r[1] for r in rows]
    srt = sorted(totals)
    n = len(srt)
    med_x2 = srt[(n + 1) // 2 - 1] + srt[(n + 2) // 2 - 1]
    obs = [1 if 2 * t > med_x2 else 0 for t in totals]
    h = HMM
    v0, v1, p0, p1 = h["pi0"], h["pi1"], "", ""
    for o in obs:
        b0 = h["b0h"] if o == 1 else h["b0l"]
        b1 = h["b1h"] if o == 1 else h["b1l"]
        c0 = max(v0 * h["a00"], v1 * h["a10"]) * b0
        c1 = max(v0 * h["a01"], v1 * h["a11"]) * b1
        np0 = (p0 if v0 * h["a00"] >= v1 * h["a10"] else p1) + "0"
        np1 = (p0 if v0 * h["a01"] >= v1 * h["a11"] else p1) + "1"
        t = c0 + c1
        v0, v1, p0, p1 = c0 / t, c1 / t, np0, np1
    row = all_queries()["ext_hmm_viterbi"](spark, SF_DIR).collect()[0]
    assert row["viterbi_path"] == (p0 if v0 >= v1 else p1)
    assert row["ml_final_state"] == (0 if v0 >= v1 else 1)
    assert abs(row["ml_prob_norm"] - max(v0, v1)) < 1e-6


def test_markov_absorption_matches_numpy(spark, duck):
    import numpy as np

    from dbt_pro3_spark.queries import all_queries
    from dbt_pro3_spark.queries.r6_ops import MA_TRANSIENT

    tr = duck.execute(
        """
        WITH seq AS (
            SELECT user_id, event_type AS src,
                   LEAD(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS dst
            FROM events
        )
        SELECT src, dst, COUNT(*) FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
        """
    ).fetchall()
    c = {(s, d): n for s, d, n in tr}
    ts_ = MA_TRANSIENT
    # row totals over ALL observed destinations from i
    d = {i: sum(n for (s, _), n in c.items() if s == i) for i in ts_}
    Q = np.array([[c.get((i, j), 0) / d[i] for j in ts_] for i in ts_])
    t = np.linalg.solve(np.eye(4) - Q, np.ones(4))
    got = {
        r["state"]: r["expected_steps"]
        for r in all_queries()["ext_markov_absorption"](spark, SF_DIR).collect()
    }
    for idx, s in enumerate(ts_):
        assert got[s] == pytest.approx(t[idx], abs=1e-5)


def test_kalman_matches_reference(spark, duck):
    import math

    from dbt_pro3_spark.queries import all_queries
    from dbt_pro3_spark.queries.r6b_ops import KF_P0, KF_Q, KF_R

    rows = duck.execute(
        """
        SELECT date_trunc('month', o_orderdate) AS mth,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) // 100000
                   AS BIGINT) AS y
        FROM orders GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    ys = [r[1] for r in rows]
    x, p, sse = float(ys[0]), KF_P0, 0.0
    for y in ys[1:]:
        pp = p + KF_Q
        kg = pp / (pp + KF_R)
        innov = y - x
        x, p, sse = x + kg * innov, (1.0 - kg) * pp, sse + innov * innov
    row = all_queries()["ext_kalman_filter"](spark, SF_DIR).collect()[0]
    assert row["level_final"] == pytest.approx(x, abs=1e-3)
    assert row["rmse_innovation"] == pytest.approx(
        math.sqrt(sse / (len(ys) - 1)), abs=1e-3
    )


def test_holt_winters_matches_reference(spark, duck):
    import math

    from dbt_pro3_spark.queries import all_queries
    from dbt_pro3_spark.queries.r6b_ops import HW_ALPHA, HW_BETA, HW_GAMMA, HW_M

    rows = duck.execute(
        """
        SELECT CAST(ts AS DATE) AS dd,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) // 100
        FROM events GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    ys = [float(r[1]) for r in rows]
    lvl = sum(ys[:HW_M]) / HW_M
    tr = (sum(ys[HW_M : 2 * HW_M]) / HW_M - sum(ys[:HW_M]) / HW_M) / HW_M
    seas = [ys[i] - lvl for i in range(HW_M)]
    sse = 0.0
    for k in range(HW_M, len(ys)):
        idx = k % HW_M
        y = ys[k]
        innov = y - (lvl + tr + seas[idx])
        l_new = HW_ALPHA * (y - seas[idx]) + (1.0 - HW_ALPHA) * (lvl + tr)
        tr = HW_BETA * (l_new - lvl) + (1.0 - HW_BETA) * tr
        seas[idx] = HW_GAMMA * (y - l_new) + (1.0 - HW_GAMMA) * seas[idx]
        lvl = l_new
        sse += innov * innov
    row = all_queries()["ext_holt_winters"](spark, SF_DIR).collect()[0]
    assert row["level_final"] == pytest.approx(lvl, abs=1e-3)
    assert row["trend_final"] == pytest.approx(tr, abs=1e-3)
    assert row["season_min"] == pytest.approx(min(seas), abs=1e-3)
    assert row["rmse_innovation"] == pytest.approx(
        math.sqrt(sse / (len(ys) - HW_M)), abs=1e-3
    )
