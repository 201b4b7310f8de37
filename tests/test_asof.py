"""asof_join edge-case semantics on a hand-built frame."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dbt_pro3_spark.ext.asof import asof_join


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_edge_cases(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),  # before any right row
            (1, _ts("2024-01-01T12:00:00"), 101),  # exact tie with right ts
            (1, _ts("2024-01-01T13:00:00"), 102),  # between right rows
            (1, _ts("2024-01-01T23:00:00"), 103),  # after all right rows
            (9, _ts("2024-01-01T12:00:00"), 104),  # key with no right rows
        ],
        "k int, lts timestamp, lid int",
    ).select("k", "lts", "lid")
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T12:00:00"), 7),
            (1, _ts("2024-01-01T12:00:00"), 9),   # tie: max rid must win
            (1, _ts("2024-01-01T12:30:00"), 11),
            (1, _ts("2024-01-01T14:00:00"), 13),
        ],
        "k int, rts timestamp, rid int",
    )
    out = asof_join(
        left.withColumnRenamed("k", "k"),
        right,
        on="k",
        left_ts="lts",
        right_ts="rts",
        right_payload=["rid", "rts"],
        right_tiebreak="rid",
    )
    got = {r["lid"]: (r["rid"], r["rts"]) for r in out.collect()}
    assert got[100] == (None, None)                       # no prior right row
    assert got[101] == (9, _ts("2024-01-01T12:00:00"))    # inclusive + max tiebreak
    assert got[102] == (11, _ts("2024-01-01T12:30:00"))   # most recent prior
    assert got[103] == (13, _ts("2024-01-01T14:00:00"))   # latest overall
    assert got[104] == (None, None)                       # key absent on right
    assert out.count() == 5                               # left-outer: all rows kept


def test_asof_null_payload_is_atomic(spark):
    """A right row with a NULL payload column must NOT fall through to an
    older right row's value (the struct carry is atomic)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T15:00:00"), 1)], "k int, lts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 5, "old"),
            (1, _ts("2024-01-01T14:00:00"), 6, None),  # newest, NULL tag
        ],
        "k int, rts timestamp, rid int, tag string",
    )
    row = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["rid", "tag"], right_tiebreak="rid",
    ).collect()[0]
    assert row["rid"] == 6 and row["tag"] is None


def test_asof_plan_single_shuffle(spark):
    """The physical plan must be union -> ONE exchange on the key -> sort ->
    window: no join operator, no range explosion."""
    import contextlib
    import io

    left = spark.range(10).select(
        (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id") * 60).alias("lts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(10).select(
        (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id") * 45).alias("rts"),
        F.col("id").alias("rid"),
    )
    df = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["rid"], right_tiebreak="rid",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan and "CartesianProduct" not in plan
    # one Exchange node in the numbered-node detail section
    assert plan.count(") Exchange") == 1, plan


def test_asof_matches_pandas_merge_asof(spark):
    """Property check: on randomized (key, ts) sets the union+carry-forward
    formulation must agree with pandas.merge_asof (direction='backward',
    allow_exact_matches=True) after resolving ties to the max tiebreak."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    for trial in range(3):
        n_l, n_r = 200, 150
        lpd = pd.DataFrame(
            {
                "k": rng.randint(0, 8, n_l),
                "lts": rng.randint(0, 5000, n_l).astype("datetime64[s]"),
                "lid": np.arange(n_l),
            }
        )
        rpd = pd.DataFrame(
            {
                "k": rng.randint(0, 8, n_r),
                "rts": rng.randint(0, 5000, n_r).astype("datetime64[s]"),
                "rid": np.arange(n_r),
            }
        )
        # pandas tie-handling: merge_asof keeps the LAST right row among
        # equal (k, rts); sorting by (rts, rid) makes that the max rid —
        # the same winner asof_join's max-tiebreak picks
        ref = pd.merge_asof(
            lpd.sort_values(["lts", "lid"]),
            rpd.sort_values(["rts", "rid"]),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        expected = {
            int(r.lid): (None if pd.isna(r.rid) else int(r.rid)) for r in ref.itertuples()
        }
        out = asof_join(
            spark.createDataFrame(lpd),
            spark.createDataFrame(rpd),
            on="k",
            left_ts="lts",
            right_ts="rts",
            right_payload=["rid", "rts"],
            right_tiebreak="rid",
        ).collect()
        got = {r["lid"]: (None if r["rid"] is None else int(r["rid"])) for r in out}
        assert got == expected, f"trial {trial}: asof_join deviates from merge_asof"
