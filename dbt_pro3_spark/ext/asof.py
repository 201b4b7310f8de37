"""As-of (most-recent-at-or-before) join.

The reference has no temporal joins (SURVEY.md §2.D: all joins are
equi-joins), but a training-data/event pipeline needs them constantly —
"attach the latest prior X to each Y". Spark has no native ASOF JOIN, so
this implements it Spark-first as a union + sorted carry-forward window:

    tag right rows 0 / left rows 1
    -> unionByName
    -> Window PARTITION BY key ORDER BY (ts, side, tiebreak)
       last(right_payload, ignorenulls=True) carried forward
    -> keep left rows

Cost model at 100 TB: ONE shuffle on the partition key (same as any equi
join on that key) and a per-partition sort — no range explosion, no
per-row probe, no broadcast requirement on either side. This is the same
sort-merge formulation Flink's temporal join and kdb's aj use; a
range-bucketed join would duplicate right rows per bucket and still need
a per-group max, strictly worse.

Tie semantics: a right row at exactly the left row's timestamp matches
(inclusive, `right.ts <= left.ts`); among right rows with identical
(key, ts) the one with the greatest `right_tiebreak` wins, making the
result deterministic (mirrors an oracle-side MAX() pre-dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, attach `right_payload` from
    the right row with the greatest `right_ts` <= `left_ts` within the same
    `on` group (NULLs if no prior right row — left-outer semantics).

    The payload is carried as ONE struct so a NULL inside a payload column
    never falls through to an older right row.
    """
    lpay = [c for c in left.columns if c != on]
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_payload])
    struct_type = right.select(r_struct.alias("_r")).schema[0].dataType

    l_rows = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lpay],
        F.lit(None).cast(struct_type).alias("_r"),
    )
    tb = F.col(right_tiebreak).cast("long") if right_tiebreak else F.lit(0).cast("long")
    r_rows = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        tb.alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        r_struct.alias("_r"),
    )

    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_rows.unionByName(r_rows)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return carried.select(
        F.col(on),
        *[F.col(c) for c in lpay],
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
    )
