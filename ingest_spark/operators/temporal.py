"""Temporal joins — the as-of join Spark's built-ins lack.

``asof_join(left, right, on, by)``: for every left row, attach the most
recent right row with ``right.on <= left.on`` within the same ``by``
key (backward-inclusive, the market-data/telemetry enrichment join).

Plan shape (the 100 TB consideration): ONE shuffle. Both sides are
tagged and unioned, then a single window pass per ``by`` key carries
the latest right payload forward (`last(..., ignorenulls=True)` over
rows UNBOUNDED PRECEDING..CURRENT, right rows ordered before left rows
at equal timestamps so ties match inclusively). No range explode, no
per-key driver loop, no join at all — the sort-based window is the
whole operator, so skew behaves exactly like any keyed window
(hot keys can be pre-split upstream if needed).

Determinism: right rows must be unique per (by, on) — duplicate
timestamps within a key would make "the" latest row ambiguous in ANY
engine (DuckDB's ASOF JOIN has the same precondition). Callers
aggregate first (the contract query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: "str | list[str] | None" = None,
    tolerance_sec: "int | None" = None,
) -> DataFrame:
    """Backward-inclusive as-of join (left join semantics: unmatched
    left rows keep null right columns). ``tolerance_sec`` optionally
    voids matches older than the given horizon (timestamp ``on`` only).
    Right payload column names must not collide with left's."""
    by_cols = [by] if isinstance(by, str) else list(by or [])
    lcols = [c for c in left.columns if c not in by_cols + [on]]
    rcols = [c for c in right.columns if c not in by_cols + [on]]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")

    l2 = left.select(
        *by_cols, on, F.lit(1).alias("_is_l"), *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rcols],
    )
    r2 = right.select(
        *by_cols, on, F.lit(0).alias("_is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *rcols,
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("_is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.when(F.col("_is_l") == 0, F.col(c)), ignorenulls=True)
        .over(w)
        .alias(c)
        for c in rcols
    ]
    matched_on = F.last(
        F.when(F.col("_is_l") == 0, F.col(on)), ignorenulls=True
    ).over(w)
    out = u.select(*by_cols, on, "_is_l", *lcols, *carried, matched_on.alias("_m_on"))
    out = out.where(F.col("_is_l") == 1).drop("_is_l")
    if tolerance_sec is not None:
        stale = (
            F.unix_timestamp(F.col(on)) - F.unix_timestamp(F.col("_m_on"))
        ) > tolerance_sec
        for c in rcols:
            out = out.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
    return out.drop("_m_on").select(*by_cols, on, *lcols, *rcols)


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: "str | list[str] | None" = None,
    bucket_sec: int = 3600,
) -> DataFrame:
    """Fact-to-interval join (``start <= ts <= end``, optionally within
    a ``by`` key) — the 1-D analog of the grid PIP join.

    A naive non-equi join plans as a nested-loop at scale; here both
    sides are keyed into fixed time buckets (intervals EXPLODE to every
    bucket they overlap, facts take one bucket), the equi-join on
    (by, bucket) bounds candidates to co-located rows, and the exact
    BETWEEN predicate gates the result. Facts are single-assigned to
    one bucket so no dedup is needed. ``bucket_sec`` trades explode
    fan-out (long intervals) against candidate density (busy buckets),
    like the cell resolution of the spatial join.
    """
    by_cols = [by] if isinstance(by, str) else list(by or [])
    fb = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_sec).cast("long")
    s_b = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_sec).cast("long")
    e_b = F.floor(F.unix_timestamp(F.col(end_col)) / bucket_sec).cast("long")
    iv = intervals.withColumn("_bkt", F.explode(F.sequence(s_b, e_b)))
    fc = facts.withColumn("_bkt", fb)
    cand = fc.join(iv, by_cols + ["_bkt"])
    return cand.where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    ).drop("_bkt")
