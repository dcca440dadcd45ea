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
    if not by_cols:
        raise ValueError(
            "asof_join requires a non-empty `by` key: a keyless as-of is a "
            "single-partition global window (one-task sort — not a scale "
            "plan); add an explicit constant key column if a global join "
            "is genuinely intended"
        )
    lcols = [c for c in left.columns if c not in by_cols + [on]]
    rcols = [c for c in right.columns if c not in by_cols + [on]]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")
    reserved = {"_is_l", "_r", "_m"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with asof_join's internal "
            "names (_is_l/_r/_m); rename them before joining"
        )

    # the right payload travels as ONE struct so the carried match is a
    # single right ROW — per-column last(ignorenulls) would skip a
    # legitimate NULL payload field and stitch values from different
    # right rows (DuckDB ASOF semantics carry the whole matched row)
    r_payload = F.struct(F.col(on).alias("_m_on"), *[F.col(c) for c in rcols])
    l2 = left.select(
        *by_cols, on, F.lit(1).alias("_is_l"), *lcols,
        F.lit(None).cast(
            right.select(r_payload.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r2 = right.select(
        *by_cols, on, F.lit(0).alias("_is_l"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        r_payload.alias("_r"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(on).asc(), F.col("_is_l").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_is_l") == 1)
        .drop("_is_l", "_r")
    )
    match = F.col("_m")
    if tolerance_sec is not None:
        stale = (
            F.unix_timestamp(F.col(on)) - F.unix_timestamp(F.col("_m._m_on"))
        ) > tolerance_sec
        match = F.when(stale, F.lit(None)).otherwise(F.col("_m"))
    out = out.withColumn("_m", match)
    return out.select(
        *by_cols, on, *lcols, *[F.col(f"_m.{c}").alias(c) for c in rcols]
    )


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
