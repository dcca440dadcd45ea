"""Deterministic sampling for training-data curation.

Random sampling is useless for a reproducible corpus: re-running the
pipeline must select the SAME rows, on any engine, at any parallelism.
These operators hash a key column with md5 and keep rows whose leading
8 hex digits fall under a threshold — pure string comparison on
lowercase hex equals the numeric comparison, so the selection is
bit-reproducible in Spark, DuckDB, or anything else with md5 (the
contract oracles are one-line SQL twins).

- ``sample_deterministic``: global rate p.
- ``sample_stratified``: per-stratum rates via a broadcast dim join
  (e.g. downsample boilerplate-heavy sources, keep rare languages).

Scale shape: a map-only filter — no shuffle, no state, no RNG
coordination across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _hex_threshold(p: float) -> str:
    """p in [0,1] → 8-hex-digit cutoff: keep iff md5-prefix < cutoff.
    Quantization is 1/2^32 — negligible vs any real sampling need.
    p=1.0 returns 'g' (lexicographically above every hex digit) so the
    string comparison keeps ALL rows — a 9-digit '100000000' would
    compare LOWER than most prefixes."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {p}")
    if p >= 1.0:
        return "g"
    # for p within ~2^-21 of 1.0, p*(1<<32) rounds UP to exactly 2^32 in
    # float64 and format(...) would emit the 9-digit '100000000' the
    # docstring warns about — clamp to the largest 8-digit cutoff
    return format(min(int(p * (1 << 32)), 0xFFFFFFFF), "08x")


def _bucket(key_col, salt: str):
    return F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 8)


def sample_deterministic(
    df: DataFrame, p: float, key_col: str, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~p fraction keyed by ``key_col`` (same key
    ⇒ same verdict everywhere; ``salt`` decorrelates repeated draws)."""
    return df.where(_bucket(F.col(key_col), salt) < _hex_threshold(p))


def sample_per_group(
    df: DataFrame, n: int, group_col: str, key_col: str, salt: str = ""
) -> DataFrame:
    """Deterministic per-group cap (source/domain balancing): keep at
    most ``n`` rows per group, chosen by md5-hash order of the key
    (stable across runs/engines; key as final tiebreak). One window
    pass — a skewed hot group costs one sorted partition, same profile
    as any per-key top-k."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))).asc(),
        F.col(key_col).asc(),
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def sample_stratified(
    df: DataFrame,
    rates: dict,
    stratum_col: str,
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates`` maps stratum value
    → keep rate; strata absent from the map use ``default_rate``."""
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, _hex_threshold(v)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, _cut string",
    )
    out = df.join(F.broadcast(dim), stratum_col, "left").withColumn(
        "_cut", F.coalesce("_cut", F.lit(_hex_threshold(default_rate)))
    )
    return out.where(_bucket(F.col(key_col), salt) < F.col("_cut")).drop("_cut")
