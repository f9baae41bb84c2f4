"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-and-partitioning dependent — re-running on a
repartitioned input yields a different sample, which silently breaks
train/eval splits and decontamination audits. These operators derive keep
decisions from a portable 60-bit md5 hash of the ROW KEY, so the sample is
a pure function of the data: stable across partitionings, engines
(oracle-checkable in DuckDB), and reruns; different ``salt`` values give
independent samples.

Scale shape: hash_sample/stratified_hash_sample are narrow row-local
filters (no shuffle, fully pushed into the scan stage); hash_top_k is an
ORDER BY hash LIMIT k, which Spark executes as TakeOrderedAndProject
(per-partition top-k, O(k) to the driver — no global sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HASH_SPACE = float(1 << 60)


def _key_hash(key_cols: list[str], salt: str):
    key = F.concat_ws("\x1f", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Keep rows whose key-hash falls below ``fraction`` of the hash space —
    a deterministic ~``fraction`` Bernoulli sample, identical under any
    partitioning/engine. The same key always lands on the same side, so
    samples with the same salt are consistent across tables (join-safe)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(
        _key_hash(key_cols, salt) < F.lit(int(fraction * _HASH_SPACE)).cast("long")
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict,
    *,
    strata_col: str,
    key_cols: list[str],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps a stratum
    value to its keep fraction (e.g. {'en': 0.01, 'de': 0.1} to rebalance
    languages); strata absent from the map keep ``default_fraction``.
    One narrow filter — the fraction lookup is a broadcast map literal."""
    for v in list(fractions.values()) + [default_fraction]:
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fractions must be in [0, 1], got {v}")
    cut = F.lit(int(default_fraction * _HASH_SPACE)).cast("long")
    if fractions:
        m = F.create_map(
            *[
                F.lit(x)
                for kv in fractions.items()
                for x in (kv[0], int(kv[1] * _HASH_SPACE))
            ]
        )
        cut = F.coalesce(m[F.col(strata_col)].cast("long"), cut)
    return df.where(_key_hash(key_cols, salt) < cut)


def hash_top_k(
    df: DataFrame,
    k: int,
    *,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """EXACT-size deterministic uniform sample: the k rows with the
    smallest key-hash. Unlike reservoir sampling this is order- and
    partitioning-independent, and growing the corpus only ever swaps
    items in/out by hash rank (stable prefix property)."""
    return df.orderBy(_key_hash(key_cols, salt).asc(), *key_cols).limit(k)


def hash_split(
    df: DataFrame,
    splits: dict,
    *,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment: ``splits`` maps a split
    name to its proportion (must sum to <= 1.0; keys are assigned to
    DISJOINT consecutive hash ranges in the given order, rows past the
    total get NULL). Every row keeps its split under any partitioning,
    rerun, or engine, and a row key lands in the SAME split across
    tables sharing the salt (leakage-safe joins between a corpus and
    its derived features). Adds a ``split`` column; one narrow
    projection, no shuffle.

    The canonical training-data split step — `randomSplit()` is
    partitioning-dependent and silently re-deals rows between splits on
    a repartitioned rerun, which leaks eval data into training."""
    total = 0.0
    for name, frac in splits.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"split {name!r} fraction {frac} not in [0, 1]")
        total += frac
    if total > 1.0 + 1e-9:
        raise ValueError(f"split fractions sum to {total} > 1")
    h = _key_hash(key_cols, salt)
    expr = F.lit(None).cast("string")
    upper = 0.0
    bounds = []
    for name, frac in splits.items():
        upper += frac
        bounds.append((name, int(upper * _HASH_SPACE)))
    for name, bound in reversed(bounds):
        expr = F.when(h < F.lit(bound).cast("long"), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)
