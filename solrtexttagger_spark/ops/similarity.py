"""Embedding similarity search over an array<float> column.

Brute-force cosine top-k is the exact baseline (all JVM: zip_with +
aggregate, broadcast probes, window top-k). The LSH variant
(random-hyperplane signs from deterministic md5-derived hyperplanes) is the
scale path: bucket first, score only within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    emb_df: DataFrame,
    probe_ids: list[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_to: int | None = 4,
) -> DataFrame:
    """Exact cosine top-k: for each probe id, the k nearest other vectors.
    Output (probe_id, rank, vec_id, cos). Deterministic tie-break on vec_id."""
    base = emb_df.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    probes = base.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("norm").alias("pnorm"),
    )
    cos = _dot(F.col("pv"), F.col("v")) / (F.col("pnorm") * F.col("norm"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = (
        base.crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", "vec_id", "cos")
    )


def cosine_dup_pairs(
    emb_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_to: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_vec_id, b_vec_id, cos) with
    cos >= threshold, a < b. Exact all-pairs baseline (oracle-checkable);
    at 1e8+ vectors swap in the hyperplane-bucketed candidate generation of
    lsh_cosine_topk (equi-join on bucket) before the exact rescoring."""
    base = emb_df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("norm", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a = base.select(
        F.col("vec_id").alias("a_vec_id"), F.col("v").alias("va"), F.col("norm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("b_vec_id"), F.col("v").alias("vb"), F.col("norm").alias("nb")
    )
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), round_to)
    return (
        a.join(b, F.col("a_vec_id") < F.col("b_vec_id"))
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("a_vec_id", "b_vec_id", "cos")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1) from md5 —
    reproducible across engines and runs (no RNG state)."""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{plane}#{d}".encode()).hexdigest()[:15], 16)
        out.append((h / float(1 << 60)) * 2.0 - 1.0)
    return out


def lsh_cosine_topk(
    emb_df: DataFrame,
    probe_ids: list[int],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    dim: int | None = None,
    round_to: int | None = 4,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH bucketing, exact
    cosine within the probe's bucket only. At 1e9+ vectors this replaces the
    crossJoin with an equi-join on the bucket key."""
    if dim is None:
        dim = len(emb_df.select(vec_col).first()[0])
    planes = [_hyperplane(dim, p) for p in range(num_planes)]

    base = emb_df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    sig = None
    for p, plane in enumerate(planes):
        pl = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(F.col("v"), pl) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else (sig + bit)
    bucketed = base.withColumn("bucket", sig.cast("long")).withColumn(
        "norm", F.sqrt(_dot(F.col("v"), F.col("v")))
    )
    probes = bucketed.where(F.col("vec_id").isin(probe_ids)).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("norm").alias("pnorm"),
        F.col("bucket"),
    )
    cos = _dot(F.col("pv"), F.col("v")) / (F.col("pnorm") * F.col("norm"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = (
        bucketed.join(F.broadcast(probes), "bucket")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "vec_id", cos.alias("cos"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("probe_id", "rank", "vec_id", "cos")
    )
