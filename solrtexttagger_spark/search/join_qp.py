"""Solr JoinQParser — ``q={!join from=f to=t [score=...]}inner_query``.

Reference surface: Solr's join query parser restricts the main result
set to documents whose ``to`` field value appears among the ``from``
field values of documents matching the inner query (the classic
"find docs related through a key" query — manufacturers of matching
products, parents of matching comments, documents sharing a source
with a relevant document). ``fromIndex=`` makes it CROSS-COLLECTION:
the inner query runs against another collection entirely. The default
``score=none`` drops relevancy (a pure filter join, Lucene
JoinUtil.createJoinQuery ScoreMode.None); the score join variants
``score=max|min|avg|total`` carry the inner query's relevancy through
the join — each join VALUE aggregates the scores of the from-side docs
holding it, and a to-side doc scores as its to-value's aggregate.

The reference's own tagger builds exactly this DocSet-bridging shape
per request when fq arms restrict the taggable corpus
(TaggerRequestHandler.java:310-351 builds the filter DocSet the tag
loop intersects with); the join parser is the general-purpose version
of that machinery.

Spark-first shape (the point of this module):

1. the inner match set (query_id, from_doc_id, score) — any relation:
   ``boolean_matched_scores`` for a text inner query, or a plain
   Catalyst predicate lifted to (id, 1.0) for a filter inner query —
   joins the FROM relation projected to (from_id, from_col) ONLY
   (column-pruned scan; the join key never widens the shuffle);
2. ONE partial-aggregating groupBy per (query_id, join value) computes
   the ScoreMode fold (max/min/avg/total — map-side combine, skew-safe
   on a dominant join value because the fold is associative);
3. the aggregated VALUE SET — |distinct join values|, typically orders
   of magnitude smaller than either relation — joins onto the TO
   relation (semi-join for score=none, inner hash join for score
   modes). When the value set is known-small the caller keeps the
   default ``broadcast_values=True`` and the TO side streams map-only
   past a broadcast hash; for a near-unique join key (|vals| ≈
   |matched from-docs| — Solr's JoinUtil id→ref shape) pass
   ``broadcast_values=False``: an EXPLICIT broadcast hint is never
   demoted by AQE, so a 10⁸-value set would hit Spark's 8 GB broadcast
   hard limit — the opt-out leaves the strategy to Catalyst/AQE, which
   still PROMOTES to broadcast when the measured build side is small.

``score=none`` returns to-side docs unranked (Solr scores them
constant 1.0); score modes rank by the aggregated value score with the
engine's deterministic (score desc, id asc) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SCORE_MODES = ("none", "max", "min", "avg", "total")


def join_values(
    inner_scores: DataFrame,
    from_df: DataFrame,
    *,
    from_col: str,
    from_id: str = "doc_id",
    score: str = "none",
) -> DataFrame:
    """The aggregated join-value relation: (query_id, __join_value,
    __join_score). ``inner_scores`` is the inner query's match set
    (query_id, doc_id, score) over the FROM collection —
    boolean_matched_scores output, or any (id, score) relation with a
    query_id column. One partial-aggregating groupBy; NULL join values
    never bridge (Solr joins skip docs missing the from field)."""
    if score not in SCORE_MODES:
        raise ValueError(f"score must be one of {SCORE_MODES}, got {score!r}")
    agg = {
        "none": F.first(F.lit(1.0)),
        "max": F.max("score"),
        "min": F.min("score"),
        "avg": F.avg("score"),
        "total": F.sum("score"),
    }[score]
    keyed = inner_scores.join(
        from_df.select(
            F.col(from_id).alias("doc_id"),
            F.col(from_col).alias("__join_value"),
        ),
        "doc_id",
    ).where(F.col("__join_value").isNotNull())
    return keyed.groupBy("query_id", "__join_value").agg(
        agg.cast("double").alias("__join_score")
    )


def join_topk(
    inner_scores: DataFrame,
    from_df: DataFrame,
    to_df: DataFrame,
    *,
    from_col: str,
    to_col: str,
    from_id: str = "doc_id",
    to_id: str = "doc_id",
    score: str = "none",
    k: int | None = None,
    broadcast_values: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """Solr ``{!join from=<from_col> to=<to_col> score=<mode>}`` over
    already-computed inner match scores. Returns, per query:

    - ``score="none"``: (query_id, <to_id>) — the filter-join result
      set, unranked (Solr's default join is score-less; compose with
      bm25_topk(allowed_docs=...) to use it as an fq);
    - score modes: (query_id, rank, <to_id>, score) — to-side docs
      ranked by their join value's aggregated inner score, top-k when
      ``k`` is given.

    ``from_df``/``to_df`` may be the same relation (self-join on a
    shared key) or different collections (Solr ``fromIndex=``).

    ``broadcast_values`` (default True) hints the aggregated value set
    to the build side of a broadcast hash join — right when |distinct
    join values| is small (category keys, manufacturer ids). Pass
    False for an unbounded/near-unique join key: the hint is a hard
    commitment (AQE never demotes it), and without it Catalyst/AQE
    still promote a measured-small build side to broadcast while a
    genuinely large one falls back to a shuffle hash join instead of
    dying at the 8 GB broadcast limit."""
    if score == "none" and k is not None:
        raise ValueError(
            "k is meaningless with score='none' (a filter join has no "
            "ranking); drop k or pick a score mode"
        )
    vals = join_values(
        inner_scores, from_df, from_col=from_col, from_id=from_id,
        score=score,
    )
    to_keyed = to_df.select(
        F.col(to_id), F.col(to_col).alias("__join_value")
    ).where(F.col("__join_value").isNotNull())
    if score == "none":
        build = vals.select("query_id", "__join_value")
        if broadcast_values:
            build = F.broadcast(build)
        # distinct to-ids: several inner queries may share a value row
        out = to_keyed.join(build, "__join_value").select(
            "query_id", to_id
        ).distinct()
        return out
    build = F.broadcast(vals) if broadcast_values else vals
    joined = to_keyed.join(build, "__join_value").select(
        "query_id", F.col(to_id), F.col("__join_score").alias("score")
    )
    if round_to is not None:
        # pre-rank rounding (grouping.grouped_topk discipline): a SUM
        # fold's last-ulp divergence across engines must not flip
        # near-equal ranks
        joined = joined.withColumn("score", F.round("score", round_to))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(to_id).asc()
    )
    ranked = joined.withColumn("rank", F.row_number().over(w).cast("long"))
    if k is not None:
        ranked = ranked.where(F.col("rank") <= k)
    return ranked.select("query_id", "rank", to_id, "score")


def predicate_scores(
    df: DataFrame,
    predicate: str,
    *,
    id_col: str = "doc_id",
    query_id: int = 0,
) -> DataFrame:
    """Lift a Catalyst predicate to an inner-query match set
    (query_id, doc_id, score=1.0) — the Solr inner query
    ``field:value`` shape when the from side is a structured
    collection (``fromIndex=events`` with ``event_type:click``). Stays
    whole-stage-codegen; the predicate pushes down to the scan."""
    return df.where(F.expr(predicate)).select(
        F.lit(query_id).cast("long").alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.lit(1.0).alias("score"),
    )
