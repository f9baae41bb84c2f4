"""Lucene/Solr block join — ``{!parent which=...}childQuery`` and
``{!child of=...}parentQuery`` (ToParentBlockJoinQuery /
ToChildBlockJoinQuery; Solr nested documents).

Reference surface: Lucene stores nested documents as a BLOCK — the
children occupy the doc ids immediately before their parent, so the
join from a child hit to its parent is pure doc-id arithmetic against
the parent bitset, never a term lookup. ``{!parent}`` matches parents
whose children satisfy the child query, with ScoreMode
``none|avg|max|total|min`` folding the children's relevancy into the
parent score; ``{!child}`` returns the children of matching parents.
The reference's tagger is itself a child-producing operator (one tag
row per matched span, TaggerRequestHandler.java:242-269 keyed by the
enclosing doc) — block join is how Solr users query such span/chunk
children back up to their documents.

Spark-first shape: the block layout's "adjacent doc ids" trick becomes
an ARITHMETIC KEY — a child's global id is
``parent_id * 2^BLOCK_BITS + child_idx``, so the child→parent hop is
``shiftright(id, BLOCK_BITS)``: a map-only projection inside
whole-stage codegen, no join, no lookup table shipped anywhere. That
is the honest Spark analogue of Lucene's index-time block: the parent
is recoverable from the child KEY alone. On top of it:

- ``{!parent}``: child match scores (any scorer over the child index —
  boolean_matched_scores / exploded bm25) derive their parent column
  map-only, then ONE partial-aggregating groupBy per (query_id,
  parent) computes the ScoreMode fold (associative → map-side combine,
  skew-safe when one parent has millions of children); the ranked
  parent page joins the parent relation only after the top-k window.
- ``{!child}``: the parent match set (bounded — a query page) joins
  the child relation on the DERIVED parent column; broadcast when the
  parent set is a page, shuffle-join when it is unbounded.

At 100 TB nothing here shuffles the child corpus beyond the one
aggregation of MATCHED children; unmatched children die in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

BLOCK_BITS = 20  # up to 2^20 children per parent block

SCORE_MODES = ("none", "avg", "max", "total", "min")


def child_corpus(
    chunks: DataFrame,
    *,
    parent_id: str = "doc_id",
    child_idx: str = "chunk_idx",
    text_col: str = "chunk_text",
    block_bits: int = BLOCK_BITS,
) -> DataFrame:
    """Encode a (parent_id, child_idx, text) relation — e.g.
    ops/chunking.chunk_documents output — as an indexable child corpus
    (doc_id, text) whose doc_id is the block key
    ``parent << block_bits | child_idx``. Index it with
    index.build.build_index and query it with any scorer; parents come
    back by arithmetic. Raises (as a runtime Spark error) if a
    child_idx overflows the block — widen block_bits, exactly like
    re-indexing a Lucene block that outgrew its layout."""
    idx = F.col(child_idx).cast("long")
    # guard BOTH bounds: a negative child_idx would silently corrupt
    # the block key (wrong parent on the shiftright decode)
    guarded = F.when(
        (idx >= F.lit(0)) & (idx < F.lit(1 << block_bits)), idx
    ).otherwise(
        F.raise_error(
            F.format_string(
                "child_idx %s overflows block_bits=%d",
                F.col(child_idx).cast("string"),
                F.lit(block_bits),
            )
        )
    )
    return chunks.select(
        (F.col(parent_id).cast("long") * F.lit(1 << block_bits) + guarded)
        .alias("doc_id"),
        F.col(text_col).alias("text"),
    )


def parent_of(col, *, block_bits: int = BLOCK_BITS):
    """The child→parent hop: shiftright(child_key, block_bits). Pure
    projection — Lucene's 'previous parent in the bitset' as key
    arithmetic."""
    return F.shiftright(F.col(col) if isinstance(col, str) else col,
                        block_bits).cast("long")


def parents_topk(
    child_scores: DataFrame,
    parents_df: DataFrame,
    *,
    k: int | None = 10,
    score_mode: str = "avg",
    id_col: str = "doc_id",
    block_bits: int = BLOCK_BITS,
) -> DataFrame:
    """``{!parent}`` — parents of matching children, ScoreMode-folded.
    ``child_scores`` is the child query's match set (query_id, doc_id,
    score) over a child_corpus index. Returns (query_id, rank,
    <id_col>, score, n_children) ranked by the folded score with the
    engine's (score desc, id asc) tie-break; score_mode="none" gives
    every parent the constant 1.0 (Lucene ScoreMode.None), so the page
    is id-ordered. ``parents_df`` acts as Solr's ``which=`` parent
    filter: folded parents missing from it are dropped BEFORE the rank
    window (a dangling child never consumes a rank)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(
            f"score_mode must be one of {SCORE_MODES}, got {score_mode!r}"
        )
    agg = {
        "none": F.first(F.lit(1.0)),
        "avg": F.avg("score"),
        "max": F.max("score"),
        "total": F.sum("score"),
        "min": F.min("score"),
    }[score_mode]
    folded = (
        child_scores.withColumn(
            "__parent", parent_of("doc_id", block_bits=block_bits)
        )
        .groupBy("query_id", "__parent")
        .agg(
            agg.cast("double").alias("score"),
            F.count("*").cast("long").alias("n_children"),
        )
    )
    # Lucene's which= filter applies BEFORE scoring: a folded parent
    # absent from parents_df (dangling children) must not consume a
    # rank. The semi-join runs on the FOLDED relation — |matched
    # parents| rows, already tiny next to the child corpus — against
    # the id-projected parent scan, pre-window.
    folded = folded.join(
        parents_df.select(F.col(id_col).alias("__parent")),
        "__parent",
        "left_semi",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("__parent").asc()
    )
    ranked = folded.withColumn("rank", F.row_number().over(w).cast("long"))
    if k is not None:
        ranked = ranked.where(F.col("rank") <= k)
    return ranked.select(
        "query_id", "rank", F.col("__parent").alias(id_col), "score",
        "n_children",
    )


def children_of(
    parent_match: DataFrame,
    child_df: DataFrame,
    *,
    parent_id_col: str = "doc_id",
    child_id_col: str = "doc_id",
    block_bits: int = BLOCK_BITS,
    broadcast_parents: bool = True,
) -> DataFrame:
    """``{!child of=...}`` — every child of the matched parents.
    ``parent_match`` carries (query_id, <parent_id_col>); ``child_df``
    is the encoded child corpus (or any relation keyed by the block
    child id). Returns the child rows + (query_id, <parent_id_col>).
    The parent page broadcasts by default (it is a bounded result
    page); pass broadcast_parents=False for an unbounded parent set."""
    parents = parent_match.select(
        "query_id", F.col(parent_id_col).alias("__parent")
    ).distinct()
    if broadcast_parents:
        parents = F.broadcast(parents)
    kids = child_df.withColumn(
        "__parent", parent_of(child_id_col, block_bits=block_bits)
    )
    return kids.join(parents, "__parent").withColumnRenamed(
        "__parent", parent_id_col
    )


def with_child_docs(
    parent_page: DataFrame,
    child_df: DataFrame,
    *,
    parent_id_col: str = "doc_id",
    child_id_col: str = "doc_id",
    block_bits: int = BLOCK_BITS,
    child_filter=None,
    limit: int = 10,
    child_fl: list[str] | None = None,
    broadcast_parents: bool = True,
) -> DataFrame:
    """Solr's ChildDocTransformer — ``fl=*,[child childFilter=...
    limit=N]``: each returned parent carries its nested child documents
    inline. Returns ``parent_page`` with a ``_childDocuments_`` column
    (Solr's field name): an ARRAY of child structs in child-index order
    (Lucene returns block order — here the decoded ``child_idx``),
    capped at ``limit`` per parent (Solr's default 10), empty array for
    childless parents (Solr omits the key; a typed column can't).

    Shape: the page broadcasts into the child scan (semi-join on the
    shiftright-derived parent — map-only key arithmetic, the same hop
    every block-join path uses), ``child_filter`` (a Catalyst Column or
    SQL string) prunes children IN THE SCAN, and the per-parent nesting
    is ONE groupBy whose sort_array + slice caps the array at ``limit``
    — no window, no per-parent job. The page stays a page: cost tracks
    (matched children of the page's parents), never the child corpus.
    ``broadcast_parents=False`` for an unbounded parent set (the
    children_of contract)."""
    if limit <= 0:
        raise ValueError("limit must be positive")
    fl = child_fl if child_fl is not None else [
        c for c in child_df.columns if c != child_id_col
    ]
    missing = [c for c in fl if c not in child_df.columns]
    if missing:
        raise ValueError(f"child_fl names unknown child fields: {missing}")
    parents = parent_page.select(
        F.col(parent_id_col).alias("__parent")
    ).distinct()
    if broadcast_parents:
        parents = F.broadcast(parents)
    kids = child_df
    if child_filter is not None:
        kids = kids.where(
            F.expr(child_filter) if isinstance(child_filter, str)
            else child_filter
        )
    kids = kids.select(
        parent_of(child_id_col, block_bits=block_bits).alias("__parent"),
        F.struct(
            # low bits of the block key (ids are non-negative by the
            # child_corpus guard, so pmod == the bit mask)
            F.pmod(
                F.col(child_id_col).cast("long"),
                F.lit(1 << block_bits).cast("long"),
            ).cast("long").alias("child_idx"),
            *[F.col(c) for c in fl],
        ).alias("__child"),
    ).join(parents, "__parent")
    nested = kids.groupBy("__parent").agg(
        F.slice(
            F.sort_array(F.collect_list("__child")), 1, limit
        ).alias("_childDocuments_")
    )
    out = parent_page.join(
        nested,
        parent_page[parent_id_col] == nested["__parent"],
        "left",
    ).drop("__parent")
    # Solr omits the key for childless parents; a typed column carries
    # an empty array instead
    return out.withColumn(
        "_childDocuments_",
        F.coalesce(
            F.col("_childDocuments_"),
            F.array().cast(dict(out.dtypes)["_childDocuments_"]),
        ),
    )
