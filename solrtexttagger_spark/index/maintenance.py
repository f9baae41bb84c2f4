"""Index maintenance: document deletion with Lucene/Solr-faithful
semantics (reference stack: Solr deleteById/deleteByQuery + the segment
merge that expunges deletes).

Lucene deletes happen in two phases, and both exist here:

1. TOMBSTONES (deleteById before any merge): deleted docs stop matching
   but STILL count in corpus statistics (df, doc_count, avgdl) until a
   merge rewrites the segments. That phase needs no new operator — it is
   exactly ``bm25_topk(..., allowed_docs=live_docs)`` / ``wand_topk``'s
   fq plumbing: membership filtering with corpus-wide stats.
2. EXPUNGE (merge/optimize): postings physically rewritten, stats
   recomputed over the remaining corpus. That is ``expunge_docs`` below.

Physical shape of expunge: the deleted-id set never explodes the big
postings relation when it is small — the ids become one shared literal
array and a JVM ``filter`` lambda rewrites each (term, seg) shard's
array in place (no shuffle at all; df_seg/cf_seg recomputed from the
filtered array). Past ``literal_threshold`` ids the honest cost is a
real merge: explode -> anti-join on doc_id -> re-aggregate — the same
shuffle a Lucene segment merge pays. Corpus stats (doc_count, avgdl)
are recomputed from the surviving postings in one aggregation job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solrtexttagger_spark.index.build import InvertedIndex


def expunge_docs(
    index: InvertedIndex,
    deleted_docs: DataFrame,
    *,
    method: str = "auto",
    literal_threshold: int = 10_000,
) -> InvertedIndex:
    """Physically remove ``deleted_docs`` (a relation with a doc_id
    column) from the index and recompute every statistic over the
    remaining corpus — Solr deleteByQuery + expungeDeletes. Returns a NEW
    InvertedIndex; the input index (and any driver-side query caches on
    it) stays valid for its own contents.

    method='literal': deleted ids collected into one shared array
    literal, shards rewritten by a JVM filter lambda — zero shuffles.
    method='merge': explode -> anti-join -> re-aggregate (the real merge
    shuffle; use when the deleted set is too big to ship as a literal).
    method='auto' picks by count against ``literal_threshold``."""
    ids_df = deleted_docs.select(F.col("doc_id").cast("long").alias("doc_id")).distinct()
    if method == "auto":
        method = "literal" if ids_df.count() <= literal_threshold else "merge"
    if method == "literal":
        ids = sorted(r["doc_id"] for r in ids_df.collect())
        gone = F.array(*[F.lit(i) for i in ids]) if ids else F.array().cast("array<long>")
        kept = F.filter("postings", lambda p: ~F.array_contains(gone, p["doc_id"]))
        new_postings = (
            index.postings.withColumn("postings", kept)
            .withColumn("df_seg", F.size("postings").cast(index.postings.schema["df_seg"].dataType))
            .withColumn(
                "cf_seg",
                F.aggregate(
                    "postings", F.lit(0).cast("long"), lambda acc, p: acc + p["tf"]
                ).cast(index.postings.schema["cf_seg"].dataType),
            )
            .where(F.col("df_seg") > 0)
        )
    elif method == "merge":
        ex = index.postings.select(
            "term", "seg", F.explode("postings").alias("p")
        ).select("term", "seg", F.col("p.doc_id").alias("doc_id"), "p")
        kept = ex.join(ids_df, "doc_id", "left_anti")
        new_postings = (
            kept.groupBy("term", "seg")
            .agg(
                F.array_sort(F.collect_list("p")).alias("postings"),
                F.count("*").alias("df_seg"),
                F.sum(F.col("p.tf")).alias("cf_seg"),
            )
        )
    else:
        raise ValueError(f"method must be auto|literal|merge, got {method}")
    term_stats = new_postings.groupBy("term").agg(
        F.sum("df_seg").alias("df"), F.sum("cf_seg").alias("cf")
    )
    # corpus stats over the SURVIVING docs: each doc carries its dl on
    # every posting, so distinct (doc_id, dl) pairs = one row per doc
    stats = (
        new_postings.select(F.explode("postings").alias("p"))
        .select(F.col("p.doc_id").alias("doc_id"), F.col("p.dl").alias("dl"))
        .distinct()
        .agg(F.count("*").alias("n"), F.sum("dl").alias("total"))
        .collect()[0]
    )
    doc_count = int(stats["n"] or 0)
    avgdl = float(stats["total"]) / doc_count if doc_count else 0.0
    return InvertedIndex(
        postings=new_postings,
        term_stats=term_stats,
        doc_count=doc_count,
        num_segments=index.num_segments,
        _avgdl=avgdl,
    )
