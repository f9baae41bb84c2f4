"""Solr /terms handler + spellcheck over the live index vocabulary —
two more delegated handlers of the reference's Solr stack (SURVEY.md
§2.4), re-expressed Spark-first on the term_stats relation (term, df,
cf): tiny next to postings, broadcastable, already produced by every
build.

- terms_component: Solr's TermsComponent (`terms.prefix` /
  `terms.limit` / `terms.sort=count`) — top-k terms under a prefix by
  document frequency. The prefix predicate (StartsWith) pushes into the
  term_stats scan; the top-k is a WindowGroupLimit, never a full sort.
- spellcheck_terms: Solr's DirectSpellChecker shape — candidate
  corrections come from the LIVE index terms (no side dictionary),
  ranked by (edit distance asc, df desc, term asc). A cheap
  length-difference pre-filter (|len(term) - len(word)| <= max_dist, a
  provable consequence of the distance bound) prunes the vocabulary
  before levenshtein runs; both predicates are built-in JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from solrtexttagger_spark.index.build import InvertedIndex


def terms_component(
    index: InvertedIndex, prefix: str, *, k: int = 10
) -> DataFrame:
    """Solr /terms: the top ``k`` index terms starting with ``prefix``,
    ordered by global df desc (term asc tie-break, Solr's index-order
    tie). Returns (rank, term, df, cf).

    Physical shape: orderBy+limit = TakeOrderedAndProject (per-partition
    top-k merged on the driver, NO global sort even for an empty prefix
    over a 1e8-term vocabulary); the rank window then runs over only the
    k survivors."""
    top = (
        index.term_stats.where(F.col("term").startswith(prefix))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "term", F.col("df").cast("long"), F.col("cf").cast("long")
    )


def spellcheck_terms(
    index: InvertedIndex,
    word: str,
    *,
    max_dist: int = 2,
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Solr spellcheck (DirectSpellChecker): index terms within
    ``max_dist`` levenshtein of ``word`` (the word itself excluded),
    ranked by (distance asc, df desc, term asc), df >= min_df. Returns
    (rank, term, dist, df).

    Physical shape: the vocabulary-wide work (length band + levenshtein)
    is embarrassingly parallel scan predicates; orderBy+limit =
    TakeOrderedAndProject (no global sort), and the rank window runs
    over only the k survivors."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    cand = index.term_stats.where(
        (F.abs(F.length("term") - len(word)) <= max_dist)
        & (F.col("term") != word)
        & (F.col("df") >= min_df)
    ).withColumn("dist", F.levenshtein(F.col("term"), F.lit(word)).cast("long"))
    order = [F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()]
    top = cand.where(F.col("dist") <= max_dist).orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "term", "dist", F.col("df").cast("long")
    )
