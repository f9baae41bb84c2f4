"""/admin/luke — index and field introspection.

Reference surface: Solr's LukeRequestHandler (named for Lucene's Luke
toolbox) reports, without running a query, (a) index-level totals
(numDocs, numTerms, version), (b) per-field summaries (type, docs with
a value, distinct count), and (c) the top terms of an indexed field by
document frequency — the endpoint schema browsers and ops dashboards
poll. The reference engine inherits it wholesale from Solr; here the
same three reports compute from the index's own tables.

Spark-first shape: everything reads the TINY relations the engine
already maintains — ``term_stats`` (one row per term) for index totals
and top terms, never the postings bodies; per-field stats are ONE
pass over the corpus (a single agg with count/count_distinct columns,
map-side partial). Top terms compile to TakeOrderedAndProject. The one
knob that matters at 100 TB is ``approx``: exact ``count_distinct``
over N stored fields is one expand-shuffle per field, while
``approx_count_distinct`` (HLL++, rsd 1.6 %) keeps the whole report a
single map-side pass — the default here, with exact available for
oracle-grade runs (Luke itself reports exact counts because Lucene
already stores them; a columnar engine has to choose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from solrtexttagger_spark.index.build import InvertedIndex


def luke_index_summary(index: InvertedIndex) -> DataFrame:
    """The index block of a Luke response, one row:
    (num_docs, num_terms, total_postings, total_tokens, num_segments,
    avgdl). num_terms/total_postings/total_tokens fold the term_stats
    relation (one row per term — tiny) in a single aggregate;
    total_postings is Lucene's sumDocFreq, total_tokens its
    sumTotalTermFreq."""
    return index.term_stats.agg(
        F.lit(index.doc_count).cast("long").alias("num_docs"),
        F.count("*").alias("num_terms"),
        F.sum("df").cast("long").alias("total_postings"),
        F.sum("cf").cast("long").alias("total_tokens"),
        F.lit(index.num_segments).cast("int").alias("num_segments"),
        (F.sum("cf") / F.lit(index.doc_count)).alias("avgdl"),
    )


def luke_top_terms(
    index: InvertedIndex, *, top: int = 10
) -> DataFrame:
    """Luke's topTerms: the ``top`` terms by document frequency
    (df desc, term asc — Luke's own tiebreak is the term ordinal, which
    for a text field is the lexicographic order). Returns
    (rank, term, df, cf); compiles to TakeOrderedAndProject over
    term_stats — no global sort, no postings touched."""
    if top <= 0:
        raise ValueError("top must be positive")
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("df"), F.asc("term"))
    return (
        index.term_stats
        .orderBy(F.desc("df"), F.asc("term")).limit(top)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "term", "df", "cf")
    )


def luke_field_stats(
    docs_df: DataFrame,
    fields: list[str] | None = None,
    *,
    approx: bool = True,
    rsd: float = 0.016,
) -> DataFrame:
    """The per-field block: (field, type, docs_with_value,
    distinct_values) for each stored field — Luke's ``fields`` map
    (type from the schema, docs from docFreq of the field's existence).

    ONE aggregate over the corpus regardless of field count: every
    field contributes a count + a (approx_)count_distinct column to the
    same agg, so the scan happens once and the partials combine
    map-side. ``approx=True`` (default) uses HLL++ at ``rsd`` — the
    100 TB shape; ``approx=False`` is exact count_distinct for
    oracle-grade comparisons (one expand per field, honest cost)."""
    names = fields if fields is not None else list(docs_df.columns)
    missing = [f for f in names if f not in docs_df.columns]
    if missing:
        raise ValueError(f"fields absent from the corpus: {missing}")
    # the stack() expression below interpolates raw field names into SQL
    # text and derives __n_<field>/__d_<field> aliases — a quote, space,
    # or dot would produce a parse/analysis error downstream, so fail
    # loudly here instead (r9 ADVICE)
    import re as _re

    bad = [f for f in names if not _re.match(r"[A-Za-z_]\w*$", f)]
    if bad:
        raise ValueError(
            f"luke_field_stats needs plain identifier field names, got {bad}"
            " — rename/alias the columns first"
        )
    types = dict(docs_df.dtypes)
    aggs = []
    for f_ in names:
        aggs.append(F.count(f_).alias(f"__n_{f_}"))
        distinct = (
            F.approx_count_distinct(f_, rsd) if approx
            else F.count_distinct(f_)
        )
        aggs.append(distinct.alias(f"__d_{f_}"))
    row = docs_df.agg(*aggs)
    # pivot the single stats row into one row per field — a constant
    # number of rows, assembled with a stack over the literal field list
    pairs = ", ".join(
        f"'{f_}', '{types[f_]}', __n_{f_}, __d_{f_}" for f_ in names
    )
    return row.selectExpr(
        f"stack({len(names)}, {pairs}) AS "
        "(field, type, docs_with_value, distinct_values)"
    )
