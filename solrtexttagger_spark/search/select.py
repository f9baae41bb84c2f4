"""/select result assembly — Solr returns STORED FIELDS with each hit
(`fl=` projection), not bare ids (reference delegated stack, SURVEY.md
§2.4 D1/D4; the tagger side's equivalent is matched_docs'
`fl` projection at tagging/operator.py).

Shape: the ranked top-k relation is tiny (k x |queries| rows) — it
broadcasts into a join against the corpus, and Catalyst prunes the docs
scan to exactly the requested `fl` columns (pinned by
test_plans.test_scan_pruning_column_projection for the tagger path; the
same projection applies here)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from solrtexttagger_spark.index.build import InvertedIndex
from solrtexttagger_spark.search.bm25 import B, K1, bm25_topk


def select_topk(
    index: InvertedIndex,
    docs_df: DataFrame,
    queries,
    *,
    fl: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    start: int = 0,
    allowed_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Top-k BM25 with stored-field retrieval: returns
    (query_id, rank, doc_id, score, *fl). `fl` columns come from
    ``docs_df``; the ranked set broadcasts into the corpus join. Supports
    the same fq (`allowed_docs`) and pagination (`start`) as bm25_topk."""
    ranked = bm25_topk(
        index, queries, k=k, k1=k1, b=b, spark=spark,
        start=start, allowed_docs=allowed_docs,
    )
    fields = docs_df.select(F.col(id_col).alias("doc_id"), *fl)
    return (
        fields.join(F.broadcast(ranked), "doc_id")
        .select("query_id", "rank", "doc_id", "score", *fl)
    )


def _match_count(
    index: InvertedIndex,
    query: str,
    allowed_docs: DataFrame | None,
    spark: SparkSession,
) -> int:
    """numFound = TOTAL matched-doc cardinality (docs containing >= 1
    query term, under fq if given) — independent of the rows/k page size,
    like Solr's numFound vs the returned doc list."""
    from solrtexttagger_spark.search.bm25 import analyze_query_terms

    terms = sorted(analyze_query_terms(query))
    if not terms:
        return 0
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    matched = (
        index.postings.join(F.broadcast(tdf), "term")
        .select(F.explode("postings.doc_id").alias("doc_id"))
        .distinct()
    )
    if allowed_docs is not None:
        matched = matched.join(
            allowed_docs.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    return matched.count()


_XML_TYPE = {
    "bigint": "long", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "double", "float": "float", "boolean": "bool",
}


def _xml_el(name: str, value, dtype: str) -> str:
    tag = _XML_TYPE.get(dtype, "str")
    sv = str(value)
    if tag == "str":
        sv = (
            sv.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )
    return f'<{tag} name="{name}">{sv}</{tag}>'


def _select_page(index, docs_df, query, fl, k, start, allowed_docs, spark):
    spark = spark or docs_df.sparkSession
    page = select_topk(
        index, docs_df, [(0, query)], fl=fl, k=k, start=start,
        allowed_docs=allowed_docs, spark=spark,
    )
    rows = sorted(page.collect(), key=lambda r: r["rank"])
    dtypes = dict(page.dtypes)
    num_found = _match_count(index, query, allowed_docs, spark)
    return rows, dtypes, num_found


def render_select_xml(
    index: InvertedIndex,
    docs_df: DataFrame,
    query: str,
    *,
    fl: list[str],
    k: int = 10,
    start: int = 0,
    allowed_docs: DataFrame | None = None,
    spark: SparkSession | None = None,
) -> str:
    """Solr /select XML writer (omitHeader=on, indent=off shape, like the
    tagger's golden writer at tagging/response.py): one result block with
    numFound = the TOTAL match cardinality, start = the page offset,
    maxScore, and one <doc> per hit carrying <float name="score"> plus
    the fl fields with Solr-typed elements (<long>/<int>/<double>/<str>).
    One request's page renders driver-side by contract."""
    rows, dtypes, num_found = _select_page(
        index, docs_df, query, fl, k, start, allowed_docs, spark
    )
    out = ['<?xml version="1.0" encoding="UTF-8"?>\n<response>\n']
    max_score = f'{rows[0]["score"]:.4f}' if rows else "0.0"
    out.append(
        f'<result name="response" numFound="{num_found}" start="{start}" '
        f'maxScore="{max_score}">'
    )
    for r in rows:
        out.append("<doc>")
        out.append(f'<float name="score">{r["score"]:.4f}</float>')
        out.append(_xml_el("id", r["doc_id"], "bigint"))
        for f_ in fl:
            out.append(_xml_el(f_, r[f_], dtypes.get(f_, "string")))
        out.append("</doc>")
    out.append("</result>\n</response>\n")
    return "".join(out)


def render_select_json(
    index: InvertedIndex,
    docs_df: DataFrame,
    query: str,
    *,
    fl: list[str],
    k: int = 10,
    start: int = 0,
    allowed_docs: DataFrame | None = None,
    spark: SparkSession | None = None,
) -> str:
    """Solr /select JSON writer shape: {"response": {"numFound", "start",
    "maxScore", "docs": [{"id", "score", ...fl}]}}."""
    import json

    rows, _dtypes, num_found = _select_page(
        index, docs_df, query, fl, k, start, allowed_docs, spark
    )
    docs = [
        {"id": r["doc_id"], "score": round(r["score"], 4),
         **{f_: r[f_] for f_ in fl}}
        for r in rows
    ]
    payload = {
        "response": {
            "numFound": num_found,
            "start": start,
            "maxScore": round(rows[0]["score"], 4) if rows else 0.0,
            "docs": docs,
        }
    }
    return json.dumps(payload, separators=(",", ":"))
