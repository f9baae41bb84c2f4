"""The distributed tag operator — reference: TaggerRequestHandler /tag.

Set-oriented recast: instead of one HTTP request per text, ``tag`` takes a
DataFrame of texts and runs the sequential per-document tagging loop
(tagging/core.py) inside an Arrow-batched ``mapInPandas``, with the term
dictionary shipped once per executor via a Spark broadcast (the in-memory
FST analogue). Per-request features map as:

  fq (filter queries, AND)    -> predicates on the dictionary docs
                                 DataFrame, pushed down BEFORE broadcast
                                 (reference: liveDocs bits,
                                 TaggerRequestHandler.java:314-351);
                                 Spark SQL strings by default, Solr fq
                                 syntax ("type:city", "{!terms f=..}..")
                                 under fq_dialect="solr"
                                 (search/localparams.solr_fq_column)
  tagsLimit                   -> per-document collection stop (java:176)
  matchText                   -> substring column (java:192-193)
  id translation              -> broadcast join tags.doc_id -> docs.id
                                 (java:204-226's cache becomes a join)
  matched-docs 'response'     -> matched_docs() helper (java:278-293)

Scale note (100 TB of input texts): texts are the BIG side and never
shuffle — the plan is Scan -> MapInPandas -> (optional join with the tiny
dictionary, broadcast). Dictionary up to ~1e8 names fits broadcast; beyond
that use shingle-join tagging (explode candidate n-grams + sort-merge join),
which trades a shuffle of the corpus for no broadcast.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from solrtexttagger_spark.analysis.core import ENGLISH_STOP_WORDS, query_analyze
from solrtexttagger_spark.tagging.core import tag_text
from solrtexttagger_spark.tagging.dictionary import TagDictionary

_TAG_SCHEMA = T.StructType(
    [
        T.StructField("qdoc_id", T.LongType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
    ]
)

_TAG_SCHEMA_MT = T.StructType(
    _TAG_SCHEMA.fields + [T.StructField("match_text", T.StringType())]
)


def tag(
    texts_df: DataFrame,
    dictionary: TagDictionary,
    *,
    text_col: str = "text",
    id_col: str = "qdoc_id",
    overlaps: str = "NO_SUB",
    fq: str | list[str] | None = None,
    fq_dialect: str = "spark",
    ignore_stopwords: bool | None = None,
    tags_limit: int | None = 1000,
    min_taggable_len: int | None = None,
    match_text: bool = False,
    offset_adjust: str | None = None,
    non_taggable_tags: list[str] | None = None,
    on_invalid: str = "error",
    skip_alt_tokens: bool = False,
) -> DataFrame:
    """Tag every text against the dictionary.

    Returns (qdoc_id, start, end, doc_ids array<long>[, match_text]).
    Use ``translate_ids`` to fan doc_ids out to user ids.

    skip_alt_tokens: silently drop alternate tokens (posInc==0, e.g. from a
    synonym-expanding analyzer); when False (the reference default,
    TaggerRequestHandler.java:123) an alternate token raises, because the
    tagger cannot honor stacked positions.

    offset_adjust: None | 'xml' | 'html' — strip markup at query time
    (offsets preserved) and correct each tag's offsets so inserting an
    open/close tag pair keeps the document well-formed; tags that cannot be
    corrected are dropped (reference xmlOffsetAdjust/htmlOffsetAdjust,
    TaggerRequestHandler.java:126-128, 158-159, 244-276).
    non_taggable_tags: html-mode element names whose contents can't be
    tagged. on_invalid: 'error' | 'skip' for invalid XML documents.
    """
    spark = texts_df.sparkSession

    # ignoreStopwords default: true iff the index analyzer used a StopFilter
    # (reference TaggerRequestHandler.java:124-125, 353-365).
    if ignore_stopwords is None:
        ignore_stopwords = dictionary.uses_stopwords
    stop = ENGLISH_STOP_WORDS if dictionary.uses_stopwords else None

    if fq_dialect not in ("spark", "solr"):
        raise ValueError(f"fq_dialect must be 'spark'|'solr', got {fq_dialect}")
    term_dict = dictionary.term_dict
    if fq:
        fqs = [fq] if isinstance(fq, str) else list(fq)
        live_df = dictionary.docs_df
        for predicate in fqs:  # AND semantics (TaggerTest.testMultipleFilterQueries)
            if fq_dialect == "solr":
                # Solr fq syntax — the reference handler's actual front
                # door (TaggerRequestHandler.java:333-351 parses request
                # fq strings through Solr's QParser framework); compiled
                # by search/localparams.solr_fq_column
                from solrtexttagger_spark.search.localparams import (
                    solr_fq_column,
                )

                live_df = live_df.filter(solr_fq_column(live_df, predicate))
            else:
                live_df = live_df.filter(predicate)
        # driver collect of the live doc-id set: bounded by the same ~1e8
        # ceiling as the broadcast dictionary itself (this whole operator
        # presumes a broadcast-sized dictionary; beyond it, use tag_join,
        # whose fq equivalent is a filter on dict_terms doc_ids)
        live = {r["doc_id"] for r in live_df.select("doc_id").collect()}
        term_dict = term_dict.filtered(live)

    if offset_adjust not in (None, "xml", "html"):
        raise ValueError(f"offset_adjust must be None|'xml'|'html', got {offset_adjust}")

    bc = spark.sparkContext.broadcast(term_dict)
    ov = overlaps
    ig = ignore_stopwords
    lim = tags_limit
    mlen = min_taggable_len
    adj = offset_adjust
    ntags = set(non_taggable_tags) if non_taggable_tags else None
    skip_invalid = on_invalid == "skip"
    skip_alt = skip_alt_tokens
    # query analysis mirrors the dictionary's index chain flags
    afold = dictionary.ascii_fold
    aposs = dictionary.possessive

    emit_match_text = match_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from solrtexttagger_spark.tagging.offsets import (
            HtmlOffsetCorrector,
            XmlOffsetCorrector,
            html_strip_tokenize,
        )

        d = bc.value
        for pdf in batches:
            out_q, out_s, out_e, out_ids, out_mt = [], [], [], [], []
            for qid, text in zip(pdf["__qid"], pdf["__text"]):
                if text is None:
                    continue
                corrector = None
                if adj == "xml":
                    try:
                        corrector = XmlOffsetCorrector(text)
                    except ValueError:
                        if skip_invalid:
                            continue
                        raise
                    tokens = html_strip_tokenize(
                        text, stopwords=stop, min_taggable_len=mlen,
                        ascii_fold=afold, possessive=aposs,
                    )
                elif adj == "html":
                    corrector = HtmlOffsetCorrector(text, ntags)
                    tokens = html_strip_tokenize(
                        text, stopwords=stop, min_taggable_len=mlen,
                        ascii_fold=afold, possessive=aposs,
                    )
                else:
                    tokens = query_analyze(
                        text, stopwords=stop, min_taggable_len=mlen,
                        ascii_fold=afold, possessive=aposs,
                    )
                # With offset correction active, the limit must count only
                # tags that SURVIVE correct_pair — the reference checks
                # tags.size() >= tagsLimit at emission, where uncorrectable
                # tags never enter the list (TaggerRequestHandler.java:176,
                # 244-276). So run the loop unlimited and cap afterwards.
                n_emitted = 0
                for s, e, ids in tag_text(
                    tokens,
                    d,
                    overlaps=ov,
                    ignore_stopwords=ig,
                    skip_alt_tokens=skip_alt,
                    tags_limit=None if corrector is not None else lim,
                ):
                    if corrector is not None:
                        pair = corrector.correct_pair(s, e)
                        if pair is None:
                            continue
                        if lim is not None and n_emitted >= lim:
                            break
                        s, e = pair
                    n_emitted += 1
                    out_q.append(qid)
                    out_s.append(s)
                    out_e.append(e)
                    out_ids.append(list(ids))
                    if emit_match_text:
                        out_mt.append(text[s:e])
            cols = {
                "qdoc_id": pd.Series(out_q, dtype="int64"),
                "start": pd.Series(out_s, dtype="int32"),
                "end": pd.Series(out_e, dtype="int32"),
                "doc_ids": pd.Series(out_ids, dtype="object"),
            }
            if emit_match_text:
                cols["match_text"] = pd.Series(out_mt, dtype="object")
            yield pd.DataFrame(cols)

    narrowed = texts_df.select(
        F.col(id_col).cast("long").alias("__qid"), F.col(text_col).alias("__text")
    )
    # matchText = inputString.substring(start, end) (java:192-193), emitted
    # directly by the UDF which already holds the text — joining back to the
    # corpus would shuffle the BIG side on qdoc_id for a substring.
    schema = _TAG_SCHEMA_MT if match_text else _TAG_SCHEMA
    return narrowed.mapInPandas(run, schema=schema)


def translate_ids(tags: DataFrame, dictionary: TagDictionary) -> DataFrame:
    """Explode doc_ids and translate to user ids: one row per (tag, id).
    Reference: docID -> uniqueKey translation, TaggerRequestHandler.java:204-226."""
    ids = dictionary.docs_df.select("doc_id", "id")
    return (
        tags.select("qdoc_id", "start", "end", F.explode("doc_ids").alias("doc_id"))
        .join(F.broadcast(ids), "doc_id")
        .select("qdoc_id", "start", "end", "id")
    )


def tag_response(
    tags: DataFrame,
    dictionary: TagDictionary,
    *,
    rows: int = 10000,
    fl: list[str] | None = None,
) -> dict:
    """Assemble the reference's response shape (S4,
    TaggerRequestHandler.java:235-241): tagsCount, the tags (ids
    translated), and the matched-docs list limited to ``rows`` with ``fl``
    column projection. Returns {'tags_count', 'tags', 'response'} with
    DataFrames left lazy except the count."""
    docs = matched_docs(tags, dictionary, rows)
    if fl:
        docs = docs.select(*fl)
    return {
        "tags_count": tags.count(),
        "tags": translate_ids(tags, dictionary),
        "response": docs,
    }


def matched_docs(
    tags: DataFrame, dictionary: TagDictionary, rows: int = 10000
) -> DataFrame:
    """The 'response' doc list: distinct matched dictionary docs in doc_id
    order, first ``rows`` (reference TaggerRequestHandler.java:278-293)."""
    return (
        tags.select(F.explode("doc_ids").alias("doc_id"))
        .distinct()
        .orderBy("doc_id")
        .limit(rows)
        .join(F.broadcast(dictionary.docs_df), "doc_id")
    )
