"""Golden response writers: serialize a tagging result into the reference's
exact Solr XML response bytes (and a JSON equivalent).

The reference pins the serialized format byte-for-byte in
TaggerTest.java:66-105 (testFormat / testFormatMatchText) — tagsCount, the
tags array with startOffset/endOffset[/matchText]/ids, and the matched-docs
result block with numFound/start. tests/test_response_format.py recasts
those assertions against this writer.

A response writer renders ONE request's tags, so the driver-side collect()
here is the operator's contract, not a scale hazard: the inputs are a
single text's tags (bounded by tagsLimit) and the matched-doc list
(bounded by ``rows``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from solrtexttagger_spark.tagging.dictionary import TagDictionary
from solrtexttagger_spark.tagging.operator import matched_docs


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _gather(tags: DataFrame, dictionary: TagDictionary, rows: int, fl):
    """Collect the request's tags (document order), the doc_id -> user-id
    translation for exactly the matched docs, and the matched-doc rows.
    num_found is the TOTAL matched-doc count (reference
    TaggerRequestHandler sets numFound to matchDocIdsBS.cardinality()),
    independent of the ``rows`` truncation of the rendered doc list —
    idmap already covers every matched doc (tag ids must all translate),
    so its size IS that cardinality with no extra job."""
    trows = tags.orderBy("start", "end").collect()
    matched = tags.select(F.explode("doc_ids").alias("doc_id")).distinct()
    idmap = {
        r["doc_id"]: r["id"]
        for r in matched.join(
            F.broadcast(dictionary.docs_df.select("doc_id", "id")), "doc_id"
        ).collect()
    }
    docs = matched_docs(tags, dictionary, rows)
    fields = fl or [c for c in docs.columns if c != "doc_id"]
    drows = docs.select(*fields).collect()
    return trows, idmap, fields, drows, len(idmap)


def render_response_xml(
    tags: DataFrame,
    dictionary: TagDictionary,
    *,
    rows: int = 10000,
    fl: list[str] | None = None,
    match_text: bool = False,
) -> str:
    """The reference's XML response, byte-identical to the strings pinned in
    TaggerTest.java:72-84 (and :92-104 with matchText): Solr XMLWriter
    layout with indent=off, omitHeader=on."""
    trows, idmap, fields, drows, num_found = _gather(tags, dictionary, rows, fl)
    out = ['<?xml version="1.0" encoding="UTF-8"?>\n<response>\n']
    out.append(f'<int name="tagsCount">{len(trows)}</int>')
    out.append('<arr name="tags">')
    for t in trows:
        out.append("<lst>")
        out.append(f'<int name="startOffset">{t["start"]}</int>')
        out.append(f'<int name="endOffset">{t["end"]}</int>')
        if match_text:
            out.append(f'<str name="matchText">{_esc(t["match_text"])}</str>')
        out.append('<arr name="ids">')
        for d in t["doc_ids"]:  # posting (internal doc id) order, like Lucene
            out.append(f"<str>{_esc(idmap[d])}</str>")
        out.append("</arr></lst>")
    out.append("</arr>")
    out.append(f'<result name="response" numFound="{num_found}" start="0">')
    for r in drows:
        out.append("<doc>")
        for f_ in fields:
            out.append(f'<str name="{f_}">{_esc(r[f_])}</str>')
        out.append("</doc>")
    out.append("</result>\n</response>\n")
    return "".join(out)


def render_response_json(
    tags: DataFrame,
    dictionary: TagDictionary,
    *,
    rows: int = 10000,
    fl: list[str] | None = None,
    match_text: bool = False,
) -> str:
    """JSON equivalent (Solr JSON writer shape with json.nl=map semantics):
    {"tagsCount": N, "tags": [{"startOffset", "endOffset"[, "matchText"],
    "ids": [...]}], "response": {"numFound", "start", "docs": [...]}}."""
    trows, idmap, fields, drows, num_found = _gather(tags, dictionary, rows, fl)
    tag_objs = []
    for t in trows:
        o = {"startOffset": t["start"], "endOffset": t["end"]}
        if match_text:
            o["matchText"] = t["match_text"]
        o["ids"] = [idmap[d] for d in t["doc_ids"]]
        tag_objs.append(o)
    payload = {
        "tagsCount": len(trows),
        "tags": tag_objs,
        "response": {
            "numFound": num_found,
            "start": 0,
            "docs": [{f_: r[f_] for f_ in fields} for r in drows],
        },
    }
    return json.dumps(payload, separators=(",", ":"))
