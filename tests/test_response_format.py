"""Golden response-format bytes, recast from the reference's
TaggerTest.java testFormat (:66-85) and testFormatMatchText (:87-105):
the serialized XML must match the reference's pinned strings exactly
(indent=off, omitHeader=on; /tagPartial handler, overlaps=NO_SUB)."""

import json

import pytest

from solrtexttagger_spark.tagging.dictionary import build_tag_dictionary
from solrtexttagger_spark.tagging.operator import tag
from solrtexttagger_spark.tagging.response import (
    render_response_json,
    render_response_xml,
)

# TaggerTest.java N enum: ordinal ids, names with '_' -> ' '
NAMES = [
    ("0", "London"),
    ("1", "London Business School"),
    ("2", "Boston"),
    ("3", "City of London"),
]


@pytest.fixture(scope="module")
def tag_partial_dict(spark):
    names = spark.createDataFrame(NAMES, "id string, name string")
    return build_tag_dictionary(names, mode="partial")


def _tags(spark, d, text, match_text=False):
    texts = spark.createDataFrame([(0, text)], "qdoc_id long, text string")
    return tag(
        texts, d, overlaps="NO_SUB", tags_limit=None, match_text=match_text
    )


def test_format_golden_xml(spark, tag_partial_dict):
    # TaggerTest.testFormat: doc="school" -> one tag (0,6) id "1"
    got = render_response_xml(
        _tags(spark, tag_partial_dict, "school"), tag_partial_dict
    )
    expected = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<response>\n"
        '<int name="tagsCount">1</int>'
        '<arr name="tags"><lst>'
        '<int name="startOffset">0</int>'
        '<int name="endOffset">6</int>'
        '<arr name="ids"><str>1</str></arr>'
        "</lst></arr>"
        '<result name="response" numFound="1" start="0">'
        '<doc><str name="id">1</str><str name="name">London Business School</str></doc>'
        "</result>\n"
        "</response>\n"
    )
    assert got == expected


def test_format_golden_xml_match_text(spark, tag_partial_dict):
    # TaggerTest.testFormatMatchText: matchText=true adds the matched slice
    got = render_response_xml(
        _tags(spark, tag_partial_dict, "school", match_text=True),
        tag_partial_dict,
        match_text=True,
    )
    expected = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<response>\n"
        '<int name="tagsCount">1</int>'
        '<arr name="tags"><lst>'
        '<int name="startOffset">0</int>'
        '<int name="endOffset">6</int>'
        '<str name="matchText">school</str>'
        '<arr name="ids"><str>1</str></arr>'
        "</lst></arr>"
        '<result name="response" numFound="1" start="0">'
        '<doc><str name="id">1</str><str name="name">London Business School</str></doc>'
        "</result>\n"
        "</response>\n"
    )
    assert got == expected


def test_format_multi_tag_and_escaping(spark, tag_partial_dict):
    """Multiple tags serialize in document order; XML special chars escape."""
    got = render_response_xml(
        _tags(spark, tag_partial_dict, "school <City>"), tag_partial_dict
    )
    assert '<int name="tagsCount">2</int>' in got
    # tags in document order: school (0,6) then City (8,12)
    assert got.index('"startOffset">0<') < got.index('"startOffset">8<')
    assert "&lt;" not in got.split("<result")[0]  # offsets only, no text
    # doc list in doc-id order: both matched dictionary entries present
    assert got.index('London Business School') < got.index("City of London")


def test_format_json_shape(spark, tag_partial_dict):
    got = json.loads(
        render_response_json(
            _tags(spark, tag_partial_dict, "school", match_text=True),
            tag_partial_dict,
            match_text=True,
        )
    )
    assert got == {
        "tagsCount": 1,
        "tags": [
            {"startOffset": 0, "endOffset": 6, "matchText": "school", "ids": ["1"]}
        ],
        "response": {
            "numFound": 1,
            "start": 0,
            "docs": [{"id": "1", "name": "London Business School"}],
        },
    }


def test_num_found_is_total_matched_not_page_size(spark, tag_partial_dict):
    """numFound is the TOTAL matched-doc cardinality even when ``rows``
    truncates the rendered doc list (reference TaggerRequestHandler sets
    numFound from matchDocIdsBS.cardinality(), not the page size)."""
    # "school ... City" matches 2 dictionary docs; rows=1 truncates docs
    tags = _tags(spark, tag_partial_dict, "school in the City")
    got = render_response_xml(tags, tag_partial_dict, rows=1)
    assert 'numFound="2"' in got
    assert got.count("<doc>") == 1  # rendered docs still capped at rows
    gj = json.loads(render_response_json(tags, tag_partial_dict, rows=1))
    assert gj["response"]["numFound"] == 2
    assert len(gj["response"]["docs"]) == 1


def test_format_fl_projection(spark, tag_partial_dict):
    """fl limits the doc fields, like the reference's fl param (S4)."""
    got = render_response_xml(
        _tags(spark, tag_partial_dict, "school"), tag_partial_dict, fl=["id"]
    )
    assert '<doc><str name="id">1</str></doc>' in got
    assert "London Business School</str></doc>" not in got


def test_select_response_golden(spark):
    """/select writers: Solr result-block shape with numFound = TOTAL
    match cardinality (not the page size), typed fl elements, maxScore,
    and start offset; fq shrinks numFound."""
    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.select import (
        render_select_json,
        render_select_xml,
    )

    docs = [
        (0, "alpha beta gamma", "en", 10),
        (1, "alpha alpha delta", "en", 20),
        (2, "beta delta", "de", 30),
        (3, "epsilon zeta", "en", 40),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n long")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    xml = render_select_xml(idx, df, "alpha beta", fl=["lang", "n"], k=2, spark=spark)
    assert xml == (
        '<?xml version="1.0" encoding="UTF-8"?>\n<response>\n'
        '<result name="response" numFound="3" start="0" maxScore="1.2814">'
        '<doc><float name="score">1.2814</float><long name="id">0</long>'
        '<str name="lang">en</str><long name="n">10</long></doc>'
        '<doc><float name="score">0.9023</float><long name="id">1</long>'
        '<str name="lang">en</str><long name="n">20</long></doc>'
        "</result>\n</response>\n"
    )
    js = render_select_json(idx, df, "alpha beta", fl=["lang", "n"], k=2, spark=spark)
    assert js == (
        '{"response":{"numFound":3,"start":0,"maxScore":1.2814,'
        '"docs":[{"id":0,"score":1.2814,"lang":"en","n":10},'
        '{"id":1,"score":0.9023,"lang":"en","n":20}]}}'
    )
    # page 2: start offset reported, numFound unchanged
    xml2 = render_select_xml(
        idx, df, "alpha beta", fl=["lang"], k=2, start=2, spark=spark
    )
    assert 'numFound="3" start="2"' in xml2
    assert xml2.count("<doc>") == 1  # only doc 2 remains on page 2
    # fq: numFound counts only allowed matches (Solr semantics)
    en = df.where("lang = 'en'").select("doc_id")
    xml3 = render_select_xml(
        idx, df, "alpha beta", fl=["lang"], k=10, allowed_docs=en, spark=spark
    )
    assert 'numFound="2"' in xml3 and "de" not in xml3


def test_select_single_job_and_max_score(spark):
    """Round-4 verdict #6 + round-5 advice: one action per /select request
    (numFound/maxScore ride the scoring pass — no second corpus job), and
    maxScore is the rank-1 score even when start pages past it; an empty
    page beyond the matches still reports numFound."""
    # patch the CONCRETE class (pyspark.sql.DataFrame is an ABC in Spark 4)
    from pyspark.sql.classic.dataframe import DataFrame

    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.select import render_select_json, render_select_xml

    docs = [
        (0, "alpha beta gamma", "en", 10),
        (1, "alpha alpha delta", "en", 20),
        (2, "beta delta", "de", 30),
        (3, "epsilon zeta", "en", 40),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n long")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    idx.postings.persist().count()
    # warm the index's one-time doc_count/avgdl stats (per-index, not
    # per-request) so the counter below sees only the request's own action
    render_select_xml(idx, df, "alpha", fl=["lang"], k=1, spark=spark)

    calls = []
    orig = DataFrame.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    try:
        DataFrame.collect = counting
        xml2 = render_select_xml(
            idx, df, "alpha beta", fl=["lang"], k=2, start=2, spark=spark
        )
    finally:
        DataFrame.collect = orig
    assert len(calls) == 1  # page + numFound + maxScore in ONE action
    # maxScore = the rank-1 score (1.2814), NOT the page-2 head score
    assert 'numFound="3" start="2" maxScore="1.2814"' in xml2
    assert xml2.count("<doc>") == 1
    # empty page past the matches: numFound/maxScore still real
    import json

    js = json.loads(
        render_select_json(idx, df, "alpha beta", fl=["lang"], k=2, start=10, spark=spark)
    )
    assert js["response"]["numFound"] == 3
    assert js["response"]["maxScore"] == 1.2814
    assert js["response"]["docs"] == []


def test_select_fl_with_id_column(spark):
    """fl containing the id column must not produce a duplicate/ambiguous
    column (round-5 advice): it is dropped defensively on every path."""
    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.select import render_select_xml, select_topk

    df = spark.createDataFrame(
        [(0, "alpha beta", "en"), (1, "alpha", "de")],
        "doc_id long, text string, lang string",
    )
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    out = select_topk(idx, df, [(0, "alpha")], fl=["doc_id", "lang"], k=2, spark=spark)
    assert out.columns == ["query_id", "rank", "doc_id", "score", "lang"]
    assert out.count() == 2
    xml = render_select_xml(idx, df, "alpha", fl=["doc_id", "lang"], k=2, spark=spark)
    assert xml.count('name="id"') == 2  # id emitted once per doc


def test_select_facet_sections_golden(spark):
    """facet=true sections in the golden /select writers: facet_fields
    (count desc, value asc) + facet_ranges (zero-filled buckets with
    gap/start/end), both over the FULL match set and fq-aware."""
    import json

    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.select import render_select_json, render_select_xml

    docs = [
        (0, "alpha beta gamma", "en", 10),
        (1, "alpha alpha delta", "en", 20),
        (2, "beta delta", "de", 30),
        (3, "epsilon zeta", "en", 40),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n long")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    xml = render_select_xml(
        idx, df, "alpha beta", fl=["lang"], k=1,
        facet_cols=["lang"], facet_ranges=[("n", 0, 40, 20)], spark=spark,
    )
    assert (
        '<lst name="facet_counts"><lst name="facet_fields">'
        '<lst name="lang"><int name="en">2</int><int name="de">1</int></lst>'
        '</lst><lst name="facet_ranges">'
        '<lst name="n"><lst name="counts">'
        '<int name="0">1</int><int name="20">2</int></lst>'
        '<int name="gap">20</int><int name="start">0</int>'
        "<int name=\"end\">40</int></lst></lst></lst>\n" in xml
    )
    # the plain result block is unchanged by faceting
    assert 'numFound="3" start="0" maxScore="1.2814"' in xml
    js = json.loads(
        render_select_json(
            idx, df, "alpha beta", fl=["lang"], k=1,
            facet_cols=["lang"], facet_ranges=[("n", 0, 40, 20)], spark=spark,
        )
    )
    assert js["facet_counts"]["facet_fields"]["lang"] == ["en", 2, "de", 1]
    assert js["facet_counts"]["facet_ranges"]["n"] == {
        "counts": ["0", 1, "20", 2], "gap": 20, "start": 0, "end": 40,
    }
    # fq restricts the facet domain (Solr: facets respect filter queries)
    en = df.where("lang = 'en'").select("doc_id")
    js2 = json.loads(
        render_select_json(
            idx, df, "alpha beta", fl=["lang"], k=1,
            facet_cols=["lang"], allowed_docs=en, spark=spark,
        )
    )
    assert js2["facet_counts"]["facet_fields"]["lang"] == ["en", 2]


def test_select_highlight_section_golden(spark):
    """hl=true appends Solr's highlighting block: one best-window snippet
    per RETURNED doc (page-aware), XML-escaped, keyed by doc id."""
    import json

    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.select import render_select_json, render_select_xml

    docs = [
        (0, "alpha beta gamma", "en"),
        (1, "alpha alpha delta", "en"),
        (2, "beta <b> delta", "de"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    xml = render_select_xml(
        idx, df, "alpha beta", fl=["lang"], k=2, hl=True, hl_window=2, spark=spark
    )
    assert (
        '<lst name="highlighting">'
        '<lst name="0"><arr name="text"><str>alpha beta</str></arr></lst>'
        '<lst name="1"><arr name="text"><str>alpha alpha</str></arr></lst>'
        "</lst>\n" in xml
    )
    js = json.loads(
        render_select_json(
            idx, df, "beta delta", fl=["lang"], k=1, hl=True, hl_window=3, spark=spark
        )
    )
    # doc 2 ranks first for "beta delta"; markup in the snippet is raw in
    # JSON (json escaping suffices) but XML-escaped in the XML writer
    assert js["highlighting"] == {"2": {"text": ["beta <b> delta"]}}
    xml2 = render_select_xml(
        idx, df, "beta delta", fl=["lang"], k=1, hl=True, hl_window=3, spark=spark
    )
    assert "<str>beta &lt;b&gt; delta</str>" in xml2


def test_select_fully_dressed_job_budget(spark):
    """Round-6 (r5 verdict #2): a page + field-facet + MULTIPLE
    facet.range + hl request runs exactly 3 actions — the page, ONE
    combined facet job covering every section, and one tiny snippet job
    that reuses the already-ranked page (no bm25 re-run) — matching
    Solr's one-DocSet-per-request component model. Output stays
    byte-identical to the per-section jobs (golden tests above)."""
    from pyspark.sql.classic.dataframe import DataFrame

    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.select import render_select_xml

    docs = [
        (0, "alpha beta gamma", "en", 10, 1),
        (1, "alpha alpha delta", "en", 20, 2),
        (2, "beta delta", "de", 30, 3),
        (3, "epsilon zeta", "en", 40, 4),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, n long, m long"
    )
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    idx.postings.persist().count()
    render_select_xml(idx, df, "alpha", fl=["lang"], k=1, spark=spark)  # warm stats

    calls = []
    orig = DataFrame.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    try:
        DataFrame.collect = counting
        xml = render_select_xml(
            idx, df, "alpha beta", fl=["lang"], k=2,
            facet_cols=["lang"],
            facet_ranges=[("n", 0, 40, 20), ("m", 0, 4, 2)],
            hl=True, spark=spark,
        )
    finally:
        DataFrame.collect = orig
        idx.postings.unpersist()
    assert len(calls) == 3  # page + one facet job (all sections) + hl
    # both range columns rendered, zero-filled, from the one job
    assert '<lst name="n"><lst name="counts">' in xml
    assert '<lst name="m"><lst name="counts">' in xml
    assert '<lst name="highlighting">' in xml


def test_facet_null_bucket_and_same_column_ranges(spark):
    """Round-6 advice: (a) a NULL facet value tying a string value on
    count must not TypeError the sort (NULL sorts after, renders with an
    empty XML name / JSON null); (b) two facet.range requests on the
    same column both appear when the second carries an explicit output
    key (Solr's {!key=} local param), and colliding keys raise."""
    import json

    import pytest

    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.select import (
        _facet_sections,
        render_select_json,
        render_select_xml,
    )

    docs = [
        (0, "alpha beta", None, 10),
        (1, "alpha gamma", "en", 20),
        (2, "alpha delta", "de", 30),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n long")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    # every lang bucket (None, en, de) has count 1 -> the sort ties
    # None against strings; en/de sort before the NULL bucket
    fields, ranges, _iv = _facet_sections(
        idx, df, "alpha", ["lang"],
        [("n", 0, 40, 20), ("n", 0, 30, 10, "n_fine")], None, spark,
    )
    assert fields["lang"] == [("de", 1), ("en", 1), (None, 1)]
    assert set(ranges) == {"n", "n_fine"}
    assert ranges["n"][3] == [(0, 1), (20, 2)]
    assert ranges["n_fine"][3] == [(0, 0), (10, 1), (20, 1)]
    xml = render_select_xml(
        idx, df, "alpha", fl=[], k=1, facet_cols=["lang"],
        facet_ranges=[("n", 0, 40, 20), ("n", 0, 30, 10, "n_fine")], spark=spark,
    )
    assert '<int name="">1</int>' in xml  # NULL bucket, empty name
    assert '<lst name="n"><lst name="counts">' in xml
    assert '<lst name="n_fine"><lst name="counts">' in xml
    js = json.loads(render_select_json(
        idx, df, "alpha", fl=[], k=1, facet_cols=["lang"],
        facet_ranges=[("n", 0, 40, 20), ("n", 0, 30, 10, "n_fine")], spark=spark,
    ))
    assert js["facet_counts"]["facet_fields"]["lang"] == ["de", 1, "en", 1, None, 1]
    assert set(js["facet_counts"]["facet_ranges"]) == {"n", "n_fine"}
    with pytest.raises(ValueError, match="duplicate facet.range"):
        _facet_sections(
            idx, df, "alpha", [], [("n", 0, 40, 20), ("n", 0, 30, 10)],
            None, spark,
        )


def test_facet_query_counts(spark):
    """Solr facet.query (the third facet type): each sub-query is a full
    boolean-syntax query counted over the BASE request's match domain
    (main q bag-matched AND fq) — never over the whole corpus. All
    sub-queries resolve through ONE boolean_matched_scores pass."""
    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.facets import facet_query_counts

    docs = [
        (0, "alpha beta gamma", "en", 10),
        (1, "alpha alpha delta", "en", 20),
        (2, "beta delta", "de", 30),
        (3, "epsilon zeta", "en", 40),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n long")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)

    out = facet_query_counts(
        idx, "alpha beta",  # base domain: docs 0,1,2
        ["delta", "+alpha -beta", '"alpha beta"', "epsilon"],
        spark=spark,
    )
    # input order preserved; epsilon's only doc (3) is OUTSIDE the base
    # domain -> 0, exactly Solr's DocSet-intersection semantics
    assert list(out.items()) == [
        ("delta", 2), ("+alpha -beta", 1), ('"alpha beta"', 1), ("epsilon", 0)
    ]
    # fq shrinks the domain too (docs 0,1 remain)
    en = df.where("lang = 'en'").select("doc_id")
    out2 = facet_query_counts(
        idx, "alpha beta", ["delta", "beta"], allowed_docs=en, spark=spark
    )
    assert out2 == {"delta": 1, "beta": 1}
    assert facet_query_counts(idx, "alpha", [], spark=spark) == {}


def test_select_facet_queries_golden(spark):
    """facet.query block in the golden writers: first inside facet_counts
    (Solr's section order), one <int name="<query>"> per sub-query with
    the query string attr-escaped; JSON mirrors {"facet_queries": {q: n}}.
    The block costs exactly ONE extra action on a dressed request."""
    import json

    from pyspark.sql.classic.dataframe import DataFrame

    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.select import (
        render_select_json,
        render_select_xml,
    )

    docs = [
        (0, "alpha beta gamma", "en", 10),
        (1, "alpha alpha delta", "en", 20),
        (2, "beta delta", "de", 30),
        (3, "epsilon zeta", "en", 40),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n long")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    idx.postings.persist().count()
    render_select_xml(idx, df, "alpha", fl=[], k=1, spark=spark)  # warm stats

    calls = []
    orig = DataFrame.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    try:
        DataFrame.collect = counting
        xml = render_select_xml(
            idx, df, "alpha beta", fl=["lang"], k=2,
            facet_cols=["lang"], facet_ranges=[("n", 0, 40, 20)],
            facet_queries=["delta", '+alpha "beta gamma"'],
            hl=True, spark=spark,
        )
    finally:
        DataFrame.collect = orig
    # 3-action dressed budget + exactly 1 for ALL facet.query sub-queries
    assert len(calls) == 4
    assert (
        '<lst name="facet_counts"><lst name="facet_queries">'
        '<int name="delta">2</int>'
        '<int name="+alpha &quot;beta gamma&quot;">1</int>'
        '</lst><lst name="facet_fields">'
    ) in xml
    js = json.loads(render_select_json(
        idx, df, "alpha beta", fl=["lang"], k=2, facet_cols=["lang"],
        facet_queries=["delta", "epsilon"], spark=spark,
    ))
    assert js["facet_counts"]["facet_queries"] == {"delta": 2, "epsilon": 0}


def test_facet_intervals(spark):
    """Solr facet.interval: arbitrary, possibly OVERLAPPING interval sets
    with [inclusive]/(exclusive) brackets, * open endpoints and {!key=}
    aliases — zero extra actions (rides the one combined facet job)."""
    import json

    import pytest as _pytest
    from pyspark.sql.classic.dataframe import DataFrame

    from solrtexttagger_spark.index.build import build_index
    from solrtexttagger_spark.search.facets import parse_interval
    from solrtexttagger_spark.search.select import (
        render_select_json,
        render_select_xml,
    )

    assert parse_interval("[0,10)") == ("[0,10)", 0, 10, True, False)
    assert parse_interval("(5,*]") == ("(5,*]", 5, None, False, True)
    assert parse_interval("{!key=low}[*,7]") == ("low", None, 7, True, True)
    with _pytest.raises(ValueError, match="bad facet.interval"):
        parse_interval("0 TO 10")

    docs = [
        (0, "alpha beta", "en", 5),
        (1, "alpha gamma", "en", 10),
        (2, "alpha delta", "de", 25),
        (3, "epsilon", "en", 40),  # outside the match set
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string, n long")
    idx = build_index(df.select("doc_id", "text"), num_segments=2)
    idx.postings.persist().count()
    render_select_xml(idx, df, "alpha", fl=[], k=1, spark=spark)  # warm

    calls = []
    orig = DataFrame.collect

    def counting(self):
        calls.append(1)
        return orig(self)

    try:
        DataFrame.collect = counting
        js = json.loads(render_select_json(
            idx, df, "alpha", fl=[], k=2,
            facet_cols=["lang"],
            facet_intervals=[
                ("n", ["[0,10)", "[5,25]", "(25,*]", "{!key=none}(*,0)"]),
            ],
            spark=spark,
        ))
    finally:
        DataFrame.collect = orig
    assert len(calls) == 2  # page + ONE combined facet job, intervals free
    # overlapping sets: doc 1 (n=10) counts in [5,25] but not [0,10);
    # doc 0 (n=5) counts in BOTH [0,10) and [5,25]
    assert js["facet_counts"]["facet_intervals"]["n"] == {
        "[0,10)": 1, "[5,25]": 3, "(25,*]": 0, "none": 0
    }
    xml = render_select_xml(
        idx, df, "alpha", fl=[], k=1,
        facet_intervals=[("n", ["[0,10)", "{!key=hi}(10,*]"])], spark=spark,
    )
    assert (
        '<lst name="facet_intervals"><lst name="n">'
        '<int name="[0,10)">1</int><int name="hi">1</int></lst></lst>'
    ) in xml
    # duplicate keys / duplicate field requests raise like facet.range
    with _pytest.raises(ValueError, match="duplicate facet.interval output"):
        render_select_json(idx, df, "alpha", fl=[], k=1,
                           facet_intervals=[("n", ["[0,1)", "[0,1)"])],
                           spark=spark)
    with _pytest.raises(ValueError, match="duplicate facet.interval field"):
        render_select_json(idx, df, "alpha", fl=[], k=1,
                           facet_intervals=[("n", ["[0,1)"]), ("n", ["[1,2)"])],
                           spark=spark)
