"""XML/HTML offset-correction oracles, recast from the reference's
XmlInterpolationTest.java and HtmlInterpolationTest.java: after tagging a
structured document, inserting an anchor element at the corrected offsets
must yield well-formed markup; impossible spans must be dropped."""

from xml.parsers import expat

import pytest

from solrtexttagger_spark.analysis.core import query_analyze
from solrtexttagger_spark.tagging.core import TermDict, tag_text
from solrtexttagger_spark.tagging.offsets import (
    HtmlOffsetCorrector,
    XmlOffsetCorrector,
    html_strip_tokenize,
)

DICT = TermDict.from_pairs([("start end", 0)])


def validate_xml(xml: str):
    p = expat.ParserCreate()
    p.Parse(xml.encode("utf-8"), True)  # raises ExpatError if malformed


def run_tag(doc_text, mode, non_taggable=None):
    tokens = html_strip_tokenize(doc_text)
    tags = tag_text(tokens, DICT, overlaps="LONGEST_DOMINANT_RIGHT")
    if mode == "xml":
        corrector = XmlOffsetCorrector(doc_text)
    else:
        corrector = HtmlOffsetCorrector(doc_text, non_taggable)
    out = []
    for s, e, ids in tags:
        pair = corrector.correct_pair(s, e)
        if pair is not None:
            out.append(pair)
    return out


def assert_xml_tag(doc_text, expected, mode="xml", non_taggable=None):
    got = run_tag(doc_text, mode, non_taggable)
    if not expected:
        assert got == [], f"{doc_text!r} -> {got}"
    else:
        assert len(got) == 1, f"{doc_text!r} -> {got}"
        s, e = got[0]
        anchored = doc_text[:s] + "<A id='x'>" + doc_text[s:e] + "</A>" + doc_text[e:]
        if mode == "xml":
            validate_xml(anchored)


class TestXmlInterpolation:  # XmlInterpolationTest.test
    CASES_TRUE = [
        "<doc>before start <!-- c --> end after</doc>",
        "<doc>before start <br/> end after</doc>",
        "<doc>before <em>start</em> <b>end</b> after</doc>",
        "<doc>before <em>start</em> end after</doc>",
        "<doc>before start end<em> after</em></doc>",
        "<doc><em>before </em>start end after</doc>",
        "<doc>before <b> <em>start</em> </b> end after</doc>",
        "<doc>before <b> <em>start</em> </b> <em>  end  </em> after</doc>",
        "<doc>before <em a='A' b='B'>start</em> <b a='A' b='B'>end</b> after</doc>",
    ]
    CASES_FALSE = [
        "<doc><p>before start</p> end after</doc>",
        "<doc>before start <p>end after</p> </doc>",
    ]

    @pytest.mark.parametrize("doc", CASES_TRUE)
    def test_valid_insertion(self, doc):
        assert_xml_tag(doc, True)

    @pytest.mark.parametrize("doc", CASES_FALSE)
    def test_impossible_spans_dropped(self, doc):
        assert_xml_tag(doc, False)

    def test_invalid_xml_raises(self):
        with pytest.raises(ValueError):
            XmlOffsetCorrector("notXml")


class TestHtmlInterpolation:  # HtmlInterpolationTest.testHtml
    CASES_TRUE = [
        "<doc>before start <br> end after</doc>",  # br assumed empty
        "start end",  # no wrapping tags
        "start end <em>other text</em>",
        "start end<em> other text</em>",
        "<em>other text</em> start end",
        "start <td/> end",
    ]

    @pytest.mark.parametrize("doc", CASES_TRUE)
    def test_html(self, doc):
        assert_xml_tag(doc, True, mode="html")

    def test_non_taggable(self):  # HtmlInterpolationTest.testHtmlNonTaggable
        nt = {"a", "sub"}
        assert_xml_tag("start end", True, mode="html", non_taggable=nt)
        assert_xml_tag("start <a>end</a>", False, mode="html", non_taggable=nt)
        assert_xml_tag("<a>start</a> end", False, mode="html", non_taggable=nt)
        assert_xml_tag(
            "<doc><a>before </a>start <br> end<a> after</a></doc>",
            True,
            mode="html",
            non_taggable=nt,
        )
        assert_xml_tag(
            "<doc><a>before <a>inner</a> </a>start <br> end<a> after</a></doc>",
            True,
            mode="html",
            non_taggable=nt,
        )


class TestStripTokenizer:
    def test_plain_offsets(self):
        doc = "<doc>before <em>start</em> end after</doc>"
        toks = html_strip_tokenize(doc)
        terms = {t.term: (t.start, t.end) for t in toks}
        assert terms["start"] == (doc.index("start"), doc.index("start") + 5)
        assert terms["end"] == (doc.index(" end") + 1, doc.index(" end") + 4)

    def test_entity_spans(self):
        # pinned by XmlInterpolationTest.testLuceneHtmlFilterBehavior:
        # a token containing an entity spans the whole entity
        doc = "<doc>start en&#x64;</doc>"
        toks = html_strip_tokenize(doc)
        end_tok = [t for t in toks if t.term == "end"][0]
        assert doc[end_tok.start : end_tok.end] == "en&#x64;"

        doc2 = "<doc>&#x73;tart end</doc>"
        toks2 = html_strip_tokenize(doc2)
        start_tok = [t for t in toks2 if t.term == "start"][0]
        assert doc2[start_tok.start : start_tok.end] == "&#x73;tart"

    def test_named_entities(self):
        doc = "a&nbsp;b &mdash; c"
        toks = html_strip_tokenize(doc)
        assert [t.term for t in toks] == ["a", "b", "c"]

    def test_unknown_entity_literal(self):
        toks = html_strip_tokenize("x &foo; y")
        assert [t.term for t in toks] == ["x", "foo", "y"]


def test_spark_operator_xml_mode(spark):
    from solrtexttagger_spark.tagging.dictionary import build_tag_dictionary
    from solrtexttagger_spark.tagging.operator import tag

    d = build_tag_dictionary(
        spark.createDataFrame([("0", "start end")], "id string, name string")
    )
    texts = spark.createDataFrame(
        [
            (0, "<doc>before <em>start</em> <b>end</b> after</doc>"),
            (1, "<doc><p>before start</p> end after</doc>"),
        ],
        "qdoc_id long, text string",
    )
    out = tag(
        texts, d, overlaps="LONGEST_DOMINANT_RIGHT", offset_adjust="xml",
        match_text=True,
    ).collect()
    assert len(out) == 1 and out[0]["qdoc_id"] == 0
    doc = "<doc>before <em>start</em> <b>end</b> after</doc>"
    s, e = out[0]["start"], out[0]["end"]
    validate_xml(doc[:s] + "<A>" + doc[s:e] + "</A>" + doc[e:])
    assert out[0]["match_text"] == doc[s:e]

    # invalid xml: skip mode drops the doc, error mode raises
    bad = spark.createDataFrame([(0, "notXml <<<")], "qdoc_id long, text string")
    assert tag(bad, d, offset_adjust="xml", on_invalid="skip").count() == 0


# --- randomized structural property (recast of XmlInterpolationTest's
# validating-parser round trip): for random well-formed XML around random
# dictionary text, every corrected tag insertion must stay well-formed ---
import random as _random


def _random_xml(rng):
    words = ["start", "end", "alpha", "beta", "gamma", "x1"]
    tags = ["a", "b", "em", "p"]

    def element(depth):
        name = rng.choice(tags)
        attrs = " id='%d'" % rng.randint(0, 9) if rng.random() < 0.3 else ""
        n = rng.randint(0, 3 if depth < 2 else 0)
        inner = []
        for _ in range(rng.randint(1, 4)):
            inner.append(" ".join(rng.choice(words) for _ in range(rng.randint(0, 3))))
        children = [element(depth + 1) for _ in range(n)]
        rng.shuffle(children)
        body_parts = inner + children
        rng.shuffle(body_parts)
        if rng.random() < 0.15:
            body_parts.insert(rng.randrange(len(body_parts) + 1), "<!-- c -->")
        if rng.random() < 0.1:
            body_parts.insert(rng.randrange(len(body_parts) + 1), "<br/>")
        return f"<{name}{attrs}>" + " ".join(body_parts) + f"</{name}>"

    return "<doc>" + element(0) + "</doc>"


@pytest.mark.parametrize("seed", range(25))
def test_random_xml_interpolation_property(seed):
    rng = _random.Random(1000 + seed)
    doc = _random_xml(rng)
    d = TermDict.from_pairs(
        [("start end", 0), ("alpha", 1), ("beta gamma", 2), ("end", 3)]
    )
    tokens = html_strip_tokenize(doc)
    corrector = XmlOffsetCorrector(doc)
    for s, e, _ids in tag_text(tokens, d, overlaps="ALL", tags_limit=None):
        pair = corrector.correct_pair(s, e)
        if pair is None:
            continue
        cs, ce = pair
        anchored = doc[:cs] + "<A>" + doc[cs:ce] + "</A>" + doc[ce:]
        validate_xml(anchored)  # raises if the insertion broke the document
