"""Distributed tag operator oracles — the same reference assertions as
tests/test_tagger_core.py but through the full Spark path: DataFrame
dictionary build, broadcast, mapInPandas, fq as Spark SQL predicates,
matchText, id translation, matched_docs."""

import pytest

from solrtexttagger_spark.tagging.dictionary import build_tag_dictionary
from solrtexttagger_spark.tagging.operator import matched_docs, tag, translate_ids

N = ["London", "London Business School", "Boston", "City of London", "of", "the"]


def names_df(spark, names, **extra_cols):
    rows = []
    for i, n in enumerate(names):
        row = {"id": str(i), "name": n}
        for c, vals in extra_cols.items():
            row[c] = vals[i]
        rows.append(row)
    return spark.createDataFrame(rows)


def texts_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "qdoc_id long, text string"
    )


def collect_tags(df):
    return {
        (r["qdoc_id"], r["start"], r["end"], frozenset(r["doc_ids"]))
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def whole_dict(spark):
    return build_tag_dictionary(names_df(spark, N))


def test_whole_matching_no_sub(spark, whole_dict):
    doc = "City of London Business School"
    out = tag(
        texts_df(spark, [doc]),
        whole_dict,
        overlaps="NO_SUB",
        fq="name not in ('of', 'the')",
    )
    assert collect_tags(out) == {
        (0, 0, 14, frozenset([3])),  # City of London
        (0, 8, 30, frozenset([1])),  # London Business School
    }


def test_multiple_fq_and_semantics(spark):
    # TaggerTest.testMultipleFilterQueries
    d = build_tag_dictionary(
        names_df(
            spark,
            N[:4],
            type=["city", "school", "city", "org"],
            country=["UK", "UK", "US", "UK"],
        )
    )
    doc = "City of London Business School in Boston"
    t = texts_df(spark, [doc])

    out = tag(t, d, overlaps="ALL")
    assert collect_tags(out) == {
        (0, 0, 14, frozenset([3])),
        (0, 8, 14, frozenset([0])),
        (0, 8, 30, frozenset([1])),
        (0, 34, 40, frozenset([2])),
    }

    out = tag(t, d, overlaps="ALL", fq="type = 'city'")
    assert collect_tags(out) == {
        (0, 8, 14, frozenset([0])),
        (0, 34, 40, frozenset([2])),
    }

    out = tag(t, d, overlaps="ALL", fq=["type = 'city'", "country = 'US'"])
    assert collect_tags(out) == {(0, 34, 40, frozenset([2]))}

    # same requests in SOLR fq syntax — the reference handler's actual
    # front door (fq strings through Solr's QParser framework)
    out = tag(t, d, overlaps="ALL", fq="type:city", fq_dialect="solr")
    assert collect_tags(out) == {
        (0, 8, 14, frozenset([0])),
        (0, 34, 40, frozenset([2])),
    }
    out = tag(
        t, d, overlaps="ALL",
        fq=["{!term f=type}city", "country:US"], fq_dialect="solr",
    )
    assert collect_tags(out) == {(0, 34, 40, frozenset([2]))}

    with pytest.raises(ValueError, match="fq_dialect"):
        tag(t, d, fq="type:city", fq_dialect="lucene")


def test_partial_mode_and_multiple_texts(spark):
    d = build_tag_dictionary(names_df(spark, N), mode="partial")
    t = texts_df(spark, ["school", "City of London Business School", "the"])
    out = tag(t, d, overlaps="NO_SUB", fq="name not in ('of', 'the')")
    assert collect_tags(out) == {
        (0, 0, 6, frozenset([1])),
        (1, 0, 14, frozenset([3])),
        (1, 8, 30, frozenset([1])),
    }


def test_match_text_and_translate(spark, whole_dict):
    doc = "in London today"
    out = tag(texts_df(spark, [doc]), whole_dict, match_text=True)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["match_text"] == "London"

    ids = translate_ids(out, whole_dict).collect()
    assert [(r["qdoc_id"], r["start"], r["end"], r["id"]) for r in ids] == [
        (0, 3, 9, "0")
    ]


def test_matched_docs(spark, whole_dict):
    doc = "City of London Business School"
    out = tag(
        texts_df(spark, [doc]),
        whole_dict,
        overlaps="ALL",
        fq="name not in ('of', 'the')",
    )
    md = matched_docs(out, whole_dict)
    assert {(r["doc_id"], r["name"]) for r in md.collect()} == {
        (0, "London"),
        (1, "London Business School"),
        (3, "City of London"),
    }


def test_stopword_dictionary(spark):
    d = build_tag_dictionary(
        names_df(spark, ["South of Wales", "A City A"]), use_english_stopwords=True
    )
    t = texts_df(spark, ["South of Wales", "A City A"])
    out = tag(t, d)  # ignore_stopwords defaults to True (index chain had Stop)
    assert collect_tags(out) == {
        (0, 0, 14, frozenset([0])),
        (1, 2, 6, frozenset([1])),
    }
    out = tag(t, d, ignore_stopwords=False)
    assert collect_tags(out) == {(1, 2, 6, frozenset([1]))}


def test_tags_limit(spark, whole_dict):
    doc = " ".join(["Boston"] * 20)
    out = tag(texts_df(spark, [doc]), whole_dict, tags_limit=5)
    assert out.count() == 5


def test_tag_response_shape(spark, whole_dict):
    from solrtexttagger_spark.tagging.operator import tag_response

    doc = "City of London Business School"
    out = tag(
        texts_df(spark, [doc]),
        whole_dict,
        overlaps="ALL",
        fq="name not in ('of', 'the')",
    )
    rsp = tag_response(out, whole_dict, rows=10, fl=["id", "name"])
    assert rsp["tags_count"] == 3
    assert {r["id"] for r in rsp["tags"].collect()} == {"0", "1", "3"}
    assert rsp["response"].columns == ["id", "name"]
    assert rsp["response"].count() == 3


def test_tags_limit_with_offset_adjust(spark):
    """tagsLimit must count only tags that survive offset correction —
    uncorrectable spans never enter the list (reference checks
    tags.size() >= tagsLimit at emission, TaggerRequestHandler.java:176)."""
    d = build_tag_dictionary(names_df(spark, ["start end"]))
    # first occurrence straddles </p> (uncorrectable); two later ones valid
    doc = "<doc><p>a start</p> end start end start end</doc>"
    out = tag(
        texts_df(spark, [doc]), d, overlaps="ALL", offset_adjust="xml",
        tags_limit=2,
    )
    assert out.count() == 2
    # unlimited: still exactly the 2 correctable tags (sanity)
    out_all = tag(
        texts_df(spark, [doc]), d, overlaps="ALL", offset_adjust="xml",
        tags_limit=None,
    )
    assert out_all.count() == 2


def test_ascii_fold_possessive_dictionary_chain(spark):
    """The reference's recommended gazetteer chain (QUICK_START.md:83,93:
    ASCIIFolding + EnglishPossessive) exposed on build_tag_dictionary and
    mirrored by tag() at query time: 'Göteborg' tags by 'goteborg' and
    possessives fold on both sides."""
    d = build_tag_dictionary(
        names_df(spark, ["Göteborg", "London's Eye"]),
        ascii_fold=True,
        possessive=True,
    )
    texts = texts_df(
        spark,
        [
            "visiting goteborg today",      # folded text vs accented name
            "then Göteborg's harbour",      # accented + possessive text
            "the london's eye at night",    # possessive inside phrase
            "see Göteborg’s port",     # CURLY apostrophe possessive
        ],
    )
    out = translate_ids(tag(texts, d, overlaps="ALL", tags_limit=None), d)
    got = {(r["qdoc_id"], r["start"], r["end"], r["id"]) for r in out.collect()}
    assert got == {
        (0, 9, 17, "0"),   # goteborg
        (1, 5, 15, "0"),   # Göteborg's (possessive stripped query-side)
        (2, 4, 16, "1"),   # london's eye
        # U+2019 folds to ASCII ' (ASCIIFoldingFilter parity) BEFORE the
        # possessive strip — round-2 ADVICE: NFKD alone deleted it
        (3, 4, 14, "0"),
    }
    # without the flags the accent/possessive mismatches are missed ("the
    # london's eye" still tags: apostrophes survive tokenization unfolded)
    d_plain = build_tag_dictionary(names_df(spark, ["Göteborg", "London's Eye"]))
    plain = {
        (r["qdoc_id"], r["start"], r["end"])
        for r in tag(texts, d_plain, overlaps="ALL", tags_limit=None).collect()
    }
    assert plain == {(2, 4, 16)}


def test_skip_alt_tokens_error_mode(spark, whole_dict):
    """Reference default skipAltTokens=false: a posInc==0 (stacked/synonym)
    token must raise (TaggerRequestHandler.java:123); skip mode drops it."""
    from solrtexttagger_spark.analysis.core import Token
    from solrtexttagger_spark.tagging.core import tag_text

    toks = [
        Token("boston", 1, 0, 6),
        Token("bean", 0, 0, 6),  # alternate token at the same position
        Token("town", 1, 7, 11),
    ]
    with pytest.raises(ValueError, match="alternate token"):
        tag_text(toks, whole_dict.term_dict, skip_alt_tokens=False)
    got = tag_text(toks, whole_dict.term_dict, skip_alt_tokens=True)
    assert [(s, e) for s, e, _ in got] == [(0, 6)]

    # the flag must reach the distributed operator (default False = reference
    # default; our analyzers emit no alt tokens, so both settings tag plain
    # text identically)
    texts = texts_df(spark, ["Boston and London"])
    a = collect_tags(tag(texts, whole_dict, skip_alt_tokens=False))
    b = collect_tags(tag(texts, whole_dict, skip_alt_tokens=True))
    assert a == b and len(a) == 2


def test_ldr_with_xml_offset_adjust(spark):
    """Partial-mode dictionary + LONGEST_DOMINANT_RIGHT + xmlOffsetAdjust
    combined (reference XmlInterpolationTest semantics on the reduced set):
    surviving spans corrected; the uncorrectable survivor dropped."""
    d = build_tag_dictionary(
        names_df(spark, ["london business school", "business school"]),
        mode="partial",
    )
    doc = (
        "<doc>at London Business School today,"
        " <p>plus Business</p> School later</doc>"
    )
    out = tag(
        texts_df(spark, [doc]), d,
        overlaps="LONGEST_DOMINANT_RIGHT", offset_adjust="xml", tags_limit=None,
    )
    got = sorted((r["start"], r["end"]) for r in out.collect())
    # LDR keeps 'London Business School' (len 22) and the second
    # 'Business ... School' (partial shingle, len spans the </p> boundary ->
    # uncorrectable, dropped by offset adjustment)
    assert got == [(8, 30)]
    assert doc[8:30] == "London Business School"


def test_dictionary_save_load_roundtrip(spark, tmp_path):
    """Persisted dictionary (docs + analyzed terms + config) tags
    identically to the freshly-built one, including analysis-chain flags."""
    from solrtexttagger_spark.tagging.dictionary import (
        load_tag_dictionary,
        save_tag_dictionary,
    )

    d = build_tag_dictionary(
        names_df(spark, ["Göteborg", "London Business School"]),
        ascii_fold=True,
        possessive=True,
    )
    path = str(tmp_path / "dict")
    save_tag_dictionary(d, path)
    d2 = load_tag_dictionary(spark, path)
    assert d2.mode == d.mode and d2.ascii_fold and d2.possessive
    assert d2.term_dict.postings == d.term_dict.postings

    texts = texts_df(spark, ["at goteborg and London Business School"])
    a = collect_tags(tag(texts, d, overlaps="ALL", tags_limit=None))
    b = collect_tags(tag(texts, d2, overlaps="ALL", tags_limit=None))
    assert a == b and len(a) == 2


def test_dictionary_collect_guard(spark, tmp_path):
    """build/load fail fast BEFORE collecting a gazetteer-scale analyzed
    postings map to the driver (same counted guard as LocalSearcher's
    max_blocks), pointing at the never-collected join path."""
    import pytest as _pytest

    from solrtexttagger_spark.tagging.dictionary import (
        build_tag_dictionary,
        load_tag_dictionary,
        save_tag_dictionary,
    )

    names = spark.createDataFrame(
        [("0", "hash join"), ("1", "table scan"), ("2", "sort merge")],
        "id string, name string",
    )
    with _pytest.raises(ValueError, match="join_operator.build_dict_terms"):
        build_tag_dictionary(names, max_postings=2)
    d = build_tag_dictionary(names)  # default cap: fine
    path = str(tmp_path / "dict_guarded")
    save_tag_dictionary(d, path)
    with _pytest.raises(ValueError, match="max_postings=2"):
        load_tag_dictionary(spark, path, max_postings=2)
    d2 = load_tag_dictionary(spark, path)
    assert d2.term_dict.postings == d.term_dict.postings
