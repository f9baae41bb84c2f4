"""Analysis-chain oracles, recast from the reference unit tests
(ConcatenateFilterTest.java:33-50; Tagger2Test offset tests)."""

from solrtexttagger_spark.analysis.core import (
    ENGLISH_STOP_WORDS,
    concatenate,
    index_analyze_shingles,
    index_analyze_whole,
    query_analyze,
    shingles,
    tokenize,
)


def test_concatenate_single_token():
    # ConcatenateFilterTest: whole stream -> exactly one space-joined term
    toks = [t.term for t in query_analyze("Sample Text phrase")]
    assert concatenate(toks) == "sample text phrase"


def test_index_analyze_whole():
    assert index_analyze_whole("London Business School") == "london business school"
    assert index_analyze_whole("City of London") == "city of london"
    # stop filtering at index time (tagStop field type)
    assert (
        index_analyze_whole("South of Wales", stopwords=ENGLISH_STOP_WORDS)
        == "south wales"
    )
    assert index_analyze_whole("A City A", stopwords=ENGLISH_STOP_WORDS) == "city"


def test_tokenize_offsets():
    toks = tokenize("City of London")
    assert toks == [("City", 0, 4), ("of", 5, 7), ("London", 8, 14)]


def test_query_analyze_stop_gap():
    # stop removal bumps the next token's position increment (gap)
    toks = query_analyze("South of Wales", stopwords=ENGLISH_STOP_WORDS)
    assert [(t.term, t.pos_inc, t.start, t.end) for t in toks] == [
        ("south", 1, 0, 5),
        ("wales", 2, 9, 14),
    ]


def test_query_analyze_multibyte():
    # Tagger2Test.testMultibyteChar: U+2019 quote, offsets must be code-point
    text = "He mentionned ’Obama’ in the White House"
    toks = query_analyze(text)
    obama = [t for t in toks if t.term == "obama"][0]
    assert (obama.start, obama.end) == (15, 20)
    assert text[obama.start : obama.end] == "Obama"


def test_query_analyze_taggable_min_len():
    # WordLengthTaggingFilter minLength=4 (taggingattribute schema.xml:66)
    toks = query_analyze("He lived in San Francisco.", min_taggable_len=4)
    assert [(t.term, t.taggable) for t in toks] == [
        ("he", False),
        ("lived", True),
        ("in", False),
        ("san", False),
        ("francisco", True),
    ]


def test_max_token_length_gap():
    long_word = "x" * 300
    toks = query_analyze(f"San {long_word} Francisco")
    assert [(t.term, t.pos_inc) for t in toks] == [("san", 1), ("francisco", 2)]


def test_shingles():
    out = shingles(["a", "b", "c"], max_shingle=10)
    assert out == ["a", "a b", "a b c", "b", "b c", "c"]
    out2 = shingles(["a", "b", "c"], max_shingle=2)
    assert out2 == ["a", "a b", "b", "b c", "c"]


def test_index_analyze_shingles():
    out = index_analyze_shingles("London Business School")
    assert "london" in out and "london business school" in out and "school" in out
    assert len(out) == 6


def test_fold_ascii_punctuation():
    """ASCIIFoldingFilter folds non-decomposable punctuation to ASCII
    (curly quotes/dashes); NFKD alone would DELETE them, breaking
    curly-apostrophe possessives (round-2 ADVICE)."""
    from solrtexttagger_spark.analysis.core import fold_ascii, strip_possessive

    assert fold_ascii("Göteborg’s") == "Goteborg's"
    assert fold_ascii("“quoted”") == '"quoted"'
    assert fold_ascii("en–dash—em") == "en-dash-em"
    # fold-then-strip (the query_analyze order) now strips the possessive
    assert strip_possessive(fold_ascii("Göteborg’s".lower())) == "goteborg"
    # accents still fold, ASCII passes through
    assert fold_ascii("café") == "cafe"
    assert fold_ascii("plain's") == "plain's"


class TestAnalyzeStages:
    """admin/analysis per-stage view: final stage must be IDENTICAL to
    the one-pass query_analyze under every knob combination."""

    def test_final_stage_equals_query_analyze(self):
        from itertools import product

        from solrtexttagger_spark.analysis.core import (
            ENGLISH_STOP_WORDS, analyze_stages, query_analyze,
        )

        text = "The Göteborg’s City of London Business-School in 2024"
        for lower, fold, poss, stop, mlen in product(
            (True, False), (True, False), (True, False),
            (None, ENGLISH_STOP_WORDS), (None, 3),
        ):
            kwargs = dict(lowercase=lower, ascii_fold=fold,
                          possessive=poss, stopwords=stop,
                          min_taggable_len=mlen)
            stages = analyze_stages(text, **kwargs)
            assert stages[-1][1] == query_analyze(text, **kwargs), kwargs

    def test_stage_progression(self):
        from solrtexttagger_spark.analysis.core import (
            ENGLISH_STOP_WORDS, analyze_stages,
        )

        stages = dict(analyze_stages(
            "The Göteborg’s Cafés",
            lowercase=True, ascii_fold=True, possessive=True,
            stopwords=ENGLISH_STOP_WORDS,
        ))
        assert [t.term for t in stages["StandardTokenizer"]] == [
            "The", "Göteborg’s", "Cafés"]
        assert [t.term for t in stages["LowerCaseFilter"]] == [
            "the", "göteborg’s", "cafés"]
        assert [t.term for t in stages["ASCIIFoldingFilter"]] == [
            "the", "goteborg's", "cafes"]
        assert [t.term for t in stages["EnglishPossessiveFilter"]] == [
            "the", "goteborg", "cafes"]
        # "the" dropped -> next survivor carries the position gap
        stop = stages["StopFilter"]
        assert [t.term for t in stop] == ["goteborg", "cafes"]
        assert stop[0].pos_inc == 2 and stop[1].pos_inc == 1
        # offsets always point at the ORIGINAL text
        assert stop[0].start == 4 and stop[0].end == 14

    def test_only_configured_stages_appear(self):
        from solrtexttagger_spark.analysis.core import analyze_stages

        names = [n for n, _ in analyze_stages("A b", lowercase=False)]
        assert names == ["StandardTokenizer"]
        names = [n for n, _ in analyze_stages("A b", min_taggable_len=2)]
        assert names == ["StandardTokenizer", "LowerCaseFilter",
                         "WordLengthTaggingFilter"]
