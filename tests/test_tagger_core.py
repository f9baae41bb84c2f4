"""Tagger-algorithm oracles, recast from the reference's JUnit suites:
TaggerTest.java (partial/whole/sub-tag/fq), Tagger2Test.java (LDR, stopwords,
multibyte), TaggingAttributeTest.java (taggable), RandomizedTaggerTest.java
(brute-force property). Pure Python — no Spark — so they pin the algorithm
itself; tests/test_tagger_spark.py pins the distributed operator.
"""

import random

import pytest

from solrtexttagger_spark.analysis.core import (
    ENGLISH_STOP_WORDS,
    index_analyze_shingles,
    index_analyze_whole,
    query_analyze,
)
from solrtexttagger_spark.tagging.core import TermDict, tag_text


def build_dict(names, mode="whole", stopwords=None):
    pairs = []
    for i, name in enumerate(names):
        if mode == "whole":
            t = index_analyze_whole(name, stopwords=stopwords)
            if t:
                pairs.append((t, i))
        else:
            for t in index_analyze_shingles(name, stopwords=stopwords):
                pairs.append((t, i))
    return TermDict.from_pairs(pairs)


def run(
    text,
    d,
    overlaps="NO_SUB",
    stopwords=None,
    ignore_stopwords=False,
    min_taggable_len=None,
    **kw,
):
    tokens = query_analyze(text, stopwords=stopwords, min_taggable_len=min_taggable_len)
    return {
        (s, e, frozenset(ids))
        for s, e, ids in tag_text(
            tokens, d, overlaps=overlaps, ignore_stopwords=ignore_stopwords, **kw
        )
    }


def tt(doc, substring, *ids):
    """Expected tag at the first occurrence of substring (AbstractTaggerTest.tt)."""
    s = doc.index(substring)
    return (s, s + len(substring), frozenset(ids))


# --- TaggerTest.N corpus; default fq `NOT name:(of the)` => docs 4,5 dead ---
N = ["London", "London Business School", "Boston", "City of London", "of", "the"]
LONDON, LBS, BOSTON, COL, OF, THE = range(6)
LIVE = {LONDON, LBS, BOSTON, COL}


@pytest.fixture(scope="module")
def whole_dict():
    return build_dict(N).filtered(LIVE)


@pytest.fixture(scope="module")
def partial_dict():
    return build_dict(N, mode="partial").filtered(LIVE)


class TestPartialMatching:  # TaggerTest.testPartialMatching (NO_SUB)
    def test_match_nothing(self, partial_dict):
        for doc in ["", " ", "the"]:
            assert run(doc, partial_dict) == set()

    def test_school_substring(self, partial_dict):
        for doc in ["school", "a school", "school a"]:
            assert run(doc, partial_dict) == {tt(doc, "school", LBS)}

    def test_school_city(self, partial_dict):
        doc = "school City"
        assert run(doc, partial_dict) == {
            tt(doc, "school", LBS),
            tt(doc, "City", COL),
        }

    def test_city_of_london_business_school(self, partial_dict):
        doc = "City of London Business School"
        assert run(doc, partial_dict) == {
            tt(doc, "City of London", COL),
            tt(doc, "London Business School", LBS),
        }


class TestWholeMatching:  # TaggerTest.testWholeMatching (NO_SUB)
    def test_match_nothing(self, whole_dict):
        for doc in ["", " ", "the", "school", "a school", "school a", "school City"]:
            assert run(doc, whole_dict) == set()

    def test_backwards(self, whole_dict):
        doc = "school business london"
        assert run(doc, whole_dict) == {tt(doc, "london", LONDON)}

    def test_of_lbs(self, whole_dict):
        doc = "of London Business School"
        assert run(doc, whole_dict) == {tt(doc, "London Business School", LBS)}

    def test_col_lbs(self, whole_dict):
        doc = "City of London Business School"
        assert run(doc, whole_dict) == {
            tt(doc, "City of London", COL),
            tt(doc, "London Business School", LBS),
        }

    def test_col_business(self, whole_dict):
        doc = "City of London Business"
        assert run(doc, whole_dict) == {tt(doc, "City of London", COL)}

    def test_london_business_magazine(self, whole_dict):
        doc = "London Business magazine"
        assert run(doc, whole_dict) == {tt(doc, "London", LONDON)}


class TestSubTags:  # TaggerTest.testSubTags (overlaps=ALL)
    def test_all_tags(self, whole_dict):
        doc = "City of London Business School"
        assert run(doc, whole_dict, overlaps="ALL") == {
            tt(doc, "City of London", COL),
            tt(doc, "London", LONDON),
            tt(doc, "London Business School", LBS),
        }

    def test_col_business(self, whole_dict):
        doc = "City of London Business"
        assert run(doc, whole_dict, overlaps="ALL") == {
            tt(doc, "City of London", COL),
            tt(doc, "London", LONDON),
        }


class TestFilterQueries:  # TaggerTest.testMultipleFilterQueries (ALL)
    # docs: 0 London(city,UK) 1 LBS(school,UK) 2 Boston(city,US) 3 COL(org,UK)
    DOC = "City of London Business School in Boston"

    @pytest.fixture(scope="class")
    def d(self):
        return build_dict(N[:4])

    def test_no_filter(self, d):
        assert run(self.DOC, d, overlaps="ALL") == {
            tt(self.DOC, "City of London", COL),
            tt(self.DOC, "London", LONDON),
            tt(self.DOC, "London Business School", LBS),
            tt(self.DOC, "Boston", BOSTON),
        }

    def test_fq_city(self, d):
        live = {LONDON, BOSTON}  # type:city
        assert run(self.DOC, d.filtered(live), overlaps="ALL") == {
            tt(self.DOC, "London", LONDON),
            tt(self.DOC, "Boston", BOSTON),
        }

    def test_fq_city_and_us(self, d):
        live = {BOSTON}  # type:city AND country:US
        assert run(self.DOC, d.filtered(live), overlaps="ALL") == {
            tt(self.DOC, "Boston", BOSTON)
        }


# --- Tagger2Test ---
LDR_NAMES = [
    "in", "San", "in San", "Francisco", "San Francisco",
    "San Francisco State College", "College of California",
    "Clayton", "Clayton North", "North Carolina",
]


class TestLongestDominantRight:  # Tagger2Test.testLongestDominantRight
    @pytest.fixture(scope="class")
    def d(self):
        return build_dict(LDR_NAMES)

    def check(self, d, doc, *substrings):
        expected = {tt(doc, s, LDR_NAMES.index(self._lookup(s))) for s in substrings}
        assert run(doc, d, overlaps="LONGEST_DOMINANT_RIGHT") == expected

    @staticmethod
    def _lookup(s):
        for n in LDR_NAMES:
            if n.lower() == s.lower():
                return n
        raise AssertionError(s)

    def test_san_francisco(self, d):
        self.check(d, "He lived in San Francisco.", "in", "San Francisco")

    def test_sfsc(self, d):
        self.check(
            d,
            "He enrolled in San Francisco State College of California",
            "in",
            "San Francisco State College",
        )

    def test_clayton(self, d):
        self.check(
            d, "He lived in Clayton North Carolina", "in", "Clayton", "North Carolina"
        )


class TestStopwords:  # Tagger2Test.testStopWords (tagStop field type)
    @pytest.fixture(scope="class")
    def d(self):
        return build_dict(["South of Wales", "A City A"], stopwords=ENGLISH_STOP_WORDS)

    def test_round_trip(self, d):
        doc = "South of Wales"
        out = run(doc, d, stopwords=ENGLISH_STOP_WORDS, ignore_stopwords=True)
        assert out == {(0, len(doc), frozenset([0]))}

    def test_offsets_exclude_leading_trailing_stopwords(self, d):
        out = run("A City A", d, stopwords=ENGLISH_STOP_WORDS, ignore_stopwords=True)
        assert out == {(2, 6, frozenset([1]))}

    def test_break_on_stopwords(self, d):
        out = run(
            "South of Wales", d, stopwords=ENGLISH_STOP_WORDS, ignore_stopwords=False
        )
        assert out == set()


def test_multibyte_char():  # Tagger2Test.testMultibyteChar
    text = "He mentionned ’Obama’ in the White House"
    d = build_dict(["Obama"])
    out = run(text, d, overlaps="LONGEST_DOMINANT_RIGHT")
    assert out == {(15, 20, frozenset([0]))}


def test_very_long_word_stopword_handling():  # Tagger2Test.testVeryLongWord (drop+gap mode)
    d = build_dict(["San Francisco"])
    stop = "0123456789" * 26  # > 255 chars
    doc = f"San {stop} Francisco"
    assert run(doc, d) == set()
    out = run(doc, d, ignore_stopwords=True)
    assert out == {(0, len(doc), frozenset([0]))}


class TestTaggingAttribute:  # TaggingAttributeTest.testTaggingAttribute (minLength=4)
    @pytest.fixture(scope="class")
    def d(self):
        return build_dict(LDR_NAMES)

    def check(self, d, doc, *substrings):
        expected = set()
        for s in substrings:
            name = [n for n in LDR_NAMES if n.lower() == s.lower()][0]
            expected.add(tt(doc, s, LDR_NAMES.index(name)))
        out = run(
            doc, d, overlaps="LONGEST_DOMINANT_RIGHT", min_taggable_len=4
        )
        assert out == expected

    def test_san_francisco(self, d):
        self.check(d, "He lived in San Francisco.", "Francisco")

    def test_sfsc(self, d):
        # also pins that open tags ADVANCE over non-taggable tokens
        self.check(
            d,
            "He enrolled in San Francisco State College of California",
            "Francisco",
            "College of California",
        )

    def test_clayton(self, d):
        self.check(
            d, "He lived in Clayton North Carolina", "Clayton", "North Carolina"
        )


# --- RandomizedTaggerTest recast: brute-force oracle under overlaps=ALL ---
def brute_force_tags(input_text, names):
    """Oracle from RandomizedTaggerTest.assertBruteForce: find ' name ' in
    ' input ' (reference lines 121-141)."""
    out = []
    for i, name in enumerate(names):
        space_name = " " + name + " "
        off = 0
        while True:
            idx = input_text.find(space_name, off)
            if idx < 0:
                break
            out.append((idx + 1, idx + 1 + len(name), i))
            off = idx + 1
    return out


@pytest.mark.parametrize("seed", range(25))
def test_randomized_brute_force(seed):
    rng = random.Random(42 + seed)

    def rand_word(lo=1, hi=1):
        return "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(lo, hi))
        )

    names = {rand_word(16, 32)}
    while len(names) < 4:
        names.add(rand_word())
    names = list(names)
    for _ in range(10):
        n_words = rng.randint(2, 4)
        parts = [
            rand_word() if rng.random() < 0.5 else rng.choice(names)
            for _ in range(n_words)
        ]
        nm = " ".join(parts)
        if nm not in names:
            names.append(nm)

    d = build_dict(names)
    for _ in range(10):
        words = [
            rand_word() if rng.random() < 0.5 else rng.choice(names)
            for _ in range(20)
        ]
        input_text = " " + " ".join(words) + " "
        expected = brute_force_tags(input_text, names)
        got = [
            (s, e, i)
            for s, e, ids in tag_text(
                query_analyze(input_text), d, overlaps="ALL", tags_limit=None
            )
            for i in ids
        ]
        assert sorted(got) == sorted(expected), f"names={names} input={input_text!r}"


def test_tags_limit():
    d = build_dict(["a1"])
    doc = " ".join(["a1"] * 50)
    tokens = query_analyze(doc)
    assert len(tag_text(tokens, d, tags_limit=7)) == 7
    assert len(tag_text(tokens, d, tags_limit=None)) == 50


def test_alt_token_handling():
    """posInc==0 (alternate tokens, e.g. synonym expansion): skipped under
    skip_alt_tokens, error otherwise (Tagger.java:107-126)."""
    from solrtexttagger_spark.analysis.core import Token

    d = build_dict(["London"])
    tokens = [
        Token("london", 1, 0, 6, True),
        Token("synonym", 0, 0, 6, True),  # alternate token at same position
    ]
    out = tag_text(tokens, d, overlaps="ALL", skip_alt_tokens=True)
    assert [(s, e) for s, e, _ in out] == [(0, 6)]
    with pytest.raises(ValueError):
        tag_text(tokens, d, skip_alt_tokens=False)


# --- LDR greedy-characterization property (foundation of the tag_ldr
# DuckDB oracle): reduce_spans LDR == "iterate spans by (len desc,
# start desc); keep iff no overlap with a previously kept span" ---

from hypothesis import given, settings, strategies as st


def _independent_ldr_greedy(spans):
    order = sorted(spans, key=lambda t: (-(t[1] - t[0]), -t[0]))
    kept = []
    for s, e in order:
        if not any(s < ke and ks < e for ks, ke in kept):
            kept.append((s, e))
    return set(kept)


@settings(max_examples=300, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=1, max_value=12),
        ).map(lambda t: (t[0], t[0] + t[1])),
        min_size=1,
        max_size=12,
    )
)
def test_ldr_equals_independent_greedy(spans):
    from solrtexttagger_spark.tagging.core import reduce_spans

    got = {
        (s, e)
        for s, e, _v in reduce_spans(
            [(s, e, (1,)) for s, e in spans], "LONGEST_DOMINANT_RIGHT"
        )
    }
    assert got == _independent_ldr_greedy(spans)
