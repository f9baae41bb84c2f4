"""Pure-Python analysis chain (tokenizer + filters).

Re-implements, from public behavioral contracts only, the semantics of the
reference's analyzer configuration (reference:
src/test/resources/solr/collection1/conf/schema.xml:52-98):

  index chain (whole mode):    StandardTokenizer > LowerCase > [Stop] > Concatenate(' ')
  index chain (partial mode):  StandardTokenizer > LowerCase > Shingle(1..10)
  query chain:                 StandardTokenizer > LowerCase > [Stop] > [WordLengthTaggable]

This module is deliberately dependency-free and vectorization-agnostic: the
Spark layer calls these functions from Arrow-batched pandas UDFs, and the
pytest oracles call them directly.

Offsets are Python code-point offsets; the reference uses Java UTF-16 char
offsets, identical for all BMP text (non-BMP surrogate pairs are explicitly
deferred by the reference too — Tagger2Test.java:135).
"""

from __future__ import annotations

import re
import unicodedata
from typing import NamedTuple

# Lucene's EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (public, documented set),
# used by the reference's StopFilterFactory default (schema.xml:76).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# UAX#29-ish word tokenizer: runs of word characters, keeping inner
# apostrophes (MidNumLet) together like Lucene's StandardTokenizer.
_WORD_RE = re.compile(r"\w+(?:['’]\w+)*", re.UNICODE)

# Default maxTokenLength of StandardTokenizer (reference schema.xml comment;
# taggingattribute test schema uses 32). Oversized tokens are dropped and
# create a position gap, like a stopword.
DEFAULT_MAX_TOKEN_LENGTH = 255

SEPARATOR = " "  # reference: TermPrefixCursor.java:45 SEPARATOR_CHAR = ' '


class Token(NamedTuple):
    term: str
    pos_inc: int  # positions skipped since previous emitted token (>=1)
    start: int  # char offset, inclusive
    end: int  # char offset, exclusive
    taggable: bool = True


def tokenize(text: str, max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH):
    """Raw tokenization: [(word, start, end)], dropping oversized words."""
    out = []
    for m in _WORD_RE.finditer(text):
        w = m.group(0)
        if len(w) <= max_token_length:
            out.append((w, m.start(), m.end()))
        else:
            out.append(None)  # placeholder => position gap
    return out


# Non-decomposable punctuation the reference ASCIIFoldingFilter maps to ASCII
# (ASCIIFoldingFilter folds quote/dash/space variants; NFKD alone deletes
# them, which broke curly-apostrophe possessives like "Göteborg’s").
_PUNCT_FOLD = str.maketrans(
    {
        "‘": "'", "’": "'", "‚": "'", "‛": "'",  # single quotes
        "‹": "'", "›": "'", "＇": "'",
        "“": '"', "”": '"', "„": '"', "‟": '"',  # double quotes
        "«": '"', "»": '"', "＂": '"',
        "‐": "-", "‑": "-", "‒": "-", "–": "-",  # dashes
        "—": "-", "―": "-", "−": "-", "－": "-",
        " ": " ", " ": " ", " ": " ",  # spaces
    }
)


def fold_ascii(s: str) -> str:
    """ASCIIFoldingFilter approximation: fold common non-decomposable
    punctuation (curly quotes, dashes) to ASCII, then NFKD-decompose and drop
    combining marks / non-ASCII residue (reference QUICK_START.md recommended
    chain; punctuation table mirrors ASCIIFoldingFilter's quote/dash cases)."""
    return (
        unicodedata.normalize("NFKD", s.translate(_PUNCT_FOLD))
        .encode("ascii", "ignore")
        .decode("ascii")
    )


def strip_possessive(s: str) -> str:
    """EnglishPossessiveFilter: strip a trailing 's (reference README.md:95)."""
    if len(s) >= 2 and s[-1] in ("s", "S") and s[-2] in ("'", "’"):
        return s[:-2]
    return s


def query_analyze(
    text: str,
    *,
    lowercase: bool = True,
    stopwords: frozenset | None = None,
    min_taggable_len: int | None = None,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ascii_fold: bool = False,
    possessive: bool = False,
) -> list[Token]:
    """Query-time chain producing position-increment-aware tokens.

    Stopword removal bumps the next token's pos_inc (gap), which the tagger
    consumes as a cluster break unless ignoreStopwords (Tagger.java:128-131).
    ``min_taggable_len`` models WordLengthTaggingFilter (minLength, reference
    WordLengthTaggingFilter.java:104-112): shorter tokens get taggable=False.
    """
    tokens: list[Token] = []
    pos_inc = 1
    for item in tokenize(text, max_token_length):
        if item is None:  # oversized token dropped -> gap
            pos_inc += 1
            continue
        w, s, e = item
        if lowercase:
            w = w.lower()
        if ascii_fold:
            w = fold_ascii(w)
        if possessive:
            w = strip_possessive(w)
        if stopwords is not None and w in stopwords:
            pos_inc += 1
            continue
        if not w:
            pos_inc += 1
            continue
        taggable = min_taggable_len is None or (e - s) >= min_taggable_len
        tokens.append(Token(w, pos_inc, s, e, taggable))
        pos_inc = 1
    return tokens


def concatenate(terms: list[str], separator: str = SEPARATOR) -> str:
    """ConcatenateFilter: the whole stream becomes ONE term, words joined by
    a single separator char (reference ConcatenateFilter.java:77-102).
    Position gaps (stopwords) are ignored, matching the reference TODO note
    at ConcatenateFilter.java:86."""
    return separator.join(terms)


def index_analyze_whole(
    name: str,
    *,
    stopwords: frozenset | None = None,
    lowercase: bool = True,
    ascii_fold: bool = False,
    possessive: bool = False,
) -> str:
    """Index-time whole-name chain: one phrase term per name ('' if empty)."""
    toks = query_analyze(
        name,
        lowercase=lowercase,
        stopwords=stopwords,
        ascii_fold=ascii_fold,
        possessive=possessive,
    )
    return concatenate([t.term for t in toks])


def shingles(terms: list[str], max_shingle: int = 10) -> list[str]:
    """ShingleFilter with outputUnigrams: all word n-grams, n=1..max_shingle,
    space-joined (reference schema.xml:85-98, partial-matching mode)."""
    out = []
    n = len(terms)
    for i in range(n):
        for j in range(i + 1, min(i + max_shingle, n) + 1):
            out.append(SEPARATOR.join(terms[i:j]))
    return out


def index_analyze_shingles(
    name: str,
    *,
    max_shingle: int = 10,
    stopwords: frozenset | None = None,
    lowercase: bool = True,
    ascii_fold: bool = False,
    possessive: bool = False,
) -> list[str]:
    toks = query_analyze(
        name,
        lowercase=lowercase,
        stopwords=stopwords,
        ascii_fold=ascii_fold,
        possessive=possessive,
    )
    return shingles([t.term for t in toks], max_shingle)


def analyze_stages(
    text: str,
    *,
    lowercase: bool = True,
    stopwords: frozenset | None = None,
    min_taggable_len: int | None = None,
    max_token_length: int = DEFAULT_MAX_TOKEN_LENGTH,
    ascii_fold: bool = False,
    possessive: bool = False,
) -> list[tuple[str, list[Token]]]:
    """Solr admin/analysis view of the query chain: the token stream
    AFTER each configured filter, in chain order — the tool a schema
    author uses to see which stage ate (or mangled) a term. Stage names
    mirror the Lucene factories the reference's field type configures
    (QUICK_START.md analyzer chain): StandardTokenizer,
    LowerCaseFilter, ASCIIFoldingFilter, EnglishPossessiveFilter,
    StopFilter, WordLengthTaggingFilter. Only configured stages appear.

    Semantics are replayed per stage with the SAME rules query_analyze
    applies in one pass — a dropped token (oversized word, stopword,
    fold-to-empty) adds its position increment to the next survivor —
    so the FINAL stage is identical to ``query_analyze(text, ...)``
    (pinned by test). Pure driver-side: this is a debugging endpoint,
    one string in, a few tokens out, no Spark involved."""
    stages: list[tuple[str, list[Token]]] = []

    toks: list[Token] = []
    pos_inc = 1
    for item in tokenize(text, max_token_length):
        if item is None:
            pos_inc += 1
            continue
        w, s, e = item
        toks.append(Token(w, pos_inc, s, e, True))
        pos_inc = 1
    stages.append(("StandardTokenizer", toks))

    def _map_terms(name: str, fn) -> None:
        """A term-rewriting stage: empty rewrites drop with a gap."""
        prev = stages[-1][1]
        out: list[Token] = []
        gap = 0
        for t in prev:
            w = fn(t.term)
            if not w:
                gap += t.pos_inc
                continue
            out.append(t._replace(term=w, pos_inc=t.pos_inc + gap))
            gap = 0
        stages.append((name, out))

    if lowercase:
        _map_terms("LowerCaseFilter", str.lower)
    if ascii_fold:
        _map_terms("ASCIIFoldingFilter", fold_ascii)
    if possessive:
        _map_terms("EnglishPossessiveFilter", strip_possessive)
    if stopwords is not None:
        _map_terms("StopFilter", lambda w: "" if w in stopwords else w)
    if min_taggable_len is not None:
        prev = stages[-1][1]
        stages.append((
            "WordLengthTaggingFilter",
            [t._replace(taggable=(t.end - t.start) >= min_taggable_len)
             for t in prev],
        ))
    return stages
