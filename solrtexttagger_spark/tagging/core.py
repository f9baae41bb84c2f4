"""The tagging algorithm: longest-match phrase tagging over a sorted term
dictionary, with the three overlap reducers.

This re-implements the reference's *semantics* (studied from
Tagger.java:88-208, TagLL.java:80-141, TermPrefixCursor.java:68-147,
TagClusterReducer.java:32-102) on a completely different substrate: the
Lucene FST/TermsEnum ``seekCeil`` is replaced by binary search over a sorted
Python/NumPy term array (UTF-8 order == code-point order, so ``bisect`` on
str is order-equivalent to Lucene's BytesRef comparison), and postings are a
dict of term -> sorted doc_id tuple.

It is driver/executor-agnostic pure Python: the Spark operator broadcasts a
``TermDict`` and runs ``tag_text`` per document inside an Arrow-batched
``mapInPandas`` (vectorized across documents; the per-document token loop is
inherently sequential, exactly like the reference's single-request loop).
"""

from __future__ import annotations

from bisect import bisect_left

from solrtexttagger_spark.analysis.core import SEPARATOR, Token

OVERLAPS = ("ALL", "NO_SUB", "LONGEST_DOMINANT_RIGHT")


class TermDict:
    """Sorted term dictionary + postings — the FST50 analogue.

    ``terms`` must be sorted unique phrase terms (words joined by a single
    space). ``postings`` maps term -> sorted tuple of doc ids; a term may map
    to an empty tuple when a filter query (fq) removed all its docs — the
    seek then 'pretends NOT_FOUND' exactly like TermPrefixCursor.java:117-129.
    """

    __slots__ = ("terms", "postings", "first_words")

    def __init__(self, terms: list[str], postings: dict[str, tuple]):
        self.terms = terms
        self.postings = postings
        # the reference's wished-for bloom filter (TermPrefixCursor.java:43
        # TODO): O(1) membership of words that can START any dictionary
        # term — skips the binary search for the common non-matching token
        self.first_words = frozenset(t.split(SEPARATOR, 1)[0] for t in terms)

    @classmethod
    def from_pairs(cls, pairs):
        """pairs: iterable of (term, doc_id). Builds sorted dict."""
        post: dict[str, list] = {}
        for term, doc_id in pairs:
            post.setdefault(term, []).append(doc_id)
        terms = sorted(post)
        return cls(terms, {t: tuple(sorted(set(post[t]))) for t in terms})

    def filtered(self, live) -> "TermDict":
        """fq pushdown: keep the term array, filter postings by a live-doc
        predicate/set (reference: liveDocs bits in postingsEnumToIntsRef,
        TermPrefixCursor.java:163-170)."""
        if not isinstance(live, (set, frozenset)):
            live = set(live)
        return TermDict(
            self.terms,
            {t: tuple(d for d in ids if d in live) for t, ids in self.postings.items()},
        )

    def seek_prefix(self, prefix: str):
        """seekCeil(prefix) with the reference's three-outcome semantics
        (TermPrefixCursor.seekPrefix, reference file lines 109-147).

        Returns (alive, doc_ids): alive=False => dead end; alive=True with
        doc_ids=None => the dictionary has terms extending ``prefix + ' '``
        but no (live) exact term; alive=True with doc_ids => exact term.
        """
        terms = self.terms
        n = len(terms)
        i = bisect_left(terms, prefix)
        if i < n and terms[i] == prefix:
            ids = self.postings.get(prefix, ())
            if ids:
                return True, ids
            i += 1  # all docs filtered out: pretend NOT_FOUND, check next term
        if i >= n:
            return False, None
        if terms[i].startswith(prefix + SEPARATOR):
            return True, None
        return False, None

    def __len__(self):
        return len(self.terms)


class _Cursor:
    """TermPrefixCursor: grows a phrase prefix word-by-word."""

    __slots__ = ("d", "prefix", "doc_ids")

    def __init__(self, d: TermDict):
        self.d = d
        self.prefix = None
        self.doc_ids = None

    def advance(self, word: str) -> bool:
        prefix = word if self.prefix is None else self.prefix + SEPARATOR + word
        alive, doc_ids = self.d.seek_prefix(prefix)
        if alive:
            self.prefix = prefix
            self.doc_ids = doc_ids
            return True
        return False


class _Tag:
    """TagLL: a doubly-linked candidate tag (reference TagLL.java)."""

    __slots__ = ("head", "prev", "next", "cursor", "start", "end", "value", "mark")

    def __init__(self, head, cursor, start, end, value):
        self.head = head
        self.prev = None
        self.next = None
        self.cursor = cursor
        self.start = start
        self.end = end
        self.value = value
        self.mark = False

    def advance(self, word, offset) -> bool:
        if self.cursor is None:
            return False
        i_val = self.cursor.doc_ids
        if word is not None and self.cursor.advance(word):
            if i_val is not None:
                # a shorter complete match existed: emit it as its own tag
                self._add_before(_Tag(self.head, None, self.start, self.end, i_val))
            self.end = offset
            return True
        self.value = i_val
        self.cursor = None
        if i_val is None:
            self.remove()
        return False

    def remove(self):
        if self.head[0] is self:
            self.head[0] = self.next
        if self.prev is not None:
            self.prev.next = self.next
        if self.next is not None:
            self.next.prev = self.prev

    def _add_before(self, tag):
        if self.prev is not None:
            self.prev.next = tag
            tag.prev = self.prev
        else:
            self.head[0] = tag
        self.prev = tag
        tag.next = self

    def add_after(self, tag):
        if self.next is not None:
            self.next.prev = tag
            tag.next = self.next
        self.next = tag
        tag.prev = self

    def char_len(self):
        return self.end - self.start

    def overlaps(self, other):
        if self.start < other.start:
            return self.end > other.start
        return self.start < other.end


def _reduce_all(head):
    pass


def _reduce_no_sub(head):
    """Remove tags contained in an earlier-or-equal-start tag
    (TagClusterReducer.NO_SUB, reference lines 38-57)."""
    tag = head[0].next
    while tag is not None:
        t_prev = tag.prev
        while t_prev is not None:
            if t_prev.end >= tag.end:
                tag.remove()
                break
            elif t_prev.start == tag.start:
                nxt = t_prev.prev
                t_prev.remove()
                t_prev = nxt
                continue
            t_prev = t_prev.prev
        tag = tag.next


def _reduce_ldr(head):
    """Greedy longest (ties -> right-most) dominant selection
    (TagClusterReducer.LONGEST_DOMINANT_RIGHT, reference lines 59-102)."""
    if head[0].next is None:
        return
    while True:
        longest = None
        t = head[0]
        while t is not None:
            if not t.mark and (longest is None or t.char_len() >= longest.char_len()):
                longest = t
            t = t.next
        if longest is None:
            break
        longest.mark = True
        t = head[0]
        while t is not None:
            nxt = t.next
            if not t.mark:
                if t.overlaps(longest):
                    t.remove()
                elif t.start >= longest.end:
                    break
            t = nxt


_REDUCERS = {
    "ALL": _reduce_all,
    "NO_SUB": _reduce_no_sub,
    "LONGEST_DOMINANT_RIGHT": _reduce_ldr,
}


def reduce_spans(spans: list[tuple], overlaps: str) -> list[tuple]:
    """Apply an overlap reducer to a complete list of matched spans
    (start, end, value) — the set-oriented (join-path) equivalent of the
    loop tagger's per-cluster reduction.

    Equivalence argument: in the loop tagger a cluster is exactly a
    connected component of the overlap relation among value-bearing tags,
    and both NO_SUB (containment removal) and LONGEST_DOMINANT_RIGHT
    (greedy by length with early-exit at non-overlap) only ever interact
    within a component, so reducing the whole sorted list once yields the
    same survivors as per-cluster reduction. List order replicates the
    tagger's LL order: start asc, then end asc (for equal starts the
    shorter tag was inserted earlier, TagLL.addBeforeLL)."""
    if overlaps == "ALL" or not spans:
        return list(spans)
    spans = sorted(spans, key=lambda t: (t[0], t[1]))
    head = [None]
    prev = None
    for s, e, v in spans:
        t = _Tag(head, None, s, e, v)
        if prev is None:
            head[0] = t
        else:
            prev.add_after(t)
        prev = t
    _REDUCERS[overlaps](head)
    out = []
    t = head[0]
    while t is not None:
        out.append((t.start, t.end, t.value))
        t = t.next
    return out


def tag_text(
    tokens: list[Token],
    d: TermDict,
    *,
    overlaps: str = "NO_SUB",
    ignore_stopwords: bool = False,
    skip_alt_tokens: bool = True,
    tags_limit: int | None = None,
) -> list[tuple]:
    """Run the tagging loop over one document's token stream.

    Returns [(start, end, doc_ids tuple)], in emit order (non-decreasing
    end offsets). Semantics follow Tagger.process (reference lines 88-208):
    posInc>1 (stopword gap) force-closes open clusters unless
    ignore_stopwords; non-taggable tokens never *start* a tag but still
    advance open ones; clusters are reduced then emitted when no tag
    advanced on the current token.
    """
    reducer = _REDUCERS[overlaps]
    head = [None]
    results: list[tuple] = []

    def process_cluster_if_done(term, end_offset):
        any_advance = False
        t = head[0]
        while t is not None:
            nxt = t.next
            any_advance |= t.advance(term, end_offset)
            t = nxt
        if not any_advance and head[0] is not None:
            reducer(head)
            t = head[0]
            while t is not None:
                if tags_limit is None or len(results) < tags_limit:
                    results.append((t.start, t.end, t.value))
                t = t.next
            head[0] = None

    for tok in tokens:
        if tok.pos_inc < 1:
            if skip_alt_tokens:
                continue
            raise ValueError("alternate token (posInc==0); enable skip_alt_tokens")
        if not ignore_stopwords and tok.pos_inc > 1:
            process_cluster_if_done(None, -1)

        # lookup-skip optimization (Tagger.java:137-143)
        if tok.taggable or head[0] is not None:
            term = tok.term
        else:
            term = None

        process_cluster_if_done(term, tok.end if term is not None else -1)

        if tok.taggable and term is not None and term in d.first_words:
            cursor = _Cursor(d)
            if cursor.advance(term):
                new_tail = _Tag(head, cursor, tok.start, tok.end, None)
                if head[0] is None:
                    head[0] = new_tail
                else:
                    t = head[0]
                    while t.next is not None:
                        t = t.next
                    t.add_after(new_tail)
        if (
            tags_limit is not None
            and len(results) >= tags_limit
            and head[0] is None
        ):
            return results

    process_cluster_if_done(None, -1)
    return results
