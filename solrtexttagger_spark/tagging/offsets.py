"""XML/HTML offset correction (reference: OffsetCorrector.java,
XmlOffsetCorrector.java, HtmlOffsetCorrector.java) and the offset-preserving
markup-strip tokenizer (reference: HTMLStripCharFilter usage in the tagXml
field type, schema.xml:105-112).

Goal (reference OffsetCorrector.java:78-84): adjust a tag's (start, end) so
that inserting an open tag at start and a close tag at end keeps the
document well-formed — pulling start left over whitespace + opening tags and
end right over whitespace + closing tags up to a common ancestor element;
return None when non-whitespace intervenes or the span crosses a
non-taggable element.

Differences from the reference, by design:
  - the XML parser is stdlib expat with a byte->char offset map instead of
    Woodstox StAX; an implicit root tag is recorded for both XML and HTML
    (the reference only does so for HTML) which is behavior-neutral for
    well-formed XML and removes -1-parent edge cases.
  - the strip tokenizer produces *accurate* original-text offsets, so
    Lucene's LUCENE-5734 close-tag-absorption quirk never arises;
    correct_end_offset_for_close_element is kept for robustness against
    offsets produced by quirky upstream analyzers.
"""

from __future__ import annotations

import html.entities
import re
from bisect import bisect_right
from xml.parsers import expat

from solrtexttagger_spark.analysis.core import Token

VOID_ELEMENTS = frozenset(
    """area base basefont br col command embed frame hr img input isindex
    keygen link meta param source track wbr""".split()
)

_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?-->"
    r"|!\[CDATA\[.*?\]\]>"
    r"|![^>]*>"
    r"|\?[^>]*\?>"
    r"|(?P<close>/)?(?P<name>[a-zA-Z][a-zA-Z0-9:._-]*)"
    r"(?P<attrs>(?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(?P<selfclose>/)?>"
    r")",
    re.S,
)

_ENTITY_RE = re.compile(r"&(?:#x(?P<hex>[0-9a-fA-F]+)|#(?P<dec>[0-9]+)|(?P<name>[a-zA-Z][a-zA-Z0-9]*));")


class OffsetCorrector:
    """Base algorithm over a parsed tag-interval table
    (reference OffsetCorrector.java:29-178)."""

    def __init__(self, doc_text: str, has_non_taggable: bool):
        self.doc_text = doc_text
        # per tag: [parent, open_start, open_end, close_start, close_end]
        self.tag_info: list[list[int]] = []
        self.parent_change_offsets: list[int] = []
        self.parent_change_ids: list[int] = []
        self.non_taggable_offsets: list[int] | None = [] if has_non_taggable else None
        self._offset_pair = [-1, -1]

    # --- the correction algorithm (reference lines 85-117) ---

    def correct_pair(self, left: int, right: int):
        right = self._correct_end_offset_for_close_element(right)
        if self._spans_non_taggable(left, right):
            return None

        start_tag = self._lookup_tag(left)
        end_tag = self._lookup_tag(right - 1)

        i_tag = start_tag
        while not self._tag_encloses_offset(i_tag, right):
            open_end = self.tag_info[i_tag][2]
            if self._has_non_whitespace(open_end, left):
                return None
            left = self.tag_info[i_tag][1]
            i_tag = self.tag_info[i_tag][0]
        ancestor = i_tag

        i_tag = end_tag
        while i_tag != ancestor:
            close_start = self.tag_info[i_tag][3]
            if self._has_non_whitespace(right, close_start):
                return None
            right = self.tag_info[i_tag][4]
            i_tag = self.tag_info[i_tag][0]

        self._offset_pair = [left, right]
        return (left, right)

    def _correct_end_offset_for_close_element(self, end: int) -> int:
        # LUCENE-5734 close-tag absorption pull-back (reference 127-134)
        if end > 0 and end <= len(self.doc_text) and self.doc_text[end - 1] == ">":
            new_end = self.doc_text.rfind("<", 0, end - 1)
            if new_end > self._offset_pair[0]:
                return new_end
        return end

    def _has_non_whitespace(self, start: int, end: int) -> bool:
        return bool(self.doc_text[max(start, 0) : max(end, 0)].strip())

    def _tag_encloses_offset(self, tag: int, off: int) -> bool:
        info = self.tag_info[tag]
        return info[1] <= off < info[4]

    def _lookup_tag(self, off: int) -> int:
        idx = bisect_right(self.parent_change_offsets, off) - 1
        return self.parent_change_ids[max(idx, 0)]

    def _spans_non_taggable(self, start: int, end: int) -> bool:
        # reference lines 161-177: spans are stored as disjoint
        # [start, end] inclusive pairs in a flat ascending list
        nt = self.non_taggable_offsets
        if not nt:
            return False
        idx = bisect_right(nt, start) - 1
        # exact hit on a boundary
        if idx >= 0 and nt[idx] == start:
            return True
        insert = idx + 1
        if insert % 2 == 1:  # start falls inside a [s, e] pair
            return True
        if insert == len(nt):
            return False
        return nt[insert] < end


def _add_implicit_root(c: OffsetCorrector, doc_len: int) -> None:
    c.tag_info.append([-1, -1, 0, doc_len, doc_len + 1])
    c.parent_change_offsets.append(-1)
    c.parent_change_ids.append(0)


def _scan_tag_end(text: str, start: int) -> int:
    """End offset (exclusive) of the markup token starting at '<', honoring
    quoted attribute values."""
    m = _TAG_RE.match(text, start)
    if m:
        return m.end()
    gt = text.find(">", start)
    return gt + 1 if gt >= 0 else len(text)


class XmlOffsetCorrector(OffsetCorrector):
    """expat-backed tag-interval table (reference XmlOffsetCorrector.java).
    Raises ValueError on invalid XML."""

    def __init__(self, doc_text: str):
        super().__init__(doc_text, has_non_taggable=False)
        data = doc_text.encode("utf-8")
        # byte offset -> char offset map (identity for pure ASCII)
        if len(data) == len(doc_text):
            b2c = None
        else:
            b2c = [0] * (len(data) + 1)
            ci = 0
            bi = 0
            for ch in doc_text:
                w = len(ch.encode("utf-8"))
                for k in range(w):
                    b2c[bi + k] = ci
                bi += w
                ci += 1
            b2c[len(data)] = len(doc_text)

        def to_char(byte_off: int) -> int:
            return byte_off if b2c is None else b2c[byte_off]

        _add_implicit_root(self, len(doc_text))
        stack = [0]
        tag_counter = [1]

        p = expat.ParserCreate()

        def start_element(name, attrs):
            open_start = to_char(p.CurrentByteIndex)
            open_end = _scan_tag_end(doc_text, open_start)
            tid = tag_counter[0]
            tag_counter[0] += 1
            self.tag_info.append([stack[-1], open_start, open_end, -1, -1])
            stack.append(tid)
            self.parent_change_offsets.append(open_start)
            self.parent_change_ids.append(tid)
            self._self_closing_candidate = (tid, open_start, open_end)

        def end_element(name):
            idx = to_char(p.CurrentByteIndex)
            tid = stack.pop()
            info = self.tag_info[tid]
            # self-closing <x/>: expat fires END at the end of the open
            # token itself (idx == open_end) and the token ends with '/>'
            if idx == info[2] and doc_text[max(idx - 2, 0) : idx] == "/>":
                info[3], info[4] = info[1], info[2]
                change_off = info[2]
            else:
                close_end = _scan_tag_end(doc_text, idx)
                info[3], info[4] = idx, close_end
                change_off = close_end
            self.parent_change_offsets.append(change_off)
            self.parent_change_ids.append(stack[-1])

        p.StartElementHandler = start_element
        p.EndElementHandler = end_element
        try:
            p.Parse(data, True)
        except expat.ExpatError as e:
            raise ValueError(f"invalid XML: {e}") from e


class HtmlOffsetCorrector(OffsetCorrector):
    """Lenient HTML tag-interval table (reference HtmlOffsetCorrector.java):
    implicit document tag, void elements never pushed, self-closing syntax
    honored, nonTaggableTags tracked as disjoint char spans."""

    def __init__(self, doc_text: str, non_taggable_tags: set[str] | None = None):
        super().__init__(doc_text, has_non_taggable=non_taggable_tags is not None)
        non_taggable = {t.lower() for t in (non_taggable_tags or ())}

        _add_implicit_root(self, len(doc_text))
        stack = [0]
        tag_counter = 1
        nt_in_progress = 0

        for m in _TAG_RE.finditer(doc_text):
            name = m.group("name")
            if name is None:
                continue  # comment / doctype / PI / CDATA
            name_l = name.lower()
            if not m.group("close"):
                if m.group("selfclose") or name_l in VOID_ELEMENTS:
                    continue  # never pushed (reference: isEmptyElementTag etc.)
                parent = stack[-1]
                tid = tag_counter
                tag_counter += 1
                self.tag_info.append([parent, m.start(), m.end(), -1, -1])
                stack.append(tid)
                self.parent_change_offsets.append(m.start())
                self.parent_change_ids.append(tid)
                if name_l in non_taggable:
                    if nt_in_progress == 0:
                        self.non_taggable_offsets.append(m.start())
                    nt_in_progress += 1
            else:
                if len(stack) <= 1:
                    continue  # stray close tag: ignore
                tid = stack.pop()
                info = self.tag_info[tid]
                info[3], info[4] = m.start(), m.end()
                self.parent_change_offsets.append(m.end())
                self.parent_change_ids.append(stack[-1])
                if name_l in non_taggable:
                    nt_in_progress -= 1
                    if nt_in_progress == 0:
                        self.non_taggable_offsets.append(m.end() - 1)

        self.parent_change_offsets.append(len(doc_text) + 1)
        self.parent_change_ids.append(-1 if not stack else stack[0])


_WORD_RE = re.compile(r"\w+(?:['’]\w+)*", re.UNICODE)


def _decode_with_offsets(text: str):
    """Strip markup and decode entities, keeping a per-decoded-char map of
    (orig_start, orig_end) spans into the original text."""
    out_chars: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "<":
            m = _TAG_RE.match(text, i)
            end = m.end() if m else _scan_tag_end(text, i)
            # markup becomes a single space (word boundary), zero-width span
            out_chars.append(" ")
            starts.append(i)
            ends.append(i)
            i = end
            continue
        if ch == "&":
            m = _ENTITY_RE.match(text, i)
            if m:
                if m.group("hex") is not None:
                    decoded = chr(int(m.group("hex"), 16))
                elif m.group("dec") is not None:
                    decoded = chr(int(m.group("dec")))
                else:
                    decoded = html.entities.html5.get(m.group("name") + ";")
                if decoded is not None:
                    for dch in decoded:
                        out_chars.append(dch)
                        starts.append(i)
                        ends.append(m.end())
                    i = m.end()
                    continue
            # unknown entity: literal
        out_chars.append(ch)
        starts.append(i)
        ends.append(i + 1)
        i += 1
    return "".join(out_chars), starts, ends


def html_strip_tokenize(
    text: str,
    *,
    lowercase: bool = True,
    stopwords=None,
    min_taggable_len: int | None = None,
    ascii_fold: bool = False,
    possessive: bool = False,
) -> list[Token]:
    """Query-time chain for xml/html inputs: markup stripped, entities
    decoded, offsets preserved into the ORIGINAL text (reference field type
    tagXml, schema.xml:105-112). A token containing a decoded entity spans
    the whole entity in the original text (pinned by
    XmlInterpolationTest.testLuceneHtmlFilterBehavior entity cases)."""
    decoded, starts, ends = _decode_with_offsets(text)
    tokens: list[Token] = []
    pos_inc = 1
    for m in _WORD_RE.finditer(decoded):
        w = m.group(0)
        if lowercase:
            w = w.lower()
        if ascii_fold:
            from solrtexttagger_spark.analysis.core import fold_ascii

            w = fold_ascii(w)
        if possessive:
            from solrtexttagger_spark.analysis.core import strip_possessive

            w = strip_possessive(w)
        if (stopwords is not None and w in stopwords) or not w:
            pos_inc += 1
            continue
        s = starts[m.start()]
        e = ends[m.end() - 1]
        taggable = min_taggable_len is None or len(m.group(0)) >= min_taggable_len
        tokens.append(Token(w, pos_inc, s, e, taggable))
        pos_inc = 1
    return tokens
