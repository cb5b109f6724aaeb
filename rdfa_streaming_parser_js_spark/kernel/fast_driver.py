"""Fast HTML tokenizer: same event stream as ``HtmlSaxDriver``, ~2-4×
faster.

``html.parser``'s ``goahead`` loop pays per-character bookkeeping
(``updatepos``, interesting-char regex scans, charref piecemeal
handling) that dominates kernel time on real pages.  This driver keeps
byte-compatible *parsing* by reusing ``html.parser``'s own module-level
tolerant regexes (``tagfind_tolerant``, ``attrfind_tolerant``,
``locatestarttagend_tolerant``) inside a tight ``str.find('<')`` scan,
and inherits all html-mode *semantics* (void elements, open-implies-
close, foreign-content depth, stray-end-tag recovery) from
``HtmlSaxDriver`` unchanged.

Parity is enforced by differential tests: the full transcribed fixture
corpus and a seeded 5000-document tag-soup fuzz are run through BOTH
drivers and must produce identical triples and extracted text
(tests/test_fast_driver.py).
"""

from __future__ import annotations

import html as html_mod
import html.parser as _hp

import re

from .extractor import RdfaExtractor
from .html_driver import HtmlSaxDriver

_CDATA_ELEMS = ("script", "style")
# Full close pattern, mirroring html.parser's set_cdata_mode
# ``interesting`` regex: near-misses ('</scriptx>', '</script foo>',
# '</script/>') never end CDATA content and are part of the raw text.
_CDATA_CLOSE = {e: re.compile(r"</\s*%s\s*>" % e, re.IGNORECASE)
                for e in _CDATA_ELEMS}

_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")

# Start-tag parse cache: parsing a raw ``<tag ...>`` slice is a pure
# function of the slice, and crawl corpora are heavily templated — the
# same tag source recurs across millions of pages.  Keyed on the exact
# raw text; value is (tag, attrs-as-dict, kind) where kind 0 = junk
# (emit raw as data), 1 = self-closing, 2 = start tag.  The dict is
# prebuilt with ``_open``'s first-duplicate-wins + None→"" rules so the
# sink path is a single C-level ``dict.copy`` per event instead of a
# Python attr loop.  Bounded: reset when full (adversarial corpora with
# unbounded distinct tags must not grow worker memory).
_TAG_CACHE: dict = {}
_TAG_CACHE_MAX = 1 << 16

# End-tag parse cache: raw ``</...>`` slice → tag name to close (None =
# bogus end tag with no salvageable name; dropped).  Same templated-
# corpus rationale as _TAG_CACHE.
_END_CACHE: dict = {}


def _unescape(text: str) -> str:
    return html_mod.unescape(text) if "&" in text else text


class FastHtmlSaxDriver(HtmlSaxDriver):
    """Drop-in replacement for HtmlSaxDriver with a fast scan loop."""

    def __init__(self, sink: RdfaExtractor) -> None:
        super().__init__(sink)
        self._tail = ""
        self._cdata_elem: str | None = None

    # -- feeding -------------------------------------------------------

    def feed(self, data: str) -> None:
        self._tail = self._scan(self._tail + data, final=False)

    def close(self) -> None:
        if self._tail:
            rest = self._scan(self._tail, final=True)
            self._tail = ""
            if rest:  # trailing text / unterminated construct → data
                self.handle_data(_unescape(rest)
                                 if self._cdata_elem is None else rest)

    # -- scanner -------------------------------------------------------

    def _scan(self, s: str, final: bool) -> str:
        i, n = 0, len(s)
        while i < n:
            if self._cdata_elem is not None:
                m = _CDATA_CLOSE[self._cdata_elem].search(s, i)
                if not m:
                    # html.parser buffers CDATA until the FULL close tag
                    # arrives and silently DROPS unterminated content at
                    # EOF (goahead breaks without emitting, and the
                    # end-of-input flush is gated on ``not cdata_elem``)
                    return "" if final else s[i:]
                if i < m.start():
                    # one raw chunk, no unescape — html.parser emits the
                    # whole CDATA run at once when the close is found
                    self.handle_data(s[i:m.start()])
                elem = self._cdata_elem
                self._cdata_elem = None
                self.handle_endtag(elem)
                i = m.end()
                continue

            lt = s.find("<", i)
            if lt < 0:
                lt = n
            if i < lt:
                text = s[i:lt]
                if not final and lt == n:
                    # hold back a possibly-split trailing charref
                    amp = text.rfind("&")
                    if amp >= 0 and ";" not in text[amp:] \
                            and len(text) - amp < 34:
                        if amp:
                            self.handle_data(_unescape(text[:amp]))
                        return text[amp:]
                self.handle_data(_unescape(text))
            if lt >= n:
                return ""
            i = lt
            nxt = s[i + 1] if i + 1 < n else ""
            if nxt == "/":
                gt = s.find(">", i)
                if gt < 0:
                    # endtagfind / the bogus-tag salvage both need a '>'
                    if not final:
                        return s[i:]
                    i = self._salvage(s, i)
                    continue
                raw = s[i:gt + 1]
                if raw in _END_CACHE:
                    closes = _END_CACHE[raw]
                else:
                    m = _hp.endtagfind.match(raw)  # </tag >
                    if m:
                        closes = m.group(1).lower()
                    else:
                        # bogus end tag: html.parser salvages the tag name
                        # if the contents start like one, else drops it
                        m2 = _hp.tagfind_tolerant.match(raw, 2)
                        closes = m2.group(1).lower() if m2 else None
                    if len(_END_CACHE) >= _TAG_CACHE_MAX:
                        _END_CACHE.clear()
                    _END_CACHE[raw] = closes
                if closes is not None:
                    self.handle_endtag(closes)
                i = gt + 1
                continue
            if nxt == "!":
                if s.startswith("<!--", i):
                    m = _hp.commentclose.search(s, i + 4)
                    if not m:
                        if not final:
                            return s[i:]
                        i = self._salvage(s, i)
                        continue
                    i = m.end()
                    continue
                if s.startswith("<![", i):
                    end = s.find("]>", i + 3)
                    if end < 0:
                        if not final:
                            return s[i:]
                        i = self._salvage(s, i)
                        continue
                    i = end + 2
                    continue
                gt = s.find(">", i)  # doctype & friends: ignored
                if gt < 0:
                    if not final:
                        return s[i:]
                    i = self._salvage(s, i)
                    continue
                i = gt + 1
                continue
            if nxt == "?":
                gt = s.find(">", i)
                if gt < 0:
                    if not final:
                        return s[i:]
                    i = self._salvage(s, i)
                    continue
                i = gt + 1
                continue
            if nxt not in _ASCII_LETTERS:  # '<' + ASCII letter opens a tag
                # '<' not opening a construct → literal text, like
                # html.parser's invalid-'<' path
                if not final and i + 1 >= n:
                    return s[i:]
                self.handle_data("<")
                i += 1
                continue

            # start tag — mirrors html.parser check_for_whole_start_tag
            # + parse_starttag decision structure exactly
            m = _hp.locatestarttagend_tolerant.match(s, i)
            j = m.end()
            nxt2 = s[j:j + 1]
            if nxt2 == ">":
                endpos = j + 1
            elif nxt2 == "/":
                if s.startswith("/>", j):
                    endpos = j + 2
                elif j + 1 >= n:
                    if not final:
                        return s[i:]  # possibly split across chunks
                    i = self._salvage(s, i)
                    continue
                else:
                    self.handle_data(s[i:j])  # junk: '<...' becomes text
                    i = j
                    continue
            elif nxt2 == "" or nxt2 in (
                    "abcdefghijklmnopqrstuvwxyz="
                    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"):
                # end of input, possibly inside an attribute value —
                # buffer boundary (check_for_whole_start_tag returns -1)
                if not final:
                    return s[i:]
                i = self._salvage(s, i)
                continue
            else:
                endpos = j if j > i else i + 1

            raw = s[i:endpos]
            cached = _TAG_CACHE.get(raw)
            if cached is None:
                mt = _hp.tagfind_tolerant.match(s, i + 1)
                tag = mt.group(1).lower()
                attrs: dict = {}
                k = mt.end()
                while k < endpos:
                    am = _hp.attrfind_tolerant.match(s, k)
                    if not am:
                        break
                    name, rest, value = am.group(1, 2, 3)
                    if not rest:
                        value = None
                    elif value[:1] == "'" == value[-1:] \
                            or value[:1] == '"' == value[-1:]:
                        value = value[1:-1]
                    if value:
                        value = _unescape(value)
                    name = name.lower()
                    if name not in attrs:  # first duplicate wins
                        attrs[name] = value if value is not None else ""
                    k = am.end()

                endtext = s[k:endpos].strip()
                kind = (0 if endtext not in (">", "/>")
                        else 1 if endtext == "/>" else 2)
                if len(_TAG_CACHE) >= _TAG_CACHE_MAX:
                    _TAG_CACHE.clear()
                _TAG_CACHE[raw] = (tag, attrs, kind)
            else:
                tag, attrs, kind = cached

            if kind == 0:
                self.handle_data(raw)
            elif kind == 1:
                self.handle_startendtag(tag, attrs)
            else:
                self.handle_starttag(tag, attrs)
                if tag in _CDATA_ELEMS:  # html.parser enters CDATA mode
                    self._cdata_elem = tag  # regardless of context
            i = endpos
        return ""

    def _salvage(self, s: str, i: int) -> int:
        """Incomplete construct at EOF: html.parser consumes up to the
        next '>' (inclusive) or '<' (exclusive), emits that slice as
        charref-decoded data, and RESUMES parsing (goahead's k<0 path)."""
        k = s.find(">", i + 1)
        if k < 0:
            k = s.find("<", i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        self.handle_data(_unescape(s[i:k])
                         if self._cdata_elem is None else s[i:k])
        return k
