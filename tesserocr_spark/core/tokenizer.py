"""Fast HTML event tokenizer — a drop-in for the stdlib ``html.parser``
tokenization in the extraction hot path.

Profiling the extraction UDF shows ~70% of per-document CPU inside
``HTMLParser.goahead``/``parse_starttag``/``parse_endtag`` (pure tokenizer
overhead — the segmentation logic itself is cheap). This module re-implements
just the tokenization as one compiled master regex driven from a tight loop,
emitting the exact same ``handle_starttag``/``handle_endtag``/``handle_data``
event stream ``HTMLParser(convert_charrefs=True)`` produces for the grammar
it recognizes, and **returning False (caller falls back to the stdlib
parser) for anything outside that grammar** — unterminated tags, marked
sections (``<![``), junk-in-tag constructs. Byte-identity with the stdlib
event stream is enforced by tests/test_tokenizer.py (directed edge cases +
hypothesis fuzz comparing full event streams).

Replicated stdlib behaviors (verified empirically against CPython 3.11):

* tag names ``[a-zA-Z][^\\t\\n\\r\\f />\\x00]*``, lowercased;
* attribute grammar of ``attrfind_tolerant`` — quoted values, unquoted
  values that may contain ``<`` and swallow trailing ``/`` (so
  ``<a href=foo/>`` is a plain start tag while ``<br/>`` self-closes),
  ``(?:\\s|/(?!>))*`` junk-eating between attributes;
* self-closing tags emit start+end (``handle_startendtag`` default);
* ``<script>``/``<style>`` enter CDATA content mode: contents are one raw
  (non-unescaped) data event ending at case-insensitive ``</script`` that
  must complete a well-formed end tag (else: fallback);
* comments end at ``--\\s*>``; declarations and PIs at the first ``>``
  (``<![`` marked sections are not attempted — fallback);
* a ``<`` that opens no construct is its own one-character data event
  (``"a < b"`` → ``"a "``, ``"<"``, ``" b"``);
* text runs are entity-unescaped per event with ``html.unescape`` —
  CDATA contents are not.

NOT a general drop-in: start-tag ATTRIBUTES are never reported —
``handle_starttag`` always receives an empty attrs list (the attribute
grammar is matched only to find the tag end). The sole consumer,
``segment._Segmenter``, ignores attrs by contract; a consumer that reads
them must use the stdlib parser (tests/test_tokenizer.py locks the
segmenter contract with an attrs-rich directed case).

The atomic groups (``(?>...)``, Python ≥3.11) in the attribute grammar keep
matching linear on adversarial inputs (no nested-quantifier backtracking).
"""

from __future__ import annotations

import re
from html import unescape as _unescape

#: master token pattern; one of startname/endname matches, or the token is a
#: comment/declaration/PI (no event). Attribute grammar mirrors
#: html.parser's attrfind_tolerant/locatestarttagend_tolerant.
_TOKEN_RE = re.compile(
    r"""<(?:
      /\s*(?P<endname>[a-zA-Z][-.a-zA-Z0-9:_]*)\s*>
    | (?P<startname>[a-zA-Z](?>[^\t\n\r\f\ />\x00]*))
        (?>(?:\s|/(?!>))*)
        (?>(?:(?<=['"\s/])[^\s/>][^\s/=>]*
             (?>(?:\s*=+\s*(?>'[^']*'|"[^"]*"|(?!['"])[^>\s]*))?)
             (?>(?:\s|/(?!>))*)
           )*)
        (?P<selfclose>/?)>
    | !--.*?--\s*>
    | !(?!--)[^>\[]*>
    | \?[^>]*>
    )""",
    re.VERBOSE | re.DOTALL,
)

#: a "<" in inter-token text that looks like it should have opened a tag but
#: didn't match the master pattern → the document needs the stdlib parser.
_SUSPICIOUS_RE = re.compile(r"<[a-zA-Z/!?]")

#: CDATA content elements (html.parser CDATA_CONTENT_ELEMENTS) and their
#: terminators: loose scan first (stdlib ``interesting`` regex), then the
#: strict well-formed end tag must match at the same spot.
_CDATA_LOOSE = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
_CDATA_STRICT = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}

_NO_ATTRS: list = []


def _comma_outside_quotes(s: str) -> bool:
    """stdlib's locate grammar has a ``(?:\\s*,)*`` group its attr re-parse
    lacks, giving commas between attributes bespoke junk handling — any
    comma outside a quoted value punts to the stdlib parser."""
    q = ""
    for ch in s:
        if q:
            if ch == q:
                q = ""
        elif ch in "'\"":
            q = ch
        elif ch == ",":
            return True
    return False


def fast_feed(text: str, handler) -> bool:
    """Tokenize ``text`` and drive ``handler.handle_starttag/endtag/data``.

    Returns True on success; False when the document contains a construct
    outside the fast grammar — the caller must then re-run the stdlib
    ``HTMLParser`` on a FRESH handler (this handler may hold partial state).

    ``handle_starttag`` is always called with an EMPTY attrs list (module
    docstring): attributes are consumed, never parsed into pairs.
    """
    handle_data = handler.handle_data
    handle_start = handler.handle_starttag
    handle_end = handler.handle_endtag
    search = _TOKEN_RE.search
    suspicious = _SUSPICIOUS_RE.search
    pos, n = 0, len(text)

    while pos < n:
        m = search(text, pos)
        gap_end = m.start() if m is not None else n
        if gap_end > pos:
            gap = text[pos:gap_end]
            if "<" in gap:
                if suspicious(gap) is not None:
                    return False
                # stdlib emits a lone "<" that opens nothing as its own
                # data event; entity-unescape applies per surrounding piece
                pieces = gap.split("<")
                if pieces[0]:
                    p = pieces[0]
                    handle_data(_unescape(p) if "&" in p else p)
                for p in pieces[1:]:
                    handle_data("<")
                    if p:
                        handle_data(_unescape(p) if "&" in p else p)
            else:
                handle_data(_unescape(gap) if "&" in gap else gap)
        if m is None:
            break
        pos = m.end()
        # one C call for all three capture groups (endname, startname, selfclose)
        ename, name, selfclose = m.group("endname", "startname", "selfclose")
        if name is not None:
            g0 = m.group(0)
            if "," in g0 and _comma_outside_quotes(g0):
                return False
            tag = name.lower()
            handle_start(tag, _NO_ATTRS)
            if selfclose:
                handle_end(tag)
            elif tag in _CDATA_LOOSE:
                lm = _CDATA_LOOSE[tag].search(text, pos)
                if lm is None:
                    # unterminated CDATA: stdlib DROPS the trailing content
                    # (goahead's end-of-data flush is guarded by
                    # ``not cdata_elem``) — so do we
                    return True
                sm = _CDATA_STRICT[tag].match(text, lm.start())
                if sm is None:
                    # e.g. "</scriptx" — stdlib keeps it as data; fall back
                    return False
                if lm.start() > pos:
                    handle_data(text[pos:lm.start()])  # raw: no unescape
                handle_end(tag)
                pos = sm.end()
        elif ename is not None:
            handle_end(ename.lower())
        # else: comments / declarations / PIs — no events
    return True
