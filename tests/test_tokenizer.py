"""Fast tokenizer ≡ stdlib html.parser event-stream equivalence.

The byte-identity laws (core/extractor.py docstring) sit downstream of the
tokenizer, so the fast path must emit the *identical* event stream the
stdlib ``HTMLParser(convert_charrefs=True)`` does for every document it
accepts — and must refuse (fallback) anything it can't reproduce exactly.
Three layers:

1. directed edge cases (every behavior probed from CPython 3.11);
2. full-corpus equality of ``parse_paragraphs`` vs ``parse_paragraphs_stdlib``
   over the seeded synthetic pages (all degenerate kinds) + template docs;
3. hypothesis fuzz over an HTML-shaped alphabet comparing raw event streams.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tesserocr_spark.core.segment import parse_paragraphs, parse_paragraphs_stdlib
from tesserocr_spark.core.tokenizer import fast_feed


class _Recorder:
    def __init__(self) -> None:
        self.events: list[tuple] = []

    def handle_starttag(self, tag, attrs):
        self.events.append(("S", tag))

    def handle_endtag(self, tag):
        self.events.append(("E", tag))

    def handle_data(self, data):
        self.events.append(("D", data))


class _StdRecorder(_Recorder, HTMLParser):  # _Recorder first: its handlers win
    def __init__(self) -> None:
        HTMLParser.__init__(self, convert_charrefs=True)
        self.events = []


def stdlib_events(html: str) -> list[tuple]:
    p = _StdRecorder()
    p.feed(html)
    p.close()
    return p.events


def fast_events(html: str):
    r = _Recorder()
    ok = fast_feed(html, r)
    return r.events if ok else None


def assert_equivalent(html: str) -> None:
    fast = fast_events(html)
    if fast is not None:  # fallback documents are allowed to punt
        assert fast == stdlib_events(html), repr(html)


DIRECTED = [
    "",
    "plain text only",
    "a < b",
    "a<3",
    "x<",
    "<",
    "a<<p>b",
    "<p>a&amp;b</p>",
    "a&ampb",
    "tail&amp",
    "&lt;p&gt;not a tag",
    "<!DOCTYPE html><p>x</p>",
    "<!-- comment -->t",
    "<!-- a --->t",
    "<?php e ?>f",
    "<br/>",
    "<br />",
    "<p/>x",
    "<img src='a>b'>c",
    '<img src="a>b">c',
    "<a href=a<b>d</a>",
    "<a href=foo/>x</a>",
    "<a disabled/>y",
    "<div / >y",
    "<a x= y>z</a>",
    '<a href="x"y=z>w</a>',
    "<P>X</P>",
    "<p a==b>t</p>",
    "<script>x & y</SCRIPT>z",
    "<SCRIPT>q</script>",
    "<script>var a = '<p>';</script>after",
    "<script>unterminated",
    "<style>p{color:red}</style>q",
    "<style></style>empty",
    "<title>a&amp;b</title>",
    "<p>a\r\nb</p>",
    "<td>cell</td>",
    "<p>one</p><p>two</p>",
    "<ul><li>a</li><li>b</li></ul>",
    "<p>unclosed <b>bold <i>nest",
    "<figure><img src='i.png'><figcaption>cap 2<sup>8</sup> &amp; "
    "H<sub>2</sub>O&#x2026;</figcaption></figure>",
    "<nav><a href='#'>one</a> <a href='#'>two</a></nav>",
    "word <b>bo</b>ld join",  # fragment boundary without whitespace
]

# constructs the fast path must refuse (stdlib has bespoke tolerance)
MUST_FALLBACK = [
    "<![CDATA[a>b]]>g",
    "<!-->",
    "<p junk><a href=unterminated",
    "<script>a</scriptx>b</script>c",
    "</ >z",
]


@pytest.mark.parametrize("html", DIRECTED)
def test_directed_equivalence(html):
    assert fast_events(html) is not None, f"unexpected fallback: {html!r}"
    assert fast_events(html) == stdlib_events(html)


@pytest.mark.parametrize("html", MUST_FALLBACK)
def test_fallback_documents_punt_or_match(html):
    assert_equivalent(html)  # either exact match or fallback (None)


def test_attrs_dropped_and_segmenter_never_reads_them():
    """fast_feed always passes an EMPTY attrs list to handle_starttag
    (documented non-drop-in, ADVICE r02 low #2). Lock the two halves of
    that contract: the fast path reports no attrs where the stdlib parser
    reports real ones, AND the only consumer (the segmenter) produces
    identical output over attrs-rich markup — proving it never reads them."""
    html = (
        "<div id='a' class=\"b c\"><p data-x=1 hidden>text "
        "<a href=https://e.com/u rel=nofollow>link</a> tail</p></div>"
    )

    class _AttrRec(HTMLParser):
        def __init__(self):
            HTMLParser.__init__(self, convert_charrefs=True)
            self.attrs = []

        def handle_starttag(self, tag, attrs):
            self.attrs.append((tag, attrs))

    std = _AttrRec()
    std.feed(html)
    assert any(a for _, a in std.attrs), "stdlib should see real attrs"

    class _FastRec(_Recorder):
        def __init__(self):
            _Recorder.__init__(self)
            self.attrs = []

        def handle_starttag(self, tag, attrs):
            self.attrs.append(list(attrs))
            _Recorder.handle_starttag(self, tag, attrs)

    fr = _FastRec()
    assert fast_feed(html, fr), "attrs-rich html should stay on the fast path"
    assert all(a == [] for a in fr.attrs)
    assert _para_key(parse_paragraphs(html)) == _para_key(
        parse_paragraphs_stdlib(html)
    )


def test_fallback_path_produces_stdlib_result():
    # parse_paragraphs must transparently reroute fallback docs
    for html in MUST_FALLBACK:
        a = parse_paragraphs(html)
        b = parse_paragraphs_stdlib(html)
        assert [(p.tag, p.boiler, p.is_image, [(f.text, f.link, f.style) for f in p.frags])
                for p in a] == \
               [(p.tag, p.boiler, p.is_image, [(f.text, f.link, f.style) for f in p.frags])
                for p in b]


def _para_key(paras):
    return [(p.tag, p.region, p.boiler, p.is_image,
             [(f.text, f.link, f.style) for f in p.frags]) for p in paras]


def test_full_synthetic_corpus_identical():
    from tesserocr_spark.pages import make_page

    for i in range(600):  # covers every degenerate kind (period 97)
        html = make_page(i)[2].decode("utf-8", "replace")
        assert _para_key(parse_paragraphs(html)) == _para_key(
            parse_paragraphs_stdlib(html)
        ), f"page {i}"


def test_template_corpus_identical():
    from tesserocr_spark.pages import DOC_TEMPLATE_PREFIX, DOC_TEMPLATE_SUFFIX

    for body in ("hello world", "a&amp;b < c", "", "x " * 500):
        html = DOC_TEMPLATE_PREFIX + body + DOC_TEMPLATE_SUFFIX
        assert _para_key(parse_paragraphs(html)) == _para_key(
            parse_paragraphs_stdlib(html)
        )


# HTML-shaped fuzz: slam fragments together so tags straddle, nest, and break
_FRAGS = st.sampled_from(
    [
        "<p>", "</p>", "<div>", "</div>", "<b>", "</b>", "<br>", "<br/>",
        "<a href='x'>", "<a href=\"y\">", "<a href=z>", "</a>", "<img src='i'>",
        "<script>", "</script>", "<style>", "</style>", "<SCRIPT>", "</SCRIPT>",
        "<!-- c -->", "<!doctype html>", "<?pi?>", "<![CDATA[x]]>",
        "text", " ", "&amp;", "&lt;", "&#65;", "&amp", "&x", "<", ">", "/",
        "=", "'", '"', "a<b", "<3", "<p", "-->", "]]>", "<p a=1 b='2' c>",
        "<p a", "\n", "\t", "<div / >", "<a disabled/>", "<a href=u/>", "é", "…",
    ]
)


@settings(max_examples=400, deadline=None)
@given(st.lists(_FRAGS, min_size=0, max_size=12))
def test_fuzz_event_equivalence(frags):
    assert_equivalent("".join(frags))


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>/!?&;abp ='\"-\n", max_size=60))
def test_fuzz_raw_soup_equivalence(soup):
    assert_equivalent(soup)
