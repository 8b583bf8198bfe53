"""Property-based tests (hypothesis): the extraction laws hold for arbitrary
generated HTML, not just the curated corpus."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tesserocr_spark import PSM, RIL, ExtractorConfig
from tesserocr_spark.core import Extractor, fold_spans

_EX = Extractor()

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           max_codepoint=0x24F),
    min_size=1, max_size=10,
)
sentences = st.lists(words, min_size=1, max_size=8).map(lambda ws: " ".join(ws) + ".")
paragraphs = st.lists(sentences, min_size=1, max_size=4).map(" ".join)

inline = st.sampled_from(["", "<b>{}</b>", "<i>{}</i>", "<sup>{}</sup>", "<a href='#'>{}</a>"])


@st.composite
def html_docs(draw):
    parts = ["<html><body>"]
    if draw(st.booleans()):
        links = draw(st.lists(words, min_size=1, max_size=5))
        parts.append("<nav>" + " ".join(f"<a href='#'>{w}</a>" for w in links) + "</nav>")
    parts.append("<main>")
    for _ in range(draw(st.integers(1, 4))):
        body = draw(paragraphs)
        wrap = draw(inline)
        if wrap:
            body = wrap.format(body.split(" ")[0]) + " " + body
        parts.append(f"<p>{body}</p>")
    if draw(st.booleans()):
        parts.append("<figure><img src='x'></figure>")
    parts.append("</main>")
    if draw(st.booleans()):
        parts.append("<footer>foot note</footer>")
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


@given(html_docs())
@settings(max_examples=60, deadline=None)
def test_fold_equals_text(html):
    d = _EX.extract(html)
    assert fold_spans(d.spans) == d.text


@given(html_docs())
@settings(max_examples=60, deadline=None)
def test_text_fast_path_equals_full(html):
    assert _EX.extract_text(html) == _EX.extract(html).text


@given(html_docs())
@settings(max_examples=40, deadline=None)
def test_reading_order_and_envelopes(html):
    d = _EX.extract(html)
    keys = [(s.block_id, s.para_id, s.line_id, s.word_id, s.symbol_id, s.level)
            for s in d.spans]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    parents = {(s.level, s.block_id, s.para_id, s.line_id, s.word_id): s
               for s in d.spans}
    for s in d.spans:
        if s.level == RIL.BLOCK:
            continue
        pk = {
            RIL.PARA: (RIL.BLOCK, s.block_id, -1, -1, -1),
            RIL.TEXTLINE: (RIL.PARA, s.block_id, s.para_id, -1, -1),
            RIL.WORD: (RIL.TEXTLINE, s.block_id, s.para_id, s.line_id, -1),
            RIL.SYMBOL: (RIL.WORD, s.block_id, s.para_id, s.line_id, s.word_id),
        }[s.level]
        p = parents[pk]
        assert p.bbox[0] <= s.bbox[0] and p.bbox[1] <= s.bbox[1]
        assert p.bbox[2] >= s.bbox[2] and p.bbox[3] >= s.bbox[3]


@given(html_docs())
@settings(max_examples=40, deadline=None)
def test_symbols_concat_and_confidence_law(html):
    from tesserocr_spark.core import word_conf

    d = _EX.extract(html)
    words_, syms = {}, {}
    for s in d.spans:
        k = (s.block_id, s.para_id, s.line_id, s.word_id)
        if s.level == RIL.WORD and s.text is not None:
            words_[k] = s
        elif s.level == RIL.SYMBOL:
            syms.setdefault(k, []).append((s.symbol_id, s.text))
    for k, w in words_.items():
        assert "".join(t for _, t in sorted(syms[k])) == w.text
        assert w.conf == word_conf(w.text)


@given(html_docs())
@settings(max_examples=30, deadline=None)
def test_auto_text_is_subset_of_single_column(html):
    """Boilerplate stripping only removes; it never invents content."""
    auto_words = set(_EX.extract_text(html).split())
    allw = set(
        Extractor(ExtractorConfig(psm=PSM.SINGLE_COLUMN)).extract_text(html).split()
    )
    assert auto_words <= allw


@given(st.binary(max_size=400))
@settings(max_examples=60, deadline=None)
def test_never_raises_on_garbage(data):
    """Malformed bytes degrade to (possibly empty) text, never an exception."""
    d = _EX.extract(data)
    assert fold_spans(d.spans) == d.text


@given(html_docs(),
       st.text(alphabet=" |\n\t-", min_size=1, max_size=3),
       st.text(alphabet=" |\n\t-", min_size=1, max_size=3))
@settings(max_examples=40, deadline=None)
def test_fold_separator_law(html, line_sep, para_sep):
    """Parameterized fold law: default separators reproduce extracted_text
    byte-for-byte; custom separators appear exactly where the law says —
    swapping them back in recovers the default fold."""
    d = _EX.extract(html)
    assert fold_spans(d.spans) == d.text
    custom = fold_spans(d.spans, line_sep, para_sep)
    # reversible when the separators are unambiguous markers; non-default
    # separators terminate the final paragraph too, which the default law
    # normalizes away — hence the extra trailing "\n" (iff any paragraph)
    marked = fold_spans(d.spans, "\x01", "\x02")
    expected = d.text + "\n" if d.text else d.text
    assert marked.replace("\x01", "\n").replace("\x02", "\n") == expected
    # word content is separator-invariant (non-empty seps keep boundaries;
    # empty separators legally merge adjacent words, like the reference)
    def strip(s, seps):
        # longer separator first, else a shorter one that prefixes the
        # longer leaves fragments behind (e.g. line="|", para="|-")
        for sep in sorted(seps, key=len, reverse=True):
            s = s.replace(sep, " ")
        return s.split()
    assert strip(custom, (line_sep, para_sep)) == strip(d.text, ("\n", "\n"))


class TestContainerParserProperties:
    """Build → parse roundtrip laws for the real BMP/WAV parsers."""

    @given(
        w=st.integers(min_value=1, max_value=512),
        h=st.integers(min_value=1, max_value=256),
        bpp=st.sampled_from([1, 4, 8, 16, 24, 32]),
        fill=st.integers(min_value=0, max_value=255),
    )
    @settings(max_examples=60, deadline=None)
    def test_bmp_roundtrip(self, w, h, bpp, fill):
        from tesserocr_spark.multimodal import make_bmp, parse_bmp

        m = parse_bmp(make_bmp(w, h, bpp, fill))
        assert m is not None
        assert (m["width"], m["height"], m["bpp"]) == (w, h, bpp)
        assert m["n_frames"] == 1

    @given(
        ch=st.integers(min_value=1, max_value=8),
        rate=st.integers(min_value=1, max_value=192000),
        bits=st.sampled_from([8, 16, 24, 32]),
        frames=st.integers(min_value=0, max_value=4096),
    )
    @settings(max_examples=60, deadline=None)
    def test_wav_roundtrip(self, ch, rate, bits, frames):
        from tesserocr_spark.multimodal import make_wav, parse_wav

        m = parse_wav(make_wav(ch, rate, bits, frames))
        assert m is not None
        assert (m["n_channels"], m["sample_rate"], m["bpp"]) == (ch, rate, bits)
        assert m["n_frames"] == frames

    @given(
        w=st.integers(min_value=1, max_value=64),
        h=st.integers(min_value=1, max_value=32),
        ct=st.sampled_from([0, 2, 3, 4, 6]),
        data=st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_roundtrip_and_pixel_decode(self, w, h, ct, data):
        """Build → parse → full pixel decode: random pixel content survives
        deflate + the five scanline filters bit-exactly (heights >= 5
        exercise every filter type via make_png's y % 5 rule)."""
        from tesserocr_spark.multimodal import (
            _PNG_CHANNELS,
            decode_png_pixels,
            make_png,
            parse_png,
        )

        ch = _PNG_CHANNELS[ct]
        pixels = bytes(
            data.draw(st.integers(min_value=0, max_value=255))
            for _ in range(min(w * h * ch, 64))
        )
        pixels = (pixels * (w * h * ch // max(1, len(pixels)) + 1))[: w * h * ch]
        png = make_png(w, h, ct, pixels)
        m = parse_png(png)
        assert m is not None
        assert (m["width"], m["height"], m["n_channels"]) == (w, h, ch)
        assert m["bpp"] == 8 * ch and m["format"] == "png"
        assert decode_png_pixels(png) == pixels

    @given(
        png_params=st.tuples(
            st.integers(min_value=1, max_value=48),
            st.integers(min_value=5, max_value=24),
        ),
        flip=st.integers(min_value=0, max_value=10**6),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_single_bitflip_in_ihdr_region_never_misparses(self, png_params, flip):
        """Corrupt one bit anywhere in the signature/IHDR region: the
        parser must either reject (CRC/signature) or — when the flip lands
        in the CRC'd-but-recomputable region — never crash. decode_media
        always falls back cleanly."""
        from tesserocr_spark.multimodal import decode_media, make_png

        png = bytearray(make_png(*png_params, 2))
        idx = flip % 33  # signature (8) + IHDR chunk (25)
        png[idx] ^= 1 << (flip % 8)
        m = decode_media(bytes(png))  # must not raise
        assert m["n_bytes"] == len(png)

    @given(blob=st.binary(max_size=200))
    @settings(max_examples=80, deadline=None)
    def test_arbitrary_bytes_never_crash_decode(self, blob):
        """decode_media never raises on arbitrary input — malformed blobs
        fall back to the deterministic stub (a 100 TB scan must not die
        on one bad payload)."""
        from tesserocr_spark.multimodal import decode_media

        m = decode_media(blob)
        assert m["format"] in ("bmp", "png", "wav", "raw")
        assert m["n_bytes"] == len(blob)
