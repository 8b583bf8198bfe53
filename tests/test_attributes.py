"""Attribute-view tests: font/style flags, choices, charset, rect one-shot."""

from __future__ import annotations

from pyspark.sql import functions as F

from tesserocr_spark.api import SparkPageAPI, extract_pages, spans_long, tesseract_rect
from tesserocr_spark.pages import synthetic_pages


def _api(spark, html_rows):
    df = spark.createDataFrame(
        [(f"u{i}", h) for i, h in enumerate(html_rows)], "url string, html binary"
    )
    return SparkPageAPI(spark).set_pages(df)


STYLED = b"""<main><p>normal <b>boldword</b> <i>italicword</i>
<code>monoword</code> mix<b>ed</b> 2<sup>8</sup></p></main>"""


def test_word_font_attributes(spark):
    api = _api(spark, [STYLED])
    fa = {r.word: (r.bold, r.italic, r.monospace)
          for r in api.word_font_attributes().collect()}
    assert fa["boldword"] == (True, False, False)
    assert fa["italicword"] == (False, True, False)
    assert fa["monoword"] == (False, False, True)
    assert fa["normal"] == (False, False, False)
    # mixed-style word: AND-fold -> not fully bold
    assert fa["mixed"] == (False, False, False)
    api.end()


def test_symbol_attributes_and_choices(spark):
    api = _api(spark, [STYLED])
    sym = {(r.symbol, r.is_superscript) for r in api.symbol_attributes().collect()}
    assert ("8", True) in sym
    ch = api.get_choice_iterator().collect()
    for r in ch:
        choices = r.choices
        assert choices[0]["conf"] >= choices[-1]["conf"]  # best-first
    api.end()


def test_lstm_choices_concat_to_word(spark):
    """Per-timestep best symbols concatenate to the word text
    (reference invariant, tests/test_api.py:188-206)."""
    api = _api(spark, [STYLED])
    words = {(r.url, r.block_id, r.para_id, r.line_id, r.word_id): r.text
             for r in api.get_words().collect()}
    for r in api.get_best_lstm_symbol_choices().collect():
        best = "".join(step[0]["symbol"] for step in r.timesteps)
        assert best == words[(r.url, r.block_id, r.para_id, r.line_id, r.word_id)]
    api.end()


def test_paragraph_row_baseline_polygon(spark):
    api = _api(spark, [STYLED, b"<p>two</p><p>paras here</p>"])
    pi = api.paragraph_info().collect()
    assert all(r.justification == 1 and r.first_line_indent == 0 for r in pi)
    ra = api.row_attributes().collect()
    assert all(r.row_height == 1.0 for r in ra)
    bl = api.baseline().collect()
    assert all(r.y1 == r.y2 for r in bl)  # horizontal baselines
    poly = api.block_polygon().collect()
    assert all(len(r.polygon) == 4 for r in poly)
    ori = api.orientation().collect()
    assert all(r.orientation == 0 and r.deskew_angle == 0.0 for r in ori)
    api.end()


def test_charset_and_validity(spark):
    api = _api(spark, [b"<p>abc abd</p>"])
    tbl = {r.glyph: r.unichar_id for r in api.charset_table().collect()}
    assert set(tbl) == {"a", "b", "c", "d"}
    assert [tbl[g] for g in sorted(tbl)] == [0, 1, 2, 3]
    assert api.is_valid_character("a")
    assert not api.is_valid_character("ab")
    api.set_variable("tessedit_char_blacklist", "z")
    assert not api.is_valid_character("z")
    api.end()


def test_empty_level_and_text_direction(spark):
    api = _api(spark, [b"", b"<p>word</p>"])
    empt = api.empty(3).collect()  # WORD level
    assert [r.url for r in empt] == ["u0"]
    td = api.get_text_direction().collect()
    assert all(r.offset == 0 and r.slope == 0.0 for r in td)
    api.end()


def test_tesseract_rect_one_shot(spark):
    pages = synthetic_pages(spark, 5)
    full = {r.url: r.extracted_text for r in
            extract_pages(pages).select("url", "extracted_text").collect()}
    rect = {r.url: r.text for r in tesseract_rect(pages, 0, 0, 10_000, 1).collect()}
    for url, t in rect.items():
        if full[url]:
            assert t == full[url].split("\n")[0] + "\n"  # first grid row only


def test_connected_components(spark):
    api = _api(spark, [STYLED])
    cc = api.get_connected_components()
    assert cc.count() > 0
    assert cc.filter(F.col("text").isNotNull()).count() == 0  # layout-only
    api.end()
