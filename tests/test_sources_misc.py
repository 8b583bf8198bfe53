"""File-source ingestion, thresholded view, span content, misc accessors."""

from __future__ import annotations

from pyspark.sql import functions as F

from tesserocr_spark import OEM, RIL
from tesserocr_spark.api import SparkPageAPI
from tesserocr_spark.pages import file_to_text, make_page, pages_from_files


def _write_html_files(tmp_path, n=5):
    d = tmp_path / "htmls"
    d.mkdir()
    expected = {}
    from tesserocr_spark.core import Extractor

    ex = Extractor()
    for i in range(n):
        _url, _ts, html, _text, _lang = make_page(i)
        f = d / f"page{i}.html"
        f.write_bytes(html)
        expected[str(f)] = ex.extract(html).text
    return d, expected


def test_pages_from_files_schema(spark, tmp_path):
    d, _ = _write_html_files(tmp_path)
    pages = pages_from_files(spark, str(d))
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    assert pages.count() == 5


def test_file_to_text_matches_core(spark, tmp_path):
    d, expected = _write_html_files(tmp_path)
    got = {r.url.replace("file:", ""): r.extracted_text
           for r in file_to_text(spark, str(d)).collect()}
    assert got == expected


def test_thresholded_text_keeps_boilerplate(spark):
    html = b'<nav><a href="#">navword</a></nav><main><p>body text</p></main>'
    df = spark.createDataFrame([("u", html)], "url string, html binary")
    api = SparkPageAPI(spark).set_pages(df)
    row = api.get_thresholded_text().collect()[0]
    assert "navword" in row.thresholded_text and "body text" in row.thresholded_text
    assert row.scale_factor == 1
    # while the recognized text strips it
    assert "navword" not in api.get_utf8_text().collect()[0].text
    api.end()


def test_span_content_equals_text(spark):
    html = b"<main><p>alpha beta gamma. second line here</p></main>"
    df = spark.createDataFrame([("u", html)], "url string, html binary")
    api = SparkPageAPI(spark).set_pages(df)
    for level in (RIL.WORD, RIL.SYMBOL):
        rows = api.span_content(level).collect()
        assert rows
        for r in rows:
            assert r.content == r.text  # crop-by-box == recognized text
    api.end()


def test_misc_accessors(spark):
    api = SparkPageAPI(spark)
    assert api.oem() == OEM.DEFAULT
    api.clear_persistent_cache()  # no-op smoke
    from tesserocr_spark import tesseract_version

    assert "tesserocr_spark" in tesseract_version()


def test_set_leptonica_log_level(spark):
    """set_leptonica_log_level (reference tesserocr/tesserocr.pyx:2828-2833)
    maps LeptLogLevel onto the engine's log backend; invalid levels raise."""
    import pytest

    from tesserocr_spark import LeptLogLevel, set_leptonica_log_level

    set_leptonica_log_level(spark, LeptLogLevel.NONE)
    set_leptonica_log_level(spark.sparkContext, LeptLogLevel.DEBUG)  # ctx too
    set_leptonica_log_level(spark, LeptLogLevel.EXTERNAL)  # no-op: env default
    for bad in (42, None, "WARN"):
        with pytest.raises(ValueError, match="LeptLogLevel"):
            set_leptonica_log_level(spark, bad)
    set_leptonica_log_level(spark, LeptLogLevel.ERROR)  # restore quiet tests
