"""Pure-Python extraction core (Spark-free, shared by UDFs and fixtures)."""

from .extractor import ExtractedDoc, Extractor, Span, as_span, word_conf, word_flags
from .fold import box_rows, fold_spans, hocr_text, tsv_rows, unlv_text
from .osd import AVAILABLE_LANGUAGES, detect_os

__all__ = [
    "AVAILABLE_LANGUAGES",
    "ExtractedDoc",
    "Span",
    "as_span",
    "Extractor",
    "box_rows",
    "detect_os",
    "fold_spans",
    "hocr_text",
    "tsv_rows",
    "unlv_text",
    "word_conf",
    "word_flags",
]
