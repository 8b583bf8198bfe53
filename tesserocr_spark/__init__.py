"""tesserocr_spark — a PySpark-native main-content extraction engine.

A from-scratch re-expression of sirfz/tesserocr's page-analysis semantics
(BLOCK→PARA→TEXTLINE→WORD→SYMBOL span hierarchy, RIL-style result iteration,
GetUTF8Text-equivalent folding, multi-format renderers) for Common-Crawl-style
web pages on Apache Spark: declarative DataFrame plans for everything
relational, one vectorized Arrow UDF for the extraction itself.

Reference (study-only, no code copied): /root/reference (sirfz/tesserocr),
cited throughout as tesserocr/tesserocr.pyx:line.
"""

__version__ = "0.1.0"

from .config import DEFAULT_CONFIG, ExtractorConfig, read_config_file
from .constants import DIR, OEM, PSM, PT, RIL, Justification, Orientation

__all__ = [
    "DEFAULT_CONFIG",
    "DIR",
    "ExtractorConfig",
    "Justification",
    "OEM",
    "Orientation",
    "PSM",
    "PT",
    "RIL",
    "__version__",
    "read_config_file",
]


def tesseract_version() -> str:
    """Version string (reference tesseract_version, tesserocr/tesserocr.pyx:2782-2788)."""
    return f"tesserocr_spark {__version__}"
