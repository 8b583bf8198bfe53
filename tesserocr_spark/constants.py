"""Enum constants mirroring the reference's categorical vocabulary.

The reference exposes these as int-subclass enum namespaces
(reference: tesserocr/tesserocr.pyx:83-351). We keep the same names and
integer codes so span rows are interoperable with reference fixtures, but
reinterpret them for HTML main-content extraction:

* RIL   — result-iterator level of a span (tesserocr/tesserocr.pyx:183-207)
* PSM   — page-segmentation strategy (tesserocr/tesserocr.pyx:116-180)
* OEM   — engine mode (tesserocr/tesserocr.pyx:89-113); here it selects the
          boilerplate-scoring flavor
* PT    — block (poly-type) semantic class (tesserocr/tesserocr.pyx:210-277);
          here derived from the DOM tag of the region
* Orientation / WritingDirection / TextlineOrder / Justification / DIR —
  layout attribute codes (tesserocr/tesserocr.pyx:280-332)
"""

from __future__ import annotations


class RIL:
    """Result-iterator level. Reference: tesserocr/tesserocr.pyx:183-207."""

    BLOCK = 0
    PARA = 1
    TEXTLINE = 2
    WORD = 3
    SYMBOL = 4

    _NAMES = {0: "BLOCK", 1: "PARA", 2: "TEXTLINE", 3: "WORD", 4: "SYMBOL"}


class PSM:
    """Page segmentation modes. Reference: tesserocr/tesserocr.pyx:116-180.

    HTML reinterpretation (the segmentation *strategy* of the extractor):

    * OSD_ONLY        — script/orientation detection only; no spans, no text.
    * AUTO_OSD        — AUTO segmentation + OSD struct.
    * AUTO_ONLY       — segmentation without recognition: spans carry geometry
                        and ids but ``text`` is NULL (AnalyseLayout analogue,
                        tesserocr/tesserocr.pyx:2113-2134).
    * AUTO            — full DOM segmentation + boilerplate strip (default).
    * SINGLE_COLUMN   — like AUTO but no boilerplate strip (keep all blocks).
    * SINGLE_BLOCK    — whole document as one block, paragraphs by blank line.
    * SINGLE_LINE     — whole document as one block/para/line.
    * SINGLE_WORD     — first word only.
    * SINGLE_CHAR     — first character only.
    * SPARSE_TEXT     — every text node kept (no boilerplate strip, no
                        hierarchy inference: one para/line per text node).
    * SPARSE_TEXT_OSD — SPARSE_TEXT + OSD.
    """

    OSD_ONLY = 0
    AUTO_OSD = 1
    AUTO_ONLY = 2
    AUTO = 3
    SINGLE_COLUMN = 4
    SINGLE_BLOCK_VERT_TEXT = 5
    SINGLE_BLOCK = 6
    SINGLE_LINE = 7
    SINGLE_WORD = 8
    CIRCLE_WORD = 9
    SINGLE_CHAR = 10
    SPARSE_TEXT = 11
    SPARSE_TEXT_OSD = 12
    RAW_LINE = 13
    COUNT = 14


class OEM:
    """Engine modes. Reference: tesserocr/tesserocr.pyx:89-113."""

    TESSERACT_ONLY = 0
    LSTM_ONLY = 1
    TESSERACT_LSTM_COMBINED = 2
    DEFAULT = 3


class PT:
    """Block types (poly-block type). Reference: tesserocr/tesserocr.pyx:210-277.

    Mapped from the DOM tag owning the block region.
    """

    UNKNOWN = 0
    FLOWING_TEXT = 1      # p / div / main / article body text
    HEADING_TEXT = 2      # h1-h6
    PULLOUT_TEXT = 3      # blockquote / aside content kept as content
    EQUATION = 4
    INLINE_EQUATION = 5
    TABLE = 6             # table
    VERTICAL_TEXT = 7
    CAPTION_TEXT = 8      # figcaption / caption
    FLOWING_IMAGE = 9     # img inside flowing content
    HEADING_IMAGE = 10
    PULLOUT_IMAGE = 11
    HORZ_LINE = 12        # hr
    VERT_LINE = 13
    NOISE = 14            # stripped boilerplate (nav/header/footer/high link density)
    COUNT = 15

    TEXT_TYPES = frozenset({1, 2, 3, 4, 5, 6, 7, 8})
    IMAGE_TYPES = frozenset({9, 10, 11})
    LINE_TYPES = frozenset({12, 13})


class Orientation:
    """Reference: tesserocr/tesserocr.pyx:280-286."""

    PAGE_UP = 0
    PAGE_RIGHT = 1
    PAGE_DOWN = 2
    PAGE_LEFT = 3


class WritingDirection:
    """Reference: tesserocr/tesserocr.pyx:289-294."""

    LEFT_TO_RIGHT = 0
    RIGHT_TO_LEFT = 1
    TOP_TO_BOTTOM = 2


class TextlineOrder:
    """Reference: tesserocr/tesserocr.pyx:297-302."""

    LEFT_TO_RIGHT = 0
    RIGHT_TO_LEFT = 1
    TOP_TO_BOTTOM = 2


class Justification:
    """Reference: tesserocr/tesserocr.pyx:305-311."""

    UNKNOWN = 0
    LEFT = 1
    CENTER = 2
    RIGHT = 3


class DIR:
    """Unicode strong directionality codes. Reference: tesserocr/tesserocr.pyx:314-332."""

    NEUTRAL = 0
    LEFT_TO_RIGHT = 1
    RIGHT_TO_LEFT = 2
    MIX = 3


class LeptLogLevel:
    """Leptonica log severity (reference tesserocr/tesserocr.pyx:335-352).
    Values mirror Leptonica's L_SEVERITY_* ordering; the graft maps them to
    the engine's own log backend (log4j via ``set_leptonica_log_level``)."""

    EXTERNAL = 0  # severity from the environment
    ALL = 1
    DEBUG = 2
    INFO = 3
    WARNING = 4
    ERROR = 5
    NONE = 6


#: DOM tags that open a new block region during segmentation.
BLOCK_TAGS = frozenset(
    "p div main article section h1 h2 h3 h4 h5 h6 li ul ol table tr figure "
    "figcaption blockquote pre nav header footer aside form body td th dl dt dd "
    "hr img caption".split()
)

#: Ancestor tags whose entire subtree is boilerplate in PSM.AUTO.
BOILERPLATE_TAGS = frozenset(
    "nav header footer aside script style noscript template head title".split()
)

#: tag -> PT code for content blocks.
TAG_TO_PT = {
    "h1": PT.HEADING_TEXT, "h2": PT.HEADING_TEXT, "h3": PT.HEADING_TEXT,
    "h4": PT.HEADING_TEXT, "h5": PT.HEADING_TEXT, "h6": PT.HEADING_TEXT,
    "table": PT.TABLE, "tr": PT.TABLE, "td": PT.TABLE, "th": PT.TABLE,
    "caption": PT.CAPTION_TEXT,
    "figcaption": PT.CAPTION_TEXT,
    "blockquote": PT.PULLOUT_TEXT,
    "aside": PT.PULLOUT_TEXT,
    "img": PT.FLOWING_IMAGE,
    "hr": PT.HORZ_LINE,
}
