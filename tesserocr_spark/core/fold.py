"""The GetUTF8Text fold and renderer-format serializers, defined ONCE.

The reference folds its span tree into one UTF-8 string
(GetUTF8Text, tesserocr/tesserocr.pyx:2379-2390) with the whitespace law
frozen in extractor.py's module docstring, and renders results to
txt/TSV/hOCR/box/UNLV sinks (tesserocr/tesserocr.pyx:2186-2251, 2411-2473).

``fold_spans`` reconstructs the document text purely from WORD-level span
rows — the cross-path equivalence oracle (tests/test_api.py:104-117 pattern):
``fold_spans(spans) == ExtractedDoc.text`` must hold for every document.

All serializers accept Span tuples (or dict/Row via ``as_span``) and are
row-local, so the Spark side applies them either as native expressions or
inside one vectorized UDF pass.
"""

from __future__ import annotations

from html import escape

from ..constants import RIL
from .extractor import Span, as_span


def _spans(spans) -> list[Span]:
    return [s if isinstance(s, Span) else as_span(s) for s in spans]


def fold_spans(spans) -> str:
    """Rebuild GetUTF8Text output from span rows (any level mix; uses WORD).

    Law: within a line, words joined by ``blanks`` spaces; lines joined by
    ``"\\n"``; each paragraph terminated by ``"\\n"``; paragraphs separated by
    an additional ``"\\n"`` (blank line).
    """
    words = [s for s in _spans(spans) if s.level == RIL.WORD and s.text is not None]
    words.sort(key=lambda s: (s.block_id, s.para_id, s.line_id, s.word_id))
    paras: list[str] = []
    cur_para: list[str] = []  # lines of current paragraph
    cur_line: list[str] = []
    prev = None
    for s in words:
        pkey = (s.block_id, s.para_id)
        lkey = (s.block_id, s.para_id, s.line_id)
        if prev is not None:
            if pkey != prev[0]:
                cur_para.append("".join(cur_line))
                paras.append("\n".join(cur_para) + "\n")
                cur_para, cur_line = [], []
            elif lkey != prev[1]:
                cur_para.append("".join(cur_line))
                cur_line = []
        cur_line.append(" " * s.blanks + s.text)
        prev = (pkey, lkey)
    if cur_line:
        cur_para.append("".join(cur_line))
    if cur_para:
        paras.append("\n".join(cur_para) + "\n")
    return "\n".join(paras)


def tsv_rows(url: str, spans) -> list[str]:
    """GetTSVText analogue (tesserocr/tesserocr.pyx:2427-2441): one TSV line
    per hierarchy node — level, page, block, para, line, word nums, bbox
    (left, top, width, height in char-grid units), conf, text."""
    out = []
    for s in sorted(
        _spans(spans),
        key=lambda s: (s.block_id, s.para_id, s.line_id, s.word_id, s.symbol_id, s.level),
    ):
        if s.level == RIL.SYMBOL:
            continue  # reference TSV stops at word granularity
        x0, y0, x1, y1 = s.bbox
        text = s.text if s.level >= RIL.WORD and s.text is not None else ""
        out.append(
            f"{s.level + 1}\t1\t{s.block_id + 1}\t{s.para_id + 1}\t"
            f"{s.line_id + 1}\t{s.word_id + 1}\t{x0}\t{y0}\t"
            f"{x1 - x0}\t{y1 - y0}\t"
            f"{s.conf:.2f}\t{text.replace(chr(9), ' ').replace(chr(10), ' ')}"
        )
    return out


def hocr_text(url: str, spans) -> str:
    """GetHOCRText analogue (tesserocr/tesserocr.pyx:2411-2425): minimal hOCR
    markup of the span hierarchy with char-grid bboxes."""
    sp = _spans(spans)

    def bbox_attr(s: Span) -> str:
        x0, y0, x1, y1 = s.bbox
        return f"bbox {x0} {y0} {x1} {y1}"

    parts = [f'<div class="ocr_page" id="page_1" title="image {escape(url)}">']
    for blk in sorted((s for s in sp if s.level == RIL.BLOCK), key=lambda s: s.block_id):
        parts.append(
            f'<div class="ocr_carea" id="block_1_{blk.block_id + 1}"'
            f' title="{bbox_attr(blk)}">'
        )
        for p in sorted((s for s in sp if s.level == RIL.PARA
                         and s.block_id == blk.block_id), key=lambda s: s.para_id):
            parts.append(f'<p class="ocr_par" title="{bbox_attr(p)}">')
            for ln in sorted((s for s in sp if s.level == RIL.TEXTLINE
                              and s.block_id == p.block_id and s.para_id == p.para_id),
                             key=lambda s: s.line_id):
                parts.append(f'<span class="ocr_line" title="{bbox_attr(ln)}">')
                for w in sorted((s for s in sp if s.level == RIL.WORD
                                 and s.block_id == ln.block_id
                                 and s.para_id == ln.para_id
                                 and s.line_id == ln.line_id),
                                key=lambda s: s.word_id):
                    t = escape(w.text) if w.text is not None else ""
                    parts.append(
                        f'<span class="ocrx_word" title="{bbox_attr(w)};'
                        f' x_wconf {int(w.conf)}">{t}</span>'
                    )
                parts.append("</span>")
            parts.append("</p>")
        parts.append("</div>")
    parts.append("</div>")
    return "\n".join(parts)


def box_rows(spans) -> list[str]:
    """GetBoxText analogue (tesserocr/tesserocr.pyx:2443-2460): one line per
    SYMBOL — ``char left bottom right top page`` in char-grid coords."""
    out = []
    for s in sorted(
        (s for s in _spans(spans) if s.level == RIL.SYMBOL and s.text),
        key=lambda s: (s.block_id, s.para_id, s.line_id, s.word_id, s.symbol_id),
    ):
        x0, y0, x1, y1 = s.bbox
        out.append(f"{s.text} {x0} {y0} {x1} {y1} 0")
    return out


def unlv_text(spans) -> str:
    """GetUNLVText analogue (tesserocr/tesserocr.pyx:2462-2473): the fold with
    suspect markers (``^``) before low-confidence words (conf < 88)."""
    marked = []
    for s in _spans(spans):
        if s.level == RIL.WORD and s.text is not None and s.conf < 88.0:
            s = s._replace(text="^" + s.text)
        marked.append(s)
    return fold_spans(marked)
