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
from .extractor import (FLAG_BOLD, FLAG_ITALIC, FLAG_MONO, Span, as_span)


def _spans(spans) -> list[Span]:
    return [s if isinstance(s, Span) else as_span(s) for s in spans]


def fold_spans(spans, line_sep: str = "\n", para_sep: str = "\n") -> str:
    """Rebuild GetUTF8Text output from span rows (any level mix; uses WORD).

    Law: within a line, words joined by ``blanks`` spaces; every line
    terminated by ``line_sep``; ``para_sep`` inserted AT THE END OF EACH
    paragraph — the reference's documented semantics (SetLineSeparator /
    SetParagraphSeparator, tesserocr/tesserocr.pyx:862-870: "inserted at the
    end of each paragraph"), so non-default separators also terminate the
    final paragraph.

    Exception: at the exact ("\\n", "\\n") defaults the frozen byte-identity
    law (extractor.py docstring, oracle-locked since r01) normalizes away
    the single trailing paragraph separator — the document ends with one
    newline, paragraphs are blank-line separated.
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
                paras.append(line_sep.join(cur_para) + line_sep)
                cur_para, cur_line = [], []
            elif lkey != prev[1]:
                cur_para.append("".join(cur_line))
                cur_line = []
        cur_line.append(" " * s.blanks + s.text)
        prev = (pkey, lkey)
    if cur_line:
        cur_para.append("".join(cur_line))
    if cur_para:
        paras.append(line_sep.join(cur_para) + line_sep)
    if (line_sep, para_sep) == ("\n", "\n"):
        # frozen default law: trailing para_sep normalized away
        return para_sep.join(paras)
    return "".join(p + para_sep for p in paras)


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


def _hocr_font(flags: int) -> str:
    names = [n for f, n in ((FLAG_MONO, "mono"), (FLAG_BOLD, "bold"),
                            (FLAG_ITALIC, "italic")) if flags & f]
    return "+".join(names) or "default"


def hocr_text(url: str, spans, font_info: bool = False) -> str:
    """GetHOCRText analogue (tesserocr/tesserocr.pyx:2411-2425): minimal hOCR
    markup of the span hierarchy with char-grid bboxes. ``font_info`` mirrors
    the ``hocr_font_info`` renderer flag (tesserocr/tesserocr.pyx:2206-2208):
    it appends ``x_font`` derived from the word's DOM style flags."""
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
                    font = f"; x_font {_hocr_font(w.flags)}" if font_info else ""
                    parts.append(
                        f'<span class="ocrx_word" title="{bbox_attr(w)};'
                        f' x_wconf {int(w.conf)}{font}">{t}</span>'
                    )
                parts.append("</span>")
            parts.append("</p>")
        parts.append("</div>")
    parts.append("</div>")
    return "\n".join(parts)


def alto_text(url: str, spans) -> str:
    """TessAltoRenderer analogue (tesserocr/tesserocr.pyx:2201-2203,
    tessedit_create_alto docstring :2260-2262): ALTO-XML of the span tree.

    Mapping mirrors Tesseract's ALTO emission: BLOCK → ComposedBlock,
    PARA → TextBlock, TEXTLINE → TextLine, WORD → String with
    ``WC`` = conf/100 (2 dp) and an ``<SP/>`` for each inter-word gap.
    Geometry is the char-grid bbox (HPOS/VPOS/WIDTH/HEIGHT)."""
    sp = _spans(spans)

    def geo(s: Span) -> str:
        x0, y0, x1, y1 = s.bbox
        return f'HPOS="{x0}" VPOS="{y0}" WIDTH="{x1 - x0}" HEIGHT="{y1 - y0}"'

    page_w = max((s.bbox[2] for s in sp), default=0)
    page_h = max((s.bbox[3] for s in sp), default=0)
    parts = [
        '<alto xmlns="http://www.loc.gov/standards/alto/ns-v3#">',
        "<Description><MeasurementUnit>pixel</MeasurementUnit>"
        f"<sourceImageInformation><fileName>{escape(url)}</fileName>"
        "</sourceImageInformation></Description>",
        "<Layout>",
        f'<Page WIDTH="{page_w}" HEIGHT="{page_h}" PHYSICAL_IMG_NR="0" ID="page_0">',
        f'<PrintSpace HPOS="0" VPOS="0" WIDTH="{page_w}" HEIGHT="{page_h}">',
    ]
    for blk in sorted((s for s in sp if s.level == RIL.BLOCK), key=lambda s: s.block_id):
        parts.append(f'<ComposedBlock ID="cblock_{blk.block_id}" {geo(blk)}>')
        for p in sorted((s for s in sp if s.level == RIL.PARA
                         and s.block_id == blk.block_id), key=lambda s: s.para_id):
            parts.append(f'<TextBlock ID="block_{blk.block_id}_{p.para_id}" {geo(p)}>')
            for ln in sorted((s for s in sp if s.level == RIL.TEXTLINE
                              and s.block_id == p.block_id and s.para_id == p.para_id),
                             key=lambda s: s.line_id):
                parts.append(f'<TextLine {geo(ln)}>')
                for w in sorted((s for s in sp if s.level == RIL.WORD
                                 and s.block_id == ln.block_id
                                 and s.para_id == ln.para_id
                                 and s.line_id == ln.line_id),
                                key=lambda s: s.word_id):
                    if w.blanks:
                        parts.append(f'<SP WIDTH="{w.blanks}"/>')
                    t = escape(w.text or "", quote=True)
                    parts.append(f'<String {geo(w)} WC="{w.conf / 100.0:.2f}"'
                                 f' CONTENT="{t}"/>')
                parts.append("</TextLine>")
            parts.append("</TextBlock>")
        parts.append("</ComposedBlock>")
    parts.extend(["</PrintSpace>", "</Page>", "</Layout>", "</alto>"])
    return "\n".join(parts)


def osd_text(osd) -> str:
    """TessOsdRenderer analogue (tesserocr/tesserocr.pyx:2196-2198, the
    PSM.OSD_ONLY short-circuit): the ``.osd`` text block emitted per page."""
    if osd is None:
        orient_deg, orient_conf, script, script_conf = 0, 0.0, "", 0.0
    elif isinstance(osd, dict):
        orient_deg = osd["orient_deg"]
        orient_conf = osd["orient_conf"]
        script = osd["script_name"]
        script_conf = osd["script_conf"]
    else:  # pyspark Row / namedtuple
        orient_deg, orient_conf, script, script_conf = (
            osd.orient_deg, osd.orient_conf, osd.script_name, osd.script_conf)
    return (
        "Page 0: 0\n"
        f"Orientation in degrees: {orient_deg}\n"
        f"Rotate: {(360 - orient_deg) % 360}\n"
        f"Orientation confidence: {orient_conf:.2f}\n"
        f"Script: {script}\n"
        f"Script confidence: {script_conf:.2f}\n"
    )


def _pdf_escape(line: str) -> str:
    # PDF literal strings: latin-1 payload with \ ( ) escaped.
    s = line.encode("latin-1", "replace").decode("latin-1")
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def pdf_bytes(url: str, extracted_text: str) -> bytes:
    """TessPDFRenderer analogue, text-only mode (tesserocr/tesserocr.pyx:
    2214-2224; ``textonly_pdf`` flag :2216-2218): a minimal deterministic
    one-page PDF carrying the extracted text as a Helvetica text stream.

    The image-underlay mode (textonly_pdf=0) embeds the rendered page image —
    that path needs an image codec and is stubbed (see sinks.pdf_sink)."""
    lines = (extracted_text or "").split("\n")
    ops = ["BT", "/F1 10 Tf", "12 TL", "1 0 0 1 36 756 Tm"]
    for line in lines:
        ops.append(f"({_pdf_escape(line)}) Tj T*")
    ops.append("ET")
    stream = "\n".join(ops).encode("latin-1")

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length " + str(len(stream)).encode() + b" >>\nstream\n" + stream
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(out)


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
