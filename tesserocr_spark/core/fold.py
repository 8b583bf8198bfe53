"""The GetUTF8Text fold and renderer-format serializers, defined ONCE.

The reference folds its span tree into one UTF-8 string
(GetUTF8Text, tesserocr/tesserocr.pyx:2379-2390) with the whitespace law
frozen in extractor.py's module docstring, and renders results to
txt/TSV/hOCR/box/UNLV sinks (tesserocr/tesserocr.pyx:2186-2251, 2411-2473).

``fold_spans`` reconstructs the document text purely from WORD-level span
rows — the cross-path equivalence oracle (tests/test_api.py:104-117 pattern):
``fold_spans(spans) == ExtractedDoc.text`` must hold for every document.

The per-span serializers here are row-local (no cross-row state), so the
Spark side can apply them either via native ``format_string`` expressions or
inside the same vectorized UDF pass.
"""

from __future__ import annotations

from html import escape

from ..constants import RIL


def fold_spans(spans: list[dict]) -> str:
    """Rebuild GetUTF8Text output from span rows (any level mix; uses WORD).

    Law: within a line, words joined by ``blanks`` spaces; lines joined by
    ``"\\n"``; each paragraph terminated by ``"\\n"``; paragraphs separated by
    an additional ``"\\n"`` (blank line).
    """
    words = [s for s in spans if s["level"] == RIL.WORD and s["text"] is not None]
    words.sort(key=lambda s: (s["block_id"], s["para_id"], s["line_id"], s["word_id"]))
    paras: list[str] = []
    cur_para: list[str] = []  # lines of current paragraph
    cur_line: list[str] = []
    prev = None
    for s in words:
        pkey = (s["block_id"], s["para_id"])
        lkey = (s["block_id"], s["para_id"], s["line_id"])
        if prev is not None:
            if pkey != prev[0]:
                cur_para.append("".join(cur_line))
                paras.append("\n".join(cur_para) + "\n")
                cur_para, cur_line = [], []
            elif lkey != prev[1]:
                cur_para.append("".join(cur_line))
                cur_line = []
        cur_line.append(" " * s["blanks"] + s["text"])
        prev = (pkey, lkey)
    if cur_line:
        cur_para.append("".join(cur_line))
    if cur_para:
        paras.append("\n".join(cur_para) + "\n")
    return "\n".join(paras)


def tsv_rows(url: str, spans: list[dict]) -> list[str]:
    """GetTSVText analogue (tesserocr/tesserocr.pyx:2427-2441): one TSV line
    per hierarchy node — level, page, block, para, line, word nums, bbox
    (left, top, width, height in char-grid units), conf, text."""
    out = []
    for s in sorted(
        spans,
        key=lambda s: (s["block_id"], s["para_id"], s["line_id"],
                       s["word_id"], s["symbol_id"], s["level"]),
    ):
        if s["level"] == RIL.SYMBOL:
            continue  # reference TSV stops at word granularity
        b = s["bbox"]
        text = s["text"] if s["level"] >= RIL.WORD and s["text"] is not None else ""
        out.append(
            f"{s['level'] + 1}\t1\t{s['block_id'] + 1}\t{s['para_id'] + 1}\t"
            f"{s['line_id'] + 1}\t{s['word_id'] + 1}\t{b['x0']}\t{b['y0']}\t"
            f"{b['x1'] - b['x0']}\t{b['y1'] - b['y0']}\t"
            f"{s['conf']:.2f}\t{text.replace(chr(9), ' ').replace(chr(10), ' ')}"
        )
    return out


def hocr_text(url: str, spans: list[dict]) -> str:
    """GetHOCRText analogue (tesserocr/tesserocr.pyx:2411-2425): minimal hOCR
    markup of the span hierarchy with char-grid bboxes."""
    by_level: dict[tuple, list[dict]] = {}
    for s in spans:
        by_level.setdefault(
            (s["level"], s["block_id"], s["para_id"], s["line_id"]), []
        ).append(s)

    def bbox_attr(s: dict) -> str:
        b = s["bbox"]
        return f"bbox {b['x0']} {b['y0']} {b['x1']} {b['y1']}"

    parts = [f'<div class="ocr_page" id="page_1" title="image {escape(url)}">']
    blocks = sorted((s for s in spans if s["level"] == RIL.BLOCK),
                    key=lambda s: s["block_id"])
    for blk in blocks:
        parts.append(
            f'<div class="ocr_carea" id="block_1_{blk["block_id"] + 1}"'
            f' title="{bbox_attr(blk)}">'
        )
        paras = sorted((s for s in spans
                        if s["level"] == RIL.PARA and s["block_id"] == blk["block_id"]),
                       key=lambda s: s["para_id"])
        for p in paras:
            parts.append(f'<p class="ocr_par" title="{bbox_attr(p)}">')
            lines = sorted((s for s in spans if s["level"] == RIL.TEXTLINE
                            and s["block_id"] == p["block_id"]
                            and s["para_id"] == p["para_id"]),
                           key=lambda s: s["line_id"])
            for ln in lines:
                parts.append(f'<span class="ocr_line" title="{bbox_attr(ln)}">')
                ws = sorted((s for s in spans if s["level"] == RIL.WORD
                             and s["block_id"] == ln["block_id"]
                             and s["para_id"] == ln["para_id"]
                             and s["line_id"] == ln["line_id"]),
                            key=lambda s: s["word_id"])
                for w in ws:
                    t = escape(w["text"]) if w["text"] is not None else ""
                    parts.append(
                        f'<span class="ocrx_word" title="{bbox_attr(w)};'
                        f' x_wconf {int(w["conf"])}">{t}</span>'
                    )
                parts.append("</span>")
            parts.append("</p>")
        parts.append("</div>")
    parts.append("</div>")
    return "\n".join(parts)


def box_rows(spans: list[dict]) -> list[str]:
    """GetBoxText analogue (tesserocr/tesserocr.pyx:2443-2460): one line per
    SYMBOL — ``char left bottom right top page`` in char-grid coords."""
    out = []
    for s in sorted(
        (s for s in spans if s["level"] == RIL.SYMBOL and s["text"]),
        key=lambda s: (s["block_id"], s["para_id"], s["line_id"],
                       s["word_id"], s["symbol_id"]),
    ):
        b = s["bbox"]
        out.append(f"{s['text']} {b['x0']} {b['y0']} {b['x1']} {b['y1']} 0")
    return out


def unlv_text(spans: list[dict]) -> str:
    """GetUNLVText analogue (tesserocr/tesserocr.pyx:2462-2473): the fold with
    suspect markers (``^``) before low-confidence words (conf < 88)."""
    marked = []
    for s in spans:
        if s["level"] == RIL.WORD and s["text"] is not None and s["conf"] < 88.0:
            s = dict(s)
            s["text"] = "^" + s["text"]
        marked.append(s)
    return fold_spans(marked)
