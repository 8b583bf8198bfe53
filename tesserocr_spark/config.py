"""Extractor configuration — the Init/SetVariable surface of the reference.

The reference configures a stateful engine via ``Init(path, lang, oem,
configs, variables)`` (tesserocr/tesserocr.pyx:1479-1570), a string-keyed
variable store ``SetVariable`` (tesserocr/tesserocr.pyx:1365-1387) with typed
getters (:1413-1477), config files in ``name value`` line format
(``ReadConfigFile`` :1645-1654, fixture tests/box.train), and a PSM selector
(``SetPageSegMode`` :1656-1664).

Here the whole surface collapses to an immutable dataclass that is closed
over by the vectorized extraction UDF (broadcast implicitly via the task
closure — it is tiny). Variables are validated against a whitelist, the
Spark analogue of Tesseract rejecting unknown parameter names.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

from .constants import OEM, PSM

#: Recognized variables, with type and default — the SetVariable whitelist.
#: Names follow the reference's tessedit_* convention where an analogue
#: exists (e.g. tessedit_char_blacklist, tesserocr/tesserocr.pyx:1378).
VARIABLE_DEFAULTS: dict[str, str] = {
    # characters removed from recognized words (reference :1378-1380)
    "tessedit_char_blacklist": "",
    # characters words may consist of; empty = all
    "tessedit_char_whitelist": "",
    # renderer toggles (reference _get_renderer, tesserocr.pyx:2186-2251)
    "tessedit_create_txt": "1",
    "tessedit_create_tsv": "0",
    "tessedit_create_hocr": "0",
    "tessedit_create_alto": "0",
    "tessedit_create_pdf": "0",
    "tessedit_create_boxfile": "0",
    "tessedit_write_unlv": "0",
    # hOCR font detail (reference _get_renderer, tesserocr.pyx:2206-2208)
    "hocr_font_info": "0",
    # PDF text-only mode (reference :2216-2218); image underlay not carried
    "textonly_pdf": "1",
    # separators of the GetUTF8Text fold (reference :862-870)
    "page_separator": "",
    "line_separator": "\n",
    "paragraph_separator": "\n",
    # boilerplate scoring knobs (the graft's segmentation parameters)
    "max_link_density": "0.5",
    "min_text_chars": "1",
    # emit SYMBOL-level spans (heavy; off for corpus-scale jobs)
    "emit_symbols": "1",
    # per-document char budget — DOM safety cap for pathological pages
    "max_html_bytes": "16777216",
    # source resolution in PPI (SetSourceResolution, tesserocr.pyx:1827-1833)
    "source_resolution": "70",
    # OSD orientation margin (set_min_orientation_margin, tesserocr.pyx:
    # 2648-2654; Tesseract default 7.0) — recorded config state; the HTML
    # char grid is always upright so it never changes an OSD result here
    "min_orientation_margin": "7.0",
    # SetBoundingBoxComponents flags (tesserocr.pyx:570-583) — documented
    # no-op for char-grid geometry (no above/below-body diacritics), but
    # carried through the immutable-config idiom like every other setter
    "bbox_include_upper_dots": "1",
    "bbox_include_lower_dots": "1",
    # training-format knobs carried for config-file parity (tests/box.train)
    "file_type": "",
    "edges_childarea": "0.5",
}

_BOOL_TRUE = {"1", "true", "t", "yes", "y"}


def read_config_file(path: str) -> dict[str, str]:
    """Parse a ``name value`` per-line config file.

    Format per the reference fixture tests/box.train (ReadConfigFile,
    tesserocr/tesserocr.pyx:1645-1654): whitespace-separated name/value,
    blank lines and ``#`` comments ignored, later lines win.
    """
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(None, 1)
            name = parts[0]
            value = parts[1].strip() if len(parts) > 1 else ""
            out[name] = value
    return out


@dataclass(frozen=True)
class ExtractorConfig:
    """Immutable engine configuration (Init + variable store).

    ``configs`` files load first, explicit ``variables`` override them —
    the precedence the reference tests in tests/test_api.py:75-91.
    """

    lang: str = "eng"
    psm: int = PSM.AUTO
    oem: int = OEM.DEFAULT
    variables: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        unknown = set(self.variables) - set(VARIABLE_DEFAULTS)
        if unknown:
            raise ValueError(f"unknown variables: {sorted(unknown)}")
        if not (0 <= self.psm < PSM.COUNT):
            raise ValueError(f"invalid psm {self.psm}")

    @classmethod
    def create(
        cls,
        lang: str = "eng",
        psm: int = PSM.AUTO,
        oem: int = OEM.DEFAULT,
        configs: tuple[str, ...] = (),
        variables: dict[str, str] | None = None,
    ) -> "ExtractorConfig":
        """InitFull analogue (tesserocr/tesserocr.pyx:1479-1570)."""
        merged: dict[str, str] = {}
        for p in configs:
            merged.update(read_config_file(p))
        merged.update(variables or {})
        return cls(lang=lang, psm=psm, oem=oem, variables=merged)

    # -- typed getters (GetIntVariable etc., tesserocr.pyx:1413-1477) --

    def get_variable(self, name: str) -> str:
        if name not in VARIABLE_DEFAULTS:
            raise KeyError(name)
        return self.variables.get(name, VARIABLE_DEFAULTS[name])

    def get_int_variable(self, name: str) -> int:
        return int(self.get_variable(name))

    def get_double_variable(self, name: str) -> float:
        return float(self.get_variable(name))

    def get_bool_variable(self, name: str) -> bool:
        return self.get_variable(name).lower() in _BOOL_TRUE

    # GetStringVariable (tesserocr/tesserocr.pyx:1458-1467)
    get_string_variable = get_variable

    def with_variable(self, name: str, value: str) -> "ExtractorConfig":
        """SetVariable analogue — returns a new config (immutable)."""
        if name not in VARIABLE_DEFAULTS:
            raise ValueError(f"unknown variable: {name}")
        return dataclasses.replace(self, variables={**self.variables, name: str(value)})

    def with_debug_variable(self, name: str, value: str) -> "ExtractorConfig":
        """SetDebugVariable analogue (tesserocr/tesserocr.pyx:1389-1411) —
        the reference routes debug parameters through the same store as
        SetVariable; here it is the identical whitelist-checked update
        (unknown names raise, the engine's name-lookup-failed signal)."""
        return self.with_variable(name, value)

    def with_psm(self, psm: int) -> "ExtractorConfig":
        """SetPageSegMode analogue (tesserocr/tesserocr.pyx:1656-1664)."""
        return dataclasses.replace(self, psm=psm)


DEFAULT_CONFIG = ExtractorConfig()
