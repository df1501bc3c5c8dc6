"""DOCX style/property resolution — the reference's full hierarchy.

Mirrors dedoc/readers/docx_reader/properties_extractor.py +
styles_extractor.py + data_structures/{base_props,run,paragraph}.py:
properties resolve docDefaults → default paragraph style → pStyle basedOn
chain (root-first, pPr then rPr per level) → paragraph direct pPr →
character style chain (runs with rStyle) → run direct rPr. Values keep
the reference's string forms exactly (indentation "720.0" but default
"0"; size is half-points halved → "14.0"; spacing ints).

Property searches are DESCENDANT-first like the reference's bs4
``tree.sz`` lookups — a pPr's nested rPr>sz intentionally feeds the
paragraph size, and docDefaults' rPrDefault>rPr>sz feeds the default.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

_HEADING_NAME_RE = re.compile(r"heading\s*(\d+)", re.IGNORECASE)


def _find(el: ElementTree.Element, tag: str) -> Optional[ElementTree.Element]:
    """First descendant (any depth) — bs4 ``tree.<tag>`` semantics."""
    for sub in el.iter(f"{W}{tag}"):
        if sub is not el:
            return sub
    return None


def _to_float(value) -> float:
    s = str(value)
    return float(s[:-2]) if s.endswith("pt") else float(s)


def _truthy(value: Optional[str]) -> bool:
    return value in (None, "1", "true", "True")


class Props:
    """BaseProperties analogue (base_props.py): style state carried from
    paragraph to runs."""

    __slots__ = ("jc", "indentation", "size", "bold", "italic", "underlined",
                 "strike", "superscript", "subscript", "caps",
                 "spacing_before", "spacing_after", "style_name", "style_level")

    def __init__(self, other: Optional["Props"] = None) -> None:
        self.jc = other.jc if other else "left"
        self.indentation = other.indentation if other and other.indentation else 0
        self.size = other.size if other else 0
        self.bold = other.bold if other else False
        self.italic = other.italic if other else False
        self.underlined = other.underlined if other else False
        self.strike = other.strike if other else False
        self.superscript = other.superscript if other else False
        self.subscript = other.subscript if other else False
        self.caps = other.caps if other else False
        self.spacing_before = 0
        self.spacing_after = 0
        self.style_name: Optional[str] = None
        self.style_level: Optional[int] = None


def change_paragraph_properties(p: Props, tree: ElementTree.Element) -> None:
    _change_indent(p, tree)
    _change_size(p, tree)
    _change_jc(p, tree)
    _change_spacing(p, tree)


def change_run_properties(p: Props, tree: ElementTree.Element) -> None:
    _change_size(p, tree)
    _change_caps(p, tree)
    b = _find(tree, "b")
    if b is not None:
        p.bold = _truthy(b.get(f"{W}val"))
    i = _find(tree, "i")
    if i is not None:
        p.italic = _truthy(i.get(f"{W}val"))
    u = _find(tree, "u")
    if u is not None:
        val = u.get(f"{W}val")
        if val == "none":
            p.underlined = False
        elif isinstance(val, str):
            p.underlined = True
    strike = _find(tree, "strike")
    if strike is not None:
        p.strike = _truthy(strike.get(f"{W}val"))
    va = _find(tree, "vertAlign")
    if va is not None:
        val = va.get(f"{W}val")
        if val == "superscript":
            p.superscript = True
        elif val == "subscript":
            p.subscript = True


def _change_indent(p: Props, tree: ElementTree.Element) -> None:
    ind = _find(tree, "ind")
    if ind is None:
        return
    a = {k: _to_float(ind.get(f"{W}{k}", 0)) for k in
         ("firstLine", "firstLineChars", "hanging", "hangingChars",
          "start", "startChars", "left")}
    indentation = 0  # int stays int when nothing applies → str() gives "0"
    if a["left"] != 0:
        indentation = a["left"]
    elif a["start"] != 0:
        indentation = a["start"]
    elif a["startChars"] != 0:
        indentation = a["startChars"] / 1.2
    if a["firstLine"] != 0 and a["hanging"] == 0:
        indentation += a["firstLine"]
    if a["firstLineChars"] != 0 and a["hangingChars"] == 0:
        indentation += a["firstLineChars"] / 1.2
    if a["hanging"] != 0:
        indentation -= a["hanging"]
    elif a["hangingChars"] != 0:
        indentation -= a["hangingChars"] / 1.2
    p.indentation = indentation


def _change_size(p: Props, tree: ElementTree.Element) -> None:
    sz = _find(tree, "sz")
    if sz is not None:
        p.size = int(_to_float(sz.get(f"{W}val", p.size)))


def _change_jc(p: Props, tree: ElementTree.Element) -> None:
    jc = _find(tree, "jc")
    if jc is None:
        return
    bidi = _find(tree, "bidi")
    rtl = _truthy(bidi.get(f"{W}val")) if bidi is not None else False
    val = jc.get(f"{W}val", p.jc)
    if val in ("both", "center", "right"):
        p.jc = val
    elif val == "end" and not rtl:
        p.jc = "right"
    elif val == "start" and rtl:
        p.jc = "right"


def _change_caps(p: Props, tree: ElementTree.Element) -> None:
    caps = _find(tree, "caps")
    if caps is not None:
        p.caps = _truthy(caps.get(f"{W}val"))


def _change_spacing(p: Props, tree: ElementTree.Element) -> None:
    sp = _find(tree, "spacing")
    if sp is None:
        return
    before = after = 0
    if not _truthy_attr(sp, "beforeAutospacing"):
        lines = sp.get(f"{W}beforeLines")
        if lines:
            before = int(_to_float(lines))
        else:
            raw = sp.get(f"{W}before")
            before = int(_to_float(raw)) if raw else 0
    if not _truthy_attr(sp, "afterAutospacing"):
        lines = sp.get(f"{W}afterLines")
        if lines:
            after = int(_to_float(lines))
        else:
            raw = sp.get(f"{W}after")
            after = int(_to_float(raw)) if raw else 0
    p.spacing_before = before
    p.spacing_after = after


def _truthy_attr(el: ElementTree.Element, name: str) -> bool:
    val = el.get(f"{W}{name}")
    return val is not None and val in ("1", "true", "True")


class StyleResolver:
    """styles_extractor.py analogue over word/styles.xml: docDefaults,
    the default paragraph style, and basedOn chains per (styleId, type)."""

    def __init__(self, styles_root: Optional[ElementTree.Element]) -> None:
        self.doc_defaults: Optional[ElementTree.Element] = None
        self.default_style: Optional[ElementTree.Element] = None
        self._styles: Dict[Tuple[str, str], ElementTree.Element] = {}
        if styles_root is None:
            return
        self.doc_defaults = styles_root.find(f"{W}docDefaults")
        for style in styles_root.findall(f"{W}style"):
            sid = style.get(f"{W}styleId")
            stype = style.get(f"{W}type", "paragraph")
            if sid:
                self._styles[(sid, stype)] = style
            if style.get(f"{W}default") in ("1", "true") and stype == "paragraph" \
                    and self.default_style is None:
                self.default_style = style

    def style_name(self, style: ElementTree.Element, style_id: str) -> str:
        name = style.find(f"{W}name")
        return name.get(f"{W}val", style_id) if name is not None else style_id

    def chain(self, style_id: str, style_type: str) -> List[ElementTree.Element]:
        """basedOn hierarchy, root-first (styles_extractor.__get_styles_hierarchy)."""
        style = self._styles.get((style_id, style_type))
        if style is None:
            return []
        chain = [style]
        seen = {style_id}
        cur = style
        while True:
            based = cur.find(f"{W}basedOn")
            if based is None:
                break
            pid = based.get(f"{W}val")
            if not pid or pid in seen:
                break
            seen.add(pid)
            cur = self._styles.get((pid, style_type))
            if cur is None:
                break
            chain.append(cur)
        return chain[::-1]

    def parse(self, style_id: Optional[str], props: Props, style_type: str,
              is_paragraph: bool = False) -> None:
        """styles_extractor.parse: defaults, then the style's basedOn chain
        (pPr then rPr per level)."""
        if self.doc_defaults is not None:
            change_paragraph_properties(props, self.doc_defaults)
        if self.default_style is not None:
            change_paragraph_properties(props, self.default_style)
        if not style_id:
            return
        style = self._styles.get((style_id, style_type))
        if style is None:
            return
        if is_paragraph:
            props.style_name = self.style_name(style, style_id)
            m = _HEADING_NAME_RE.search(props.style_name)
            props.style_level = int(m.group(1)) if m else None
        for cur in self.chain(style_id, style_type):
            ppr = cur.find(f"{W}pPr")
            if ppr is not None:
                change_paragraph_properties(props, ppr)
            rpr = cur.find(f"{W}rPr")
            if rpr is not None:
                change_run_properties(props, rpr)


_NAME2CHAR = {"tab": "\t", "br": "\n", "cr": "\r"}


def run_text(run_el: ElementTree.Element) -> str:
    """Run text with tab/br/cr chars and w:sym (run.py get_text)."""
    parts: List[str] = []
    for el in run_el.iter():
        tag = el.tag.rsplit("}", 1)[-1]
        if tag in _NAME2CHAR:
            parts.append(_NAME2CHAR[tag])
        elif tag == "t" and el.text:
            parts.append(el.text)
        elif tag == "sym":
            char = el.get(f"{W}char")
            if char:
                try:
                    parts.append(chr(int(char, 16)))
                except ValueError:
                    pass
    return "".join(parts)
