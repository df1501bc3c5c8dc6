"""DocX list-numbering engine: word/numbering.xml + word/styles.xml.

Behavioral parity with the reference numbering state machine
(dedoc/readers/docx_reader/numbering_extractor.py:12-359 — numFmt
formatting, start/lvlRestart/startOverride semantics, per-abstractNum
numeration counters, suff handling) and the style resolution it leans on
(styles_extractor.py — pStyle → basedOn chain → numPr). Implementation is
original: ElementTree over the OOXML parts, no BeautifulSoup.

The engine is per-document state held inside the extraction kernel's row
loop — documents are row-scoped, so the corpus-level parallelism axis is
untouched (SURVEY.md §7 risk 6).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

_PLACEHOLDER_RE = re.compile(r"%\d+")
_SUFFIX = {"nothing": "", "space": " ", "tab": "\t"}
_ROMAN = [(1000, "m"), (500, "d"), (100, "c"), (50, "l"), (10, "x"), (5, "v"), (1, "i")]


def format_number(num_fmt: str, shift: int) -> str:
    """String form of a list counter ``shift`` items past the start
    (reference NumberingFormatter.get_text:184-213 semantics, including its
    letter-repetition scheme for counters past 'z')."""
    if num_fmt == "decimal":
        return str(1 + shift)
    if num_fmt in ("lowerLetter", "upperLetter"):
        base = "a" if num_fmt == "lowerLetter" else "A"
        return chr(ord(base) + shift % 26) * (shift // 26 + 1)
    if num_fmt in ("russianLower", "russianUpper"):
        base = "а" if num_fmt == "russianLower" else "А"
        return chr(ord(base) + shift % 32) * (shift // 32 + 1)
    if num_fmt in ("lowerRoman", "upperRoman"):
        shift += 1  # roman numerals are 1-based
        out = []
        for number, letter in _ROMAN:
            cnt, shift = divmod(shift, number)
            out.append((letter.upper() if num_fmt == "upperRoman" else letter) * cnt)
        return "".join(out)
    return ""  # "none" and unknown formats


class LevelInfo:
    __slots__ = ("lvl_text", "num_fmt", "start", "lvl_restart", "restart", "suff", "style_id",
                 "ppr", "rpr")

    def __init__(self) -> None:
        self.ppr: Optional[ElementTree.Element] = None  # lvl paragraph props
        self.rpr: Optional[ElementTree.Element] = None  # lvl run props
        self.lvl_text = ""
        self.num_fmt = "none"
        self.start = 1
        self.lvl_restart = True
        self.restart: Optional[bool] = None
        self.suff = "\t"
        self.style_id: Optional[str] = None


def _lvl_val(lvl: ElementTree.Element, tag: str) -> Optional[str]:
    el = lvl.find(f"{W}{tag}")
    return el.get(f"{W}val") if el is not None else None


class _AbstractNum:
    """One w:abstractNum: {ilvl → LevelInfo} + whole-list restart flag."""

    def __init__(self, tree: ElementTree.Element) -> None:
        self.abstract_num_id = tree.get(f"{W}abstractNumId", "")
        style_link = tree.find(f"{W}numStyleLink")
        self.style_link = style_link.get(f"{W}val") if style_link is not None else None
        restart_attr = tree.get("{http://schemas.microsoft.com/office/word/2012/wordml}restartNumberingAfterBreak")
        self.restart = bool(int(restart_attr)) if restart_attr else False
        self.levels: Dict[str, LevelInfo] = {}

    def parse_levels(self, lvl_list: List[ElementTree.Element]) -> None:
        for lvl in lvl_list:
            ilvl = lvl.get(f"{W}ilvl", "0")
            info = self.levels.get(ilvl, LevelInfo())
            txt = _lvl_val(lvl, "lvlText")
            if txt:
                info.lvl_text = txt
            if lvl.find(f"{W}isLgl") is not None:
                info.num_fmt = "decimal"
            else:
                fmt = _lvl_val(lvl, "numFmt")
                if fmt:
                    info.num_fmt = fmt
            start = _lvl_val(lvl, "start")
            if start:
                info.start = int(start)
            lvl_restart = _lvl_val(lvl, "lvlRestart")
            if lvl_restart:
                info.lvl_restart = bool(int(lvl_restart))
            if info.restart is None:
                info.restart = self.restart
            suff = _lvl_val(lvl, "suff")
            if suff:
                info.suff = _SUFFIX.get(suff, "\t")
            style = _lvl_val(lvl, "pStyle")
            if style:
                info.style_id = style
            override = _lvl_val(lvl, "startOverride")
            if override:
                info.restart = True
                info.start = int(override)
            ppr = lvl.find(f"{W}pPr")
            if ppr is not None:
                info.ppr = ppr
            rpr = lvl.find(f"{W}rPr")
            if rpr is not None:
                info.rpr = rpr
            self.levels[ilvl] = info


class _Num(_AbstractNum):
    """One w:num: abstractNum resolved through numStyleLink + lvlOverride."""

    def __init__(
        self,
        num_id: str,
        abstract_trees: Dict[str, ElementTree.Element],
        num_trees: Dict[str, ElementTree.Element],
    ) -> None:
        self.num_id = num_id
        num_tree = num_trees[num_id]
        abs_el = num_tree.find(f"{W}abstractNumId")
        abs_id = abs_el.get(f"{W}val") if abs_el is not None else ""
        tree = abstract_trees.get(abs_id)
        if tree is None:
            raise KeyError(f"abstractNum {abs_id} missing")
        super().__init__(tree)
        seen = set()
        while self.style_link and self.style_link not in seen:  # numStyleLink indirection
            seen.add(self.style_link)
            for cand in abstract_trees.values():
                link = cand.find(f"{W}styleLink")
                if link is not None and link.get(f"{W}val") == self.style_link:
                    _AbstractNum.__init__(self, cand)
                    tree = cand
                    break
            else:
                break
        self.parse_levels(tree.findall(f"{W}lvl"))
        self.parse_levels(
            [o.find(f"{W}lvl") for o in num_tree.findall(f"{W}lvlOverride") if o.find(f"{W}lvl") is not None]
        )
        # a bare startOverride (no nested lvl) still restarts the level
        for o in num_tree.findall(f"{W}lvlOverride"):
            so = o.find(f"{W}startOverride")
            if so is not None and o.find(f"{W}lvl") is None:
                ilvl = o.get(f"{W}ilvl", "0")
                info = self.levels.get(ilvl, LevelInfo())
                info.restart = True
                info.start = int(so.get(f"{W}val", "1"))
                self.levels[ilvl] = info

    def level(self, ilvl: str) -> LevelInfo:
        return self.levels.get(ilvl, LevelInfo())


class NumberingEngine:
    """Per-document numbering state: feed paragraphs in document order via
    ``prefix(num_id, ilvl)`` → the rendered numbering text (with suffix) and
    the 1-based list depth (reference NumberingExtractor.parse semantics)."""

    def __init__(
        self,
        numbering_root: Optional[ElementTree.Element],
        nums: Optional[Dict[str, _Num]] = None,
    ) -> None:
        """``nums`` lets callers inject pre-parsed (immutable) numbering
        definitions — the per-document state below stays fresh. Used by the
        docx reader's parse cache: web corpora repeat identical
        numbering.xml parts across millions of generated documents."""
        if nums is not None:
            self.nums = nums
            numbering_root = None
        else:
            self.nums = {}
        if numbering_root is not None:
            abstract_trees = {
                t.get(f"{W}abstractNumId", ""): t for t in numbering_root.findall(f"{W}abstractNum")
            }
            num_trees = {t.get(f"{W}numId", ""): t for t in numbering_root.findall(f"{W}num")}
            for num_id in num_trees:
                try:
                    self.nums[num_id] = _Num(num_id, abstract_trees, num_trees)
                except (KeyError, ValueError):
                    continue
        # mutable counters, reference NumberingState
        self.counters: Dict[Tuple[str, str], int] = {}
        self.prev_ilvl: Dict[str, str] = {}
        self.prev_num_id: Dict[str, str] = {}
        self.prev_abstract: Optional[str] = None
        self.prev_num: Optional[str] = None

    def _advance(self, num: _Num, ilvl: str) -> None:
        abs_id = num.abstract_num_id
        info = num.level(ilvl)
        if (
            self.prev_abstract
            and self.prev_num
            and self.prev_abstract != abs_id
            and self.nums.get(self.prev_num) is not None
            and self.nums[self.prev_num].restart
        ):
            self.prev_ilvl.pop(self.prev_abstract, None)

        if abs_id in self.prev_ilvl:
            prev_ilvl = self.prev_ilvl[abs_id]
            restarted = False
            if info.restart:
                prev_num_id = self.prev_num_id.get(abs_id)
                if prev_num_id and prev_num_id != num.num_id:
                    self.counters[(abs_id, ilvl)] = info.start
                    restarted = True
            if not restarted:
                if (prev_ilvl < ilvl and info.lvl_restart) or (abs_id, ilvl) not in self.counters:
                    self.counters[(abs_id, ilvl)] = info.start
                else:
                    self.counters[(abs_id, ilvl)] += 1
        else:
            self.counters[(abs_id, ilvl)] = info.start

        self.prev_ilvl[abs_id] = ilvl
        self.prev_num_id[abs_id] = num.num_id
        self.prev_abstract = abs_id
        self.prev_num = num.num_id

    def _number_at(self, num: _Num, level: int) -> str:
        ilvl = str(level - 1)
        info = num.level(ilvl)
        if info.num_fmt == "bullet":
            return info.lvl_text
        key = (num.abstract_num_id, ilvl)
        if key not in self.counters:
            self.counters[key] = info.start
        return format_number(info.num_fmt, self.counters[key] - 1)

    def prefix(self, num_id: str, ilvl: str) -> Tuple[str, int]:
        """Render the numbering text for one list paragraph and advance the
        counters. Returns ("", 1) for unknown numIds."""
        num = self.nums.get(num_id)
        if num is None:
            return "", 1
        self._advance(num, ilvl)
        info = num.level(ilvl)
        text = info.lvl_text
        depth = int(ilvl) + 1 if ilvl.isdigit() else 1
        for ph in _PLACEHOLDER_RE.findall(text):
            level = int(ph[1:])
            depth = max(depth, 1)
            text = _PLACEHOLDER_RE.sub(self._number_at(num, level), text, count=1)
        return text + info.suff, depth

    def level_info(self, num_id: str, ilvl: str) -> Optional[LevelInfo]:
        """Resolved LevelInfo (for the lvl's pPr/rPr formatting) — no
        counter side effects."""
        num = self.nums.get(num_id)
        return num.level(ilvl) if num is not None else None

    def level_for_style(self, num_id: str, style_id: str) -> Optional[str]:
        """The ilvl whose lvl carries pStyle == style_id — how a style's
        numPr without an explicit ilvl binds to its level (reference
        numbering_extractor.py:56-66)."""
        num = self.nums.get(num_id)
        if num is None:
            return None
        for ilvl, info in num.levels.items():
            if info.style_id == style_id:
                return ilvl
        return None


class StylesDb:
    """word/styles.xml essentials: style name, basedOn chain, style numPr.

    Resolves the two things extraction needs (reference styles_extractor.py
    scope): heading depth from the style NAME ("heading 3") with the
    styleId regex as fallback, and list numbering attached via paragraph
    style rather than direct numPr."""

    _NAME_HEADING_RE = re.compile(r"heading\s*(\d+)", re.IGNORECASE)

    def __init__(self, styles_root: Optional[ElementTree.Element]) -> None:
        self.name: Dict[str, str] = {}
        self.based_on: Dict[str, Optional[str]] = {}
        self.num_pr: Dict[str, Tuple[str, str]] = {}  # styleId → (numId, ilvl)
        if styles_root is None:
            return
        for style in styles_root.findall(f"{W}style"):
            sid = style.get(f"{W}styleId")
            if not sid:
                continue
            name_el = style.find(f"{W}name")
            self.name[sid] = name_el.get(f"{W}val", "") if name_el is not None else ""
            based = style.find(f"{W}basedOn")
            self.based_on[sid] = based.get(f"{W}val") if based is not None else None
            ppr = style.find(f"{W}pPr")
            if ppr is not None:
                numpr = ppr.find(f"{W}numPr")
                if numpr is not None:
                    num_el = numpr.find(f"{W}numId")
                    ilvl_el = numpr.find(f"{W}ilvl")
                    if num_el is not None:
                        # ilvl may be absent in a style's numPr — the level
                        # is then the lvl whose pStyle names this style
                        # (reference numbering_extractor.py:56-66)
                        self.num_pr[sid] = (
                            num_el.get(f"{W}val", ""),
                            ilvl_el.get(f"{W}val", "0") if ilvl_el is not None else None,
                        )

    def heading_depth(self, style_id: str) -> Optional[int]:
        """Reference styles_extractor.__get_heading_level: "title" → 1,
        "heading N" → N + 1 (Title reserves level 1)."""
        name = self.name.get(style_id, "") or style_id
        if name.lower().strip() == "title":
            return 1
        m = self._NAME_HEADING_RE.match(name)
        if m:
            return int(m.group(1)) + 1
        m = self._NAME_HEADING_RE.match(style_id)
        return int(m.group(1)) + 1 if m else None

    def numbering_of(self, style_id: str) -> Optional[Tuple[str, str]]:
        """numPr resolved through the basedOn chain (nearest wins)."""
        seen = set()
        sid: Optional[str] = style_id
        while sid and sid not in seen:
            seen.add(sid)
            if sid in self.num_pr:
                return self.num_pr[sid]
            sid = self.based_on.get(sid)
        return None
