"""Domain structure extractors — the ``document_type`` knob.

The reference routes ``document_type`` to per-domain structure extractors
(structure_extractor_composition.py:24-34): law / tz / diploma use XGBoost
line-type classifiers (line_type_classifiers/*.py) layered over regex
feature extractors. The trained models can't ship here (HF hub download,
no network), so the ML layer is STUBBED and these compositions implement
the regex skeleton of each domain — the same pattern-composition mechanism
as the default extractor (default_structure_extractor.py:38-58), with
domain-specific line-type vocabularies:

- law  (classifying_law_structure_extractor.py:47-208 feature regexes):
  part/section/chapter/article headers, numbered clauses ("статья 5",
  "article 5", "chapter 2"), dotted items below.
- tz   (tz_structure_extractor.py): technical-specification sections
  ("техническое задание", "requirements", numbered sections).
- diploma (diploma_structure_extractor.py): chapter/введение/заключение/
  список литературы named parts.
"""

from __future__ import annotations

from typing import Callable, Dict, List

from dedoc_ray.structure.patterns import (
    BulletListPattern,
    DottedListPattern,
    Pattern,
    RegexpPattern,
    TagHeaderPattern,
    TagListPattern,
    TagPattern,
    default_patterns,
)


def law_patterns() -> List[Pattern]:
    """Reference law structure-unit taxonomy and flat depths
    (law_structure_unit.py:17-47: part < section < subsection < chapter <
    paragraph < article < articlePart < item < subitem, each at level_2=0;
    dotted numbers are articlePart, ``N)`` is item, ``а)`` is subitem)."""
    return [
        TagHeaderPattern(line_type="header", level_1=1, can_be_multiline=False),
        RegexpPattern(r"^(часть|part)\s+\d+", line_type="part", level_1=2, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^(раздел|section)\s+[ivxlcх\d]+", line_type="section", level_1=3, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^[ivxlcх]{1,5}\.?\s*$", line_type="subsection", level_1=4, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^(глава|chapter)\s+[ivxlcх\d]+", line_type="chapter", level_1=5, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^§\s*\d", line_type="paragraph", level_1=6, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^(статья|article)\s+\d+", line_type="article", level_1=7, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^\s*(\d*\.)*\d+[)}]", line_type="item", level_1=9, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^\s*(\d{1,3}\.)+", line_type="articlePart", level_1=8, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^\s*[а-яё]\)", line_type="subitem", level_1=10, level_2=0, can_be_multiline=False),
        BulletListPattern(line_type="subitem", level_1=10, level_2=1, can_be_multiline=False),
        TagPattern(line_type="raw_text"),
    ]


def tz_patterns() -> List[Pattern]:
    return [
        TagHeaderPattern(line_type="header", level_1=1, can_be_multiline=False),
        RegexpPattern(r"^(техническое задание|technical specification)", line_type="root", level_1=0, level_2=0, can_be_multiline=False),
        RegexpPattern(r"^(требования|requirements)\b", line_type="section", level_1=1, level_2=1, can_be_multiline=False),
        DottedListPattern(line_type="section", level_1=1, can_be_multiline=False),
        TagListPattern(line_type="item", level_1=2, default_level_2=1),
        TagPattern(line_type="raw_text"),
    ]


def diploma_patterns() -> List[Pattern]:
    return [
        TagHeaderPattern(line_type="header", level_1=1, can_be_multiline=False),
        RegexpPattern(r"^(введение|заключение|приложение|список литературы|abstract|introduction|conclusion|references|appendix)\b",
                      line_type="named_item", level_1=1, level_2=1, can_be_multiline=False),
        RegexpPattern(r"^(глава|chapter)\s+\d+", line_type="chapter", level_1=1, level_2=2, can_be_multiline=False),
        DottedListPattern(line_type="section", level_1=2, can_be_multiline=False),
        TagPattern(line_type="raw_text"),
    ]


def foiv_patterns() -> List[Pattern]:
    """FOIV (federal-executive-body) structure: dotted items + bracketed
    numeric/letter subitems — the reference FoivLawStructureExtractor's
    body regexes (foiv_law_structure_extractor.py:38-44,
    utils_reg.py regexps_foiv_item = ``^\\s*(\\d+\\.)+\\s*``)."""
    return [
        TagHeaderPattern(line_type="header", level_1=1, can_be_multiline=False),
        RegexpPattern(r"^(глава|chapter)\s+[ivxlc\d]+", line_type="chapter", level_1=1, level_2=1, can_be_multiline=False),
        DottedListPattern(line_type="item", level_1=2, can_be_multiline=False),
        RegexpPattern(r"^\d+\)\s", line_type="subitem", level_1=3, level_2=1, can_be_multiline=False),
        RegexpPattern(r"^[а-яa-z]\)\s", line_type="subitem", level_1=3, level_2=2, can_be_multiline=False),
        TagPattern(line_type="raw_text"),
    ]


# ------------------------------------------------- law "hat" classification
#
# The reference dynamically classifies a document_type="law" input into law
# vs foiv by scanning the document "hat" — the first lines — for doc-kind
# keywords (classifying_law_structure_extractor.py:47-208). Order matters;
# "закон" is deferred (the ЗАКОН…КОДЕКС hack) and order/state/instruction
# route to the foiv extractor.

_HAT_BATCH_SIZE = 3
_HAT_BATCH_COUNT = 7
FOIV_TYPES = frozenset({"order", "state", "instruction"})


def _ws_template(word: str, char_map: Dict[str, str] = None) -> str:
    parts = [(char_map or {}).get(ch, ch) for ch in word]
    return r"\s*".join(parts)


# (type name, keyword template); reference LawDocType.doc_types() priority
_HAT_TEMPLATES: List[tuple] = [
    ("definition", _ws_template("определение")),
    ("order", _ws_template("приказ", {"з": "[з3]"})),  # tesseract з→3 hotfix
    ("bylaw", _ws_template("распоряжение")),
    ("code", _ws_template("кодекс")),
    ("federal_law", _ws_template("федеральный закон")),
    ("edict", _ws_template("указ")),
    ("law", _ws_template("закон")),
    ("decree", _ws_template("постановление")),
    ("directive", _ws_template("директива")),
    ("constitution", _ws_template("конституция")),
    ("state", _ws_template("положение")),
    ("instruction", _ws_template("инструкция")),
]

_BAD_CHARS = {"й": "й", "й̆": "й", "Й": "Й", "Й̆": "Й"}


def classify_law_hat(raw_lines: List[str]) -> str:
    """First-lines keyword scan → doc-type name ('' when nothing matched).
    Mirrors __type_detect: round-robin over ≤7 batches of 3 non-empty
    lines, full-line match with the reference's permissive charset, the
    закон match deferred so КОДЕКС/УКАЗ later in the hat wins."""
    import re

    batches: List[List[str]] = []
    cur: List[str] = []
    for line in raw_lines:
        if not line.strip():
            continue
        text = line
        for bad, good in _BAD_CHARS.items():
            text = text.replace(bad, good)
        cur.append(text.strip())
        if len(cur) == _HAT_BATCH_SIZE:
            batches.append(cur)
            cur = []
            if len(batches) > _HAT_BATCH_COUNT:
                break
    if cur and len(batches) <= _HAT_BATCH_COUNT:
        batches.append(cur)

    law_matched = False
    for batch in batches:
        for name, template in _HAT_TEMPLATES:
            pattern = r"[\s\w-]*\b" + template + r"\b[()/\.№\s\w-]*"
            for line in batch:
                if re.fullmatch(pattern, line, re.IGNORECASE):
                    if name == "law":
                        law_matched = True
                    else:
                        return name
    return "law" if law_matched else ""


def law_route_for_lines(raw_lines: List[str]) -> tuple:
    """→ (patterns, warning) for a document_type='law' input: the hat
    decides law vs foiv (reference __get_extractor_by_type)."""
    doc_type = classify_law_hat(raw_lines)
    if doc_type in FOIV_TYPES:
        return foiv_patterns(), "Use foiv_law classifier"
    return law_patterns(), "Use law classifier"


# ----------------------------------------------------- law document shape
#
# The reference partitions a law document into header / body / applications
# and builds the tree as root(text=header hat) → body → structure units,
# with each application a sibling of body
# (abstract_law_structure_extractor.py:50-83 + the body/application
# hierarchy-level builders). Pinned by test_api_doctype_law.py.

_LAW_STRUCTURE_TYPES = frozenset(
    {"part", "section", "subsection", "chapter", "paragraph", "article",
     "articlePart", "item", "subitem"}
)
#: named units open the body outright; bare dotted numbers only count when
#: followed by a letter (reference regexps_items, utils_reg.py — a date like
#: "03.06.2009" in the hat must NOT start the body)
_LAW_NAMED_UNITS = frozenset({"part", "section", "chapter", "article"})
_ITEM_WITH_TEXT = None


def _item_with_text_re():
    global _ITEM_WITH_TEXT
    if _ITEM_WITH_TEXT is None:
        import re

        _ITEM_WITH_TEXT = re.compile(r"^\s*(\d{1,3}\.)+\s*[a-zA-Zа-яёА-ЯЁ]|^\s*\d{1,3}[)}]")
    return _ITEM_WITH_TEXT

# reference LawTextFeatures.regexp_application_begin (law_text_features.py:22),
# matched over the stripped lowercased line
_APPLICATION_BEGIN = None


def _application_begin_re():
    global _APPLICATION_BEGIN
    if _APPLICATION_BEGIN is None:
        import re

        _APPLICATION_BEGIN = re.compile(
            r"^('|\")?((приложение)|(утвержден)[оаы]?)(\s*([№n]?\s*\d{1,3})?\s*)"
            r"((к распоряжению)|(к постановлению)|(к приказу))?\s*$"
        )
    return _APPLICATION_BEGIN


_LAW_EXCEPT_WORDS = frozenset(
    {"приказ", "положение", "требования", "постановление", "перечень",
     "регламент", "закон"}
)


def law_preprocess_txt_lines(lines: list) -> list:
    """Join spaced-single-letter keyword lines (``З А К О Н`` → ``ЗАКОН``)
    — the reference's txt-route __preprocess_lines
    (abstract_law_structure_extractor.py:85-104)."""
    from dedoc_ray.core.line import LineWithMeta

    out = []
    for ln in lines:
        words = [w for w in ln.line.split() if w.isalnum()]
        if words and max(len(w) for w in words) == 1:
            word = "".join(words)
            if word.lower() in _LAW_EXCEPT_WORDS:
                out.append(LineWithMeta(
                    line=word + "\n", metadata=ln.metadata,
                    annotations=ln.annotations, uid=ln.uid,
                ))
                continue
        out.append(ln)
    return out


def law_shape(lines: list) -> list:
    """Reshape classified law lines into the reference tree contract:
    header lines (before the first structure unit) merge into ROOT text, a
    synthetic empty ``body`` node at level (1,0) adopts the structure
    units, and application-begin lines become ``application`` nodes at the
    same depth as body."""
    from dedoc_ray.core.hierarchy import HierarchyLevel
    from dedoc_ray.core.line import LineMetadata, LineWithMeta

    app_re = _application_begin_re()
    body_start = None
    app_start = None
    item_re = _item_with_text_re()
    for i, ln in enumerate(lines):
        hl = ln.metadata.hierarchy_level
        if body_start is None and hl is not None and (
            hl.line_type in _LAW_NAMED_UNITS
            or (hl.line_type in _LAW_STRUCTURE_TYPES and item_re.match(ln.line))
        ):
            body_start = i
        if body_start is not None and app_re.match(ln.line.strip().lower()):
            app_start = i
            break
    if body_start is None:
        body_start = len(lines)

    out: list = []
    for ln in lines[:body_start]:  # header hat → root text
        ln.metadata.hierarchy_level = HierarchyLevel(0, 0, True, "root")
        out.append(ln)
    out.append(
        LineWithMeta(
            line="",
            metadata=LineMetadata(
                page_id=lines[body_start].metadata.page_id if body_start < len(lines) else 0,
                line_id=0,
                hierarchy_level=HierarchyLevel(1, 0, False, "body"),
            ),
            uid="law_body",
        )
    )
    body_end = app_start if app_start is not None else len(lines)
    out.extend(lines[body_start:body_end])
    prev_was_begin = False
    for ln in lines[body_end:]:
        if app_re.match(ln.line.strip().lower()):
            # consecutive begin lines merge into one application node
            # (abstract_application_hierarchy_level_builder.py:40-44)
            ln.metadata.hierarchy_level = HierarchyLevel(1, 0, prev_was_begin, "application")
            prev_was_begin = True
        else:
            if ln.line.strip():
                prev_was_begin = False
        out.append(ln)
    return out


# ------------------------------------------------------ tz document shape
#
# Reference TzStructureExtractor.extract (tz_structure_extractor.py:35-80):
# header (before toc/body) merges into root, the toc block (begun by a
# "содержание"/"оглавление" line) becomes toc → toc_item nodes, and ONE
# synthetic body node at (1,0) adopts the structure units. Pinned by
# test_api_doctype_tz._check_tz_tree.

_TZ_STRUCTURE_TYPES = frozenset({"part", "section", "item", "named_item", "requirements"})
_TOC_TITLES = ("содержание", "оглавление", "contents", "table of contents")


def tz_shape(lines: list) -> list:
    from dedoc_ray.core.hierarchy import HierarchyLevel
    from dedoc_ray.core.line import LineMetadata, LineWithMeta

    toc_start = None
    toc_end = None
    body_start = None
    for i, ln in enumerate(lines):
        stripped = ln.line.strip().lower()
        if toc_start is None and stripped in _TOC_TITLES:
            toc_start = i
            continue
        hl = ln.metadata.hierarchy_level
        structural = hl is not None and hl.line_type in _TZ_STRUCTURE_TYPES
        if toc_start is not None and toc_end is None:
            # toc entries are dotted/numbered lines; the block ends at the
            # first non-empty line that is neither structural-looking nor
            # blank (reference: last toc/title prediction bounds the block)
            if structural or not stripped:
                continue
            toc_end = i
        if structural and body_start is None and (toc_start is None or toc_end is not None):
            body_start = i
            break
    if toc_start is not None and toc_end is None:
        toc_end = len(lines)
    if body_start is None:
        body_start = toc_end if toc_end is not None else len(lines)

    out: list = []
    header_end = toc_start if toc_start is not None else body_start
    for ln in lines[:header_end]:
        ln.metadata.hierarchy_level = HierarchyLevel(0, 0, True, "root")
        out.append(ln)
    if toc_start is not None:
        toc_line = lines[toc_start]
        toc_line.metadata.hierarchy_level = HierarchyLevel(1, 0, False, "toc")
        out.append(toc_line)
        for ln in lines[toc_start + 1:toc_end]:
            ln.metadata.hierarchy_level = HierarchyLevel(2, 0, False, "toc_item")
            out.append(ln)
    out.append(
        LineWithMeta(
            line="",
            metadata=LineMetadata(
                page_id=lines[body_start].metadata.page_id if body_start < len(lines) else 0,
                line_id=0,
                hierarchy_level=HierarchyLevel(1, 0, False, "body"),
            ),
            uid="tz_body",
        )
    )
    out.extend(lines[body_start:] if toc_start is None else lines[max(body_start, toc_end):])
    return out


# -------------------------------------------------- diploma document shape
#
# Reference diploma tree (diploma_builder/body_builder.py + pinned by
# test_api_doctype_diploma.py): root(hat) → [empty body, toc("Содержание")
# → toc_items, named_item, named_item, ...] — named items are ROOT-level
# siblings of body/toc; everything else nests under the nearest named item.

#: standalone section names match the WHOLE line (a body sentence starting
#: with "введение ..." must not become a section); глава/приложение carry a
#: number + title tail
_DIPLOMA_EXACT_KEYWORDS = (
    "введение", "заключение", "библиографический список", "список литературы",
    "introduction", "conclusion", "references", "abstract",
)
_DIPLOMA_PREFIX_KEYWORDS = ("глава", "приложение", "приложения", "chapter", "appendix")


def _diploma_is_named_item(stripped: str) -> bool:
    import re

    low = stripped.lower().rstrip(".")
    if low in _DIPLOMA_EXACT_KEYWORDS:
        return True
    if any(re.match(rf"^{k}\s+\S", low) for k in _DIPLOMA_PREFIX_KEYWORDS):
        return True
    # numbered ALL-CAPS chapter heading ("1. ТЕОРЕТИЧЕСКОЕ ...")
    m = re.match(r"^\d+\.?\s+(\S+)", stripped)
    return bool(m) and m.group(1).isupper() and len(m.group(1)) > 2


def diploma_shape(lines: list) -> list:
    import re

    from dedoc_ray.core.hierarchy import HierarchyLevel
    from dedoc_ray.core.line import LineMetadata, LineWithMeta

    page_num_re = re.compile(r"\d+\s*$")
    toc_start = None
    for i, ln in enumerate(lines):
        if ln.line.strip().lower() in _TOC_TITLES:
            toc_start = i
            break

    # header = hat before the toc (or before the first named item)
    header_end = toc_start
    if header_end is None:
        header_end = next(
            (i for i, ln in enumerate(lines) if _diploma_is_named_item(ln.line.strip())),
            len(lines),
        )
    out: list = []
    for ln in lines[:header_end]:
        ln.metadata.hierarchy_level = HierarchyLevel(0, 0, True, "root")
        out.append(ln)
    out.append(
        LineWithMeta(
            line="",
            metadata=LineMetadata(page_id=0, line_id=0, hierarchy_level=HierarchyLevel(1, 0, False, "body")),
            uid="diploma_body",
        )
    )
    i = header_end
    if toc_start is not None:
        toc_line = lines[toc_start]
        toc_line.metadata.hierarchy_level = HierarchyLevel(1, 0, False, "toc")
        out.append(toc_line)
        i = toc_start + 1
        # a toc entry ends with a page number or dot leaders; a wrapped
        # entry's FIRST line qualifies when the next non-empty line still
        # looks like a toc tail
        def _tocish(s: str) -> bool:
            return bool(page_num_re.search(s)) or "..." in s

        while i < len(lines):
            stripped = lines[i].line.strip()
            if not stripped:
                i += 1
                continue
            if not _tocish(stripped):
                # wrapped entries run up to ~4 physical lines before the
                # page-number tail (seen in real diploma TOCs)
                following = [lines[j].line.strip() for j in range(i + 1, min(i + 4, len(lines)))]
                if not any(_tocish(s) for s in following if s):
                    break
            lines[i].metadata.hierarchy_level = HierarchyLevel(2, 0, False, "toc_item")
            out.append(lines[i])
            i += 1
    for ln in lines[i:]:
        hl = ln.metadata.hierarchy_level
        # chapter headings the upstream classifier caught (ML variants like
        # "Chap. 1.") fold into named_item — the reference diploma taxonomy
        # has no separate chapter type (body_builder.py:16)
        if _diploma_is_named_item(ln.line.strip()) or (
            hl is not None and hl.line_type in ("chapter", "named_item")
        ):
            ln.metadata.hierarchy_level = HierarchyLevel(1, 0, False, "named_item")
        out.append(ln)
    return out


DOMAIN_PATTERNS: Dict[str, Callable[[], List[Pattern]]] = {
    "other": default_patterns,
    "law": law_patterns,
    "law_txt": law_patterns,
    "tz": tz_patterns,
    "tz_txt": tz_patterns,
    "diploma": diploma_patterns,
    # fintoc classifies lines with the trained title model
    # (structure/ml_classifier.py::FintocTitleClassifier); the pattern layer
    # is a no-op default the kernel overrides
    "fintoc": default_patterns,
}


def patterns_for_document_type(document_type: str) -> List[Pattern]:
    try:
        return DOMAIN_PATTERNS[document_type]()
    except KeyError:
        raise ValueError(
            f"unknown document_type {document_type!r}; known: {sorted(DOMAIN_PATTERNS)}"
        ) from None
