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
    return [
        TagHeaderPattern(line_type="header", level_1=1, can_be_multiline=False),
        RegexpPattern(r"^(часть|part)\s+\d+", line_type="part", level_1=1, level_2=1, can_be_multiline=False),
        RegexpPattern(r"^(раздел|section)\s+[ivxlc\d]+", line_type="section", level_1=1, level_2=2, can_be_multiline=False),
        RegexpPattern(r"^(глава|chapter)\s+\d+", line_type="chapter", level_1=1, level_2=3, can_be_multiline=False),
        RegexpPattern(r"^(статья|article)\s+\d+", line_type="article", level_1=1, level_2=4, can_be_multiline=False),
        DottedListPattern(line_type="item", level_1=2, can_be_multiline=False),
        RegexpPattern(r"^\d+\)\s", line_type="subitem", level_1=3, level_2=1, can_be_multiline=False),
        BulletListPattern(line_type="subitem", level_1=3, level_2=2, can_be_multiline=False),
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
