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
