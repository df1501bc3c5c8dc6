"""Item/subitem line splitting — the structure postprocess that separates a
numbered line into its numeration prefix node and a raw-text remainder node.

Reference parity: dedoc/structure_extractors/abstract_structure_extractor.py
:41-113 (``_postprocess`` + ``_select_annotations``) with the per-domain
prefix regexes of utils_reg.py / law_structure_excractor.py:32-33. Like the
reference, this runs only for the concrete domain extractors (law/tz/
diploma); the default extractor leaves lines whole.

Splitting preserves the concatenated text exactly (prefix + remainder), so
flattened ``extracted_text`` is unchanged — only the node list grows.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Pattern as RePattern, Sequence, Tuple

from dedoc_ray.core.annotation import Annotation, AnnotationNames
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta

# prefix regexes (reference utils_reg.py semantics)
REGEXPS_DIGITS_WITH_DOTS = re.compile(r"^\s*(\d+\.)+(\d+)?\s*")  # "1.", "1.2.", "1.2.3"
REGEXPS_BRACKET_ITEM = re.compile(r"^\s*(\d*\.)*\d+[)}]\s*")     # "1)", "2.1)"
REGEXPS_BULLET = re.compile(r"^\s*[-*•·]\s*")
# garbage filter applied to the matched prefix (reference regexps_ends_of_number)
REGEXPS_ENDS_OF_NUMBER = re.compile(r"([A-ZА-Яa-zа-яё]|\s|( )*)$")


def _select_annotations(annotations: List[Annotation], start: int, end: int) -> List[Annotation]:
    """Annotation re-slicing for a [start, end) cut of the line
    (reference _select_annotations:97-113: table/attachment spans stick to
    the first slice whole; character spans are clipped and re-based)."""
    res: List[Annotation] = []
    for a in annotations:
        if a.name in (AnnotationNames.table, AnnotationNames.attachment):
            if start == 0:
                res.append(Annotation(start, end, a.name, a.value))
        elif a.end > start and a.start <= end:
            res.append(Annotation(max(a.start, start) - start, min(a.end, end) - start, a.name, a.value))
    return res


def split_prefix_lines(
    lines: List[LineWithMeta],
    paragraph_types: Sequence[str],
    regexps: Sequence[RePattern],
    excluding_regexps: Sequence[Optional[RePattern]],
) -> List[LineWithMeta]:
    """Reference ``_postprocess`` semantics: for lines typed as list items,
    emit a prefix line (keeps the item hierarchy) + a raw-text remainder
    line; empty raw-text lines are dropped."""
    result: List[LineWithMeta] = []
    for line in lines:
        hl = line.metadata.hierarchy_level
        if hl is not None and hl.is_raw_text() and len(line.line) == 0:
            continue
        if hl is None or hl.line_type not in paragraph_types:
            result.append(line)
            continue
        matched = False
        for regexp, excl in zip(regexps, excluding_regexps):
            m = regexp.match(line.line)
            if not m:
                continue
            matched = True
            start, end = m.start(), m.end()
            if excl is not None:
                m_excl = excl.search(line.line[start:end])
                if m_excl:
                    end = m_excl.start()
            result.append(
                LineWithMeta(
                    line.line[start:end],
                    metadata=line.metadata,
                    annotations=_select_annotations(line.annotations, start, end),
                    uid=line.uid,
                )
            )
            rest = line.line[end:]
            if rest:
                meta = LineMetadata(
                    page_id=line.metadata.page_id,
                    line_id=line.metadata.line_id,
                    tag_hierarchy_level=line.metadata.tag_hierarchy_level,
                    hierarchy_level=HierarchyLevel.create_raw_text(),
                )
                result.append(
                    LineWithMeta(
                        rest,
                        metadata=meta,
                        annotations=_select_annotations(line.annotations, end, len(line.line)),
                        uid=line.uid + "_split",
                    )
                )
            break
        if not matched:
            result.append(line)
    return result


# per-domain split configuration: (paragraph_types, regexps, excluding)
_DOMAIN_SPLITS: Dict[str, Tuple[Sequence[str], Sequence[RePattern], Sequence[Optional[RePattern]]]] = {
    "law": (
        ("articlePart", "item", "subitem"),
        (REGEXPS_DIGITS_WITH_DOTS, REGEXPS_BRACKET_ITEM, REGEXPS_BULLET),
        (REGEXPS_ENDS_OF_NUMBER, REGEXPS_ENDS_OF_NUMBER, None),
    ),
    "tz": (
        ("item", "section"),
        (REGEXPS_BULLET, REGEXPS_DIGITS_WITH_DOTS),
        (None, REGEXPS_ENDS_OF_NUMBER),
    ),
    "diploma": (
        ("section",),
        (REGEXPS_DIGITS_WITH_DOTS,),
        (REGEXPS_ENDS_OF_NUMBER,),
    ),
}
_DOMAIN_SPLITS["law_txt"] = _DOMAIN_SPLITS["law"]
_DOMAIN_SPLITS["tz_txt"] = _DOMAIN_SPLITS["tz"]


def split_for_document_type(document_type: str, lines: List[LineWithMeta]) -> List[LineWithMeta]:
    """Apply the domain's item/subitem splitting; identity for "other"."""
    cfg = _DOMAIN_SPLITS.get(document_type)
    if cfg is None:
        return lines
    return split_prefix_lines(lines, *cfg)
