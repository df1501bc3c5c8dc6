"""Annotation merging over node text.

Replicates the reference algorithm (dedoc/utils/annotation_merger.py:64-145):

1. group annotations by (name, value);
2. within a group of mergeable annotations, merge spans that are adjacent or
   overlapping, allowing whitespace runs of the text to bridge gaps;
3. drop contradicting overlaps of the same name (keep earliest; a span whose
   kept predecessor covers only whitespace is replaced).
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import List, Tuple

from dedoc_ray.core.annotation import Annotation

_SPACES = re.compile(r"\s+")


def _merge_one_group(annotations: List[Annotation], spaces: List[Tuple[int, int]]) -> List[Annotation]:
    # all annotations share (name, value); spaces are (start, end) whitespace runs
    if len(annotations) <= 1 or not annotations[0].is_mergeable:
        return annotations
    name, value = annotations[0].name, annotations[0].value
    # mix real annotations with whitespace pseudo-spans; sweep left to right
    events: List[Tuple[int, int, bool]] = [(a.start, a.end, True) for a in annotations]
    events.extend((s, e, False) for s, e in spaces)
    events.sort(key=lambda t: t[0])

    result: List[Annotation] = []
    cur_start, cur_end = events[0][0], events[0][1]
    cur_real: List[Tuple[int, int]] = [(events[0][0], events[0][1])] if events[0][2] else []
    for start, end, is_real in events[1:]:
        if cur_end >= start:
            cur_end = max(cur_end, end)
            cur_start = min(cur_start, start)
            if is_real:
                cur_real.append((start, end))
        else:
            if cur_real:
                result.append(Annotation(min(s for s, _ in cur_real), max(e for _, e in cur_real), name, value))
            cur_start, cur_end = start, end
            cur_real = [(start, end)] if is_real else []
    if cur_real:
        result.append(Annotation(min(s for s, _ in cur_real), max(e for _, e in cur_real), name, value))
    return result


def _filter_contradicting(annotations: List[Annotation], text: str) -> List[Annotation]:
    by_name: "defaultdict[str, List[Annotation]]" = defaultdict(list)
    for a in annotations:
        by_name[a.name].append(a)

    filtered: List[Annotation] = []
    for group in by_name.values():
        if not group[0].is_mergeable:
            filtered.extend(group)
            continue
        group = sorted(group, key=lambda x: x.start)
        prev_end = 0
        kept_for_name: List[Annotation] = []
        for a in group:
            if a.start >= prev_end:
                kept_for_name.append(a)
                prev_end = a.end
            elif kept_for_name and _SPACES.match(text[kept_for_name[-1].start:kept_for_name[-1].end]):
                kept_for_name[-1] = a
                prev_end = a.end
        filtered.extend(kept_for_name)
    return filtered


def merge_annotations(annotations: List[Annotation], text: str) -> List[Annotation]:
    if not annotations:
        return []
    groups: "defaultdict[Tuple[str, str], List[Annotation]]" = defaultdict(list)
    for a in annotations:
        groups[(a.name, a.value)].append(a)

    spaces = [(m.start(), m.end()) for m in _SPACES.finditer(text)]

    merged: List[Annotation] = []
    for group in groups.values():
        merged.extend(_merge_one_group(group, spaces))

    return _filter_contradicting(merged, text)
