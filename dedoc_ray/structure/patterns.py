"""Line-type patterns for structure extraction.

Replicates the reference's default pattern composition
(dedoc/structure_extractors/concrete_structure_extractors/
default_structure_extractor.py:38-58 and
dedoc/structure_extractors/patterns/*): ordered first-match over

    TagHeader → TagList → DottedList → Roman → Bracket → Letter → Bullet → Tag

Regexps come from the reference prefix classes
(dedoc/structure_extractors/feature_extractors/list_features/prefix/*.py);
they are applied to the stripped, lowercased line text. Dotted-list depth =
number of number groups in the prefix (dotted_list_pattern.py:54-72).

Users can pass a custom pattern list to ``PatternComposition`` — the same
extension surface as the reference's ``patterns`` parameter
(default_structure_extractor.py:60-81).
"""

from __future__ import annotations

import re
from typing import List, Optional

from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineWithMeta

DOTTED_REGEX = re.compile(r"^\s*(\d+\.)+(\d+)?\s*")
BRACKET_REGEX = re.compile(r"^\s*\d\)")
BULLET_REGEX = re.compile(r"^\s*(-|—|−|–|®|\.|•|\,|‚|©|⎯|°|\*|>|\| -|●|♣|①|▪|\*|\+)")
ANY_LETTER_REGEX = re.compile(r"^\s*\w\)")
ROMAN_REGEX = re.compile(r"^\s*[ivxlcdm]\.")


def dotted_item_depth(text: str) -> int:
    """Number of number groups of a dotted prefix, or -1 if no match
    (reference list_utils.py:10-16)."""
    m = DOTTED_REGEX.match(text)
    if not m:
        return -1
    prefix = m.group().strip()
    return len([n for n in prefix.split(".") if n])


class Pattern:
    """Base: match a line, produce its HierarchyLevel."""

    name = ""

    def match(self, line: LineWithMeta) -> bool:
        raise NotImplementedError

    def get_hierarchy_level(self, line: LineWithMeta) -> HierarchyLevel:
        raise NotImplementedError


class RegexpPattern(Pattern):
    name = "regexp"

    def __init__(self, regexp, line_type: str, level_1: Optional[int] = None, level_2: Optional[int] = None, can_be_multiline: bool = True) -> None:
        self._regexp = re.compile(regexp) if isinstance(regexp, str) else regexp
        self._line_type = line_type
        self._level_1 = level_1
        self._level_2 = level_2
        self._can_be_multiline = can_be_multiline

    def match(self, line: LineWithMeta) -> bool:
        return self._regexp.match(line.line.strip().lower()) is not None

    def get_hierarchy_level(self, line: LineWithMeta) -> HierarchyLevel:
        return HierarchyLevel(self._level_1, self._level_2, self._can_be_multiline, self._line_type)


class DottedListPattern(RegexpPattern):
    name = "dotted_list"

    def __init__(self, line_type: str, level_1: int, can_be_multiline: bool = True) -> None:
        super().__init__(DOTTED_REGEX, line_type=line_type, level_1=level_1, level_2=None, can_be_multiline=can_be_multiline)

    def get_hierarchy_level(self, line: LineWithMeta) -> HierarchyLevel:
        text = line.line.strip().lower()
        m = self._regexp.match(text)
        if m is None:
            raise ValueError(f"no dotted prefix in {text!r}")
        prefix = m.group().strip()
        depth = len([n for n in prefix.split(".") if n])
        return HierarchyLevel(self._level_1, depth, self._can_be_multiline, self._line_type)


class BracketListPattern(RegexpPattern):
    name = "bracket_list"

    def __init__(self, line_type: str, level_1: int, level_2: int, can_be_multiline: bool = True) -> None:
        super().__init__(BRACKET_REGEX, line_type, level_1, level_2, can_be_multiline)


class BulletListPattern(RegexpPattern):
    name = "bullet_list"

    def __init__(self, line_type: str, level_1: int, level_2: int, can_be_multiline: bool = True) -> None:
        super().__init__(BULLET_REGEX, line_type, level_1, level_2, can_be_multiline)


class LetterListPattern(RegexpPattern):
    name = "letter_list"

    def __init__(self, line_type: str, level_1: int, level_2: int, can_be_multiline: bool = True) -> None:
        super().__init__(ANY_LETTER_REGEX, line_type, level_1, level_2, can_be_multiline)


class RomanListPattern(RegexpPattern):
    name = "roman_list"

    def __init__(self, line_type: str, level_1: int, level_2: int, can_be_multiline: bool = True) -> None:
        super().__init__(ROMAN_REGEX, line_type, level_1, level_2, can_be_multiline)


class TagPattern(Pattern):
    """Use reader-provided ``tag_hierarchy_level`` with configurable
    defaults/overrides (reference tag_pattern.py:78-143)."""

    name = "tag"

    def __init__(
        self,
        line_type: Optional[str] = None,
        level_1: Optional[int] = None,
        level_2: Optional[int] = None,
        can_be_multiline: Optional[bool] = None,
        default_line_type: str = HierarchyLevel.raw_text,
        default_level_1: Optional[int] = None,
        default_level_2: Optional[int] = None,
    ) -> None:
        self._line_type = line_type
        self._level_1 = level_1
        self._level_2 = level_2
        self._can_be_multiline = True if can_be_multiline is None else can_be_multiline
        self._can_be_multiline_none = can_be_multiline is None
        self._default_line_type = default_line_type
        self._default_level_1 = default_level_1
        self._default_level_2 = default_level_2

    def match(self, line: LineWithMeta) -> bool:
        return line.metadata.tag_hierarchy_level is not None

    def get_hierarchy_level(self, line: LineWithMeta) -> HierarchyLevel:
        return HierarchyLevel(
            self._get_level_1(line), self._get_level_2(line), self._get_can_be_multiline(line), self._get_line_type(line)
        )

    def _get_line_type(self, line: LineWithMeta) -> str:
        if self._line_type is not None:
            return self._line_type
        tag_hl = line.metadata.tag_hierarchy_level
        return self._default_line_type if tag_hl.is_unknown() else tag_hl.line_type

    def _get_level_1(self, line: LineWithMeta) -> Optional[int]:
        if self._level_1 is not None:
            return self._level_1
        tag_hl = line.metadata.tag_hierarchy_level
        return self._default_level_1 if tag_hl.level_1 is None else tag_hl.level_1

    def _get_level_2(self, line: LineWithMeta) -> Optional[int]:
        if self._level_2 is not None:
            return self._level_2
        tag_hl = line.metadata.tag_hierarchy_level
        return self._default_level_2 if tag_hl.level_2 is None else tag_hl.level_2

    def _get_regexp_level_2(self, line: LineWithMeta) -> int:
        if self._level_2 is not None:
            return self._level_2
        tag_hl = line.metadata.tag_hierarchy_level
        if tag_hl.level_2 is not None:
            return tag_hl.level_2
        if self._default_level_2 is not None:
            return self._default_level_2
        depth = dotted_item_depth(line.line.strip())
        return depth if depth > 0 else 1

    def _get_can_be_multiline(self, line: LineWithMeta) -> bool:
        return line.metadata.tag_hierarchy_level.can_be_multiline if self._can_be_multiline_none else self._can_be_multiline


class TagHeaderPattern(TagPattern):
    name = "tag_header"

    def __init__(self, line_type: Optional[str] = None, level_1: Optional[int] = None, level_2: Optional[int] = None,
                 can_be_multiline: Optional[bool] = None, default_line_type: str = HierarchyLevel.header,
                 default_level_1: int = 1, default_level_2: Optional[int] = None) -> None:
        super().__init__(line_type, level_1, level_2, can_be_multiline, default_line_type, default_level_1, default_level_2)

    def match(self, line: LineWithMeta) -> bool:
        tag_hl = line.metadata.tag_hierarchy_level
        return tag_hl is not None and tag_hl.line_type == HierarchyLevel.header

    def get_hierarchy_level(self, line: LineWithMeta) -> HierarchyLevel:
        return HierarchyLevel(
            self._get_level_1(line), self._get_regexp_level_2(line), self._get_can_be_multiline(line), self._get_line_type(line)
        )


class TagListPattern(TagPattern):
    name = "tag_list"

    def __init__(self, line_type: Optional[str] = None, level_1: Optional[int] = None, level_2: Optional[int] = None,
                 can_be_multiline: Optional[bool] = None, default_line_type: str = HierarchyLevel.list_item,
                 default_level_1: int = 2, default_level_2: Optional[int] = None) -> None:
        super().__init__(line_type, level_1, level_2, can_be_multiline, default_line_type, default_level_1, default_level_2)

    def match(self, line: LineWithMeta) -> bool:
        tag_hl = line.metadata.tag_hierarchy_level
        return tag_hl is not None and tag_hl.line_type == HierarchyLevel.list_item

    def get_hierarchy_level(self, line: LineWithMeta) -> HierarchyLevel:
        return HierarchyLevel(
            self._get_level_1(line), self._get_regexp_level_2(line), self._get_can_be_multiline(line), self._get_line_type(line)
        )


class PatternComposition:
    """First-match pattern application (reference pattern_composition.py:41-56)."""

    def __init__(self, patterns: List[Pattern]) -> None:
        self.patterns = patterns

    def get_hierarchy_level(self, line: LineWithMeta) -> HierarchyLevel:
        for pattern in self.patterns:
            if pattern.match(line):
                return pattern.get_hierarchy_level(line)
        return HierarchyLevel.create_raw_text()


def default_patterns() -> List[Pattern]:
    """The reference's default list (default_structure_extractor.py:47-58)."""
    return [
        TagHeaderPattern(line_type=HierarchyLevel.header, level_1=1, can_be_multiline=False),
        TagListPattern(line_type=HierarchyLevel.list_item, default_level_1=2, can_be_multiline=False),
        DottedListPattern(line_type=HierarchyLevel.list_item, level_1=2, can_be_multiline=False),
        RomanListPattern(line_type=HierarchyLevel.list_item, level_1=3, level_2=1, can_be_multiline=False),
        BracketListPattern(line_type=HierarchyLevel.list_item, level_1=4, level_2=1, can_be_multiline=False),
        LetterListPattern(line_type=HierarchyLevel.list_item, level_1=5, level_2=1, can_be_multiline=False),
        BulletListPattern(line_type=HierarchyLevel.list_item, level_1=6, level_2=1, can_be_multiline=False),
        TagPattern(default_line_type=HierarchyLevel.raw_text),
    ]


class StartWordPattern(Pattern):
    """Match lines beginning with a fixed word/phrase (case-insensitive) —
    the reference's StartWordPattern (patterns/start_word_pattern.py)."""

    name = "start_word"

    def __init__(self, start_word: str, line_type: str, level_1=None, level_2=None, can_be_multiline=True) -> None:
        self._start_word = str(start_word).strip().lower()
        self._line_type = line_type
        self._level_1 = level_1
        self._level_2 = level_2
        self._can_be_multiline = can_be_multiline

    def match(self, line: LineWithMeta) -> bool:
        return line.line.strip().lower().startswith(self._start_word)

    def get_hierarchy_level(self, line: LineWithMeta) -> HierarchyLevel:
        return HierarchyLevel(self._level_1, self._level_2, self._can_be_multiline, self._line_type)


# ------------------------------------------------------- user patterns API

_PATTERN_REGISTRY = {
    cls.name: cls
    for cls in (RegexpPattern, DottedListPattern, BracketListPattern,
                BulletListPattern, LetterListPattern, RomanListPattern,
                TagPattern, TagHeaderPattern, TagListPattern, StartWordPattern)
}


def pattern_from_dict(spec: dict) -> Pattern:
    """Instantiate a pattern from a user parameter dict, e.g.
    ``{"name": "dotted_list", "line_type": "list_item", "level_1": 2}`` —
    the reference's ``patterns=[...]`` knob
    (default_structure_extractor.py:60-81, patterns/utils.py)."""
    spec = dict(spec)
    name = spec.pop("name", None)
    cls = _PATTERN_REGISTRY.get(name)
    if cls is None:
        raise ValueError(f"unknown pattern name {name!r}; known: {sorted(_PATTERN_REGISTRY)}")
    if isinstance(spec.get("can_be_multiline"), str):
        # reference wire form allows "true"/"false" strings (abstract_pattern.py)
        spec["can_be_multiline"] = spec["can_be_multiline"].strip().lower() in ("true", "1")
    try:
        return cls(**spec)
    except TypeError as e:  # missing/unknown kwargs → 400 at the API
        raise ValueError(f"bad pattern spec for {name!r}: {e}") from e


def patterns_from_dicts(specs) -> "PatternComposition":
    """Accepts a list of dicts, or the reference's WIRE FORM — the
    ``str([...])`` Python repr the API receives (parsed with
    ast.literal_eval like default_structure_extractor.py:60-66); json
    strings work too. Malformed input raises ValueError (the API maps it
    to 400, test_api_doctype_default.test_wrong_patterns)."""
    if isinstance(specs, (str, bytes)):
        import ast

        text = specs.decode() if isinstance(specs, bytes) else specs
        if not text.strip():
            return PatternComposition(default_patterns())
        try:
            specs = ast.literal_eval(text)
        except (ValueError, SyntaxError) as e:
            raise ValueError(f"can't parse patterns parameter: {e}") from e
    if not isinstance(specs, (list, tuple)) or not all(isinstance(s, dict) for s in specs):
        raise ValueError("patterns must be a list of pattern dicts")
    if not specs:
        return PatternComposition(default_patterns())
    return PatternComposition([pattern_from_dict(s) for s in specs])
