"""Core algebra tests — mirror of the reference unit suite
(tests/unit_tests/test_misc_line_split.py, test_misc_line_sum.py,
test_misc_hierarchy_level.py, test_misc_annotations.py)."""

from dedoc_ray.core import Annotation, HierarchyLevel, LineMetadata, LineWithMeta, merge_annotations


def make_line(text, annotations=None):
    return LineWithMeta(text, metadata=LineMetadata(), annotations=annotations or [])


class TestHierarchyLevel:
    def test_none_is_infinity(self):
        raw = HierarchyLevel.create_raw_text()
        header = HierarchyLevel(1, 2, False, "header")
        assert header < raw
        assert raw > header
        assert raw == HierarchyLevel(None, None, False, "other_type")

    def test_lexicographic(self):
        assert HierarchyLevel(1, 2, False, "x") < HierarchyLevel(2, 0, False, "x")
        assert HierarchyLevel(2, 1, False, "x") < HierarchyLevel(2, 2, False, "x")
        assert HierarchyLevel(2, 1.5, False, "x") < HierarchyLevel(2, 2, False, "x")
        assert HierarchyLevel(2, None, False, "x") > HierarchyLevel(2, 100, False, "x")

    def test_eq_levels_only(self):
        assert HierarchyLevel(1, 1, False, "a") == HierarchyLevel(1, 1, True, "b")


class TestSliceAndSplit:
    def test_slice_clips_annotations(self):
        line = make_line("hello world", [Annotation(0, 5, "bold", "True"), Annotation(6, 11, "italic", "True")])
        part = line.slice(3, 8)
        assert part.line == "lo wo"
        assert part.annotations == [Annotation(0, 2, "bold", "True"), Annotation(3, 5, "italic", "True")]

    def test_split_keeps_all_text(self):
        line = make_line("one\ntwo\nthree")
        parts = line.split("\n")
        assert [p.line for p in parts] == ["one\n", "two\n", "three"]
        assert "".join(p.line for p in parts) == line.line

    def test_split_no_separator(self):
        line = make_line("plain")
        assert [p.line for p in line.split("\n")] == ["plain"]


class TestAdd:
    def test_add_str(self):
        line = make_line("abc", [Annotation(0, 3, "bold", "True")])
        out = line + "def"
        assert out.line == "abcdef"
        assert out.annotations == [Annotation(0, 3, "bold", "True")]

    def test_add_line_shifts_and_merges(self):
        a = make_line("abc ", [Annotation(0, 4, "bold", "True")])
        b = make_line("def", [Annotation(0, 3, "bold", "True")])
        out = a + b
        assert out.line == "abc def"
        # adjacent via whitespace bridge → merged to one span
        assert out.annotations == [Annotation(0, 7, "bold", "True")]

    def test_join(self):
        lines = [make_line("a"), make_line("b"), make_line("c")]
        assert LineWithMeta.join(lines, delimiter="\n").line == "a\nb\nc"


class TestAnnotationMerger:
    def test_merge_same_value_adjacent(self):
        anns = [Annotation(0, 5, "bold", "True"), Annotation(5, 10, "bold", "True")]
        assert merge_annotations(anns, "0123456789") == [Annotation(0, 10, "bold", "True")]

    def test_merge_bridged_by_space(self):
        anns = [Annotation(0, 4, "bold", "True"), Annotation(5, 9, "bold", "True")]
        assert merge_annotations(anns, "abcd efgh") == [Annotation(0, 9, "bold", "True")]

    def test_no_merge_across_text(self):
        anns = [Annotation(0, 2, "bold", "True"), Annotation(5, 7, "bold", "True")]
        out = merge_annotations(anns, "abXXXcdYY")
        assert out == anns

    def test_not_mergeable_kinds_kept(self):
        anns = [Annotation(0, 2, "linked_text", "u1"), Annotation(2, 4, "linked_text", "u1")]
        assert merge_annotations(anns, "abcd") == anns

    def test_different_values_not_merged(self):
        anns = [Annotation(0, 5, "size", "10"), Annotation(5, 9, "size", "12")]
        out = merge_annotations(anns, "abcde fgh")
        assert sorted((a.start, a.end, a.value) for a in out) == [(0, 5, "10"), (5, 9, "12")]
