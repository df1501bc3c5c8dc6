"""Pattern matching, tree construction, and flatten invariants."""

from dedoc_ray.core import HierarchyLevel, LineMetadata, LineWithMeta
from dedoc_ray.structure import construct_tree, extract_structure, flatten_tree
from dedoc_ray.structure.patterns import (
    BracketListPattern,
    BulletListPattern,
    DottedListPattern,
    LetterListPattern,
    PatternComposition,
    RegexpPattern,
    RomanListPattern,
    dotted_item_depth,
)


def raw_line(text, tag_hl=None):
    return LineWithMeta(text, metadata=LineMetadata(tag_hierarchy_level=tag_hl))


class TestPatterns:
    def test_dotted_depth(self):
        assert dotted_item_depth("1. x") == 1
        assert dotted_item_depth("1.2. x") == 2
        assert dotted_item_depth("1.2.3.4 x") == 4
        assert dotted_item_depth("no prefix") == -1

    def test_dotted_pattern_level2_is_depth(self):
        p = DottedListPattern(line_type="list_item", level_1=2, can_be_multiline=False)
        line = raw_line("2.3. something")
        assert p.match(line)
        hl = p.get_hierarchy_level(line)
        assert (hl.level_1, hl.level_2) == (2, 2)

    def test_roman_bracket_letter_bullet(self):
        assert RomanListPattern("list_item", 3, 1).match(raw_line("IV. item")) is False  # only single roman char
        assert RomanListPattern("list_item", 3, 1).match(raw_line("i. item"))
        assert BracketListPattern("list_item", 4, 1).match(raw_line("1) item"))
        assert LetterListPattern("list_item", 5, 1).match(raw_line("b) item"))
        assert BulletListPattern("list_item", 6, 1).match(raw_line("- item"))
        assert BulletListPattern("list_item", 6, 1).match(raw_line("• item"))

    def test_first_match_wins(self):
        lines = [raw_line("1. dotted"), raw_line("1) bracket"), raw_line("plain")]
        extract_structure(lines)
        assert [ln.metadata.hierarchy_level.line_type for ln in lines] == ["list_item", "list_item", "raw_text"]
        assert [ln.metadata.hierarchy_level.level_1 for ln in lines] == [2, 4, None]

    def test_custom_pattern_composition(self):
        comp = PatternComposition([RegexpPattern(r"^chapter \d+", "chapter", 1, 0, False)])
        lines = [raw_line("Chapter 3: The End"), raw_line("other")]
        extract_structure(lines, comp)
        assert lines[0].metadata.hierarchy_level.line_type == "chapter"
        assert lines[1].metadata.hierarchy_level.line_type == "raw_text"


class TestTree:
    def test_multiline_raw_text_merged(self):
        lines = [raw_line("a\n"), raw_line("b\n"), raw_line("c")]
        extract_structure(lines)
        flat = flatten_tree(construct_tree(lines))
        raw_nodes = [n for n in flat["nodes"] if n["line_type"] == "raw_text"]
        assert len(raw_nodes) == 1
        assert flat["extracted_text"] == "a\nb\nc"

    def test_header_not_merged_when_not_multiline(self):
        h = HierarchyLevel(1, 1, False, "header")
        lines = [raw_line("H1", HierarchyLevel(1, 1, False, "header")), raw_line("H1b", h)]
        extract_structure(lines)
        flat = flatten_tree(construct_tree(lines))
        headers = [n for n in flat["nodes"] if n["line_type"] == "header"]
        assert len(headers) == 2

    def test_list_grouping_resets_on_header(self):
        lines = [
            raw_line("1. one"),
            raw_line("2. two"),
            raw_line("Header", HierarchyLevel(1, 1, False, "header")),
            raw_line("1. restart"),
        ]
        extract_structure(lines)
        flat = flatten_tree(construct_tree(lines))
        list_nodes = [n for n in flat["nodes"] if n["line_type"] == "list"]
        assert len(list_nodes) == 2

    def test_spans_cover_text_exactly(self):
        lines = [raw_line("aaa\n"), raw_line("1. item\n"), raw_line("bbb")]
        extract_structure(lines)
        flat = flatten_tree(construct_tree(lines))
        text = flat["extracted_text"]
        for n in flat["nodes"]:
            seg = text[n["text_start"]:n["text_end"]]
            assert len(seg) == n["text_end"] - n["text_start"]
        assert sum(n["text_end"] - n["text_start"] for n in flat["nodes"]) == len(text)


def test_toc_detection_marks_runs():
    from dedoc_ray.core.line import LineMetadata, LineWithMeta
    from dedoc_ray.structure.toc import mark_toc

    lines = [
        LineWithMeta("Contents\n", metadata=LineMetadata(page_id=0)),
        LineWithMeta("Introduction ........ 1\n", metadata=LineMetadata(page_id=0)),
        LineWithMeta("Methods ............. 5\n", metadata=LineMetadata(page_id=0)),
        LineWithMeta("Results ............ 12\n", metadata=LineMetadata(page_id=0)),
        LineWithMeta("regular body text follows\n", metadata=LineMetadata(page_id=1)),
    ]
    mark_toc(lines)
    types = [l.metadata.tag_hierarchy_level.line_type for l in lines]
    assert types == ["toc", "toc_item", "toc_item", "toc_item", "unknown"]


def test_toc_detection_rejects_short_and_descending_runs():
    from dedoc_ray.core.line import LineMetadata, LineWithMeta
    from dedoc_ray.structure.toc import mark_toc

    # only two toc-ish lines → below min_run
    short = [
        LineWithMeta("A ..... 1\n", metadata=LineMetadata(page_id=0)),
        LineWithMeta("B ..... 2\n", metadata=LineMetadata(page_id=0)),
    ]
    mark_toc(short)
    assert all(l.metadata.tag_hierarchy_level.line_type == "unknown" for l in short)

    # descending page numbers break the run
    desc = [
        LineWithMeta("A ..... 9\n", metadata=LineMetadata(page_id=0)),
        LineWithMeta("B ..... 5\n", metadata=LineMetadata(page_id=0)),
        LineWithMeta("C ..... 2\n", metadata=LineMetadata(page_id=0)),
    ]
    mark_toc(desc)
    assert all(l.metadata.tag_hierarchy_level.line_type == "unknown" for l in desc)


def test_law_hat_classification_routing():
    # reference ClassifyingLawStructureExtractor: first-lines keywords route
    # law vs foiv; order/state/instruction are foiv, закон deferred to last
    from dedoc_ray.structure.domain import FOIV_TYPES, classify_law_hat

    assert classify_law_hat(["ПРИКАЗ № 47/823 от 17.12.2013 г."]) == "order"
    assert classify_law_hat(["П Р И К А 3 № 5"]) == "order"  # OCR з→3 + spacing
    assert classify_law_hat(["ЯМАЛО-НЕНЕЦКИЙ АВТОНОМНЫЙ ОКРУГ", "ЗАКОН О СВЯЗИ"]) == "law"
    # ЗАКОН ... КОДЕКС hack: закон match is deferred, кодекс wins
    assert classify_law_hat(["ЗАКОН РОССИЙСКОЙ ФЕДЕРАЦИИ", "ГРАЖДАНСКИЙ КОДЕКС"]) == "code"
    assert classify_law_hat(["ПОСТАНОВЛЕНИЕ от 1.1.2000 № 34"]) == "decree"
    assert classify_law_hat(["ИНСТРУКЦИЯ"]) == "instruction"
    assert classify_law_hat(["совершенно обычный текст без ключевых слов"]) == ""
    # keyword beyond the 7x3-line hat window is ignored
    lines = [f"line {i}" for i in range(30)] + ["ПРИКАЗ № 1"]
    assert classify_law_hat(lines) == ""
    assert "order" in FOIV_TYPES and "state" in FOIV_TYPES and "instruction" in FOIV_TYPES


def test_law_foiv_kernel_routing():
    from collections import Counter

    from dedoc_ray.pipeline.config import PipelineConfig
    from dedoc_ray.pipeline.kernel import ExtractKernel
    from dedoc_ray.sources.synth_office import law_foiv_bytes

    k = ExtractKernel(config=PipelineConfig(document_type="law"))
    law_row = k.extract_row("a.txt", law_foiv_bytes(2, "alpha the beta the gamma"))
    foiv_row = k.extract_row("b.txt", law_foiv_bytes(3, "alpha the beta the gamma"))
    assert any("Use law classifier" in w for w in law_row["warnings"])
    assert any("Use foiv_law classifier" in w for w in foiv_row["warnings"])
    law_types = Counter(n["line_type"] for n in law_row["nodes"])
    foiv_types = Counter(n["line_type"] for n in foiv_row["nodes"])
    assert law_types["article"] == 3 and law_types["item"] == 0
    assert foiv_types["item"] == 3 and foiv_types["subitem"] == 3 and foiv_types["article"] == 0
