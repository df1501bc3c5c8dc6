"""Structure extraction, tree construction, and span flattening.

- ``extract_structure``: fills ``hierarchy_level`` per line via the pattern
  composition (reference default_structure_extractor.py:29-34).
- ``construct_tree``: stack-based tree build with multiline merging and
  synthetic "list" nodes at ``level_2 - 0.5``
  (reference tree_constructor.py:31-102).
- ``flatten_tree``: DFS pre-order of the tree into one ``extracted_text``
  string plus typed node/annotation spans — the Arrow-native encoding of the
  reference's recursive JSON tree (SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.annotation_merger import merge_annotations
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.structure.patterns import PatternComposition, default_patterns


def extract_structure(lines: List[LineWithMeta], patterns: Optional[PatternComposition] = None) -> List[LineWithMeta]:
    composition = patterns if patterns is not None else PatternComposition(default_patterns())
    for line in lines:
        line.metadata.hierarchy_level = composition.get_hierarchy_level(line)
    return lines


class TreeNode:
    __slots__ = ("node_id", "text", "annotations", "metadata", "children", "parent", "extra_pages")

    def __init__(self, node_id: str, text: str, annotations: List[Annotation], metadata: LineMetadata, parent: Optional["TreeNode"]) -> None:
        self.node_id = node_id
        self.text = text
        self.annotations = annotations
        self.metadata = metadata
        self.children: List[TreeNode] = []
        self.parent = parent
        # page transitions inside merged multiline text — the reference's
        # additional_page_ids metadata (api/schema/line_metadata;
        # test_api_misc_structure.test_page_id_tree_structure): node-local
        # [{page_id, start, end}] for every page after the node's first
        self.extra_pages: List[dict] = []

    def add_child(self, line: LineWithMeta) -> "TreeNode":
        node = TreeNode(
            node_id=f"{self.node_id}.{len(self.children)}",
            text=line.line,
            annotations=list(line.annotations),
            metadata=line.metadata,
            parent=self,
        )
        self.children.append(node)
        return node

    def add_text(self, line: LineWithMeta) -> None:
        shift = len(self.text)
        self.annotations.extend(a.shifted(shift) for a in line.annotations)
        line_page = line.metadata.page_id
        node_page = self.metadata.page_id
        if line_page != node_page:
            if self.extra_pages and self.extra_pages[-1]["page_id"] == line_page \
                    and self.extra_pages[-1]["end"] == shift:
                self.extra_pages[-1]["end"] = shift + len(line.line)
            else:
                self.extra_pages.append(
                    {"page_id": line_page, "start": shift, "end": shift + len(line.line)}
                )
        self.text += line.line


def _create_root(title_lines: List[LineWithMeta]) -> TreeNode:
    page_id = 0 if not title_lines else min(line.metadata.page_id for line in title_lines)
    line_id = 0 if not title_lines else min(line.metadata.line_id or 0 for line in title_lines)
    metadata = LineMetadata(page_id=page_id, line_id=line_id, hierarchy_level=HierarchyLevel.create_root())
    root = TreeNode("0", "", [], metadata, parent=None)
    for line in title_lines:
        root.add_text(line)
    return root


def _insert_list_nodes(lines: List[LineWithMeta]) -> List[LineWithMeta]:
    """Synthesize empty "list" lines before list items
    (reference tree_constructor.py:73-102)."""
    previous_levels: List[HierarchyLevel] = []
    result: List[LineWithMeta] = []
    for line in lines:
        hl = line.metadata.hierarchy_level
        if hl.is_list_item():
            while previous_levels and previous_levels[-1] > hl:
                previous_levels.pop()
            if not previous_levels or previous_levels[-1] < hl:
                list_hl = HierarchyLevel(hl.level_1, hl.level_2 - 0.5, False, HierarchyLevel.list)
                list_meta = LineMetadata(page_id=line.metadata.page_id, line_id=line.metadata.line_id, hierarchy_level=list_hl)
                result.append(LineWithMeta("", metadata=list_meta, annotations=[]))
                previous_levels.append(hl)
        elif not hl.is_raw_text():
            previous_levels = []
        result.append(line)
    return result


def construct_tree(lines: List[LineWithMeta]) -> TreeNode:
    title_lines = [ln for ln in lines if ln.metadata.hierarchy_level.level_1 == 0 and ln.metadata.hierarchy_level.level_2 == 0]
    rest = [ln for ln in lines if not (ln.metadata.hierarchy_level.level_1 == 0 and ln.metadata.hierarchy_level.level_2 == 0)]
    rest = _insert_list_nodes(rest)

    root = _create_root(title_lines)
    tree = root
    for line in rest:
        hl = line.metadata.hierarchy_level
        node_hl = tree.metadata.hierarchy_level
        if hl.can_be_multiline and hl == node_hl and hl.line_type == node_hl.line_type:
            tree.add_text(line)
        else:
            while tree.metadata.hierarchy_level >= hl:
                tree = tree.parent
            tree = tree.add_child(line)

    # merge annotations on every node over its final text (tree_node.py:131-141)
    stack = [root]
    while stack:
        node = stack.pop()
        node.annotations = merge_annotations(node.annotations, node.text)
        stack.extend(node.children)
    return root


def flatten_tree(root: TreeNode) -> Dict[str, object]:
    """DFS pre-order flatten: one text string + typed spans.

    Returns dict with keys:
      extracted_text : str — concatenation of node texts in document order
      nodes          : list of dicts (node_id, line_type, level_1, level_2,
                       text_start, text_end)
      annotations    : list of dicts (node_id, start, end, name, value) —
                       offsets are node-local like the reference API tree
    """
    parts: List[str] = []
    nodes: List[Dict[str, object]] = []
    annotations: List[Dict[str, object]] = []
    offset = 0

    stack = [root]
    while stack:
        node = stack.pop()
        hl = node.metadata.hierarchy_level
        start = offset
        offset += len(node.text)
        parts.append(node.text)
        nodes.append(
            {
                "node_id": node.node_id,
                "line_type": hl.line_type if hl is not None else HierarchyLevel.raw_text,
                "level_1": hl.level_1 if hl is not None else None,
                "level_2": float(hl.level_2) if hl is not None and hl.level_2 is not None else None,
                "text_start": start,
                "text_end": offset,
            }
        )
        for a in node.annotations:
            annotations.append({"node_id": node.node_id, "start": a.start, "end": a.end, "name": a.name, "value": a.value})
        for ep in node.extra_pages:
            # page transitions ride the annotations channel (same flat
            # schema); render_tree lifts them into
            # metadata.additional_page_ids like the reference API
            annotations.append({"node_id": node.node_id, "start": ep["start"], "end": ep["end"],
                                "name": "_page", "value": str(ep["page_id"])})
        stack.extend(reversed(node.children))

    return {"extracted_text": "".join(parts), "nodes": nodes, "annotations": annotations}


def construct_linear(lines: List[LineWithMeta]) -> TreeNode:
    """Linear constructor: every line is a direct child of the root, in
    document order (reference linear_constructor.py:8-30) — the
    ``structure_type="linear"`` alternative to the tree."""
    root = _create_root([])
    for line in lines:
        root.add_child(line)
    return root
