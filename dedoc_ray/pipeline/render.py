"""Output renderers — the engine's analogue of the reference's return
formats (dedoc/api/api_utils.py:17-274: json2txt / json2html / tree).

The wire format is the flattened row (extracted_text + node/annotation
spans, schemas.EXTRACTED_SCHEMA); these functions re-materialize the
reference's output shapes from it. All are pure per-row functions — use
``render_batch`` as a ``map_batches`` stage to produce a rendered column.
"""

from __future__ import annotations

import html as html_mod
import json
from typing import Dict, List

import pyarrow as pa


def render_txt(row: Dict) -> str:
    """json2txt analogue: the flat text (api_utils.py:json2txt joins node
    texts in document order — extracted_text already is that join)."""
    return row["extracted_text"]


def _node_text(row: Dict, node: Dict) -> str:
    return row["extracted_text"][node["text_start"]:node["text_end"]]


def _apply_annotations(text: str, anns: List[Dict]) -> str:
    """Wrap annotated spans in tags (bold/italic/underlined → b/i/u),
    escaping everything else — api_utils.py's span rendering."""
    tag_of = {"bold": "b", "italic": "i", "underlined": "u"}
    events: List = []
    for a in anns:
        tag = tag_of.get(a["name"])
        if tag and 0 <= a["start"] < a["end"] <= len(text):
            events.append((a["start"], 1, f"<{tag}>"))
            events.append((a["end"], 0, f"</{tag}>"))
    if not events:
        return html_mod.escape(text, quote=False)
    events.sort(key=lambda e: (e[0], e[1]))
    out: List[str] = []
    pos = 0
    for at, _, markup in events:
        out.append(html_mod.escape(text[pos:at], quote=False))
        out.append(markup)
        pos = at
    out.append(html_mod.escape(text[pos:], quote=False))
    return "".join(out)


def render_html(row: Dict) -> str:
    """json2html analogue: nested <div> per node (depth from the node_id
    path), inline style tags from annotations, tables as <table> grids."""
    anns_by_node: Dict[str, List[Dict]] = {}
    for a in row.get("annotations") or []:
        anns_by_node.setdefault(a["node_id"], []).append(a)
    parts: List[str] = ["<html><body>"]
    for node in row.get("nodes") or []:
        depth = node["node_id"].count(".")
        text = _apply_annotations(_node_text(row, node), anns_by_node.get(node["node_id"], []))
        text = text.replace("\n", "<br>")
        parts.append(f'<div class="depth{depth} {node["line_type"]}">{text}</div>')
    for t in row.get("tables") or []:
        parts.append("<table border=\"1\">")
        for cells in t["cells"]:
            parts.append("<tr>")
            for c in cells:
                if c["invisible"]:
                    continue
                span = ""
                if c["colspan"] > 1:
                    span += f' colspan="{c["colspan"]}"'
                if c["rowspan"] > 1:
                    span += f' rowspan="{c["rowspan"]}"'
                parts.append(f"<td{span}>{html_mod.escape(c['text'], quote=False)}</td>")
            parts.append("</tr>")
        parts.append("</table>")
    parts.append("</body></html>")
    return "".join(parts)


def render_tree(row: Dict) -> Dict:
    """Tree return-format analogue: rebuild the recursive structure
    (node_id path strings → subparagraphs) — the ParsedDocument shape
    (api/schema/tree_node.py:9-33) minus request-scoped fields."""
    anns_by_node: Dict[str, List[Dict]] = {}
    for a in row.get("annotations") or []:
        anns_by_node.setdefault(a["node_id"], []).append(
            {"start": a["start"], "end": a["end"], "name": a["name"], "value": a["value"]})
    index: Dict[str, Dict] = {}
    root: Dict = {}
    for node in row.get("nodes") or []:
        all_anns = anns_by_node.get(node["node_id"], [])
        # "_page" pseudo-annotations → metadata.additional_page_ids
        # (reference line metadata for page-spanning nodes,
        # test_api_misc_structure.test_page_id_tree_structure)
        page_anns = [a for a in all_anns if a["name"] == "_page"]
        metadata = {"paragraph_type": node["line_type"]}
        if page_anns:
            metadata["additional_page_ids"] = [
                {"page_id": int(a["value"]), "start": a["start"], "end": a["end"]}
                for a in page_anns
            ]
        entry = {
            "node_id": node["node_id"],
            "text": _node_text(row, node),
            "metadata": metadata,
            "annotations": [a for a in all_anns if a["name"] != "_page"],
            "subparagraphs": [],
        }
        index[node["node_id"]] = entry
        if node["node_id"] == "0":
            root = entry
        else:
            parent_id = node["node_id"].rsplit(".", 1)[0]
            parent = index.get(parent_id)
            if parent is not None:
                parent["subparagraphs"].append(entry)
    return {
        "content": {"structure": root, "tables": row.get("tables") or []},
        "warnings": list(row.get("warnings") or []),
    }


def labeling_rows(batch: pa.Table) -> pa.Table:
    """Labeling-dump stage (reference labeling/train_dataset sink: one
    jsonl record per LINE with its uid/type/levels for annotation tooling).
    Emits one row per node span — write with ``write_labeling_dump``."""
    rows = batch.to_pylist()
    cols: Dict[str, List] = {k: [] for k in ("url", "node_id", "line_type", "level_1", "level_2", "text", "annotations_json")}
    for r in rows:
        anns_by_node: Dict[str, List[Dict]] = {}
        for a in r.get("annotations") or []:
            anns_by_node.setdefault(a["node_id"], []).append(
                {"start": a["start"], "end": a["end"], "name": a["name"], "value": a["value"]}
            )
        for node in r.get("nodes") or []:
            cols["url"].append(r["url"])
            cols["node_id"].append(node["node_id"])
            cols["line_type"].append(node["line_type"])
            cols["level_1"].append(node["level_1"])
            cols["level_2"].append(node["level_2"])
            cols["text"].append(_node_text(r, node))
            cols["annotations_json"].append(json.dumps(anns_by_node.get(node["node_id"], []), sort_keys=True))
    return pa.Table.from_pydict(
        {
            "url": pa.array(cols["url"], "string"),
            "node_id": pa.array(cols["node_id"], "string"),
            "line_type": pa.array(cols["line_type"], "string"),
            "level_1": pa.array(cols["level_1"], "int32"),
            "level_2": pa.array(cols["level_2"], "float32"),
            "text": pa.array(cols["text"], "string"),
            "annotations_json": pa.array(cols["annotations_json"], "string"),
        }
    )


def write_labeling_dump(extracted_ds, out_dir: str) -> str:
    """Labeling sink: per-line parquet dump (partition-friendly, resumable
    like every sink here — one file per block, never one giant file)."""
    extracted_ds.map_batches(labeling_rows, batch_format="pyarrow").write_parquet(out_dir)
    return out_dir


def render_batch(batch: pa.Table, fmt: str = "html") -> pa.Table:
    """map_batches stage: extracted rows → (url, rendered string column)."""
    renderer = {"txt": render_txt, "html": render_html, "tree": lambda r: json.dumps(render_tree(r), sort_keys=True)}[fmt]
    rows = batch.to_pylist()
    return pa.Table.from_pydict(
        {
            "url": pa.array([r["url"] for r in rows], "string"),
            "rendered": pa.array([renderer(r) for r in rows], "string"),
        }
    )
