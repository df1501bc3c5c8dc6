"""ArticleReader — GROBID TEI/XML parsing (scientific-article structure).

The reference posts PDF bytes to a GROBID HTTP service and parses the
XML/TEI response with BeautifulSoup (dedoc/readers/article_reader/
article_reader.py:36-80). No network exists in this environment, so the
service call is the documented stub and THIS module implements the other
half for real: TEI → structured lines with the reference's line-type
taxonomy (root/author/author_first_name/author_surname/email/
author_affiliation/org_name/address/keywords/keyword/abstract/section/
bibliography/bibliography_item/title*/biblScope_*/DOI/publisher/date) and
bibliography ReferenceAnnotations on in-text <ref type="bibr"> citations
(article_reader.py:226-252,449-535). A pipeline that already has TEI
sidecars (a common crawl-processing layout) runs it directly.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.readers.base import UnstructuredDoc


class BadTeiFile(ValueError):
    pass


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _find_all(root: ElementTree.Element, name: str) -> List[ElementTree.Element]:
    return [el for el in root.iter() if _local(el.tag) == name]


def _first(root: ElementTree.Element, name: str) -> Optional[ElementTree.Element]:
    for el in root.iter():
        if _local(el.tag) == name:
            return el
    return None


def _text(el: Optional[ElementTree.Element]) -> str:
    return (el.text or "") if el is not None else ""


def _dotted_depth(number: str) -> int:
    """'4.1.1' → 3 (reference list_utils.get_dotted_item_depth)."""
    parts = [p for p in number.strip().rstrip(".").split(".") if p]
    return len(parts) if parts and all(p.isdigit() for p in parts) else 0


def _mk_line(text: str, level_id: Optional[int] = None, line_type: Optional[str] = None,
             annotations: Optional[List[Annotation]] = None, line_id: int = 0) -> LineWithMeta:
    if level_id is None or line_type is None:
        hl = HierarchyLevel.create_raw_text()
    else:
        hl = HierarchyLevel(level_id, 0, False, line_type)
    uid = hashlib.md5(f"{line_type}_{line_id}_{text}".encode()).hexdigest()
    return LineWithMeta(text, metadata=LineMetadata(page_id=0, line_id=line_id, tag_hierarchy_level=hl),
                        annotations=annotations or [], uid=uid)


def _parse_authors(source: ElementTree.Element, lines: List[LineWithMeta]) -> None:
    """Header biblStruct authors (article_reader.py:167-209)."""
    bibl = _first(source, "biblStruct")
    if bibl is None:
        return
    for author in _find_all(bibl, "author"):
        lines.append(_mk_line("", 1, "author", line_id=len(lines)))
        pers = _first(author, "persName")
        if pers is not None:
            fn = _first(pers, "forename")
            if _text(fn):
                lines.append(_mk_line(_text(fn), 2, "author_first_name", line_id=len(lines)))
            sn = _first(pers, "surname")
            if _text(sn):
                lines.append(_mk_line(_text(sn), 2, "author_surname", line_id=len(lines)))
        for email in _find_all(author, "email"):
            lines.append(_mk_line(_text(email), 3, "email", line_id=len(lines)))
        for aff in _find_all(author, "affiliation"):
            lines.append(_mk_line(aff.get("key") or "", 2, "author_affiliation", line_id=len(lines)))
            org = _first(aff, "orgName")
            if org is not None:
                lines.append(_mk_line(_text(org), 3, "org_name", line_id=len(lines)))
            addr = _first(aff, "address")
            if addr is not None:
                parts = [_text(c) for c in addr if _text(c)]
                lines.append(_mk_line(", ".join(parts), 3, "address", line_id=len(lines)))


def _parse_bibliography(root: ElementTree.Element, lines: List[LineWithMeta]) -> Dict[str, str]:
    """listBibl → bibliography lines; returns {'#xml:id': item line uid}
    (article_reader.py:449-535)."""
    cites: Dict[str, str] = {}
    level2type = {"a": "title", "j": "title_journal", "s": "title_series", "m": "title_conference_proceedings"}
    lines.append(_mk_line("bibliography", 1, "bibliography", line_id=len(lines)))
    bibliography = _first(root, "listBibl")
    if bibliography is None:
        return cites
    for item in _find_all(bibliography, "biblStruct"):
        item_line = _mk_line("", 2, "bibliography_item", line_id=len(lines))
        xml_id = item.get("{http://www.w3.org/XML/1998/namespace}id") or item.get("xml:id")
        if xml_id:
            cites["#" + xml_id] = item_line.uid
        lines.append(item_line)
        for title in _find_all(item, "title"):
            level = title.get("level")
            if level in level2type:
                lines.append(_mk_line(_text(title), 3, level2type[level], line_id=len(lines)))
        for author in _find_all(item, "author"):
            parts = [_text(el) for el in author.iter() if _text(el) and _local(el.tag) in ("forename", "surname")]
            lines.append(_mk_line(" ".join(parts), 3, "author", line_id=len(lines)))
        for scope in _find_all(item, "biblScope"):
            if scope.get("unit") == "volume":
                lines.append(_mk_line(_text(scope), 3, "biblScope_volume", line_id=len(lines)))
            elif scope.get("unit") == "page":
                lines.append(_mk_line(f"{scope.get('from')}-{scope.get('to')}", 3, "biblScope_page", line_id=len(lines)))
        for idno in _find_all(item, "idno"):
            lines.append(_mk_line(_text(idno), 3, "DOI", line_id=len(lines)))
        pub = _first(item, "publisher")
        if pub is not None:
            lines.append(_mk_line(_text(pub), 3, "publisher", line_id=len(lines)))
        date = _first(item, "date")
        if date is not None:
            lines.append(_mk_line(_text(date), 3, "date", line_id=len(lines)))
    return cites


def _line_with_refs(p: ElementTree.Element, bib2uid: Dict[str, str], line_id: int) -> LineWithMeta:
    """Paragraph with <ref> children → raw-text line + reference
    annotations at the citation spans (article_reader.py:226-252)."""
    text = p.text or ""
    annotations: List[Annotation] = []
    for child in p:
        sub = child.text or ""
        if _local(child.tag) == "ref":
            target = child.get("target")
            if child.get("type") == "bibr" and target in bib2uid:
                annotations.append(Annotation(len(text), len(text) + len(sub), "reference", bib2uid[target]))
            text += sub
        else:
            text += sub
        text += child.tail or ""
    return _mk_line(text + "\n", annotations=annotations, line_id=line_id)


def read_tei(data: bytes) -> UnstructuredDoc:
    """TEI/XML bytes → UnstructuredDoc with article line types."""
    try:
        root = ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise BadTeiFile(str(e)) from e

    lines: List[LineWithMeta] = []
    # title → root line (article_reader.py:535)
    lines.append(_mk_line(_text(_first(root, "title")), 0, "root", line_id=0))
    source = _first(root, "sourceDesc")
    if source is not None:
        _parse_authors(source, lines)
    keywords = _first(root, "keywords")
    if keywords is not None:
        lines.append(_mk_line("", 1, "keywords", line_id=len(lines)))
        for term in _find_all(keywords, "term"):
            lines.append(_mk_line(_text(term), 2, "keyword", line_id=len(lines)))

    # bibliography is parsed FIRST to resolve in-text citation targets,
    # then its lines are appended after the body (reference order:
    # article_reader.py:70-80)
    bib_lines: List[LineWithMeta] = []
    bib2uid = _parse_bibliography(root, bib_lines)

    abstract = _first(root, "abstract")
    if abstract is not None:
        lines.append(_mk_line("Abstract", 1, "abstract", line_id=len(lines)))
        lines.append(_mk_line(_text(_first(abstract, "p")), line_id=len(lines)))

    body = _first(root, "body")
    if body is not None:
        for div in _find_all(body, "div"):
            head = _first(div, "head")
            number = (head.get("n") + " ") if head is not None and head.get("n") else ""
            depth = _dotted_depth(number) or 1
            if _text(head):
                lines.append(_mk_line(number + _text(head), depth, "section", line_id=len(lines)))
            for p in div:
                if _local(p.tag) == "p":
                    lines.append(_line_with_refs(p, bib2uid, line_id=len(lines)))

    lines.extend(bib_lines)
    for i, line in enumerate(lines):  # renumber after splice
        line.metadata.line_id = i
    title = _text(_first(root, "title"))
    return UnstructuredDoc(lines=lines, metadata={"title": title},
                           warnings=["TEI parsed natively (GROBID service stubbed: no network)"])
