"""Minimal HTML DOM built on the standard library ``html.parser``.

The reference parses HTML with BeautifulSoup's "html.parser" tree builder
(dedoc/readers/html_reader/html_reader.py:34-35), which itself wraps the same
stdlib ``HTMLParser`` with ``convert_charrefs=True``. This module rebuilds the
same tree shape without the bs4 dependency:

- elements hold ``name``, ``attrs`` (dict of raw strings), ``children``;
- text runs between tags coalesce into single text nodes (name is ``None``,
  like ``NavigableString.name``);
- comments / doctype become dedicated node kinds (the reader skips them —
  reference html_reader.py:210-223);
- void elements (br, hr, img, meta, …) never take children;
- an unmatched end tag pops up to the most recent open tag of that name and is
  ignored when no such tag is open (bs4 ``_popToTag`` behavior).

Encoding detection mirrors bs4's UnicodeDammit priorities: BOM, declared
``<meta charset>`` / XML declaration, then strict UTF-8, then
charset_normalizer's best guess, then latin-1 with replacement.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, Iterator, List, Optional, Union

# bs4 HTMLTreeBuilder.empty_element_tags (builder/__init__.py in bs4 4.x)
VOID_ELEMENTS = frozenset(
    "area base basefont bgsound br col command embed frame hr image img input "
    "isindex keygen link menuitem meta nextid param source spacer track wbr".split()
)

# stdlib html.parser switches to CDATA mode for these; their raw content
# arrives via handle_data unparsed
CDATA_ELEMENTS = frozenset({"script", "style"})

TEXT = "#text"
COMMENT = "#comment"
DOCTYPE = "#doctype"
DOCUMENT = "[document]"


class HtmlNode:
    __slots__ = ("kind", "name", "attrs", "children", "parent", "text", "hidden")

    def __init__(
        self,
        kind: str,
        name: Optional[str] = None,
        attrs: Optional[Dict[str, str]] = None,
        text: str = "",
        parent: Optional["HtmlNode"] = None,
    ) -> None:
        self.kind = kind  # "element" | TEXT | COMMENT | DOCTYPE
        self.name = name  # None for text/comment/doctype nodes
        self.attrs = attrs if attrs is not None else {}
        self.children: List["HtmlNode"] = []
        self.parent = parent
        self.text = text  # payload for non-element nodes
        self.hidden = False  # duplicated-span table cell marker (clone_cell)

    # --- predicates

    @property
    def is_element(self) -> bool:
        return self.kind == "element"

    @property
    def is_text(self) -> bool:
        return self.kind == TEXT

    @property
    def is_comment(self) -> bool:
        return self.kind == COMMENT

    @property
    def is_doctype(self) -> bool:
        return self.kind == DOCTYPE

    # --- traversal

    def iter_descendants(self) -> Iterator["HtmlNode"]:
        stack = list(reversed(self.children))
        while stack:
            node = stack.pop()
            yield node
            if node.children:
                stack.extend(reversed(node.children))

    def find_all(self, names: Union[str, frozenset, set, list, tuple]) -> List["HtmlNode"]:
        """All descendant elements with the given name(s), document order."""
        if isinstance(names, str):
            names = (names,)
        names = set(names)
        return [n for n in self.iter_descendants() if n.is_element and n.name in names]

    def get_text(self) -> str:
        """Concatenated text of all descendant text nodes (bs4 ``getText``)."""
        if self.is_text:
            return self.text
        if not self.is_element and self.kind != DOCUMENT:
            return ""
        parts: List[str] = []
        for n in self.iter_descendants():
            if n.is_text:
                parts.append(n.text)
        return "".join(parts)

    def replace_with_text(self, text: str) -> None:
        """Replace this node in its parent's children with a new text node."""
        assert self.parent is not None
        idx = self.parent.children.index(self)
        new = HtmlNode(TEXT, text=text, parent=self.parent)
        self.parent.children[idx] = new

    def get(self, attr: str, default: Optional[str] = None) -> Optional[str]:
        return self.attrs.get(attr, default)

    def __repr__(self) -> str:
        if self.is_element:
            return f"<{self.name} {self.attrs}>({len(self.children)} children)"
        return f"{self.kind}({self.text[:40]!r})"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = HtmlNode("element", name=DOCUMENT)
        self.root.kind = DOCUMENT
        self.stack: List[HtmlNode] = [self.root]
        self._pending_text: List[str] = []

    # text runs between tags coalesce into one node (convert_charrefs merges
    # entity-split runs already; we merge across comments' absence etc.)
    def _flush_text(self) -> None:
        if self._pending_text:
            parent = self.stack[-1]
            node = HtmlNode(TEXT, text="".join(self._pending_text), parent=parent)
            parent.children.append(node)
            self._pending_text = []

    def handle_starttag(self, tag: str, attrs: List) -> None:
        self._flush_text()
        parent = self.stack[-1]
        attr_dict: Dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        node = HtmlNode("element", name=tag, attrs=attr_dict, parent=parent)
        parent.children.append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: List) -> None:
        self._flush_text()
        parent = self.stack[-1]
        attr_dict: Dict[str, str] = {}
        for k, v in attrs:
            if k not in attr_dict:
                attr_dict[k] = v if v is not None else ""
        node = HtmlNode("element", name=tag, attrs=attr_dict, parent=parent)
        parent.children.append(node)

    def handle_endtag(self, tag: str) -> None:
        self._flush_text()
        if tag in VOID_ELEMENTS:
            return
        # pop to the most recent open tag of this name; ignore if absent
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].name == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._pending_text.append(data)

    def handle_comment(self, data: str) -> None:
        self._flush_text()
        parent = self.stack[-1]
        parent.children.append(HtmlNode(COMMENT, text=data, parent=parent))

    def handle_decl(self, decl: str) -> None:
        self._flush_text()
        parent = self.stack[-1]
        parent.children.append(HtmlNode(DOCTYPE, text=decl, parent=parent))

    def handle_pi(self, data: str) -> None:
        self._flush_text()

    def finish(self) -> HtmlNode:
        self._flush_text()
        return self.root


_META_CHARSET = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?([a-zA-Z0-9_\-]+)""", re.IGNORECASE)
_XML_DECL = re.compile(rb"""<\?xml[^>]+encoding\s*=\s*["']([a-zA-Z0-9_\-]+)["']""", re.IGNORECASE)


def detect_encoding(data: bytes) -> str:
    """Declared-charset-first detection (UnicodeDammit priority order)."""
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if data.startswith((b"\xff\xfe", b"\xfe\xff")):
        return "utf-16"
    head = data[:4096]
    m = _META_CHARSET.search(head) or _XML_DECL.search(head)
    if m:
        enc = m.group(1).decode("ascii", "ignore").lower()
        try:
            b"".decode(enc)
            return enc
        except LookupError:
            pass
    try:
        data.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(data).best()
        if best is not None and best.encoding:
            return best.encoding
    except Exception:
        pass
    return "latin-1"


def parse_html(data: Union[bytes, str]) -> HtmlNode:
    """Parse HTML bytes/str into a document tree (root kind ``[document]``)."""
    if isinstance(data, bytes):
        data = data.decode(detect_encoding(data), errors="replace")
    builder = _TreeBuilder()
    builder.feed(data)
    return builder.finish()
