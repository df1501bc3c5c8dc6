"""HTML tag taxonomy — same tag classes as the reference
(dedoc/readers/html_reader/html_tags.py:1-35)."""

SERVICE_TAGS = frozenset({"script", "style"})

LIST_ITEMS = ("li", "dd", "dt")
BLOCK_TAGS = frozenset(
    ["aside", "article", "body", "div", "blockquote", "footer", "header", "html", "main", "nav", "section", "form", *LIST_ITEMS]
)
UNORDERED_LIST = frozenset({"ul", "dl", "dir"})
ORDERED_LIST = frozenset({"ol"})
LIST_TAGS = UNORDERED_LIST | ORDERED_LIST
HEADER_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

STRIKE_TAGS = frozenset({"del", "strike", "s"})
BOLD_TAGS = frozenset({"strong", "b"})
UNDERLINED_TAGS = frozenset({"ins", "u"})
ITALIC_TAGS = frozenset({"em", "i", "dfn", "var", "address"})
SUBSCRIPT_TAGS = frozenset({"sub"})
SUPERSCRIPT_TAGS = frozenset({"sup"})
LINK_TAGS = frozenset({"a"})

PARAGRAPHS = frozenset({"p"}) | BLOCK_TAGS | set(LIST_ITEMS) | HEADER_TAGS

STYLED_TAGS = BOLD_TAGS | ITALIC_TAGS | UNDERLINED_TAGS | STRIKE_TAGS | SUPERSCRIPT_TAGS | SUBSCRIPT_TAGS
SIMPLE_TEXT_TAGS = frozenset(
    [
        "a", "abbr", "acronym", "applet", "area", "article", "aside", "bdi", "bdo", "big", "canvas", "caption",
        "center", "cite", "code", "data", "font", "kbd", "mark", "output", "p", "pre", "q", "samp", "small",
        "span", "tt", "wbr",
    ]
)
TEXT_TAGS = SIMPLE_TEXT_TAGS | STYLED_TAGS

TABLE_TAGS = frozenset({"table"})
TABLE_ROWS = frozenset({"tr"})
TABLE_CELLS = frozenset({"td", "th"})

SPECIAL_SYMBOL_TAGS = {"br": "\n"}

AVAILABLE_TAGS = frozenset(BLOCK_TAGS | LIST_TAGS | HEADER_TAGS | TEXT_TAGS | set(SPECIAL_SYMBOL_TAGS) | PARAGRAPHS)
