"""Tests: PDF table recognition (tabby-parity subset)."""

from __future__ import annotations

from dedoc_ray.readers.pdf_tables import detect_tables, read_pdf_tabby
from dedoc_ray.sources.synth_office import pdf_table_bytes

TEXT = "key agg the row scan the table value"


def _pdf(ops):
    content = "\n".join(ops).encode("latin-1")
    return (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
            + b" >> stream\n" + content + b"\nendstream endobj\ntrailer\n%%EOF")


def test_grid_and_text_separation():
    doc = read_pdf_tabby(pdf_table_bytes(7, TEXT))
    assert [l.line for l in doc.lines] == ["Table doc 7\n", "footer 7\n"]
    assert len(doc.tables) == 1
    grid = [[c.get_text() for c in row] for row in doc.tables[0].cells]
    assert grid[0] == ["h0", "h1", "h2"]
    assert grid[1] == ["7r0c0", "7r0c1", "7r0c2"]
    assert len(grid) == 4  # header + 3 chunks


def test_single_tabular_row_stays_text():
    """One multi-column baseline with no coherent following row is NOT a
    table (ambiguous with spaced inline text)."""
    ops = [
        "BT /F1 12 Tf 72 760 Td (alpha) Tj ET",
        "BT /F1 12 Tf 272 760 Td (beta) Tj ET",
        "BT /F1 12 Tf 72 700 Td (plain paragraph) Tj ET",
    ]
    doc = read_pdf_tabby(_pdf(ops))
    assert doc.tables == []
    # fragments on one baseline concatenate (read_pdf_textlayer semantics)
    assert [l.line for l in doc.lines] == ["alphabeta\n", "plain paragraph\n"]


def test_two_tables_on_one_page():
    ops = []
    for base_y in (760, 600):
        for r in range(2):
            for j, x in enumerate((72, 300)):
                ops.append(f"BT /F1 10 Tf {x} {base_y - 20 * r} Td (t{base_y}r{r}c{j}) Tj ET")
        ops.append(f"BT /F1 12 Tf 72 {base_y - 60} Td (between {base_y}) Tj ET")
    doc = read_pdf_tabby(_pdf(ops))
    assert len(doc.tables) == 2
    assert [l.line for l in doc.lines] == ["between 760\n", "between 600\n"]


def test_detect_tables_keeps_row_major_order():
    ops = [
        (72.0, 760.0, "F1", 10.0, "a"), (272.0, 760.0, "F1", 10.0, "b"),
        (72.0, 740.0, "F1", 10.0, "c"), (272.0, 740.0, "F1", 10.0, "d"),
    ]
    grids, rest = detect_tables(ops)
    assert rest == []
    assert [[cell[0][4] for cell in row] for row in grids[0]] == [["a", "b"], ["c", "d"]]


def test_missing_cells_become_empty():
    ops = [
        "BT /F1 10 Tf 72 760 Td (a) Tj ET",
        "BT /F1 10 Tf 272 760 Td (b) Tj ET",
        "BT /F1 10 Tf 72 740 Td (c) Tj ET",
        "BT /F1 10 Tf 272 740 Td (d) Tj ET",
        "BT /F1 10 Tf 72 720 Td (e) Tj ET",  # row with a gap in col 2
        "BT /F1 10 Tf 272 720 Td (f) Tj ET",
        "BT /F1 10 Tf 472 720 Td (g) Tj ET",  # extra col appears later
    ]
    doc = read_pdf_tabby(_pdf(ops))
    assert len(doc.tables) == 1
    grid = [[c.get_text() for c in row] for row in doc.tables[0].cells]
    assert grid == [["a", "b", ""], ["c", "d", ""], ["e", "f", "g"]]
