"""PDF table recognition over the text layer — the tabby-parity subset.

The reference's PdfTabbyReader ships a Java jar that extracts both lines
and tables from born-digital PDFs (dedoc/readers/pdf_reader/
pdf_tabby_reader/pdf_tabby_reader.py:19-383). No JVM exists here, so this
module implements the geometric core natively over our own text-op parse:

- cluster op x-starts into column bands (tolerance-merged),
- a table region = >=2 consecutive baselines whose ops populate >=2 shared
  column bands (grid coherence),
- ops inside a region become a row-major cell grid (y desc, x asc);
  everything else stays ordinary text lines.

Same contract as the reference: an UnstructuredDocument whose ``tables``
carry the recognized grids and whose ``lines`` exclude table content.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import List, Tuple

from dedoc_ray.core.annotation import Annotation, AnnotationNames as AN
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.pdf import _BT_RE, _STREAM_RE, _group_lines, _iter_text_ops, build_line_annotations

Op = Tuple[float, float, str, float, str]

_X_TOL = 3.0  # pt: ops within this x distance share a column band
_LINE_TOL = 2.0  # pt: ops within this y distance share a baseline


def _cluster(values: List[float], tol: float) -> List[float]:
    """Sorted 1-D cluster centers (single-linkage with ``tol``)."""
    centers: List[float] = []
    for v in sorted(values):
        if centers and v - centers[-1] <= tol:
            continue
        centers.append(v)
    return centers


def _band_of(x: float, bands: List[float], tol: float) -> int:
    for i, c in enumerate(bands):
        if abs(x - c) <= tol:
            return i
    return -1


def detect_tables(page_ops: List[Op]) -> Tuple[List[List[List[Op]]], List[Op]]:
    """Split a page's ops into (table grids, remaining text ops).

    A grid is rows (y desc) of cell-op lists (x asc). Two refinements over
    the plain band-run rule (both pinned by the reference's VVP fixtures,
    test_api_format_pdf_tabby_reader.test_pdf_with_tables):

    - a single-band row BETWEEN grid rows is a wrapped-cell continuation
      ("Ненефтегазов / ые доходы") — its ops fold into the previous grid
      row's cell instead of breaking the region;
    - adjacent same-page regions with equal arity and NO text between them
      are one visual table split by the band-run heuristic — coalesce.
      Captions between real adjacent tables land in ``rest`` and block
      the merge, so separate tables stay separate.
    """
    # baselines top→bottom
    rows: List[List[Op]] = []
    for op in sorted(page_ops, key=lambda t: (-t[1], t[0])):
        if rows and abs(rows[-1][0][1] - op[1]) <= _LINE_TOL:
            rows[-1].append(op)
        else:
            rows.append([op])

    bands = _cluster([op[0] for op in page_ops], _X_TOL)
    # a row is "tabular" if it populates >=2 column bands
    row_bands = []
    for row in rows:
        used = {_band_of(op[0], bands, _X_TOL) for op in row}
        used.discard(-1)
        row_bands.append(used)

    grids: List[List[List[Op]]] = []
    spans: List[Tuple[float, float]] = []  # (y_top, y_bottom) per grid
    rest: List[Op] = []
    i = 0
    while i < len(rows):
        if len(row_bands[i]) >= 2:
            region_bands_set = set(row_bands[i])
            members: List[Tuple[int, bool]] = [(i, False)]  # (row idx, is_continuation)
            row_gaps: List[float] = []  # pitch between accepted grid rows
            j = i + 1
            while j < len(rows):
                gap = rows[j - 1][0][1] - rows[j][0][1]
                if len(row_bands[j] & region_bands_set) >= 2:
                    # a vertical gap far above the row pitch separates two
                    # stacked tables even when their bands overlap
                    # (reference example.pdf: 6-col grid then 3-col grid)
                    if row_gaps and gap > 2.2 * (sum(row_gaps) / len(row_gaps)):
                        break
                    region_bands_set |= row_bands[j]
                    members.append((j, False))
                    if not members[-2][1]:  # previous member was a full row
                        row_gaps.append(gap)
                    j += 1
                    continue
                # wrapped-cell continuation: single-band row TIGHTER than the
                # row pitch (a caption between adjacent tables sits at a
                # larger gap and must break the region instead)
                if (
                    row_bands[j]
                    and row_bands[j] <= region_bands_set
                    and j + 1 < len(rows)
                    and len(row_bands[j + 1] & region_bands_set) >= 2
                    and row_gaps
                    and gap <= 0.8 * (sum(row_gaps) / len(row_gaps))
                ):
                    members.append((j, True))
                    j += 1
                    continue
                break
            if sum(1 for _, cont in members if not cont) >= 2:
                region_bands = sorted(region_bands_set)
                grid: List[List[List[Op]]] = []
                for idx, cont in members:
                    if cont and grid:
                        target = grid[-1]
                    else:
                        target = [[] for _ in region_bands]
                        grid.append(target)
                    for op in sorted(rows[idx], key=lambda t: t[0]):
                        b = _band_of(op[0], bands, _X_TOL)
                        k = region_bands.index(b) if b in region_bands else 0
                        target[k].append(op)
                grids.append(grid)
                spans.append((rows[i][0][1], rows[members[-1][0]][0][1]))
                i = j
                continue
        rest.extend(rows[i])
        i += 1

    # coalesce adjacent equal-arity regions with no text between
    merged_grids: List[List[List[Op]]] = []
    merged_spans: List[Tuple[float, float]] = []
    for grid, (top, bottom) in zip(grids, spans):
        if (
            merged_grids
            and len(grid[0]) == len(merged_grids[-1][0])
            and not any(top < op[1] < merged_spans[-1][1] for op in rest)
        ):
            merged_grids[-1].extend(grid)
            merged_spans[-1] = (merged_spans[-1][0], bottom)
        else:
            merged_grids.append(grid)
            merged_spans.append((top, bottom))
    return merged_grids, rest


def _resolve_ruled_anchors(todo, rest, page_lines, page_first_line_id, prev_page_ctx) -> None:
    """Ruled-table anchoring: the nearest text FRAGMENT above the frame top
    with x-overlap (the same-column line just above the table — the
    reference annotates the table onto that fragment's span,
    test_api_module_table_recognizer.test_tables_annotations). A table at
    the very top of its page anchors to the SAME-COLUMN fragment closest
    to the PREVIOUS page's bottom ('line' for two_column_document's
    page-2 table)."""

    def find(ops, lines_, first_id, pred):
        best = None
        for op in ops:
            ox, oy, otext = op[0], op[1], op[4]
            if pred(oy) and otext.strip():
                if best is None or oy < best[0]:
                    best = (oy, otext)
        if best is None:
            return None
        for idx, (_lx, ly, _f, _s, ltxt) in enumerate(lines_):
            if abs(ly - best[0]) <= _LINE_TOL and best[1] in ltxt:
                return first_id + idx, best[1]
        return None

    for t, top, gx0, gx1 in todo:
        in_band = lambda ox: gx0 - 6.0 <= ox <= gx1  # noqa: E731

        hit = find(
            [op for op in rest if in_band(op[0])],
            page_lines, page_first_line_id, lambda oy: oy > top + 1.0,
        )
        if hit is None and prev_page_ctx is not None:
            p_rest, p_lines, p_first = prev_page_ctx
            hit = find(
                [op for op in p_rest if in_band(op[0])],
                p_lines, p_first, lambda oy: True,
            )
        if hit is None:
            if page_first_line_id > 0:
                t.order = page_first_line_id - 1
            continue
        t.order, t.anchor_text = hit


def read_pdf_tabby(data: bytes, pages: tuple = (0, None)) -> UnstructuredDoc:
    """Text lines + recognized tables from a born-digital PDF.

    Files with a usable document structure go through the real object
    layer + char interpreter (readers/pdf_objects, readers/pdf_text) — the
    assembled line FRAGMENTS (split at char_margin gaps, so each table
    cell is one fragment with its true x0) feed the same geometric grid
    detector; bare-stream files keep the legacy op scan."""
    if data[:5] != b"%PDF-":
        raise ValueError("not a PDF")
    page_start, page_stop = pages
    file_hash = hashlib.md5(data).hexdigest()
    lines: List[LineWithMeta] = []
    tables: List[Table] = []
    line_id = 0
    page_id = 0
    saw_text = False

    per_page: List[List[Op]] = []
    per_page_rules: Optional[list] = None
    try:
        from dedoc_ray.readers.pdf import _structured_page_items

        structured, _rot = _structured_page_items(data)
    except Exception as e:
        if "encrypted" in str(e).lower():
            raise ValueError("PDF is encrypted (no-password decryption unsupported)")
        structured = None
    if structured is not None:
        # rotated pages arrive as raw ops, upright ones as fragments —
        # both are the Op 5-tuple shape the grid detector consumes
        per_page = [items for _assembled, items in structured]
        try:
            from dedoc_ray.readers.pdf_objects import PdfDocument
            from dedoc_ray.readers.pdf_rules import page_rules

            doc_obj = PdfDocument(data)
            per_page_rules = [page_rules(doc_obj, page) for page in doc_obj.pages()]
        except Exception:
            per_page_rules = None
    else:
        for stream_m in _STREAM_RE.finditer(data):
            payload = stream_m.group(1)
            try:
                payload = zlib.decompress(payload)
            except zlib.error:
                pass
            blocks = _BT_RE.findall(payload)
            if not blocks:
                continue
            page_ops: List[Op] = []
            for block in blocks:
                page_ops.extend(op for op in _iter_text_ops(block) if op[4])
            per_page.append(page_ops)

    def _cell_text_ops(cell_ops: List[Op]) -> str:
        by_line: List[List[Op]] = []
        for op in sorted(cell_ops, key=lambda t: (-t[1], t[0])):
            if by_line and abs(by_line[-1][0][1] - op[1]) <= _LINE_TOL:
                by_line[-1].append(op)
            else:
                by_line.append([op])
        return "\n".join(re.sub(r" {2,}", " ", " ".join(t for t in (op[4].strip() for op in seg) if t)) for seg in by_line)

    # previous page's (rest ops, merged lines, first line_id) — cross-page
    # anchor fallback for top-of-page ruled tables
    prev_page_ctx: Optional[tuple] = None
    for page_ops in per_page:
        if not page_ops:
            page_id += 1
            continue
        if page_id < page_start or (page_stop is not None and page_id >= page_stop):
            page_id += 1
            saw_text = True
            continue
        # RULED grids first (drawn cell borders give exact rows + merged
        # cells — readers/pdf_rules.py); leftover text falls through to the
        # band-run heuristic below
        ruled_anchor_todo: List[tuple] = []
        if per_page_rules is not None and page_id < len(per_page_rules):
            hs, vs = per_page_rules[page_id]
        else:
            hs, vs = [], []
        if hs and vs:
            from dedoc_ray.readers.pdf_rules import ruled_grids

            rgrids, used = ruled_grids(hs, vs, page_ops)
            leftover = [op for i, op in enumerate(page_ops) if i not in used]
            # same-page coalescing (as in detect_tables): adjacent ruled
            # grids with equal arity and NO text between are one table the
            # writer drew in repeated frames
            merged_rg: List[tuple] = []
            for top, bottom, gx0, gx1, grid in rgrids:
                if (
                    merged_rg
                    and grid
                    and merged_rg[-1][4]
                    and len(grid[0]) == len(merged_rg[-1][4][0])
                    and not any(top < op[1] < merged_rg[-1][1] for op in leftover)
                ):
                    prev_top, _, px0, px1, prev_grid = merged_rg[-1]
                    prev_grid.extend(grid)
                    merged_rg[-1] = (prev_top, bottom, min(px0, gx0), max(px1, gx1), prev_grid)
                else:
                    merged_rg.append((top, bottom, gx0, gx1, list(grid)))
            for _top, _bottom, _gx0, _gx1, grid in merged_rg:
                texts = [[_cell_text_ops(cell["ops"]) for cell in row] for row in grid]
                if not any(t for row in texts for t in row):
                    # a frame that claimed NO text is a coordinate-space
                    # mismatch or decoration — never emit an empty table
                    continue
                # shadow cells repeat the spanning owner's text (reference
                # grid contract — _get_text_of_row shows the merged text in
                # every covered position)
                for ri, row in enumerate(grid):
                    for ci, cell in enumerate(row):
                        if cell["invisible"]:
                            continue
                        for r2 in range(ri, min(ri + cell["rowspan"], len(grid))):
                            for c2 in range(ci, min(ci + cell["colspan"], len(row))):
                                if (r2, c2) != (ri, ci):
                                    texts[r2][c2] = texts[ri][ci]
                cells = []
                for row, trow in zip(grid, texts):
                    out_row = []
                    for cell, text in zip(row, trow):
                        out_row.append(CellWithMeta(
                            [LineWithMeta(text)] if text else [],
                            colspan=cell["colspan"], rowspan=cell["rowspan"],
                            invisible=cell["invisible"],
                        ))
                    cells.append(out_row)
                if cells:
                    saw_text = True
                    t = Table(cells, page_id=page_id,
                              uid=f"tabby_{file_hash}_{len(tables)}",
                              order=line_id, ruled=True)
                    tables.append(t)
                    # anchor after the page's lines exist: the nearest line
                    # ABOVE the frame top with x-overlap (reference links
                    # the table annotation to the preceding column line)
                    ruled_anchor_todo.append((t, _top, _gx0, _gx1))
            page_ops = leftover
            if not page_ops:
                _resolve_ruled_anchors(
                    ruled_anchor_todo, [], [], line_id, prev_page_ctx
                )
                prev_page_ctx = ([], [], line_id)
                page_id += 1
                continue
        if ruled_anchor_todo:
            # this page's writer DRAWS borders around its tables, so the
            # band-run heuristic on the leftover text would only produce
            # layout artifacts (2-column body text) — reference keeps
            # exactly the 3 ruled tables of two_column_document.pdf and
            # none of its text columns
            grids, rest = [], page_ops
        else:
            grids, rest = detect_tables(page_ops)
        for grid in grids:
            cells = []
            for row in grid:
                out_row = []
                for cell_ops in row:
                    # fragments on one baseline join with spaces; wrapped
                    # lines join with \n (reference cell text
                    # "Ненефтегазов\nые доходы")
                    by_line: List[List[Op]] = []
                    for op in cell_ops:
                        if by_line and abs(by_line[-1][0][1] - op[1]) <= _LINE_TOL:
                            by_line[-1].append(op)
                        else:
                            by_line.append([op])
                    text = "\n".join(re.sub(r" {2,}", " ", " ".join(t for t in (op[4].strip() for op in seg) if t)) for seg in by_line)
                    out_row.append(CellWithMeta([LineWithMeta(text)] if text else []))
                cells.append(out_row)
            tables.append(Table(cells, page_id=page_id, uid=f"tabby_{file_hash}_{len(tables)}",
                                order=line_id))
        page_lines = _group_lines(rest)
        _resolve_ruled_anchors(ruled_anchor_todo, rest, page_lines, line_id, prev_page_ctx)
        prev_page_ctx = (rest, page_lines, line_id)
        gaps = [round(a[1] - b[1]) for a, b in zip(page_lines, page_lines[1:])]
        median_gap = sorted(gaps)[len(gaps) // 2] if gaps else 0
        col_x0 = min((g[0] for g in page_lines), default=0.0)
        prev_y = None
        for x, y, font, size, text in page_lines:
            saw_text = True
            gap = round(prev_y - y) if prev_y is not None else median_gap
            prev_y = y
            # same annotation set as the txtlayer route (reference tabby
            # lines carry bold/spacing/bbox too, test_pdf_annotations)
            annotations = build_line_annotations(
                x, y, font, size, text, (), gap, median_gap, col_x0
            )
            metadata = LineMetadata(page_id=page_id, line_id=line_id, tag_hierarchy_level=HierarchyLevel.create_unknown())
            lines.append(LineWithMeta(text + "\n", metadata=metadata, annotations=annotations,
                                      uid=f"pdf_{file_hash}_{line_id}"))
            line_id += 1
        page_id += 1
    if not saw_text and not tables:
        raise ValueError("PDF has no text layer (OCR path not available)")
    return UnstructuredDoc(lines=lines, tables=tables, warnings=[f"pdf pages: {page_id}"])
