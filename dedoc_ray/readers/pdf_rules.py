"""Ruled-grid table detection for born-digital PDFs.

The reference's tabby engine recognizes tables from their drawn CELL
BORDERS — horizontal/vertical ruling lines in the content stream — which
is what makes merged cells (colspan/rowspan) and multi-baseline rows
unambiguous (test_api_format_pdf_tabby_reader.test_tables_with_merged_cells).
This module implements that from scratch over the object layer:

1. ``page_rules`` scans each page's content stream for straight-line
   strokes (``x y m x y l S``) and thin filled rectangles — the two ways
   writers draw table borders;
2. ``ruled_grids`` groups intersecting rules into connected frames,
   derives row/column boundaries, infers col/rowspans from MISSING inner
   separators, and assigns text fragments to cells by position. Covered
   shadow cells are emitted invisible with span 1 (the reference's grid
   contract).

Pages without rule frames keep the band-run heuristic
(readers/pdf_tables.detect_tables). Both are page-local map work — no
cross-document state, nothing leaves the extraction actor.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

_TOL = 2.0  # coordinate tolerance for boundary clustering / intersection


def page_rules(doc, page: dict) -> Tuple[List[Tuple[float, float, float]], List[Tuple[float, float, float]]]:
    """One page → (horizontal rules, vertical rules) in DEVICE space.

    A horizontal rule is (x0, x1, y); a vertical rule is (y0, y1, x).
    Tracks the q/Q/cm graphics state, so borders drawn under a flipped or
    translated CTM (Word's ``1 0 0 -1 0 H cm``) land where the text layer
    does; both ``m/l`` strokes and thin ``re`` rectangles count."""
    cont = doc.resolve(page.get("Contents"))
    try:
        if isinstance(cont, list):
            content = b"".join(doc.stream_bytes(doc.resolve(c)) for c in cont)
        else:
            content = doc.stream_bytes(cont)
    except Exception:
        return [], []

    h: List[Tuple[float, float, float]] = []
    v: List[Tuple[float, float, float]] = []
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    stack: List[tuple] = []
    operands: List[float] = []
    cur: Optional[Tuple[float, float]] = None  # current point (untransformed)

    def apply(x: float, y: float) -> Tuple[float, float]:
        a, b, c, d, e, f = ctm
        return a * x + c * y + e, b * x + d * y + f

    def add_segment(p0, p1) -> None:
        x0, y0 = p0
        x1, y1 = p1
        if abs(y0 - y1) <= 0.5 and abs(x1 - x0) > _TOL:
            h.append((min(x0, x1), max(x0, x1), (y0 + y1) / 2))
        elif abs(x0 - x1) <= 0.5 and abs(y1 - y0) > _TOL:
            v.append((min(y0, y1), max(y0, y1), (x0 + x1) / 2))

    # string-aware walk: a regex over raw bytes would see operator
    # lookalikes INSIDE (…) string literals (text bytes are arbitrary in
    # symbolically-encoded fonts) and corrupt the q/Q stack — found the
    # hard way on example_with_table9.pdf, whose rules then surfaced in
    # the wrong coordinate space
    from dedoc_ray.readers.pdf_objects import Lexer, PdfError

    lex = Lexer(content)
    while True:
        lex.skip_ws()
        if lex.at_end():
            break
        try:
            obj = lex.parse_object()
        except PdfError:
            break
        if not (isinstance(obj, tuple) and obj and obj[0] == "kw"):
            if isinstance(obj, (int, float)):
                operands.append(float(obj))
                if len(operands) > 6:
                    operands = operands[-6:]
            else:
                operands = []
            continue
        op = obj[1]
        if op == b"q":
            stack.append(ctm)
        elif op == b"Q":
            if stack:
                ctm = stack.pop()
        elif op == b"cm" and len(operands) >= 6:
            m = operands[-6:]
            a, b, c, d, e, f = ctm
            ctm = (
                m[0] * a + m[1] * c, m[0] * b + m[1] * d,
                m[2] * a + m[3] * c, m[2] * b + m[3] * d,
                m[4] * a + m[5] * c + e, m[4] * b + m[5] * d + f,
            )
        elif op == b"m" and len(operands) >= 2:
            cur = (operands[-2], operands[-1])
        elif op == b"l" and len(operands) >= 2 and cur is not None:
            nxt = (operands[-2], operands[-1])
            add_segment(apply(*cur), apply(*nxt))
            cur = nxt
        elif op == b"re" and len(operands) >= 4:
            x, y, w, hh = operands[-4:]
            p0 = apply(x, y)
            p1 = apply(x + w, y + hh)
            rx0, rx1 = min(p0[0], p1[0]), max(p0[0], p1[0])
            ry0, ry1 = min(p0[1], p1[1]), max(p0[1], p1[1])
            if 0 <= ry1 - ry0 <= 2.0 and rx1 - rx0 > _TOL:
                h.append((rx0, rx1, (ry0 + ry1) / 2))
            elif 0 <= rx1 - rx0 <= 2.0 and ry1 - ry0 > _TOL:
                v.append((ry0, ry1, (rx0 + rx1) / 2))
        operands = []
    return h, v


def _cluster(values: List[float]) -> List[float]:
    out: List[float] = []
    for val in sorted(values):
        if out and abs(out[-1] - val) <= _TOL:
            continue
        out.append(val)
    return out


def _components(h, v):
    """Union-find over rules by intersection → list of (h_rules, v_rules)."""
    rules = [("h", r) for r in h] + [("v", r) for r in v]
    parent = list(range(len(rules)))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        parent[find(a)] = find(b)

    for i, (kind_i, ri) in enumerate(rules):
        if kind_i != "h":
            continue
        hx0, hx1, hy = ri
        for j, (kind_j, rj) in enumerate(rules):
            if kind_j != "v":
                continue
            vy0, vy1, vx = rj
            if hx0 - _TOL <= vx <= hx1 + _TOL and vy0 - _TOL <= hy <= vy1 + _TOL:
                union(i, j)
    # writers that draw each CELL as its own box never cross rules — abutting
    # PARALLEL borders (same coordinate, overlapping extent) connect the
    # lattice instead
    for i in range(len(rules)):
        kind_i, (a0, a1, ac) = rules[i]
        for j in range(i + 1, len(rules)):
            kind_j, (b0, b1, bc) = rules[j]
            if kind_i == kind_j and abs(ac - bc) <= _TOL and a0 - _TOL <= b1 and b0 - _TOL <= a1:
                union(i, j)
    groups: Dict[int, Tuple[list, list]] = {}
    for i, (kind, r) in enumerate(rules):
        g = groups.setdefault(find(i), ([], []))
        (g[0] if kind == "h" else g[1]).append(r)
    comps = [g for g in groups.values() if len(g[0]) >= 2 and len(g[1]) >= 2]

    # frames drawn twice (inner + outer borders) form DISJOINT components
    # over the same area — merge components whose bounding boxes overlap,
    # else the same table extracts twice
    def bbox(comp):
        hs, vs = comp
        return (
            min(r[0] for r in hs), max(r[1] for r in hs),
            min(r[0] for r in vs), max(r[1] for r in vs),
        )

    merged: List[Tuple[list, list]] = []
    boxes: List[tuple] = []
    for comp in sorted(comps, key=lambda c: -(bbox(c)[1] - bbox(c)[0])):
        x0, x1, y0, y1 = bbox(comp)
        hit = None
        for k, (bx0, bx1, by0, by1) in enumerate(boxes):
            ox = min(x1, bx1) - max(x0, bx0)
            oy = min(y1, by1) - max(y0, by0)
            if ox > 0 and oy > 0 and ox * oy >= 0.5 * (x1 - x0) * (y1 - y0):
                hit = k
                break
        if hit is None:
            merged.append(([*comp[0]], [*comp[1]]))
            boxes.append((x0, x1, y0, y1))
        else:
            merged[hit][0].extend(comp[0])
            merged[hit][1].extend(comp[1])
            bx0, bx1, by0, by1 = boxes[hit]
            boxes[hit] = (min(bx0, x0), max(bx1, x1), min(by0, y0), max(by1, y1))
    return merged


def ruled_grids(h_rules, v_rules, page_ops, line_tol: float = 4.0):
    """→ (grids, used_op_ids). Each grid is a list of rows of cell dicts
    {"ops": [...], "colspan": k, "rowspan": k, "invisible": bool}; ops of
    cells inside a frame are claimed (callers route the rest elsewhere)."""
    grids = []
    used: set = set()
    for hs, vs in _components(h_rules, v_rules):
        ys = _cluster([r[2] for r in hs])[::-1]  # top → bottom (desc)
        xs = _cluster([r[2] for r in vs])
        if len(ys) < 2 or len(xs) < 2:
            continue
        n_rows, n_cols = len(ys) - 1, len(xs) - 1

        def v_sep(ci: int, ri: int) -> bool:
            """A vertical separator at boundary x=xs[ci] crossing row ri?"""
            y_top, y_bot = ys[ri], ys[ri + 1]
            mid = (y_top + y_bot) / 2
            return any(abs(r[2] - xs[ci]) <= _TOL and r[0] - _TOL <= mid <= r[1] + _TOL for r in vs)

        def h_sep(ri: int, ci: int) -> bool:
            """A horizontal separator at boundary y=ys[ri] crossing col ci?"""
            x0, x1 = xs[ci], xs[ci + 1]
            mid = (x0 + x1) / 2
            return any(abs(r[2] - ys[ri]) <= _TOL and r[0] - _TOL <= mid <= r[1] + _TOL for r in hs)

        covered = [[False] * n_cols for _ in range(n_rows)]
        grid = [[None] * n_cols for _ in range(n_rows)]
        for ri in range(n_rows):
            for ci in range(n_cols):
                if covered[ri][ci]:
                    continue
                colspan = 1
                while ci + colspan < n_cols and not v_sep(ci + colspan, ri):
                    colspan += 1
                rowspan = 1
                while ri + rowspan < n_rows and not all(
                    h_sep(ri + rowspan, c) for c in range(ci, ci + colspan)
                ):
                    rowspan += 1
                for r2 in range(ri, ri + rowspan):
                    for c2 in range(ci, ci + colspan):
                        covered[r2][c2] = True
                        if (r2, c2) != (ri, ci):
                            grid[r2][c2] = {"ops": [], "colspan": 1, "rowspan": 1, "invisible": True}
                grid[ri][ci] = {"ops": [], "colspan": colspan, "rowspan": rowspan, "invisible": False}

        # assign text fragments to the visible cell whose area contains them
        x_min, x_max, y_min, y_max = xs[0], xs[-1], ys[-1], ys[0]
        for idx, op in enumerate(page_ops):
            x, y = op[0], op[1]
            if not (x_min - _TOL <= x <= x_max + _TOL and y_min - _TOL <= y <= y_max + _TOL):
                continue
            ri = next((i for i in range(n_rows) if ys[i] + line_tol >= y > ys[i + 1]), None)
            ci = next((i for i in range(n_cols) if xs[i] - _TOL <= x < xs[i + 1]), None)
            if ri is None or ci is None:
                continue
            # walk to the visible owner of a covered position
            cell = grid[ri][ci]
            if cell["invisible"]:
                owner = next(
                    ((r2, c2) for r2 in range(ri, -1, -1) for c2 in range(ci, -1, -1)
                     if not grid[r2][c2]["invisible"]
                     and r2 + grid[r2][c2]["rowspan"] > ri and c2 + grid[r2][c2]["colspan"] > ci),
                    None,
                )
                if owner is None:
                    continue
                cell = grid[owner[0]][owner[1]]
            cell["ops"].append(op)
            used.add(idx)
        grids.append((ys[0], ys[-1], xs[0], xs[-1], grid))
    grids.sort(key=lambda t: -t[0])  # top table first
    return grids, used
