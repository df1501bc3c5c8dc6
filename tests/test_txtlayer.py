"""Txtlayer-correctness classifier: accuracy bar + routing behavior."""

import numpy as np

from dedoc_ray.readers.txtlayer import TxtlayerClassifier, txtlayer_features


def test_accuracy_on_labeled_synthetic_set():
    """Same bar as the reference model (BASELINE acc 0.9535 → require ≥0.95)
    on a freshly-generated corpus with a DIFFERENT seed than training."""
    import scripts.train_txtlayer as tt

    rng = np.random.RandomState(123)
    clf = TxtlayerClassifier()
    texts = [(tt.make_positive(rng), True) for _ in range(300)]
    texts += [(tt.make_negative(rng), False) for _ in range(300)]
    acc = sum(clf.is_correct(t) == label for t, label in texts) / len(texts)
    assert acc >= 0.95, f"txtlayer accuracy {acc:.3f} < 0.95"


def test_obvious_cases():
    clf = TxtlayerClassifier()
    assert clf.is_correct("This is a perfectly ordinary paragraph of english text with words.")
    assert clf.is_correct("Отчет о работе системы за прошлый год показал хорошие результаты анализа.")
    assert not clf.is_correct("(cid:12)(cid:44)(cid:98)(cid:3)(cid:51)(cid:12)(cid:44)")
    assert not clf.is_correct("\x01\x02\x03\x14\x15" * 40)
    assert not clf.is_correct("")


def test_features_deterministic():
    t = "Sample text 123 with punctuation!"
    assert txtlayer_features(t) == txtlayer_features(t)
    assert len(txtlayer_features(t)) == 16


def test_pdf_auto_routes_garbage_layer_to_ocr_stub():
    from dedoc_ray.readers.pdf import read_pdf_auto

    # a structurally-valid PDF whose text layer is cid soup
    garbage = " ".join(f"(cid:{i % 97})" for i in range(120)).replace("(", r"\(").replace(")", r"\)")
    content = f"BT /F1 12 Tf 72 720 Td ({garbage}) Tj ET".encode()
    pdf = (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
           + b" >> stream\n" + content + b"\nendstream endobj\ntrailer\n%%EOF")
    doc = read_pdf_auto(pdf)
    assert doc.lines == []
    assert any("classified incorrect" in w for w in doc.warnings)


# ------------------------------------------------------- page rotation


def _pdf_with_rotation(lines_xy, rotate=None, w=612, h=792):
    """One-page PDF with explicit (x, y, text) ops and optional /Rotate."""
    ops = []
    for x, y, text in lines_xy:
        safe = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"BT /F1 12 Tf {x} {y} Td ({safe}) Tj ET")
    content = "\n".join(ops).encode("latin-1")
    rot = f" /Rotate {rotate}" if rotate else ""
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        (f"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 {w} {h}]{rot} "
         f"/Contents 4 0 R >> endobj").encode(),
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n"
        + content + b"\nendstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def test_pdf_rotate_180_restores_reading_order():
    from dedoc_ray.readers.pdf import read_pdf_textlayer

    display = [(72, 760, "first line"), (72, 746, "second line"), (72, 732, "third line")]
    upright = read_pdf_textlayer(_pdf_with_rotation(display))
    want = [l.line for l in upright.lines]

    # write the same display layout into a /Rotate 180 page: media coords
    # are the 180-flip of display coords
    flipped = [(612 - x, 792 - y, t) for x, y, t in display]
    rotated = read_pdf_textlayer(_pdf_with_rotation(flipped, rotate=180))
    assert [l.line for l in rotated.lines] == want
    assert any("rotated 180" in w for w in rotated.warnings)


def test_pdf_rotate_90_restores_reading_order():
    from dedoc_ray.readers.pdf import read_pdf_textlayer

    display = [(72, 760, "alpha"), (72, 746, "beta"), (72, 732, "gamma")]
    upright = read_pdf_textlayer(_pdf_with_rotation(display))
    want = [l.line for l in upright.lines]

    # /Rotate 90 display (x_d, y_d) comes from media (x, y) via
    # x_d = y, y_d = w - x  =>  media x = w - y_d, media y = x_d
    media = [(612 - y, x, t) for x, y, t in display]
    rotated = read_pdf_textlayer(_pdf_with_rotation(media, rotate=90))
    assert [l.line for l in rotated.lines] == want
    assert any("rotated 90" in w for w in rotated.warnings)


def test_pdf_unrotated_has_no_rotation_warning():
    from dedoc_ray.readers.pdf import read_pdf_textlayer

    doc = read_pdf_textlayer(_pdf_with_rotation([(72, 760, "plain")]))
    assert not any("rotated" in w for w in doc.warnings)


def test_homoglyph_garbage_detected():
    # english_doc_bad_text.pdf shape: Latin text misread via Cyrillic
    # homoglyphs — the word-level script-coherence features catch it
    from dedoc_ray.readers.txtlayer import TxtlayerClassifier

    c = TxtlayerClassifier()
    assert not c.is_correct("ТНЕ СВЕАТ ЕМСТ1$Н РОСОМЕМТ 1) Е15т${ Нет мВ зоте еп 1$В {ехт " * 4)
    assert c.is_correct("Обычный русский текст про результаты анализа данных и метод работы. " * 3)
    assert c.is_correct("Plain english sentence about data analysis results and methods. " * 3)


def test_real_fixture_layers_classified_correctly():
    """Sweep every born-digital reference PDF through the classifier: all
    correct text layers accepted (prose, digit-only table columns, rotated
    single-letter cell layers, identifier-dense style samplers), the one
    garbage layer (english_doc_bad_text: Cyrillic homoglyph mojibake)
    rejected. These real files are exactly the shapes round-2's
    synthetic-only training misrouted."""
    import glob
    import os

    from dedoc_ray.readers.pdf import read_pdf_textlayer

    DATA = "/root/reference/tests/data"
    clf = TxtlayerClassifier()
    got_reject = []
    checked = 0
    for rel in ("pdf_with_text_layer/*.pdf", "pdf_auto/*.pdf", "tables/*.pdf"):
        for path in sorted(glob.glob(os.path.join(DATA, rel))):
            try:
                doc = read_pdf_textlayer(open(path, "rb").read())
            except ValueError:
                continue  # scanned fixtures with no text layer
            text = "".join(line.line for line in doc.lines)
            if not text:
                continue
            checked += 1
            if not clf.is_correct(text):
                got_reject.append(os.path.basename(path))
    assert checked >= 25  # the sweep actually covered the corpus
    assert got_reject == ["english_doc_bad_text.pdf"]
