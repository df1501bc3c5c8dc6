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
    assert len(txtlayer_features(t)) == 10


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
