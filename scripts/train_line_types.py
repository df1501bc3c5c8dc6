"""Train the law line-type and fintoc title classifiers; print weights.

Synthetic labeled corpora with FORMAT VARIATION the strict skeleton regexes
in structure/domain.py do not cover (abbreviations "Ст. 5"/"Art. 5",
uppercase "ARTICLE 5.", roman sections) — the trained layer's job is
robustness to those variants. Multinomial / binary logistic regression in
plain numpy; weights are committed into structure/ml_classifier.py.
Run: python scripts/train_line_types.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dedoc_ray.structure.line_features import FEATURE_NAMES, line_features

LAW_CLASSES = ["raw_text", "part", "section", "chapter", "article", "item", "subitem"]

_BODY_WORDS = ("the provision applies to all persons and organizations regulated by this "
               "act subject to the conditions described below including special cases").split()
_RU_BODY = ("положение применяется ко всем лицам и организациям в соответствии с настоящим "
            "законом при соблюдении указанных условий включая особые случаи").split()


def _body(rng, n=None) -> str:
    words = _BODY_WORDS if rng.rand() < 0.5 else _RU_BODY
    n = n or rng.randint(6, 18)
    return " ".join(words[rng.randint(len(words))] for _ in range(n))


_TITLES_RU = ["Общие положения", "Порядок применения", "Заключительные нормы", "Определения"]
_TITLES_EN = ["General Provisions", "Scope of Application", "Final Clauses", "Definitions"]


def _maybe_title(rng, line: str) -> str:
    """Real headers often carry a short title after the number."""
    if rng.rand() < 0.5:
        pool = _TITLES_RU if rng.rand() < 0.5 else _TITLES_EN
        return f"{line} {pool[rng.randint(len(pool))]}"
    return line


def law_doc(rng) -> tuple:
    """One synthetic law document → (lines, labels)."""
    lines, labels = [], []
    part_forms = ["Часть {n}", "Ч. {n}", "Part {n}", "PART {n}"]
    sec_forms = ["Раздел {n}", "Разд. {n}", "Section {n}", "Sec. {n}", "SECTION {n}"]
    chap_forms = ["Глава {n}", "Гл. {n}", "Chapter {n}", "Chap. {n}", "CHAPTER {n}"]
    art_forms = ["Статья {n}.", "Ст. {n}.", "Article {n}", "Art. {n}.", "ARTICLE {n}"]
    for p in range(1, rng.randint(2, 4)):
        lines.append(_maybe_title(rng, part_forms[rng.randint(len(part_forms))].format(n=p)))
        labels.append("part")
        for s in range(1, rng.randint(2, 4)):
            lines.append(_maybe_title(rng, sec_forms[rng.randint(len(sec_forms))].format(n=s)))
            labels.append("section")
            for c in range(1, rng.randint(2, 4)):
                lines.append(_maybe_title(rng, chap_forms[rng.randint(len(chap_forms))].format(n=c)))
                labels.append("chapter")
                for a in range(1, rng.randint(2, 5)):
                    lines.append(_maybe_title(rng, art_forms[rng.randint(len(art_forms))].format(n=a)))
                    labels.append("article")
                    for i in range(1, rng.randint(1, 4) + 1):
                        lines.append(f"{i}. {_body(rng, rng.randint(4, 10))}")
                        labels.append("item")
                        if rng.rand() < 0.4:
                            lines.append(f"{rng.randint(1, 9)}) {_body(rng, rng.randint(3, 8))}")
                            labels.append("subitem")
                    lines.append(_body(rng))
                    labels.append("raw_text")
    return lines, labels


def fintoc_doc(rng) -> tuple:
    """Financial-report-like document → (lines, is_title labels)."""
    lines, labels = [], []
    title_forms = ["{n}. {t}", "{n}.{m} {t}", "{T}", "{t}"]
    topics = ["Financial Statements", "Risk Factors", "Corporate Governance",
              "Notes to the Accounts", "Independent Auditor's Report", "Strategic Review"]
    for s in range(1, rng.randint(4, 8)):
        topic = topics[rng.randint(len(topics))]
        form = title_forms[rng.randint(len(title_forms))]
        lines.append(form.format(n=s, m=rng.randint(1, 5), t=topic, T=topic.upper()))
        labels.append(1)
        for _ in range(rng.randint(2, 5)):
            lines.append(_body(rng, rng.randint(12, 25)))
            labels.append(0)
    return lines, labels


def _train_softmax(X, y, n_classes, epochs=12000, lr=2.0):
    n, d = X.shape
    W = np.zeros((n_classes, d))
    b = np.zeros(n_classes)
    Y = np.eye(n_classes)[y]
    for _ in range(epochs):
        z = X @ W.T + b
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - Y) / n
        W -= lr * (g.T @ X)
        b -= lr * g.sum(axis=0)
    return W, b


def main() -> None:
    rng = np.random.RandomState(0)

    lines, labels = [], []
    for _ in range(60):
        ls, lb = law_doc(rng)
        lines.append(ls)
        labels.append(lb)
    X = np.vstack([line_features(ls) for ls in lines])
    y = np.array([LAW_CLASSES.index(t) for lb in labels for t in lb])
    n_train = int(0.8 * len(y))
    W, b = _train_softmax(X[:n_train], y[:n_train], len(LAW_CLASSES))
    acc = ((X[n_train:] @ W.T + b).argmax(axis=1) == y[n_train:]).mean()
    print(f"law heldout acc: {acc:.4f}  ({len(y)} lines, {len(FEATURE_NAMES)} features)")

    flines, flabels = [], []
    for _ in range(80):
        ls, lb = fintoc_doc(rng)
        flines.append(ls)
        flabels.append(lb)
    FX = np.vstack([line_features(ls) for ls in flines])
    fy = np.array([t for lb in flabels for t in lb])
    fn = int(0.8 * len(fy))
    FW, Fb = _train_softmax(FX[:fn], fy[:fn], 2)
    facc = ((FX[fn:] @ FW.T + Fb).argmax(axis=1) == fy[fn:]).mean()
    print(f"fintoc heldout acc: {facc:.4f}  ({len(fy)} lines)")

    def dump(name, W, b):
        print(f"{name}_W = [")
        for row in W:
            print("    [" + ", ".join(f"{v:.5f}" for v in row) + "],")
        print("]")
        print(f"{name}_B = [" + ", ".join(f"{v:.5f}" for v in b) + "]")

    dump("_LAW", W, b)
    dump("_FINTOC", FW, Fb)


if __name__ == "__main__":
    main()
