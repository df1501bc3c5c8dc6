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


TZ_CLASSES = ["raw_text", "root", "section", "item"]


def tz_doc(rng) -> tuple:
    """Technical-specification doc → (lines, labels). Section headers rotate
    through abbreviation/case variants the tz regex skeleton does NOT match
    ("Req. N:", "ТРЕБОВАНИЯ...") — the trained layer's robustness target."""
    lines, labels = [], []
    root_forms = ["Техническое задание", "ТЕХНИЧЕСКОЕ ЗАДАНИЕ", "Technical Specification",
                  "TECHNICAL SPECIFICATION", "ТЗ на разработку"]
    sec_forms = ["Требования {n}", "ТРЕБОВАНИЯ {n}", "Requirements {n}", "Req. {n}:",
                 "Раздел требований {n}", "Section {n} requirements", "{n}. Requirements"]
    lines.append(root_forms[rng.randint(len(root_forms))])
    labels.append("root")
    for s in range(1, rng.randint(3, 6)):
        lines.append(sec_forms[rng.randint(len(sec_forms))].format(n=s))
        labels.append("section")
        for i in range(1, rng.randint(2, 5)):
            lines.append(f"{i}) {_body(rng, rng.randint(4, 9))}")
            labels.append("item")
        lines.append(_body(rng))
        labels.append("raw_text")
    return lines, labels


DIPLOMA_CLASSES = ["raw_text", "named_item", "chapter", "section"]


def diploma_doc(rng) -> tuple:
    """Diploma/thesis doc → (lines, labels) with named-part and chapter
    variants beyond the strict regexes ("ВВЕДЕНИЕ.", "Гл. 2", "Chap. 3")."""
    lines, labels = [], []
    named = ["Введение", "ВВЕДЕНИЕ", "Introduction", "Заключение", "ЗАКЛЮЧЕНИЕ.",
             "Conclusion", "Список литературы", "References", "Приложение А", "Appendix B", "Abstract"]
    chap_forms = ["Глава {n}", "Гл. {n}", "ГЛАВА {n}.", "Chapter {n}", "Chap. {n}.", "CHAPTER {n}"]
    lines.append(named[rng.randint(3)])
    labels.append("named_item")
    for c in range(1, rng.randint(2, 4)):
        lines.append(_maybe_title(rng, chap_forms[rng.randint(len(chap_forms))].format(n=c)))
        labels.append("chapter")
        for s in range(1, rng.randint(2, 4)):
            lines.append(f"{c}.{s} {_body(rng, rng.randint(3, 6))}")
            labels.append("section")
            lines.append(_body(rng))
            labels.append("raw_text")
    lines.append(named[3 + rng.randint(len(named) - 3)])
    labels.append("named_item")
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

    for name, gen, classes, n_docs in (("_TZ", tz_doc, TZ_CLASSES, 80),
                                       ("_DIPLOMA", diploma_doc, DIPLOMA_CLASSES, 80)):
        dlines, dlabels = [], []
        for _ in range(n_docs):
            ls, lb = gen(rng)
            dlines.append(ls)
            dlabels.append(lb)
        DX = np.vstack([line_features(ls) for ls in dlines])
        dy = np.array([classes.index(t) for lb in dlabels for t in lb])
        dn = int(0.8 * len(dy))
        DW, Db = _train_softmax(DX[:dn], dy[:dn], len(classes))
        dacc = ((DX[dn:] @ DW.T + Db).argmax(axis=1) == dy[dn:]).mean()
        print(f"{name[1:].lower()} heldout acc: {dacc:.4f}  ({len(dy)} lines)")
        globals()[f"{name}_RESULT"] = (DW, Db)

    dump("_LAW", W, b)
    dump("_FINTOC", FW, Fb)
    dump("_TZ", globals()["_TZ_RESULT"][0], globals()["_TZ_RESULT"][1])
    dump("_DIPLOMA", globals()["_DIPLOMA_RESULT"][0], globals()["_DIPLOMA_RESULT"][1])


if __name__ == "__main__":
    main()
