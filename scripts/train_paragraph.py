"""Train the paragraph-continuation classifier; print committed weights.

Synthesizes layout documents as grouped-line tuples (x, y, font, size,
text) with the signal regimes the PDF text layer actually produces:

- indent-marked paragraphs (start lines shifted right), the dominant
  print convention;
- gap-marked paragraphs (extra leading before a start, no indent);
- mixed/weak-signal docs where case and punctuation are uninformative
  (all-lowercase corpora) — the classifier must hold on geometry alone;
- noise on every coordinate, occasional missing signals.

Binary logistic regression in plain numpy (same machinery as
scripts/train_line_types.py); weights are committed into
dedoc_ray/readers/paragraph.py. Run: python scripts/train_paragraph.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dedoc_ray.readers.paragraph import para_features

_WORDS = ("analysis results method data model value table figure point case "
          "review system design error score limit range group phase stage").split()


def _line_text(rng, start: bool, informative_case: bool) -> str:
    words = [_WORDS[rng.randint(len(_WORDS))] for _ in range(rng.randint(3, 9))]
    t = " ".join(words)
    if informative_case and start and rng.rand() < 0.85:
        t = t.capitalize()
    if informative_case and rng.rand() < 0.5:
        t += "."
    return t


def synth_doc(rng) -> tuple:
    """One column of grouped lines → (tuples, is_start labels)."""
    regime = rng.randint(3)  # 0: indent-marked, 1: gap-marked, 2: both
    informative_case = rng.rand() < 0.5
    base_gap = 12.0 + 4.0 * rng.rand()
    start_gap = base_gap * (1.7 + 0.5 * rng.rand())
    indent = 14.0 + 8.0 * rng.rand()
    x0 = 60.0 + 20.0 * rng.rand()
    size = 10.0 + 2.0 * rng.rand()
    y = 780.0
    lines, labels = [], []
    # docs open with a flush-left title line (forced start downstream)
    lines.append((x0, y, "F1", size + rng.randint(0, 3), _line_text(rng, True, True)))
    labels.append(True)
    for _ in range(rng.randint(3, 8)):  # paragraphs
        n_cont = rng.randint(0, 4)
        for j in range(n_cont + 1):
            start = j == 0
            dx = 0.0
            if start and regime in (0, 2) and rng.rand() < 0.95:
                dx = indent + rng.randn()
            gap = base_gap + 0.6 * rng.randn()
            if start and regime in (1, 2):
                gap = start_gap + 0.8 * rng.randn()
            y -= gap
            lines.append((x0 + dx + 0.4 * rng.randn(), y, "F1", size,
                          _line_text(rng, start, informative_case)))
            labels.append(start)
    return lines, labels


def _train_logistic(X, y, epochs=15000, lr=0.5):
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(epochs):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        g = (p - y) / n
        w -= lr * (X.T @ g)
        b -= lr * g.sum()
    return w, b


def main() -> None:
    rng = np.random.RandomState(0)
    X_parts, y_parts = [], []
    for _ in range(400):
        lines, labels = synth_doc(rng)
        X_parts.append(para_features(lines))
        y_parts.append(np.array(labels, dtype=np.float64))
    X = np.vstack(X_parts)
    y = np.concatenate(y_parts)
    n_train = int(0.8 * len(y))
    w, b = _train_logistic(X[:n_train], y[:n_train])
    acc = (((X[n_train:] @ w + b) > 0) == y[n_train:].astype(bool)).mean()
    print(f"paragraph heldout acc: {acc:.4f}  ({len(y)} lines)")
    print("_PARA_W = [" + ", ".join(f"{v:.5f}" for v in w) + "]")
    print(f"_PARA_B = {b:.5f}")


if __name__ == "__main__":
    main()
