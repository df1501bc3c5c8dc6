"""Train the txtlayer logistic classifier and print committed weights.

Deterministic synthetic corpus (seed 0): positives are readable EN/RU-like
sentences; negatives are the garbage families a broken PDF text layer
produces (mojibake of utf-8 read as latin-1, cid-code soup, control-char
runs, symbol salad, hexdump-ish). Plain numpy batch gradient descent — no
sklearn/xgboost needed. Run: python scripts/train_txtlayer.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from dedoc_ray.readers.txtlayer import txtlayer_features

EN_WORDS = ("the quick brown fox jumps over lazy dog report section value table "
            "data model result system method analysis chapter figure appendix").split()
RU_WORDS = ("документ раздел глава статья таблица данные метод результат система "
            "анализ приложение рисунок значение отчет модель").split()


def make_positive(rng: np.random.RandomState, words=None) -> str:
    if words is None:
        words = EN_WORDS if rng.rand() < 0.6 else RU_WORDS
    n = rng.randint(30, 120)
    toks = [words[rng.randint(len(words))] for _ in range(n)]
    out = []
    for i, t in enumerate(toks):
        if i % 9 == 0:
            t = t.capitalize()
        out.append(t)
        if i % 11 == 10:
            out[-1] += "."
        if rng.rand() < 0.08:
            out.append(str(rng.randint(1, 2000)))
    return " ".join(out)


_HOMOGLYPH = str.maketrans({
    "A": "А", "B": "В", "C": "С", "E": "Е", "H": "Н", "K": "К", "M": "М",
    "O": "О", "P": "Р", "T": "Т", "X": "Х", "a": "а", "c": "с", "e": "е",
    "o": "о", "p": "р", "x": "х", "y": "у", "i": "1", "l": "1", "s": "$",
    "f": "{", "G": "С", "R": "В", "D": "О", "L": "Т", "N": "М", "S": "5",
    "I": "1", "t": "т", "n": "п", "m": "м", "u": "и", "d": "д", "g": "д",
})


def make_negative(rng: np.random.RandomState) -> str:
    kind = rng.randint(6)
    n = rng.randint(150, 600)
    if kind == 0:  # utf-8 bytes read as latin-1 (classic mojibake).
        # Must be non-ASCII source: ASCII survives the trip unchanged and
        # would mislabel readable text as garbage.
        src = make_positive(rng, RU_WORDS).encode("utf-8")
        return src.decode("latin-1")[:n]
    if kind == 1:  # cid-code soup (broken font maps)
        return " ".join(f"(cid:{rng.randint(1, 999)})" for _ in range(n // 9))
    if kind == 2:  # control chars + random high codepoints
        return "".join(chr(rng.choice([rng.randint(1, 31), rng.randint(160, 879), 0xFFFD]))
                       if rng.rand() < 0.6 else chr(rng.randint(33, 126)) for _ in range(n))
    if kind == 3:  # symbol salad
        pool = "#$%&*+=<>/\\|~^{}[]()"
        return "".join(pool[rng.randint(len(pool))] if rng.rand() < 0.7 else " " for _ in range(n))
    if kind == 4:  # hexdump-ish
        return " ".join(f"{rng.randint(0, 255):02x}" for _ in range(n // 3))
    # OCR homoglyph garbage: Latin text misread through a Cyrillic font
    # (the english_doc_bad_text.pdf fixture shape: 'ТНЕ СВЕАТ ЕМСТ1$Н')
    return make_positive(rng, EN_WORDS).upper().translate(_HOMOGLYPH)[:n]


def main() -> None:
    rng = np.random.RandomState(0)
    texts, labels = [], []
    for _ in range(1500):
        texts.append(make_positive(rng))
        labels.append(1)
        texts.append(make_negative(rng))
        labels.append(0)
    X = np.array([txtlayer_features(t) for t in texts])
    y = np.array(labels, dtype=np.float64)
    n_train = int(0.8 * len(y))

    w = np.zeros(X.shape[1])
    b = 0.0
    lr = 2.0
    for epoch in range(4000):
        z = X[:n_train] @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y[:n_train]
        w -= lr * (X[:n_train].T @ g) / n_train
        b -= lr * g.mean()

    for name, Xs, ys in (("train", X[:n_train], y[:n_train]), ("heldout", X[n_train:], y[n_train:])):
        acc = (((Xs @ w + b) > 0) == (ys == 1)).mean()
        print(f"{name} acc: {acc:.4f}")
    print("_WEIGHTS = [")
    for v in w:
        print(f"    {v:.7f},")
    print("]")
    print(f"_BIAS = {b:.7f}")


if __name__ == "__main__":
    main()
