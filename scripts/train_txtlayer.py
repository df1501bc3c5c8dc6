"""Train the txtlayer classifier (tiny numpy MLP) and print committed weights.

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
        words = EN_WORDS if rng.rand() < 0.5 else RU_WORDS
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


def make_positive_real(rng: np.random.RandomState) -> str:
    """Real-document shapes a prose-only positive corpus misses (they
    misclassified actual reference fixtures before round 3):
    table-column layers (one word/number per line, VVP_global_table),
    TOC dot-leader lines (alpaca_tz), and identifier-bearing prose
    (diff_styles' 'TimesNewRoman18', standards like 'ГОСТ 2.104-68')."""
    kind = rng.randint(6)
    words = EN_WORDS if rng.rand() < 0.4 else RU_WORDS
    if kind == 3:  # identifier-dominant style sampler (diff_styles.pdf:
        # nearly every word is FontName+size, 'TimesNewRoman9,')
        fonts = ["TimesNewRoman", "Arial", "Calibri", "Tahoma", "Verdana",
                 "CourierNew", "TimesNewRomanItalic", "TimesNewRomanBold"]
        lines = []
        for i in range(rng.randint(4, 10)):
            idents = []
            for _ in range(rng.randint(1, 4)):
                f = fonts[rng.randint(len(fonts))]
                sz = rng.randint(6, 22)
                idents.append(f"{f}{sz}" + (".5" if rng.rand() < 0.2 else ""))
            head = f"{i + 1}. " if rng.rand() < 0.7 else ""
            lines.append(head + ", ".join(idents))
        return "\n".join(lines)
    if kind == 4:  # pure numeric table column (big_table_with_merged_cells:
        # the whole text layer is digit cell values — mostly single digits
        # with trailing spaces, one per line)
        cells = []
        for _ in range(rng.randint(15, 60)):
            v = str(rng.randint(1, 10 if rng.rand() < 0.7 else 1000))
            cells.append(v + (" " if rng.rand() < 0.7 else ""))
        return "\n".join(cells)
    if kind == 5:  # rotated/gost table layer: prose fragments interleaved
        # with digit cell lines and slashed headers ('п/п', '№док') —
        # example_table_with_90_orient_cells / gost_multipage_table_2
        lines = []
        ru = "абвгдеиклмнопрсту"
        n_prose = rng.randint(2, 8)
        for _ in range(rng.randint(25, 70)):
            r = rng.rand()
            sp = " " if rng.rand() < 0.5 else ""
            if r < 0.3:
                lines.append(str(rng.randint(1, 99)) + sp)
            elif r < 0.6:  # rotated cells decompose to single-letter lines
                lines.append(ru[rng.randint(len(ru))] + sp)
            elif r < 0.7:
                lines.append(["п/п", "№", "Изм.", "Лист", "Дата", "Кол."][rng.randint(6)])
            elif n_prose > 0:
                n_prose -= 1
                lines.append(" ".join(words[rng.randint(len(words))]
                                      for _ in range(rng.randint(3, 6))) + " ")
        return "\n".join(lines)
    if kind == 0:  # table-column text layer: single words / numbers per line
        lines = []
        for _ in range(rng.randint(25, 70)):
            if rng.rand() < 0.45:
                v = rng.randint(1, 30000)
                lines.append(f"{v:,}".replace(",", " ") if rng.rand() < 0.3 else str(v))
            else:
                w = words[rng.randint(len(words))]
                lines.append(w.capitalize() if rng.rand() < 0.5 else w)
        return "\n".join(lines)
    if kind == 1:  # TOC with dot leaders + numbered headings
        lines = []
        for i in range(rng.randint(8, 20)):
            w = " ".join(words[rng.randint(len(words))] for _ in range(rng.randint(2, 5)))
            lines.append(f"{i + 1} {w.capitalize()} " + "." * rng.randint(6, 40) + f" {rng.randint(1, 99)}")
        return "\n".join(lines)
    # prose with alphanumeric identifiers (font names, standards, versions)
    base = make_positive(rng, words).split()
    idents = ["TimesNewRoman18", "Arial16", "Calibri11", "ГОСТ 2.104-68", "ISO 9001:2015",
              "IPv6", "УДК 004.9", "RFC 7231", "табл. 3", "рис. 12", "A4", "v2.1"]
    for _ in range(max(2, len(base) // 12)):
        base.insert(rng.randint(len(base)), idents[rng.randint(len(idents))])
    return " ".join(base)


_HOMOGLYPH = str.maketrans({
    "A": "А", "B": "В", "C": "С", "E": "Е", "H": "Н", "K": "К", "M": "М",
    "O": "О", "P": "Р", "T": "Т", "X": "Х", "a": "а", "c": "с", "e": "е",
    "o": "о", "p": "р", "x": "х", "y": "у", "i": "1", "l": "1", "s": "$",
    "f": "{", "G": "С", "R": "В", "D": "О", "L": "Т", "N": "М", "S": "5",
    "I": "1", "t": "т", "n": "п", "m": "м", "u": "и", "d": "д", "g": "д",
})


# case-preserving OCR confusion: lowercase Latin misread as UPPERCASE
# Cyrillic lookalikes / digits / symbols mid-word — the real
# english_doc_bad_text.pdf shape ('speak'→'зрееК', 'list'→'Е15т',
# 'text'→'{ехё'): mid-word case flips, digits and symbols inside words
_HOMOGLYPH_CASED = str.maketrans({
    "a": "а", "b": "В", "c": "с", "e": "е", "f": "Г", "h": "Н", "i": "1",
    "k": "К", "l": "1", "m": "т", "n": "п", "o": "о", "p": "р", "r": "г",
    "s": "5", "t": "{", "u": "и", "v": "м", "x": "х", "y": "у", "d": "д",
    "g": "д", "w": "м", "j": "у", "q": "ч", "z": "2",
    "A": "А", "B": "В", "C": "С", "E": "Е", "H": "Н", "K": "К", "M": "М",
    "O": "О", "P": "Р", "T": "Т", "X": "Х", "S": "$", "I": "1", "L": "Т",
    "D": "О", "G": "С", "R": "В", "N": "М", "F": "Е", "U": "И", "V": "М",
    "W": "Ш", "Y": "У", "J": "У", "Q": "О", "Z": "2",
})


# the benign half of the confusion: pure lookalike swaps that keep case
# coherent — used for the words the "OCR" got lucky on, so the mild
# negatives below stay mostly plausible-Cyrillic like the real fixture
_HOMOGLYPH_MILD = str.maketrans({
    "a": "а", "c": "с", "e": "е", "o": "о", "p": "р", "x": "х", "y": "у",
    "u": "и", "m": "т", "n": "п", "r": "г", "t": "т", "s": "з", "d": "д",
    "b": "в", "f": "ф", "g": "д", "h": "н", "i": "и", "j": "у", "k": "к",
    "l": "л", "q": "ч", "v": "м", "w": "м", "z": "г",
    "A": "А", "B": "В", "C": "С", "E": "Е", "H": "Н", "K": "К", "M": "М",
    "O": "О", "P": "Р", "T": "Т", "X": "Х", "S": "С", "I": "И", "L": "Т",
    "D": "О", "G": "С", "R": "В", "N": "М", "F": "Е", "U": "И", "V": "М",
    "W": "Ш", "Y": "У", "J": "У", "Q": "О", "Z": "З",
})


def make_negative(rng: np.random.RandomState) -> str:
    kind = rng.randint(9)
    if kind == 8:
        # low-ord ASCII letter salad: random keyboard mash with wordlike
        # token lengths — keeps the model from using char-ord as a
        # garbage proxy (real Russian is high-ord and must stay positive)
        pool = "qwrtypsdfghjklzxcvbnm"
        return " ".join("".join(pool[rng.randint(len(pool))]
                                 for _ in range(rng.randint(2, 11)))
                        for _ in range(rng.randint(25, 90)))
    if kind >= 6:
        # MILD cased homoglyph garbage (english_doc_bad_text.pdf shape):
        # only a fraction of words carry digits/symbols/case-flips, the
        # rest read as plausible Cyrillic — forces the trainer to weight
        # the word-coherence features hard enough to catch low firing
        # rates instead of relying on saturated synthetic fractions
        src = make_positive(rng, EN_WORDS)
        toks = [t.capitalize() if rng.rand() < 0.3 else t for t in src.split()]
        out = [t.translate(_HOMOGLYPH_CASED if rng.rand() < 0.4 else _HOMOGLYPH_MILD)
               for t in toks]
        return " ".join(out)[:rng.randint(150, 600)]
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
    for i in range(1500):
        texts.append(make_positive(rng) if i % 2 else make_positive_real(rng))
        labels.append(1)
        texts.append(make_negative(rng))
        labels.append(0)
    X = np.array([txtlayer_features(t) for t in texts])
    y = np.array(labels, dtype=np.float64)
    n_train = int(0.8 * len(y))

    # tiny MLP (16 → 12 tanh → 1): the positive families are DISJOINT
    # regions of feature space (prose, digit columns, identifier lists,
    # single-letter rotated-cell layers) — a single linear boundary keeps
    # trading one family against another; one hidden layer separates them
    # cleanly, mirroring the reference's nonlinear XGBoost. Adam, full
    # batch, deterministic seed.
    hid = 12
    r = np.random.RandomState(7)
    W1 = r.randn(X.shape[1], hid) * 0.5
    b1 = np.zeros(hid)
    W2 = r.randn(hid) * 0.5
    b2 = 0.0
    params = [W1, b1, W2, np.array([b2])]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    lr, beta1, beta2, eps, l2 = 0.02, 0.9, 0.999, 1e-8, 1e-4
    Xt, yt = X[:n_train], y[:n_train]
    for epoch in range(1, 3001):
        H = np.tanh(Xt @ params[0] + params[1])
        z = H @ params[2] + params[3][0]
        p = 1.0 / (1.0 + np.exp(-z))
        g = (p - yt) / len(yt)
        gW2 = H.T @ g + l2 * params[2]
        gb2 = np.array([g.sum()])
        gH = np.outer(g, params[2]) * (1 - H * H)
        gW1 = Xt.T @ gH + l2 * params[0]
        gb1 = gH.sum(axis=0)
        for i, grad in enumerate([gW1, gb1, gW2, gb2]):
            m[i] = beta1 * m[i] + (1 - beta1) * grad
            v[i] = beta2 * v[i] + (1 - beta2) * grad * grad
            mh = m[i] / (1 - beta1 ** epoch)
            vh = v[i] / (1 - beta2 ** epoch)
            params[i] -= lr * mh / (np.sqrt(vh) + eps)

    def predict(Xs):
        return np.tanh(Xs @ params[0] + params[1]) @ params[2] + params[3][0]

    for name, Xs, ys in (("train", X[:n_train], y[:n_train]), ("heldout", X[n_train:], y[n_train:])):
        acc = ((predict(Xs) > 0) == (ys == 1)).mean()
        print(f"{name} acc: {acc:.4f}")

    def fmt_matrix(name, a):
        if a.ndim == 1:
            rows = "    " + ", ".join(f"{x:.6f}" for x in a)
            return f"{name} = [\n{rows},\n]"
        body = "\n".join("    [" + ", ".join(f"{x:.6f}" for x in row) + "]," for row in a)
        return f"{name} = [\n{body}\n]"

    print(fmt_matrix("_W1", params[0]))
    print(fmt_matrix("_B1", params[1]))
    print(fmt_matrix("_W2", params[2]))
    print(f"_B2 = {params[3][0]:.6f}")


if __name__ == "__main__":
    main()
