"""Text-layer correctness classifier — routes PDF rows between the
extracted text layer and the (stubbed) OCR path.

Reference: dedoc/readers/pdf_reader/pdf_auto_reader/txtlayer_classifier.py
:14-61 (XGBoost over char-class features, acc 0.9535 per BASELINE.md) with
features from txtlayer_feature_extractor.py. XGBoost/torch are not in this
container, so this is a small logistic model over the same style of
char-class proportions, trained offline on a deterministic synthetic
readable-vs-mojibake corpus (scripts/train_txtlayer.py regenerates it; the
weights below are committed so inference is dependency-free and
deterministic). Accuracy on the held-out synthetic set is asserted ≥ 0.95
in tests/test_txtlayer.py — the same bar as the reference model.
"""

from __future__ import annotations

import math
from typing import List

_LETTERS_EN = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_LETTERS_RU = set("абвгдеёжзийклмнопрстуфхцчшщъыьэюя" + "абвгдеёжзийклмнопрстуфхцчшщъыьэюя".upper())
_DIGITS = set("0123456789")
_SPECIAL = set("-@#$%&*_+=:;.,!?'\"()[]{}<>/\\|~^ \n\t\r")
_VOWELS = set("aeiouAEIOUаеёиоуыэюяАЕЁИОУЫЭЮЯ")
#: symbols that are GARBAGE inside a word (punctuation that legitimately
#: trails words — .,!?:;()"' — is excluded)
_WORD_SPECIAL = set("#$%&*+=<>\\|~^{}[]@")


def txtlayer_features(text: str) -> List[float]:
    """10 char-class features mirroring the reference extractor's families:
    class proportions, case/symbol transitions, word-length stats, trash
    chars (control / C1 / U+FFFD), char-ord dispersion.

    Vectorized via the unique-codepoint trick: per-char class membership is
    evaluated once per UNIQUE character (tens, not thousands) and scattered
    back through np.unique's inverse index — exact Python str semantics
    (isupper/islower) at numpy speed. This sits on the hot path of every
    PDF row (read_pdf_auto routing)."""
    import numpy as np

    n = max(len(text), 1)
    if not text:
        cp = np.zeros(0, dtype=np.uint32)
    else:
        cp = np.frombuffer(text.encode("utf-32-le", "surrogatepass"), dtype=np.uint32)
    uniq, inv = np.unique(cp, return_inverse=True)
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
    chars = [chr(int(u)) for u in uniq]
    in_en = np.fromiter((c in _LETTERS_EN for c in chars), bool, len(chars))
    in_ru = np.fromiter((c in _LETTERS_RU for c in chars), bool, len(chars))
    in_dig = np.fromiter((c in _DIGITS for c in chars), bool, len(chars))
    in_spec = np.fromiter((c in _SPECIAL for c in chars), bool, len(chars))
    # elif-chain semantics: later classes only count chars not already matched
    in_ru &= ~in_en
    in_dig &= ~(in_en | in_ru)
    in_spec &= ~(in_en | in_ru | in_dig)
    in_vowel = np.fromiter((c in _VOWELS for c in chars), bool, len(chars))
    u = uniq.astype(np.int64)
    in_trash = (u < 9) | ((u >= 11) & (u <= 31)) | ((u >= 127) & (u <= 879)) | (u == 0xFFFD)
    n_en = int(counts[in_en].sum())
    n_ru = int(counts[in_ru].sum())
    n_dig = int(counts[in_dig].sum())
    n_spec = int(counts[in_spec].sum())
    n_trash = int(counts[in_trash].sum())
    n_vowel = int(counts[in_vowel].sum())
    upper_u = np.fromiter((c.isupper() for c in chars), bool, len(chars))
    lower_u = np.fromiter((c.islower() for c in chars), bool, len(chars))
    upper = upper_u[inv]
    lower = lower_u[inv]
    case_changes = int(np.sum(lower[:-1] & upper[1:])) if len(cp) > 1 else 0
    n_letters = n_en + n_ru
    words = text.split()
    mean_wl = sum(len(w) for w in words) / len(words) if words else 0.0
    ords = np.minimum(cp, 2048).astype(np.float64)
    mean_ord = float(ords.sum()) / n
    var_ord = float(((ords - mean_ord) ** 2).sum()) / n
    # word-level script coherence: OCR homoglyph garbage ('ТНЕ СВЕАТ
    # ЕМСТ1$Н') mixes Cyrillic+Latin or letters+digits/symbols INSIDE
    # words — readable text almost never does (reference XGBoost learns
    # the same signal from its char-class columns)
    mixed_script = 0
    alnum_mixed = 0
    for w in words:
        ws = set(w)
        has_en = bool(ws & _LETTERS_EN)
        has_ru = bool(ws & _LETTERS_RU)
        if has_en and has_ru:
            mixed_script += 1
        if (has_en or has_ru) and (ws & _DIGITS or ws & _WORD_SPECIAL):
            alnum_mixed += 1
    n_words = max(len(words), 1)
    return [
        n_letters / n,                         # letters_proportion
        n_dig / n,                             # digits_proportion
        n_spec / n,                            # special_symbols_proportion
        (n_letters + n_dig + n_spec) / n,      # all_proportion
        n_trash / n,                           # trash_chars_proportion
        case_changes / n,                      # case_changes
        min(mean_wl, 30.0) / 30.0,             # mean_word_length (clipped)
        (n_vowel / n_letters) if n_letters else 0.0,  # vowel ratio
        min(math.sqrt(var_ord), 512.0) / 512.0,       # std_char_ord (clipped)
        min(mean_ord, 2048.0) / 2048.0,               # mean_char_ord (clipped)
        mixed_script / n_words,                       # mixed-script words
        alnum_mixed / n_words,                        # letter+digit/symbol words
    ]


# Logistic-regression weights trained by scripts/train_txtlayer.py
# (deterministic synthetic corpus, seed 0; held-out accuracy printed there).
_WEIGHTS = [
    11.3069170,
    -4.2290739,
    -5.6619734,
    1.4158696,
    -3.9904376,
    -0.2005106,
    0.1143911,
    2.4740279,
    -4.5471200,
    2.1912010,
    -9.4956724,
    -11.4084401,
]
_BIAS = -2.5720982


class TxtlayerClassifier:
    """is_correct(text): True when the extracted text layer is readable
    text, False for mojibake/garbage (route to OCR)."""

    def is_correct(self, text: str) -> bool:
        if not text:
            return False
        if len(text) < 150:  # reference pads short layers (txtlayer_classifier.py:56-57)
            text = (f"\n{text}") * (150 // len(text))
        z = _BIAS + sum(w * f for w, f in zip(_WEIGHTS, txtlayer_features(text)))
        return z > 0.0
