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


def txtlayer_features(text: str) -> List[float]:
    """10 char-class features mirroring the reference extractor's families:
    class proportions, case/symbol transitions, word-length stats, trash
    chars (control / C1 / U+FFFD), char-ord dispersion."""
    n = max(len(text), 1)
    n_en = n_ru = n_dig = n_spec = n_trash = n_vowel = 0
    case_changes = 0
    ords: List[int] = []
    prev_lower = False
    for ch in text:
        o = ord(ch)
        ords.append(min(o, 2048))
        if ch in _LETTERS_EN:
            n_en += 1
        elif ch in _LETTERS_RU:
            n_ru += 1
        elif ch in _DIGITS:
            n_dig += 1
        elif ch in _SPECIAL:
            n_spec += 1
        if o < 9 or 11 <= o <= 31 or 127 <= o <= 159 or 160 <= o <= 879 or ch == "�":
            n_trash += 1
        if ch in _VOWELS:
            n_vowel += 1
        is_upper = ch.isupper()
        if prev_lower and is_upper:
            case_changes += 1
        prev_lower = ch.islower()
    n_letters = n_en + n_ru
    words = text.split()
    mean_wl = sum(len(w) for w in words) / len(words) if words else 0.0
    mean_ord = sum(ords) / n
    var_ord = sum((o - mean_ord) ** 2 for o in ords) / n
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
    ]


# Logistic-regression weights trained by scripts/train_txtlayer.py
# (deterministic synthetic corpus, seed 0; held-out accuracy printed there).
_WEIGHTS = [
    15.7346215,
    -8.2383822,
    -7.3265367,
    0.1697026,
    -4.7112052,
    -0.2551292,
    -3.6935008,
    1.3407718,
    -0.3882168,
    1.8153032,
]
_BIAS = -4.5218668


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
