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
    """14 char-class features mirroring the reference extractor's families:
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
    # words longer than any real Russian/English word are garbage runs
    # (cid soup, control-char blobs, base64 spill) — counted separately so
    # the mean-length feature can stay a readability signal without a long
    # clip ceiling that garbage blobs could ride to acceptance
    overlong = sum(1 for w in words if len(w) > 20)
    ords = np.minimum(cp, 2048).astype(np.float64)
    mean_ord = float(ords.sum()) / n
    var_ord = float(((ords - mean_ord) ** 2).sum()) / n
    # word-level script coherence: OCR homoglyph garbage ('ТНЕ СВЕАТ
    # ЕМСТ1$Н') mixes Cyrillic+Latin or puts digits/symbols INSIDE words
    # — readable text almost never does (reference XGBoost learns the
    # same signal from its char-class columns). Digits at a word EDGE
    # ('TimesNewRoman18', 'IPv6', 'v2.1') are legitimate identifiers, so
    # letter/digit mixing only counts as garbage when the runs interleave
    # (>=3 letter/digit runs, skipping punctuation: 'Е15т' = L,D,L).
    mixed_script = 0
    special_mix = 0
    interleaved = 0
    alnum_words = 0
    midcase = 0
    for w in words:
        ws = set(w)
        has_en = bool(ws & _LETTERS_EN)
        has_ru = bool(ws & _LETTERS_RU)
        has_letter = has_en or has_ru
        if has_en and has_ru:
            mixed_script += 1
        if has_letter and ws & _WORD_SPECIAL:
            special_mix += 1
        # lower→upper flip INSIDE a Cyrillic word ('зрееК', 'ВеагЕ' —
        # homoglyph mojibake). Latin CamelCase ('TimesNewRoman18') is a
        # legitimate identifier shape, so only Cyrillic flips count:
        # Russian has no CamelCase convention
        if any(
            a.islower() and b.isupper() and (a in _LETTERS_RU or b in _LETTERS_RU)
            for a, b in zip(w, w[1:])
        ):
            midcase += 1
        if has_letter and ws & _DIGITS:
            alnum_words += 1
            runs = 0
            prev = ""
            for ch in w:
                if ch in _DIGITS:
                    k = "D"
                elif ch in _LETTERS_EN or ch in _LETTERS_RU:
                    k = "L"
                else:
                    continue  # punctuation neither breaks nor joins runs
                if k != prev:
                    runs += 1
                    prev = k
            if runs >= 3:
                interleaved += 1
    n_words = max(len(words), 1)
    return [
        n_letters / n,                         # letters_proportion
        n_dig / n,                             # digits_proportion
        n_spec / n,                            # special_symbols_proportion
        (n_letters + n_dig + n_spec) / n,      # all_proportion
        n_trash / n,                           # trash_chars_proportion
        case_changes / n,                      # case_changes
        min(mean_wl, 12.0) / 12.0,             # mean_word_length (clipped)
        (n_vowel / n_letters) if n_letters else 0.0,  # vowel ratio
        min(math.sqrt(var_ord), 512.0) / 512.0,       # std_char_ord (clipped)
        min(mean_ord, 2048.0) / 2048.0,               # mean_char_ord (clipped)
        mixed_script / n_words,                       # mixed-script words
        special_mix / n_words,                        # letters+symbol words
        interleaved / n_words,                        # digit-inside-letters words
        alnum_words / n_words,                        # any letter+digit words
        midcase / n_words,                            # Cyrillic mid-word case flips
        overlong / n_words,                           # >20-char garbage runs
    ]


# Tiny MLP (16 features → 12 tanh → 1) trained by
# scripts/train_txtlayer.py (deterministic synthetic corpus, seed 0;
# held-out accuracy printed there). Nonlinear like the reference's
# XGBoost: the positive families (prose, digit columns, identifier
# lists, rotated-cell layers) are disjoint regions a single linear
# boundary cannot hold simultaneously.
_W1 = [
    [0.943008, 0.786067, 0.712741, 0.814321, -0.320822, -0.169573, -0.687049, -0.742932, -0.346957, 0.062353, 0.569789, -0.800136],
    [0.060452, -0.895034, -1.002249, -1.347509, -0.231474, 0.676351, 1.690333, 0.757966, 0.182844, 0.269701, -1.559966, 0.634417],
    [-0.726682, -0.041497, 0.014757, -0.321099, 0.268325, -0.232913, -0.627834, 0.145557, 0.057271, -0.184986, 0.326550, 0.283863],
    [0.340728, -0.104180, 0.047975, -0.557765, -0.053165, 0.239775, 0.389397, 0.161504, -0.601317, -0.005339, -0.247919, 0.324083],
    [-0.141973, 0.217114, 0.267214, -0.551245, 0.188797, -0.370560, -0.323195, -0.181457, 0.256401, -0.149994, 0.389522, 0.296309],
    [0.241274, 0.074330, 0.088886, 0.355749, -0.136982, 0.280465, 0.086620, -0.055754, -0.199772, 0.126650, -0.160048, -0.220942],
    [1.239652, 0.832993, 0.892151, 1.329486, -0.462382, 0.741749, -0.439191, -0.696036, -0.911491, 0.394989, 0.152822, -1.134148],
    [-0.681991, 0.116583, -0.083455, 3.115749, -0.130209, 1.092498, 2.275337, -0.134916, 0.163507, 0.387935, -2.080206, -1.780685],
    [-0.890790, -0.879083, -0.804956, -0.346075, 0.182388, -0.080002, 0.837846, 0.811654, 0.599504, -0.121761, 0.343513, 0.326858],
    [-0.963260, 0.069814, 0.063375, -0.633683, 0.399694, -0.520979, 0.242399, -0.069782, 0.633362, -0.272299, 0.596492, 0.279853],
    [-0.109534, 0.083367, 0.091650, -0.170419, 0.054961, -0.104026, -0.014052, -0.071537, 0.086396, -0.049011, 0.140583, 0.085053],
    [-1.215767, 1.085569, 1.244535, -1.844294, 0.566734, -1.103077, -0.172331, -0.893586, 0.924309, -0.505839, 1.465041, 0.893788],
    [-1.212032, 1.051747, 1.203930, -1.876778, 0.576305, -1.109773, -0.172961, -0.871552, 0.936183, -0.511185, 1.484259, 0.902407],
    [-1.621904, 2.584406, 2.989632, -0.331313, 0.611780, -0.784770, 0.637276, -2.193299, 1.166333, -0.448319, 0.037115, 0.016604],
    [-0.508038, 0.456949, 0.525984, -0.767112, 0.232645, -0.456678, -0.067085, -0.374514, 0.382478, -0.209038, 0.604316, 0.374876],
    [0.264099, -0.075008, -0.087410, 0.459963, -0.161163, 0.321065, 0.138093, 0.066486, -0.217303, 0.148553, -0.272487, -0.262231],
]
_B1 = [
    0.314794, -0.040074, -0.222901, -1.189340, -0.162157, -0.410027, 0.047596, -0.100228, 0.074659, 0.138815, -0.045472, 1.198408,
]
_W2 = [
    3.065431, -3.151099, -3.599491, 5.074552, -1.412783, 2.692675, 3.145757, 2.550779, -2.252279, 1.259950, -3.580688, -2.534351,
]
_B2 = 0.430111


class TxtlayerClassifier:
    """is_correct(text): True when the extracted text layer is readable
    text, False for mojibake/garbage (route to OCR)."""

    def is_correct(self, text: str) -> bool:
        return self.decision(text) > 0.0

    def decision(self, text: str) -> float:
        if not text:
            return -1.0
        import numpy as np

        if len(text) < 150:  # reference pads short layers (txtlayer_classifier.py:56-57)
            text = (f"\n{text}") * (150 // len(text))
        f = np.asarray(txtlayer_features(text))
        h = np.tanh(f @ np.asarray(_W1) + np.asarray(_B1))
        return float(h @ np.asarray(_W2) + _B2)
