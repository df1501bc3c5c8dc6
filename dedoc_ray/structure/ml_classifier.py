"""Trained line-type classifiers — the ML layer over the regex skeleton.

Reference parity: structure_extractors/line_type_classifiers/
abstract_pickled_classifier.py:16-77 (pickled XGBoost per domain) and
fintoc_structure_extractor.py:21-76 (title detection). Here: logistic
layers over dedoc_ray.structure.line_features, weights trained offline on
format-varied synthetic corpora (scripts/train_line_types.py — law held-out
accuracy 0.99, fintoc 1.0) and committed below, so inference is
deterministic and dependency-free.

The law classifier's value over the skeleton regexes is robustness to the
abbreviation/case variants they miss ("Ст. 5.", "ARTICLE 5", "Chap. 2");
enable with PipelineConfig(document_type="law", use_ml_line_classifier=True)
or document_type="fintoc".
"""

from __future__ import annotations

from typing import List

import numpy as np

from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineWithMeta
from dedoc_ray.structure.line_features import line_features

LAW_CLASSES = ["raw_text", "part", "section", "chapter", "article", "item", "subitem"]

# (line_type → hierarchy levels) mirroring structure/domain.py law_patterns
_LAW_LEVELS = {
    "part": (1, 1, False),
    "section": (1, 2, False),
    "chapter": (1, 3, False),
    "article": (1, 4, False),
    "item": (2, 1, False),
    "subitem": (3, 1, False),
    "raw_text": (None, None, True),
}

_LAW_W = [
    [-0.13509, -0.18957, -0.22923, -0.28856, 0.00000, -6.39484, 0.00000, 0.00000, -5.94261, 0.00000, 0.00000, -1.09804, -3.92075, -0.65785, -0.93755, 1.82434, 3.05566, 0.00000, -0.18329, -0.40746, 1.30855, -0.84245, 3.28387, -7.04107],
    [8.31103, -2.87300, -2.18290, -2.62520, 0.00000, -0.48208, 0.00000, 0.00000, -0.38733, 0.00000, 0.00000, 9.00864, 0.69274, 1.48635, 0.66026, -0.89058, -0.41000, 0.00000, -2.17330, -2.70137, -1.73328, 0.62994, 0.29791, 1.46917],
    [-3.09489, 8.08004, -1.65149, -3.15441, 0.00000, -0.72756, 0.00000, 0.00000, -0.60054, 0.00000, 0.00000, -6.87783, 1.42097, -1.01166, 0.24999, -0.02563, -0.49659, 0.00000, -0.94575, 5.02997, -1.41465, 0.17924, -0.37451, 3.61067],
    [-2.61685, -1.86211, 7.15772, -2.73993, 0.00000, -0.83514, 0.00000, 0.00000, -0.73102, 0.00000, 0.00000, -1.96835, 0.77869, 0.33031, 0.58533, -0.47020, -0.62484, 0.00000, -2.01997, 2.46688, 0.07635, -0.06117, 0.04127, 4.14589],
    [-2.27384, -2.90932, -2.78401, 9.24955, 0.00000, -0.83557, 0.00000, 0.00000, -0.72625, 0.00000, 0.00000, 1.94994, 3.98244, -0.29254, -0.01388, -0.55439, -0.59560, 0.00000, 5.58104, -3.72044, 0.91509, 1.28237, -2.54940, 3.03351],
    [-0.09560, -0.12754, -0.16253, -0.23683, 0.00000, 10.63962, 0.00000, 0.00000, -1.31976, 0.00000, 0.00000, -0.49634, -1.47212, 0.04674, -0.51620, 0.02815, -0.19039, 0.00000, -0.12097, -0.30062, 0.33738, -0.62250, -0.08980, -2.59573],
    [-0.09476, -0.11850, -0.14755, -0.20461, 0.00000, -1.36442, 0.00000, 0.00000, 9.70752, 0.00000, 0.00000, -0.51801, -1.48197, 0.09864, -0.02795, 0.08832, -0.73823, 0.00000, -0.13775, -0.36696, 0.51055, -0.56543, -0.60932, -2.62242],
]
_LAW_B = [3.94246, -0.64033, -0.27224, -0.50971, -1.16388, -0.67843, -0.67787]
_FINTOC_W = [
    [0.00000, 0.00000, 0.00000, 0.00000, 0.00000, -4.02629, 0.00000, 0.00000, 0.00000, 0.00000, 0.00000, -1.22294, -4.28826, -0.26573, -0.83661, 0.02924, 2.34982, 0.00000, 0.00000, 0.00000, 0.77921, 0.00000, 3.06034, -3.03721],
    [0.00000, 0.00000, 0.00000, 0.00000, 0.00000, 4.02629, 0.00000, 0.00000, 0.00000, 0.00000, 0.00000, 1.22294, 4.28826, 0.26573, 0.83661, -0.02924, -2.34982, 0.00000, 0.00000, 0.00000, -0.77921, 0.00000, -3.06034, 3.03721],
]
_FINTOC_B = [1.54245, -1.54245]


class LawLineClassifier:
    """Per-line multinomial prediction of the law line-type vocabulary."""

    def __init__(self) -> None:
        self.W = np.array(_LAW_W)
        self.b = np.array(_LAW_B)

    def predict(self, texts: List[str]) -> List[str]:
        if not texts:
            return []
        scores = line_features(texts) @ self.W.T + self.b
        return [LAW_CLASSES[i] for i in scores.argmax(axis=1)]

    def apply(self, lines: List[LineWithMeta]) -> List[LineWithMeta]:
        """Assign hierarchy levels from predictions (the reference's law
        extractor drives hierarchy from classifier output the same way)."""
        preds = self.predict([ln.line for ln in lines])
        for ln, line_type in zip(lines, preds):
            l1, l2, multiline = _LAW_LEVELS[line_type]
            ln.metadata.hierarchy_level = HierarchyLevel(l1, l2, multiline, line_type)
        return lines


class FintocTitleClassifier:
    """FinTOC title detection: title lines become headers with depth from
    their dotted numbering (reference fintoc_structure_extractor.py:60-74)."""

    def __init__(self) -> None:
        self.W = np.array(_FINTOC_W)
        self.b = np.array(_FINTOC_B)

    def predict_titles(self, texts: List[str]) -> np.ndarray:
        if not texts:
            return np.zeros(0, dtype=bool)
        scores = line_features(texts) @ self.W.T + self.b
        return scores.argmax(axis=1) == 1

    def apply(self, lines: List[LineWithMeta]) -> List[LineWithMeta]:
        import re

        depth_re = re.compile(r"^\s*(\d+)((\.\d+)*)")
        titles = self.predict_titles([ln.line for ln in lines])
        for ln, is_title in zip(lines, titles):
            if is_title:
                m = depth_re.match(ln.line.strip())
                depth = 1 + (m.group(2).count(".") if m and m.group(2) else 0) if m else 1
                # non-multiline: consecutive title lines are SEPARATE headers
                # (reference fintoc pins "Key Information Document (KID)" and
                # "PURPOSE" as distinct nodes, test_api_doctype_fintoc.py)
                ln.metadata.hierarchy_level = HierarchyLevel(1, depth, False, HierarchyLevel.header)
            else:
                ln.metadata.hierarchy_level = HierarchyLevel.create_raw_text()
        return lines


# ---------------------------------------------------- tz / diploma layers

TZ_CLASSES = ["raw_text", "root", "section", "item"]
_TZ_LEVELS = {
    "root": (0, 0, False),
    "section": (1, 1, False),
    "item": (2, 1, False),
    "raw_text": (None, None, True),
}
DIPLOMA_CLASSES = ["raw_text", "named_item", "chapter", "section"]
_DIPLOMA_LEVELS = {
    "named_item": (1, 1, False),
    "chapter": (1, 2, False),
    "section": (2, 1, False),
    "raw_text": (None, None, True),
}

_TZ_W = [
    [0.00000, -1.56407, 0.00000, 0.00000, 0.00000, -1.44396, 0.00000, 0.00000, -7.40161, 0.00000, 0.00000, -0.84387, -2.73013, -0.38941, -2.39889, 2.29421, 2.78068, -0.16194, 0.00000, -0.43109, 2.05166, -1.47691, 2.64743, -3.49846],
    [0.00000, -2.41507, 0.00000, 0.00000, 0.00000, -2.44530, 0.00000, 0.00000, -0.95650, 0.00000, 0.00000, 0.28127, 2.69748, -1.51047, 1.36226, -0.98521, -0.63249, -5.37111, 0.00000, -5.73088, -4.31949, -2.24238, -0.52178, 5.07348],
    [0.00000, 4.51852, 0.00000, 0.00000, 0.00000, 4.35390, 0.00000, 0.00000, -1.49136, 0.00000, 0.00000, 0.96004, 1.10980, 1.74931, 1.85402, -1.58543, -1.35300, 5.63697, 0.00000, 6.46891, 1.89722, 4.18868, -1.48400, -0.06390],
    [0.00000, -0.53937, 0.00000, 0.00000, 0.00000, -0.46464, 0.00000, 0.00000, 9.84947, 0.00000, 0.00000, -0.39745, -1.07715, 0.15057, -0.81739, 0.27643, -0.79518, -0.10392, 0.00000, -0.30694, 0.37062, -0.46939, -0.64165, -1.51113],
]
_TZ_B = [2.67601, -0.25544, -1.08441, -1.33615]
_DIPLOMA_W = [
    [0.00000, 0.00000, -0.38521, 0.00000, -0.07780, -6.86854, 0.00000, 0.00000, 0.00000, 0.00000, 0.00000, -0.89337, -3.68396, -0.67415, -1.39209, 2.43212, 2.53192, 0.00000, -0.14192, -0.12746, 1.88664, -0.38521, 3.26105, -5.81913],
    [0.00000, 0.00000, -1.35221, 0.00000, 0.39902, -1.05639, 0.00000, 0.00000, 0.00000, 0.00000, 0.00000, 1.21342, 10.93179, -3.30915, 2.10960, -4.95088, -0.73451, 0.00000, -2.76306, -2.93573, 3.17739, -1.35221, -3.15855, -1.27910],
    [0.00000, 0.00000, 2.01332, 0.00000, -0.27395, -1.70437, 0.00000, 0.00000, 0.00000, 0.00000, 0.00000, 0.08344, -5.83140, 3.39413, -0.66999, 1.87822, -0.74782, 0.00000, 3.04275, 3.18508, -4.83391, 2.01332, 0.92378, 9.13971],
    [0.00000, 0.00000, -0.27590, 0.00000, -0.04727, 9.62931, 0.00000, 0.00000, 0.00000, 0.00000, 0.00000, -0.40350, -1.41643, 0.58918, -0.04753, 0.64054, -1.04958, 0.00000, -0.13777, -0.12189, -0.23012, -0.27590, -1.02628, -2.04148],
]
_DIPLOMA_B = [3.57195, -3.57579, 0.46041, -0.45656]


class DomainLineClassifier:
    """Generic trained line-type layer — tz/diploma instantiations of the
    same multinomial machinery as LawLineClassifier (reference pickled
    per-domain classifiers, abstract_pickled_classifier.py:16-77).
    Held-out accuracy 1.00 on the format-varied synthetic corpora
    (scripts/train_line_types.py)."""

    def __init__(self, classes, levels, W, b) -> None:
        self.classes = classes
        self.levels = levels
        self.W = np.array(W)
        self.b = np.array(b)

    def predict(self, texts: List[str]) -> List[str]:
        if not texts:
            return []
        scores = line_features(texts) @ self.W.T + self.b
        return [self.classes[i] for i in scores.argmax(axis=1)]

    def apply(self, lines: List[LineWithMeta]) -> List[LineWithMeta]:
        preds = self.predict([ln.line for ln in lines])
        for ln, line_type in zip(lines, preds):
            l1, l2, multiline = self.levels[line_type]
            ln.metadata.hierarchy_level = HierarchyLevel(l1, l2, multiline, line_type)
        return lines


def TzLineClassifier() -> DomainLineClassifier:
    return DomainLineClassifier(TZ_CLASSES, _TZ_LEVELS, _TZ_W, _TZ_B)


def DiplomaLineClassifier() -> DomainLineClassifier:
    return DomainLineClassifier(DIPLOMA_CLASSES, _DIPLOMA_LEVELS, _DIPLOMA_W, _DIPLOMA_B)
