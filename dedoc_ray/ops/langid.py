"""Character n-gram language identification — an actor-pool stage.

A real profile-based language ID (Cavnar & Trenkle-style rank profiles over
character trigrams), with tiny seed profiles embedded in code (no model
download in this container). Profiles build once per actor in ``__init__``;
``__call__`` scores batches vectorized over a hashed trigram space.

Not SQL-expressible (rank-profile distance) → rows-only driver check; pytest
asserts obvious-language sanity. Output is deterministic.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, List

import numpy as np
import pyarrow as pa

# tiny seed corpora — enough for trigram profiles of clearly distinct langs
_SEEDS: Dict[str, str] = {
    "en": "the quick brown fox jumps over the lazy dog and then it was the best of "
          "times it was the worst of times there is nothing either good or bad but "
          "thinking makes it so to be or not to be that is the question with all",
    "de": "der schnelle braune fuchs springt über den faulen hund und es war die "
          "beste aller zeiten es war die schlechteste aller zeiten es gibt nichts "
          "gutes oder schlechtes erst das denken macht es dazu sein oder nicht sein",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et c'était le "
          "meilleur des temps c'était le pire des temps il n'y a rien de bon ou de "
          "mauvais mais la pensée le rend ainsi être ou ne pas être telle est la question",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y era el mejor de "
          "los tiempos era el peor de los tiempos no hay nada bueno o malo pero el "
          "pensamiento lo hace así ser o no ser esa es la cuestión con todos",
    "ru": "быстрая коричневая лиса прыгает через ленивую собаку и это было лучшее "
          "из времён это было худшее из времён нет ничего хорошего или плохого но "
          "мышление делает это таким быть или не быть вот в чём вопрос",
}

_CLEAN_RE = re.compile(r"[^\w\s']", re.UNICODE)
_WS_RE = re.compile(r"\s+")
_DIM = 4096  # hashed trigram space


def _trigrams(text: str) -> List[str]:
    t = _WS_RE.sub(" ", _CLEAN_RE.sub(" ", text.lower())).strip()
    padded = f" {t} "
    return [padded[i:i + 3] for i in range(len(padded) - 2)]


def _profile_vector(text: str) -> np.ndarray:
    """L2-normalized hashed trigram count vector — fully vectorized: the
    FNV-1a hash of every 3-char window is computed in three numpy passes
    over the codepoint array, counts via bincount (identical values to the
    per-trigram loop it replaced)."""
    t = _WS_RE.sub(" ", _CLEAN_RE.sub(" ", text.lower())).strip()
    padded = f" {t} "
    codes = np.frombuffer(padded.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(codes) - 2
    if n <= 0:
        return np.zeros(_DIM, dtype=np.float64)
    P = np.uint64(16777619)
    M = np.uint64(0xFFFFFFFF)
    h = np.full(n, 2166136261, dtype=np.uint64)
    for j in range(3):
        h = ((h ^ codes[j:j + n]) * P) & M
    vec = np.bincount((h % np.uint64(_DIM)).astype(np.int64), minlength=_DIM).astype(np.float64)
    norm = np.linalg.norm(vec)
    return vec / norm if norm > 0 else vec


def hash_trigram(g: str) -> int:
    # deterministic, process-independent (no PYTHONHASHSEED dependence)
    h = 2166136261
    for ch in g:
        h = ((h ^ ord(ch)) * 16777619) & 0xFFFFFFFF
    return h % _DIM


class LangIdKernel:
    """Actor: profiles built once; per-batch cosine over hashed trigrams."""

    def __init__(self, min_chars: int = 20) -> None:
        self.langs = list(_SEEDS)
        self.profiles = np.stack([_profile_vector(s) for s in _SEEDS.values()])  # (L, DIM)
        self.min_chars = min_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        langs: List[str] = []
        scores: List[float] = []
        for text in texts:
            if not text or len(text) < self.min_chars:
                langs.append("unknown")
                scores.append(0.0)
                continue
            v = _profile_vector(text)
            sims = self.profiles @ v
            best = int(np.argmax(sims))
            langs.append(self.langs[best])
            scores.append(float(sims[best]))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "lang_id": pa.array(langs, "string"),
                "lang_score": pa.array(scores, "float64"),
            }
        )


def language_id(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(LangIdKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))
