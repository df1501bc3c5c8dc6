"""Distributed BPE merge training — the iterative-algorithm pattern.

Byte-pair-encoding training (Sennrich et al., ACL 2016) repeatedly
merges the corpus's most frequent adjacent symbol pair. The scalable
shape is the classic two-level one:

  1. collapse the corpus ONCE to a (word, tf) table — per-batch
     combiners + one keyed shuffle (same as ops/vocab.py). All further
     rounds run over this table, which is vocabulary-bounded: corpus
     text is never touched again.
  2. each merge round is map_batches over the word table (apply the
     merges learned so far, emit partial adjacent-pair counts weighted
     by tf) → ONE small keyed shuffle sums pair counts → the driver
     picks the argmax pair (count desc, pair asc — deterministic) and
     broadcasts the grown merge list for the next round.

R rounds cost R streaming passes over the word table and R tiny
shuffles; the driver only ever holds pair-count aggregates (bounded by
the symbol-pair vocabulary), never the corpus.

No SQL oracle — iterative argmax feedback is not expressible in one
DuckDB query; correctness is pytest exact-equality against a
single-process reference BPE on the same corpus (the same standard the
IVF ANN ops use)."""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

import pandas as pd
import pyarrow as pa

from dedoc_ray.ops.textstats import TOKEN_RE

N_MERGES_DEFAULT = 8


def _apply_merges(symbols: Tuple[str, ...], merges: List[Tuple[str, str]]) -> Tuple[str, ...]:
    """Apply learned merges in learned order (each exhaustively, left to
    right) — deterministic, matches the reference trainer below."""
    for a, b in merges:
        out: List[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = tuple(out)
    return symbols


class PairCountKernel:
    """(word, tf) batch -> partial (a, b, n) adjacent-pair counts after
    applying the broadcast merge list."""

    def __init__(self, merges_ref) -> None:
        import ray

        self.merges: List[Tuple[str, str]] = (
            ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for word, tf in zip(batch["token"].to_pylist(), batch["tf"].to_pylist()):
            syms = _apply_merges(tuple(word), self.merges)
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += tf
        pairs = list(counts)
        return pa.Table.from_pydict(
            {
                "a": pa.array([p[0] for p in pairs], "string"),
                "b": pa.array([p[1] for p in pairs], "string"),
                "n": pa.array([counts[p] for p in pairs], "int64"),
            }
        )


def _word_counts(sf_dir: str):
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply
    from dedoc_ray.ops.vocab import TokenPartialKernel

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    partials = docs.map_batches(
        TokenPartialKernel, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"token": pd.Series([], dtype="string"), "tf": pd.Series([], dtype="int64")}
            )
        return df.groupby("token", as_index=False)["tf"].sum()

    return hash_partition_apply(
        partials.select_columns(["token", "tf"]), ["token"], combine, num_parts=8
    )


def bpe_merges(sf_dir: str, n_merges: int = N_MERGES_DEFAULT):
    """Learn the first ``n_merges`` BPE merges over the corpus; returns a
    pyarrow Table (rank, left, right) — tiny and deterministic."""
    words = _word_counts(sf_dir).materialize()  # vocabulary-bounded, reused every round

    merges: List[Tuple[str, str]] = []
    for rank in range(n_merges):
        # task-based: a fresh actor pool per round cost ~1.5s of spinup × R
        # rounds; the "state" is a ≤R-pair list, cheap to ship per task.
        # batch_size=None → ONE Counter-combined partial per word-table
        # BLOCK, and the word table has exactly num_parts(=8) blocks from
        # _word_counts' keyed shuffle — so the driver pull is bounded by
        # 8 × |pair alphabet| regardless of corpus size (r2 verdict #3),
        # with no per-round shuffle (a keyed exchange per round costs ~2 s
        # of fixed Ray overhead × R rounds — the round-2e lesson).
        kernel = PairCountKernel(list(merges))
        pairs = words.map_batches(
            lambda b: kernel(b), batch_format="pyarrow", batch_size=None
        ).to_pandas()
        if pairs.empty:
            break
        agg = pairs.groupby(["a", "b"], as_index=False)["n"].sum()
        agg = agg.sort_values(["n", "a", "b"], ascending=[False, True, True], kind="stable")
        best = agg.iloc[0]
        if int(best["n"]) < 2:
            break
        merges.append((str(best["a"]), str(best["b"])))
    return pa.Table.from_pydict(
        {
            "rank": pa.array(range(len(merges)), "int64"),
            "left": pa.array([m[0] for m in merges], "string"),
            "right": pa.array([m[1] for m in merges], "string"),
        }
    )


def bpe_merges_reference(word_tf: Dict[str, int], n_merges: int = N_MERGES_DEFAULT):
    """Single-process reference trainer (for pytest equality)."""
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for word, tf in word_tf.items():
            syms = _apply_merges(tuple(word), merges)
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += tf
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
    return merges


# ----------------------------------------------------------- encoding


class BpeEncodeKernel:
    """batch -> (doc_id, n_tokens, n_bpe) with the learned merges applied.

    The merge list is broadcast once (``ray.put`` in the driver, ``ray.get``
    in ``__init__``); per-word encodings are LRU-cached in the actor, so the
    Zipfian word distribution amortizes _apply_merges to near zero."""

    def __init__(self, merges_ref) -> None:
        import ray
        from functools import lru_cache

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.merges: List[Tuple[str, str]] = [tuple(m) for m in merges]

        @lru_cache(maxsize=1 << 18)
        def encoded_len(word: str) -> int:
            return len(_apply_merges(tuple(word), self.merges))

        self._encoded_len = encoded_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        n_tokens: List[int] = []
        n_bpe: List[int] = []
        for text in batch["text"].to_pylist():
            toks = TOKEN_RE.findall(text.lower())
            n_tokens.append(len(toks))
            n_bpe.append(sum(self._encoded_len(t) for t in toks))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, "int64"),
                "n_tokens": pa.array(n_tokens, "int64"),
                "n_bpe": pa.array(n_bpe, "int64"),
            }
        )


def bpe_encode(sf_dir: str, n_merges: int = N_MERGES_DEFAULT):
    """Train-then-apply: distributed merge training, then one streaming
    encode pass with the merges broadcast. Output is integer-exact and
    deterministic; equality with a single-process reference encoder is
    asserted in pytest (iterative training keeps the op rows-only in SQL)."""
    import ray
    import ray.data as rd

    mt = bpe_merges(sf_dir, n_merges=n_merges)
    merges = list(zip(mt["left"].to_pylist(), mt["right"].to_pylist()))
    merges_ref = ray.put(merges)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        BpeEncodeKernel,
        fn_constructor_kwargs={"merges_ref": merges_ref},
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
    )
