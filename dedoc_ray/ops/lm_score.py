"""Character-trigram LM quality scoring — the CCNet-shaped
"train a model on the corpus, then score the corpus with it" operator.

CCNet filters web text by KenLM perplexity (no KenLM here, and float
perplexities would defeat exact verification), so the score is the integer
core of the same signal: how familiar a document's character trigrams are
to a model trained on the corpus's own train split.

Pipeline shape (the part that matters at 100 TB):
1. TRAIN — map_batches over the deterministic train split (doc_id%10==0)
   emits per-batch partial trigram counts; ONE hash-partitioned shuffle of
   (trigram, n) partials sums them. The model vocabulary is bounded
   (ASCII trigrams), so the reduced table is tiny regardless of corpus
   size — it is collected once and ``ray.put`` broadcast.
2. SCORE — map_batches over ALL docs looks trigrams up in the broadcast
   model: per batch, np.unique over the batch's trigrams → ONE dict pass
   over unique grams → inverse-index scatter. No shuffle.

Everything is integer-valued and replayed exactly by the DuckDB oracle.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

_WS_RE = re.compile(r"[ \t\n\f\r]+")  # ASCII class, pinned like textstats
TRAIN_MOD = 10  # doc_id % TRAIN_MOD == 0 → train split


def _normalize(text: str) -> str:
    return _WS_RE.sub(" ", text.lower()).strip(" ")


def _trigrams(text: str) -> np.ndarray:
    """All character trigrams as a numpy S3 array (vector slicing)."""
    b = np.frombuffer(_normalize(text).encode("utf-8"), dtype="S1")
    if len(b) < 3:
        return np.empty(0, dtype="S3")
    from numpy.lib.stride_tricks import sliding_window_view

    return sliding_window_view(b, 3).view("S3").ravel()


def _partial_counts(batch: pa.Table) -> pa.Table:
    """Train-split batch → (trigram, n) partials (combiner before shuffle)."""
    grams: List[np.ndarray] = [
        _trigrams(t) for t in batch["text"].to_pylist()
    ]
    if grams:
        allg = np.concatenate(grams) if any(len(g) for g in grams) else np.empty(0, dtype="S3")
    else:
        allg = np.empty(0, dtype="S3")
    uniq, counts = np.unique(allg, return_counts=True)
    return pa.Table.from_pydict(
        {
            "g": pa.array([u.decode("utf-8", "replace") for u in uniq], "string"),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def train_trigram_model(sf_dir: str) -> Dict[str, int]:
    """Distributed trigram counts over the train split → small dict."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def train_only(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % TRAIN_MOD == 0))

    partials = docs.map_batches(train_only, batch_format="pyarrow").map_batches(
        _partial_counts, batch_format="pyarrow", batch_size=1024
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"g": pd.Series([], dtype="object"), "n": pd.Series([], dtype="int64")})
        return df.groupby("g", as_index=False)["n"].sum()

    reduced = hash_partition_apply(partials, ["g"], combine, num_parts=8).to_pandas()
    return dict(zip(reduced["g"], reduced["n"].astype(int)))


class LmScoreKernel:
    """Score every doc against the broadcast model (object-store ref is
    resolved ONCE per actor in __init__, not per batch)."""

    def __init__(self, model_ref) -> None:
        import ray

        self.model: Dict[str, int] = ray.get(model_ref) if not isinstance(model_ref, dict) else model_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tri, n_known, hits = [], [], []
        for text in batch["text"].to_pylist():
            grams = _trigrams(text)
            uniq, counts = np.unique(grams, return_counts=True)
            # one model lookup per UNIQUE gram, scattered back via counts
            model_counts = np.fromiter(
                (self.model.get(u.decode("utf-8", "replace"), 0) for u in uniq),
                dtype=np.int64, count=len(uniq),
            )
            n_tri.append(len(grams))
            n_known.append(int(counts[model_counts > 0].sum()))
            hits.append(int((model_counts * counts).sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_trigrams": pa.array(n_tri, "int64"),
                "n_known": pa.array(n_known, "int64"),
                "model_hits": pa.array(hits, "int64"),
            }
        )


def lm_score(sf_dir: str):
    import ray
    import ray.data as rd

    model = train_trigram_model(sf_dir)
    model_ref = ray.put(model)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        LmScoreKernel,
        fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )


# ------------------------------------------------------ sequence packing

PACK_BUDGET = 512  # tokens per training sequence


class PackKernel:
    """Contiguous-fill sequence packing inside one source shard: docs in
    doc_id order fill sequences of <= PACK_BUDGET whitespace tokens; a doc
    larger than the budget gets its own sequence (never split).

    seq_id = budget-floor of the EXCLUSIVE prefix sum after clamping each
    doc to the budget — deterministic, vectorized, and replayable by a SQL
    window cumsum. Packing never crosses shard boundaries, so shards pack
    in parallel with no coordination (the property that matters at 10^12
    docs: packing is embarrassingly parallel per shard)."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "source": pd.Series([], dtype="object"),
                 "n_tokens": pd.Series([], dtype="int64"), "seq_id": pd.Series([], dtype="int64")}
            )
        df = df.sort_values(["source", "doc_id"], kind="stable").reset_index(drop=True)
        out = []
        for source, g in df.groupby("source", sort=False):
            toks = g["n_tokens"].clip(upper=PACK_BUDGET).to_numpy()
            csum = np.concatenate([[0], np.cumsum(toks)[:-1]])  # exclusive
            # greedy contiguous fill: a doc starts a new sequence when its
            # clamped tokens would overflow the current one
            seq = np.zeros(len(toks), dtype=np.int64)
            cur_seq, cur_fill = 0, 0
            for i, t in enumerate(toks):
                if cur_fill + t > PACK_BUDGET and cur_fill > 0:
                    cur_seq += 1
                    cur_fill = 0
                seq[i] = cur_seq
                cur_fill += t
            out.append(pd.DataFrame(
                {"doc_id": g["doc_id"].to_numpy(), "source": source,
                 "n_tokens": g["n_tokens"].to_numpy(), "seq_id": seq}
            ))
        res = pd.concat(out, ignore_index=True)
        res["doc_id"] = res["doc_id"].astype("int64")
        res["n_tokens"] = res["n_tokens"].astype("int64")
        res["seq_id"] = res["seq_id"].astype("int64")
        return res


def pack_sequences(sf_dir: str):
    """Token counts (whitespace tokens, clamped) → per-shard greedy
    contiguous packing. One keyed shuffle on source; packing is pure
    vectorized work inside each key-complete partition."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])

    def count_tokens(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.list_value_length(pc.split_pattern_regex(batch["text"], r"[ \t\n\f\r]+"))
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "source": batch["source"], "n_tokens": pc.cast(n, "int64")}
        )

    counted = docs.map_batches(count_tokens, batch_format="pyarrow", batch_size=2048)
    return hash_partition_apply(counted, ["source"], PackKernel(), num_parts=8)


PACK_SEQUENCES_SQL = f"""
WITH RECURSIVE counted AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(text, '[ \\t\\n\\f\\r]+')) AS n_tokens,
         least(len(regexp_split_to_array(text, '[ \\t\\n\\f\\r]+')), {PACK_BUDGET}) AS t
  FROM documents
), packed AS (
  SELECT doc_id, source, n_tokens, t,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM counted
),
-- replay the greedy contiguous-fill rule with a per-source recursive scan
scan(doc_id, source, n_tokens, t, rn, seq_id, fill) AS (
  SELECT doc_id, source, n_tokens, t, rn, CAST(0 AS BIGINT), CAST(t AS BIGINT)
  FROM packed WHERE rn = 1
  UNION ALL
  SELECT p.doc_id, p.source, p.n_tokens, p.t, p.rn,
         CASE WHEN s.fill + p.t > {PACK_BUDGET} AND s.fill > 0 THEN s.seq_id + 1 ELSE s.seq_id END,
         CASE WHEN s.fill + p.t > {PACK_BUDGET} AND s.fill > 0 THEN CAST(p.t AS BIGINT) ELSE s.fill + p.t END
  FROM scan s JOIN packed p ON p.source = s.source AND p.rn = s.rn + 1
)
SELECT doc_id, source, n_tokens, seq_id FROM scan
"""


LM_SCORE_SQL = f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[ \\t\\n\\f\\r]+', ' ', 'g')) AS t
  FROM documents
), tri AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(length(t) - 2, 0) + 1),
                                       i -> substr(t, CAST(i AS INTEGER), 3))) AS g
  FROM norm
), model AS (
  SELECT g, count(*) AS c FROM tri WHERE doc_id % {TRAIN_MOD} = 0 GROUP BY g
)
SELECT tri.doc_id,
       count(*) AS n_trigrams,
       count(model.g) AS n_known,
       COALESCE(sum(model.c), 0)::BIGINT AS model_hits
FROM tri LEFT JOIN model USING (g)
GROUP BY tri.doc_id
"""
