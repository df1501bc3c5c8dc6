"""Term-match retrieval — keyword search over the corpus, exactly.

The text-side sibling of ``ops/knn.py``: score every document against a
small query set by summed term frequency (the integer core of BM25 —
the idf/length normalization is a monotone per-(query,doc) float rescale
layered on downstream; keeping the score integral keeps the DuckDB
oracle exact).

Shape — identical to knn_bruteforce's streaming top-k:
  - the query set is TINY and broadcast (``ray.put`` once, read per
    actor in ``__init__``), the corpus streams;
  - each batch emits only its per-query top-k candidate rows (partial
    combiner), so the final merge sees <= k x n_batches rows per query,
    never the corpus;
  - deterministic: score desc, doc_id asc; zero-score docs drop.

Queries are derived deterministically from the corpus itself (the first
QUERY_TERMS tokens of every QUERY_STRIDE-th document), so the op needs
no external input and the oracle can re-derive them."""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Tuple

import pandas as pd
import pyarrow as pa

from dedoc_ray.ops.textstats import TOKEN_RE

TOP_K = 5
QUERY_STRIDE = 50
QUERY_TERMS = 3


def build_queries(sf_dir: str) -> List[Tuple[int, List[str]]]:
    """(qid, terms) for every QUERY_STRIDE-th doc — a bounded driver-side
    read of just those rows (predicate-pushdown scan, tiny result)."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    ds = pads.dataset(f"{sf_dir}/documents.parquet")
    # Expression has no %, so push down a range bound instead: scan doc_id
    # alone (cheap column prune) for the max, then a tiny isin filter.
    hi = pc.max(ds.to_table(columns=["doc_id"])["doc_id"]).as_py()
    wanted = list(range(0, hi + 1, QUERY_STRIDE))
    tbl = ds.to_table(columns=["doc_id", "text"],
                      filter=pads.field("doc_id").isin(wanted))
    out: List[Tuple[int, List[str]]] = []
    for doc_id, text in sorted(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())):
        terms = TOKEN_RE.findall(text.lower())[:QUERY_TERMS]
        if terms:
            out.append((doc_id // QUERY_STRIDE, terms))
    return out


class TermScoreKernel:
    """batch -> per-query top-k partial (qid, doc_id, score) rows."""

    def __init__(self, queries_ref, k: int = TOP_K) -> None:
        import ray

        self.queries: List[Tuple[int, List[str]]] = (
            ray.get(queries_ref) if not isinstance(queries_ref, list) else queries_ref
        )
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: List[int] = []
        dids: List[int] = []
        scores: List[int] = []
        tf_rows = []
        ids = batch["doc_id"].to_pylist()
        for text in batch["text"].to_pylist():
            tf_rows.append(Counter(TOKEN_RE.findall(text.lower())))
        for qid, terms in self.queries:
            cand = [
                (sum(tf[t] for t in terms), did)
                for tf, did in zip(tf_rows, ids)
            ]
            cand = sorted(((s, d) for s, d in cand if s > 0), key=lambda x: (-x[0], x[1]))
            for s, d in cand[: self.k]:
                qids.append(qid)
                dids.append(d)
                scores.append(s)
        return pa.Table.from_pydict(
            {
                "qid": pa.array(qids, "int64"),
                "doc_id": pa.array(dids, "int64"),
                "score": pa.array(scores, "int64"),
            }
        )


def _final_topk_factory(k: int):
    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "qid": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["qid", "score", "doc_id"], ascending=[True, False, True],
                            kind="stable")
        return df.groupby("qid", as_index=False).head(k).astype(
            {"qid": "int64", "doc_id": "int64", "score": "int64"}
        )

    return final


def term_search(sf_dir: str, k: int = TOP_K, num_parts: int = 8):
    """Top-k docs per derived query by summed term frequency."""
    import ray
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    queries_ref = ray.put(build_queries(sf_dir))
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    partials = docs.map_batches(
        TermScoreKernel,
        fn_constructor_kwargs={"queries_ref": queries_ref, "k": k},
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
    )
    return hash_partition_apply(partials, ["qid"], _final_topk_factory(k), num_parts=num_parts)


TERM_SEARCH_SQL = f"""
WITH qdocs AS (
  SELECT doc_id // {QUERY_STRIDE} AS qid,
         regexp_extract_all(lower(text), '[a-z0-9]+')[1:{QUERY_TERMS}] AS terms
  FROM documents WHERE doc_id % {QUERY_STRIDE} = 0 AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
), qt AS (
  SELECT qid, unnest(terms) AS term FROM qdocs
), tf AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents
), scores AS (
  SELECT qt.qid, tf.doc_id, CAST(count(*) AS BIGINT) AS score
  FROM qt JOIN tf ON qt.term = tf.term
  GROUP BY qt.qid, tf.doc_id
)
SELECT qid, doc_id, score FROM scores
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) <= {TOP_K}
"""
