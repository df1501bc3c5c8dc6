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


# ------------------------------------------------------- ranked retrieval


def _query_terms(queries: List[Tuple[int, List[str]]]) -> List[str]:
    return sorted({t for _, terms in queries for t in terms})


class QueryDFKernel:
    """batch -> partial document frequencies for the (tiny) query-term set.

    Emits at most |query terms| rows per batch regardless of batch size —
    the classic combiner: the global df reduce downstream sees
    O(n_batches x |terms|) rows, never the corpus."""

    def __init__(self, terms_ref) -> None:
        import ray

        terms = ray.get(terms_ref) if not isinstance(terms_ref, list) else terms_ref
        self.terms = set(terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df: Counter = Counter()
        for text in batch["text"].to_pylist():
            present = self.terms.intersection(TOKEN_RE.findall(text.lower()))
            df.update(present)
        items = sorted(df.items())
        return pa.Table.from_pydict(
            {
                "term": pa.array([t for t, _ in items], "string"),
                "df": pa.array([c for _, c in items], "int64"),
            }
        )


def compute_term_weights(sf_dir: str, queries: List[Tuple[int, List[str]]]) -> Dict[str, int]:
    """{term: N // df} integer idf weights — the monotone integer core of
    BM25's idf. The corpus streams through a df combiner; the driver only
    ever sees the per-batch partials (<= n_batches x |terms| tiny rows)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    terms = _query_terms(queries)
    if not terms:
        return {}
    n_docs = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()  # metadata only
    import ray

    terms_ref = ray.put(terms)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    partials = docs.map_batches(
        QueryDFKernel,
        fn_constructor_kwargs={"terms_ref": terms_ref},
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
    ).to_pandas()  # provably tiny: combiner partials, never corpus rows
    df = partials.groupby("term")["df"].sum()
    return {t: int(n_docs) // int(df[t]) for t in df.index}


class WeightedTermScoreKernel(TermScoreKernel):
    """TermScoreKernel with per-term integer idf weights:
    score(q, d) = sum over q's terms (dups counted) of tf(t, d) * w(t)."""

    def __init__(self, queries_ref, weights_ref, k: int = TOP_K) -> None:
        super().__init__(queries_ref, k=k)
        import ray

        self.weights: Dict[str, int] = (
            ray.get(weights_ref) if not isinstance(weights_ref, dict) else weights_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: List[int] = []
        dids: List[int] = []
        scores: List[int] = []
        ids = batch["doc_id"].to_pylist()
        tf_rows = [Counter(TOKEN_RE.findall(t.lower())) for t in batch["text"].to_pylist()]
        w = self.weights
        for qid, terms in self.queries:
            tw = [(t, w.get(t, 0)) for t in terms]
            cand = sorted(
                ((s, d) for s, d in (
                    (sum(tf[t] * wt for t, wt in tw), did) for tf, did in zip(tf_rows, ids)
                ) if s > 0),
                key=lambda x: (-x[0], x[1]),
            )
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


def ranked_search(sf_dir: str, k: int = TOP_K, num_parts: int = 8):
    """BM25-shaped top-k: summed tf x integer-idf (w = N // df) per query.

    Two streaming passes — a df combiner pass to train the weights (the
    lm_score/dsir train-then-score shape), then the same broadcast-query
    partial-top-k scan as term_search. Both passes stream; only the
    |query terms|-sized weight dict is ever collected or broadcast."""
    import ray
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    queries = build_queries(sf_dir)
    weights = compute_term_weights(sf_dir, queries)
    queries_ref = ray.put(queries)
    weights_ref = ray.put(weights)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    partials = docs.map_batches(
        WeightedTermScoreKernel,
        fn_constructor_kwargs={"queries_ref": queries_ref, "weights_ref": weights_ref, "k": k},
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
    )
    return hash_partition_apply(partials, ["qid"], _final_topk_factory(k), num_parts=num_parts)


RANKED_SEARCH_SQL = f"""
WITH qdocs AS (
  SELECT doc_id // {QUERY_STRIDE} AS qid,
         regexp_extract_all(lower(text), '[a-z0-9]+')[1:{QUERY_TERMS}] AS terms
  FROM documents WHERE doc_id % {QUERY_STRIDE} = 0 AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
), qt AS (
  SELECT qid, unnest(terms) AS term FROM qdocs
), tf AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents
), n AS (
  SELECT count(*) AS n_docs FROM documents
), w AS (
  SELECT term, (SELECT n_docs FROM n) // count(DISTINCT doc_id) AS weight
  FROM tf WHERE term IN (SELECT DISTINCT term FROM qt)
  GROUP BY term
), scores AS (
  SELECT qt.qid, tf.doc_id, CAST(sum(w.weight) AS BIGINT) AS score
  FROM qt JOIN tf ON qt.term = tf.term JOIN w ON w.term = qt.term
  GROUP BY qt.qid, tf.doc_id
)
SELECT qid, doc_id, score FROM scores WHERE score > 0
QUALIFY row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) <= {TOP_K}
"""


# ----------------------------------------------- inverted index (postings)


NUM_TERM_BUCKETS = 32


def _term_bucket(term: str, num_buckets: int = NUM_TERM_BUCKETS) -> int:
    from dedoc_ray.ops.dedup import _stable_hash64

    return _stable_hash64(term) % num_buckets


class PostingsKernel:
    """batch -> (term, doc_id, tf, bucket) posting rows.

    The per-unique-term md5 bucket hash amortizes through the actor's
    LRU cache (token frequency is Zipfian)."""

    def __init__(self, num_buckets: int = NUM_TERM_BUCKETS) -> None:
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        import itertools

        import numpy as np
        import pandas as pd

        terms: List[str] = []
        dids: List[int] = []
        tfs: List[int] = []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            c = Counter(TOKEN_RE.findall(text.lower()))
            terms.extend(c.keys())
            tfs.extend(c.values())
            dids.extend(itertools.repeat(did, len(c)))
        # bucket hash once per batch-unique term, broadcast back via codes
        codes, uniques = pd.factorize(pd.array(terms, dtype=object))
        ubuckets = np.fromiter(
            (_term_bucket(t, self.num_buckets) for t in uniques), np.int32, len(uniques)
        )
        return pa.Table.from_pydict(
            {
                "term": pa.array(terms, "string"),
                "doc_id": pa.array(dids, "int64"),
                "tf": pa.array(tfs, "int64"),
                "bucket": pa.array(ubuckets[codes], "int32"),
            }
        )


def build_term_index(sf_dir: str, index_dir: str, num_buckets: int = NUM_TERM_BUCKETS) -> str:
    """Write the corpus's inverted index as term-hash-bucketed parquet.

    The text-side sibling of ``ops/knn.py::ivf_build_index``: postings
    stream straight from the tokenizer to a hive-partitioned sink
    (``bucket=<h>/``), so a later search opens ONLY the buckets its query
    terms hash to — I/O scales with |query terms| / num_buckets, not
    corpus size. ``meta.json`` records n_docs (for idf) and the bucket
    modulus (index and search must agree on the hash). A pre-existing
    index_dir is removed first — write_parquet appends uniquely-named
    files, so rebuilding in place would duplicate postings."""
    import json
    import os
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)

    import pyarrow.dataset as pads
    import ray.data as rd

    n_docs = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    docs.map_batches(
        PostingsKernel,
        fn_constructor_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow", batch_size=1024, concurrency=(2, 8),
    ).write_parquet(os.path.join(index_dir, "postings"), partition_cols=["bucket"])
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump({"n_docs": int(n_docs), "num_buckets": num_buckets}, fh)
    return index_dir


def term_search_indexed(index_dir: str, sf_dir: str, k: int = TOP_K, num_parts: int = 8):
    """ranked_search over the prebuilt index: open only the query terms'
    hash buckets, derive idf from the postings themselves, one qid shuffle.

    Equals ``ranked_search`` exactly (same weights, same tiebreak) while
    reading |query-term buckets| / num_buckets of the index instead of
    re-tokenizing the corpus twice — asserted in pytest and sharing the
    same DuckDB oracle."""
    import glob
    import json
    import os

    import pandas as pd
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)
    n_docs, num_buckets = meta["n_docs"], meta["num_buckets"]

    queries = build_queries(sf_dir)
    qterms = _query_terms(queries)
    if not qterms:
        return rd.from_arrow(pa.Table.from_pydict(
            {"qid": pa.array([], "int64"), "doc_id": pa.array([], "int64"),
             "score": pa.array([], "int64")}))

    needed = sorted({_term_bucket(t, num_buckets) for t in qterms})
    paths = [
        f
        for b in needed
        for f in sorted(glob.glob(os.path.join(index_dir, "postings", f"bucket={b}", "*.parquet")))
    ]
    postings = rd.read_parquet(paths, columns=["term", "doc_id", "tf"])
    qset = pa.array(qterms, "string")
    postings = postings.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=qset)), batch_format="pyarrow"
    )

    # idf straight from the postings: df(t) = |posting rows of t| (tf rows
    # are per (term, doc)); the aggregate output is <= |qterms| rows
    dfc = postings.groupby("term").count().to_pandas()  # tiny: one row per query term
    weights = {t: n_docs // int(c) for t, c in zip(dfc["term"], dfc["count()"])}

    # every query term occurrence contributes tf x w to its (qid, doc) —
    # expressed as a tiny (term, qid, weight) table merged (vectorized)
    # against each postings batch
    qt_rows = [(t, qid, weights.get(t, 0)) for qid, terms in queries for t in terms]
    qt_df = pd.DataFrame(qt_rows, columns=["term", "qid", "w"])
    contrib_ref = ray.put(qt_df)

    def expand(batch: pa.Table) -> pa.Table:
        qt = ray.get(contrib_ref) if not isinstance(contrib_ref, pd.DataFrame) else contrib_ref
        df = batch.to_pandas().merge(qt, on="term", how="inner")
        return pa.Table.from_pydict(
            {
                "qid": pa.array(df["qid"].to_numpy("int64"), "int64"),
                "doc_id": pa.array(df["doc_id"].to_numpy("int64"), "int64"),
                "score": pa.array((df["tf"] * df["w"]).to_numpy("int64"), "int64"),
            }
        )

    contribs = postings.map_batches(expand, batch_format="pyarrow")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"qid": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="int64")}
            )
        agg = df.groupby(["qid", "doc_id"], as_index=False)["score"].sum()
        agg = agg[agg["score"] > 0]
        agg = agg.sort_values(["qid", "score", "doc_id"], ascending=[True, False, True],
                              kind="stable")
        return agg.groupby("qid", as_index=False).head(k).astype(
            {"qid": "int64", "doc_id": "int64", "score": "int64"}
        )

    return hash_partition_apply(contribs, ["qid"], finalize, num_parts=num_parts)


def update_term_index(sf_dir: str, index_dir: str, doc_filter=None) -> str:
    """Incrementally ADD documents to an existing index (no rebuild).

    Postings are append-only facts keyed by (term, doc_id): new docs'
    rows land as extra uniquely-named files inside the same
    ``bucket=<h>/`` hive directories, so search needs no code change and
    old files are never rewritten — the crawl-ingest shape where each
    snapshot's postings append in one streaming pass. ``meta.json``'s
    n_docs is bumped so idf reflects the grown corpus.

    ``doc_filter``: optional pyarrow-compute predicate (batch -> bool
    mask) selecting the NEW docs in sf_dir (defaults to all rows — the
    caller dedups against the index's manifest in real ingest)."""
    import json
    import os

    import pyarrow.dataset as pads
    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as fh:
        meta = json.load(fh)

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_new = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    if doc_filter is not None:
        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(doc_filter(batch))

        docs = docs.map_batches(keep, batch_format="pyarrow")
        n_new = docs.count()
    docs.map_batches(
        PostingsKernel,
        fn_constructor_kwargs={"num_buckets": meta["num_buckets"]},
        batch_format="pyarrow", batch_size=1024, concurrency=(2, 8),
    ).write_parquet(os.path.join(index_dir, "postings"), partition_cols=["bucket"])

    meta["n_docs"] = int(meta["n_docs"]) + int(n_new)
    with open(os.path.join(index_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    return index_dir
