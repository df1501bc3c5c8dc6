"""Web link graph: anchor extraction and PageRank — the hyperlink half of a
web-scale corpus pipeline.

The reference engine stops at per-document extraction; a crawl corpus also
carries its link structure, and the canonical graph computations over it are
(1) building the edge table from extracted ``<a href>`` anchors and
(2) PageRank over that graph (the original web-scale batch job).

Design (100 TB shape):

- **Edges come out of the extraction pipeline**, not a separate parse: the
  HTML reader already annotates every ``<a>`` span as a ``linked_text``
  annotation carrying the href (readers/html/annotations.py — reference
  HtmlReader keeps the same attribute). ``extract_links`` is a flat_map over
  extracted rows: (src, dst, anchor) per annotation. Map-only, no shuffle.
- **PageRank is the textbook repeated all-to-all** — one src-keyed shuffle
  to join ranks with edges (contribution pass) and one dst-keyed groupby-sum
  per iteration; nothing is broadcast and no driver state grows with the
  graph. Ranks ride as integers (SCALE = 1e12) with truncating division, so
  the result is bit-exact regardless of partitioning/order — the DuckDB
  oracle replays the same iterations with integer arithmetic.
- Dangling-safe: every rank row also emits a zero contribution to itself, so
  nodes without in-links survive the groupby without an extra left-join
  shuffle.
- The synthetic graph: each page links to 3 md5-derived targets
  (``(src + 1 + h % (N-1)) % N`` — never self), replayed verbatim in SQL.
  At real scale the edge table would be written once as parquet and reused
  across iterations; here ``materialize()`` pins it so the lazy iteration
  DAG does not regenerate it per round.
"""

from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

N_LINKS = 3
SCALE = 1_000_000_000_000  #: integer rank scale (r0 = SCALE for every node)
DAMP_NUM, DAMP_DEN = 85, 100  #: damping 0.85 as an exact ratio
BASE = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN  #: (1-d)·SCALE
PAGERANK_ITERS = 3


def _corpus_size(sf_dir: str) -> int:
    """Row count from parquet metadata — O(1), no data read."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _targets(doc_id: int, n_docs: int) -> List[int]:
    """The synthetic out-links of one page: md5-derived, never self,
    deduplicated (sorted for determinism)."""
    out = set()
    for j in range(1, N_LINKS + 1):
        h = int(hashlib.md5(f"link:{doc_id}:{j}".encode()).hexdigest()[:8], 16)
        out.add((doc_id + 1 + h % (n_docs - 1)) % n_docs)
    return sorted(out)


# --------------------------------------------------------- anchor extraction


def link_pages(sf_dir: str):
    """documents → synthetic crawl pages whose body is anchor links."""
    import ray.data as rd

    n_docs = _corpus_size(sf_dir)

    def gen(batch: pa.Table) -> pa.Table:
        urls, payloads = [], []
        for doc_id in batch["doc_id"].to_pylist():
            anchors = " ".join(
                f'see <a href="https://synth.test/page/{dst}.html">doc {dst}</a>'
                for dst in _targets(doc_id, n_docs)
            )
            urls.append(f"https://synth.test/link/{doc_id}.html")
            payloads.append(f"<html><body><p>{anchors}</p></body></html>".encode())
        return pa.Table.from_pydict(
            {"url": pa.array(urls, "string"), "html": pa.array(payloads, "binary")}
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(gen, batch_format="pyarrow")


def extract_links(sf_dir: str):
    """Crawl pages → real HTML extraction → edge table (src, dst, anchor)
    from the linked_text annotations. Map-only."""
    from dedoc_ray.pipeline.extract import extract_pages

    ds = extract_pages(link_pages(sf_dir), concurrency=None)

    def edges(batch: pa.Table) -> pa.Table:
        src_col, dst_col, anchor_col = [], [], []
        for url, text, nodes, anns in zip(
            batch["url"].to_pylist(),
            batch["extracted_text"].to_pylist(),
            batch["nodes"].to_pylist(),
            batch["annotations"].to_pylist(),
        ):
            src = int(url.rsplit("/", 1)[1].split(".")[0])
            starts = {n["node_id"]: n["text_start"] for n in nodes}
            for a in anns:
                if a["name"] != "linked_text" or not a["value"]:
                    continue
                base = starts.get(a["node_id"], 0)
                src_col.append(src)
                dst_col.append(int(a["value"].rsplit("/", 1)[1].split(".")[0]))
                anchor_col.append(text[base + a["start"] : base + a["end"]])
        return pa.Table.from_pydict(
            {
                "src": pa.array(src_col, "int64"),
                "dst": pa.array(dst_col, "int64"),
                "anchor": pa.array(anchor_col, "string"),
            }
        )

    return ds.map_batches(edges, batch_format="pyarrow")


EXTRACT_LINKS_SQL = f"""
WITH n AS (SELECT count(*) AS c FROM documents),
t AS (
  SELECT d.doc_id AS src,
         (d.doc_id + 1 + CAST('0x' || substr(md5('link:' || d.doc_id || ':' || u.j), 1, 8) AS BIGINT)
            % (n.c - 1)) % n.c AS dst
  FROM documents d, n, UNNEST([1, 2, 3]) AS u(j)
)
SELECT DISTINCT src, dst, 'doc ' || dst AS anchor FROM t
"""


# --------------------------------------------------------------- pagerank


def edge_table(sf_dir: str):
    """(src, dst, outdeg) Dataset straight from the link formula (the
    already-oracled extraction is bypassed — at scale this is the parquet
    edge artifact the extraction job wrote)."""
    import ray.data as rd

    n_docs = _corpus_size(sf_dir)

    def gen(batch: pa.Table) -> pa.Table:
        src_col, dst_col, deg_col = [], [], []
        for doc_id in batch["doc_id"].to_pylist():
            dsts = _targets(doc_id, n_docs)
            for dst in dsts:
                src_col.append(doc_id)
                dst_col.append(dst)
                deg_col.append(len(dsts))
        return pa.Table.from_pydict(
            {
                "src": pa.array(src_col, "int64"),
                "dst": pa.array(dst_col, "int64"),
                "outdeg": pa.array(deg_col, "int64"),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(gen, batch_format="pyarrow")


def pagerank(sf_dir: str, iters: int = PAGERANK_ITERS, num_parts: int = 8):
    """Integer PageRank over the link graph, ``iters`` power iterations.

    Per iteration: ONE src-keyed shuffle joins ranks with edges and emits
    per-edge contributions ``rank // outdeg`` (plus a zero self-row per
    node so dangling/unlinked nodes survive), then ONE dst-keyed
    groupby-sum folds them; the new rank is ``BASE + 85·insum // 100`` —
    all truncating integer ops, so the result is independent of partition
    count and merge order, and the DuckDB oracle replays it exactly.
    """
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    edges = edge_table(sf_dir).materialize()  # reused every iteration
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    ranks = docs.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "key": b["doc_id"].cast(pa.int64()),
                "rank": pa.array([SCALE] * b.num_rows, "int64"),
            }
        ),
        batch_format="pyarrow",
    )

    def contrib_part(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["kind"] == 0]
        e = df[df["kind"] == 1]
        merged = e.drop(columns=["rank"]).merge(r[["key", "rank"]], on="key", how="inner")
        out_node = np.concatenate([merged["dst"].to_numpy(np.int64), r["key"].to_numpy(np.int64)])
        out_c = np.concatenate(
            [
                merged["rank"].to_numpy(np.int64) // merged["outdeg"].to_numpy(np.int64),
                np.zeros(len(r), np.int64),  # zero self-rows keep unlinked nodes alive
            ]
        )
        return pd.DataFrame({"node": out_node, "contrib": out_c})

    for _ in range(iters):
        tagged_r = ranks.map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "key": b["key"],
                    "kind": pa.array([0] * b.num_rows, "int8"),
                    "rank": b["rank"],
                    "dst": pa.array([0] * b.num_rows, "int64"),
                    "outdeg": pa.array([1] * b.num_rows, "int64"),
                }
            ),
            batch_format="pyarrow",
        )
        tagged_e = edges.map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "key": b["src"],
                    "kind": pa.array([1] * b.num_rows, "int8"),
                    "rank": pa.array([0] * b.num_rows, "int64"),
                    "dst": b["dst"],
                    "outdeg": b["outdeg"],
                }
            ),
            batch_format="pyarrow",
        )
        contribs = hash_partition_apply(tagged_r.union(tagged_e), ["key"], contrib_part, num_parts=num_parts)
        # per-block combiner BEFORE the dst shuffle (integer sums associate,
        # so partial folds are exact); the final sum runs inside the second
        # keyed shuffle instead of a native hash-aggregate — the aggregate
        # operator's 32-partition actor pool costs ~10 s of fixed overhead
        # per iteration at bench scale (same finding as late_events)
        combined = contribs.map_batches(
            lambda df: df.groupby("node", as_index=False)["contrib"].sum(),
            batch_format="pandas",
        )

        def sum_part(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", as_index=False)["contrib"].sum()
            s = g["contrib"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "key": g["node"].to_numpy(np.int64),
                    "rank": BASE + (DAMP_NUM * s) // DAMP_DEN,
                }
            )

        ranks = hash_partition_apply(combined, ["node"], sum_part, num_parts=num_parts)

    return ranks.map_batches(
        lambda b: pa.Table.from_pydict({"doc_id": b["key"], "rank": b["rank"]}),
        batch_format="pyarrow",
    )


def _rank_iter_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT r.node, CAST({BASE} + ({DAMP_NUM} * COALESCE(s.insum, 0)) // {DAMP_DEN} AS BIGINT) AS rank
  FROM {prev} r
  LEFT JOIN (
    SELECT ed.dst AS node, SUM(r2.rank // ed.outdeg) AS insum
    FROM ed JOIN {prev} r2 ON ed.src = r2.node
    GROUP BY ed.dst
  ) s USING (node)
)"""


def pagerank_sql(iters: int = PAGERANK_ITERS) -> str:
    chain = ",".join(_rank_iter_sql(f"r{i}", f"r{i + 1}") for i in range(iters))
    return f"""
WITH n AS (SELECT count(*) AS c FROM documents),
t AS (
  SELECT d.doc_id AS src,
         (d.doc_id + 1 + CAST('0x' || substr(md5('link:' || d.doc_id || ':' || u.j), 1, 8) AS BIGINT)
            % (n.c - 1)) % n.c AS dst
  FROM documents d, n, UNNEST([1, 2, 3]) AS u(j)
),
e AS (SELECT DISTINCT src, dst FROM t),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg USING (src)),
r0 AS (SELECT doc_id AS node, CAST({SCALE} AS BIGINT) AS rank FROM documents),
{chain}
SELECT node AS doc_id, rank FROM r{iters}
"""
