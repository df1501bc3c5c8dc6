"""Connected components over duplicate pairs — the clustering step that
turns pairwise near-dup hits into dedup decisions (every doc maps to the
canonical = minimum doc_id of its component, the standard large-scale
corpus-dedup finisher after MinHash/Jaccard pair generation).

Algorithm: distributed min-label propagation. Labels start as doc_id; each
round ships every edge its source's current label (one keyed shuffle on
src) and then takes the per-doc minimum over incoming candidates (second
keyed shuffle on doc). Iteration stops when no label changed. Rounds are
O(component diameter) — near-dup components are overwhelmingly star/clique
shaped, so 2-4 rounds close almost everything; ``max_rounds`` bounds
adversarial chains. Nothing but (int64 key, int64 label) rows ever move,
and the convergence check is a per-round scalar aggregate — no driver
materialization of the label table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _int64_frame(**cols) -> pd.DataFrame:
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in cols.items()})


def connected_components(pairs_ds, pairs_cols=("doc_a", "doc_b"), max_rounds: int = 8,
                         small_graph_edges: int = 5_000_000):
    """(doc_a, doc_b) pair Dataset → (doc_id, cluster_id) Dataset with
    cluster_id = min doc_id of the component. Docs in no pair are not
    emitted (callers union corpus singletons if they need them)."""
    from dedoc_ray.ops.shuffle import hash_partition_apply

    a, b = pairs_cols

    def to_edges(batch: pa.Table) -> pa.Table:
        da = batch[a].to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch[b].to_numpy(zero_copy_only=False).astype(np.int64)
        # both directions so min labels flow each way
        return pa.Table.from_pydict(
            {"src": pa.array(np.concatenate([da, db])), "dst": pa.array(np.concatenate([db, da]))}
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()

    # scale-adaptive: a small edge set (bounded collect — 5M pairs is
    # ~80 MB of int64s) solves in one local union-find instead of paying
    # several shuffle rounds of fixed DAG overhead; the iterative path
    # below is the >5M-edge design (same outputs, property-checked in
    # tests by forcing small_graph_edges=0). This mirrors the broadcast-
    # vs-shuffle join cutover: pick the physical plan by measured size.
    if edges.count() <= small_graph_edges:
        batches = list(edges.iter_batches(batch_format="pyarrow"))
        tbl = pa.concat_tables(batches) if batches else pa.table(
            {"src": pa.array([], "int64"), "dst": pa.array([], "int64")}
        )
        src = tbl["src"].to_numpy(zero_copy_only=False)
        dst = tbl["dst"].to_numpy(zero_copy_only=False)
        parent: dict = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a_, b_ in zip(src.tolist(), dst.tolist()):
            ra, rb = find(a_), find(b_)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        docs = sorted(parent)
        labels_tbl = pa.table(
            {"doc_id": pa.array(docs, "int64"),
             "cluster_id": pa.array([find(d) for d in docs], "int64")}
        )
        import ray.data as rd

        return rd.from_arrow(labels_tbl)

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"doc": batch["src"]})

    def dedup_init(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _int64_frame(doc=[], label=[])
        docs = df["doc"].drop_duplicates().astype("int64")
        return pd.DataFrame({"doc": docs, "label": docs})

    labels = hash_partition_apply(
        edges.map_batches(init_labels, batch_format="pyarrow"), ["doc"], dedup_init, num_parts=16
    ).materialize()

    for _ in range(max_rounds):
        # ---- stage 1: edge (src, dst) + label (src, label) co-partition
        # on src; each edge learns its source's current label
        edge_rows = edges.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src": t["src"], "dst": t["dst"],
                 "lab": pa.array(np.full(t.num_rows, -1, np.int64))}
            ),
            batch_format="pyarrow",
        )
        # pointer-jumping shortcut: a (label → doc) edge per label row makes
        # each doc receive label(label(doc)) this round — path components
        # converge in O(log diameter) rounds instead of O(diameter)
        shortcut_rows = labels.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src": t["label"], "dst": t["doc"],
                 "lab": pa.array(np.full(t.num_rows, -1, np.int64))}
            ),
            batch_format="pyarrow",
        )
        edge_rows = edge_rows.union(shortcut_rows)
        label_rows = labels.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src": t["doc"], "dst": pa.array(np.full(t.num_rows, -1, np.int64)),
                 "lab": t["label"]}
            ),
            batch_format="pyarrow",
        )

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return _int64_frame(dst=[], cand=[])
            lab = df[df["dst"] == -1][["src", "lab"]]
            edg = df[df["dst"] != -1][["src", "dst"]]
            m = edg.merge(lab, on="src", how="left")
            m["lab"] = m["lab"].fillna(m["src"]).astype("int64")
            return m.rename(columns={"lab": "cand"})[["dst", "cand"]]

        cands = hash_partition_apply(edge_rows.union(label_rows), ["src"], attach, num_parts=16)

        # ---- stage 2: candidates + current labels co-partition on doc;
        # new label = min(current, incoming candidates)
        cand_rows = cands.map_batches(
            lambda t: pa.Table.from_pydict(
                {"doc": t["dst"], "val": t["cand"],
                 "is_label": pa.array(np.zeros(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        )
        cur_rows = labels.map_batches(
            lambda t: pa.Table.from_pydict(
                {"doc": t["doc"], "val": t["label"],
                 "is_label": pa.array(np.ones(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        )

        def step(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return _int64_frame(doc=[], label=[], changed=[])
            new = df.groupby("doc", as_index=False)["val"].min().rename(columns={"val": "label"})
            old = df[df["is_label"] == 1][["doc", "val"]].rename(columns={"val": "old"})
            new = new.merge(old, on="doc", how="left")
            new["changed"] = (new["label"] != new["old"]).astype("int64")
            return new[["doc", "label", "changed"]].astype("int64")

        stepped = hash_partition_apply(cand_rows.union(cur_rows), ["doc"], step, num_parts=16).materialize()

        n_changed = stepped.sum("changed") or 0
        labels = stepped.drop_columns(["changed"]).materialize()
        if n_changed == 0:
            break

    return labels.map_batches(
        lambda t: pa.Table.from_pydict({"doc_id": t["doc"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def dedup_clusters(sf_dir: str, threshold: float = 0.5):
    """Jaccard pairs → connected components → (doc_id, cluster_id)."""
    from dedoc_ray.ops.dedup import jaccard_pairs

    pairs = jaccard_pairs(sf_dir, threshold=threshold)
    return connected_components(pairs)


def dedup_keep(sf_dir: str, threshold: float = 0.5):
    """The survivor decision: every corpus doc tagged keep=1 unless it sits
    in a near-dup cluster under a smaller canonical doc_id.

    The cluster label table is a hash-partitioned LEFT ANTI-style join
    against the full corpus (labels co-partition with doc ids; no
    broadcast needed, though at real scale the label table is usually
    small enough to broadcast instead)."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    labels = dedup_clusters(sf_dir, threshold=threshold)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    lab_rows = labels.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "cluster_id": t["cluster_id"],
             "is_doc": pa.array(np.zeros(t.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    )
    doc_rows = docs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "cluster_id": t["doc_id"],
             "is_doc": pa.array(np.ones(t.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    )

    def decide(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _int64_frame(doc_id=[], keep=[])
        docs_part = df[df["is_doc"] == 1][["doc_id"]]
        lab_part = df[df["is_doc"] == 0][["doc_id", "cluster_id"]]
        m = docs_part.merge(lab_part, on="doc_id", how="left")
        keep = (m["cluster_id"].isna() | (m["cluster_id"] == m["doc_id"])).astype("int64")
        return pd.DataFrame({"doc_id": m["doc_id"].astype("int64"), "keep": keep})

    return hash_partition_apply(doc_rows.union(lab_rows), ["doc_id"], decide, num_parts=16)


def dedup_keep_sql(threshold: float = 0.5) -> str:
    clusters = dedup_clusters_sql(threshold)
    return f"""
WITH clusters AS ({clusters})
SELECT d.doc_id,
       CAST(CASE WHEN c.cluster_id IS NULL OR c.cluster_id = d.doc_id THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d LEFT JOIN clusters c USING (doc_id)
"""


def dedup_clusters_sql(threshold: float = 0.5) -> str:
    """Recursive-CTE transitive closure over the SAME pair SQL the
    jaccard_pairs oracle uses: min reachable doc per doc."""
    from dedoc_ray.ops.dedup import jaccard_pairs_sql

    pairs = jaccard_pairs_sql(threshold)
    return f"""
WITH RECURSIVE pairs AS ({pairs}),
edges AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION ALL
    SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(doc, lab) AS (
    SELECT src AS doc, src AS lab FROM edges
    UNION
    SELECT e.src AS doc, r.lab
    FROM edges e JOIN reach r ON r.doc = e.dst
)
SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS cluster_id
FROM reach GROUP BY doc
"""
