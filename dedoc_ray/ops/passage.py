"""Substring-level duplicate-passage detection (suffix-dedup family).

Reference point: "Deduplicating Training Data Makes Language Models
Better" (Lee et al., ACL 2022) removes exact substrings of length >= L
that occur more than once in the corpus, via a corpus-wide suffix array.
A suffix array is a single global data structure — the wrong shape for a
streaming 100 TB Ray pipeline. The distributed equivalent used here:

  1. every k-byte gram of the normalized text gets a Rabin-Karp rolling
     hash (vectorized, the same fold as ``ops/fingerprint.py``);
  2. ONE keyed shuffle co-locates equal hashes; a gram is *duplicated*
     iff its hash occurs in >= 2 distinct documents (a shared substring
     of length >= k covers >= 1 shared gram, so recall for passages of
     length >= k is 1 up to 2^-64 hash collisions);
  3. the duplicated (doc_id, pos) pairs — integers only, the text never
     moves — shuffle ONCE by doc_id and a vectorized interval-union
     computes per-document duplicated-byte coverage.

Scale notes: stage 1's exploded table is O(corpus bytes) rows of three
ints — the same amplification a suffix array pays, but it streams through
the object store in blocks instead of needing a global sort; the two
shuffles move only int64 triples. Skew guard: a boilerplate gram shared
by millions of docs lands in one hash partition but contributes O(rows)
vectorized work, no per-key Python. No stage materializes the corpus.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

from dedoc_ray.ops.fingerprint import _BASE, _normalize, rolling_hashes

K_DEFAULT = 24


class PassageGramKernel:
    """doc -> exploded (hash, doc_id, pos) rows, one per k-gram."""

    def __init__(self, k: int = K_DEFAULT) -> None:
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs, ids, ps = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            h = rolling_hashes(_normalize(text), self.k)
            hs.append(h)
            ids.append(np.full(len(h), doc_id, dtype=np.int64))
            ps.append(np.arange(len(h), dtype=np.int64))
        empty_h = np.zeros(0, dtype=np.uint64)
        empty_i = np.zeros(0, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "hash": pa.array(np.concatenate(hs) if hs else empty_h, "uint64"),
                "doc_id": pa.array(np.concatenate(ids) if ids else empty_i, "int64"),
                "pos": pa.array(np.concatenate(ps) if ps else empty_i, "int64"),
            }
        )


class GramCountKernel:
    """doc -> (doc_id, tag=0, val=n_grams); unioned with the dup positions."""

    def __init__(self, k: int = K_DEFAULT) -> None:
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = [
            max(len(_normalize(t)) - self.k + 1, 0)
            for t in batch["text"].to_pylist()
        ]
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast("int64"),
                "tag": pa.array([0] * len(n), "int64"),
                "val": pa.array(n, "int64"),
            }
        )


def _filter_dup_grams(df: pd.DataFrame) -> pd.DataFrame:
    """Within a hash-complete partition: keep gram rows whose hash occurs
    in >= 2 distinct documents; emit union-schema (doc_id, tag=1, val=pos)."""
    if df.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "tag": pd.Series([], dtype="int64"),
                "val": pd.Series([], dtype="int64"),
            }
        )
    ndocs = df.groupby("hash")["doc_id"].transform("nunique")
    out = df.loc[ndocs >= 2, ["doc_id", "pos"]].rename(columns={"pos": "val"})
    out.insert(1, "tag", np.int64(1))
    return out.astype({"doc_id": "int64", "tag": "int64", "val": "int64"})


def _finalize_factory(k: int):
    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        """Doc-complete partition: tag 0 rows carry n_grams, tag 1 rows carry
        duplicated gram positions; interval-union with width k gives the
        duplicated-byte coverage (vectorized via per-doc shifted gaps)."""
        base = df[df["tag"] == 0][["doc_id", "val"]].rename(columns={"val": "n_grams"})
        dups = df[df["tag"] == 1][["doc_id", "val"]].rename(columns={"val": "pos"})
        if dups.empty:
            agg = pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_dup_grams": pd.Series([], dtype="int64"),
                    "n_dup_bytes": pd.Series([], dtype="int64"),
                }
            )
        else:
            dups = dups.sort_values(["doc_id", "pos"], kind="stable")
            prev = dups.groupby("doc_id")["pos"].shift()
            contrib = np.where(
                prev.isna(), k, np.minimum(dups["pos"].to_numpy() - prev.to_numpy(), k)
            ).astype(np.int64)
            agg = (
                pd.DataFrame({"doc_id": dups["doc_id"].to_numpy(), "c": contrib})
                .groupby("doc_id", as_index=False)
                .agg(n_dup_grams=("c", "size"), n_dup_bytes=("c", "sum"))
            )
        out = base.merge(agg, on="doc_id", how="left")
        out[["n_dup_grams", "n_dup_bytes"]] = (
            out[["n_dup_grams", "n_dup_bytes"]].fillna(0).astype("int64")
        )
        return out.astype({"doc_id": "int64", "n_grams": "int64"})

    return finalize


def duplicate_passages(sf_dir: str, k: int = K_DEFAULT, num_parts: int = 32):
    """Per-document duplicated-passage stats: (doc_id, n_grams, n_dup_grams,
    n_dup_bytes). A gram counts as duplicated iff its k-byte normalized
    substring occurs in >= 2 distinct documents."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # task-based stages: the kernels are stateless (k only) and actor-pool
    # spinup costs ~10× the fold at bench scale (BASELINE round-2e pattern)
    gram_fn, count_fn = PassageGramKernel(k), GramCountKernel(k)
    grams = docs.map_batches(
        lambda b: gram_fn(b), batch_format="pyarrow", batch_size=512
    )
    dup_pos = hash_partition_apply(grams, ["hash"], _filter_dup_grams, num_parts=num_parts)
    counts = docs.map_batches(
        lambda b: count_fn(b), batch_format="pyarrow", batch_size=512
    )
    return hash_partition_apply(
        counts.union(dup_pos), ["doc_id"], _finalize_factory(k), num_parts=num_parts
    )


class DocTextKernel:
    """doc -> (doc_id, tag=0, pos=-1, text) union-schema rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"].cast("int64"),
                "tag": pa.array([0] * n, "int64"),
                "pos": pa.array([-1] * n, "int64"),
                "text": batch["text"].cast("string"),
            }
        )


def _filter_foreign_grams(df: pd.DataFrame) -> pd.DataFrame:
    """Within a hash-complete partition: gram positions whose hash also
    occurs in a SMALLER doc_id (the canonical owner keeps its copy);
    emit union-schema (doc_id, tag=1, pos, text=None)."""
    if df.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "tag": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "text": pd.Series([], dtype="string"),
            }
        )
    owner = df.groupby("hash")["doc_id"].transform("min")
    out = df.loc[df["doc_id"] > owner, ["doc_id", "pos"]].copy()
    out.insert(1, "tag", np.int64(1))
    out["text"] = pd.array([None] * len(out), dtype="string")
    return out.astype({"doc_id": "int64", "tag": "int64", "pos": "int64"})


def _strip_factory(k: int):
    def strip(df: pd.DataFrame) -> pd.DataFrame:
        """Doc-complete partition: remove every byte of the normalized text
        covered by a foreign-duplicated k-gram (numpy mask per doc)."""
        base = df[df["tag"] == 0]
        dups = df[df["tag"] == 1]
        pos_by_doc = {d: g["pos"].to_numpy() for d, g in dups.groupby("doc_id")}
        ids, texts, removed = [], [], []
        for doc_id, text in zip(base["doc_id"], base["text"]):
            data = _normalize(text)
            ps = pos_by_doc.get(doc_id)
            if ps is None:
                mask = np.ones(len(data), dtype=bool)
            else:
                # interval union via a +1/-1 difference array (vectorized)
                diff = np.zeros(len(data) + 1, dtype=np.int64)
                np.add.at(diff, ps, 1)
                np.add.at(diff, np.minimum(ps + k, len(data)), -1)
                mask = np.cumsum(diff[:-1]) == 0
            buf = np.frombuffer(data, dtype=np.uint8)
            ids.append(doc_id)
            texts.append(buf[mask].tobytes().decode("utf-8", "replace"))
            removed.append(int(len(data) - mask.sum()))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "clean_text": pd.Series(texts, dtype="object"),
                "n_removed_bytes": pd.Series(removed, dtype="int64"),
            }
        )

    return strip


def passage_strip(sf_dir: str, k: int = K_DEFAULT, num_parts: int = 32):
    """Lee et al.-style substring dedup REWRITE: per document, delete every
    byte covered by a k-gram whose hash also occurs in a smaller doc_id
    (that smaller document is the canonical owner and keeps its copy).
    Output: (doc_id, clean_text, n_removed_bytes), byte-exact.

    Same two-shuffle shape as ``duplicate_passages``; the text travels
    exactly once (into its doc_id partition for the rewrite)."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    gram_fn, text_fn = PassageGramKernel(k), DocTextKernel()
    grams = docs.map_batches(
        lambda b: gram_fn(b), batch_format="pyarrow", batch_size=512
    )
    foreign = hash_partition_apply(grams, ["hash"], _filter_foreign_grams, num_parts=num_parts)
    tagged = docs.map_batches(
        lambda b: text_fn(b), batch_format="pyarrow", batch_size=512
    )
    return hash_partition_apply(
        tagged.union(foreign), ["doc_id"], _strip_factory(k), num_parts=num_parts
    )


def passage_strip_sql(k: int = K_DEFAULT) -> str:
    """DuckDB replay of the rewrite: foreign-dup positions (hash's min
    doc_id < this doc_id), byte coverage via generate_series, surviving
    chars re-joined with an ordered string_agg."""
    return f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[ \\t\\n\\f\\r]+', ' ', 'g')) AS t
  FROM documents
), grams AS (
  SELECT doc_id,
    list_transform(range(1, greatest(length(t) - {k} + 2, 1)),
      i -> list_reduce(
             list_transform(range(i, i + {k}), j -> CAST(ascii(substr(t, CAST(j AS INTEGER), 1)) AS UBIGINT)),
             (acc, c) -> CAST((CAST(acc AS HUGEINT) * {int(_BASE)} + c) % 18446744073709551616 AS UBIGINT)
           )) AS h
  FROM norm
), g2 AS (
  SELECT doc_id, unnest(h) AS hash, unnest(range(0, len(h))) AS pos FROM grams
), own AS (
  SELECT hash, min(doc_id) AS owner FROM g2 GROUP BY hash
), dp AS (
  SELECT g2.doc_id, g2.pos FROM g2 JOIN own USING (hash) WHERE g2.doc_id > own.owner
), cov AS (
  SELECT DISTINCT dp.doc_id, u.b FROM dp, UNNEST(generate_series(dp.pos, dp.pos + {k} - 1)) AS u(b)
), chars AS (
  SELECT doc_id, unnest(range(0, length(t))) AS i, unnest(string_split(t, '')) AS c FROM norm
), clean AS (
  SELECT chars.doc_id, string_agg(chars.c, '' ORDER BY chars.i) AS clean_text
  FROM chars LEFT JOIN cov ON chars.doc_id = cov.doc_id AND chars.i = cov.b
  WHERE cov.b IS NULL
  GROUP BY chars.doc_id
), removed AS (
  SELECT doc_id, count(*) AS n FROM cov GROUP BY doc_id
)
SELECT n2.doc_id,
       coalesce(cl.clean_text, '') AS clean_text,
       CAST(coalesce(r.n, 0) AS BIGINT) AS n_removed_bytes
FROM norm n2
LEFT JOIN clean cl USING (doc_id)
LEFT JOIN removed r USING (doc_id)
"""


def duplicate_passages_sql(k: int = K_DEFAULT) -> str:
    """DuckDB replay: the same Rabin-Karp fold as ``winnow_stats_sql``
    (acc*base + byte mod 2^64), parallel-unnest zip for (hash, pos),
    df >= 2 over distinct doc_ids, and exact byte coverage via
    count(DISTINCT b) over generate_series(pos, pos+k-1)."""
    return f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[ \\t\\n\\f\\r]+', ' ', 'g')) AS t
  FROM documents
), grams AS (
  SELECT doc_id,
    list_transform(range(1, greatest(length(t) - {k} + 2, 1)),
      i -> list_reduce(
             list_transform(range(i, i + {k}), j -> CAST(ascii(substr(t, CAST(j AS INTEGER), 1)) AS UBIGINT)),
             (acc, c) -> CAST((CAST(acc AS HUGEINT) * {int(_BASE)} + c) % 18446744073709551616 AS UBIGINT)
           )) AS h,
    CAST(greatest(length(t) - {k} + 1, 0) AS BIGINT) AS n_grams
  FROM norm
), g2 AS (
  SELECT doc_id, unnest(h) AS hash, unnest(range(0, len(h))) AS pos FROM grams
), dup AS (
  SELECT hash FROM g2 GROUP BY hash HAVING count(DISTINCT doc_id) >= 2
), dp AS (
  SELECT g2.doc_id, g2.pos FROM g2 JOIN dup USING (hash)
), cov AS (
  SELECT dp.doc_id,
         count(DISTINCT dp.pos) AS n_dup_grams,
         count(DISTINCT u.b) AS n_dup_bytes
  FROM dp, UNNEST(generate_series(dp.pos, dp.pos + {k} - 1)) AS u(b)
  GROUP BY dp.doc_id
)
SELECT g.doc_id, g.n_grams,
       CAST(coalesce(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(c.n_dup_bytes, 0) AS BIGINT) AS n_dup_bytes
FROM grams g LEFT JOIN cov c USING (doc_id)
"""


# ------------------------------------------------------ n-gram novelty


def novel_grams(sf_dir: str, n: int = 3, num_parts: int = 32):
    """(doc_id, n_grams, n_novel): how many of a doc's distinct n-grams
    appear in NO smaller-doc_id document — the corpus-order novelty
    profile (the aggregate behind "fraction of text that is new",
    complementary to dup_passages' byte coverage).

    Two integer-only shuffles, ONE corpus tokenize: (1) distinct
    (gram, doc_id) pairs hash to gram partitions where BOTH combiner
    partials fall out of the same shuffled rows — the min-doc_id winner
    count per doc (novel) AND each doc's gram count in this partition
    (its n_grams share: every gram lives in exactly one partition);
    (2) the tagged partials meet in doc_id partitions. Text never
    shuffles; a gram's rows co-locate once however often it repeats."""
    import ray.data as rd

    from dedoc_ray.ops.dedup import shingle_hashes
    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        gs = [shingle_hashes(t, n) for t in batch["text"].to_pylist()]
        lens = np.fromiter((len(g) for g in gs), np.int64, len(gs))
        grams = (
            np.concatenate(gs).view(np.int64) if gs else np.empty(0, np.int64)
        )
        return pa.Table.from_pydict(
            {
                "gram": pa.array(grams, "int64"),
                "doc_id": pa.array(np.repeat(ids.astype(np.int64), lens), "int64"),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow", batch_size=1024)

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                    "is_total": pd.Series([], dtype="int64"),
                }
            )
        win = df.groupby("gram")["doc_id"].min()
        per_winner = win.value_counts()
        per_doc = df["doc_id"].value_counts()  # this partition's n_grams share
        return pd.DataFrame(
            {
                "doc_id": np.concatenate(
                    [per_doc.index.to_numpy("int64"), per_winner.index.to_numpy("int64")]
                ),
                "cnt": np.concatenate(
                    [per_doc.to_numpy("int64"), per_winner.to_numpy("int64")]
                ),
                "is_total": np.concatenate(
                    [np.ones(len(per_doc), np.int64), np.zeros(len(per_winner), np.int64)]
                ),
            }
        )

    novel_partials = hash_partition_apply(exploded, ["gram"], winners, num_parts=num_parts)
    # docs with ZERO grams never reach a gram partition: emit their
    # (doc_id, 0) total rows from a cheap metadata-only side map
    def empties(batch: pa.Table) -> pa.Table:
        from dedoc_ray.ops.textstats import TOKEN_RE

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        has = np.fromiter(
            (TOKEN_RE.search(t.lower()) is not None for t in batch["text"].to_pylist()),
            bool, len(ids),
        )
        z = ids[~has].astype(np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(z, "int64"),
                "cnt": pa.array(np.zeros(len(z), np.int64), "int64"),
                "is_total": pa.array(np.ones(len(z), np.int64), "int64"),
            }
        )

    total_rows = docs.map_batches(empties, batch_format="pyarrow", batch_size=1024)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                    "n_novel": pd.Series([], dtype="int64"),
                }
            )
        tot = df[df["is_total"] == 1].groupby("doc_id")["cnt"].sum()
        nov = df[df["is_total"] == 0].groupby("doc_id")["cnt"].sum()
        out = pd.DataFrame({"n_grams": tot}).fillna(0)
        out["n_novel"] = nov.reindex(out.index).fillna(0)
        return pd.DataFrame(
            {
                "doc_id": out.index.astype("int64"),
                "n_grams": out["n_grams"].astype("int64"),
                "n_novel": out["n_novel"].astype("int64"),
            }
        )

    return hash_partition_apply(
        total_rows.union(novel_partials), ["doc_id"], combine, num_parts=num_parts
    )


NOVEL_GRAMS_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN length(t) = 0 THEN [] ELSE list_distinct(
           [array_to_string(t[i:i+2], ' ') for i in range(1, greatest(length(t) - 2, 1) + 1)]
         ) END AS gs
  FROM toks
),
per AS (SELECT doc_id, unnest(gs) AS g FROM sh),
w AS (SELECT g, min(doc_id) AS winner FROM per GROUP BY g),
nv AS (SELECT winner AS doc_id, count(*) AS n_novel FROM w GROUP BY winner)
SELECT s.doc_id,
       CAST(length(s.gs) AS BIGINT) AS n_grams,
       CAST(coalesce(nv.n_novel, 0) AS BIGINT) AS n_novel
FROM sh s LEFT JOIN nv ON s.doc_id = nv.doc_id
"""
