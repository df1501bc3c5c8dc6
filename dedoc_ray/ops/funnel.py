"""Corpus curation funnel — the composed raw → quality → dedup report.

Real training-data pipelines chain the ops this repo ships individually
(quality filter, then exact dedup, then packing); the number every run
reports is the FUNNEL: how many documents/tokens survive each stage.
This op composes the existing kernels end-to-end and aggregates the
per-stage totals, exactly:

  raw      all documents
  quality  documents passing the Gopher rule set (ops/textstats.py —
           the same GopherQualityKernel instance computes `passes`, so
           the funnel can never drift from the standalone filter)
  dedup    quality documents surviving first-doc_id-wins exact dedup on
           the md5 fingerprint (ops/dedup.py semantics)

Movement: one streaming map over the corpus emitting per-doc
(n_words, passes, fingerprint); raw/quality totals come from per-batch
combiners (no shuffle); only the quality survivors' (fingerprint,
doc_id, n_words) triples shuffle once for the dedup count. Output: 3
rows, however large the corpus."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from dedoc_ray.ops.textstats import WS_RE, GopherQualityKernel


class FunnelDocKernel:
    """doc -> (doc_id, n_words, passes, fingerprint); `passes` is computed
    by the actual GopherQualityKernel, fingerprint by the exact-dedup
    recipe."""

    def __init__(self) -> None:
        self.gq = GopherQualityKernel()
        self.ws_re = WS_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        passes = self.gq(batch)["passes"]
        n_words, fps = [], []
        for text in batch["text"].to_pylist():
            n_words.append(len([w for w in self.ws_re.split(text) if w]))
            normalized = self.ws_re.sub(" ", text.lower()).strip(" ")
            fps.append(hashlib.md5(normalized.encode("utf-8")).hexdigest())
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, "int64"),
                "passes": passes,
                "fingerprint": pa.array(fps, "string"),
            }
        )


def _stage_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: raw + quality totals (no shuffle needed)."""
    n = batch["n_words"].to_numpy(zero_copy_only=False)
    p = batch["passes"].to_numpy(zero_copy_only=False).astype(bool)
    return pa.Table.from_pydict(
        {
            "stage": pa.array(["raw", "quality"], "string"),
            "n_docs": pa.array([len(n), int(p.sum())], "int64"),
            "n_tokens": pa.array([int(n.sum()), int(n[p].sum())], "int64"),
        }
    )


def _dedup_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Fingerprint-complete partition: first-doc_id survivor per print."""
    if df.empty:
        return pd.DataFrame(
            {
                "stage": pd.Series([], dtype="string"),
                "n_docs": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
            }
        )
    surv = df.sort_values(["fingerprint", "doc_id"], kind="stable").groupby(
        "fingerprint", as_index=False
    ).first()
    return pd.DataFrame(
        {
            "stage": pd.Series(["dedup"], dtype="string"),
            "n_docs": pd.Series([len(surv)], dtype="int64"),
            "n_tokens": pd.Series([int(surv["n_words"].sum())], dtype="int64"),
        }
    )


def _sum_stages(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return pd.DataFrame(
            {
                "stage": pd.Series([], dtype="string"),
                "n_docs": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
            }
        )
    return (
        df.groupby("stage", as_index=False)[["n_docs", "n_tokens"]]
        .sum()
        .astype({"n_docs": "int64", "n_tokens": "int64"})
    )


def corpus_funnel(sf_dir: str, num_parts: int = 16):
    """(stage, n_docs, n_tokens) for raw / quality / dedup."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    perdoc = docs.map_batches(
        FunnelDocKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    )
    raw_quality = perdoc.map_batches(_stage_partials, batch_format="pyarrow", batch_size=4096)

    def quality_only(batch: pa.Table) -> pa.Table:
        keep = batch["passes"].to_numpy(zero_copy_only=False).astype(bool)
        return batch.select(["fingerprint", "doc_id", "n_words"]).filter(pa.array(keep))

    dedup = hash_partition_apply(
        perdoc.map_batches(quality_only, batch_format="pyarrow", batch_size=4096),
        ["fingerprint"], _dedup_partial, num_parts=num_parts,
    )
    return hash_partition_apply(raw_quality.union(dedup), ["stage"], _sum_stages, num_parts=4)


CORPUS_FUNNEL_SQL = """
WITH m AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n,
         length(regexp_replace(text, '\\s+', '', 'g')) AS tot_chars,
         regexp_split_to_array(text, chr(10)) AS lines,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
g AS (
  SELECT doc_id, n, fingerprint,
         CASE WHEN n BETWEEN 50 AND 100000
               AND (CASE WHEN n = 0 THEN 0 ELSE (tot_chars * 10) // n END) BETWEEN 30 AND 100
               AND (length(text) - length(replace(text, '#', ''))) * 10 <= n
               AND len(list_filter(lines, x -> ltrim(x, ' ' || chr(9)) LIKE '-%'
                                            OR ltrim(x, ' ' || chr(9)) LIKE '*%')) * 10 <= 9 * len(lines)
               AND (len(lines) - len(list_distinct(lines))) * 10 <= 3 * len(lines)
              THEN 1 ELSE 0 END AS passes
  FROM m
),
q AS (SELECT * FROM g WHERE passes = 1),
d AS (
  SELECT * FROM q
  QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
)
SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs, CAST(coalesce(sum(n), 0) AS BIGINT) AS n_tokens FROM g
UNION ALL
SELECT 'quality', CAST(count(*) AS BIGINT), CAST(coalesce(sum(n), 0) AS BIGINT) FROM q
UNION ALL
SELECT 'dedup', CAST(count(*) AS BIGINT), CAST(coalesce(sum(n), 0) AS BIGINT) FROM d
"""


# ------------------------------------------------- composed prep pipeline


class PrepDocKernel:
    """doc -> (doc_id, fingerprint, n_words, split) for docs that pass
    quality AND are clean of benchmark n-grams AND are not the benchmark
    slice itself.

    Composes the LIVE stage kernels (GopherQualityKernel,
    DecontaminateKernel, hash_split recipe) rather than re-deriving their
    rules, so the composed pipeline can never drift from the standalone
    ops. Emits only survivors — the downstream fingerprint shuffle sees
    quality-filtered decontaminated triples, never raw text."""

    def __init__(self, bench_ref, n: int = 3) -> None:
        from dedoc_ray.ops.webclean import DecontaminateKernel

        self.gq = GopherQualityKernel()
        self.decon = DecontaminateKernel(bench_ref, n=n)
        self.ws_re = WS_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedoc_ray.ops.webclean import hash_split_batch

        passes = self.gq(batch)["passes"].to_numpy(zero_copy_only=False).astype(bool)
        d = self.decon(batch)
        clean = (
            (d["contaminated"].to_numpy(zero_copy_only=False) == 0)
            & (d["is_benchmark"].to_numpy(zero_copy_only=False) == 0)
        )
        splits = hash_split_batch(batch.select(["doc_id"]))["split"].to_pylist()
        n_words, fps = [], []
        for text in batch["text"].to_pylist():
            n_words.append(len([w for w in self.ws_re.split(text) if w]))
            normalized = self.ws_re.sub(" ", text.lower()).strip(" ")
            fps.append(hashlib.md5(normalized.encode("utf-8")).hexdigest())
        keep = pa.array(passes & clean)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "fingerprint": pa.array(fps, "string"),
                "n_words": pa.array(n_words, "int64"),
                "split": pa.array(splits, "string"),
            }
        ).filter(keep)


def pretrain_prep(sf_dir: str, num_parts: int = 16):
    """The composed curation pipeline, emitting the FINAL training rows:
    quality-pass, decontaminated, exact-dedup survivors with their
    deterministic split tag — (doc_id, split, n_words).

    One streaming pass scores every doc against all three per-doc rules
    (quality, contamination, split) with the benchmark n-gram set
    broadcast once; survivors' (fingerprint, doc_id, n_words, split)
    triples make ONE keyed shuffle for first-doc_id-wins exact dedup.
    Text never moves past the first map; the corpus is never collected."""
    import ray
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply
    from dedoc_ray.ops.webclean import benchmark_gram_hashes

    bench_ref = ray.put(benchmark_gram_hashes(sf_dir, 3))
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    survivors = docs.map_batches(
        PrepDocKernel,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": 3},
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 4),
    )

    def dedup_first(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "split": pd.Series([], dtype="object"),
                    "n_words": pd.Series([], dtype="int64"),
                }
            )
        surv = df.sort_values(["fingerprint", "doc_id"], kind="stable").groupby(
            "fingerprint", as_index=False
        ).first()
        return surv[["doc_id", "split", "n_words"]]

    return hash_partition_apply(survivors, ["fingerprint"], dedup_first, num_parts=num_parts)


def pretrain_prep_sql() -> str:
    from dedoc_ray.ops.webclean import DECON_MOD, DECON_REM

    return f"""
WITH m AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n,
         length(regexp_replace(text, '\\s+', '', 'g')) AS tot_chars,
         regexp_split_to_array(text, chr(10)) AS lines,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents
),
g AS (
  SELECT doc_id, n, fingerprint,
         CASE WHEN n BETWEEN 50 AND 100000
               AND (CASE WHEN n = 0 THEN 0 ELSE (tot_chars * 10) // n END) BETWEEN 30 AND 100
               AND (length(text) - length(replace(text, '#', ''))) * 10 <= n
               AND len(list_filter(lines, x -> ltrim(x, ' ' || chr(9)) LIKE '-%'
                                            OR ltrim(x, ' ' || chr(9)) LIKE '*%')) * 10 <= 9 * len(lines)
               AND (len(lines) - len(list_distinct(lines))) * 10 <= 3 * len(lines)
              THEN 1 ELSE 0 END AS passes
  FROM m
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN length(t) = 0 THEN [] ELSE list_distinct(
           [array_to_string(t[i:i+2], ' ') for i in range(1, greatest(length(t) - 2, 1) + 1)]
         ) END AS gs
  FROM toks
),
bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id % {DECON_MOD} = {DECON_REM}
),
per AS (SELECT doc_id, unnest(gs) AS g FROM sh),
ov AS (SELECT per.doc_id, count(*) AS n_overlap FROM per JOIN bench USING (g) GROUP BY 1),
surv AS (
  SELECT g.doc_id, g.fingerprint, g.n,
         CASE WHEN substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'val'
              WHEN substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'test'
              ELSE 'train' END AS split
  FROM g LEFT JOIN ov ON g.doc_id = ov.doc_id
  WHERE g.passes = 1
    AND coalesce(ov.n_overlap, 0) = 0
    AND g.doc_id % {DECON_MOD} != {DECON_REM}
)
SELECT doc_id, split, CAST(n AS BIGINT) AS n_words FROM surv
QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
"""


def cc_prep(sf_dir: str, num_parts: int = 16):
    """Crawl-native flagship: WARC crawl files → record parse → html
    extraction → token stats → quality gate → exact dedup → split tags,
    in one streaming chain with exactly ONE shuffle (the fingerprint
    dedup exchange).

    This is the pipeline a Common-Crawl user actually runs: the input is
    the crawl's own on-disk format (sources/warc.py), not a pre-extracted
    table. Every stage reuses the live production kernel (WARC parse,
    ExtractKernel actor pool, DocStatsKernel, hash-split rule from
    ops/webclean.py), and the html payloads never move past extraction —
    only (fingerprint, doc_id, n_tokens) triples shuffle. Output:
    (doc_id, split, n_tokens) training rows."""
    import re as _re

    import hashlib as _hashlib

    import numpy as np
    import pyarrow.compute as pc

    from dedoc_ray.ops.shuffle import hash_partition_apply
    from dedoc_ray.ops.textstats import DocStatsKernel
    from dedoc_ray.pipeline.extract import extract_pages
    from dedoc_ray.sources.warc import synth_warc_corpus, warc_pages_from_payloads

    pages = warc_pages_from_payloads(synth_warc_corpus(sf_dir))
    extracted = extract_pages(pages, concurrency=None)
    url_re = _re.compile(r"/warc/(\d+)\.html$")

    def stats(batch: pa.Table) -> pa.Table:
        ids = [int(url_re.search(u).group(1)) for u in batch["url"].to_pylist()]
        sub = pa.table({"doc_id": pa.array(ids, "int64"),
                        "text": batch["extracted_text"]})
        st = DocStatsKernel()(sub)
        st = st.filter(pc.greater_equal(st["n_tokens"], 32))  # quality gate
        return st.select(["doc_id", "n_tokens", "fingerprint"])

    survivors = extracted.map_batches(stats, batch_format="pyarrow", batch_size=256)

    def dedup_split(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "split": pd.Series([], dtype="object"),
                "n_tokens": pd.Series([], dtype="int64"),
            })
        df = df.sort_values(["fingerprint", "doc_id"], kind="stable").groupby(
            "fingerprint", as_index=False).first()
        hs = np.array([_hashlib.md5(str(int(i)).encode()).hexdigest()[:2]
                       for i in df["doc_id"]])
        df["split"] = np.where(hs < "0d", "val", np.where(hs < "1a", "test", "train"))
        return df[["doc_id", "split", "n_tokens"]]

    return hash_partition_apply(survivors, ["fingerprint"], dedup_split, num_parts=num_parts)


CC_PREP_SQL = """
WITH ex AS (
  SELECT doc_id, replace(text, ' the ', chr(10)) || chr(10) AS t FROM documents
),
st AS (
  SELECT doc_id,
         length(regexp_extract_all(lower(t), '[a-z0-9]+')) AS n_tokens,
         md5(trim(regexp_replace(lower(t), '\\s+', ' ', 'g'))) AS fingerprint
  FROM ex
),
kept AS (SELECT * FROM st WHERE n_tokens >= 32),
ded AS (SELECT fingerprint, min(doc_id) AS doc_id FROM kept GROUP BY fingerprint)
SELECT k.doc_id,
       CASE WHEN substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'val'
            WHEN substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'test'
            ELSE 'train' END AS split,
       k.n_tokens
FROM kept k JOIN ded d ON k.doc_id = d.doc_id
"""
