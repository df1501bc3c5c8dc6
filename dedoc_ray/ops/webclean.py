"""Web-corpus cleaning operators: PII redaction, paragraph-level dedup,
deterministic train/val/test splits, URL parsing stats.

These are the remaining staples of a training-data curation pipeline (the
CCNet / C4 / Dolma family of cleanup passes) expressed Ray-Data-first:

- PII redaction is a pure vectorized ``map_batches`` stage — RE2 kernels
  via ``pyarrow.compute`` (``replace_substring_regex`` /
  ``count_substring_regex``), the SAME regex engine DuckDB uses, so the
  oracle replays byte-exactly. No shuffle; scales linearly.
- Paragraph dedup is exact dedup at SUB-document granularity (the CCNet
  move): explode paragraphs, one hash-partitioned shuffle of
  (paragraph, doc_id, idx) triples, first-wins per paragraph inside each
  partition. Only the paragraph column moves — at 100 TB the shuffle
  payload is the text itself once, nothing quadratic.
- Hash split tags each doc train/val/test from ``md5(doc_id)`` — stable
  under re-runs, re-shards and corpus growth (a doc's split never depends
  on what else is in the corpus). Map-only.
- URL stats parses scheme/host/ext out of the url column with one RE2
  kernel pass, pre-aggregates per batch, and combines the tiny partials on
  the driver (the combiner-before-groupby pattern; ≤ |exts| rows/block).

PII text is synthesized as a PURE FUNCTION of the documents view (same
contract as dedoc_ray/sources/synth.py) so the DuckDB oracle can replay
injection + redaction and hash-match the output exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------- PII

# Shared VERBATIM with the DuckDB oracle (RE2: no lookaround, ASCII classes).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def inject_pii_batch(batch: pa.Table) -> pa.Table:
    """documents rows → rows with deterministic PII planted per doc_id.

    Pure function of (doc_id, text) — the oracle rebuilds it in SQL. One
    third of docs get an email, one third a phone + an IPv4, one third stay
    clean (the redactor must pass them through untouched)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    out = []
    for doc_id, text in zip(ids, texts):
        m = doc_id % 3
        if m == 0:
            out.append(f"{text} contact user{doc_id}@example.com now")
        elif m == 1:
            out.append(
                f"{text} call +1-555-{doc_id % 10000:04d} from 10.{doc_id % 256}.{(doc_id // 7) % 256}.{(doc_id // 11) % 256}"
            )
        else:
            out.append(text)
    return pa.Table.from_pydict(
        {"doc_id": batch["doc_id"], "pii_text": pa.array(out, "string")}
    )


class PiiRedactKernel:
    """pii_text → redacted text + per-type match counts, fully vectorized.

    All three patterns run as RE2 kernels over the whole batch (zero Python
    per row). Counts are taken on the INPUT text; replacements then apply
    sequentially email → phone → ip (patterns are mutually exclusive here,
    and the oracle nests regexp_replace in the same order)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["pii_text"]
        n_emails = pc.count_substring_regex(col, EMAIL_RE)
        n_phones = pc.count_substring_regex(col, PHONE_RE)
        n_ips = pc.count_substring_regex(col, IPV4_RE)
        red = pc.replace_substring_regex(col, EMAIL_RE, "<EMAIL>")
        red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
        red = pc.replace_substring_regex(red, IPV4_RE, "<IP>")
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "clean_text": red,
                "n_emails": pc.cast(n_emails, "int64"),
                "n_phones": pc.cast(n_phones, "int64"),
                "n_ips": pc.cast(n_ips, "int64"),
            }
        )


def pii_redact(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    injected = docs.map_batches(inject_pii_batch, batch_format="pyarrow", batch_size=1024)
    return injected.map_batches(PiiRedactKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))


# DuckDB's regexp_* are RE2 like pyarrow.compute — patterns shared verbatim.
_PII_SQL_TEXT = (
    "CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || doc_id || '@example.com now' "
    "WHEN doc_id % 3 = 1 THEN text || ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
    "|| ' from 10.' || (doc_id % 256) || '.' || ((doc_id // 7) % 256) || '.' || ((doc_id // 11) % 256) "
    "ELSE text END"
)

PII_REDACT_SQL = f"""
WITH injected AS (SELECT doc_id, {_PII_SQL_TEXT} AS pii_text FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(pii_text,
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g'),
           '{IPV4_RE}', '<IP>', 'g') AS clean_text,
       length(regexp_extract_all(pii_text, '{EMAIL_RE}')) AS n_emails,
       length(regexp_extract_all(pii_text, '{PHONE_RE}')) AS n_phones,
       length(regexp_extract_all(pii_text, '{IPV4_RE}')) AS n_ips
FROM injected
"""


# ---------------------------------------------------- paragraph dedup

PARA_SEP = " the "


def explode_paragraphs(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → one row per paragraph with its 1-based index.

    Vectorized via pandas str.split + explode; the paragraph boundary is the
    corpus's chunk delimiter (dedoc_ray/sources/synth.py chunks_of). On a
    real crawl this is text.split('\\n\\n')."""
    df = batch.select(["doc_id", "text"]).to_pandas()
    df["para"] = df["text"].str.split(PARA_SEP)
    df = df[["doc_id", "para"]].explode("para", ignore_index=True)
    df["para_idx"] = df.groupby("doc_id").cumcount() + 1
    df["para_idx"] = df["para_idx"].astype("int64")
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(df["doc_id"], "int64"),
            "para_idx": pa.array(df["para_idx"], "int64"),
            "para": pa.array(df["para"], "string"),
        }
    )


def paragraph_dedup(sf_dir: str):
    """Corpus-wide exact paragraph dedup: keep the first occurrence
    (smallest doc_id, then para_idx) of every distinct paragraph.

    One hash-partitioned shuffle keyed on the paragraph string; first-wins
    is a vectorized idxmin inside each key-complete partition. Boilerplate
    paragraphs (headers, nav, license blocks) are exactly the hot keys the
    coarse-partition shape absorbs — a popular paragraph's rows all land in
    one partition but only as (para, doc_id, idx) triples, never the docs."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    paras = docs.map_batches(explode_paragraphs, batch_format="pyarrow", batch_size=1024)

    def first_per_para(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "para_idx": pd.Series([], dtype="int64"),
                    "para": pd.Series([], dtype="object"),
                }
            )
        df = df.sort_values(["doc_id", "para_idx"], kind="stable")
        keep = df.drop_duplicates("para", keep="first")
        return keep[["doc_id", "para_idx", "para"]]

    return hash_partition_apply(paras, ["para"], first_per_para, num_parts=32)


PARAGRAPH_DEDUP_SQL = f"""
WITH exploded AS (
    SELECT doc_id,
           unnest(str_split(text, '{PARA_SEP}')) AS para,
           unnest(range(1, len(str_split(text, '{PARA_SEP}')) + 1)) AS para_idx
    FROM documents
)
SELECT doc_id, CAST(para_idx AS BIGINT) AS para_idx, para
FROM exploded
QUALIFY row_number() OVER (PARTITION BY para ORDER BY doc_id, para_idx) = 1
"""


# ------------------------------------------- boilerplate removal


def boilerplate_strip(sf_dir: str, min_count: int = 3):
    """Source-level boilerplate filtering (the CCNet paragraph-frequency
    rule): a paragraph that repeats in >= ``min_count`` documents of the
    SAME source is boilerplate (nav bars, footers, license blocks) and is
    dropped from every document of that source.

    Two keyed shuffles, both over (key, hash)-sized rows:
    1. (source, para) partitions — count in place and tag each exploded row
       kept/dropped (the boilerplate decision never leaves the partition,
       so a hot boilerplate paragraph costs its own rows, nothing more);
    2. doc_id partitions — per-document kept/dropped aggregate.
    """
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # deterministic per-source footer (pure function of the documents
        # view, replayed by the oracle): the planted boilerplate every page
        # of a source shares — nav/footer/license analogue
        df["para"] = df["text"].str.split(PARA_SEP) + df["source"].map(
            lambda s: [f"(c) {s} all rights reserved"]
        )
        df = df[["doc_id", "source", "para"]].explode("para", ignore_index=True)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(df["doc_id"], "int64"),
                "source": pa.array(df["source"], "string"),
                "para": pa.array(df["para"], "string"),
            }
        )

    paras = docs.map_batches(explode, batch_format="pyarrow", batch_size=1024)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "kept": pd.Series([], dtype="int64")})
        # distinct docs per (source, para) — a paragraph repeated WITHIN one
        # doc is not boilerplate evidence
        freq = df.groupby(["source", "para"])["doc_id"].transform("nunique")
        out = pd.DataFrame({"doc_id": df["doc_id"], "kept": (freq < min_count).astype("int64")})
        return out

    tagged = hash_partition_apply(paras, ["source", "para"], tag, num_parts=32)

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n_kept": pd.Series([], dtype="int64"),
                 "n_dropped": pd.Series([], dtype="int64")}
            )
        g = df.groupby("doc_id")["kept"].agg(n_kept="sum", n_dropped=lambda s: (1 - s).sum()).reset_index()
        g["n_kept"] = g["n_kept"].astype("int64")
        g["n_dropped"] = g["n_dropped"].astype("int64")
        return g

    return hash_partition_apply(tagged, ["doc_id"], per_doc, num_parts=16)


def boilerplate_strip_sql(min_count: int = 3) -> str:
    return f"""
WITH exploded AS (
    SELECT doc_id, source,
           unnest(list_append(str_split(text, '{PARA_SEP}'),
                              '(c) ' || source || ' all rights reserved')) AS para
    FROM documents
), counts AS (
    SELECT source, para, count(DISTINCT doc_id) AS n_docs
    FROM exploded GROUP BY source, para
)
SELECT e.doc_id,
       CAST(sum(CASE WHEN c.n_docs < {min_count} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN c.n_docs >= {min_count} THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM exploded e JOIN counts c USING (source, para)
GROUP BY e.doc_id
"""


# ------------------------------------------------------------- splits


def hash_split_batch(batch: pa.Table) -> pa.Table:
    """doc_id → deterministic train/val/test tag from md5(doc_id).

    First hex byte of md5(str(doc_id)) < 0x0d (13/256 ≈ 5%) → val, next
    13/256 → test, rest train. Content- and corpus-independent: adding or
    resharding docs never flips an existing doc's split (the property that
    makes eval sets stable across crawl snapshots)."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    splits = []
    for i in ids:
        h = hashlib.md5(str(int(i)).encode()).hexdigest()[:2]
        splits.append("val" if h < "0d" else ("test" if h < "1a" else "train"))
    return pa.Table.from_pydict(
        {"doc_id": batch["doc_id"], "split": pa.array(splits, "string")}
    )


def hash_split(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(hash_split_batch, batch_format="pyarrow", batch_size=4096)


HASH_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d' THEN 'val'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' THEN 'test'
            ELSE 'train' END AS split
FROM documents
"""


# ---------------------------------------------------- stratified sample


def stratified_sample(sf_dir: str, k: int = 10):
    """Deterministic per-language sample: the k docs of each lang with the
    smallest md5(doc_id) — the stratified eval-set draw (stable under
    resharding and corpus growth of OTHER strata).

    One keyed shuffle on lang; the per-stratum top-k runs vectorized inside
    each key-complete partition. Hot strata cost only (lang, doc_id, h)
    triples; per-batch PRE-truncation to k keeps the shuffle payload
    bounded at batches x k per stratum regardless of corpus size."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def add_hash(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        t = batch.append_column("h", pa.array(h, "string"))
        # combiner: only each batch's k smallest per lang can survive
        df = t.to_pandas().sort_values(["lang", "h"]).groupby("lang").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    hashed = docs.map_batches(add_hash, batch_format="pyarrow", batch_size=4096)

    def top_k(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "lang": pd.Series([], dtype="object")}
            )
        out = df.sort_values(["lang", "h"]).groupby("lang").head(k)
        return out[["doc_id", "lang"]]

    return hash_partition_apply(hashed, ["lang"], top_k, num_parts=8)


def stratified_sample_sql(k: int = 10) -> str:
    return f"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR))) <= {k}
"""


# -------------------------------------------------- url canonicalization


def messy_url_batch(batch: pa.Table) -> pa.Table:
    """Deterministic messy-URL injection (pure function of doc_id/source):
    scheme/host case, default port, tracking params, trailing slash."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    sources = batch["source"].to_pylist()
    urls = []
    for doc_id, source in zip(ids, sources):
        m = doc_id % 4
        if m == 0:
            urls.append(f"HTTPS://Synth.Test:443/{source}/{doc_id}.html?utm_source=feed&utm_campaign=x")
        elif m == 1:
            urls.append(f"https://synth.test/{source}/{doc_id}.html/")
        elif m == 2:
            urls.append(f"http://SYNTH.test:80/{source}/{doc_id}.html?id={doc_id}&utm_medium=social")
        else:
            urls.append(f"https://synth.test/{source}/{doc_id}.html")
    return pa.Table.from_pydict({"doc_id": batch["doc_id"], "raw_url": pa.array(urls, "string")})


class UrlNormalizeKernel:
    """raw_url → canonical url, fully vectorized RE2 kernel passes:
    lowercase scheme+host, strip default ports, drop utm_* params (and a
    then-empty query), strip one trailing slash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["raw_url"]
        # lowercase the scheme://host[:port] prefix only
        prefix = pc.extract_regex(col, r"^(?P<p>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)")
        rest = pc.replace_substring_regex(col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
        low = pc.utf8_lower(pc.struct_field(prefix, "p"))
        low = pc.replace_substring_regex(low, r":443$|:80$", "")
        url = pc.binary_join_element_wise(low, rest, "")
        url = pc.replace_substring_regex(url, r"([?&])utm_[a-z]+=[^&]*", "\\1")
        url = pc.replace_substring_regex(url, r"[?&]+$", "")
        url = pc.replace_substring_regex(url, r"\?&", "?")
        url = pc.replace_substring_regex(url, r"/$", "")
        return pa.Table.from_pydict({"doc_id": batch["doc_id"], "url": url})


def url_normalize(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    messy = docs.map_batches(messy_url_batch, batch_format="pyarrow", batch_size=2048)
    return messy.map_batches(UrlNormalizeKernel, batch_format="pyarrow", batch_size=2048, concurrency=(1, 4))


URL_NORMALIZE_SQL = """
WITH messy AS (
  SELECT doc_id,
    CASE doc_id % 4
      WHEN 0 THEN 'HTTPS://Synth.Test:443/' || source || '/' || doc_id || '.html?utm_source=feed&utm_campaign=x'
      WHEN 1 THEN 'https://synth.test/' || source || '/' || doc_id || '.html/'
      WHEN 2 THEN 'http://SYNTH.test:80/' || source || '/' || doc_id || '.html?id=' || doc_id || '&utm_medium=social'
      ELSE 'https://synth.test/' || source || '/' || doc_id || '.html'
    END AS raw_url
  FROM documents
)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    lower(regexp_extract(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*'))
      || regexp_replace(raw_url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')
    , ':443/|:80/', '/'), '([?&])utm_[a-z]+=[^&]*', '\\1', 'g'), '[?&]+$', ''), '/$', '') AS url
FROM messy
"""


# ----------------------------------------------------------- url stats

_EXT_RE = r"\.(?P<ext>[a-z0-9]+)$"


def url_stats(sf_dir: str):
    """Per-extension page counts + text volume over the synthetic crawl.

    The url column is parsed with one RE2 kernel pass (host/ext), partials
    aggregated per batch, and the ≤|exts|-row partials combined on the
    driver — no shuffle at any corpus size."""
    import ray.data as rd

    from dedoc_ray.sources.synth import pages_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"])
    pages = docs.map_batches(pages_batch, batch_format="pyarrow")

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.struct_field(pc.extract_regex(batch["url"], _EXT_RE), "ext")
        n_chars = pc.utf8_length(batch["text"])
        df = pd.DataFrame({"ext": ext.to_pylist(), "n_chars": n_chars.to_numpy(zero_copy_only=False)})
        g = df.groupby("ext", as_index=False).agg(n_pages=("n_chars", "size"), n_chars=("n_chars", "sum"))
        g["n_pages"] = g["n_pages"].astype("int64")
        g["n_chars"] = g["n_chars"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = pages.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = partials.groupby("ext", as_index=False)[["n_pages", "n_chars"]].sum()
    return out


URL_STATS_SQL = """
SELECT CASE WHEN doc_id % 10 <= 6 THEN 'html'
            WHEN doc_id % 10 = 7 THEN (CASE WHEN doc_id % 20 = 17 THEN 'pdf' ELSE 'txt' END)
            WHEN doc_id % 10 = 8 THEN 'json'
            ELSE 'bin' END AS ext,
       count(*) AS n_pages,
       sum(length(text)) AS n_chars
FROM documents
GROUP BY 1
"""


# ------------------------------------------------- benchmark decontamination

DECON_MOD = 97
DECON_REM = 3


def _bench_mask(ids: np.ndarray) -> np.ndarray:
    return ids % DECON_MOD == DECON_REM


def benchmark_gram_hashes(sf_dir: str, n: int = 3) -> np.ndarray:
    """Distinct shingle hashes of the benchmark slice (doc_id % 97 == 3).

    The benchmark side of decontamination is SMALL AND FIXED by nature (an
    eval suite, not the corpus): its n-gram set is bounded regardless of
    corpus scale, so collecting the per-batch distinct partials and
    broadcasting the union is the correct 100 TB shape — the corpus side
    then streams map-only with zero shuffle (the GPT-3 §C / Dolma
    decontamination pattern)."""
    import ray.data as rd

    from dedoc_ray.ops.dedup import shingle_hashes

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.nonzero(_bench_mask(ids))[0]
        texts = batch["text"].take(pa.array(keep)).to_pylist()
        gs = [shingle_hashes(t, n) for t in texts]
        flat = np.unique(np.concatenate(gs)) if gs else np.empty(0, np.uint64)
        return pa.Table.from_pydict({"g": pa.array(flat.view(np.int64), "int64")})

    parts = docs.map_batches(partial, batch_format="pyarrow", batch_size=2048).to_pandas()
    return np.unique(parts["g"].to_numpy().view(np.uint64))


class DecontaminateKernel:
    """Per-doc benchmark n-gram overlap, vectorized against the broadcast
    sorted benchmark-hash array (searchsorted membership — no Python set).

    Emits integer columns only so the DuckDB oracle (string n-grams, same
    window semantics as ``jaccard_pairs_sql``) verifies counts exactly;
    hash values never leave the stage."""

    def __init__(self, bench_ref, n: int = 3) -> None:
        import ray

        self.bench = ray.get(bench_ref)  # sorted uint64
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedoc_ray.ops.dedup import shingle_hashes

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        bench = self.bench
        n_grams, n_overlap = [], []
        for t in texts:
            g = shingle_hashes(t, self.n)
            n_grams.append(len(g))
            if len(g) and len(bench):
                idx = np.searchsorted(bench, g)
                idx_c = np.minimum(idx, len(bench) - 1)
                n_overlap.append(int((bench[idx_c] == g).sum()))
            else:
                n_overlap.append(0)
        no = np.asarray(n_overlap, np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_grams": pa.array(n_grams, "int64"),
                "n_overlap": pa.array(no, "int64"),
                "contaminated": pa.array((no > 0).astype(np.int64), "int64"),
                "is_benchmark": pa.array(_bench_mask(ids).astype(np.int64), "int64"),
            }
        )


def decontaminate(sf_dir: str, n: int = 3):
    """Benchmark decontamination: flag corpus docs sharing any n-gram with
    the held-out benchmark slice.

    Two stages, no shuffle: (1) benchmark n-gram set built distributed and
    union-collected (bounded — see ``benchmark_gram_hashes``), ``ray.put``
    ONCE; (2) every doc scored by an actor pool that reads the broadcast
    array in ``__init__`` — nothing re-ships per batch."""
    import ray
    import ray.data as rd

    bench_ref = ray.put(benchmark_gram_hashes(sf_dir, n))
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        DecontaminateKernel,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )


# Same shingling as jaccard_pairs_sql: 3-word windows over [a-z0-9]+ tokens
# of the lowercased text, whole-text window when fewer than 3 tokens.
DECONTAMINATE_SQL = f"""
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
bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM sh WHERE doc_id % {DECON_MOD} = {DECON_REM}
),
per AS (SELECT doc_id, unnest(gs) AS g FROM sh),
ov AS (SELECT per.doc_id, count(*) AS n_overlap FROM per JOIN bench USING (g) GROUP BY 1)
SELECT s.doc_id,
       CAST(length(s.gs) AS BIGINT) AS n_grams,
       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(CASE WHEN coalesce(ov.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated,
       CAST(CASE WHEN s.doc_id % {DECON_MOD} = {DECON_REM} THEN 1 ELSE 0 END AS BIGINT) AS is_benchmark
FROM sh s LEFT JOIN ov ON s.doc_id = ov.doc_id
"""


# ---------------------------------------------------- global shuffle

SHUF_SHARDS = 16


def global_shuffle(sf_dir: str, n_shards: int = SHUF_SHARDS):
    """Deterministic global training-order shuffle: every doc gets a
    (shard, pos) — shard from md5('shuf:'+doc_id) mod n_shards, pos = the
    doc's rank in md5 order within its shard.

    The standard pre-training randomization, made reproducible: the order
    is a pure function of doc_id (re-runs and resharded inputs agree), and
    the only movement is ONE keyed shuffle of (doc_id, shard, sortkey)
    triples — the text never moves; a downstream writer joins payloads per
    shard. Within-partition ranking is a vectorized sort, so skewless
    n_shards partitions scale linearly with corpus size."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def keys(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sortkey = [hashlib.md5(f"shuf:{int(i)}".encode()).hexdigest() for i in ids]
        shard = np.array([int(k[:8], 16) % n_shards for k in sortkey], np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "shard": pa.array(shard, "int64"),
                "sortkey": pa.array(sortkey, "string"),
            }
        )

    keyed = docs.map_batches(keys, batch_format="pyarrow", batch_size=4096)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "shard": pd.Series([], dtype="int64"),
                 "pos": pd.Series([], dtype="int64")}
            )
        df = df.sort_values(["shard", "sortkey", "doc_id"])
        df["pos"] = df.groupby("shard").cumcount().astype("int64")
        return df[["doc_id", "shard", "pos"]]

    return hash_partition_apply(keyed, ["shard"], rank, num_parts=min(n_shards, 16))


GLOBAL_SHUFFLE_SQL = f"""
WITH k AS (
  SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS sortkey
  FROM documents
),
s AS (
  SELECT doc_id, sortkey,
         CAST('0x' || substr(sortkey, 1, 8) AS BIGINT) % {SHUF_SHARDS} AS shard
  FROM k
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY sortkey, doc_id) - 1 AS BIGINT) AS pos
FROM s
"""


# ------------------------------------------- within-doc line dedup


def line_dedup_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → text with repeated within-doc paragraphs removed
    (first occurrence kept, original order preserved) + the dropped count.

    Map-only — the RefinedWeb-style self-repetition trim needs no corpus
    state, so it costs one streaming pass and zero shuffles at any scale."""
    ids = batch["doc_id"].to_pylist()
    texts = []
    dropped = []
    for text in batch["text"].to_pylist():
        paras = text.split(PARA_SEP)
        kept = list(dict.fromkeys(paras))
        texts.append(PARA_SEP.join(kept))
        dropped.append(len(paras) - len(kept))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, "int64"),
            "text": pa.array(texts, "string"),
            "n_dropped": pa.array(dropped, "int64"),
        }
    )


def line_dedup(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(line_dedup_batch, batch_format="pyarrow", batch_size=1024)


LINE_DEDUP_SQL = f"""
WITH exploded AS (
    SELECT doc_id,
           unnest(str_split(text, '{PARA_SEP}')) AS para,
           unnest(range(1, len(str_split(text, '{PARA_SEP}')) + 1)) AS para_idx
    FROM documents
), firsts AS (
    SELECT doc_id, para, para_idx,
           row_number() OVER (PARTITION BY doc_id, para ORDER BY para_idx) AS occ
    FROM exploded
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN occ = 1 THEN para END, '{PARA_SEP}' ORDER BY para_idx), '') AS text,
       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM firsts
GROUP BY doc_id
"""


# ---------------------------------------- temperature mixture allocation


MIX_TOTAL = 200


def temperature_mix(sf_dir: str, total: int = MIX_TOTAL):
    """Temperature-weighted (alpha = 0.5) per-language document budget:
    quota_l proportional to isqrt(count_l) via largest-remainder rounding,
    then each language's quota filled in md5(doc_id) order.

    The multilingual-pretraining mixing rule (rare languages upsampled
    relative to their share), made integer-exact: isqrt keeps weights
    integral, largest remainder makes the quotas sum to the budget, and
    the md5 order makes the draw stable under resharding. Two streaming
    passes — a lang-count combiner (|langs| rows ever collected), then the
    stratified-sample selection with per-batch pre-truncation to quota."""
    import math

    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])

    def count_langs(batch: pa.Table) -> pa.Table:
        vc = pd.Series(batch["lang"].to_pylist()).value_counts()
        return pa.Table.from_pydict(
            {"lang": pa.array(vc.index, "string"), "cnt": pa.array(vc.values, "int64")}
        )

    partials = docs.map_batches(count_langs, batch_format="pyarrow", batch_size=4096).to_pandas()
    counts = partials.groupby("lang")["cnt"].sum().sort_index()  # tiny: one row per lang

    w = {l: math.isqrt(int(c)) for l, c in counts.items()}
    W = sum(w.values())
    base = {l: total * wl // W for l, wl in w.items()}
    rem = {l: (total * wl) % W for l, wl in w.items()}
    leftover = total - sum(base.values())
    for l in sorted(w, key=lambda l: (-rem[l], l))[:leftover]:
        base[l] += 1
    quota = base

    def select(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = [hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids]
        df = batch.append_column("h", pa.array(h, "string")).to_pandas()
        # combiner: only each batch's quota_l smallest per lang can survive
        df = df.sort_values(["lang", "h"])
        df = df.groupby("lang", group_keys=False).apply(
            lambda g: g.head(quota.get(g.name, 0))
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    hashed = docs.map_batches(select, batch_format="pyarrow", batch_size=4096)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"), "lang": pd.Series([], dtype="object")}
            )
        df = df.sort_values(["lang", "h"])
        out = df.groupby("lang", group_keys=False).apply(lambda g: g.head(quota.get(g.name, 0)))
        return out[["doc_id", "lang"]]

    return hash_partition_apply(hashed, ["lang"], final, num_parts=8)


def temperature_mix_sql(total: int = MIX_TOTAL) -> str:
    return f"""
WITH c AS (
  SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
), w AS (
  SELECT lang, CAST(floor(sqrt(cnt)) AS BIGINT) AS wl FROM c
), tot AS (
  SELECT sum(wl) AS W FROM w
), q AS (
  SELECT lang,
         ({total} * wl) // (SELECT W FROM tot) AS base,
         ({total} * wl) % (SELECT W FROM tot) AS rem
  FROM w
), lo AS (
  SELECT {total} - sum(base) AS R FROM q
), q2 AS (
  SELECT lang,
         base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) <= (SELECT R FROM lo)
                     THEN 1 ELSE 0 END AS quota
  FROM q
)
SELECT d.doc_id, d.lang
FROM documents d JOIN q2 ON q2.lang = d.lang
QUALIFY row_number() OVER (PARTITION BY d.lang ORDER BY md5(CAST(d.doc_id AS VARCHAR))) <= q2.quota
"""
