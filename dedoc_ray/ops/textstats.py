"""Text analysis operators over a document corpus.

Each operator is a vectorized ``map_batches`` stage (compiled regex held in
an actor, one pass per batch) — the building blocks a large-scale
training-data pipeline needs: token counting, quality ratios, language-ID
heuristic, content fingerprinting. All are SQL-expressible so the DuckDB
oracle can verify them exactly.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")
# GPT-2-style pre-tokenizer approximation, shared VERBATIM with the DuckDB
# oracle (RE2-compatible: no lookahead, ASCII classes)
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
BPE_RE = re.compile(BPE_PATTERN)
# Pinned to RE2's ASCII \s class ([\t\n\f\r ]) so the DuckDB oracles (which
# run RE2 '\s+') agree byte-for-byte even on \xa0 / \v / unicode whitespace.
WS_RE = re.compile(r"[ \t\n\f\r]+")
CYRILLIC_RE = re.compile(r"[Ѐ-ӿ]")
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


class DocStatsKernel:
    """doc_id → token/stopword/char counts + md5 fingerprint.

    Fingerprint = md5 of lowercased, whitespace-collapsed text — the exact
    dedup key (reference has no corpus dedup; SURVEY.md §2.7 defines ours).
    """

    def __init__(self) -> None:
        self.token_re = TOKEN_RE
        self.ws_re = WS_RE
        self.stop = frozenset(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tokens, n_stop, tok_chars, n_bpe, fps = [], [], [], [], []
        for text in texts:
            toks = self.token_re.findall(text.lower())
            n_tokens.append(len(toks))
            n_stop.append(sum(1 for t in toks if t in self.stop))
            tok_chars.append(sum(len(t) for t in toks))
            # BPE-ish pre-tokenizer count — the training-data budget metric
            n_bpe.append(len(BPE_RE.findall(text)))
            # strip(" ") not strip(): DuckDB trim() removes spaces only, and
            # after the ASCII-\s collapse the edges are single spaces anyway
            normalized = self.ws_re.sub(" ", text.lower()).strip(" ")
            fps.append(hashlib.md5(normalized.encode("utf-8")).hexdigest())
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n_tokens, "int64"),
                "n_stopwords": pa.array(n_stop, "int64"),
                "n_token_chars": pa.array(tok_chars, "int64"),
                "n_bpe_tokens": pa.array(n_bpe, "int64"),
                "fingerprint": pa.array(fps, "string"),
            }
        )


class QualityKernel:
    """Quality/lang heuristics with deterministic integer-valued outputs.

    quality_class: 0 = too short (<32 tokens), 1 = ok, 2 = long (>=64).
    lang_guess: "cyr" if any cyrillic char, "en" if stopword present,
    else "other" — an n-gram-free heuristic that stays SQL-checkable.
    """

    def __init__(self) -> None:
        self.token_re = TOKEN_RE
        self.stop = frozenset(STOPWORDS)
        self.cyr = CYRILLIC_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        quality, lang = [], []
        for text in texts:
            toks = self.token_re.findall(text.lower())
            n = len(toks)
            quality.append(0 if n < 32 else (2 if n >= 64 else 1))
            if self.cyr.search(text):
                lang.append("cyr")
            elif any(t in self.stop for t in toks):
                lang.append("en")
            else:
                lang.append("other")
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "quality_class": pa.array(quality, "int64"),
                "lang_guess": pa.array(lang, "string"),
            }
        )


def doc_stats(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(DocStatsKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))


def doc_quality(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(QualityKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))


DOC_STATS_SQL = f"""
SELECT doc_id,
       length(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
       length(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                          t -> t IN ('the','a','and','of','to','in','is'))) AS n_stopwords,
       length(list_aggregate(regexp_extract_all(lower(text), '[a-z0-9]+'), 'string_agg', '')) AS n_token_chars,
       length(regexp_extract_all(text, '{BPE_PATTERN.replace(chr(39), chr(39) * 2)}')) AS n_bpe_tokens,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""

DOC_QUALITY_SQL = """
WITH toks AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
)
SELECT doc_id,
       CASE WHEN length(t) < 32 THEN 0 WHEN length(t) >= 64 THEN 2 ELSE 1 END AS quality_class,
       CASE WHEN regexp_matches(text, '[\\x{0400}-\\x{04ff}]') THEN 'cyr'
            WHEN length(list_filter(t, x -> x IN ('the','a','and','of','to','in','is'))) > 0 THEN 'en'
            ELSE 'other' END AS lang_guess
FROM toks
"""


class GopherQualityKernel:
    """Gopher-style quality filter rules (Rae et al. 2021, public) —
    deterministic integer outputs so DuckDB can verify exactly:

      r_wordcount: 50 <= n words <= 100000
      r_wordlen:   3 <= mean word length*10 <= 100 (x10 to stay integral)
      r_hashratio: '#' count * 10 <= n words
      r_bullet:    lines starting with '-'/'*' <= 90% of lines
      r_dupline:   duplicate-line fraction <= 30% (Gopher repetition family)
      passes:      all rules hold
    """

    def __init__(self) -> None:
        self.ws_re = WS_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        cols = {k: [] for k in ("r_wordcount", "r_wordlen", "r_hashratio", "r_bullet", "r_dupline", "passes")}
        for text in texts:
            # words/lines pinned to the SQL oracle's definitions exactly:
            # words split on RE2-\s ([ \t\n\f\r]+), lines split on '\n' only,
            # bullet-lstrip on space+tab only (DuckDB ltrim(x, ' '||chr(9)))
            words = [w for w in self.ws_re.split(text) if w]
            n = len(words)
            mean_len_x10 = (sum(len(w) for w in words) * 10) // n if n else 0
            lines = text.split("\n")
            n_bullet = sum(1 for ln in lines if ln.lstrip(" \t").startswith(("-", "*")))
            n_dup = len(lines) - len(set(lines))
            r_wc = 1 if 50 <= n <= 100000 else 0
            r_wl = 1 if 30 <= mean_len_x10 <= 100 else 0
            r_hash = 1 if text.count("#") * 10 <= n else 0
            r_bul = 1 if n_bullet * 10 <= 9 * len(lines) else 0
            r_dup = 1 if n_dup * 10 <= 3 * len(lines) else 0
            cols["r_wordcount"].append(r_wc)
            cols["r_wordlen"].append(r_wl)
            cols["r_hashratio"].append(r_hash)
            cols["r_bullet"].append(r_bul)
            cols["r_dupline"].append(r_dup)
            cols["passes"].append(r_wc & r_wl & r_hash & r_bul & r_dup)
        out = {"doc_id": batch["doc_id"]}
        out.update({k: pa.array(v, "int64") for k, v in cols.items()})
        return pa.Table.from_pydict(out)


def gopher_quality(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(GopherQualityKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))


GOPHER_QUALITY_SQL = """
WITH m AS (
  SELECT doc_id, text,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n,
         length(regexp_replace(text, '\\s+', '', 'g')) AS tot_chars,
         regexp_split_to_array(text, chr(10)) AS lines
  FROM documents
),
r AS (
  SELECT doc_id, n, lines,
         CASE WHEN n = 0 THEN 0 ELSE (tot_chars * 10) // n END AS mean_len_x10,
         len(list_filter(lines, x -> ltrim(x, ' ' || chr(9)) LIKE '-%'
                                   OR ltrim(x, ' ' || chr(9)) LIKE '*%')) AS n_bullet,
         len(lines) AS n_lines,
         len(lines) - len(list_distinct(lines)) AS n_dup,
         length(text) - length(replace(text, '#', '')) AS n_hash
  FROM m
)
SELECT doc_id,
       CAST(CASE WHEN n BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS r_wordcount,
       CAST(CASE WHEN mean_len_x10 BETWEEN 30 AND 100 THEN 1 ELSE 0 END AS BIGINT) AS r_wordlen,
       CAST(CASE WHEN n_hash * 10 <= n THEN 1 ELSE 0 END AS BIGINT) AS r_hashratio,
       CAST(CASE WHEN n_bullet * 10 <= 9 * n_lines THEN 1 ELSE 0 END AS BIGINT) AS r_bullet,
       CAST(CASE WHEN n_dup * 10 <= 3 * n_lines THEN 1 ELSE 0 END AS BIGINT) AS r_dupline,
       CAST(CASE WHEN n BETWEEN 50 AND 100000 AND mean_len_x10 BETWEEN 30 AND 100
                  AND n_hash * 10 <= n AND n_bullet * 10 <= 9 * n_lines
                  AND n_dup * 10 <= 3 * n_lines
             THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM r
"""


class GopherRepetitionKernel:
    """Gopher repetition-family rules (Rae et al. 2021 §A1.1), pinned to
    integer definitions so DuckDB replays them exactly:

      top{2,3,4}_x1000: chars of the most frequent word n-gram (count ×
        chars of the joined gram) as a fraction ×1000 of the doc's joined
        word chars; tie-break = the max-count gram occurring FIRST.
      dup5_x1000: chars of repeated occurrences (count-1 per unique
        duplicated 5-gram) as a fraction ×1000.
      passes: top2<=200, top3<=180, top4<=160, dup5<=150 (Gopher's 0.20 /
        0.18 / 0.16 / 0.15 thresholds).

    Vectorized per doc: one siphash over the word array, rolling-polynomial
    window hashes (shared with ops.dedup), np.unique for mode/counts —
    gram strings are never re-materialized, and hash values never leave
    the stage (only counts are compared; same argument as jaccard_pairs).
    """

    def __init__(self) -> None:
        self.ws_re = WS_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        from dedoc_ray.ops.dedup import _shingles_of_hashes

        texts = batch["text"].to_pylist()
        cols = {k: [] for k in ("top2_x1000", "top3_x1000", "top4_x1000", "dup5_x1000", "passes")}
        for text in texts:
            words = [w for w in self.ws_re.split(text) if w]
            L = len(words)
            lens = np.fromiter((len(w) for w in words), np.int64, L)
            cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])
            norm = int(cum[-1]) + max(L - 1, 0)
            h = (
                pd.util.hash_array(np.asarray(words, dtype=object)).astype(np.uint64)
                if L
                else np.empty(0, np.uint64)
            )
            vals = {"dup5_x1000": 0}
            for n in (2, 3, 4, 5):
                key = f"top{n}_x1000"
                if L < n:
                    if n < 5:
                        vals[key] = 0
                    continue
                gh = _shingles_of_hashes(h, n)
                chars = cum[n:] - cum[:-n] + (n - 1)
                uniq, inv, cnt = np.unique(gh, return_inverse=True, return_counts=True)
                if n < 5:
                    cmax = int(cnt.max())
                    pos = int(np.nonzero(cnt[inv] == cmax)[0][0])
                    vals[key] = cmax * int(chars[pos]) * 1000 // norm
                else:
                    first_pos = np.full(len(uniq), L, np.int64)
                    np.minimum.at(first_pos, inv, np.arange(len(gh)))
                    dmask = cnt >= 2
                    vals["dup5_x1000"] = (
                        int(((cnt[dmask] - 1) * chars[first_pos[dmask]]).sum()) * 1000 // norm
                    )
            p = int(
                vals["top2_x1000"] <= 200
                and vals["top3_x1000"] <= 180
                and vals["top4_x1000"] <= 160
                and vals["dup5_x1000"] <= 150
            )
            for k in ("top2_x1000", "top3_x1000", "top4_x1000", "dup5_x1000"):
                cols[k].append(vals[k])
            cols["passes"].append(p)
        out = {"doc_id": batch["doc_id"]}
        out.update({k: pa.array(v, "int64") for k, v in cols.items()})
        return pa.Table.from_pydict(out)


def gopher_repetition(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(GopherRepetitionKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))


def _rep_cte(n: int) -> str:
    """Per-n CTE trio: windows with positions, per-gram counts, ranked top."""
    return f"""
g{n} AS (
  SELECT doc_id, norm,
         unnest([{{'i': i, 'g': array_to_string(t[i:i+{n - 1}], ' ')}}
                 for i in range(1, greatest(L - {n} + 1, 0) + 1)]) AS u
  FROM base WHERE L >= {n}
),
c{n} AS (
  SELECT doc_id, min(norm) AS norm, u.g AS g, count(*) AS c, min(u.i) AS fp,
         length(u.g) AS gc
  FROM g{n} GROUP BY doc_id, u.g
),
t{n} AS (
  SELECT doc_id, (c * gc * 1000) // norm AS v,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, fp ASC) AS rn
  FROM c{n}
)"""


GOPHER_REPETITION_SQL = f"""
WITH w AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
base AS (
  SELECT doc_id, t, len(t) AS L, length(array_to_string(t, ' ')) AS norm FROM w
),{_rep_cte(2)},{_rep_cte(3)},{_rep_cte(4)},{_rep_cte(5)},
d5 AS (
  SELECT doc_id, (sum((c - 1) * gc) * 1000) // min(norm) AS v
  FROM c5 WHERE c >= 2 GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(coalesce(t2s.v, 0) AS BIGINT) AS top2_x1000,
       CAST(coalesce(t3s.v, 0) AS BIGINT) AS top3_x1000,
       CAST(coalesce(t4s.v, 0) AS BIGINT) AS top4_x1000,
       CAST(coalesce(d5.v, 0) AS BIGINT) AS dup5_x1000,
       CAST(CASE WHEN coalesce(t2s.v, 0) <= 200 AND coalesce(t3s.v, 0) <= 180
                  AND coalesce(t4s.v, 0) <= 160 AND coalesce(d5.v, 0) <= 150
             THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM base b
LEFT JOIN (SELECT doc_id, v FROM t2 WHERE rn = 1) t2s ON b.doc_id = t2s.doc_id
LEFT JOIN (SELECT doc_id, v FROM t3 WHERE rn = 1) t3s ON b.doc_id = t3s.doc_id
LEFT JOIN (SELECT doc_id, v FROM t4 WHERE rn = 1) t4s ON b.doc_id = t4s.doc_id
LEFT JOIN d5 ON b.doc_id = d5.doc_id
"""
