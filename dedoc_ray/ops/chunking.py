"""Token-window document chunking — the context-window prep step.

Long documents become overlapping fixed-size token windows (the RAG /
pretraining "sliding context" split): chunk of CHUNK tokens every STRIDE
tokens, so consecutive chunks overlap by CHUNK - STRIDE tokens and no
token is more than one window from a chunk boundary.

Shape: pure flat_map — one streaming pass, zero shuffles, output rows
carry (doc_id, chunk_id) so downstream stages can re-group or join back
to the parent document. At 100 TB the op is embarrassingly parallel; the
only knob that matters is batch_size (output is ~n_tokens/STRIDE x the
input row count)."""

from __future__ import annotations

from typing import List

import pyarrow as pa

from dedoc_ray.ops.textstats import TOKEN_RE

CHUNK = 64
STRIDE = 48


def chunk_batch(batch: pa.Table, chunk: int = CHUNK, stride: int = STRIDE) -> pa.Table:
    ids: List[int] = []
    cids: List[int] = []
    ntoks: List[int] = []
    texts: List[str] = []
    for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = TOKEN_RE.findall(text.lower())
        n = len(toks)
        for start in range(0, n, stride):
            piece = toks[start : start + chunk]
            ids.append(did)
            cids.append(start // stride)
            ntoks.append(len(piece))
            texts.append(" ".join(piece))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, "int64"),
            "chunk_id": pa.array(cids, "int64"),
            "n_tokens": pa.array(ntoks, "int64"),
            "chunk_text": pa.array(texts, "string"),
        }
    )


def chunk_documents(sf_dir: str, chunk: int = CHUNK, stride: int = STRIDE):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda b: chunk_batch(b, chunk, stride), batch_format="pyarrow", batch_size=512
    )


def chunk_documents_sql(chunk: int = CHUNK, stride: int = STRIDE) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
), s AS (
  SELECT doc_id, toks, unnest(range(0, len(toks), {stride})) AS start
  FROM t WHERE len(toks) > 0
)
SELECT doc_id,
       CAST(start // {stride} AS BIGINT) AS chunk_id,
       CAST(least(start + {chunk}, len(toks)) - start AS BIGINT) AS n_tokens,
       array_to_string(toks[start + 1 : start + {chunk}], ' ') AS chunk_text
FROM s
"""
