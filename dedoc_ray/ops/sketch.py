"""Cardinality sketches — HyperLogLog distinct counting at corpus scale.

The 100 TB question "how many distinct tokens / urls / fingerprints does
this corpus have?" cannot be answered with an exact ``unique`` (that is an
all-to-all shuffle of every value). A HyperLogLog sketch answers it with
**bounded state**: each batch folds its values into a 2^p-register array,
register partials merge by element-wise max, and only ``(bucket, rho)``
rows — at most 2^p per batch, usually far fewer — ever shuffle. One small
``groupby(bucket).max(rho)`` replaces the full-corpus exchange.

Determinism contract (the oracle hinges on it):
- value hash = md5-low64 little-endian (``_stable_hash64`` — the same
  definition the dedup/simhash oracles replay from ``md5()`` hex);
- bucket = top ``p`` bits, rho = leading-zero count of the remaining
  ``64-p`` bits + 1 (tail of 0 → 64-p+1);
- the integer estimator below uses pure rational arithmetic (HUGEINT in
  DuckDB, bignum in Python) — no floats anywhere, so Ray and SQL agree
  bit-for-bit.

Flavors of output:
- ``hll_registers(ds, col)`` → the mergeable sketch itself (what a real
  pipeline persists and unions across crawls);
- ``hll_estimate_rows(registers)`` → integer raw-estimator components
  (S, V, E_raw) — SQL-exact;
- ``hll_cardinality(registers)`` → the user-facing corrected estimate
  (linear counting in the small range, float) — accuracy is pytest-bound
  (~1.04/sqrt(m) standard error), not SQL-replayed.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np
import pyarrow as pa

# Fixed geometry: p=12 → m=4096 registers, ~1.6 % standard error. The
# estimator's rational constants below are specialized to this m.
P = 12
M = 1 << P
TAIL_BITS = 64 - P  # 52
RHO_MAX = TAIL_BITS + 1  # 53
_Q = 40  # fixed-point scale for the integer estimator (rho clamped to _Q)


def _hash64_column(vals) -> np.ndarray:
    """md5-low64 of each string — vectorized over UNIQUE values (token
    columns are Zipfian; urls hash once each)."""
    import pandas as pd

    from dedoc_ray.ops.dedup import _stable_hash64

    s = pd.Series(vals, dtype="object")
    uniq, inv = np.unique(s.to_numpy(), return_inverse=True)
    hs = np.fromiter((_stable_hash64(str(u)) for u in uniq), dtype=np.uint64,
                     count=len(uniq))
    return hs[inv]


def _fold_registers(h64: np.ndarray) -> np.ndarray:
    """hashes → dense m-register array (uint8 rho per bucket, 0 = empty)."""
    regs = np.zeros(M, dtype=np.uint8)
    if len(h64) == 0:
        return regs
    bucket = (h64 >> np.uint64(TAIL_BITS)).astype(np.int64)
    tail = h64 & np.uint64((1 << TAIL_BITS) - 1)
    # bit_length via frexp: doubles hold any int < 2^52 exactly, and frexp's
    # exponent IS the bit length — integer-exact, no log2 rounding edge
    bl = np.frexp(tail.astype(np.float64))[1]
    rho = (RHO_MAX - bl).astype(np.uint8)  # tail==0 → bl=0 → rho=53
    np.maximum.at(regs, bucket, rho)
    return regs


class _HllKernel:
    """Per-batch partial: tokenize/select values, fold to registers, emit
    sparse (bucket, rho) rows. Stateless beyond the compiled pattern."""

    def __init__(self, col: str, tokenize: bool):
        import re

        self.col = col
        self.tok = re.compile(r"[a-z0-9]+") if tokenize else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [v for v in batch[self.col].to_pylist() if v is not None]
        if self.tok is not None:
            toks: list = []
            for t in vals:
                toks.extend(self.tok.findall((t or "").lower()))
            vals = toks
        regs = _fold_registers(_hash64_column(vals)) if vals else np.zeros(M, np.uint8)
        nz = np.nonzero(regs)[0]
        return pa.Table.from_pydict({
            "bucket": pa.array(nz.astype(np.int64)),
            "rho": pa.array(regs[nz].astype(np.int64)),
        })


def hll_registers(ds, col: str, tokenize: bool = False):
    """Dataset → merged HLL register Dataset ``(bucket, rho)``; at most m
    rows. ``tokenize=True`` sketches distinct [a-z0-9]+ tokens of a text
    column instead of distinct cell values."""
    def fold(batch: pa.Table) -> pa.Table:
        # task-based: the kernel's only state is a compiled regex, and an
        # actor pool's spinup costs ~10× the whole fold at small scale
        return _HllKernel(col, tokenize)(batch)

    partials = ds.map_batches(fold, batch_format="pyarrow")

    # merge = elementwise max over a FIXED m-register array. The native
    # groupby("bucket").max would pay ~10 s of hash-aggregate actor spinup
    # for <= m rows (the late_events finding); instead tree-combine: Ray
    # coalesces partial blocks into 64k-row batches, each refolds to <= m
    # rows (~16x reduction per level), then ONE bounded driver fold.
    def combine(batch: pa.Table) -> pa.Table:
        regs = np.zeros(M, dtype=np.uint8)
        b = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["rho"].to_numpy(zero_copy_only=False).astype(np.uint8)
        np.maximum.at(regs, b, r)
        nz = np.nonzero(regs)[0]
        return pa.Table.from_pydict({
            "bucket": pa.array(nz.astype(np.int64)),
            "rho": pa.array(regs[nz].astype(np.int64)),
        })

    combined = partials.map_batches(combine, batch_format="pyarrow", batch_size=65536)
    df = combined.to_pandas()  # bounded: ceil(n_blocks/16) x <= m rows
    regs = np.zeros(M, dtype=np.uint8)
    if len(df):
        np.maximum.at(regs, df["bucket"].to_numpy(np.int64), df["rho"].to_numpy(np.uint8))
    nz = np.nonzero(regs)[0]
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pydict({
        "bucket": pa.array(nz.astype(np.int64)),
        "rho": pa.array(regs[nz].astype(np.int64)),
    }))


def estimate_components(buckets: np.ndarray, rhos: np.ndarray) -> Tuple[int, int, int]:
    """(S, V, E_raw) of the integer raw estimator — exact bignum math.

    S = sum over all m buckets of 2^(Q - min(rho, Q)) (empty bucket: 2^Q);
    V = empty-bucket count;
    E_raw = alpha_m * m^2 * 2^Q // S with alpha_m = 7213000m / (10000(1000m+1079)).
    """
    full = np.zeros(M, dtype=np.int64)
    full[buckets] = rhos
    clamped = np.minimum(full, _Q)
    s = int(np.sum(np.int64(1) << (np.int64(_Q) - clamped)))
    v = int(np.count_nonzero(full == 0))
    e_raw = (7213000 * M * M * M * (1 << _Q)) // (10000 * (1000 * M + 1079) * s)
    return s, v, e_raw


def hll_estimate_rows(registers) -> pa.Table:
    """Register Dataset → one-row integer table (n_registers, v_empty,
    s_scaled, e_raw) — every value SQL-replayable."""
    tbl = registers.to_arrow_refs()
    import ray

    parts = [ray.get(r) for r in tbl]
    t = pa.concat_tables([p for p in parts if p.num_rows] or [pa.table({"bucket": pa.array([], "int64"), "rho": pa.array([], "int64")})])
    b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = t["rho"].to_numpy(zero_copy_only=False).astype(np.int64)
    s, v, e_raw = estimate_components(b, r)
    return pa.Table.from_pydict({
        "n_registers": pa.array([int(len(b))], "int64"),
        "v_empty": pa.array([v], "int64"),
        "s_scaled": pa.array([s], "int64"),
        "e_raw": pa.array([e_raw], "int64"),
    })


def hll_cardinality(registers) -> float:
    """User-facing corrected estimate: linear counting when the sketch is
    sparse (V > 0 and raw estimate ≤ 2.5m), raw estimator otherwise."""
    import ray

    parts = [ray.get(r) for r in registers.to_arrow_refs()]
    t = pa.concat_tables([p for p in parts if p.num_rows] or [pa.table({"bucket": pa.array([], "int64"), "rho": pa.array([], "int64")})])
    b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    r = t["rho"].to_numpy(zero_copy_only=False).astype(np.int64)
    s, v, e_raw = estimate_components(b, r)
    if v > 0 and e_raw <= 5 * M // 2:
        return M * math.log(M / v)
    return float(e_raw)


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _le64_of(hex_expr: str) -> str:
    """SQL for the engine's md5-low64 (little-endian byte reassembly) of an
    arbitrary md5-hex expression."""
    return " + ".join(
        f"(CAST(CAST(('0x' || substr({hex_expr}, {1 + 2 * i}, 2)) AS UBIGINT) AS HUGEINT) * {256 ** i})"
        for i in range(8)
    )


_LE64 = _le64_of("h")


def hll_registers_sql(source_cte: str) -> str:
    """Register oracle over ``source_cte`` (must yield column ``val``)."""
    return f"""
WITH src AS ({source_cte}),
hashed AS (
  SELECT md5(val) AS h FROM (SELECT DISTINCT val FROM src WHERE val IS NOT NULL)
),
h64 AS (
  SELECT CAST({_LE64} AS HUGEINT) AS hv FROM hashed
),
parts AS (
  SELECT CAST(hv // {1 << TAIL_BITS} AS BIGINT) AS bucket,
         CAST(hv % {1 << TAIL_BITS} AS HUGEINT) AS tail
  FROM h64
),
rhos AS (
  SELECT bucket,
         CASE WHEN tail = 0 THEN {RHO_MAX}
              ELSE {RHO_MAX} - length(bin(CAST(tail AS UBIGINT)))
         END AS rho
  FROM parts
)
SELECT bucket, CAST(max(rho) AS BIGINT) AS rho FROM rhos GROUP BY bucket
"""


#: rho → 2^(Q - min(rho, Q)) as exact integer literals (no float pow in SQL)
_TERM_CASE = ("CASE WHEN rho >= " + str(_Q) + " THEN 1 "
              + " ".join(f"WHEN rho = {r} THEN {1 << (_Q - r)}" for r in range(1, _Q))
              + " END")


def hll_estimate_sql(source_cte: str) -> str:
    return f"""
WITH regs AS ({hll_registers_sql(source_cte)}),
s AS (
  SELECT count(*) AS n_regs,
         sum(CAST({_TERM_CASE} AS HUGEINT)) AS s_used
  FROM regs
)
SELECT CAST(n_regs AS BIGINT) AS n_registers,
       CAST({M} - n_regs AS BIGINT) AS v_empty,
       CAST(s_used + ({M} - n_regs) * CAST({1 << _Q} AS HUGEINT) AS BIGINT) AS s_scaled,
       CAST(CAST({7213000 * M * M * M} AS HUGEINT) * {1 << _Q}
            // (CAST({10000 * (1000 * M + 1079)} AS HUGEINT)
                * (s_used + ({M} - n_regs) * CAST({1 << _Q} AS HUGEINT))) AS BIGINT) AS e_raw
FROM s
"""


# ---------------------------------------------------------------------------
# Count-min sketch — bounded-state frequency estimation
# ---------------------------------------------------------------------------
#
# The frequency sibling of the HLL/Bloom family: estimate per-token counts
# with a fixed D×W counter matrix instead of an exact vocabulary groupby
# (ops/vocab.py). Per-batch partials are local counter matrices merging by
# ELEMENTWISE SUM, so at most D×W rows shuffle per batch regardless of
# vocabulary size, and the merged sketch answers any point query with the
# classic one-sided guarantee: est ≥ true, est ≤ true + εN w.h.p. Hashing
# reuses the md5-low64 + Kirsch-Mitzenmacher double-hash idiom of
# ops/bloom.py, so DuckDB replays the sketch bit-exactly.

CMS_D = 4
CMS_W = 2048


def _cms_positions(tokens: List[str]) -> np.ndarray:
    """(n, CMS_D) int64 counter columns per token."""
    from dedoc_ray.ops.dedup import _stable_hash64

    if not tokens:
        return np.zeros((0, CMS_D), np.int64)
    h64 = np.fromiter((_stable_hash64(t) for t in tokens), dtype=np.uint64,
                      count=len(tokens))
    h1 = (h64 & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h64 >> np.uint64(32)).astype(np.uint64)
    j = np.arange(CMS_D, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(CMS_W)).astype(np.int64)


class _CmsPartialKernel:
    """text batch → nonzero (row, col, cnt) counter triples (≤ D×W)."""

    def __init__(self) -> None:
        import re

        self.tok = re.compile(r"[a-z0-9]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: "Counter[str]" = Counter()
        for t in batch["text"].to_pylist():
            counts.update(self.tok.findall((t or "").lower()))
        toks = sorted(counts)
        pos = _cms_positions(toks)
        cnts = np.fromiter((counts[t] for t in toks), dtype=np.int64, count=len(toks))
        mat = np.zeros((CMS_D, CMS_W), np.int64)
        for j in range(CMS_D):
            np.add.at(mat[j], pos[:, j], cnts)
        rows, cols = np.nonzero(mat)
        return pa.Table.from_pydict({
            "row": pa.array(rows.astype(np.int64)),
            "col": pa.array(cols.astype(np.int64)),
            "cnt": pa.array(mat[rows, cols]),
        })


def cms_build(ds):
    """text Dataset → merged sketch Dataset (row, col, cnt)."""
    def fold(batch: pa.Table) -> pa.Table:
        return _CmsPartialKernel()(batch)  # task-based: stateless kernel

    parts = ds.map_batches(fold, batch_format="pyarrow", batch_size=1024)
    return parts.groupby(["row", "col"]).sum("cnt").rename_columns(["row", "col", "cnt"])


def cms_estimate(sf_dir: str, probes=None):
    """Point-query the corpus token sketch for a fixed probe set →
    (token, est_count) pyarrow table. The merged sketch is ≤ D×W rows, so
    the driver-side min-over-rows is bounded by geometry, never corpus."""
    import ray.data as rd

    from dedoc_ray.ops.textstats import STOPWORDS

    probes = tuple(probes) if probes else STOPWORDS
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    sketch = cms_build(docs)
    mat = np.zeros((CMS_D, CMS_W), np.int64)
    for r in sketch.iter_rows():
        mat[r["row"], r["col"]] = r["cnt"]
    pos = _cms_positions(list(probes))
    est = np.array(
        [mat[np.arange(CMS_D), pos[i]].min() for i in range(len(probes))], np.int64
    )
    return pa.Table.from_pydict({
        "token": pa.array(list(probes), "string"),
        "est_count": pa.array(est.astype(np.int64)),
    })


def cms_estimate_sql(probes=None) -> str:
    from dedoc_ray.ops.textstats import STOPWORDS

    probes = tuple(probes) if probes else STOPWORDS
    probe_vals = ", ".join(f"('{p}')" for p in probes)
    tok_le = _le64_of("md5(tok)")
    probe_le = _le64_of("md5(token)")
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents
),
tc AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
h AS (
  SELECT cnt,
         CAST(({tok_le}) % 4294967296 AS HUGEINT) AS h1,
         CAST(({tok_le}) // 4294967296 AS HUGEINT) AS h2
  FROM tc
),
cells AS (
  SELECT j.j AS row, CAST((h1 + j.j * h2) % {CMS_W} AS BIGINT) AS col,
         sum(cnt) AS cell
  FROM h CROSS JOIN (SELECT unnest(range({CMS_D})) AS j) j
  GROUP BY 1, 2
),
probes(token) AS (VALUES {probe_vals}),
ph AS (
  SELECT token,
         CAST(({probe_le}) % 4294967296 AS HUGEINT) AS h1,
         CAST(({probe_le}) // 4294967296 AS HUGEINT) AS h2
  FROM probes
),
pq AS (
  SELECT token, j.j AS row, CAST((h1 + j.j * h2) % {CMS_W} AS BIGINT) AS col
  FROM ph CROSS JOIN (SELECT unnest(range({CMS_D})) AS j) j
)
SELECT pq.token, CAST(min(coalesce(cells.cell, 0)) AS BIGINT) AS est_count
FROM pq LEFT JOIN cells ON pq.row = cells.row AND pq.col = cells.col
GROUP BY pq.token
"""
