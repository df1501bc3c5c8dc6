"""Dedup operator tests: vectorized shingle/minhash hashing properties and
the fully-distributed MinHash-LSH verify on a duplicate-heavy corpus."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dedoc_ray.ops.dedup import (
    MinHashKernel,
    ShingleKernel,
    SimHashKernel,
    _shingles_of_hashes,
    shingle_hashes,
)

SF = "/root/testdata/sf0.001"


def test_shingle_hashes_deterministic_and_distinct():
    t = "the quick brown fox jumps over the lazy dog the quick brown fox"
    a = shingle_hashes(t)
    b = shingle_hashes(t)
    assert np.array_equal(a, b)
    assert len(np.unique(a)) == len(a)
    # n tokens → n - 2 trigram windows, some repeated → distinct <= windows
    assert 1 <= len(a) <= len(t.split()) - 2


def test_shingle_hashes_short_doc_single_shingle():
    assert len(shingle_hashes("hello world")) == 1
    assert len(shingle_hashes("hello")) == 1
    assert len(shingle_hashes("")) == 0
    # whole-doc shingle differs between different short docs
    assert shingle_hashes("hello world")[0] != shingle_hashes("world hello")[0]


def test_shingle_kernel_batch_matches_scalar_path():
    texts = ["alpha beta gamma delta", "x", "", "alpha beta gamma delta epsilon"]
    batch = pa.Table.from_pydict(
        {"doc_id": pa.array(range(len(texts)), "int64"), "text": pa.array(texts, "string")}
    )
    out = ShingleKernel(n=3)(batch).to_pandas()
    for i, t in enumerate(texts):
        got = np.sort(out.loc[out["doc_id"] == i, "shingle"].to_numpy("uint64"))
        assert np.array_equal(got, shingle_hashes(t, 3)), f"doc {i}"


def test_minhash_identical_docs_identical_signatures():
    k = MinHashKernel(num_perm=32, band_size=4)
    texts = ["one two three four five six seven eight"] * 2 + ["totally different words here now"]
    sig = k.signatures(texts)
    assert np.array_equal(sig[0], sig[1])
    assert not np.array_equal(sig[0], sig[2])
    bh = k.band_keys(sig)
    assert bh.shape == (3, 8)
    assert np.array_equal(bh[0], bh[1])


def test_minhash_similar_docs_share_bands():
    k = MinHashKernel(num_perm=128, band_size=4)
    base = " ".join(f"w{i}" for i in range(100))
    near = " ".join(f"w{i}" for i in range(95)) + " z1 z2 z3 z4 z5"
    bh = k.band_keys(k.signatures([base, near]))
    assert (bh[0] == bh[1]).sum() >= 1  # high-jaccard pair collides in >=1 band


def test_simhash_deterministic_and_band_decomposition():
    k = SimHashKernel()
    s = k.simhash("the quick brown fox")
    assert s == k.simhash("the quick brown fox")
    batch = pa.Table.from_pydict(
        {"doc_id": pa.array([0], "int64"), "text": pa.array(["the quick brown fox"], "string")}
    )
    out = k(batch).to_pandas()
    v = int(out["simhash"][0])
    for band in range(4):
        assert int(out[f"band{band}"][0]) == (v >> (16 * band)) & 0xFFFF


def _exact_jaccard_pairs(texts, threshold=0.5):
    sets = [set(shingle_hashes(t).tolist()) for t in texts]
    out = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter / union >= threshold:
                out.add((a, b))
    return out


def test_minhash_lsh_dup_heavy_distributed(ray_session, tmp_path):
    """VERDICT r1 'Done' gate: a 50 %-duplicate corpus runs through the
    distributed verify (no driver collect, no broadcast text dict) and the
    output equals exact-Jaccard-verified LSH candidates: every emitted pair
    is a true >=0.5-Jaccard pair, and recall vs the exact pair set is high."""
    from dedoc_ray.ops.dedup import minhash_lsh_pairs

    rng = np.random.RandomState(7)
    base_texts = [
        " ".join(f"tok{rng.randint(0, 400)}" for _ in range(60)) for _ in range(60)
    ]
    # 50% duplicates: every base doc gets an exact copy
    texts = base_texts + base_texts
    ids = list(range(len(texts)))
    d = str(tmp_path / "dup_heavy")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict({"doc_id": pa.array(ids, "int64"), "text": pa.array(texts, "string")}),
        f"{d}/documents.parquet",
    )

    got = minhash_lsh_pairs(d, threshold=0.5).to_pandas()
    got_pairs = set(zip(got["doc_a"].astype(int), got["doc_b"].astype(int)))
    exact = _exact_jaccard_pairs(texts, 0.5)

    # precision is exact by construction (the verify stage recomputes true jaccard)
    assert got_pairs <= exact, f"false positives: {got_pairs - exact}"
    # with 128 perms / band 4, recall on jaccard=1.0 duplicates is ~certain
    dup_pairs = {(i, i + 60) for i in range(60)}
    assert dup_pairs <= got_pairs, f"missed exact duplicates: {dup_pairs - got_pairs}"
    assert len(got_pairs) >= 0.9 * len(exact)


def test_delta_dedup_anti_join(ray_session, tmp_path):
    """Odd doc_ids (the delta) are admitted only when their normalized-text
    fingerprint is absent from the even-id base corpus, first-id-wins
    within the delta."""
    from dedoc_ray.ops.dedup import delta_dedup

    texts = {
        0: "alpha beta",      # base
        2: "gamma delta",     # base
        1: "alpha  beta",     # delta, normalizes == doc 0 -> rejected
        3: "epsilon zeta",    # delta, fresh -> admitted
        5: "epsilon   zeta",  # delta, dup of 3 after normalize -> 3 wins
        7: "unique seven",    # delta, fresh -> admitted
    }
    d = str(tmp_path / "delta")
    os.makedirs(d, exist_ok=True)
    ids = sorted(texts)
    pq.write_table(
        pa.Table.from_pydict(
            {"doc_id": pa.array(ids, "int64"), "text": pa.array([texts[i] for i in ids], "string")}
        ),
        f"{d}/documents.parquet",
    )
    got = delta_dedup(d).to_pandas()
    assert sorted(got["doc_id"].astype(int)) == [3, 7]
