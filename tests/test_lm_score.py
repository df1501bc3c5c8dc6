"""Tests: char-trigram LM train + score op."""

from __future__ import annotations

import numpy as np

from dedoc_ray.ops.lm_score import _trigrams, train_trigram_model

SF = "/root/testdata/sf0.001"


def test_trigrams_normalized():
    g = _trigrams("AB  cd")
    assert [x.decode() for x in g] == ["ab ", "b c", " cd"]
    assert len(_trigrams("ab")) == 0


def test_train_counts_match_local(ray_session):
    import pyarrow.parquet as pq

    model = train_trigram_model(SF)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    local: dict = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if doc_id % 10 == 0:
            for g in _trigrams(text):
                k = g.decode()
                local[k] = local.get(k, 0) + 1
    assert model == local
    assert len(model) > 50  # real vocabulary, not a stub


def test_scores_separate_in_domain_from_garbage(ray_session):
    from dedoc_ray.ops.lm_score import lm_score

    df = lm_score(SF).to_pandas().set_index("doc_id")
    # train docs score themselves: every trigram known
    train = df[df.index % 10 == 0]
    assert (train["n_known"] == train["n_trigrams"]).all()
    assert (df["model_hits"] >= df["n_known"]).all()
    assert (df["n_trigrams"] > 0).all()


def test_pack_sequences_budget_and_order(ray_session):
    from dedoc_ray.ops.lm_score import PACK_BUDGET, pack_sequences

    df = pack_sequences(SF).to_pandas()
    assert len(df) == 500
    # within each (source, seq): clamped token sum fits the budget unless
    # the sequence is a single oversized doc
    g = df.copy()
    g["t"] = g["n_tokens"].clip(upper=PACK_BUDGET)
    sums = g.groupby(["source", "seq_id"])["t"].agg(["sum", "count"])
    over = sums[sums["sum"] > PACK_BUDGET]
    assert (over["count"] == 1).all()
    # seq ids are contiguous from 0 per source, docs in id order
    for _, grp in g.sort_values("doc_id").groupby("source"):
        seqs = grp["seq_id"].to_numpy()
        assert seqs[0] == 0
        assert ((seqs[1:] - seqs[:-1]) >= 0).all()
        assert ((seqs[1:] - seqs[:-1]) <= 1).all()
