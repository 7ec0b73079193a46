"""Approximation-quality (recall) measurements for the approximate
dedup/ANN paths (VERDICT r2 item 5). The operators' outputs are
oracle-checked for exactness of what they compute; these tests measure
what the banded/bucketed CANDIDATE GENERATION misses against the exact
counterpart on a seeded clustered corpus, and pin the defaults to
>= 0.9 recall (printed, so the chosen knobs stay justified).
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_addr_bot_spark.datapipe import dedup as dd
from osm_addr_bot_spark.datapipe import similarity as sim


@pytest.fixture(scope="module")
def clustered_docs(spark):
    """40 base documents of 30 words, ~3 perturbed variants each
    (1-3 word substitutions) — near-dup pairs inside a cluster, far
    pairs across clusters."""
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    rows = []
    doc_id = 0
    for _ in range(40):
        base = [rng.choice(vocab) for _ in range(30)]
        rows.append((doc_id, " ".join(base)))
        doc_id += 1
        for _ in range(3):
            var = list(base)
            for _ in range(rng.randint(1, 3)):
                var[rng.randrange(len(var))] = rng.choice(vocab)
            rows.append((doc_id, " ".join(var)))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_near_pairs_recall(spark, clustered_docs):
    max_hamming = 10
    fps = dd.simhash(clustered_docs)  # 64-bit default
    vals = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    ids = sorted(vals)
    exact = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((vals[a] ^ vals[b]) & ((1 << 64) - 1)).count("1") <= max_hamming
    }
    assert len(exact) >= 50  # the corpus actually contains near-dups

    # complete contract: derived bands = max_hamming+1 -> pigeonhole
    complete = {
        (r["doc_a"], r["doc_b"])
        for r in dd.simhash_near_pairs(fps, max_hamming=max_hamming).collect()
    }
    assert complete == exact  # recall 1.0 by construction

    # approximate paths: bands < max_hamming+1. Measured on this corpus
    # (r3): bands=4 -> recall 0.59 — too lossy, which is why the catalog
    # row and recommended knob is bands=8 (pigeonhole still covers every
    # pair up to 7 diffs; only 8-10-diff pairs spread across all 8 bands
    # can be missed).
    recalls = {}
    for bands in (4, 8):
        approx = {
            (r["doc_a"], r["doc_b"])
            for r in dd.simhash_near_pairs(
                fps, max_hamming=max_hamming, bands=bands
            ).collect()
        }
        assert approx <= exact  # precision 1.0: candidates are re-verified
        recalls[bands] = len(approx & exact) / len(exact)
    print(
        f"\nsimhash max_hamming={max_hamming}: recall bands=4 {recalls[4]:.3f}, "
        f"bands=8 {recalls[8]:.3f} over {len(exact)} true pairs"
    )
    assert recalls[8] >= 0.9
    assert recalls[8] > recalls[4]


@pytest.fixture(scope="module")
def clustered_embeddings(spark):
    """5 labels x 8 clusters x 5 vectors (dim 16): within-cluster
    cosine ~0.999, cross-cluster ~random."""
    rng = np.random.default_rng(11)
    rows = []
    vec_id = 0
    for label in range(5):
        for _ in range(8):
            base = rng.normal(size=16)
            base /= np.linalg.norm(base)
            for _ in range(5):
                v = base + rng.normal(scale=0.02, size=16)
                rows.append((vec_id, [float(x) for x in v], label))
                vec_id += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label long")


def test_embedding_near_dups_recall(spark, clustered_embeddings):
    k = 3
    rows = clustered_embeddings.collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append((r["vec_id"], np.array(r["embedding"])))
    # exact counterpart: top-k per row within label, same pair ordering
    # and rounding/tiebreak as the operator (cosine desc rounded to 4,
    # then vec_b)
    exact = {}
    for _, vecs in by_label.items():
        vecs.sort()
        for i, (va, a) in enumerate(vecs):
            cands = []
            for vb, b in vecs[i + 1 :]:
                c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
                cands.append((round(c, 4), vb))
            cands.sort(key=lambda t: (-t[0], t[1]))
            exact.update({(va, vb): c for c, vb in cands[:k]})
    # recall target applies to the pairs that ARE near-dups (cosine >=
    # 0.9, i.e. same-cluster). Rows near the top of the vec_id order run
    # out of in-cluster candidates and their exact "top-k" fills with
    # ~orthogonal cross-cluster pairs — no near-dup blocking scheme
    # should be judged on finding those (measured: overall recall 0.70,
    # near-pair recall below).
    near = {p for p, c in exact.items() if c >= 0.9}
    assert len(near) >= 100

    approx = {
        (r["vec_a"], r["vec_b"])
        for r in sim.embedding_near_dups(
            clustered_embeddings, k=k, num_planes=3, dim=16
        ).collect()
    }
    recall_near = len(approx & near) / len(near)
    recall_all = len(approx & set(exact)) / len(exact)
    print(
        f"\nembedding_near_dups planes=3 k={k}: near-pair recall={recall_near:.3f} "
        f"over {len(near)} pairs (all-top-k recall={recall_all:.3f})"
    )
    assert recall_near >= 0.9
