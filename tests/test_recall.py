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


def test_minhash_lsh_recall(spark, clustered_docs):
    """MinHash-LSH candidate recall vs exact 3-gram Jaccard >= 0.5.
    The S-curve matters: 16 slots as 4 bands x 4 rows has a ~0.23 match
    probability AT the 0.5 threshold (fine for finding >= 0.8-similar
    near-dups, lossy at the margin); 8 bands x 2 rows trades more
    bucket-join traffic for high recall across the whole range — the
    knob a 100-TB run picks by recall target, pinned here by number."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dd.ngram_jaccard_pairs(
            clustered_docs, threshold=0.5, max_df=None
        ).collect()
    }
    assert len(exact) >= 50
    sigs = dd.minhash_signatures(clustered_docs, num_hashes=16)
    recalls = {}
    for bands, rows_per_band in ((4, 4), (8, 2)):
        cands = {
            (r["doc_a"], r["doc_b"])
            for r in dd.lsh_candidate_pairs(
                sigs, bands=bands, rows_per_band=rows_per_band
            ).collect()
        }
        recalls[bands] = len(cands & exact) / len(exact)
    print(
        f"\nminhash-LSH recall vs exact J>=0.5: 4x4 bands {recalls[4]:.3f}, "
        f"8x2 bands {recalls[8]:.3f} over {len(exact)} true pairs"
    )
    assert recalls[8] >= 0.9
    assert recalls[8] >= recalls[4]


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


def test_ivf_topk_recall(spark, clustered_embeddings):
    """IVF cell-probe recall vs brute force. Probing all cells must
    reproduce brute force exactly (degeneracy check); at the default
    4-of-32 probe, every near neighbor (cosine >= 0.9, the query's
    cluster) must be found — the far tail of top-k is scattered across
    unprobed cells by design."""
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in clustered_embeddings.collect()}
    qid = 0
    query = [float(x) for x in rows[qid] + 0.01]
    k = 10

    brute = [
        (r["vec_id"], r["cosine"])
        for r in sim.brute_force_topk(clustered_embeddings, query, k=k).collect()
    ]
    cents = sim.ivf_centroids(clustered_embeddings, n_centroids=8)
    all_probe = [
        (r["vec_id"], r["cosine"])
        for r in sim.ivf_topk(
            clustered_embeddings, query, k=k, n_centroids=8, n_probe=8, centroids=cents
        ).collect()
    ]
    assert all_probe == brute  # probe-everything == exact

    approx = {
        r["vec_id"]
        for r in sim.ivf_topk(
            clustered_embeddings, query, k=k, n_centroids=32, n_probe=4
        ).collect()
    }
    brute_ids = [v for v, _ in brute]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    near = {v for v in brute_ids if cos(np.array(query), rows[v]) >= 0.9}
    assert near  # the query's cluster is in the brute top-k
    recall_near = len(approx & near) / len(near)
    recall_k = len(approx & set(brute_ids)) / len(brute_ids)
    print(
        f"\nivf_topk 4-of-32 cells: near recall={recall_near:.3f} over {len(near)}, "
        f"recall@{k}={recall_k:.3f}"
    )
    assert recall_near >= 0.9
