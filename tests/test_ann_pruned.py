"""Stored-bucket ANN scale path (VERDICT r3 #1): the bucket/cell is a
PARTITION column of a written table and queries read only the probed
partitions. These tests pin the one 100-TB-critical behavior that used
to exist only in docstrings: the scan actually skips files.

Reference analog: overpass.py:143-151 prunes the search space remotely
on the Overpass server; this engine prunes it in storage layout.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import osm_addr_bot_spark.datapipe.similarity as sim

DIM = 16
QUERY = [((i * 37) % 13 - 6) / 7.0 for i in range(DIM)]


@pytest.fixture(scope="module")
def embeddings(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        v = rng.normal(size=DIM)
        rows.append((i, f"label_{i % 4}", [float(x) for x in v]))
    # plant a few near-neighbors of the query so top-k is meaningful
    for j in range(8):
        v = [q + rng.normal(scale=0.05) for q in QUERY]
        rows.append((1000 + j, "label_q", [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")


@pytest.fixture(scope="module")
def planes():
    return sim.deterministic_planes(3, DIM)  # 8 buckets


@pytest.fixture(scope="module")
def bucketed_loc(spark, embeddings, planes, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("ann") / "bucketed")
    sim.write_bucketed(embeddings, loc, planes)
    return loc


def _scanned_buckets(df) -> set[int]:
    files = {r[0] for r in df.select(F.input_file_name()).distinct().collect()}
    out = set()
    for f in files:
        part = [seg for seg in f.split("/") if seg.startswith("_bucket=")]
        assert part, f"non-partitioned file in scan: {f}"
        out.add(int(part[0].split("=")[1]))
    return out


def test_pruned_scan_skips_partitions(spark, bucketed_loc, planes):
    """The demonstration the r3 verdict asked for: selected partitions <
    total partitions, PartitionFilters in the scan node."""
    on_disk = {
        int(d.split("=")[1])
        for d in os.listdir(bucketed_loc)
        if d.startswith("_bucket=")
    }
    assert len(on_disk) >= 4  # the world actually spreads over buckets

    out = sim.lsh_topk_pruned(spark, bucketed_loc, QUERY, planes, k=5, n_probe=2)
    probe = set(sim.lsh_probe_buckets(QUERY, planes, 2))

    # 1) the physical plan carries the partition predicate
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_bucket" in plan

    # 2) the scan READ only the probed partition directories
    scan = spark.read.parquet(bucketed_loc).filter(F.col("_bucket").isin(list(probe)))
    touched = _scanned_buckets(scan)
    assert touched <= probe
    assert len(touched) < len(on_disk)


def test_probe_buckets_ordering(planes):
    """Multi-probe order: base bucket first (cost 0), then cheapest
    single flips; probing everything enumerates all 2^p buckets."""
    buckets = sim.lsh_probe_buckets(QUERY, planes, 8)
    assert len(buckets) == 8 and len(set(buckets)) == 8
    margins = [sum(a * b for a, b in zip(QUERY, p)) for p in planes]
    base = sum((1 << i) for i, m in enumerate(margins) if m >= 0)
    assert buckets[0] == base
    cheapest_flip = min(range(len(planes)), key=lambda i: abs(margins[i]))
    assert buckets[1] == base ^ (1 << cheapest_flip)


def test_pruned_equals_inline_and_full_probe_is_exact(spark, embeddings, bucketed_loc, planes):
    rounded = lambda df: [  # noqa: E731
        (r["vec_id"], round(r["cosine"], 4)) for r in df.collect()
    ]
    # n_probe=1 == the inline single-bucket lsh_topk at the same planes
    inline = embeddings.withColumn(
        "_b", sim.lsh_bucket_expr(F.col("embedding").cast("array<double>"), planes)
    ).filter(F.col("_b") == sim.lsh_probe_buckets(QUERY, planes, 1)[0])
    want = rounded(sim.brute_force_topk(inline, QUERY, k=5))
    got = rounded(sim.lsh_topk_pruned(spark, bucketed_loc, QUERY, planes, k=5, n_probe=1))
    assert got == want
    # probing ALL buckets degrades to exact brute force
    exact = rounded(sim.brute_force_topk(embeddings, QUERY, k=5))
    all_probe = rounded(
        sim.lsh_topk_pruned(spark, bucketed_loc, QUERY, planes, k=5, n_probe=8)
    )
    assert all_probe == exact


def test_multiprobe_recall_monotone(spark, embeddings, bucketed_loc, planes):
    """Recall vs exact top-10 is non-decreasing in n_probe and reaches
    1.0 at full probe — the knob the docstrings promise."""
    exact = {r["vec_id"] for r in sim.brute_force_topk(embeddings, QUERY, k=10).collect()}
    recalls = []
    for n_probe in (1, 2, 4, 8):
        got = {
            r["vec_id"]
            for r in sim.lsh_topk_pruned(
                spark, bucketed_loc, QUERY, planes, k=10, n_probe=n_probe
            ).collect()
        }
        recalls.append(len(got & exact) / len(exact))
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:]))
    assert recalls[-1] == 1.0
    print(f"\nmulti-probe recall@10 by n_probe (1,2,4,8): {recalls}")


def test_ivf_pruned_equals_inline(spark, embeddings, tmp_path):
    cents = sim.ivf_centroids(embeddings, n_centroids=8)
    loc = str(tmp_path / "celled")
    sim.write_celled(embeddings, loc, cents)
    rounded = lambda df: [  # noqa: E731
        (r["vec_id"], round(r["cosine"], 4)) for r in df.collect()
    ]
    inline = rounded(
        sim.ivf_topk(embeddings, QUERY, k=5, n_probe=3, centroids=cents)
    )
    pruned_df = sim.ivf_topk_pruned(spark, loc, QUERY, cents, k=5, n_probe=3)
    assert rounded(pruned_df) == inline
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_cell" in plan
