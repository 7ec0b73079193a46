"""Snapshot-table source (S2 historical scan, reference overpass.py:92-98).

The manifest-pinned layout gives Iceberg time-travel semantics without the
runtime: each snapshot is an immutable full file list, as-of picks the
latest snapshot at or before the timestamp.
"""

import json
import os

import pytest

from osm_addr_bot_spark import sources


@pytest.fixture()
def snap_table(spark, tmp_path):
    loc = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "id int, tag string, version int"
    )
    v2 = spark.createDataFrame(
        [(1, "a", 20), (2, "B", 20), (3, "c", 20)], "id int, tag string, version int"
    )
    sources.write_snapshot(v1, loc, timestamp_ms=1_000)
    sources.write_snapshot(v2, loc, timestamp_ms=2_000)
    return loc


def test_as_of_selects_latest_at_or_before(spark, snap_table):
    # between the two commits -> v1 state
    old = sources.snapshot_as_of(spark, snap_table, 1_500)
    assert sorted(r["tag"] for r in old.collect()) == ["a", "b"]
    # exactly at a commit -> that commit
    at = sources.snapshot_as_of(spark, snap_table, 2_000)
    assert at.count() == 3
    # far future -> latest
    now = sources.snapshot_as_of(spark, snap_table, 10**15)
    assert sorted(r["tag"] for r in now.collect()) == ["B", "a", "c"]


def test_as_of_before_first_snapshot_raises(spark, snap_table):
    with pytest.raises(ValueError, match="no snapshot at or before"):
        sources.snapshot_as_of(spark, snap_table, 999)


def test_old_snapshot_is_immutable_after_new_commits(spark, snap_table):
    # overwrite commit rewrites the table, but the v1 reader still sees v1:
    # new snapshots never touch old data files (reader isolation)
    old = sources.snapshot_as_of(spark, snap_table, 1_000)
    v3 = spark.createDataFrame([(9, "z", 30)], "id int, tag string, version int")
    sources.write_snapshot(v3, snap_table, timestamp_ms=3_000)
    assert sorted(r["tag"] for r in old.collect()) == ["a", "b"]
    assert sources.snapshot_as_of(spark, snap_table, 3_000).count() == 1


def test_append_mode_unions_previous_files(spark, tmp_path):
    loc = str(tmp_path / "tbl_append")
    base = spark.createDataFrame([(1, "a")], "id int, tag string")
    extra = spark.createDataFrame([(2, "b")], "id int, tag string")
    sources.write_snapshot(base, loc, timestamp_ms=1_000)
    entry = sources.write_snapshot(extra, loc, timestamp_ms=2_000, mode="append")
    assert sources.snapshot_as_of(spark, loc, 2_000).count() == 2
    assert sources.snapshot_as_of(spark, loc, 1_000).count() == 1
    # the append snapshot pins the union of file lists
    assert len(entry["files"]) > 1


def test_timestamps_must_increase(spark, snap_table):
    df = spark.range(1)
    with pytest.raises(ValueError, match="must increase"):
        sources.write_snapshot(df, snap_table, timestamp_ms=2_000)


def test_manifest_commit_is_atomic_rename(snap_table):
    # no partial-manifest temp files survive a commit
    leftovers = [f for f in os.listdir(snap_table) if f.startswith("._snapshots-")]
    assert leftovers == []
    log = json.load(open(os.path.join(snap_table, "_snapshots.json")))
    assert [s["snapshot_id"] for s in log] == [1, 2]


def test_snapshots_log(snap_table):
    log = sources.snapshots(snap_table)
    assert [s["timestamp_ms"] for s in log] == [1_000, 2_000]


# --- source_clock watermark over the live snapshot entries (ADVICE r4) ---


def _docs_table(tmp_path):
    return str(tmp_path / "documents.parquet")


def test_source_clock_mixes_data_ts_and_commit_clock_per_entry(spark, tmp_path):
    # snapshot 1 records max_data_ts; the LATER append does not — its
    # commit clock must still advance the watermark (the old max-over-
    # data_maxes ignored the commit clock entirely once any entry had
    # the field, silently freezing the incremental window)
    loc = _docs_table(tmp_path)
    a = spark.createDataFrame([(1, "x")], "id int, t string")
    b = spark.createDataFrame([(2, "y")], "id int, t string")
    sources.write_snapshot(a, loc, timestamp_ms=1_000_000, max_data_ts=1_000)
    sources.write_snapshot(b, loc, timestamp_ms=2_000_000, mode="append")
    assert sources.source_clock(str(tmp_path)) == 2_000  # commit clock of the append


def test_source_clock_ignores_overwritten_entries(spark, tmp_path):
    # an overwrite kills the prior entry's data; its stale (larger)
    # max_data_ts must not leak into the watermark
    loc = _docs_table(tmp_path)
    a = spark.createDataFrame([(1, "x")], "id int, t string")
    b = spark.createDataFrame([(2, "y")], "id int, t string")
    sources.write_snapshot(a, loc, timestamp_ms=1_000_000, max_data_ts=5_000)
    sources.write_snapshot(b, loc, timestamp_ms=2_000_000, max_data_ts=1_500)
    assert sources.source_clock(str(tmp_path)) == 1_500


def test_source_clock_appends_accumulate_max(spark, tmp_path):
    # live appends: watermark is the max across their per-entry values,
    # not just the latest entry's
    loc = _docs_table(tmp_path)
    a = spark.createDataFrame([(1, "x")], "id int, t string")
    b = spark.createDataFrame([(2, "y")], "id int, t string")
    sources.write_snapshot(a, loc, timestamp_ms=1_000_000, max_data_ts=9_000)
    sources.write_snapshot(b, loc, timestamp_ms=2_000_000, mode="append", max_data_ts=1_200)
    assert sources.source_clock(str(tmp_path)) == 9_000
