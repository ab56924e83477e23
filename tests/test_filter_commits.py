"""Touched-shard-only seen-filter commits (the Iceberg dynamic
partition-overwrite analogue): across a multi-wave crawl, a wave's filter
commit must re-serialize ONLY the shards that gained URLs — every
untouched shard's parquet file is carried forward byte-identical (same
immutable path, same bytes), never rewritten.  At the production sizing
(4096 shards x 16-128 MiB bitsets) the old all-shard overwrite was
64-512 GiB of write amplification per wave; this pins the fix.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from auto_ria_spark.config import CrawlConfig
from auto_ria_spark.plans.crawl import CrawlEngine
from auto_ria_spark.sources import worldgen

NUM_SHARDS = 32


def _run(spark, tmp_path, **cfg_kw):
    cfg = CrawlConfig(host_budget=5, phone_budget=5, listing_budget=1,
                      backoff_base_s=1, wave_seconds=5,
                      num_shards=NUM_SHARDS, shuffle_partitions=8, **cfg_kw)
    world = worldgen.build_world_local(1, 40, 10)
    pages = worldgen.pages_local_df(spark, world)
    eng = CrawlEngine(spark, str(tmp_path / "wh"), cfg, pages=pages)
    eng.run(seeds=worldgen.seed_rows(1), max_waves=60)
    return eng


def _assert_shard_file_reuse(eng):
    t = eng.t["seen_filters"]
    snaps = [s for s in t.snapshots() if s.get("file_shards")]
    assert len(snaps) >= 3, "expected a multi-wave filter history"
    first_seen: dict[str, tuple] = {}      # path -> (size, mtime)
    reused_total = 0
    prev = None
    for s in snaps:
        fs = s["file_shards"]
        # every snapshot covers the full shard set exactly once
        assert sorted(fs.values()) == list(range(NUM_SHARDS))
        for p in fs:
            stat = os.stat(p)
            sig = (stat.st_size, stat.st_mtime_ns)
            if p in first_seen:
                # carried-forward file: never rewritten (byte-identical)
                assert first_seen[p] == sig, f"shard file rewritten: {p}"
            else:
                first_seen[p] = sig
        if prev is not None:
            carried = set(prev["file_shards"]) & set(fs)
            reused_total += len(carried)
        prev = s
    # the whole point: at least one wave reused untouched shards' files
    assert reused_total > 0, "no shard files were ever carried forward"
    # and waves did NOT rewrite all shards (write amplification bound):
    # every post-seed commit writes at most the touched shards
    per_commit_new = [
        len(set(s["file_shards"]) - set(p["file_shards"]))
        for p, s in zip(snaps, snaps[1:])]
    assert any(n < NUM_SHARDS for n in per_commit_new), per_commit_new


def test_bloom_filter_commits_touched_shards_only(spark, tmp_path):
    eng = _run(spark, tmp_path)
    _assert_shard_file_reuse(eng)
    # the merged filter state stays correct: one row per shard, and the
    # insert count equals the exact seen set (each URL inserted once)
    flt = eng.t["seen_filters"].read(spark)
    assert flt.count() == NUM_SHARDS
    n_items = flt.agg(F.sum("n_items")).first()[0]
    assert n_items == eng.seen().count()
    # write-amplification evidence lands in the METRICS table: per wave,
    # filter bytes_written covers touched shards only while bytes_reused
    # carries the rest — at least one wave must show real reuse
    m = {(r.wave, r.metric): r.value
         for r in eng.metrics().filter(F.col("kind") == "filter").collect()}
    waves = {w for (w, _) in m}
    assert waves, "filter write metrics missing"
    assert any(m[(w, "bytes_reused")] > 0 for w in waves)
    for w in waves:
        assert m[(w, "files_written")] + m[(w, "files_reused")] \
            == NUM_SHARDS


def test_snapshot_expiry_preserves_carried_shard_files(spark, tmp_path):
    """Sharded commits SHARE files across snapshots (carry-forward);
    expire_snapshots must never delete a file the CURRENT snapshot still
    references, even when the snapshot that originally wrote it is
    expired.  After expiry the filter table must read back whole."""
    eng = _run(spark, tmp_path)
    t = eng.t["seen_filters"]
    before = t.current()["file_shards"]
    removed = t.expire_snapshots(keep_last=2)
    assert removed >= 0
    # every file the current snapshot references still exists on disk
    for p in before:
        assert os.path.exists(p), f"expiry deleted a live shard file: {p}"
    flt = t.read(spark)
    assert flt.count() == NUM_SHARDS
    assert (flt.agg(F.sum("n_items")).first()[0]
            == eng.seen().count())


def test_cuckoo_filter_commits_touched_shards_only(spark, tmp_path):
    eng = _run(spark, tmp_path, seen_filter="cuckoo",
               cuckoo_buckets_per_shard=1 << 10)
    _assert_shard_file_reuse(eng)
    flt = eng.t["seen_filters"].read(spark)
    assert flt.count() == NUM_SHARDS
    n_items = flt.agg(F.sum("n_items")).first()[0]
    assert n_items == eng.seen().count()
