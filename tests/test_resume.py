"""Checkpoint/resume: kill after wave k, restart, final state identical.

The north rule requires crawls resumable from snapshot checkpoints with
per-partition lineage.  This runs the same world twice — once straight
through, once stopped mid-crawl and resumed by a FRESH engine object
(simulating a new driver) — and asserts identical cars + seen sets.  It
also simulates a torn commit (one table a wave ahead) and checks rollback.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from auto_ria_spark.config import CrawlConfig
from auto_ria_spark.plans.crawl import CrawlEngine
from auto_ria_spark.sources import worldgen


CFG = CrawlConfig(host_budget=10, phone_budget=10, backoff_base_s=1,
                  wave_seconds=5, num_shards=4, shuffle_partitions=8)


def _world(spark, cars=40, page=20):
    world = worldgen.build_world_local(1, cars, page)
    pages = spark.createDataFrame(world, schema=worldgen.PAGES_SCHEMA)
    return pages, worldgen.seed_rows(1)


def _state(eng):
    cars = sorted(
        tuple(r) for r in eng.cars_final()
        .select("url", "title", "price_usd", "phone_number", "car_vin",
                "discovery_rank").collect())
    seen = sorted(r.url_norm for r in eng.seen().collect())
    return cars, seen


def test_resume_equals_uninterrupted(spark, tmp_path):
    pages, seeds = _world(spark)

    ref = CrawlEngine(spark, str(tmp_path / "ref"), CFG, pages=pages)
    ref.run(seeds=seeds, max_waves=100)

    eng1 = CrawlEngine(spark, str(tmp_path / "chk"), CFG, pages=pages)
    eng1.run(seeds=seeds, stop_after_wave=2)      # "crash" after wave 2
    assert eng1.last_complete_wave() == 2

    # fresh engine = new driver process; resume from snapshots only
    eng2 = CrawlEngine(spark, str(tmp_path / "chk"), CFG, pages=pages)
    eng2.run(seeds=None, max_waves=100)

    assert _state(eng2) == _state(ref)


@pytest.mark.soak
def test_resume_rolls_back_torn_commit(spark, tmp_path):
    pages, seeds = _world(spark)
    eng1 = CrawlEngine(spark, str(tmp_path / "torn"), CFG, pages=pages)
    eng1.run(seeds=seeds, stop_after_wave=1)

    # tear: frontier advances to a bogus wave 2 while others stay at 1
    bogus = eng1.t["frontier"].read(spark).limit(0)
    eng1.t["frontier"].write(bogus, mode="overwrite", tag={"wave": 2})
    assert eng1.last_complete_wave() == 1

    eng2 = CrawlEngine(spark, str(tmp_path / "torn"), CFG, pages=pages)
    nxt = eng2.resume()
    assert nxt == 2
    # frontier restored to the consistent wave-1 cut (non-empty mid-crawl)
    assert eng2.t["frontier"].read(spark).count() > 0

    ref = CrawlEngine(spark, str(tmp_path / "ref2"), CFG, pages=pages)
    ref.run(seeds=seeds, max_waves=100)
    eng2.run(seeds=None, max_waves=100)
    assert _state(eng2) == _state(ref)


def _sat_engine(spark, tmp_path, name, **cfg_kw):
    """Saturated (bulk-seeded) engine on a small 2-host world — the
    standing-frontier regime where the delta log actually accumulates."""
    cfg = CrawlConfig(host_budget=4, phone_budget=16, backoff_base_s=1,
                      wave_seconds=5, num_shards=4, shuffle_partitions=8,
                      **cfg_kw)
    world = worldgen.build_world_local(2, 40, 10)
    pages = worldgen.pages_local_df(spark, world)
    eng = CrawlEngine(spark, str(tmp_path / name), cfg, pages=pages)
    seeds = pages.filter(F.col("kind") == "car").select(
        F.col("url_norm").alias("url"))
    eng.start_from_df(seeds, kind="car")
    return eng


def _sat_state(eng):
    cars = sorted(
        tuple(r) for r in eng.cars_final()
        .select("url", "title", "price_usd", "phone_number", "car_vin",
                "discovery_rank").collect())
    seen = sorted(r.url_norm for r in eng.seen().collect())
    return cars, seen


@pytest.mark.soak
def test_resume_from_deep_log(spark, tmp_path, monkeypatch):
    """Kill point MID-LOG: with compaction disabled the frontier log is
    pure appends (one delta per wave); a crash 6 waves deep resumes from
    a log that must resolve through the whole add/tombstone history and
    reproduce the uninterrupted state exactly."""
    never = 1e12  # log can never outgrow factor x live
    ref = _sat_engine(spark, tmp_path, "ref", compact_factor=never)
    ref.run(seeds=None, max_waves=100)

    eng1 = _sat_engine(spark, tmp_path, "deep", compact_factor=never)
    eng1.run(seeds=None, stop_after_wave=6)
    # the kill point really is mid-log: >= 6 delta files, zero compactions
    fr = eng1.t["frontier"]
    assert len(fr.current()["files"]) > 6
    snaps = [s for s in fr.snapshots() if s["tag"].get("wave", -1) >= 0]
    assert all(len(s["files"]) >= len(p["files"])
               for p, s in zip(snaps, snaps[1:])), "a compaction fired"

    # fresh engine = new driver process; resume from the snapshots only
    eng2 = CrawlEngine(spark, str(tmp_path / "deep"),
                       eng1.cfg, pages=eng1.pages)
    eng2.run(seeds=None, max_waves=100)
    assert _sat_state(eng2) == _sat_state(ref)


@pytest.mark.soak
def test_resume_immediately_after_compaction(spark, tmp_path):
    """Kill point POST-COMPACTION: with compact_factor below 1 every
    non-empty wave compacts (the log is rewritten each wave); a crash
    right after a compaction must resume from the compacted base and
    reproduce the uninterrupted state."""
    ref = _sat_engine(spark, tmp_path, "refc", compact_factor=0.1)
    ref.run(seeds=None, max_waves=100)

    eng1 = _sat_engine(spark, tmp_path, "cmp", compact_factor=0.1)
    eng1.run(seeds=None, stop_after_wave=3)

    eng2 = CrawlEngine(spark, str(tmp_path / "cmp"),
                       eng1.cfg, pages=eng1.pages)
    eng2.run(seeds=None, max_waves=100)
    assert _sat_state(eng2) == _sat_state(ref)


@pytest.mark.soak
def test_resume_rolls_back_torn_compaction(spark, tmp_path):
    """Kill point TORN COMPACTION: the frontier commits a compaction
    (full rewrite, log reset) tagged one wave AHEAD of every other table
    — the realistic mid-commit crash of a compaction wave.  resume()
    must roll the frontier back to the pre-compaction LOG snapshot and
    the continued crawl must still match the uninterrupted state."""
    from auto_ria_spark.plans.crawl import FRONTIER_COLS, log_adds

    ref = _sat_engine(spark, tmp_path, "reft")
    ref.run(seeds=None, max_waves=100)

    eng1 = _sat_engine(spark, tmp_path, "torncmp")
    eng1.run(seeds=None, stop_after_wave=2)
    # tear: a wave-3 compaction lands on the frontier alone (overwrite =
    # log reset to the resolved view), every other table stays at wave 2
    resolved = eng1._frontier_read()
    eng1.t["frontier"].write(
        log_adds(resolved, 3, FRONTIER_COLS), "overwrite", {"wave": 3})
    assert eng1.last_complete_wave() == 2

    eng2 = CrawlEngine(spark, str(tmp_path / "torncmp"),
                       eng1.cfg, pages=eng1.pages)
    nxt = eng2.resume()
    assert nxt == 3
    # rollback restored the multi-file LOG version, not the torn rewrite
    assert len(eng2.t["frontier"].current()["files"]) > 1
    eng2.run(seeds=None, max_waves=100)
    assert _sat_state(eng2) == _sat_state(ref)


def test_snapshot_expiry_keeps_current(spark, tmp_path):
    pages, seeds = _world(spark, cars=20, page=10)
    eng = CrawlEngine(spark, str(tmp_path / "exp"), CFG, pages=pages)
    eng.run(seeds=seeds, max_waves=100)
    before = eng.cars_final().count()
    n = eng.t["cars"].expire_snapshots(keep_last=2)
    assert n >= 0
    assert eng.cars_final().count() == before
