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


def test_snapshot_expiry_keeps_current(spark, tmp_path):
    pages, seeds = _world(spark, cars=20, page=10)
    eng = CrawlEngine(spark, str(tmp_path / "exp"), CFG, pages=pages)
    eng.run(seeds=seeds, max_waves=100)
    before = eng.cars_final().count()
    n = eng.t["cars"].expire_snapshots(keep_last=2)
    assert n >= 0
    assert eng.cars_final().count() == before
