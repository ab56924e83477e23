"""Structured Streaming surfaces: continuous crawl + lineage monitor."""

from __future__ import annotations

from auto_ria_spark.config import CrawlConfig
from auto_ria_spark.plans.crawl import CrawlEngine
from auto_ria_spark.sources import worldgen
from auto_ria_spark.streaming.continuous import (
    continuous_crawl,
    run_metrics_monitor,
)
from oracle import crawl_oracle

CFG = CrawlConfig(host_budget=50, phone_budget=50, backoff_base_s=1,
                  wave_seconds=5, num_shards=4, shuffle_partitions=8)


def test_continuous_crawl_matches_batch_oracle(spark, tmp_path):
    world = worldgen.build_world_local(1, 40, 20)
    pages = spark.createDataFrame(world, schema=worldgen.PAGES_SCHEMA)
    eng = CrawlEngine(spark, str(tmp_path / "wh"), CFG, pages=pages)
    stats = continuous_crawl(spark, eng, worldgen.seed_rows(1))
    assert stats and stats[-1].frontier_left == 0
    oracle = crawl_oracle(world, worldgen.seed_rows(1), CFG)
    got_seen = {r.url_norm for r in eng.seen().collect()}
    assert got_seen == oracle.seen
    assert eng.cars_final().count() == len(oracle.cars)

    # lineage monitor: stream the metrics table, roll up per wave
    rows: list = []
    run_metrics_monitor(spark, eng, rows)
    fetched = {(r.wave) for r in rows if r.metric == "fetched"}
    assert len(fetched) == len(stats)   # every wave reported lineage
    # raw metrics carry genuinely per-partition rows (partition_id >= 0)
    assert eng.metrics().filter("partition_id >= 0").count() > 0
