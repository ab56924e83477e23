"""Priority-key scheduling (config.order_mode): price/freshness keys reorder
which cars a bounded budget fetches FIRST, while the discovered set, the
discovery ranks and the final saved rows stay identical to the reference's
crawl order (scheduling delays, never drops — the golden invariant)."""

from __future__ import annotations

from pyspark.sql import functions as F

from auto_ria_spark.config import CrawlConfig
from auto_ria_spark.plans.crawl import CrawlEngine
from auto_ria_spark.sources import worldgen
from oracle import crawl_oracle

from test_crawl_golden import assert_match, run_both


def _engine(spark, tmp_path, cfg, cars=40, page=40):
    world = worldgen.build_world_local(1, cars, page)
    pages = worldgen.pages_local_df(spark, world)
    eng = CrawlEngine(spark, str(tmp_path / "whp"), cfg, pages=pages)
    return eng, world


def test_price_mode_fetches_cheapest_first(spark, tmp_path):
    cfg = CrawlConfig(host_budget=5, phone_budget=50, order_mode="price",
                      num_shards=4, shuffle_partitions=8)
    eng, world = _engine(spark, tmp_path, cfg)
    eng.start(worldgen.seed_rows(1))
    eng.run_wave(0)
    prices = {worldgen.car_fields(0, 40, i)["url"]:
              worldgen.car_fields(0, 40, i)["price"] for i in range(40)}
    left = {
        r.url_norm: r.priority_price
        for r in eng._frontier_read()
        .filter(F.col("kind") == "car").collect()
    }
    fetched = set(prices) - set(left)
    assert len(fetched) == 5
    # every fetched car is cheaper than every car left in the frontier
    assert max(prices[u] for u in fetched) <= min(left.values())
    # frontier rows carry the real listing-snippet prices
    assert all(left[u] == prices[u] for u in left)


def test_freshness_mode_fetches_newest_first(spark, tmp_path):
    cfg = CrawlConfig(host_budget=5, phone_budget=50, order_mode="freshness",
                      num_shards=4, shuffle_partitions=8)
    eng, _ = _engine(spark, tmp_path, cfg)
    eng.start(worldgen.seed_rows(1))
    eng.run_wave(0)
    fresh = {worldgen.car_fields(0, 40, i)["url"]:
             worldgen.car_fields(0, 40, i)["freshness"] for i in range(40)}
    left = {r.url_norm for r in eng._frontier_read()
            .filter(F.col("kind") == "car").collect()}
    fetched = set(fresh) - left
    assert len(fetched) == 5
    assert min(fresh[u] for u in fetched) >= max(fresh[u] for u in left)


def test_price_mode_preserves_golden_outcome(spark, tmp_path):
    """Scheduling policy must not change WHAT gets crawled: the full
    price-mode crawl reproduces the reference oracle's seen set, discovery
    order and saved rows exactly (budgets delay, never reorder discovery)."""
    cfg = CrawlConfig(host_budget=7, phone_budget=7, order_mode="price",
                      backoff_base_s=1, wave_seconds=5, num_shards=4,
                      shuffle_partitions=8)
    eng, oracle, _ = run_both(spark, tmp_path, cfg, cars_per_host=60,
                              page_size=20)
    assert_match(eng, oracle)
