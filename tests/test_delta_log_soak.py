"""Long-haul delta-log soak: ~30 waves on a saturated frontier.

The O(delta) commit tests in test_frontier_commits.py run 3-6 waves; at
the north rule's 10^10-URL frontier the log survives hundreds of waves
between compactions.  This soaks the merge-on-read log across a full
drain — the live set shrinks from N to 0 while the log keeps growing —
and pins the whole-run invariants:

  * the persisted log NEVER exceeds compact_factor × live (+ the
    compaction reset) at any wave — the append-vs-compact decision
    holds under drift of both sides,
  * compaction actually fires mid-run (the log outgrows the shrinking
    live set) and append waves dominate,
  * the resolved view equals the engine's final frontier after the
    whole history,
  * recrawl still resolves correctly on top of the long log (re-add
    after a deep tombstone history).
"""

from __future__ import annotations
import pytest

from pyspark.sql import functions as F

from auto_ria_spark.config import CrawlConfig
from auto_ria_spark.plans.crawl import CrawlEngine
from auto_ria_spark.sources import worldgen

COMPACT_FACTOR = 4.0  # the CrawlConfig default, pinned for the math below


def _state_metrics(eng, kind):
    rows = (eng.metrics().filter(F.col("kind") == kind)
            .groupBy("wave").pivot("metric").agg(F.first("value"))
            .collect())
    return {r["wave"]: r.asDict() for r in rows}


@pytest.mark.soak
def test_delta_log_soak_30_waves(spark, tmp_path):
    cfg = CrawlConfig(host_budget=3, phone_budget=12, backoff_base_s=1,
                      wave_seconds=5, num_shards=4, shuffle_partitions=8,
                      compact_factor=COMPACT_FACTOR)
    world = worldgen.build_world_local(2, 90, 15)  # 180 cars, 2 hosts
    pages = worldgen.pages_local_df(spark, world)
    eng = CrawlEngine(spark, str(tmp_path / "soak"), cfg, pages=pages)
    seeds = pages.filter(F.col("kind") == "car").select(
        F.col("url_norm").alias("url"))
    eng.start_from_df(seeds, kind="car")
    stats = eng.run(seeds=None, max_waves=200)
    assert len(stats) >= 25, f"soak too short: {len(stats)} waves"
    assert stats[-1].frontier_left == 0  # drained

    # reconstruct the persisted log size wave-by-wave from the judged
    # write-volume metrics: appends accumulate, a compaction resets the
    # log to exactly the live set
    m = _state_metrics(eng, "frontier")
    assert m, "no frontier write-volume metrics recorded"
    seed_snap = next(s for s in eng.t["frontier"].snapshots()
                     if s["tag"].get("wave") == -1)
    log = seed_snap["rows"]
    assert log > 0
    compactions = appends = 0
    for w in sorted(m):
        v = m[w]
        if v["compacted"] == 1:
            assert v["rows_written"] == v["rows_live"]
            log = v["rows_written"]
            compactions += 1
        else:
            assert 0 <= v["rows_written"] <= v["rows_delta_bound"]
            log += v["rows_written"]
            appends += 1
            # the whole-run bound: an append wave only happened because
            # log_before + bound <= factor * live, so the log after it
            # stays within factor * live at EVERY point of the soak
            assert log <= COMPACT_FACTOR * max(v["rows_live"], 1), (
                f"wave {w}: log {log} rows > "
                f"{COMPACT_FACTOR} x live {v['rows_live']}")
    assert compactions >= 1, "log never outgrew the shrinking live set"
    assert appends >= 10, f"soak degenerated to compactions ({appends})"

    # merge-on-read parity after the full history: resolution of the
    # final on-disk log equals the drained frontier
    assert eng._frontier_read().count() == 0
    assert eng._pending_read().groupBy("phone_hash").count() \
        .filter(F.col("count") > 1).count() == 0

    # recrawl on top of the long log: deep tombstone history, then a
    # re-add — the stale rows must re-fetch and the state must converge
    # back to the pre-recrawl snapshot (the world is unchanged)
    cars_before = {r["url"]: (r["title"], r["price_usd"], r["phone_number"])
                   for r in eng.cars_final().collect()}
    stale = sorted(cars_before)[:2]
    from auto_ria_spark.util import local_df
    eng.recrawl(local_df(spark, [(u,) for u in stale], "url string"))
    rstats = eng.run(seeds=None, max_waves=20)
    assert sum(s.saved for s in rstats) == 2
    cars_after = {r["url"]: (r["title"], r["price_usd"], r["phone_number"])
                  for r in eng.cars_final().collect()}
    assert cars_after == cars_before
