"""spark-submit entry point for the crawl engine (north rule: the job runs
via ``spark-submit --py-files engine.zip jobs/crawl_job.py ...``).

Sandbox example (synthetic world; prod swaps the page store for real HTTP
inside sources/fetch.py):

    python tools/make_pyfiles.py                 # builds engine.zip
    spark-submit --master 'local[8]' \\
        --py-files dist/engine.zip \\
        jobs/crawl_job.py --warehouse /tmp/crawl_wh \\
        --cars-per-host 2000 --hosts 4 --host-budget 500 \\
        --resume false

Prints one JSON line with run metrics (urls fetched+deduped, waves,
seconds, urls/s) — the bench harness consumes it.
"""

from __future__ import annotations

import argparse
import json
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--hosts", type=int, default=1)
    ap.add_argument("--cars-per-host", type=int, default=300)
    ap.add_argument("--page-size", type=int, default=100)
    ap.add_argument("--host-budget", type=int, default=5)
    ap.add_argument("--listing-budget", type=int, default=1)
    ap.add_argument("--max-pages", type=int, default=0)
    ap.add_argument("--max-cars", type=int, default=0)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--resume", default="false")
    ap.add_argument("--fresh", default="true")
    ap.add_argument("--payload-format", default="json",
                    choices=["json", "html"],
                    help="html = crawl real rendered pages through the P1 "
                         "selector-cascade extraction stage")
    ap.add_argument("--order-mode", default="crawl",
                    choices=["crawl", "price", "freshness"],
                    help="car-fetch scheduling priority (north-star "
                         "price/freshness generalization)")
    ap.add_argument("--seen-filter", default="bloom",
                    choices=["bloom", "cuckoo"],
                    help="URL-seen filter; cuckoo supports in-place "
                         "deletion for --recrawl")
    ap.add_argument("--fetch-mode", default="pagestore",
                    choices=["pagestore", "http"],
                    help="http = real GETs from a reused per-partition "
                         "client (set --http-endpoint for a gateway)")
    ap.add_argument("--http-endpoint", default="",
                    help="gateway origin for http mode; empty = GET the "
                         "URL directly")
    ap.add_argument("--recrawl", default="",
                    help="comma-separated listing URLs to mark stale "
                         "before the run (freshness re-queue; implies "
                         "--resume true)")
    ap.add_argument("--pipeline-waves", default="true",
                    choices=["true", "false"])
    args = ap.parse_args()

    from auto_ria_spark.config import CrawlConfig
    from auto_ria_spark.plans.crawl import CrawlEngine
    from auto_ria_spark.session import get_spark
    from auto_ria_spark.sources import worldgen

    spark = get_spark("auto-ria-crawl", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    spark.sparkContext.setLogLevel("ERROR")
    cores = int(spark.sparkContext.defaultParallelism)

    if args.recrawl:
        args.resume = "true"  # re-queue operates on the existing warehouse
    if args.fresh == "true" and args.resume != "true":
        shutil.rmtree(args.warehouse, ignore_errors=True)

    cfg = CrawlConfig(
        host_budget=args.host_budget,
        listing_budget=args.listing_budget,
        phone_budget=args.host_budget,
        max_pages=args.max_pages,
        max_cars=args.max_cars,
        backoff_base_s=1,
        wave_seconds=5,
        num_shards=args.num_shards,
        shuffle_partitions=args.shuffle_partitions or max(cores, 8),
        payload_format=args.payload_format,
        order_mode=args.order_mode,
        seen_filter=args.seen_filter,
        fetch_mode=args.fetch_mode,
        http_endpoint=args.http_endpoint,
        pipeline_waves=args.pipeline_waves == "true",
    )
    pages = None
    if args.fetch_mode == "pagestore":
        pages = worldgen.pages_df(
            spark, args.hosts, args.cars_per_host, args.page_size,
            partitions=max(cores, 8), fmt=args.payload_format,
        ).cache()
        pages.count()  # materialize the world before timing the crawl

    eng = CrawlEngine(spark, args.warehouse, cfg, pages=pages)
    if args.recrawl:
        eng.recrawl([u for u in args.recrawl.split(",") if u])
    t0 = time.time()
    if args.resume == "true":
        stats = eng.run(seeds=None)
    else:
        stats = eng.run(seeds=worldgen.seed_rows(args.hosts))
    dt = time.time() - t0

    fetched = sum(s.selected for s in stats)
    discovered = sum(s.discovered for s in stats)
    saved = sum(s.saved for s in stats)
    seen = eng.seen().count()
    print(json.dumps({
        "cores": cores,
        "waves": len(stats),
        "seconds": round(dt, 2),
        "urls_fetched": fetched,
        "urls_discovered_deduped": discovered,
        "urls_seen": seen,
        "cars_saved": saved,
        "urls_per_sec": round(fetched / dt, 2),
        "fetched_deduped_per_sec": round((fetched + discovered) / dt, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
