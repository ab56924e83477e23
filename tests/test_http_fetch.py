"""Real-HTTP fetch path: the crawl engine over an actual localhost HTTP
origin (cfg.fetch_mode='http') must produce the identical golden result as
the page-store path — same seen set, same order, same saved rows.

The fixture server holds the deterministic world and reproduces its
transient-failure semantics statefully: a URL's first ``fail_503_times``
requests fail (429 + Retry-After when the world row carries one, else
503), later requests return the payload — so the engine's (attempt,
not_before) re-queue machinery drives real retries over real sockets.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

import pytest
from pyspark.sql import functions as F

from auto_ria_spark.config import CrawlConfig
from auto_ria_spark.plans.crawl import CrawlEngine
from auto_ria_spark.sources import worldgen
from oracle import crawl_oracle

CAR_FIELDS = ["url", "title", "price_usd", "odometer", "username",
              "phone_number", "image_url", "images_count", "car_number",
              "car_vin", "discovery_rank"]


class _WorldServer:
    """Localhost origin serving a synthetic world at /{quote(url)}."""

    def __init__(self, world_rows, drop: dict[str, int] | None = None):
        self.world = {r["url_norm"]: r for r in world_rows}
        self.hits: dict[str, int] = {}
        # transport-failure injection: first N requests to these URLs get
        # the connection closed with NO response (the client sees a TCP
        # reset -> the engine maps it to 599 and must re-queue)
        self.drop = dict(drop or {})
        self.dropped: dict[str, int] = {}
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # noqa: N802 - quiet test server
                pass

            def do_GET(self):  # noqa: N802 - http.server contract
                url = unquote(self.path.lstrip("/"))
                with outer.lock:
                    if outer.drop.get(url, 0) > 0:
                        outer.drop[url] -= 1
                        outer.dropped[url] = outer.dropped.get(url, 0) + 1
                        self.close_connection = True
                        return  # no status line -> RemoteDisconnected
                row = outer.world.get(url)
                if row is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                with outer.lock:
                    outer.hits[url] = outer.hits.get(url, 0) + 1
                    nth = outer.hits[url]
                if nth <= (row["fail_503_times"] or 0):
                    if row.get("retry_after") is not None:
                        self.send_response(429)
                        self.send_header("Retry-After",
                                         str(row["retry_after"]))
                    else:
                        self.send_response(503)
                    self.end_headers()
                    return
                body = row["payload"].encode("utf-8")
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self.thread.start()
        self.endpoint = f"http://127.0.0.1:{self.httpd.server_address[1]}"

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture
def world_server():
    world = worldgen.build_world_local(1, 60, 20)
    srv = _WorldServer(world)
    yield world, srv
    srv.close()


def test_golden_crawl_over_real_http(spark, tmp_path, world_server):
    world, srv = world_server
    cfg = CrawlConfig(host_budget=50, phone_budget=50, backoff_base_s=1,
                      wave_seconds=5, num_shards=4, shuffle_partitions=8,
                      fetch_mode="http", http_endpoint=srv.endpoint,
                      http_workers=4)
    seeds = worldgen.seed_rows(1)
    eng = CrawlEngine(spark, str(tmp_path / "wh"), cfg)
    eng.run(seeds=seeds, max_waves=100)
    oracle = crawl_oracle(world, seeds, cfg)

    got_seen = {r.url_norm for r in eng.seen().select("url_norm").collect()}
    assert got_seen == oracle.seen
    got_order = [
        r.url_norm for r in eng.seen()
        .filter((F.col("kind") == "car")
                & F.col("discovery_rank").isNotNull())
        .orderBy("host", "discovery_rank").collect()]
    assert got_order == oracle.order
    got = {r["url"]: {f: r[f] for f in CAR_FIELDS}
           for r in eng.cars_final().collect()}
    exp = {c["url"]: {f: c[f] for f in CAR_FIELDS} for c in oracle.cars}
    assert got == exp
    # the retry machinery really exercised the failing pages over HTTP
    retried = [u for u, r in ((u, srv.world[u]) for u in srv.hits)
               if (r["fail_503_times"] or 0) > 0]
    assert retried, "world should contain transient-failure pages"
    for u in retried:
        assert srv.hits[u] == (srv.world[u]["fail_503_times"] or 0) + 1


def test_transport_errors_retry_to_golden(spark, tmp_path):
    """A flaky origin that DROPS connections (no HTTP response at all) on
    the first attempts must still converge to the exact golden crawl:
    transport failures map to 599 and re-queue through the same (attempt,
    not_before) machinery as 429/503 — the reference retries ANY
    exception on a car page (app/scraper/autoria.py:72-73,184-191)."""
    world = worldgen.build_world_local(1, 60, 20)
    flaky = {
        worldgen.listing_url(0, 0): 2,                           # seed page
        worldgen.car_page_row(0, 60, 3)["url_norm"]: 2,          # car page
        worldgen.car_page_row(0, 60, 7)["url_norm"]: 1,
    }
    srv = _WorldServer(world, drop=dict(flaky))
    try:
        cfg = CrawlConfig(host_budget=50, phone_budget=50, backoff_base_s=1,
                          wave_seconds=5, num_shards=4, shuffle_partitions=8,
                          fetch_mode="http", http_endpoint=srv.endpoint,
                          http_workers=4)
        seeds = worldgen.seed_rows(1)
        eng = CrawlEngine(spark, str(tmp_path / "wh_flaky"), cfg)
        eng.run(seeds=seeds, max_waves=100)
        oracle = crawl_oracle(world, seeds, cfg)
        got_seen = {r.url_norm
                    for r in eng.seen().select("url_norm").collect()}
        assert got_seen == oracle.seen
        got = {r["url"]: {f: r[f] for f in CAR_FIELDS}
               for r in eng.cars_final().collect()}
        exp = {c["url"]: {f: c[f] for f in CAR_FIELDS} for c in oracle.cars}
        assert got == exp
        # every injected drop was really exercised and then recovered
        assert srv.dropped == flaky
        assert all(v == 0 for v in srv.drop.values())
    finally:
        srv.close()


def test_http_fetch_404_and_transport_errors(spark, world_server):
    """URLs missing from the origin 404; a dead endpoint maps to 599."""
    from auto_ria_spark.functions import urls as U
    from auto_ria_spark.sources.fetch import http_fetched_frontier
    from auto_ria_spark.util import local_df

    _, srv = world_server
    sel = local_df(
        spark, [("https://auto.ria.test/nope.html", 0)],
        "url_norm string, url_hash long").withColumn(
            "url_hash", U.url_hash64(F.col("url_norm")))
    row = http_fetched_frontier(
        sel, endpoint=srv.endpoint).select("status_code").first()
    assert row.status_code == 404
    dead = http_fetched_frontier(
        sel, endpoint="http://127.0.0.1:9", timeout_s=2.0
    ).select("status_code").first()
    assert dead.status_code == 599
