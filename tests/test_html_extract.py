"""P1 — real-HTML extraction: the selector-cascade stage must extract the
same facts from rendered HTML that the structured-JSON path reads directly,
and the full crawl over an HTML world must still equal the pure-Python
reference oracle (which replays the structured world — same car_fields)."""

from __future__ import annotations

import json

from auto_ria_spark.config import CrawlConfig
from auto_ria_spark.functions import html_extract as HX
from auto_ria_spark.plans.crawl import CrawlEngine
from auto_ria_spark.sources import worldgen
from oracle import crawl_oracle, extract_car

from test_crawl_golden import assert_match


def test_car_payload_matches_json_payload_for_every_variant():
    """For every car in a 120-car world (covers all cascade arms: title
    h1/h3, 7 seller shapes, 3 VIN slots, img fallback, deleted, nested
    plate popup, div hash/expires fallback), extracting from the rendered
    HTML must yield the same typed fields as the structured payload."""
    n = 120
    for i in range(n):
        cf = worldgen.car_fields(0, n, i)
        json_payload = json.loads(
            worldgen.car_page_row(0, n, i)["payload"])
        html_payload = HX.car_payload(worldgen.car_page_html(cf))
        got = extract_car(html_payload, cf["url"])
        exp = extract_car(json_payload, cf["url"])
        assert got == exp, (i, got, exp)
        if not cf["deleted"]:
            assert got is not None and got["image_id"] == cf["image_id"]


def test_text_is_document_ordered():
    """Node.text() must interleave direct chunks with child subtrees in
    document order (BeautifulSoup get_text semantics): real pages wrap
    icons inside seller names / deleted notices."""
    from auto_ria_spark.functions.html_extract import parse_html

    root = parse_html("<div>a<span>b</span>c<i>d</i>e</div>")
    assert root.text() == "abcde"
    nested = parse_html("<p>x<b>y<u>z</u>w</b>v</p>")
    assert nested.text() == "xyzwv"


def test_listing_payload_dom_order_and_metadata():
    n = 50
    row = worldgen.listing_page_row(0, n, 0, 25, fmt="html")
    p = HX.listing_payload(row["payload"])
    links = json.loads(p["links"])
    assert links == worldgen.listing_links_for_page(0, n, 0, 25)
    prices = json.loads(p["link_prices"])
    assert prices == [worldgen.car_fields(0, n, i)["price"]
                      for i in worldgen.listing_slots_for_page(0, n, 0, 25)]


def test_golden_crawl_html_world(spark, tmp_path):
    """End-to-end: crawl the HTML-rendered world through the P1 stage; the
    result must be bit-for-bit the oracle's (which replays the structured
    world — identical facts, different wire format)."""
    cfg = CrawlConfig(host_budget=50, phone_budget=50, backoff_base_s=1,
                      wave_seconds=5, num_shards=4, shuffle_partitions=8,
                      payload_format="html")
    cars, page = 120, 40
    html_world = worldgen.build_world_local(1, cars, page, fmt="html")
    json_world = worldgen.build_world_local(1, cars, page, fmt="json")
    pages = worldgen.pages_local_df(spark, html_world)
    eng = CrawlEngine(spark, str(tmp_path / "whh"), cfg, pages=pages)
    eng.run(seeds=worldgen.seed_rows(1), max_waves=100)
    oracle = crawl_oracle(json_world, worldgen.seed_rows(1), cfg)
    assert_match(eng, oracle)
    assert len(oracle.cars) > 80
