"""Unit tests for the scalar function layer (SURVEY.md §5.1).

Each test pins an extraction/canonicalization rule to the reference's
exact semantics (file:line cited in the function docstrings).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from auto_ria_spark.functions import extract as X
from auto_ria_spark.functions import urls as U
from oracle import normalize_phone as oracle_phone


def _vals(spark, col, rows, schema="v string"):
    df = spark.createDataFrame(rows, schema=schema)
    return [r[0] for r in df.select(col).collect()]


# ---------------------------------------------------------------- URL layer
def test_canonicalize_url(spark):
    cases = [
        ("  https://Auto.RIA.test/search/?page=2&countpage=100#frag  ",
         "https://auto.ria.test/search/?countpage=100&page=2"),
        ("https://auto.ria.test:443/a", "https://auto.ria.test/a"),
        ("http://h:80/a?z=1&a=2", "http://h/a?a=2&z=1"),
        ("https://h", "https://h/"),
    ]
    got = _vals(spark, U.canonicalize_url(F.col("v")), [(c[0],) for c in cases])
    assert got == [c[1] for c in cases]


def test_next_page_url_matches_reference_semantics(spark):
    # reference: page param parsed (default 0) + 1, re-encoded
    # (app/scraper/parsers/search_page.py:80-118)
    cases = [
        ("https://h/search/?countpage=100&page=0",
         "https://h/search/?countpage=100&page=1"),
        ("https://h/search/?countpage=100&page=41",
         "https://h/search/?countpage=100&page=42"),
        ("https://h/search/?countpage=100",
         "https://h/search/?countpage=100&page=1"),
    ]
    got = _vals(spark, U.next_page_url(F.col("v")), [(c[0],) for c in cases])
    assert got == [c[1] for c in cases]


def test_url_hash_is_stable_and_host_extracted(spark):
    rows = [("https://auto.ria.test/a?x=1",), ("https://auto.ria.test/a?x=1",)]
    h = _vals(spark, U.url_hash64(F.col("v")), rows)
    assert h[0] == h[1] and isinstance(h[0], int)
    assert _vals(spark, U.url_host(F.col("v")), rows)[0] == "auto.ria.test"


def test_car_id_from_url(spark):
    got = _vals(spark, U.car_id_from_url(F.col("v")),
                [("https://h/auto_bmw_x5_123456.html",), ("https://h/other",)])
    assert got == ["123456", ""]


# ------------------------------------------------------------- phone rules
def test_normalize_phone_truth_table(spark):
    # reference truth table: app/scraper/parsers/car_page.py:128-151
    cases = ["(050) 123-45-67", "0501234567", "380501234567",
             "+38 (050) 123 45 67", "call me", "12345"]
    got = _vals(spark, X.normalize_phone(F.col("v")), [(c,) for c in cases])
    expected = [oracle_phone(c) for c in cases]
    assert got == expected
    assert got[0] == "+380501234567"
    assert got[2] == "+380501234567"


# --------------------------------------------------------- field extraction
def test_extract_odometer_tys_km_scaling(spark):
    import json
    rows = [(json.dumps({"odometer_text": "95 тис. км"}),),
            (json.dumps({"odometer_text": "95000 км пробіг"}),),
            (json.dumps({"odometer_text": None}),)]
    got = _vals(spark, X.extract_odometer(F.col("v")), rows)
    assert got == [95000, 95000, None]


def test_extract_price_and_title(spark):
    import json
    rows = [(json.dumps({"price_text": "25 500 $", "title_h1": " BMW X5 "}),),
            (json.dumps({"price_text": "", "title_h3": "Audi A6"}),)]
    assert _vals(spark, X.extract_price_usd(F.col("v")), rows) == [25500, None]
    assert _vals(spark, X.extract_title(F.col("v")), rows) == ["BMW X5", "Audi A6"]


def test_extract_car_number_validity(spark):
    import json
    rows = [(json.dumps({"plate_text": "АВ 1234 СК"}),),
            (json.dumps({"plate_text": "ab1"}),),       # too short
            (json.dumps({"plate_text": "АВГДЕЖЗ"}),),   # no digit
            (json.dumps({"plate_text": None}),)]
    got = _vals(spark, X.extract_car_number(F.col("v")), rows)
    assert got == ["АВ1234СК", None, None, None]


def test_extract_images_count_default(spark):
    import json
    rows = [(json.dumps({"show_all_text": "все 17 фотографий",
                         "image_main": "x.jpg"}),),
            (json.dumps({"show_all_text": None, "image_main": "x.jpg"}),),
            (json.dumps({"show_all_text": None}),)]
    df = spark.createDataFrame(rows, schema="v string")
    img = X.extract_image_url(F.col("v"))
    got = [r[0] for r in df.select(X.extract_images_count(F.col("v"), img)).collect()]
    assert got == [17, 1, 0]


def test_phone_from_json(spark):
    rows = [('{"phones":[{"phoneFormatted":"(050) 1"}]}',),
            ('{"formattedPhoneNumber":"(067) 2"}',),
            ('{}',)]
    got = _vals(spark, X.phone_from_json(F.col("v")), rows)
    assert got == ["(050) 1", "(067) 2", None]


def test_phones_from_json_list_semantics(spark):
    """P17: all phones[].phoneFormatted; fallback only when the list is
    absent/empty; null phones[0] -> NO phone (reference
    car_page.py:266-271 + autoria.py:120-125 list-join contract)."""
    rows = [
        ('{"phones":[{"phoneFormatted":"(050) 1"},'
         '{"phoneFormatted":"380671"}]}',),
        ('{"phones":[{"phoneFormatted":"(050) 1"}]}',),
        ('{"phones":[],"formattedPhoneNumber":"(067) 2"}',),
        ('{"formattedPhoneNumber":"(067) 2"}',),
        ('{"phones":[{"phoneFormatted":null},'
         '{"phoneFormatted":"380671"}]}',),
        ('{}',),
    ]
    got = _vals(spark, X.phones_from_json(F.col("v")), rows)
    assert got == [["(050) 1", "380671"], ["(050) 1"], ["(067) 2"],
                   ["(067) 2"], [], []]


def test_multi_phone_join_in_worldgen_goldens():
    """The deterministic worlds must actually contain multi-phone cars so
    the golden crawl exercises the ', '.join path end-to-end."""
    from auto_ria_spark.config import CrawlConfig
    from auto_ria_spark.oracle import crawl_oracle
    from auto_ria_spark.sources import worldgen

    world = worldgen.build_world_local(1, 300, 100)
    res = crawl_oracle(world, worldgen.seed_rows(1), CrawlConfig())
    multi = [c for c in res.cars if ", " in c["phone_number"]]
    assert len(multi) >= 5
    assert all(p.startswith("+") for c in multi
               for p in c["phone_number"].split(", "))
