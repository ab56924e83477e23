"""Property tests: URL canonicalization vs an independent urllib-based
reference over seeded randomized URLs (SURVEY.md §5.4 tier).

The engine's canonicalizer is pure Spark SQL (functions/urls.py); the
reference below re-implements the same spec with urllib primitives.  200
seeded random URLs (schemes/hosts/ports/paths/params/fragments/whitespace)
must agree exactly, plus idempotence and pagination roundtrip laws.
"""

from __future__ import annotations

import random
from urllib.parse import urlsplit

from pyspark.sql import functions as F

from auto_ria_spark.functions import urls as U


def ref_canonicalize(url: str) -> str:
    """Independent implementation of the spec in functions/urls.py."""
    u = url.strip()
    parts = urlsplit(u)
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if scheme == "http" and netloc.endswith(":80"):
        netloc = netloc[:-3]
    if scheme == "https" and netloc.endswith(":443"):
        netloc = netloc[:-4]
    path = parts.path or "/"
    if not parts.query:
        return f"{scheme}://{netloc}{path}"
    q = "&".join(sorted(parts.query.split("&")))
    return f"{scheme}://{netloc}{path}?{q}"


def gen_urls(n: int, seed: int = 42) -> list[str]:
    r = random.Random(seed)
    hosts = ["auto.ria.test", "Auto.RIA.test", "HOST7.example.COM", "x.y"]
    paths = ["", "/", "/search/", "/auto_bmw_x5_123.html", "/a/b/c"]
    params = ["page=3", "countpage=100", "a=ZZ", "b=1", "q=x", "z="]
    out = []
    for _ in range(n):
        scheme = r.choice(["http", "https", "HTTPS", "Http"])
        host = r.choice(hosts)
        port = r.choice(["", ":80", ":443", ":8080"])
        path = r.choice(paths)
        qs = "&".join(r.sample(params, r.randint(0, 4)))
        frag = r.choice(["", "#frag", "#a/b"])
        pad = r.choice(["", " ", "  "])
        url = f"{pad}{scheme}://{host}{port}{path}"
        if qs:
            url += f"?{qs}"
        url += frag + pad
        out.append(url)
    return out


def test_canonicalize_matches_urllib_reference(spark):
    urls = gen_urls(200)
    df = spark.createDataFrame([(u,) for u in urls], schema="u string")
    got = [r[0] for r in df.select(U.canonicalize_url(F.col("u"))).collect()]
    exp = [ref_canonicalize(u) for u in urls]
    bad = [(u, g, e) for u, g, e in zip(urls, got, exp) if g != e]
    assert not bad, bad[:5]


def test_canonicalize_idempotent(spark):
    urls = [ref_canonicalize(u) for u in gen_urls(200, seed=7)]
    df = spark.createDataFrame([(u,) for u in urls], schema="u string")
    got = [r[0] for r in df.select(U.canonicalize_url(F.col("u"))).collect()]
    assert got == urls


def test_next_page_then_page_number_roundtrip(spark):
    df = spark.createDataFrame(
        [(f"https://h/search/?countpage=100&page={i}",) for i in range(50)],
        schema="u string")
    got = [
        (r[0], r[1]) for r in df.select(
            U.page_number(F.col("u")),
            U.page_number(U.next_page_url(F.col("u")))).collect()
    ]
    assert all(b == a + 1 for a, b in got)
