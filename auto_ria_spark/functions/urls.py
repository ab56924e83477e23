"""URL column functions — canonicalization, hashing, host, pagination.

Everything here is a pure Column expression (JVM-side, whole-stage
codegen-able). The reference dedups on raw URL string equality
(reference: app/scraper/autoria.py:266-271, app/core/models.py:52); the
engine adds a canonicalization pass so equivalent spellings hash equal,
then keys ALL crawl state on a 64-bit xxhash of the canonical form —
joins/bucketing on a long, never on the string.

Canonicalization rules (deliberately SQL-expressible so the DuckDB oracle
can mirror them exactly):
  1. trim surrounding whitespace
  2. drop the fragment  (#...)
  3. lowercase scheme and host (path/query case preserved)
  4. strip default ports  (http:80, https:443)
  5. sort query parameters lexicographically (stable, byte order)
  6. drop a trailing '?' (empty query)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://host:port  |  path  |  ?query
_SPLIT_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def url_parts(url: Column) -> tuple[Column, Column, Column]:
    u = F.trim(url)
    head = F.regexp_extract(u, _SPLIT_RE, 1)
    path = F.regexp_extract(u, _SPLIT_RE, 2)
    query = F.regexp_extract(u, _SPLIT_RE, 3)
    return head, path, query


def canonicalize_url(url: Column) -> Column:
    head, path, query = url_parts(url)
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(http://[^/?#]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/?#]*):443$", r"$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.when(
        F.coalesce(query, F.lit("")) == "", F.concat(head, path)
    ).otherwise(F.concat(head, path, F.lit("?"), sorted_q))


def url_hash64(url_norm: Column) -> Column:
    """64-bit stable hash — the frontier/seen join & bucketing key."""
    return F.xxhash64(url_norm)


def url_host(url: Column) -> Column:
    return F.lower(F.regexp_extract(F.trim(url), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))


def url_path(url: Column) -> Column:
    _, path, _ = url_parts(url)
    return F.when(path == "", F.lit("/")).otherwise(path)


def next_page_url(url: Column) -> Column:
    """P13 — increment the `page` query parameter (0 if absent).

    Mirrors reference semantics (app/scraper/parsers/search_page.py:80-118):
    parse `page` (default 0 when missing/unparseable), add 1, re-emit. The
    reference re-encodes the whole query via urlencode; our URLs are already
    canonical so an in-place parameter rewrite is equivalent.
    """
    head, path, query = url_parts(url)
    q = F.coalesce(query, F.lit(""))
    cur = F.regexp_extract(q, r"(?:^|&)page=(\d+)(?:&|$)", 1)
    nxt = (
        F.when(cur == "", F.lit(1))
        .otherwise(cur.cast("int") + F.lit(1))
        .cast("string")
    )
    has_page = q.rlike(r"(?:^|&)page=\d+(?:&|$)")
    new_q = F.when(
        has_page,
        F.regexp_replace(q, r"(^|&)page=\d+(&|$)", r"$1page=@NEW@$2"),
    ).otherwise(
        F.when(q == "", F.lit("page=@NEW@")).otherwise(F.concat(q, F.lit("&page=@NEW@")))
    )
    new_q = F.replace(new_q, F.lit("@NEW@"), nxt)
    # keep canonical property: params sorted
    new_q = F.array_join(F.array_sort(F.split(new_q, "&")), "&")
    return F.concat(head, path, F.lit("?"), new_q)


def page_number(url: Column) -> Column:
    """Current `page` parameter as int, 0 when absent (reference default)."""
    _, _, query = url_parts(url)
    cur = F.regexp_extract(F.coalesce(query, F.lit("")), r"(?:^|&)page=(\d+)(?:&|$)", 1)
    return F.when(cur == "", F.lit(0)).otherwise(cur.cast("int"))


def car_id_from_url(url: Column) -> Column:
    """P14 — reference: app/scraper/parsers/car_page.py:231-232."""
    return F.regexp_extract(url, r"/auto_\w+_(\d+)\.html", 1)


def classify_kind(url: Column) -> Column:
    """URL -> kind for synthetic worlds (listing/car/phone)."""
    return (
        F.when(url.rlike(r"/auto_\w+_\d+\.html"), F.lit("car"))
        .when(url.rlike(r"/users/phones/"), F.lit("phone"))
        .when(url.rlike(r"/sitemap"), F.lit("sitemap"))
        .otherwise(F.lit("listing"))
    )


def kind_rank(kind: Column) -> Column:
    """Crawl-order rank: sitemap < listing < car < phone (SURVEY §2.6)."""
    return (
        F.when(kind == "sitemap", F.lit(0))
        .when(kind == "listing", F.lit(1))
        .when(kind == "car", F.lit(2))
        .otherwise(F.lit(3))
    )
