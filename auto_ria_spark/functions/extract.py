"""Field-extraction column functions (the reference's parser layer, P2-P18).

The reference parses live HTML with BeautifulSoup selector cascades
(reference: app/scraper/parsers/car_page.py:56-201). In the graft's
deterministic world the page payload is structured JSON (FIXTURES.md §2),
so every extraction collapses to native Spark SQL expressions over
`get_json_object` — JVM-side, codegen, no Python in the hot path. The
*semantics* (coalesce cascades, digit-stripping, 'тис. км' scaling, plate
validity, phone normalization, defaults) are preserved rule-for-rule.

A real-HTML deployment swaps `payload_field` for an lxml-based
`mapInPandas` stage with the same output schema; the rest of the pipeline
is unchanged (that is the point of extracting to typed columns early).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def payload_field(payload: Column, key: str) -> Column:
    return F.get_json_object(payload, f"$.{key}")


def digits_only(col: Column) -> Column:
    """re.sub(r"[^\\d]", "") analogue; '' -> null (so casts yield null)."""
    return F.nullif(F.regexp_replace(col, r"[^0-9]", ""), F.lit(""))


def extract_title(payload: Column) -> Column:
    """P2 — selector cascade h1.head, h3.auto-content_title -> coalesce.

    reference: app/scraper/parsers/car_page.py:56-59
    """
    return F.trim(
        F.coalesce(payload_field(payload, "title_h1"), payload_field(payload, "title_h3"))
    )


def extract_price_usd(payload: Column) -> Column:
    """P3 — strip non-digits from the price text, cast int; empty -> null.

    reference: app/scraper/parsers/car_page.py:61-67
    """
    return digits_only(payload_field(payload, "price_text")).cast("int")


def extract_odometer(payload: Column) -> Column:
    """P4 — 'тис. км' means thousands; digits*1000 else digits; null if none.

    reference: app/scraper/parsers/car_page.py:69-80
    """
    txt = payload_field(payload, "odometer_text")
    d = digits_only(txt).cast("int")
    return F.when(txt.contains("тис. км"), d * 1000).otherwise(d)


_USERNAME_KEYS = [
    # ordered as the reference's 8-way selector cascade,
    # reference: app/scraper/parsers/car_page.py:82-126
    "seller_pro",
    "seller_info_a",
    "seller_user_h4",
    "seller_info_any",
    "seller_grey_bold",
    "seller_bold",
    "seller_h4_a",
]


def extract_username(payload: Column) -> Column:
    """P5 — ordered coalesce over the seller-name cascade."""
    return F.trim(F.coalesce(*[payload_field(payload, k) for k in _USERNAME_KEYS]))


def normalize_phone(phone_text: Column) -> Column:
    """P6 — digits-only; 0…(len>=10) -> +380+rest; 380…(len>=12) -> +digits;
    else +digits.  reference: app/scraper/parsers/car_page.py:128-151
    """
    d = F.regexp_replace(F.coalesce(phone_text, F.lit("")), r"[^0-9]", "")
    return (
        F.when(d.startswith("0") & (F.length(d) >= 10), F.concat(F.lit("+380"), F.substring(d, 2, 1000)))
        .when(d.startswith("380") & (F.length(d) >= 12), F.concat(F.lit("+"), d))
        .otherwise(F.concat(F.lit("+"), d))
    )


def extract_image_url(payload: Column) -> Column:
    """P7 — main photo src with fallback.
    reference: app/scraper/parsers/car_page.py:153-165
    """
    return F.coalesce(
        payload_field(payload, "image_main"), payload_field(payload, "image_any")
    )


def extract_images_count(payload: Column, image_url: Column) -> Column:
    """P8 — regex 'все N фот' counter; default 1 when a photo exists.
    reference: app/scraper/parsers/car_page.py:167-177
    """
    counter = F.regexp_extract(
        F.coalesce(payload_field(payload, "show_all_text"), F.lit("")),
        r"все\s+(\d+)\s+фот",
        1,
    )
    counted = F.nullif(counter, F.lit("")).cast("int")
    return F.coalesce(
        counted, F.when(image_url.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    )


def extract_car_number(payload: Column) -> Column:
    """P9 — strip spaces, uppercase; valid iff len>=6 AND has letter AND has
    digit, else null.  reference: app/scraper/parsers/car_page.py:179-194
    """
    raw = F.upper(F.regexp_replace(F.coalesce(payload_field(payload, "plate_text"), F.lit("")), r"\s+", ""))
    valid = (
        (F.length(raw) >= 6)
        & raw.rlike("[A-ZА-ЯІЇЄ]")
        & raw.rlike("[0-9]")
    )
    return F.when(valid, raw).otherwise(F.lit(None).cast("string"))


def extract_car_vin(payload: Column) -> Column:
    """P10 — vin selector cascade. reference: car_page.py:196-201"""
    return F.trim(
        F.coalesce(
            payload_field(payload, "vin_label"),
            payload_field(payload, "vin_code"),
            payload_field(payload, "vin_checked"),
        )
    )


def is_deleted_listing(payload: Column) -> Column:
    """P11/F3 — deleted-notice predicate.
    reference: app/scraper/parsers/car_page.py:203-223
    """
    return F.coalesce(payload_field(payload, "deleted").cast("boolean"), F.lit(False))


def phone_url(payload: Column, url: Column, base: Column | None = None) -> Column:
    """P14+P15 — build the phone-XHR URL from car_id + hash/expires attrs.
    reference: app/scraper/parsers/car_page.py:231-257
    """
    from auto_ria_spark.functions.urls import car_id_from_url, url_host

    car_id = car_id_from_url(url)
    h = payload_field(payload, "data_hash")
    e = payload_field(payload, "data_expires")
    host = url_host(url)
    return F.when(
        h.isNotNull() & e.isNotNull() & (car_id != ""),
        F.concat(
            F.lit("https://"), host, F.lit("/users/phones/"), car_id,
            F.lit("?expires="), e, F.lit("&hash="), h,
        ),
    ).otherwise(F.lit(None).cast("string"))


def phone_from_json(body: Column) -> Column:
    """P16 — phones[0].phoneFormatted else formattedPhoneNumber.
    reference: app/scraper/parsers/car_page.py:266-271
    """
    return F.coalesce(
        F.get_json_object(body, "$.phones[0].phoneFormatted"),
        F.get_json_object(body, "$.formattedPhoneNumber"),
    )


def phones_from_json(body: Column) -> Column:
    """P16 generalized to the list contract (P17): ALL
    ``phones[].phoneFormatted`` values, as an array (normalized + joined
    with ', ' downstream).

    INTENTIONAL beyond-reference generalization (documented in
    COVERAGE.md "Engine generalizations"): the reference PARSER only ever
    reads ``phones[0].phoneFormatted`` (app/scraper/parsers/
    car_page.py:266-271) even though its SAVE path joins a phone list
    (app/scraper/autoria.py:120-125) — so a multi-phone XHR stores one
    phone there.  This engine keeps every phone.  On 1-phone responses
    (the reference's test surface) the two are identical, and the
    reference's edge semantics are kept exactly: the
    ``formattedPhoneNumber`` fallback applies only when the phones list
    is absent/empty, and a present-but-null ``phones[0].phoneFormatted``
    yields NO phone (F4 drop).  The pure-Python oracle (tests/oracle.py)
    implements the same all-phones contract.
    """
    phones = F.from_json(
        F.get_json_object(body, "$.phones"),
        "array<struct<phoneFormatted:string>>")
    arr = F.filter(
        F.transform(phones, lambda p: p["phoneFormatted"]),
        lambda x: x.isNotNull())
    fallback = F.filter(
        F.array(F.get_json_object(body, "$.formattedPhoneNumber")),
        lambda x: x.isNotNull())
    return (
        F.when(phones.isNull() | (F.size(phones) == 0), fallback)
        .when(phones[0]["phoneFormatted"].isNull(),
              F.array().cast("array<string>"))
        .otherwise(arr)
    )


def join_phones(phones: Column) -> Column:
    """P17 — ', '.join(phone_numbers). reference: app/scraper/autoria.py:120-125"""
    return F.array_join(phones, ", ")


def listing_links(payload: Column) -> Column:
    """P12 — DOM-ordered hrefs array (order is load-bearing: pos_on_page).
    reference: app/scraper/parsers/search_page.py:52-78
    """
    return F.from_json(payload_field(payload, "links"), "array<string>")


def listing_link_prices(payload: Column) -> Column:
    """Optional per-link price metadata (same order as `links`) — feeds the
    priority_price frontier column (north-star price-priority scheduling).
    Null when the listing carries no metadata."""
    return F.from_json(payload_field(payload, "link_prices"), "array<int>")


def listing_link_fresh(payload: Column) -> Column:
    """Optional per-link freshness epoch (same order as `links`) — feeds
    priority_freshness.  Null when absent."""
    return F.from_json(payload_field(payload, "link_fresh"), "array<long>")
