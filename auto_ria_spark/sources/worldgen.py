"""Deterministic synthetic world: corpus (image+caption) + page-store.

FIXTURES.md defines the shapes; seed=42 everywhere. The same pure per-row
functions drive BOTH the local dict world (consumed by the pure-Python
oracle in tests/oracle.py) and the distributed `mapInPandas` generators
(bench tier: 200k images / 2k listing pages) — so the oracle and the
engine crawl literally the same bytes.

Edge cases injected at fixed modular positions (FIXTURES.md §2):
  dup links across adjacent pages (i % 11 == 4 on pages > 0)
  deleted listings              (i % 41 == 3)
  missing phone                 (i % 29 == 7)
  extra phone #2 (P17 join)     (i % 23 == 13)
  extra phone #3 (P17 join)     (i % 59 == 37)
  VIN collision with car i-1    (i % 53 == 9)
  odometer plain-km variant     (i % 3 == 1), no odometer (i % 17 == 5)
  phone format junk             (i % 19 == 11)
  invalid plate                 (i % 13 == 2), missing plate (i % 7 == 3)
  listing 503 on first attempt  (page % 23 == 6)
  phone 429 on first attempt    (i % 31 == 8)
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np

from auto_ria_spark.functions import imaging

SEED = 42
PAGE_SIZE = 100  # reference: settings.py:78 countpage=100

_MAKES = ["BMW", "Audi", "Toyota", "Renault", "Skoda", "Volkswagen", "Ford", "Mazda"]
_MODELS = ["X5", "A6", "Camry", "Megane", "Octavia", "Passat", "Focus", "CX-5"]
_SELLERS = ["Олег", "Iryna", "Taras", "Olha", "Dmytro", "Kateryna", "AutoDealerPro", "Сергій"]
_SELLER_KEYS = [
    "seller_pro", "seller_info_a", "seller_user_h4", "seller_info_any",
    "seller_grey_bold", "seller_bold", "seller_h4_a",
]
_W = [64, 96, 128]
_H = [64, 80, 128]
_FMT = ["png", "jpeg"]
_NOISE_SIGMA = 1.5
_JPEG_Q = 95  # keeps the lossy per-row PSNR >= 40 dB invariant satisfiable


def host_name(host_idx: int) -> str:
    return "auto.ria.test" if host_idx == 0 else f"host{host_idx:03d}.ria.test"


def listing_url(host_idx: int, page: int) -> str:
    return f"https://{host_name(host_idx)}/search/?countpage=100&page={page}"


def global_car_index(host_idx: int, cars_per_host: int, i: int) -> int:
    return host_idx * cars_per_host + i


# ---------------------------------------------------------------------------
# corpus rows (image + caption pairs)
# ---------------------------------------------------------------------------
def gen_pixels(g: int) -> np.ndarray:
    w, h = _W[g % 3], _H[(g // 3) % 3]
    r = np.random.default_rng([SEED, g])
    img = np.zeros((h, w, 3), np.uint8)
    for _ in range(6):
        x0, y0 = int(r.integers(0, w // 2)), int(r.integers(0, h // 2))
        x1, y1 = x0 + int(r.integers(8, w // 2)), y0 + int(r.integers(8, h // 2))
        img[y0:y1, x0:x1] = r.integers(0, 256, 3)
    noise = r.normal(0, _NOISE_SIGMA, img.shape)
    return np.clip(img.astype(np.float64) + noise, 0, 255).astype(np.uint8)


def caption_for(g: int) -> str:
    make = _MAKES[g % len(_MAKES)]
    model = _MODELS[(g // 3) % len(_MODELS)]
    year = 2005 + (g * 7) % 20
    odo = 5 + (g * 13) % 290
    return f"{make} {model} {year}, {odo} тис. км"


def corpus_row(g: int) -> dict:
    px = gen_pixels(g)
    fmt = _FMT[g % 2]
    data = imaging.encode_image(px, fmt, _JPEG_Q)
    return {
        "image_id": f"img{g:08d}",
        "bytes": data,
        "w": px.shape[1],
        "h": px.shape[0],
        "fmt": fmt,
        "caption": caption_for(g),
        "phash": imaging.phash64(imaging.decode_image(data)),
    }


CORPUS_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def video_rows(n_videos: int, frames_per_video: int = 6) -> list[tuple]:
    """Deterministic video corpus: FVID containers of PNG-encoded
    gen_pixels frames (video v holds global frames v*fpv .. v*fpv+fpv-1)
    — the binary-column input for the frame-sampling driver gate."""
    from auto_ria_spark.functions import multimodal

    return [
        (f"vid{v:05d}", multimodal.encode_fvid([
            imaging.encode_png(gen_pixels(v * frames_per_video + k))
            for k in range(frames_per_video)]))
        for v in range(n_videos)
    ]


def audio_rows(n_clips: int, sample_rate: int = 8_000) -> list[tuple]:
    """Deterministic PCM16 mono clips: clip *a* is a single sine at
    (200 + 37a) Hz, amplitude 0.2 + 0.05*(a%5), length sr/2 + 100a
    samples — varied duration/level/frequency, bit-reproducible."""
    out = []
    for a in range(n_clips):
        n = sample_rate // 2 + a * 100
        t = np.arange(n, dtype=np.float64) / sample_rate
        x = (0.2 + 0.05 * (a % 5)) * np.sin(2 * np.pi * (200.0 + 37.0 * a) * t)
        pcm = np.round(x * 32767).astype(np.int16)
        out.append((f"aud{a:05d}", pcm.tobytes()))
    return out


def corpus_df(spark, n_images: int, partitions: int = 32):
    """Distributed corpus generation (bench tier: 200k rows)."""
    import pandas as pd

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = [corpus_row(int(g)) for g in pdf["id"]]
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_images, 1, partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


# ---------------------------------------------------------------------------
# car / phone / listing page rows
# ---------------------------------------------------------------------------
def car_fields(host_idx: int, cars_per_host: int, i: int) -> dict:
    """Every deterministic fact about car *i* on host *host_idx*."""
    g = global_car_index(host_idx, cars_per_host, i)
    make = _MAKES[g % len(_MAKES)]
    model = _MODELS[(g // 3) % len(_MODELS)]
    year = 2005 + (g * 7) % 20
    car_id = 1_000_000 + g
    slug = f"{make.lower()}_{model.lower().replace('-', '_')}"
    url = f"https://{host_name(host_idx)}/auto_{slug}_{car_id}.html"
    price = 1500 + (g * 137) % 60000
    odo_k = 5 + (g * 13) % 290

    if g % 17 == 5:
        odometer_text = None
    elif g % 3 == 1:
        odometer_text = f"{odo_k * 1000} км пробіг"  # plain-km variant
    else:
        odometer_text = f"{odo_k} тис. км"

    seller = _SELLERS[g % len(_SELLERS)]
    seller_key = _SELLER_KEYS[g % len(_SELLER_KEYS)]

    if g % 7 == 3:
        plate_text = None
    elif g % 13 == 2:
        plate_text = f"ab{g % 10}"  # fails len>=6 validity rule
    else:
        plate_text = f"АВ {1000 + g % 9000} СК"

    vin_g = g - 1 if (g % 53 == 9 and i > 0) else g  # VIN collision case
    vin = f"WBA{vin_g:014d}"

    phone_variants = [
        f"(0{50 + g % 48}) {100 + g % 900}-{10 + g % 90}-{10 + (g * 3) % 90}",
        f"380{500000000 + g % 400000000}",
        "call me",  # junk -> '+' + digits-only
    ]
    phone_raw = phone_variants[2] if g % 19 == 11 else phone_variants[g % 2]
    # multi-phone listings (P17): the reference's save path joins a phone
    # LIST with ', ' (reference: app/scraper/autoria.py:120-125)
    phone_raws = [phone_raw]
    if g % 23 == 13:
        phone_raws.append(f"380{600000000 + g % 300000000}")
    if g % 59 == 37:
        phone_raws.append(
            f"(067) {200 + g % 700}-{20 + g % 70}-{15 + (g * 7) % 80}")

    return {
        "g": g,
        "url": url,
        "car_id": car_id,
        "title": f"{make} {model} {year}",
        "price": price,
        # listing-snippet freshness epoch (drives priority_freshness)
        "freshness": 1_700_000_000 - (g * 7919) % 1_000_000,
        "price_text": f"{price:,} $".replace(",", " "),
        "odometer_text": odometer_text,
        "odometer": (
            None if g % 17 == 5 else odo_k * 1000
        ),
        "seller": seller,
        "seller_key": seller_key,
        "plate_text": plate_text,
        "vin": vin,
        "image_id": f"img{g:08d}",
        "image_url": f"https://cdn.{host_name(host_idx)}/{g:08d}.jpg",
        "images_count_text": (
            None if g % 5 == 0 else f"все {2 + g % 40} фотографий"
        ),
        "deleted": g % 41 == 3,
        "has_phone": g % 29 != 7,
        "phone_raw": phone_raw,
        "phone_raws": phone_raws,
        "phone_429": g % 31 == 8,
        "data_hash": f"h{g:x}",
        "data_expires": str(1_700_000_000 + g),
    }


def _seller_html(key: str, name: str) -> str:
    """Render the seller into the DOM shape its cascade selector matches
    (reference: parsers/car_page.py:82-126) — one shape per cascade arm."""
    import html as H
    n = H.escape(name)
    return {
        "seller_pro": f'<a class="sellerPro">{n}</a>',
        "seller_info_a": f'<div class="seller_info_name"><a>{n}</a></div>',
        "seller_user_h4": (f'<div class="user-name">'
                           f'<h4 class="seller_info_name">{n}</h4></div>'),
        "seller_info_any": (f'<div class="seller_info">'
                            f'<div class="seller_info_name">{n}</div></div>'),
        "seller_grey_bold": (f'<div class="seller_info_name grey bold">{n}'
                             f'</div>'),
        "seller_bold": f'<div class="seller_info_name bold">{n}</div>',
        "seller_h4_a": (f'<h4 class="seller_info_name"><a>{n}</a></h4>'),
    }[key]


def car_page_html(cf: dict) -> str:
    """Render a car page as real HTML using the reference's exact selector
    shapes (reference: parsers/car_page.py:56-223) — drives the P1
    lxml-style extraction stage.  Same facts as the JSON payload, so the
    pure-Python oracle over the structured world stays the golden truth."""
    import html as H
    g = cf["g"]
    parts = ["<html><body>"]
    if cf["deleted"]:
        parts.append(
            '<div id="autoDeletedTopBlock" class="notice notice--icon'
            ' notice--orange">Объявление удалено и не принимает участия'
            " в поиске</div>")
    if g % 2 == 0:
        parts.append(f'<h1 class="head">{H.escape(cf["title"])}</h1>')
    else:
        parts.append(
            f'<h3 class="auto-content_title">{H.escape(cf["title"])}</h3>')
    parts.append(f'<div class="price_value"><strong>{cf["price_text"]}'
                 "</strong></div>")
    if cf["odometer_text"] is not None:
        klass = "size18 thin" if g % 2 == 0 else "size18"
        parts.append(f'<div class="base-information"><span class="{klass}">'
                     f'{cf["odometer_text"]}</span></div>')
    parts.append(_seller_html(cf["seller_key"], cf["seller"]))
    # main photo; g % 5 == 2 drops the outline/m-auto classes to exercise
    # the any-img fallback (car_page.py:153-165)
    img_cls = 'class="plain"' if g % 5 == 2 else 'class="outline m-auto"'
    parts.append(
        f'<div class="photo-620x465"><img {img_cls} src="{cf["image_url"]}"'
        f' data-image-id="{cf["image_id"]}"></div>')
    if cf["images_count_text"] is not None:
        parts.append(f'<a class="show-all">{cf["images_count_text"]}</a>')
    if cf["plate_text"] is not None:
        # nested popup span exercises the DIRECT-text rule (:179-194)
        parts.append(f'<span class="state-num">{H.escape(cf["plate_text"])}'
                     '<span class="popup">подробнее</span></span>')
    # VIN cascade variants (:196-201)
    if g % 3 == 0:
        parts.append(f'<span class="label-vin">{cf["vin"]}</span>')
    elif g % 3 == 1:
        parts.append(f'<span class="vin-code">{cf["vin"]}</span>')
    else:
        parts.append(
            '<span class="vin-checked">✓</span><span class="data-check">'
            f'<span class="vin">{cf["vin"]}</span></span>')
    if cf["has_phone"]:
        if g % 7 == 1:
            parts.append(f'<div data-hash="{cf["data_hash"]}"'
                         f' data-expires="{cf["data_expires"]}"></div>')
        else:
            parts.append(f'<script data-hash="{cf["data_hash"]}"'
                         f' data-expires="{cf["data_expires"]}"></script>')
    parts.append("</body></html>")
    return "".join(parts)


def listing_page_html(cfs: list[dict]) -> str:
    """Listing page HTML: section.ticket-item > a.m-link-ticket[href] in
    DOM order (reference: parsers/search_page.py:52-78), with the graft's
    snippet metadata as data attributes."""
    items = "".join(
        f'<section class="ticket-item"><a class="m-link-ticket"'
        f' href="{c["url"]}" data-price="{c["price"]}"'
        f' data-fresh="{c["freshness"]}">item</a></section>'
        for c in cfs)
    return f"<html><body>{items}</body></html>"


def car_page_row(host_idx: int, cars_per_host: int, i: int,
                 fmt: str = "json") -> dict:
    cf = car_fields(host_idx, cars_per_host, i)
    if fmt == "html":
        return {
            "url_norm": cf["url"],
            "kind": "car",
            "host": host_name(host_idx),
            "payload": car_page_html(cf),
            "fail_503_times": 0,
            "retry_after": None,
        }
    payload = {
        "price_text": cf["price_text"],
        "odometer_text": cf["odometer_text"],
        cf["seller_key"]: cf["seller"],
        "plate_text": cf["plate_text"],
        "vin_label": cf["vin"],
        "image_main": cf["image_url"],
        "image_id": cf["image_id"],
        "show_all_text": cf["images_count_text"],
        "deleted": cf["deleted"],
        "data_hash": cf["data_hash"] if cf["has_phone"] else None,
        "data_expires": cf["data_expires"] if cf["has_phone"] else None,
    }
    # title cascade: alternate between the two selector spellings
    payload["title_h1" if cf["g"] % 2 == 0 else "title_h3"] = cf["title"]
    return {
        "url_norm": cf["url"],
        "kind": "car",
        "host": host_name(host_idx),
        "payload": json.dumps(payload, ensure_ascii=False),
        "fail_503_times": 0,
        "retry_after": None,
    }


def phone_page_row(host_idx: int, cars_per_host: int, i: int) -> dict | None:
    cf = car_fields(host_idx, cars_per_host, i)
    if not cf["has_phone"]:
        return None
    url = (
        f"https://{host_name(host_idx)}/users/phones/{cf['car_id']}"
        f"?expires={cf['data_expires']}&hash={cf['data_hash']}"
    )
    return {
        "url_norm": url,
        "kind": "phone",
        "host": host_name(host_idx),
        "payload": json.dumps(
            {"phones": [{"phoneFormatted": p} for p in cf["phone_raws"]]}),
        "fail_503_times": 1 if cf["phone_429"] else 0,
        "retry_after": 3 if cf["phone_429"] else None,
    }


def listing_slots_for_page(
    host_idx: int, cars_per_host: int, page: int, page_size: int = PAGE_SIZE
) -> list[int]:
    """DOM-ordered car indices on listing page *page*; duplicates from the
    previous page injected at fixed positions (first-occurrence dedup
    exercise, reference: app/scraper/autoria.py:266-271)."""
    start = page * page_size
    slots = []
    for j in range(page_size):
        i = start + j
        if i >= cars_per_host:
            break
        if page > 0 and i % 11 == 4:
            slots.append(start - page_size + j)
        else:
            slots.append(i)
    return slots


def listing_links_for_page(
    host_idx: int, cars_per_host: int, page: int, page_size: int = PAGE_SIZE
) -> list[str]:
    return [car_fields(host_idx, cars_per_host, i)["url"]
            for i in listing_slots_for_page(host_idx, cars_per_host, page,
                                            page_size)]


def listing_page_row(
    host_idx: int, cars_per_host: int, page: int, page_size: int = PAGE_SIZE,
    fmt: str = "json"
) -> dict:
    slots = listing_slots_for_page(host_idx, cars_per_host, page, page_size)
    cfs = [car_fields(host_idx, cars_per_host, i) for i in slots]
    if fmt == "html":
        payload = listing_page_html(cfs)
    else:
        # link_prices / link_fresh: per-link snippet metadata in DOM order —
        # feeds priority_price / priority_freshness (config.order_mode)
        payload = json.dumps({
            "links": json.dumps([c["url"] for c in cfs]),
            "link_prices": json.dumps([c["price"] for c in cfs]),
            "link_fresh": json.dumps([c["freshness"] for c in cfs]),
        })
    return {
        "url_norm": listing_url(host_idx, page),
        "kind": "listing",
        "host": host_name(host_idx),
        "payload": payload,
        "fail_503_times": 1 if (page % 23 == 6) else 0,
        "retry_after": None,
    }


PAGES_SCHEMA = (
    "url_norm string, kind string, host string, payload string,"
    " fail_503_times int, retry_after int"
)


def build_world_local(
    n_hosts: int = 1, cars_per_host: int = 300, page_size: int = PAGE_SIZE,
    fmt: str = "json"
) -> list[dict]:
    """All page rows as plain dicts (oracle + unit-test tier).

    ``fmt="html"`` renders listing/car payloads as real HTML (same facts,
    reference selector shapes) for the P1 extraction stage; phone XHR
    bodies stay JSON in both formats (they are JSON on the real site too).
    """
    rows: list[dict] = []
    for hx in range(n_hosts):
        n_pages = (cars_per_host + page_size - 1) // page_size
        for p in range(n_pages + 1):  # +1: empty final page terminates F6
            rows.append(listing_page_row(hx, cars_per_host, p, page_size,
                                         fmt))
        for i in range(cars_per_host):
            rows.append(car_page_row(hx, cars_per_host, i, fmt))
            pr = phone_page_row(hx, cars_per_host, i)
            if pr:
                rows.append(pr)
    return rows


def pages_df(spark, n_hosts: int, cars_per_host: int, page_size: int = PAGE_SIZE,
             partitions: int = 32, fmt: str = "json"):
    """Distributed page-store generation for the bench tier."""
    import pandas as pd

    n_pages = (cars_per_host + page_size - 1) // page_size + 1
    per_host = n_pages + 2 * cars_per_host  # listing + car + phone slots
    total = n_hosts * per_host

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for t in pdf["id"]:
                t = int(t)
                hx, r = divmod(t, per_host)
                if r < n_pages:
                    rows.append(listing_page_row(hx, cars_per_host, r,
                                                 page_size, fmt))
                else:
                    r -= n_pages
                    i, which = divmod(r, 2)
                    if which == 0:
                        rows.append(car_page_row(hx, cars_per_host, i, fmt))
                    else:
                        pr = phone_page_row(hx, cars_per_host, i)
                        if pr:
                            rows.append(pr)
            yield pd.DataFrame(rows, columns=[
                "url_norm", "kind", "host", "payload", "fail_503_times", "retry_after"
            ]).astype({"fail_503_times": "int32"})

    return spark.range(0, total, 1, partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_local_df(spark, world_rows: list[dict]):
    """Local page store via pandas+Arrow (a JVM LocalRelation).

    A plain ``createDataFrame(list_of_dicts)`` builds a pickled-RDD local
    relation instead — dragging Python workers into EVERY downstream job
    that scans the world (three fetch joins per wave), which dominates
    small-world crawl wall-clock.

    Robust to the caller's session config: the Arrow conf is set at
    runtime (it is runtime-settable and preserves the LocalRelation fast
    path even on a bare ``SparkSession.builder.getOrCreate()`` session),
    and nullable ints are carried as object-dtype ``None`` — the pandas
    ``Int32`` extension dtype degrades to float NaN under the non-Arrow
    fallback, which IntegerType's schema verifier rejects.
    """
    import pandas as pd

    _AK = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(_AK, None)
    spark.conf.set(_AK, "true")
    try:
        pdf = pd.DataFrame(world_rows, columns=[
            "url_norm", "kind", "host", "payload", "fail_503_times",
            "retry_after"])
        pdf["fail_503_times"] = pdf["fail_503_times"].astype("int32")
        ra = pd.to_numeric(pdf["retry_after"], errors="coerce")
        # Python ints (not 3.0 floats): the non-Arrow fallback's
        # IntegerType verifier rejects floats
        pdf["retry_after"] = ra.map(
            lambda v: None if pd.isna(v) else int(v))
        return spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    finally:
        if prev is None:
            spark.conf.unset(_AK)
        else:
            spark.conf.set(_AK, prev)


def seed_rows(n_hosts: int = 1) -> list[dict]:
    """Crawl seeds: listing page 0 per host (mirrors SCRAPER_START_URL,
    reference: app/config/settings.py:76-79)."""
    return [
        {"url": listing_url(hx, 0), "kind": "listing"} for hx in range(n_hosts)
    ]
