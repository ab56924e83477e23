"""Pure-Python reference oracle — re-implements the REFERENCE loop semantics.

Lives in the package (not tests/) because the driver-facing ``oracle_sql()``
contract uses it too: the crawl world is deterministic, so the expected
``cars`` rows can be emitted as a ``SELECT ... FROM (VALUES ...)`` DuckDB
query — giving the flagship end-to-end crawl the same rows+schema+hash
correctness gate as every SQL-expressible operator (see __spark_entry__).

~150 LoC, no Spark, no network.  Replays the reference's main loop
(reference: app/scraper/autoria.py:193-367) over the deterministic
synthetic world (auto_ria_spark.sources.worldgen.build_world_local):

* listing pages strictly sequential per host (autoria.py:248-344),
* DOM-order link extraction (parsers/search_page.py:52-78),
* F1 within-run first-occurrence dedup (autoria.py:266-271 — the WHOLE
  page's new links enter car_links_total before the counting loop),
* F2 already-in-DB links are counted + remembered but skipped
  (autoria.py:278-289, 313-317),
* F8 car limit: counter increments per new link in discovery order; the
  link that pushes past the limit is counted but NOT processed; pagination
  stops once the counter reaches the limit (autoria.py:298-335),
* F7 page limit (autoria.py:249-253) applied as an enqueue gate,
* F6 empty page terminates pagination (parsers/search_page.py:183-188),
* F3 deleted-listing drop (parsers/car_page.py:203-223,332-336),
* F4 no-phone drop (parsers/car_page.py:355-359),
* J4 VIN dedup, first save wins; saves happen in discovery order here
  (the deterministic refinement of the reference's completion-order race,
  app/utils/db_utils.py:130-141),
* field extraction rules P2-P11/P14-P18 applied to the structured payload
  with the reference's exact semantics.

The engine test asserts bit-for-bit equality of (cars rows, URL-seen set,
discovery order) between this oracle and the Spark wave loop.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from auto_ria_spark.config import CrawlConfig

_SELLER_KEYS = [
    "seller_pro", "seller_info_a", "seller_user_h4", "seller_info_any",
    "seller_grey_bold", "seller_bold", "seller_h4_a",
]


def _digits(s: str | None) -> str:
    return re.sub(r"[^0-9]", "", s or "")


def normalize_phone(raw: str | None) -> str:
    d = _digits(raw)
    if d.startswith("0") and len(d) >= 10:
        return "+380" + d[1:]
    if d.startswith("380") and len(d) >= 12:
        return "+" + d
    return "+" + d


def extract_car(payload: dict, url: str) -> dict | None:
    """P2-P11 over the structured payload; None if deleted (F3)."""
    if payload.get("deleted"):
        return None
    title = payload.get("title_h1") or payload.get("title_h3")
    price_d = _digits(payload.get("price_text"))
    price = int(price_d) if price_d else None
    odo_text = payload.get("odometer_text")
    odo_d = _digits(odo_text)
    if not odo_d:
        odometer = None
    elif odo_text and "тис. км" in odo_text:
        odometer = int(odo_d) * 1000
    else:
        odometer = int(odo_d)
    username = None
    for k in _SELLER_KEYS:
        if payload.get(k):
            username = payload[k].strip()
            break
    image_url = payload.get("image_main") or payload.get("image_any")
    m = re.search(r"все\s+(\d+)\s+фот", payload.get("show_all_text") or "")
    images_count = int(m.group(1)) if m else (1 if image_url else 0)
    plate = re.sub(r"\s+", "", payload.get("plate_text") or "").upper()
    valid = (len(plate) >= 6 and re.search(r"[A-ZА-ЯІЇЄ]", plate)
             and re.search(r"[0-9]", plate))
    car_number = plate if valid else None
    vin = payload.get("vin_label") or payload.get("vin_code") or payload.get("vin_checked")
    cid = re.search(r"/auto_\w+_(\d+)\.html", url)
    h, e = payload.get("data_hash"), payload.get("data_expires")
    host = re.match(r"https://([^/]*)/", url).group(1)
    phone_url = (
        f"https://{host}/users/phones/{cid.group(1)}?expires={e}&hash={h}"
        if (h and e and cid) else None
    )
    return {
        "url": url, "title": title.strip() if title else None,
        "price_usd": price, "odometer": odometer, "username": username,
        "image_url": image_url, "image_id": payload.get("image_id"),
        "images_count": images_count,
        "car_number": car_number, "car_vin": vin.strip() if vin else None,
        "phone_url": phone_url, "host": host,
    }


@dataclass
class OracleResult:
    cars: list[dict] = field(default_factory=list)
    seen: set = field(default_factory=set)
    order: list[str] = field(default_factory=list)   # car discovery order
    skipped_db: int = 0
    processed: int = 0


def crawl_oracle(world_rows: list[dict], seeds: list[dict],
                 cfg: CrawlConfig, db_urls: set[str] | None = None,
                 robots: list[dict] | None = None) -> OracleResult:
    pages = {r["url_norm"]: r for r in world_rows}
    db_urls = db_urls or set()
    res = OracleResult()
    saved_vins: set[str] = set()

    def allowed(url: str) -> bool:
        if not robots:
            return True
        host = re.match(r"https://([^/:?#]*)", url).group(1)
        path = re.sub(r"^https://[^/]*", "", url).split("?")[0] or "/"
        best_len, best = -1, True
        for r in robots:
            if r["host"] == host and path.startswith(r["path_prefix"]):
                if len(r["path_prefix"]) > best_len:
                    best_len, best = len(r["path_prefix"]), r["allowed"]
        return best

    for seed in seeds:
        current_url = seed["url"]
        if not allowed(current_url):
            continue
        res.seen.add(current_url)
        page_count, total, rank = 0, 0, 0
        links_total: set[str] = set()
        hit_limit = False
        while current_url:
            page = pages.get(current_url)
            if page is None:
                break
            links = json.loads(json.loads(page["payload"])["links"])
            new_links = []
            for link in links:
                if link in links_total or not allowed(link):
                    continue
                links_total.add(link)
                new_links.append(link)
                res.seen.add(link)
            for link in new_links:
                total += 1
                rank += 1
                if cfg.max_cars and total > cfg.max_cars:
                    hit_limit = True
                    break
                res.order.append(link)
                if link in db_urls:
                    res.skipped_db += 1
                    continue
                car_page = pages.get(link)
                if car_page is None:
                    continue
                res.processed += 1
                car = extract_car(json.loads(car_page["payload"]), link)
                if car is None:              # F3 deleted
                    continue
                if not car["phone_url"]:     # F4 no phone handle
                    continue
                res.seen.add(car["phone_url"])
                phone_page = pages.get(car["phone_url"])
                if phone_page is None:       # F4: phone fetch failed
                    continue
                body = json.loads(phone_page["payload"])
                # P16/P17: ALL phones[].phoneFormatted, normalized and
                # ', '-joined (reference save path autoria.py:120-125);
                # formattedPhoneNumber fallback only when the list is
                # absent/empty, and a null phones[0].phoneFormatted means
                # NO phone (F4) — both per car_page.py:266-271
                phones = body.get("phones")
                if phones:
                    if not phones[0].get("phoneFormatted"):
                        raws = []
                    else:
                        raws = [p["phoneFormatted"] for p in phones
                                if p.get("phoneFormatted")]
                elif body.get("formattedPhoneNumber"):
                    raws = [body["formattedPhoneNumber"]]
                else:
                    raws = []
                if not raws:
                    continue
                car["phone_number"] = ", ".join(
                    normalize_phone(r) for r in raws)
                if car["car_vin"] and car["car_vin"] in saved_vins:
                    continue                 # J4 VIN dup rejected
                if car["car_vin"]:
                    saved_vins.add(car["car_vin"])
                car["discovery_rank"] = rank
                car["datetime_found"] = cfg.wave_ts_base
                del car["phone_url"]
                res.cars.append(car)
            if hit_limit or (cfg.max_cars and total >= cfg.max_cars):
                break
            if not links:                    # F6 empty page
                break
            if cfg.max_pages and page_count + 1 >= cfg.max_pages:
                break                        # F7 (enqueue gate)
            m = re.search(r"(?:^|[?&])page=(\d+)", current_url)
            cur_page = int(m.group(1)) if m else 0
            next_url = re.sub(r"([?&])page=\d+", rf"\g<1>page={cur_page + 1}",
                              current_url)
            if not allowed(next_url):        # robots gates pagination too
                break
            current_url = next_url
            res.seen.add(current_url)
            page_count += 1
    return res


# ---------------------------------------------------------------------------
# driver-oracle emission: expected rows as DuckDB `SELECT ... FROM (VALUES …)`
# ---------------------------------------------------------------------------
def corpus_verify_expected(n_images: int,
                           psnr_lossy_db: float = 40.0) -> list[dict]:
    """Pure-Python replay of functions.corpus.verify_corpus over the first
    ``n_images`` deterministic corpus rows (same codec, same checks) —
    the expected verdict rows for the ``corpus_verify`` driver query."""
    import numpy as np

    from auto_ria_spark.functions import imaging
    from auto_ria_spark.sources import worldgen

    out = []
    for g in range(n_images):
        row = worldgen.corpus_row(g)
        ref_px = worldgen.gen_pixels(g)
        got_px = imaging.decode_image(row["bytes"])
        p = imaging.psnr(ref_px, got_px)
        if row["fmt"] == "png":
            pixel_ok = bool(np.array_equal(ref_px, got_px))
        else:
            pixel_ok = bool(p >= psnr_lossy_db)
        out.append({
            "image_id": row["image_id"],
            "fmt": row["fmt"],
            "psnr": float(min(p, 1e9)),
            "pixel_ok": pixel_ok,
            "caption_ok": row["caption"] == worldgen.caption_for(g),
            "phash_ok": imaging.hamming64(
                row["phash"], imaging.phash64(got_px)) == 0,
            "w_ok": got_px.shape[1] == row["w"],
            "h_ok": got_px.shape[0] == row["h"],
        })
    return out


def resize_reference(px, out_w: int, out_h: int):
    """Independent per-pixel box-filter reference for the image_resize
    driver gate: the naive double loop (mean of each output cell's pixel
    block, rounded) — deliberately NOT the engine's reduceat kernel, so
    the two implementations check each other."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(int)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(int)
    out = np.empty((out_h, out_w, px.shape[2]), np.uint8)
    acc = px.astype(np.float64)
    for i in range(out_h):
        row = acc[ys[i]:ys[i + 1]]
        for j in range(out_w):
            out[i, j] = row[:, xs[j]:xs[j + 1]].mean(axis=(0, 1)).round()
    return out


def resize_expected(n_images: int, out_w: int, out_h: int,
                    fmt: str = "png") -> list[dict]:
    """Expected (image_id, w, h, fmt, bytes_md5) rows for resizing the
    first ``n_images`` deterministic corpus images — pure Python end to
    end (reference kernel + the repo codec + hashlib md5)."""
    import hashlib

    from auto_ria_spark.functions import imaging
    from auto_ria_spark.sources import worldgen

    out = []
    for g in range(n_images):
        row = worldgen.corpus_row(g)
        px = imaging.decode_image(row["bytes"])
        small = resize_reference(px, out_w, out_h)
        data = imaging.encode_image(small, fmt)
        out.append({
            "image_id": row["image_id"], "w": out_w, "h": out_h,
            "fmt": fmt, "bytes_md5": hashlib.md5(data).hexdigest(),
        })
    return out


def video_frames_expected(n_videos: int, frames_per_video: int,
                          every_n: int) -> list[dict]:
    """Expected (video_id, frame_index, w, h, frame_md5) rows for the
    frame-sampling driver gate: a pure-Python replay of the FVID container
    walk + stride + decode-dims, independent of the Spark stage."""
    import hashlib

    from auto_ria_spark.functions import imaging
    from auto_ria_spark.sources import worldgen

    out = []
    for v in range(n_videos):
        for k in range(0, frames_per_video, every_n):
            data = imaging.encode_png(
                worldgen.gen_pixels(v * frames_per_video + k))
            px = imaging.decode_image(data)
            out.append({
                "video_id": f"vid{v:05d}", "frame_index": k,
                "w": px.shape[1], "h": px.shape[0],
                "frame_md5": hashlib.md5(data).hexdigest(),
            })
    return out


def audio_features_expected(n_clips: int, sample_rate: int) -> list[dict]:
    """Expected PCM16 feature rows — same formulas as
    functions.multimodal.pcm16_features over the worldgen clips (float
    reductions use the identical numpy calls so doubles are
    bit-reproducible)."""
    import numpy as np

    from auto_ria_spark.sources import worldgen

    out = []
    for aid, data in worldgen.audio_rows(n_clips, sample_rate):
        x = np.frombuffer(data, np.int16).astype(np.float64) / 32768.0
        n = len(x)
        out.append({
            "audio_id": aid, "n_samples": n,
            "duration_s": n / sample_rate,
            "rms": float(np.sqrt(np.mean(x * x))) if n else 0.0,
            "peak": float(np.abs(x).max()) if n else 0.0,
            "zero_crossings":
                int(np.count_nonzero(np.diff(np.signbit(x)))),
        })
    return out


def _sql_lit(v, typ: str) -> str:
    """One SQL literal, explicitly cast so DuckDB types are pinned."""
    if v is None:
        return f"CAST(NULL AS {typ})"
    if typ == "BOOLEAN":
        return "TRUE" if v else "FALSE"
    if typ == "VARCHAR":
        return "'" + str(v).replace("'", "''") + "'"
    if typ == "DOUBLE":
        return f"CAST({v!r} AS DOUBLE)"
    return f"CAST({v} AS {typ})"


def values_sql(rows: list[dict], cols: list[tuple[str, str]]) -> str:
    """Build `SELECT * FROM (VALUES ...) AS t(col, ...)` for DuckDB.

    ``cols`` is [(name, duckdb_type), ...]; every value is cast so the
    result schema is stable even for all-NULL columns.
    """
    if not rows:
        body = "SELECT " + ", ".join(
            f"CAST(NULL AS {t}) AS {n}" for n, t in cols) + " WHERE 1=0"
        return body
    tuples = ",\n".join(
        "(" + ", ".join(_sql_lit(r[n], t) for n, t in cols) + ")"
        for r in rows)
    names = ", ".join(n for n, _ in cols)
    return f"SELECT * FROM (VALUES\n{tuples}\n) AS t({names})"
