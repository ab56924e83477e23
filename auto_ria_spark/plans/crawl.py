"""The wave-loop crawl engine — PySpark-native frontier + fetch scheduler.

Replaces the reference's single-process asyncio while-loop (reference:
app/scraper/autoria.py:193-367) with a BFS *wave* loop over snapshot
tables.  One wave runs three staged fetch rounds — exactly the reference's
per-iteration shape (listing page -> car pages -> phone XHRs, reference:
autoria.py:248-348, parsers/car_page.py:302-373):

  L. select eligible listing rows (budget 1/host => strictly sequential
     pagination, the reference's while-loop order, C2), fetch, parse links
     in DOM order (posexplode), first-occurrence dedup (F1) = within-page
     min-pos window + Bloom pre-screen + exact anti-join vs the run's
     ``seen_urls``; assign per-host discovery ranks; gate on rank <=
     max_cars (F8); skip-but-count links already saved by a prior run
     (F2); enqueue the next listing page unless empty (F6) / page limit
     (F7) / car limit reached;
  C. car candidates = carried-over frontier rows + this wave's new links;
     per-host top-B (C1 politeness budget = SCRAPER_CONCURRENCY analogue),
     fetch, drop deleted (F3), project the typed fields (P2-P11, all
     JVM-side expressions), derive the phone XHR URL (P14/P15), park
     extracted fields in ``pending_cars``;
  P. phone candidates = carried-over + this wave's; top-B, fetch, parse
     (P16), join back to ``pending_cars``, normalize (P6), assemble
     (P17/P18), within-batch VIN dedup (J4), append to ``cars``.  Cars
     whose phone fetch dies are dropped entirely (F4, reference:
     parsers/car_page.py:355-359).

429/503 rows re-queue with (attempt+1, not_before = wave_ts +
deterministic backoff) mirroring the reference's retry structure
(search_page.py:153-178, car_page.py:276-292) without wall clocks.
Every state table commits a snapshot tagged with the wave — the
checkpoint the north rule requires; resume = roll all tables back to the
last wave committed by every table and continue.

Crawl-order reproducibility: the total order key is (host, kind_rank,
page_index, pos_on_page / discovery_rank); budgets only *delay* rows,
never reorder them, so the discovered set, discovery order and saved rows
are identical at any parallelism / budget — the golden oracle test
asserts this.

Scale notes (10^10-URL frontier): all crawl-state joins key on the 64-bit
``url_hash`` (bucketed in the production Iceberg DDL — see
sources/warehouse.iceberg_ddl); the Bloom shards cut the exact anti-join
probe side to ~FPR + true-dup share; per-host top-B is salted two-phase
(operators/politeness.py) so a hot host never serializes into one window
partition; driver-side state is a handful of scalar counters per wave —
row data never collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from auto_ria_spark.config import CrawlConfig
from auto_ria_spark.functions import extract as X
from auto_ria_spark.functions import urls as U
from auto_ria_spark.operators import bloom
from auto_ria_spark.operators.politeness import robots_gate, top_b_per_host
from auto_ria_spark.sources.fetch import fetched_frontier
from auto_ria_spark.sources.warehouse import Warehouse
from auto_ria_spark.util import empty_df, local_df

FRONTIER_COLS = ["url_norm", "url_hash", "host", "kind", "kind_rank",
                 "page_index", "pos_on_page", "attempt", "not_before",
                 "discovery_rank", "discovered_wave"]
FRONTIER_SCHEMA = (
    "url_norm string, url_hash long, host string, kind string, kind_rank int,"
    " page_index int, pos_on_page int, attempt int, not_before long,"
    " discovery_rank long, discovered_wave int"
)
SEEN_SCHEMA = (
    "url_hash long, url_norm string, host string, kind string,"
    " discovery_rank long, discovered_wave int"
)
PENDING_SCHEMA = (
    "phone_hash long, url string, host string, discovery_rank long,"
    " title string, price_usd int, odometer int, username string,"
    " image_url string, image_id string, images_count int,"
    " car_number string, car_vin string"
)
CARS_SCHEMA = (
    "url string, title string, price_usd int, odometer int, username string,"
    " phone_number string, image_url string, image_id string,"
    " images_count int, car_number string, car_vin string,"
    " datetime_found timestamp, host string, discovery_rank long"
)
METRICS_SCHEMA = (
    "wave int, partition_id int, kind string, metric string, value long"
)
HOSTSTATE_SCHEMA = "host string, cars_discovered long, pagination_done boolean"
CAR_IMAGES_SCHEMA = (
    "image_id string, url string, w int, h int, decoded_w int, decoded_h int,"
    " phash long, decoded_phash long, image_ok boolean, caption string,"
    " verified_wave int"
)

TABLES = ("frontier", "seen_urls", "seen_filters", "pending_cars", "cars",
          "car_images", "metrics", "host_state")


@dataclass
class WaveStats:
    wave: int
    selected: int = 0
    fetched_ok: int = 0
    requeued: int = 0
    errors: int = 0
    discovered: int = 0
    skipped_db: int = 0
    enqueued: int = 0
    saved: int = 0
    frontier_left: int = 0
    detail: dict = field(default_factory=dict)


class CrawlEngine:
    def __init__(self, spark: SparkSession, warehouse_dir: str,
                 cfg: CrawlConfig | None = None,
                 pages: DataFrame | None = None,
                 robots: DataFrame | None = None,
                 corpus: DataFrame | None = None):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        self.wh = Warehouse(warehouse_dir)
        # the synthetic "web" (prod: real HTTP); key it by url_hash once
        if pages is not None and "url_hash" not in pages.columns:
            pages = pages.withColumn("url_hash", U.url_hash64(F.col("url_norm")))
        self.pages = pages
        self.robots = robots
        # the image+caption corpus (input_hint): stage V validates each
        # saved car's photo bytes against it (decode + phash + dims)
        self.corpus = corpus
        self.t = {name: self.wh.table(name) for name in TABLES}

    # ------------------------------------------------------------------ state
    def _read(self, name: str, schema: str) -> DataFrame:
        df = self.t[name].read(self.spark)
        if df is None:
            return empty_df(self.spark, schema)
        return df

    def last_complete_wave(self) -> int:
        """Highest wave tagged on ALL state tables (checkpoint marker)."""
        waves = []
        for name in TABLES:
            tags = [s["tag"].get("wave", -1) for s in self.t[name].snapshots()]
            waves.append(max(tags) if tags else -1)
        return min(waves) if waves else -1

    def resume(self) -> int:
        """Roll every table back to the last wave all tables committed.

        Crash recovery: a wave's commits are per-table, so a crash
        mid-commit leaves some tables one wave ahead; rollback restores a
        consistent cut (the Iceberg-snapshot analogue of 'restart from
        last checkpoint').  Returns the next wave to run.
        """
        w = self.last_complete_wave()
        for name in TABLES:
            self.t[name].rollback_to_tag("wave", w)
        return w + 1

    # ------------------------------------------------------------------ seed
    def start(self, seeds: list[dict]) -> None:
        """Seed the frontier (mirrors the SCRAPER_START_URL bootstrap,
        reference: app/config/settings.py:76-79)."""
        cfg = self.cfg
        seed_df = local_df(
            self.spark,
            [(s["url"], s.get("kind", "listing")) for s in seeds],
            "url string, kind string",
        )
        fr = (
            seed_df.select(
                U.canonicalize_url(F.col("url")).alias("url_norm"),
                F.col("kind"),
            )
            .withColumn("url_hash", U.url_hash64(F.col("url_norm")))
            .withColumn("host", U.url_host(F.col("url_norm")))
            .withColumn("kind_rank", U.kind_rank(F.col("kind")))
            # pages-processed counter (reference page_count), NOT the URL's
            # page= param — F7 counts pages fetched this run from 0
            .withColumn("page_index", F.lit(0))
            .withColumn("pos_on_page", F.lit(0))
            .withColumn("attempt", F.lit(0))
            .withColumn("not_before", F.lit(0).cast("long"))
            .withColumn("discovery_rank", F.lit(None).cast("long"))
            .withColumn("discovered_wave", F.lit(-1))
            .select(*FRONTIER_COLS)
        )
        fr = robots_gate(fr, self.robots)
        seen = fr.select("url_hash", "url_norm", "host", "kind",
                         "discovery_rank", "discovered_wave")
        tag = {"wave": -1}
        self.t["frontier"].write(fr, mode="overwrite", tag=tag, num_files=1)
        self.t["seen_urls"].write(seen, mode="overwrite", tag=tag, num_files=1)
        filters = bloom.build_filters(
            seen, None, num_shards=cfg.num_shards,
            m_bits=cfg.bloom_bits_per_shard, k=cfg.bloom_k, wave=-1)
        self.t["seen_filters"].write(filters, mode="overwrite", tag=tag)
        for name, schema in (("pending_cars", PENDING_SCHEMA),
                             ("cars", CARS_SCHEMA),
                             ("car_images", CAR_IMAGES_SCHEMA),
                             ("metrics", METRICS_SCHEMA),
                             ("host_state", HOSTSTATE_SCHEMA)):
            self.t[name].write(empty_df(self.spark, schema),
                               mode="overwrite", tag=tag, num_files=1)

    def start_from_df(self, seed_urls: DataFrame, kind: str = "car") -> None:
        """Bulk-seed the frontier from a DataFrame of URLs (sitemap-style
        bootstrap / resume-of-a-large-crawl regime: at 10^10 scale every
        wave starts from a standing frontier like this, not from one seed).

        ``seed_urls`` needs a ``url`` column; ranks are assigned per host in
        URL order (a bulk seed has no listing-derived crawl order).
        """
        cfg = self.cfg
        fr = (
            seed_urls.select(U.canonicalize_url(F.col("url")).alias("url_norm"))
            .withColumn("url_hash", U.url_hash64(F.col("url_norm")))
            .withColumn("host", U.url_host(F.col("url_norm")))
            .withColumn("kind", F.lit(kind))
            .withColumn("kind_rank", U.kind_rank(F.lit(kind)))
            .withColumn("page_index", F.lit(0))
            .withColumn("pos_on_page", F.lit(0))
            .withColumn("attempt", F.lit(0))
            .withColumn("not_before", F.lit(0).cast("long"))
            .withColumn(
                "discovery_rank",
                F.row_number().over(
                    Window.partitionBy("host").orderBy("url_norm"))
                .cast("long"))
            .withColumn("discovered_wave", F.lit(-1))
            .select(*FRONTIER_COLS)
        )
        fr = robots_gate(fr, self.robots)
        seen = fr.select("url_hash", "url_norm", "host", "kind",
                         "discovery_rank", "discovered_wave")
        tag = {"wave": -1}
        nf = max(2, cfg.shuffle_partitions // 2)
        self.t["frontier"].write(fr, mode="overwrite", tag=tag, num_files=nf)
        self.t["seen_urls"].write(seen, mode="overwrite", tag=tag, num_files=nf)
        filters = bloom.build_filters(
            seen, None, num_shards=cfg.num_shards,
            m_bits=cfg.bloom_bits_per_shard, k=cfg.bloom_k, wave=-1)
        self.t["seen_filters"].write(filters, mode="overwrite", tag=tag)
        hs = fr.groupBy("host").agg(
            F.max("discovery_rank").alias("cars_discovered"),
            F.lit(True).alias("pagination_done"))
        self.t["host_state"].write(hs, mode="overwrite", tag=tag, num_files=2)
        for name, schema in (("pending_cars", PENDING_SCHEMA),
                             ("cars", CARS_SCHEMA),
                             ("car_images", CAR_IMAGES_SCHEMA),
                             ("metrics", METRICS_SCHEMA)):
            self.t[name].write(empty_df(self.spark, schema),
                               mode="overwrite", tag=tag, num_files=1)

    # ------------------------------------------------------------------ wave
    def run_wave(self, wave: int) -> WaveStats:
        import time as _time
        cfg, spark = self.cfg, self.spark
        ts = cfg.wave_ts(wave)
        st = WaveStats(wave=wave)
        _t = {"start": _time.time()}

        def _mark(name):
            now = _time.time()
            _t[name] = round(now - _t.pop("_last", _t["start"]), 3)
            _t["_last"] = now

        from concurrent.futures import ThreadPoolExecutor

        stats_ex = ThreadPoolExecutor(max_workers=3)
        frontier = self._read("frontier", FRONTIER_SCHEMA)
        seen = self._read("seen_urls", SEEN_SCHEMA)
        filters = self.t["seen_filters"].read(spark)
        pending = self._read("pending_cars", PENDING_SCHEMA)
        cars = self._read("cars", CARS_SCHEMA)
        host_state = self._read("host_state", HOSTSTATE_SCHEMA)

        _mark("read_state")
        eligible = frontier.filter(F.col("not_before") <= F.lit(ts))

        # -- stage L: listing fetch + discovery -------------------------------
        listing_sel = top_b_per_host(
            eligible.filter(F.col("kind").isin("listing", "sitemap")),
            cfg.listing_budget, ["kind_rank", "page_index", "url_norm"])
        lf = fetched_frontier(listing_sel, self.pages) \
            .withColumn("__pid", F.spark_partition_id()) \
            .localCheckpoint(eager=True)
        _mark("stage_L_fetch")
        (new_links, next_pages, seen_only, host_state_next,
         flagged) = self._discover(
            lf.filter(F.col("status_code") == 200), seen, filters, cars,
            host_state, wave)
        # discovery counters run concurrently with stages C/P (flagged is
        # checkpointed — the agg is an independent tiny job)
        crow_fut = stats_ex.submit(
            lambda: flagged.groupBy().agg(
                F.count("*").alias("disc"),
                F.sum(F.col("__in_db").cast("int")).alias("skip"),
                F.sum(F.col("__over").cast("int")).alias("over")).first())

        _mark("discover")
        # -- stage C: car fetch + field extraction ----------------------------
        car_cand = eligible.filter(F.col("kind") == "car") \
            .unionByName(new_links)
        car_sel = top_b_per_host(car_cand, cfg.host_budget, ["discovery_rank"])
        cf = fetched_frontier(car_sel, self.pages) \
            .withColumn("__pid", F.spark_partition_id()) \
            .localCheckpoint(eager=True)
        _mark("stage_C_fetch")
        new_pending, phone_rows, parsed = \
            self._parse_cars(cf.filter(F.col("status_code") == 200), wave)
        prow_fut = stats_ex.submit(
            lambda: parsed.groupBy().agg(
                F.count("*").alias("n"),
                F.sum(F.col("is_deleted").cast("int")).alias("deleted"),
                F.sum(((~F.col("is_deleted")) & F.col("phone_url").isNull())
                      .cast("int")).alias("nophone")).first())
        _mark("parse_cars")

        # -- stage P: phone fetch + assembly + save ---------------------------
        ph_cand = eligible.filter(F.col("kind") == "phone") \
            .unionByName(phone_rows)
        ph_sel = top_b_per_host(ph_cand, cfg.phone_budget, ["discovery_rank"])
        pf = fetched_frontier(ph_sel, self.pages) \
            .withColumn("__pid", F.spark_partition_id()) \
            .localCheckpoint(eager=True)
        _mark("stage_P_fetch")
        pending_all = pending.unionByName(new_pending)
        saved_rows, resolved_hashes = self._resolve_phones(
            pf.filter(F.col("status_code") == 200), pending_all)

        # -- retries / errors ---------------------------------------------------
        fetched = lf.unionByName(cf).unionByName(pf)
        retryable = fetched.filter(F.col("status_code").isin(429, 503))
        failed = fetched.filter(F.col("status_code") == 404)
        backoff = F.coalesce(
            F.col("retry_after_s").cast("long"),
            (F.lit(cfg.backoff_base_s) * (F.col("attempt") + 1)).cast("long"),
        )
        requeue = (
            retryable.filter(F.col("attempt") + 1 < F.lit(cfg.max_attempts))
            .select(
                "url_norm", "url_hash", "host", "kind", "kind_rank",
                "page_index", "pos_on_page",
                (F.col("attempt") + 1).alias("attempt"),
                (F.lit(ts) + backoff).alias("not_before"),
                "discovery_rank", "discovered_wave")
        )
        exhausted = retryable.filter(
            F.col("attempt") + 1 >= F.lit(cfg.max_attempts))
        # pending rows whose phone fetch died entirely — F4 no-phone drop
        dead_phones = (
            exhausted.filter(F.col("kind") == "phone")
            .unionByName(failed.filter(F.col("kind") == "phone"))
            .select(F.col("url_hash").alias("phone_hash"))
        )

        # -- next state ---------------------------------------------------------
        pool = (
            frontier.unionByName(new_links).unionByName(next_pages)
            .unionByName(phone_rows)
        )
        fetched_hashes = fetched.select("url_hash")
        frontier_next = (
            pool.join(fetched_hashes, "url_hash", "left_anti")
            .unionByName(requeue)
        )
        seen_add = (
            new_links.unionByName(next_pages).unionByName(phone_rows)
            .select("url_hash", "url_norm", "host", "kind",
                    "discovery_rank", "discovered_wave")
            .unionByName(seen_only)
        )
        filters_next = bloom.build_filters(
            seen_add, filters, num_shards=cfg.num_shards,
            m_bits=cfg.bloom_bits_per_shard, k=cfg.bloom_k, wave=wave)
        pending_next = (
            pending_all.join(resolved_hashes, "phone_hash", "left_anti")
            .join(dead_phones, "phone_hash", "left_anti")
        )

        _mark("plan_state")
        # -- wave scalar stats (independent tiny jobs; run concurrently) -------
        frow_fut = stats_ex.submit(
            lambda: fetched.groupBy().agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("status_code") == 200, 1)
                      .otherwise(0)).alias("ok"),
                F.sum(F.when(F.col("status_code").isin(429, 503)
                             & (F.col("attempt") + 1 < cfg.max_attempts), 1)
                      .otherwise(0)).alias("requeued"),
                F.sum(F.when((F.col("status_code") == 404)
                             | (F.col("status_code").isin(429, 503)
                                & (F.col("attempt") + 1 >= cfg.max_attempts)),
                             1).otherwise(0)).alias("errors")).first())
        _mark("stats_agg")
        # -- metrics / per-partition lineage ------------------------------------
        per_part = fetched.groupBy("__pid", "kind").agg(
            F.count("*").alias("fetched"),
            F.sum(F.when(F.col("status_code") == 200, 1).otherwise(0)).alias("ok"))
        metric_rows = per_part.select(
            F.lit(wave).alias("wave"), F.col("__pid").alias("partition_id"),
            "kind", F.lit("fetched").alias("metric"),
            F.col("fetched").cast("long").alias("value"),
        ).unionByName(per_part.select(
            F.lit(wave).alias("wave"), F.col("__pid").alias("partition_id"),
            "kind", F.lit("fetch_ok").alias("metric"),
            F.col("ok").cast("long").alias("value")))

        # -- commit (tagged with the wave: the checkpoint) -----------------------
        _mark("metrics_plan")
        saved_rows = saved_rows.localCheckpoint(eager=True)
        st.saved = saved_rows.count()
        tag = {"wave": wave}
        nf = max(2, cfg.shuffle_partitions // 8)
        _mark("saved_ckpt")
        # -- stage V: validate each saved car's photo against the corpus ------
        car_images_new = self._verify_images(saved_rows, wave)
        _mark("stage_V_plan")
        # independent table writes fan out over driver threads (each is its
        # own Spark job; the local scheduler interleaves their tiny stages —
        # on a cluster these are concurrent Iceberg commits to distinct tables)
        from concurrent.futures import ThreadPoolExecutor

        def _timed(name, table, df, mode, nfi):
            t0 = _time.time()
            snap = self.t[table].write(df, mode, tag, nfi)
            _t[f"wt_{name}"] = round(_time.time() - t0, 3)
            return snap

        with ThreadPoolExecutor(max_workers=6) as ex:
            futs = [
                ex.submit(_timed, "seen", "seen_urls", seen_add, "append", nf),
                ex.submit(_timed, "filters", "seen_filters", filters_next,
                          "overwrite", None),
                ex.submit(_timed, "pending", "pending_cars", pending_next,
                          "overwrite", nf),
                ex.submit(_timed, "cars", "cars", saved_rows, "append", nf),
                ex.submit(_timed, "imgs", "car_images", car_images_new,
                          "append", nf),
                ex.submit(_timed, "hoststate", "host_state", host_state_next,
                          "overwrite", 1),
            ]
            fsnap = _timed("frontier", "frontier", frontier_next,
                           "overwrite", nf)
            # row count comes from the parquet footers of the files just
            # written — no read-back Spark job
            st.frontier_left = fsnap["rows"]
            for fut in futs:
                fut.result()
        _mark("w_tables")
        frow = frow_fut.result()
        crow = crow_fut.result()
        prow = prow_fut.result()
        stats_ex.shutdown(wait=False)
        st.selected = frow["n"] or 0
        st.fetched_ok = frow["ok"] or 0
        st.requeued = frow["requeued"] or 0
        st.errors = frow["errors"] or 0
        st.discovered = crow["disc"] or 0
        st.skipped_db = crow["skip"] or 0
        st.enqueued = st.discovered - st.skipped_db - (crow["over"] or 0)
        c_parsed, c_deleted, c_nophone = (prow["n"] or 0,
                                          prow["deleted"] or 0,
                                          prow["nophone"] or 0)
        summary = local_df(
            self.spark,
            [(wave, -1, "all", "fetched", int(st.selected)),
             (wave, -1, "all", "fetch_ok", int(st.fetched_ok)),
             (wave, -1, "all", "requeued", int(st.requeued)),
             (wave, -1, "all", "errors", int(st.errors)),
             (wave, -1, "car", "discovered", int(st.discovered)),
             (wave, -1, "car", "skipped_db", int(st.skipped_db)),
             (wave, -1, "car", "enqueued", int(st.enqueued)),
             (wave, -1, "car", "parsed", int(c_parsed)),
             (wave, -1, "car", "deleted", int(c_deleted)),
             (wave, -1, "car", "no_phone", int(c_nophone)),
             (wave, -1, "car", "saved", int(st.saved)),
             (wave, -1, "all", "frontier_left", int(st.frontier_left))],
            METRICS_SCHEMA)
        self.t["metrics"].write(metric_rows.unionByName(summary),
                                mode="append", tag=tag, num_files=1)
        _mark("w_metrics")
        _t.pop("_last", None); _t.pop("start", None)
        st.detail = _t
        return st

    # ------------------------------------------------------------------ parts
    def _discover(self, listing_ok: DataFrame, seen: DataFrame,
                  filters: DataFrame | None, cars: DataFrame,
                  host_state: DataFrame, wave: int):
        """Listing-page link discovery: P12/P13 + F1/F2/F6/F7/F8."""
        cfg = self.cfg
        links = listing_ok.select(
            F.col("url_norm").alias("page_url"),
            F.col("kind").alias("page_kind"),
            F.col("host").alias("page_host"),
            F.col("page_index"),
            F.posexplode_outer(X.listing_links(F.col("body")))
            .alias("pos_on_page", "href"),
        )
        # empty pages (F6) surface as one null-href row: they gate pagination
        # below but contribute no links.  Links classify by their own URL
        # (sitemap pages list listing pages; listing pages list car pages)
        # and carry their own host (cross-host links allowed).
        link_rows = links.filter(F.col("href").isNotNull()).select(
            "page_index", "pos_on_page",
            U.canonicalize_url(F.col("href")).alias("url_norm"),
        ).withColumn("url_hash", U.url_hash64(F.col("url_norm"))) \
            .withColumn("host", U.url_host(F.col("url_norm"))) \
            .withColumn("link_kind", U.classify_kind(F.col("url_norm")))

        # F1a: within-wave first occurrence (min (page_index, pos) wins)
        w_first = Window.partitionBy("url_hash").orderBy("page_index",
                                                         "pos_on_page")
        link_rows = (
            link_rows.withColumn("__rn", F.row_number().over(w_first))
            .filter(F.col("__rn") == 1).drop("__rn")
        )
        # robots: disallowed URLs are never fetched and never enter seen
        link_rows = robots_gate(link_rows, self.robots)

        # F1b: drop links already discovered this run — Bloom pre-screen,
        # exact anti-join only on the maybe-seen side (no false negatives)
        probed = bloom.probe_filters(
            link_rows, filters, num_shards=cfg.num_shards,
            m_bits=cfg.bloom_bits_per_shard, k=cfg.bloom_k)
        certain_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
        maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
        new = certain_new.unionByName(
            maybe.join(seen.select("url_hash"), "url_hash", "left_anti"))
        # sitemap-discovered listing chains start their own pagination
        new_listing_pages = new.filter(F.col("link_kind") == "listing")
        new = new.filter(F.col("link_kind") == "car").drop("link_kind")

        # F8: per-host discovery ranks continue from the host's running count
        prev_counts = host_state.select(
            "host", F.col("cars_discovered").alias("__prev"))
        w_rank = Window.partitionBy("host").orderBy("page_index", "pos_on_page")
        ranked = (
            new.withColumn("__r", F.row_number().over(w_rank))
            .join(prev_counts, "host", "left")
            .withColumn(
                "discovery_rank",
                (F.coalesce(F.col("__prev"), F.lit(0)) + F.col("__r"))
                .cast("long"))
            .drop("__r", "__prev")
        )
        # F2: links already saved by a prior run are counted + seen but not
        # fetched (reference existing_urls / check_urls_batch skip);
        # F8: links ranked past max_cars are seen but never processed
        flagged = (
            ranked.join(
                cars.select(U.url_hash64(F.col("url")).alias("url_hash"),
                            F.lit(True).alias("__in_db")).distinct(),
                "url_hash", "left")
            .withColumn("__in_db", F.coalesce(F.col("__in_db"), F.lit(False)))
            .withColumn(
                "__over",
                (~F.col("__in_db")) & (F.lit(cfg.max_cars) > 0)
                & (F.col("discovery_rank") > cfg.max_cars))
            .localCheckpoint(eager=True)
        )

        new_links = flagged.filter(~F.col("__in_db") & ~F.col("__over")).select(
            "url_norm", "url_hash", "host",
            F.lit("car").alias("kind"),
            U.kind_rank(F.lit("car")).alias("kind_rank"),
            "page_index", "pos_on_page",
            F.lit(0).alias("attempt"),
            F.lit(0).cast("long").alias("not_before"),
            "discovery_rank",
            F.lit(wave).alias("discovered_wave"),
        )
        seen_only = flagged.filter(F.col("__in_db") | F.col("__over")).select(
            "url_hash", "url_norm", "host", F.lit("car").alias("kind"),
            "discovery_rank", F.lit(wave).alias("discovered_wave"))

        # host_state: bump the running discovery counters
        per_host_new = flagged.groupBy("host").agg(F.count("*").alias("__new"))
        host_state_next = (
            host_state.join(per_host_new, "host", "full")
            .select(
                "host",
                (F.coalesce(F.col("cars_discovered"), F.lit(0))
                 + F.coalesce(F.col("__new"), F.lit(0))).alias("cars_discovered"),
                F.coalesce(F.col("pagination_done"), F.lit(False))
                .alias("pagination_done"))
        )

        # pagination (P13 + F6/F7/F8 stop rules) — listing pages only
        page_counts = (
            links.filter(F.col("page_kind") == "listing")
            .groupBy("page_url", F.col("page_host").alias("host"),
                     "page_index")
            .agg(F.count(F.col("href")).alias("n_links"))
        )
        after_counts = host_state_next.select(
            "host", F.col("cars_discovered").alias("__after"))
        np_gate = page_counts.join(after_counts, "host", "left").filter(
            (F.col("n_links") > 0)                                   # F6
            & ((F.lit(cfg.max_cars) == 0)
               | (F.col("__after") < F.lit(cfg.max_cars)))           # F8 stop
            & ((F.lit(cfg.max_pages) == 0)
               | (F.col("page_index") + 1 < F.lit(cfg.max_pages)))   # F7
        )
        next_pages = np_gate.select(
            U.next_page_url(F.col("page_url")).alias("url_norm"),
            F.col("host"),
            (F.col("page_index") + 1).alias("page_index"),
        ).select(
            "url_norm",
            U.url_hash64(F.col("url_norm")).alias("url_hash"),
            "host",
            F.lit("listing").alias("kind"),
            U.kind_rank(F.lit("listing")).alias("kind_rank"),
            "page_index",
            F.lit(0).alias("pos_on_page"),
            F.lit(0).alias("attempt"),
            F.lit(0).cast("long").alias("not_before"),
            F.lit(None).cast("long").alias("discovery_rank"),
            F.lit(wave).alias("discovered_wave"),
        )
        sitemap_listings = new_listing_pages.select(
            "url_norm", "url_hash", "host",
            F.lit("listing").alias("kind"),
            U.kind_rank(F.lit("listing")).alias("kind_rank"),
            F.lit(0).alias("page_index"),   # each chain restarts page_count
            "pos_on_page",
            F.lit(0).alias("attempt"),
            F.lit(0).cast("long").alias("not_before"),
            F.lit(None).cast("long").alias("discovery_rank"),
            F.lit(wave).alias("discovered_wave"),
        )
        next_pages = (
            next_pages.unionByName(sitemap_listings)
            .dropDuplicates(["url_hash"])
        )
        next_pages = robots_gate(next_pages, self.robots)
        return (new_links, next_pages, seen_only, host_state_next, flagged)

    def _parse_cars(self, car_ok: DataFrame, wave: int):
        """Car-page field projection (P2-P11, P14/P15) + F3 deleted drop."""
        body = F.col("body")
        parsed = car_ok.select(
            "url_norm", "url_hash", "host", "discovery_rank",
            X.is_deleted_listing(body).alias("is_deleted"),
            X.extract_title(body).alias("title"),
            X.extract_price_usd(body).alias("price_usd"),
            X.extract_odometer(body).alias("odometer"),
            X.extract_username(body).alias("username"),
            X.extract_image_url(body).alias("image_url"),
            X.extract_car_number(body).alias("car_number"),
            X.extract_car_vin(body).alias("car_vin"),
            X.payload_field(body, "image_id").alias("image_id"),
            X.phone_url(body, F.col("url_norm")).alias("phone_url"),
            X.extract_images_count(body, X.extract_image_url(body))
            .alias("images_count"),
        ).localCheckpoint(eager=True)
        with_phone = (
            parsed.filter(~F.col("is_deleted"))            # F3
            .filter(F.col("phone_url").isNotNull())        # F4 (no handle)
            .withColumn("phone_norm", U.canonicalize_url(F.col("phone_url")))
            .withColumn("phone_hash", U.url_hash64(F.col("phone_norm")))
        )
        new_pending = with_phone.select(
            "phone_hash", F.col("url_norm").alias("url"), "host",
            "discovery_rank", "title", "price_usd", "odometer", "username",
            "image_url", "image_id", "images_count", "car_number", "car_vin")
        phone_rows = with_phone.select(
            F.col("phone_norm").alias("url_norm"),
            F.col("phone_hash").alias("url_hash"),
            "host",
            F.lit("phone").alias("kind"),
            U.kind_rank(F.lit("phone")).alias("kind_rank"),
            F.lit(0).alias("page_index"),
            F.lit(0).alias("pos_on_page"),
            F.lit(0).alias("attempt"),
            F.lit(0).cast("long").alias("not_before"),
            "discovery_rank",
            F.lit(wave).alias("discovered_wave"))
        return new_pending, phone_rows, parsed

    def _resolve_phones(self, phone_ok: DataFrame, pending: DataFrame):
        """P16/P6/P17/P18 + J4 dedup: assemble + save car rows."""
        cfg = self.cfg
        phones = phone_ok.select(
            F.col("url_hash").alias("phone_hash"),
            X.phone_from_json(F.col("body")).alias("phone_raw"),
        ).filter(F.col("phone_raw").isNotNull())
        assembled = pending.join(phones, "phone_hash", "inner").select(
            "url", "title", "price_usd", "odometer", "username",
            X.normalize_phone(F.col("phone_raw")).alias("phone_number"),
            "image_url", "image_id", "images_count", "car_number", "car_vin",
            F.timestamp_seconds(F.lit(cfg.wave_ts_base)).alias("datetime_found"),
            "host", "discovery_rank",
        )
        # J4 within-batch VIN dedup: lowest discovery rank wins (the
        # deterministic refinement of the reference's first-insert-wins race,
        # reference: app/utils/db_utils.py:130-141); null VINs exempt
        w_vin = Window.partitionBy("car_vin").orderBy("discovery_rank", "url")
        saved = (
            assembled.withColumn(
                "__rn",
                F.when(F.col("car_vin").isNull(), F.lit(1))
                .otherwise(F.row_number().over(w_vin)))
            .filter(F.col("__rn") == 1).drop("__rn")
        )
        resolved = phone_ok.select(F.col("url_hash").alias("phone_hash"))
        return saved, resolved

    def _verify_images(self, saved_rows: DataFrame, wave: int) -> DataFrame:
        """Stage V — per-row image invariant over the corpus (input_hint):
        join each saved car to the image+caption corpus on image_id, decode
        the binary payload in Arrow-batched ``mapInPandas`` and check that
        the decoded pixels reproduce the stored perceptual hash and declared
        dimensions.  This is the production shape of 'download the photo and
        validate it' (the reference only records image_url/images_count,
        reference: app/core/models.py:60-61; the graft owns the pixels)."""
        if self.corpus is None:
            return empty_df(self.spark, CAR_IMAGES_SCHEMA)
        cand = saved_rows.filter(F.col("image_id").isNotNull()).select(
            "image_id", "url")
        # broadcast the (small) wave's candidates so the corpus is NEVER
        # shuffled — the scan streams corpus partitions and keeps matches.
        # At 10^10 scale the corpus is Iceberg bucketed by image_id and this
        # becomes a storage-partitioned join instead.
        joined = self.corpus.select(
            "image_id", "bytes", "w", "h", "phash", "caption"
        ).join(F.broadcast(cand), "image_id", "inner")

        def verify(batches):
            import pandas as pd

            from auto_ria_spark.functions import imaging

            cols = ["image_id", "url", "w", "h", "decoded_w", "decoded_h",
                    "phash", "decoded_phash", "image_ok", "caption",
                    "verified_wave"]
            for pdf in batches:
                out = []
                for iid, url, data, w, h, phash, caption in zip(
                        pdf["image_id"], pdf["url"], pdf["bytes"], pdf["w"],
                        pdf["h"], pdf["phash"], pdf["caption"]):
                    dw = dh = dph = None
                    ok = False
                    if data is not None:
                        try:
                            px = imaging.decode_image(bytes(data))
                            dph = imaging.phash64(px)
                            dh, dw = px.shape[0], px.shape[1]
                            ok = bool(dw == w and dh == h and dph == phash)
                        except Exception:
                            pass
                    out.append((iid, url, w, h, dw, dh, phash, dph, ok,
                                caption, wave))
                yield pd.DataFrame(out, columns=cols)

        return joined.mapInPandas(verify, schema=CAR_IMAGES_SCHEMA)

    # ------------------------------------------------------------------ run
    def run(self, seeds: list[dict] | None = None, max_waves: int = 10_000,
            stop_after_wave: int | None = None) -> list[WaveStats]:
        """Run to frontier drain (or ``stop_after_wave`` for resume tests)."""
        if seeds is not None:
            self.start(seeds)
            first = 0
        else:
            first = self.resume()
        stats: list[WaveStats] = []
        wave = first
        while wave < first + max_waves:
            st = self.run_wave(wave)
            stats.append(st)
            if stop_after_wave is not None and wave >= stop_after_wave:
                break
            if st.frontier_left == 0:
                break
            wave += 1
        return stats

    # ------------------------------------------------------------------ views
    def cars_final(self) -> DataFrame:
        """The deduped cars view (J3/J4 global semantics: per VIN the lowest
        discovery rank wins; URL uniqueness is structural — F1/F2)."""
        cars = self._read("cars", CARS_SCHEMA)
        w_vin = Window.partitionBy("car_vin").orderBy("discovery_rank", "url")
        return (
            cars.withColumn(
                "__rn",
                F.when(F.col("car_vin").isNull(), F.lit(1))
                .otherwise(F.row_number().over(w_vin)))
            .filter(F.col("__rn") == 1).drop("__rn")
        )

    def seen(self) -> DataFrame:
        return self._read("seen_urls", SEEN_SCHEMA)

    def car_images(self) -> DataFrame:
        """Image verdicts for the FINAL cars (stage V runs per wave, before
        cross-wave VIN dedup settles — scope to the deduped view here)."""
        return self._read("car_images", CAR_IMAGES_SCHEMA).join(
            self.cars_final().select("url"), "url", "left_semi")

    def metrics(self) -> DataFrame:
        return self._read("metrics", METRICS_SCHEMA)
