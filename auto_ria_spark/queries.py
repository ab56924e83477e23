"""Named queries over the driver testdata + their DuckDB oracle SQL.

Two families:

1. **Crawl-operator parity** — every scalar/relational operator from
   SURVEY.md §2 (URL canonicalization, pagination, phone normalization,
   field extraction, first-occurrence dedup, seen anti-join, politeness
   top-B, VIN dedup, metrics rollups) exercised over the TPC-H-ish tables
   so the independent DuckDB oracle can validate semantics end-to-end.
2. **Training-data pipeline ops** — exact dedup, MinHash signatures +
   LSH candidate pairs, SimHash, word-set Jaccard near-dup, brute-force
   and LSH-bucketed embedding cosine top-k, language/quality/token text
   analysis, document fingerprinting — the operations a 100 TB corpus
   pipeline needs, each with a SQL oracle.

Design rules: everything is built-in `pyspark.sql.functions` (JVM-side,
whole-stage codegen) — no Python UDFs; floats are rounded before they are
compared or used as ordering keys so Spark and DuckDB agree bit-for-bit;
every computed column is aliased identically in the Spark plan and the
oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from auto_ria_spark.functions import extract as X
from auto_ria_spark.functions import urls as U

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =========================================================================
# 1. crawl-operator parity
# =========================================================================
def q_url_canonicalize(spark, sf_dir):
    """URL canonicalizer (SURVEY §2.2 / engine addition): messy spelling ->
    canonical form + host + page number, over synthesized listing URLs."""
    o = load(spark, sf_dir, "orders")
    messy = F.concat(
        F.lit("  https://Auto.RIA.test:443/search/?page="),
        F.col("o_orderkey").cast("string"), F.lit("&countpage=100#frag "))
    return o.select(
        F.col("o_orderkey").alias("okey"),
        U.canonicalize_url(messy).alias("url_norm"),
        U.url_host(U.canonicalize_url(messy)).alias("host"),
        U.page_number(U.canonicalize_url(messy)).alias("page_no"),
    )


def q_url_next_page(spark, sf_dir):
    """P13 pagination: page param + 1 (reference: search_page.py:80-118)."""
    o = load(spark, sf_dir, "orders")
    url = F.concat(F.lit("https://auto.ria.test/search/?countpage=100&page="),
                   (F.col("o_orderkey") % 50).cast("string"))
    return o.select(
        F.col("o_orderkey").alias("okey"),
        U.next_page_url(url).alias("next_url"),
    )


def q_phone_normalize(spark, sf_dir):
    """P6 phone normalization truth table (reference: car_page.py:128-151)
    over three synthesized formats cycling on c_custkey."""
    c = load(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    v0 = F.concat(F.lit("(0"), (50 + k % 48).cast("string"), F.lit(") "),
                  (100 + k % 900).cast("string"), F.lit("-"),
                  (10 + k % 90).cast("string"), F.lit("-"),
                  (10 + (k * 3) % 90).cast("string"))
    v1 = F.concat(F.lit("380"), (500000000 + k % 400000000).cast("string"))
    v2 = F.concat(F.lit("ext. "), (k % 1000).cast("string"))
    raw = F.when(k % 3 == 0, v0).when(k % 3 == 1, v1).otherwise(v2)
    return c.select(
        k.alias("ckey"),
        raw.alias("phone_raw"),
        X.normalize_phone(raw).alias("phone_number"),
    )


def q_extract_fields(spark, sf_dir):
    """P2/P3/P4/P8/P9 field extraction over a synthesized payload JSON —
    the parser layer's exact rules vs directly-computed oracle values."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    payload = F.to_json(F.struct(
        F.concat(F.lit("Order "), k.cast("string")).alias("title_h1"),
        F.concat(F.floor("o_totalprice").cast("long").cast("string"),
                 F.lit(" $")).alias("price_text"),
        F.when(k % 2 == 0,
               F.concat((k % 300).cast("string"), F.lit(" тис. км")))
        .otherwise(F.concat(((k % 300) * 1000).cast("string"),
                            F.lit(" км"))).alias("odometer_text"),
        F.when(k % 5 != 0,
               F.concat(F.lit("все "), (2 + k % 40).cast("string"),
                        F.lit(" фот"))).alias("show_all_text"),
        F.lit("https://cdn.test/x.jpg").alias("image_main"),
        F.concat(F.lit("AB "), (1000 + k % 9000).cast("string"),
                 F.lit(" CK")).alias("plate_text"),
    ))
    img = X.extract_image_url(payload)
    return o.select(
        k.alias("okey"),
        X.extract_title(payload).alias("title"),
        X.extract_price_usd(payload).alias("price_usd"),
        X.extract_odometer(payload).alias("odometer"),
        X.extract_images_count(payload, img).alias("images_count"),
        X.extract_car_number(payload).alias("car_number"),
    )


def q_first_occurrence_dedup(spark, sf_dir):
    """F1 first-occurrence dedup (reference: autoria.py:266-271): first
    (orderkey, linenumber) sighting of each part, in scan order.

    Shape: ``min(struct(order-key...))`` per part instead of a
    row_number window — the aggregate gets map-side PARTIAL aggregation
    (the exchange carries one row per (partition, partkey), not every
    lineitem row) and skips the window's per-partition sort; struct
    comparison is field-order lexicographic, exactly the window's
    ORDER BY, and (l_orderkey, l_linenumber) is unique, so the selected
    row is identical."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.min(F.struct("l_orderkey", "l_linenumber")).alias("__m"))
        .select("partkey",
                F.col("__m.l_orderkey").alias("first_orderkey"),
                F.col("__m.l_linenumber").alias("first_linenumber"))
    )


def q_seen_anti_join(spark, sf_dir):
    """F2/J2 seen-set anti-join (reference: db_utils.py:48-76): customers
    with no orders = frontier rows not in the seen set."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")).distinct(),
               "c_custkey", "left_anti")
        .select(F.col("c_custkey").alias("ckey"), F.col("c_name").alias("name"))
    )


def q_politeness_topk(spark, sf_dir):
    """C1 per-host politeness budget as salted two-phase top-B (operators/
    politeness.top_b_per_host) — validated against a plain SQL window."""
    from auto_ria_spark.operators.politeness import top_b_per_host
    e = load(spark, sf_dir, "events")
    df = e.select(
        F.col("event_type").alias("host"),
        F.col("ts"), F.col("event_id"),
        F.xxhash64(F.col("event_id").cast("string")).alias("url_hash"),
    )
    picked = top_b_per_host(df, 5, ["ts", "event_id"], salt_n=8)
    return picked.select(F.col("host").alias("event_type"), "event_id")


def q_vin_dedup(spark, sf_dir):
    """J4 VIN dedup, lowest crawl rank wins (reference: db_utils.py:130-141):
    one lineitem per suppkey keeping min (orderkey, linenumber).

    Deliberately NOT rewritten to the min(struct(...)) partial-aggregate
    shape of q_first_occurrence_dedup: the synthetic lineitem has rows
    that TIE on (l_suppkey, l_orderkey, l_linenumber) while carrying
    different prices (e.g. suppkey 9 at sf0.001), and the kept price is
    payload the tie does not determine — both engines resolve the
    row_number tie by scan order, which a value-based aggregate cannot
    reproduce.  first_occurrence_dedup/dedup_exact have no such payload
    column, so only they take the aggregate path."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("l_suppkey").alias("suppkey"),
                F.col("l_orderkey").alias("kept_orderkey"),
                F.round(F.col("l_extendedprice"), 2).alias("kept_price"))
    )


def q_robots_gate(spark, sf_dir):
    """C5 robots gating (engine addition the north rule requires): the
    zero-shuffle longest-prefix-wins gate (operators/politeness.robots_
    gate — per-host sorted rule arrays, 1:1 broadcast join, array
    verdict) over synthesized URLs; rules cover allow-under-prefix,
    disallow-subtree, prefix-boundary ('/a/private' matching
    '/a/privatex' — plain startswith, both engines), and rule-less
    hosts defaulting to allowed.  The oracle recomputes the verdict with
    a fan-out join + longest-prefix window."""
    from auto_ria_spark.operators.politeness import robots_gate
    from auto_ria_spark.util import local_df

    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    host = F.concat(F.lit("h"), (k % 10).cast("string"))
    path = (
        F.when(k % 5 == 0, F.concat(F.lit("/a/x"), k.cast("string")))
        .when(k % 5 == 1, F.concat(F.lit("/a/private/x"), k.cast("string")))
        .when(k % 5 == 2, F.concat(F.lit("/b/x"), k.cast("string")))
        .when(k % 5 == 3, F.concat(F.lit("/c/priv/x"), k.cast("string")))
        .otherwise(F.concat(F.lit("/a/privatex"), k.cast("string"))))
    df = o.select(
        k.alias("okey"),
        F.concat(F.lit("https://"), host, path).alias("url_norm"),
        host.alias("host"))
    rules = local_df(spark, [
        ("h0", "/a", True), ("h0", "/a/private", False), ("h0", "/c", False),
        ("h1", "/a", True), ("h1", "/a/private", False), ("h1", "/c", False),
        ("h2", "/a", True), ("h2", "/a/private", False), ("h2", "/c", False),
        ("h3", "/b", False),
        ("h4", "/", True), ("h4", "/a/priv", False),
    ], "host string, path_prefix string, allowed boolean")
    return robots_gate(df, rules).select("okey", "url_norm", "host")


def q_url_car_id(spark, sf_dir):
    """P14 car_id from URL (reference: parsers/car_page.py:231-232) over
    synthesized car-page URLs; every third row is a non-car URL, which
    extracts to the empty string (the reference's miss path)."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    car = F.concat(F.lit("https://auto.ria.test/auto_model"),
                   (k % 7).cast("string"), F.lit("_"),
                   (10000 + k).cast("string"), F.lit(".html"))
    url = F.when(k % 3 == 0,
                 F.lit("https://auto.ria.test/search/?page=1")).otherwise(car)
    return o.select(k.alias("okey"), url.alias("url"),
                    U.car_id_from_url(url).alias("car_id"))


def q_crawl_metrics(spark, sf_dir):
    """A1 run-stats rollup (reference: autoria.py:354-358)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"),
             F.countDistinct("user_id").alias("n_users"))
    )


def q_events_hourly(spark, sf_dir):
    """Tumbling-window aggregation (streaming-shaped; wave analogue)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                  F.col("event_type"))
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q_tpch_pricing(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary (partial-agg / codegen showcase)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
             F.count("*").alias("count_order"))
    )


def q_nation_revenue(spark, sf_dir):
    """Broadcast-dim star join: revenue per nation (broadcast customer+nation)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count("*").alias("n_orders"))
    )


# =========================================================================
# 2. training-data pipeline ops (documents / embeddings)
# =========================================================================
def _words(col):
    return F.split(col, " ")


def _md5_long(col):
    """First 15 hex digits of md5 as bigint — identical in DuckDB via
    ('0x' || substr(md5(x),1,15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash: keep min doc_id per md5(text).
    min-per-group aggregate (map-side partial agg — the exchange carries
    one (hash, min_id) row per map partition) instead of a row_number
    window over every document row; identical surviving rows."""
    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("content_md5"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "content_md5")
    )


_MINHASH_K = 8


def _minhash_sig8(d):
    """k=8 MinHash signature per document as 8 columns (m0..m7): shingle
    explode + 8 hash columns + ONE groupBy with 8 ``min`` aggregates.

    Seed family: h_j(s) = 32-bit hex slice j%4 of md5(s) for j<4, of
    md5('x'||s) for j>=4 — TWO md5 evaluations per shingle yield all 8
    independent seeds (md5's 128 bits = 4×32-bit slices; codegen common-
    subexpression elimination computes each digest once), 4× less hashing
    than an md5 per (shingle, seed).  All hashing runs in whole-stage
    codegen, and partial (map-side) aggregation means the exchange
    carries only |docs| rows of 8 longs — never |shingles|×k exploded
    rows (the round-1 shape), and never an interpreted
    ``aggregate``-lambda md5 per (shingle, seed) (the round-3 first
    attempt — profiled ~6× slower than codegen at sf0.1).

    Shingle construction explodes the INDEX range and builds each
    shingle string post-explode with codegen'd array indexing +
    concat_ws — the former shape materialized a full shingles array per
    document through an interpreted (CodegenFallback) ``transform``
    lambda before exploding it; same indices (SQL ``ws[i]`` is 0-based,
    i ∈ 1..len-2 → words 0..len-1), same strings, zero interpreted
    expressions.

    Base-conversion placement (r7): ``conv(hex, 16, 10)`` is the
    measured per-row hot spot (~80% of the signature wall), but md5 hex
    is FIXED-LENGTH lowercase [0-9a-f], where lexicographic order equals
    numeric order — so the min aggregates run directly on the 8-char
    STRING slices and conv runs once per (doc, seed) on the aggregated
    minima: |docs|·k conversions instead of |shingles|·k (~50× fewer
    here), identical values."""
    wdf = d.select("doc_id", F.split("text", " ").alias("ws"))
    sh = (wdf.select(
            "doc_id", "ws",
            F.explode(F.expr("sequence(1, greatest(size(ws) - 2, 0))"))
            .alias("i"))
          .select("doc_id",
                  F.expr("concat_ws(' ', ws[i-1], ws[i], ws[i+1])")
                  .alias("shingle")))
    d1 = F.md5("shingle")
    d2 = F.md5(F.concat(F.lit("x"), F.col("shingle")))
    sliced = sh.select("doc_id", *[
        F.substring(d1 if j < 4 else d2, (j % 4) * 8 + 1, 8)
        .alias(f"s{j}") for j in range(_MINHASH_K)])
    return (
        sliced.groupBy("doc_id")
        .agg(*[F.min(f"s{j}").alias(f"s{j}") for j in range(_MINHASH_K)])
        .select("doc_id", *[
            F.conv(F.col(f"s{j}"), 16, 10).cast("long").alias(f"m{j}")
            for j in range(_MINHASH_K)])
    )


def _minhash_arr(d):
    """Per-document k=8 MinHash signature as ``(doc_id, ms: array<long>)``
    (documents with no shingles produce no row — explode semantics)."""
    return _minhash_sig8(d).select(
        "doc_id",
        F.array(*[F.col(f"m{j}") for j in range(_MINHASH_K)]).alias("ms"))


def minhash_digest(ms_col: str = "ms"):
    """md5 digest of the k=8 signature in the legacy sorted "j=minhash"
    order (single-digit j ⇒ sorted order == j order)."""
    return F.md5(F.concat_ws(",", *[
        F.concat(F.lit(f"{j}="),
                 F.element_at(ms_col, j + 1).cast("string"))
        for j in range(_MINHASH_K)]))


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (k=8) over word 3-shingles — the near-dup
    primitive.  h_j(s) = 32-bit slice j%4 of md5(s) (j<4) / md5('x'||s)
    (j>=4); signature = min per j (seed family: _minhash_sig8).
    Output rows are (doc_id, j, minhash) — a posexplode of the 8-column
    aggregate (_minhash_sig8), whose exchange carries |docs| rows only."""
    d = load(spark, sf_dir, "documents")
    return _minhash_arr(d).select(
        "doc_id", F.posexplode("ms").alias("j", "minhash"))


_LSH_BUCKET_CAP = 100     # skew bound: band buckets above this are dropped


def q_lsh_candidate_pairs(spark, sf_dir):
    """MinHash-LSH near-dup candidates: band the k=8 signature into 4 bands
    of 2, bucket-join docs sharing any band value (a < b).

    Same-band-key self-joins are quadratic in bucket size, and web corpora
    concentrate mass-duplicate clusters (boilerplate pages) into single
    buckets — the one scale killer of banded LSH at 100 TB.  Buckets
    larger than ``_LSH_BUCKET_CAP`` are dropped before the join (the
    ``_ANN_BUCKET_CAP`` pattern): a >cap bucket is already a confirmed
    duplicate CLUSTER, so its members need a single representative pass,
    not cap² candidate pairs.  The DuckDB oracle applies the identical
    cap; the bound is asserted by tests/test_queries_scale.py.

    Band keys are derived map-side from the per-doc signature array
    (_minhash_arr) — j is a single digit, so the legacy sorted
    "j=minhash" concatenation order is exactly j-order, reproduced here
    without the collect_list groupBy the old plan shuffled through."""
    d = load(spark, sf_dir, "documents")
    band_structs = F.array(*[
        F.struct(
            F.lit(t).alias("band"),
            F.md5(F.concat_ws(",", *[
                F.concat(F.lit(f"{j}="),
                         F.element_at("ms", j + 1).cast("string"))
                for j in (2 * t, 2 * t + 1)])).alias("band_key"))
        for t in range(_MINHASH_K // 2)])
    bands = (
        _minhash_arr(d)
        .select("doc_id", F.explode(band_structs).alias("bb"))
        .select("doc_id", F.col("bb.band").alias("band"),
                F.col("bb.band_key").alias("band_key"))
    )
    ok_buckets = (
        bands.groupBy("band", "band_key").agg(F.count("*").alias("n"))
        .filter(F.col("n") <= _LSH_BUCKET_CAP)
        .select("band", "band_key")
    )
    capped = bands.join(ok_buckets, ["band", "band_key"], "left_semi")
    a = capped.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = capped.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").distinct()
    )


def connected_components(labels, edges, max_iters: int = 25):
    """Min-label connected components with POINTER JUMPING — the reusable
    core of q_dedup_components.

    ``labels``: (doc_id, component) initialized component=doc_id;
    ``edges``: DIRECTED (src, dst) — pass both directions for an
    undirected graph.  Returns (labels, rounds).

    Spark plan per round: (1) neighbor-min propagation — one shuffle join
    + aggregate over the edge set; (2) a pointer-jumping shortcut —
    component ids ARE node ids, so one self-join dereference
    ``label(v) <- label(label(v))`` halves the remaining chain depth.
    Propagation alone needs graph-DIAMETER rounds (a 1000-link near-dup
    chain = 1000 shuffles); with the shortcut the loop converges in
    O(log diameter) rounds — the same asymptotics as the alternating
    large-star/small-star construction, with one extra (label-narrow)
    join per round.  Each round is eagerly localCheckpointed so lineage
    stays constant and the driver reads ONE changed-count scalar.

    Raises RuntimeError if still unconverged after ``max_iters`` —
    returning partial labels silently would mislabel components with no
    signal (ADVICE r3)."""
    labels = labels.localCheckpoint()
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        nb = (
            edges.join(labels.select(F.col("doc_id").alias("src"),
                                     F.col("component").alias("nc")), "src")
            .groupBy("dst").agg(F.min("nc").alias("min_nb"))
            .select(F.col("dst").alias("doc_id"), "min_nb")
        )
        prop = (
            labels.join(nb, "doc_id", "left")
            .select("doc_id",
                    F.least(F.col("component"),
                            F.coalesce(F.col("min_nb"), F.col("component")))
                    .alias("component"))
        )
        # pointer jumping: dereference each label through the label table
        # (component values are doc_ids, so the join always lands; min is
        # monotone, so the dereferenced label can only be <=)
        deref = prop.select(F.col("doc_id").alias("component"),
                            F.col("component").alias("__cc"))
        # lazy checkpoint: the changed-count below is the round's ONE
        # action — it materializes the stub, so each round costs a
        # single Spark job instead of an eager-checkpoint job + a count
        new_labels = (
            prop.join(deref, "component", "left")
            .select("doc_id",
                    F.least(F.col("component"),
                            F.coalesce(F.col("__cc"), F.col("component")))
                    .alias("component"))
        ).localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("doc_id", "component"), rounds
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "component labels would be WRONG; raise max_iters (convergence is "
        "O(log diameter) with pointer jumping, so this indicates a "
        "pathological graph or a bug)")


def q_dedup_components(spark, sf_dir, max_iters: int = 25):
    """Near-dup CLUSTER assignment: connected components over the
    MinHash-LSH candidate-pair graph, labeled by the component's minimum
    doc_id — the final step of a dedup pipeline (keep one representative
    per component, drop the rest).

    The iteration core (``connected_components``) is min-label
    propagation + pointer jumping — O(log diameter) rounds, each bounded
    by the capped LSH edge set (orders of magnitude smaller than the
    corpus after banding + bucket caps).  The DuckDB oracle computes the
    identical labels via a recursive reachability CTE.  Isolated
    documents are their own component."""
    pairs = q_lsh_candidate_pairs(spark, sf_dir)
    half = pairs.select(F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst"))
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # Only nodes INCIDENT to a candidate edge can ever leave their own
    # singleton label (an isolated node has no neighbors to take a min
    # over, and contributes nothing to any neighbor's min), so the
    # iteration runs on the edge-endpoint set — orders of magnitude
    # smaller than the corpus after banding + bucket caps — instead of
    # joining every document row through every round.  Isolated docs are
    # re-attached as their own component afterwards with one left join.
    touched = edges.select(F.col("src").alias("doc_id")).distinct()
    labels = touched.select("doc_id", F.col("doc_id").alias("component"))
    out, _ = connected_components(labels, edges, max_iters=max_iters)
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id").join(out.withColumnRenamed("component", "__c"),
                                "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("__c"), F.col("doc_id")).alias("component"))
    )


def q_simhash(spark, sf_dir):
    """64-bit SimHash per document over word hashes (near-dup fingerprint).

    The 64 bit sources are two exact 32-bit halves of md5(w) (bits 0-31
    from hex digits 1-8, bits 32-63 from digits 9-16), and the fingerprint
    is returned as two 32-bit halves ``(simhash_hi, simhash_lo)``: packing
    bit 63 into one BIGINT needs ``1 << 63``, which overflows signed
    arithmetic in DuckDB (and is ANSI-unsafe generally) — two uint32-range
    halves are exact in both engines, and hamming distance is just
    popcount(hi^hi') + popcount(lo^lo').

    The plan is fully map-side — ZERO shuffle: per document, one array
    expression hashes each word once, then 64 ``aggregate`` lambdas count
    set bits per position and a bit is set iff strictly more than half the
    word occurrences vote for it (``2·count_set > n_words``, exactly the
    old +1/−1 vote-sum > 0, ties excluded).  The previous plan exploded
    every word row ×64 through a groupBy — a 64× shuffle-row blowup this
    projection eliminates entirely.  (r7 re-measured the explode + 64
    codegen conditional-sum aggregate alternative at 10× scale: 0.7-0.9 s
    zero-shuffle vs 1.2-1.3 s for the agg — at ~54-word docs the
    interpreted passes beat the shuffle + 65-buffer hash-agg overhead, so
    the zero-shuffle shape stays.)"""
    d = load(spark, sf_dir, "documents")
    # staged projections: split once, md5 once per word, slice twice —
    # attribute boundaries stop lambda re-evaluation of captured exprs
    wdf = d.select("doc_id", F.split("text", " ").alias("ws"))
    hdf = wdf.select(
        "doc_id", F.size("ws").alias("nw"),
        F.expr("transform(ws, w -> md5(w))").alias("hd"))
    harr = hdf.select(
        "doc_id", "nw",
        F.expr("transform(hd, h ->"
               " cast(conv(substring(h, 1, 8), 16, 10) as long))")
        .alias("hl"),
        F.expr("transform(hd, h ->"
               " cast(conv(substring(h, 9, 8), 16, 10) as long))")
        .alias("hh"))

    def bit_term(arr: str, b: int, shift: int):
        cnt = F.expr(f"aggregate({arr}, 0L, (acc, h) ->"
                     f" acc + ((h >> {b}) & 1))")
        return F.when(2 * cnt > F.col("nw"),
                      F.lit(1 << shift).cast("long")).otherwise(F.lit(0))

    lo = sum((bit_term("hl", b, b) for b in range(32)), start=F.lit(0))
    hi = sum((bit_term("hh", b, b) for b in range(32)), start=F.lit(0))
    return harr.select(
        "doc_id",
        hi.cast("long").alias("simhash_hi"),
        lo.cast("long").alias("simhash_lo"))


_JACCARD_DF_CAP = 100


def q_jaccard_near_dup(spark, sf_dir):
    """Word-set Jaccard similarity for same-source doc pairs (>= 0.5),
    computed over the NON-UBIQUITOUS vocabulary: tokens whose per-source
    document frequency exceeds ``_JACCARD_DF_CAP`` are dropped before the
    inverted-index self-join.  A hot token ("the") makes the within-token
    pair count quadratic in its document frequency — the single scale
    killer of this operator at 100 TB — while carrying no near-duplicate
    signal; the cap bounds every token's join contribution to
    cap^2 pairs.  The DuckDB oracle applies the identical cap."""
    d = load(spark, sf_dir, "documents")
    wd = d.select("source", "doc_id",
                  F.explode(F.array_distinct(_words(F.col("text")))).alias("w"))
    rare = (
        wd.groupBy("source", "w").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= _JACCARD_DF_CAP)
        .select("source", "w")
    )
    wd = wd.join(rare, ["source", "w"], "left_semi")
    sizes = wd.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = wd.select("source", F.col("doc_id").alias("doc_a"), "w")
    b = wd.select("source", F.col("doc_id").alias("doc_b"), "w")
    common = (
        a.join(b, ["source", "w"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "doc_a").join(nb, "doc_b")
        .withColumn("jaccard", F.round(
            F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


# NOTE (r7, measured dead end — do not redo): unrolling the dot product
# into a flat 64-term codegen Add chain (`0.0D + a[0]*b[0] + ...`) is
# bit-identical to the ``aggregate`` fold but ~2.8× SLOWER at 400k
# scored pairs: the ~380-node expression trips the whole-stage-codegen
# method-size fallback, and an interpreted Add chain evaluates worse
# than the interpreted higher-order fold.  The lambda shape stays.


_BRUTE_MAX_QUERIES = 64  # hard in-code gate on the crossJoin query side


def q_cosine_topk(spark, sf_dir, n_queries: int = 20):
    """Brute-force cosine top-5 per query vector — the LABELED ANN
    baseline, never the scale path (that is q_ann_lsh_buckets).  The
    crossJoin's query side is gated IN CODE at ``_BRUTE_MAX_QUERIES``:
    the scan side stays linear (N x n_queries), and asking for more
    queries raises instead of silently going quadratic."""
    if n_queries > _BRUTE_MAX_QUERIES:
        raise ValueError(
            f"brute-force cosine is capped at {_BRUTE_MAX_QUERIES} query "
            f"vectors (asked {n_queries}); use q_ann_lsh_buckets for the "
            "bucketed scale path")
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    norms = vecs.select(
        "vec_id", "emb", F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"))
    q = norms.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe"),
        F.col("nrm").alias("qn"))
    c = norms.select(F.col("vec_id").alias("cand_id"),
                     F.col("emb").alias("ce"), F.col("nrm").alias("cn"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id",
                F.round(_dot(F.col("qe"), F.col("ce"))
                        / (F.col("qn") * F.col("cn")), 4).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("query_id", "cand_id", "cos", "rnk")
    )


_ANN_BANDS = 4            # hyperplane tables; band t signs dims t*16+1..t*16+8
_ANN_BUCKET_CAP = 100     # skew bound: buckets above this are dropped


def _sign_bucket(dim0: int):
    """8-bit sign-LSH bucket over dims dim0+1..dim0+8 (1-indexed array)."""
    return sum(
        (F.when(F.element_at(F.col("embedding"), dim0 + d + 1) > 0,
                F.lit(1 << d)).otherwise(0) for d in range(8)),
        start=F.lit(0))


def q_ann_lsh_buckets(spark, sf_dir):
    """Multi-band sign-LSH ANN: 4 independent 8-bit hyperplane tables
    (bands over dims 1-8, 17-24, 33-40, 49-56); candidates = union of
    same-(band, bucket) pairs, de-duplicated, then exact cosine top-3 per
    query.  Never all-pairs, and never one table's (N/256)^2 recall/skew
    wall: multiplicity recovers neighbors a single table splits apart,
    while ``_ANN_BUCKET_CAP`` drops degenerate buckets (e.g. all-positive
    regions) so the per-bucket join stays bounded at any N.  The DuckDB
    oracle mirrors bands + cap exactly."""
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", _as_double(F.col("embedding")).alias("emb"),
                    F.col("embedding"))
    norms = vecs.select(
        "vec_id", "emb", "embedding",
        F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"))
    bands = F.array(*[
        F.struct(F.lit(t).alias("band"),
                 _sign_bucket(t * 16).alias("bucket"))
        for t in range(_ANN_BANDS)])
    banded = norms.select(
        "vec_id", F.explode(bands).alias("bb")
    ).select("vec_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    ok_buckets = (
        banded.groupBy("band", "bucket").agg(F.count("*").alias("n"))
        .filter(F.col("n") <= _ANN_BUCKET_CAP)
        .select("band", "bucket")
    )
    capped = banded.join(ok_buckets, ["band", "bucket"], "left_semi")
    qside = capped.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "band", "bucket")
    cside = capped.select(F.col("vec_id").alias("cand_id"), "band", "bucket")
    pairs = (
        qside.join(cside, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id").distinct()
    )
    qv = norms.select(F.col("vec_id").alias("query_id"),
                      F.col("emb").alias("qe"), F.col("nrm").alias("qn"))
    cv = norms.select(F.col("vec_id").alias("cand_id"),
                      F.col("emb").alias("ce"), F.col("nrm").alias("cn"))
    scored = (
        pairs.join(qv, "query_id").join(cv, "cand_id")
        .select("query_id", "cand_id",
                F.round(_dot(F.col("qe"), F.col("ce"))
                        / (F.col("qn") * F.col("cn")), 4).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "cand_id", "cos", "rnk")
    )


def q_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup detection (the dedup variant of ANN):
    multi-band sign-LSH candidates first (never all-pairs — same 4-band
    construction and per-bucket cap as q_ann_lsh_buckets, which bounds
    skew and recovers pairs a single table splits), then exact cosine on
    the de-duplicated candidate pairs; pairs above threshold are
    duplicate candidates."""
    e = load(spark, sf_dir, "embeddings")
    norms = e.select(
        "vec_id", _as_double(F.col("embedding")).alias("emb"),
        F.col("embedding")
    ).select("vec_id", "emb", "embedding",
             F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"))
    bands = F.array(*[
        F.struct(F.lit(t).alias("band"),
                 _sign_bucket(t * 16).alias("bucket"))
        for t in range(_ANN_BANDS)])
    banded = norms.select(
        "vec_id", F.explode(bands).alias("bb")
    ).select("vec_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    ok_buckets = (
        banded.groupBy("band", "bucket").agg(F.count("*").alias("n"))
        .filter(F.col("n") <= _ANN_BUCKET_CAP)
        .select("band", "bucket")
    )
    capped = banded.join(ok_buckets, ["band", "bucket"], "left_semi")
    a = capped.select(F.col("vec_id").alias("vec_a"), "band", "bucket")
    b = capped.select(F.col("vec_id").alias("vec_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b").distinct()
    )
    av = norms.select(F.col("vec_id").alias("vec_a"),
                      F.col("emb").alias("ea"), F.col("nrm").alias("na"))
    bv = norms.select(F.col("vec_id").alias("vec_b"),
                      F.col("emb").alias("eb"), F.col("nrm").alias("nb"))
    return (
        pairs.join(av, "vec_a").join(bv, "vec_b")
        .select("vec_a", "vec_b",
                F.round(_dot(F.col("ea"), F.col("eb"))
                        / (F.col("na") * F.col("nb")), 4).alias("cos"))
        .filter(F.col("cos") >= 0.35)
    )


_IVF_N_QUERIES = 30
_IVF_ITERS = 2       # fixed Lloyd iterations (seeded init => deterministic)
_IVF_CELL_CAP = 128  # per-cell candidate bound (mirrors _ANN_BUCKET_CAP)
_IVF_TRAIN_PER_K = 256  # quantizer training-set bound: min(N, 256·K) rows
# Driver-dict centroid-state bound (the _BRUTE_MAX_QUERIES discipline):
# the trained centroids live as K driver-side rows of (sv, n, ss) — K·dim
# doubles, the volume any centroid broadcast ships.  At K ∝ √N this holds
# to N ~ 10^12 vectors; beyond it the gate below raises with the
# distributed-merge recipe instead of silently ballooning the driver.
_IVF_MAX_DRIVER_K = 1_000_000


def ivf_train_stride(n_total: int, k: int) -> int:
    """Deterministic training-sample stride: the quantizer trains on
    ``vec_id % s == 0`` rows, sized to ≈ min(N, _IVF_TRAIN_PER_K·K).
    With K ∝ √N this caps Lloyd's per-iteration cost at O(256·K·K) =
    O(256·N) distance evaluations instead of O(N·K) = O(N^1.5) — at
    10^10 vectors the difference is ~400× per iteration.  Pure integer
    arithmetic so the DuckDB oracle reproduces it exactly."""
    return max(1, n_total // (_IVF_TRAIN_PER_K * k))


def ivf_cells(spark, sf_dir):
    """Production-shape IVF coarse quantizer: LLOYD'S K-MEANS with
    K ∝ √N cells, seeded deterministic init (the first K training
    vectors), a fixed iteration count, and a BOUNDED training sample —
    returns (vq, cells, K) where ``cells`` maps every vec_id to exactly
    one cell.  ``vq`` is returned UNCACHED (cells is already
    materialized); callers re-derive member columns from the scan.

    Training-set bound (the FAISS discipline): Lloyd's iterations run
    on the deterministic sample ``vec_id % s == 0`` with
    ``s = max(1, N // (256·K))`` (``ivf_train_stride``), then ONE full
    assignment pass maps all N vectors to their cell.  The stride
    predicate is mirrored verbatim in the DuckDB oracle SQL.

    EXACT-ARITHMETIC design (the oracle contract): embeddings quantize
    to integer-valued doubles (round(x·1000)); centroids are kept as
    (component-sum vector ``sv``, member count ``n``) instead of means,
    so the assignment distance compares n²·d² = n²·(q·q) + (sv·sv) −
    2n·(q·sv) divided by n² — every term is an integer below 2^53, every
    double op is exact, and Spark and DuckDB produce bit-identical
    assignments regardless of aggregation order.  That bound is now
    ASSERTED at runtime (max cell size = N, max qq measured from the
    data), not assumed.  Cluster plan (the FAISS shape): centroid state
    is K driver-side rows (K·dim doubles — what any centroid broadcast
    ships; GATED at ``_IVF_MAX_DRIVER_K`` — beyond it the code raises
    with the distributed-merge recipe rather than silently ballooning
    the driver); each assignment is a
    ZERO-SHUFFLE Arrow mapInPandas kernel — one BLAS matmul + argmin
    per batch against the broadcast centroid matrix; the centroid
    update is a single fixed-width (count + per-dimension sum) partial
    aggregate whose K result rows collect straight back to the driver —
    ONE distributed job per iteration, one thin exchange inside it.
    Empty cells keep their previous centroid (dict-merge semantics)."""
    import math

    e = load(spark, sf_dir, "embeddings")
    vq = (
        e.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
        .select("vec_id", "emb",
                F.sqrt(_dot(F.col("emb"), F.col("emb"))).alias("nrm"),
                F.transform("emb", lambda x: F.round(x * 1000)).alias("qe"))
        .withColumn("qq", _dot(F.col("qe"), F.col("qe")))
    ).cache()
    # one job: materializes the cache AND yields N + max(qq) + the
    # embedding dim for the K sizing, the exact-arithmetic guard and the
    # fixed-width centroid-update aggregate
    row = vq.groupBy().agg(F.count("*").alias("n"),
                           F.max("qq").alias("max_qq"),
                           F.max(F.size("qe")).alias("dim"),
                           F.max("vec_id").alias("max_vid")).first()
    n_total, max_qq, dim = row["n"], row["max_qq"] or 0.0, row["dim"] or 0
    max_vid = row["max_vid"] if row["max_vid"] is not None else -1
    k = max(4, math.isqrt(n_total))
    if k > _IVF_MAX_DRIVER_K:
        raise ValueError(
            f"IVF K={k} exceeds _IVF_MAX_DRIVER_K={_IVF_MAX_DRIVER_K}: "
            "centroid state is a driver-side dict (K·dim doubles) and "
            "would balloon the driver — move the centroid merge to a "
            "distributed join (keep centroids as a table, join the "
            "per-cell partial aggregate back instead of collect()) or "
            "lower K")
    # Exactness guard: every term of the assignment distance is an
    # integer bounded by 2·N²·max(qq) — n²·qq ≤ N²·mq; ss = |sv|² ≤
    # N²·mq (sv sums ≤ N quantized vectors); |2n·(qe·sv)| ≤
    # 2N·√(mq)·√(ss) ≤ 2N²·mq (Cauchy-Schwarz) — so requiring
    # N²·max(qq) < 2^52 keeps every term and every partial sum (in any
    # summation order, BLAS included) below 2^53, where doubles are
    # exact integers.  If the bound fails the bit-identical-to-DuckDB
    # contract silently breaks, so fail LOUDLY instead (inputs this
    # large need a smaller quantization scale or a per-cell n bound).
    if n_total * n_total * max_qq >= 2.0 ** 52:
        raise ValueError(
            f"IVF exact-arithmetic bound violated: N²·max(qq) = "
            f"{n_total * n_total * max_qq:.3e} ≥ 2^52; DuckDB-parity is "
            "no longer guaranteed — reduce the quantization scale")
    stride = ivf_train_stride(n_total, k)
    # The deterministic id-stride sample (vec_id % s == 0) assumes DENSE
    # CONTIGUOUS vec_ids 0..N-1 — the predicate pushes to the parquet scan
    # (zero-shuffle; a row_number-based sample would cost a full sort at
    # 10^10 rows), but on gapped ids it silently under-samples or comes
    # back empty.  Assert the assumption instead of assuming it (max_vid
    # rides in the same sizing job).  stride == 1 trains on everything,
    # so gapped ids are fine there (the order-based init handles them).
    if stride > 1 and max_vid != n_total - 1:
        raise ValueError(
            f"IVF training stride {stride} requires dense contiguous "
            f"vec_ids 0..N-1 (max vec_id {max_vid}, N {n_total}): the "
            "vec_id % stride sample would be skewed or empty — "
            "re-densify vec_ids or lower _IVF_TRAIN_PER_K")
    vt = (vq.filter(F.col("vec_id") % stride == 0).cache()
          if stride > 1 else vq)

    import numpy as np

    def assign(vecs, cents, with_qe=False):
        # FAISS-shape assignment: the K trained centroids (driver-side
        # dict cent_id -> (sv, n, ss)) ride to executors as a numpy
        # matrix inside an Arrow mapInPandas kernel: scores =
        # (n²·qq + ss − 2n·(Q @ Cᵀ)) / n² via one BLAS matmul per batch,
        # argmin per row — ZERO shuffle and vectorized, where the
        # previous row_number-window / min_by-groupBy shapes paid a
        # shuffle of N rows per round and evaluated N·K interpreted HOF
        # dot products (measured as the bulk of the old 4 s wall).
        # Exactness survives BLAS's blocked summation: every product and
        # every partial sum is an integer whose magnitude stays under
        # 2^53 (the 2^52 guard above), so any summation order yields the
        # same double.  np.argmin takes the FIRST minimum and ids are
        # sorted ascending — ties break to the lowest cent_id, matching
        # the oracle's (score, cent_id) order.
        ids = np.asarray(sorted(cents), dtype=np.int64)
        C = np.asarray([cents[i][0] for i in ids], dtype=np.float64)
        nn = np.asarray([cents[i][1] for i in ids], dtype=np.float64)
        ssv = np.asarray([cents[i][2] for i in ids], dtype=np.float64)
        n2 = nn * nn
        out_schema = ("vec_id long, cell long"
                      + (", qe array<double>" if with_qe else ""))

        def fn(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                Q = np.vstack(pdf["qe"].to_numpy())
                qq = pdf["qq"].to_numpy(dtype=np.float64)
                scores = (n2[None, :] * qq[:, None] + ssv[None, :]
                          - 2.0 * nn[None, :] * (Q @ C.T)) / n2[None, :]
                out = {"vec_id": pdf["vec_id"].to_numpy(),
                       "cell": ids[np.argmin(scores, axis=1)]}
                if with_qe:
                    out["qe"] = pdf["qe"]
                yield pd.DataFrame(out)

        return vecs.select("vec_id", "qq", "qe").mapInPandas(
            fn, schema=out_schema)

    # seeded init: the first K training vectors BY ORDER (orderBy+limit,
    # not a `vec_id < k·stride` id predicate — that shape silently under-
    # seeds when vec_ids are sparse/gapped; order-based init yields
    # exactly min(K, |sample|) centroids for ANY id distribution, and is
    # identical to the predicate on contiguous ids, so oracle parity
    # holds).  ONE tiny collect off the cached sample (centroid state
    # lives on the driver between rounds; K·dim doubles, the same volume
    # any centroid broadcast ships — bounded by _IVF_MAX_DRIVER_K above).
    cents = {
        r["vec_id"]: (list(r["qe"]), 1.0, r["qq"])
        for r in vt.orderBy("vec_id").limit(k)
        .select("vec_id", "qe", "qq").collect()
    }
    if not cents:
        raise ValueError(
            "IVF: empty training sample — the embeddings table has no "
            "rows, so no init centroids exist (an empty centroid matrix "
            "would crash the assignment kernel with an opaque numpy "
            "shape error)")
    for _ in range(_IVF_ITERS):
        # ONE distributed job per Lloyd round: zero-shuffle assignment
        # (qe rides through, constant per vec_id) into a fixed-width
        # per-cell partial aggregate — count plus one SUM per dimension
        # (dim is a data constant measured in the sizing job) — whose K
        # result rows collect straight back into the driver-side state.
        # Untouched dict keys ARE the empty-cell carry.
        upd = (assign(vt, cents, with_qe=True)
               .groupBy("cell").agg(
                   F.count("*").cast("double").alias("n1"),
                   F.array(*[F.sum(F.element_at("qe", i + 1))
                             for i in range(dim)]).alias("sv1"))
               .collect())
        for r in upd:
            sv1 = list(r["sv1"])
            # ss = |sv|²: left-to-right sum of exact integer doubles
            cents[r["cell"]] = (sv1, float(r["n1"]),
                                sum(a * a for a in sv1))
    # ONE full-N assignment pass against the trained centroids
    cells = assign(vq, cents).select("vec_id", "cell").localCheckpoint()
    # cells is materialized — release the cached working sets so repeated
    # harness invocations don't accumulate storage for the session life
    if stride > 1:
        vt.unpersist()
    vq.unpersist()
    return vq, cells, k


def q_ann_ivf_topk(spark, sf_dir):
    """IVF ANN over the k-means coarse quantizer (``ivf_cells``): each
    query searches ONLY its own cell, and the per-cell candidate list is
    capped at ``_IVF_CELL_CAP`` members (rank by vec_id — the
    ``_ANN_BUCKET_CAP`` discipline), so candidate volume per query is
    min(N/K, cap), never all-pairs.  Exact cosine top-3 within the cell
    on the original double embeddings."""
    vq, cells, _ = ivf_cells(spark, sf_dir)
    member = vq.select("vec_id", "emb", "nrm").join(cells, "vec_id")
    w_cap = Window.partitionBy("cell").orderBy("vec_id")
    capped = (member.withColumn("__mr", F.row_number().over(w_cap))
              .filter(F.col("__mr") <= _IVF_CELL_CAP).drop("__mr"))
    qside = member.filter(F.col("vec_id") < _IVF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "cell",
        F.col("emb").alias("qe2"), F.col("nrm").alias("qn"))
    cside = capped.select(F.col("vec_id").alias("cand_id"), "cell",
                          F.col("emb").alias("ce2"),
                          F.col("nrm").alias("cn2"))
    scored = (
        qside.join(cside, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id",
                F.round(_dot(F.col("qe2"), F.col("ce2"))
                        / (F.col("qn") * F.col("cn2")), 4).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "cand_id", "cos", "rnk")
    )


def q_text_quality(spark, sf_dir):
    """Quality scoring: token count, mean token length, stopword ratio,
    uppercase ratio — the corpus-filtering primitive."""
    d = load(spark, sf_dir, "documents")
    toks = _words(F.col("text"))
    stop = F.size(F.filter(toks, lambda w: w.isin("the", "a", "of", "and")))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round((F.length("text") - F.size(toks) + 1)
                / F.size(toks), 4).alias("mean_tok_len"),
        F.round(stop / F.size(toks), 4).alias("stopword_ratio"),
    )


def q_lang_id(spark, sf_dir):
    """Marker-based language scoring (n-gram-heuristic shape): per doc the
    count of per-language marker tokens + the argmax language."""
    d = load(spark, sf_dir, "documents")
    toks = _words(F.col("text"))
    en = F.size(F.filter(toks, lambda w: w.isin("the", "a", "of")))
    tech = F.size(F.filter(toks, lambda w: w.isin("spark", "sql", "query")))
    return d.select(
        "doc_id",
        en.alias("en_markers"),
        tech.alias("tech_markers"),
        F.when(en >= tech, F.lit("en_like")).otherwise(F.lit("tech_like"))
        .alias("guess"),
    )


def q_token_count_bpe(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish regex pieces."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_words(F.col("text"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(
            F.col("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), F.lit(0)))
        .alias("bpe_pieces"),
    )


def q_doc_fingerprint(spark, sf_dir):
    """Positional rolling-hash document fingerprint (content drift
    detection): sum over words of (md5_long(w) % 1e6) * (pos % 997)."""
    d = load(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        F.posexplode(_words(F.col("text"))).alias("pos", "w"))
    return (
        pos.select("doc_id",
                   ((_md5_long(F.col("w")) % 1000000)
                    * ((F.col("pos") + 1) % 997)).alias("t"))
        .groupBy("doc_id")
        .agg((F.sum("t") % 2147483647).alias("fingerprint"))
    )


# =========================================================================
# oracle SQL (DuckDB) — one per query above
# =========================================================================
_ORACLES: dict[str, str] = {
    "url_canonicalize": """
        SELECT o_orderkey AS okey,
               'https://auto.ria.test/search/?countpage=100&page=' || o_orderkey AS url_norm,
               'auto.ria.test' AS host,
               o_orderkey::INT AS page_no
        FROM orders
    """,
    "url_next_page": """
        SELECT o_orderkey AS okey,
               'https://auto.ria.test/search/?countpage=100&page=' ||
               ((o_orderkey % 50) + 1) AS next_url
        FROM orders
    """,
    "phone_normalize": """
        WITH raw AS (
          SELECT c_custkey AS ckey,
                 CASE
                   WHEN c_custkey % 3 = 0 THEN
                     '(0' || (50 + c_custkey % 48) || ') ' ||
                     (100 + c_custkey % 900) || '-' || (10 + c_custkey % 90)
                     || '-' || (10 + (c_custkey * 3) % 90)
                   WHEN c_custkey % 3 = 1 THEN
                     '380' || (500000000 + c_custkey % 400000000)
                   ELSE 'ext. ' || (c_custkey % 1000)
                 END AS phone_raw
          FROM customer
        ), d AS (
          SELECT ckey, phone_raw, regexp_replace(phone_raw, '[^0-9]', '', 'g') AS dg
          FROM raw
        )
        SELECT ckey, phone_raw,
               CASE
                 WHEN dg LIKE '0%' AND length(dg) >= 10 THEN '+380' || substr(dg, 2)
                 WHEN dg LIKE '380%' AND length(dg) >= 12 THEN '+' || dg
                 ELSE '+' || dg
               END AS phone_number
        FROM d
    """,
    "extract_fields": """
        SELECT o_orderkey AS okey,
               'Order ' || o_orderkey AS title,
               floor(o_totalprice)::INT AS price_usd,
               ((o_orderkey % 300) * 1000)::INT AS odometer,
               (CASE WHEN o_orderkey % 5 <> 0 THEN 2 + o_orderkey % 40
                     ELSE 1 END)::INT AS images_count,
               'AB' || (1000 + o_orderkey % 9000) || 'CK' AS car_number
        FROM orders
    """,
    "first_occurrence_dedup": """
        SELECT l_partkey AS partkey,
               l_orderkey AS first_orderkey,
               l_linenumber AS first_linenumber
        FROM lineitem
        QUALIFY row_number() OVER (PARTITION BY l_partkey
                                   ORDER BY l_orderkey, l_linenumber) = 1
    """,
    "seen_anti_join": """
        SELECT c_custkey AS ckey, c_name AS name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "politeness_topk": """
        SELECT event_type, event_id
        FROM events
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id) <= 5
    """,
    "vin_dedup": """
        SELECT l_suppkey AS suppkey, l_orderkey AS kept_orderkey,
               round(l_extendedprice, 2) AS kept_price
        FROM lineitem
        QUALIFY row_number() OVER (PARTITION BY l_suppkey
                                   ORDER BY l_orderkey, l_linenumber) = 1
    """,
    "robots_gate": """
        WITH u AS (
          SELECT o_orderkey AS okey,
                 'h' || (o_orderkey % 10) AS host,
                 CASE o_orderkey % 5
                   WHEN 0 THEN '/a/x' || o_orderkey
                   WHEN 1 THEN '/a/private/x' || o_orderkey
                   WHEN 2 THEN '/b/x' || o_orderkey
                   WHEN 3 THEN '/c/priv/x' || o_orderkey
                   ELSE '/a/privatex' || o_orderkey END AS path
          FROM orders
        ), r(host, p, allowed) AS (
          VALUES ('h0','/a',TRUE), ('h0','/a/private',FALSE),
                 ('h0','/c',FALSE),
                 ('h1','/a',TRUE), ('h1','/a/private',FALSE),
                 ('h1','/c',FALSE),
                 ('h2','/a',TRUE), ('h2','/a/private',FALSE),
                 ('h2','/c',FALSE),
                 ('h3','/b',FALSE),
                 ('h4','/',TRUE), ('h4','/a/priv',FALSE)
        ), j AS (
          SELECT u.okey, u.host, u.path, r.p, r.allowed,
                 COALESCE(length(r.p), -1) AS pl
          FROM u LEFT JOIN r
            ON u.host = r.host AND starts_with(u.path, r.p)
        ), v AS (
          SELECT okey, host, path, COALESCE(allowed, TRUE) AS a
          FROM j
          QUALIFY row_number() OVER (PARTITION BY okey
                                     ORDER BY pl DESC, p) = 1
        )
        SELECT okey, 'https://' || host || path AS url_norm, host
        FROM v WHERE a
    """,
    "url_car_id": """
        WITH u AS (
          SELECT o_orderkey AS okey,
                 CASE WHEN o_orderkey % 3 = 0
                      THEN 'https://auto.ria.test/search/?page=1'
                      ELSE 'https://auto.ria.test/auto_model'
                           || (o_orderkey % 7) || '_'
                           || (10000 + o_orderkey) || '.html' END AS url
          FROM orders
        )
        SELECT okey, url,
               regexp_extract(url, '/auto_\\w+_(\\d+)\\.html', 1) AS car_id
        FROM u
    """,
    "crawl_metrics": """
        SELECT event_type, count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "tpch_pricing": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "nation_revenue": """
        SELECT n_name AS nation, round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "dedup_exact": """
        SELECT doc_id, md5(text) AS content_md5
        FROM documents
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """,
    "minhash_signatures": """
        WITH words AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), sh AS (
          SELECT doc_id, ws[i::INT] || ' ' || ws[i::INT + 1] || ' ' ||
                 ws[i::INT + 2] AS shingle
          FROM words, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
        ), sh2 AS (
          SELECT doc_id, md5(shingle) AS d1, md5('x' || shingle) AS d2
          FROM sh
        ), seeded AS (
          SELECT doc_id, j::INT AS j,
                 ('0x' || substr(CASE WHEN j < 4 THEN d1 ELSE d2 END,
                                 (j % 4) * 8 + 1, 8))::BIGINT AS h
          FROM sh2, unnest(generate_series(0, 7)) AS s(j)
        )
        SELECT doc_id, j, min(h) AS minhash FROM seeded GROUP BY doc_id, j
    """,
    "lsh_candidate_pairs": """
        WITH words AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), sh AS (
          SELECT doc_id, ws[i::INT] || ' ' || ws[i::INT + 1] || ' ' ||
                 ws[i::INT + 2] AS shingle
          FROM words, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS t(i)
        ), sh2 AS (
          SELECT doc_id, md5(shingle) AS d1, md5('x' || shingle) AS d2
          FROM sh
        ), seeded AS (
          SELECT doc_id, j::INT AS j,
                 ('0x' || substr(CASE WHEN j < 4 THEN d1 ELSE d2 END,
                                 (j % 4) * 8 + 1, 8))::BIGINT AS h
          FROM sh2, unnest(generate_series(0, 7)) AS s(j)
        ), sig AS (
          SELECT doc_id, j, min(h) AS minhash FROM seeded GROUP BY doc_id, j
        ), bands AS (
          SELECT doc_id, (j // 2)::INT AS band,
                 md5(string_agg(j || '=' || minhash, ',' ORDER BY j || '=' || minhash))
                 AS band_key
          FROM sig GROUP BY doc_id, (j // 2)::INT
        ), ok_buckets AS (
          SELECT band, band_key FROM bands
          GROUP BY band, band_key HAVING count(*) <= 100
        ), capped AS (
          SELECT bands.* FROM bands
          JOIN ok_buckets USING (band, band_key)
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM capped a JOIN capped b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    """,
    "simhash": """
        WITH wh AS (
          SELECT doc_id,
                 ('0x' || substr(md5(w), 1, 8))::BIGINT AS h_lo,
                 ('0x' || substr(md5(w), 9, 8))::BIGINT AS h_hi
          FROM documents, unnest(string_split(text, ' ')) AS t(w)
        ), votes AS (
          SELECT doc_id, b::INT AS b,
                 sum(CASE WHEN
                       (CASE WHEN b::INT < 32 THEN h_lo >> b::INT
                             ELSE h_hi >> (b::INT - 32) END) & 1 = 1
                     THEN 1 ELSE -1 END) AS v
          FROM wh, unnest(generate_series(0, 63)) AS s(b)
          GROUP BY doc_id, b::INT
        )
        SELECT doc_id,
               bit_or(CASE WHEN v > 0 AND b >= 32
                           THEN (1::BIGINT << (b - 32)) ELSE 0 END)::BIGINT
                 AS simhash_hi,
               bit_or(CASE WHEN v > 0 AND b < 32
                           THEN (1::BIGINT << b) ELSE 0 END)::BIGINT
                 AS simhash_lo
        FROM votes GROUP BY doc_id
    """,
    "jaccard_near_dup": """
        WITH wd_all AS (
          SELECT DISTINCT source, doc_id, w
          FROM documents, unnest(string_split(text, ' ')) AS t(w)
        ), rare AS (
          SELECT source, w FROM wd_all
          GROUP BY source, w HAVING count(*) <= 100
        ), wd AS (
          SELECT wd_all.* FROM wd_all JOIN rare USING (source, w)
        ), sizes AS (
          SELECT doc_id, count(*) AS n FROM wd GROUP BY doc_id
        ), common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
          FROM wd a JOIN wd b ON a.source = b.source AND a.w = b.w
           AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(c / (na.n + nb.n - c), 4) AS jaccard
        FROM common
        JOIN sizes na ON na.doc_id = doc_a
        JOIN sizes nb ON nb.doc_id = doc_b
        WHERE round(c / (na.n + nb.n - c), 4) >= 0.5
    """,
    "cosine_topk": """
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS nrm
          FROM embeddings
        ), scored AS (
          SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                 round(list_dot_product(q.emb, c.emb) / (q.nrm * c.nrm), 4) AS cos
          FROM v q, v c
          WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
        )
        SELECT query_id, cand_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, cand_id) AS rnk
        FROM scored
        QUALIFY rnk <= 5
    """,
    "ann_lsh_buckets": None,  # generated below (4 bands x 8 sign bits)
    "embedding_near_dup": None,  # generated below (banded, capped)
    "ann_ivf_topk": None,        # generated below (coarse-quantizer cells)
    "text_quality": """
        WITH t AS (
          SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
        )
        SELECT doc_id, len(ws) AS n_tokens,
               round((length(text) - len(ws) + 1) * 1.0 / len(ws), 4)
                 AS mean_tok_len,
               round(len(list_filter(ws, w -> w IN ('the','a','of','and')))
                     * 1.0 / len(ws), 4) AS stopword_ratio
        FROM t
    """,
    "lang_id": """
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        )
        SELECT doc_id,
               len(list_filter(ws, w -> w IN ('the','a','of'))) AS en_markers,
               len(list_filter(ws, w -> w IN ('spark','sql','query')))
                 AS tech_markers,
               CASE WHEN len(list_filter(ws, w -> w IN ('the','a','of')))
                         >= len(list_filter(ws, w -> w IN ('spark','sql','query')))
                    THEN 'en_like' ELSE 'tech_like' END AS guess
        FROM t
    """,
    "token_count_bpe": """
        SELECT doc_id,
               len(string_split(text, ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
                 AS bpe_pieces
        FROM documents
    """,
    "doc_fingerprint": """
        WITH pos AS (
          SELECT doc_id, ws[i::INT] AS w, i::INT AS pos1
          FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               unnest(generate_series(1, len(ws))) AS t(i)
        )
        SELECT doc_id,
               (sum((('0x' || substr(md5(w), 1, 15))::BIGINT % 1000000)
                    * (pos1 % 997)) % 2147483647)::BIGINT AS fingerprint
        FROM pos GROUP BY doc_id
    """,
}

# dedup_components oracle: REUSE the lsh_candidate_pairs CTE chain
# verbatim as a `pairs` CTE, then compute component labels by recursive
# reachability (min reachable doc_id == the min-label fixed point the
# Spark propagation converges to).
_LSH_BODY = _ORACLES["lsh_candidate_pairs"].strip()
assert _LSH_BODY.startswith("WITH ")
_ORACLES["dedup_components"] = (
    "WITH RECURSIVE "
    + _LSH_BODY[len("WITH "):_LSH_BODY.index("SELECT DISTINCT")].rstrip()
    .rstrip(")").rstrip() + "\n        ), pairs AS (\n          "
    + _LSH_BODY[_LSH_BODY.index("SELECT DISTINCT"):].strip()
    + """
        ), edges AS (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM pairs
        ), walk(doc_id, reach) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT w.doc_id, e.dst FROM walk w
          JOIN edges e ON e.src = w.reach
        )
        SELECT doc_id, min(reach) AS component
        FROM walk GROUP BY doc_id
    """)


def _bucket_sql(dim0: int) -> str:
    """DuckDB mirror of _sign_bucket (1-indexed list access)."""
    return " + ".join(
        f"(CASE WHEN embedding[{dim0 + d + 1}] > 0 THEN {1 << d} ELSE 0 END)"
        for d in range(8))


def _ann_oracle_sql() -> str:
    bands_union = "\n          UNION ALL ".join(
        f"SELECT vec_id, {t} AS band, b{t} AS bucket FROM v"
        for t in range(_ANN_BANDS))
    bucket_cols = ",\n                 ".join(
        f"{_bucket_sql(t * 16)} AS b{t}" for t in range(_ANN_BANDS))
    return f"""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS nrm,
                 {bucket_cols}
          FROM embeddings
        ), banded AS (
          {bands_union}
        ), ok AS (
          SELECT band, bucket FROM banded
          GROUP BY band, bucket HAVING count(*) <= {_ANN_BUCKET_CAP}
        ), capped AS (
          SELECT banded.* FROM banded JOIN ok USING (band, bucket)
        ), pairs AS (
          SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cand_id
          FROM capped q JOIN capped c USING (band, bucket)
          WHERE q.vec_id < 50 AND q.vec_id <> c.vec_id
        ), scored AS (
          SELECT query_id, cand_id,
                 round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4)
                   AS cos
          FROM pairs
          JOIN v a ON a.vec_id = query_id
          JOIN v b ON b.vec_id = cand_id
        )
        SELECT query_id, cand_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, cand_id) AS rnk
        FROM scored
        QUALIFY rnk <= 3
    """


def _banded_cte() -> str:
    bands_union = "\n          UNION ALL ".join(
        f"SELECT vec_id, {t} AS band, b{t} AS bucket FROM v"
        for t in range(_ANN_BANDS))
    bucket_cols = ",\n                 ".join(
        f"{_bucket_sql(t * 16)} AS b{t}" for t in range(_ANN_BANDS))
    return f"""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS nrm,
                 {bucket_cols}
          FROM embeddings
        ), banded AS (
          {bands_union}
        ), ok AS (
          SELECT band, bucket FROM banded
          GROUP BY band, bucket HAVING count(*) <= {_ANN_BUCKET_CAP}
        ), capped AS (
          SELECT banded.* FROM banded JOIN ok USING (band, bucket)
        )"""


def _near_dup_oracle_sql() -> str:
    return _banded_cte() + """
        , pairs AS (
          SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
          FROM capped a JOIN capped b USING (band, bucket)
          WHERE a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b,
               round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4)
                 AS cos
        FROM pairs
        JOIN v a ON a.vec_id = vec_a
        JOIN v b ON b.vec_id = vec_b
        WHERE round(list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm), 4)
              >= 0.35
    """


def _ivf_oracle_sql() -> str:
    """DuckDB mirror of the k-means IVF: the same seeded init, the same
    deterministic training stride (``vec_id % s == 0`` with
    ``s = max(1, N // (256·K))`` — ``ivf_train_stride``), the same
    ``_IVF_ITERS`` Lloyd iterations over the SAMPLE in the same exact
    integer-in-double arithmetic (see ivf_cells — every term < 2^53, so
    aggregation order cannot perturb a single bit), then the same
    full-set final assignment, cell cap and search.  The QUALIFY
    row_number tie-break (score, cent_id) equals Spark's
    min_by-on-struct(score, cent_id) ordering exactly because scores
    are bit-identical."""

    def _score(c_alias: str, v_alias: str) -> str:
        return (f"({c_alias}.n*{c_alias}.n*{v_alias}.qq + {c_alias}.ss"
                f" - 2*{c_alias}.n*list_dot_product({v_alias}.qe,"
                f" {c_alias}.sv)) / ({c_alias}.n*{c_alias}.n)")

    def _assign(name: str, cents: str, vecs: str) -> str:
        return f"""
        , {name} AS (
          SELECT vec_id, cent_id AS cell FROM (
            SELECT {vecs}.vec_id, c.cent_id,
                   {_score('c', vecs)} AS score
            FROM {vecs} CROSS JOIN {cents} c)
          QUALIFY row_number() OVER (PARTITION BY vec_id
                                     ORDER BY score, cent_id) = 1
        )"""

    sql = f"""
        WITH vq AS (
          SELECT vec_id, embedding::DOUBLE[] AS emb,
                 sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])) AS nrm,
                 list_transform(embedding::DOUBLE[],
                                x -> round(x * 1000)) AS qe
          FROM embeddings
        ), vv AS (
          SELECT vq.*, list_dot_product(qe, qe) AS qq FROM vq
        ), kk AS (
          SELECT GREATEST(4, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS k,
                 COUNT(*) AS n
          FROM embeddings
        ), st AS (
          SELECT k, GREATEST(1, n // ({_IVF_TRAIN_PER_K} * k)) AS s FROM kk
        ), vt AS (
          SELECT vv.* FROM vv, st WHERE vec_id % st.s = 0
        ), c0 AS (
          -- first K training vectors BY ORDER (mirrors the Spark
          -- orderBy+limit init exactly; robust to gapped vec_ids)
          SELECT vec_id AS cent_id, qe AS sv, 1.0 AS n, qq AS ss
          FROM vt, st
          QUALIFY row_number() OVER (ORDER BY vec_id) <= st.k
        )"""
    for i in range(1, _IVF_ITERS + 1):
        sql += _assign(f"asg{i}", f"c{i - 1}", "vt")
        sql += f"""
        , sums{i} AS (
          SELECT a.cell, t.i::INT AS pos, SUM(vt.qe[t.i::INT]) AS s
          FROM asg{i} a JOIN vt USING (vec_id),
               unnest(generate_series(1, len(vt.qe))) AS t(i)
          GROUP BY 1, 2
        ), sv{i} AS (
          SELECT cell, list(s ORDER BY pos) AS sv1 FROM sums{i}
          GROUP BY cell
        ), nn{i} AS (
          SELECT cell, COUNT(*)::DOUBLE AS n1 FROM asg{i} GROUP BY cell
        ), c{i} AS (
          SELECT c.cent_id,
                 COALESCE(s.sv1, c.sv) AS sv,
                 COALESCE(n.n1, c.n) AS n,
                 list_dot_product(COALESCE(s.sv1, c.sv),
                                  COALESCE(s.sv1, c.sv)) AS ss
          FROM c{i - 1} c
          LEFT JOIN sv{i} s ON s.cell = c.cent_id
          LEFT JOIN nn{i} n ON n.cell = c.cent_id
        )"""
    sql += _assign("cells", f"c{_IVF_ITERS}", "vv")
    sql += f"""
        , member AS (
          SELECT vv.vec_id, vv.emb, vv.nrm, cells.cell
          FROM vv JOIN cells USING (vec_id)
        ), capped AS (
          SELECT * FROM member
          QUALIFY row_number() OVER (PARTITION BY cell ORDER BY vec_id)
                  <= {_IVF_CELL_CAP}
        ), scored AS (
          SELECT q.vec_id AS query_id, t.vec_id AS cand_id,
                 round(list_dot_product(q.emb, t.emb) / (q.nrm * t.nrm), 4)
                   AS cos
          FROM member q JOIN capped t
            ON q.cell = t.cell AND q.vec_id <> t.vec_id
          WHERE q.vec_id < {_IVF_N_QUERIES}
        )
        SELECT query_id, cand_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, cand_id) AS rnk
        FROM scored
        QUALIFY rnk <= 3
    """
    return sql


_ORACLES["ann_lsh_buckets"] = _ann_oracle_sql()
_ORACLES["embedding_near_dup"] = _near_dup_oracle_sql()
_ORACLES["ann_ivf_topk"] = _ivf_oracle_sql()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_canonicalize": q_url_canonicalize,
        "url_next_page": q_url_next_page,
        "phone_normalize": q_phone_normalize,
        "extract_fields": q_extract_fields,
        "first_occurrence_dedup": q_first_occurrence_dedup,
        "seen_anti_join": q_seen_anti_join,
        "politeness_topk": q_politeness_topk,
        "vin_dedup": q_vin_dedup,
        "robots_gate": q_robots_gate,
        "url_car_id": q_url_car_id,
        "crawl_metrics": q_crawl_metrics,
        "events_hourly": q_events_hourly,
        "tpch_pricing": q_tpch_pricing,
        "nation_revenue": q_nation_revenue,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidate_pairs": q_lsh_candidate_pairs,
        "dedup_components": q_dedup_components,
        "simhash": q_simhash,
        "jaccard_near_dup": q_jaccard_near_dup,
        "cosine_topk": q_cosine_topk,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "token_count_bpe": q_token_count_bpe,
        "doc_fingerprint": q_doc_fingerprint,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
