"""Scale-shape tests for the training-data queries: the properties that
keep them viable at 100 TB (bounded bucket sizes, capped token document
frequency, full-width fingerprints) — complementing the driver's DuckDB
value-equality gate."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from auto_ria_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_ann_multiband_bucket_sizes_bounded(spark):
    """Sign-LSH ANN must never concentrate: after the per-bucket cap, no
    (band, bucket) group exceeds _ANN_BUCKET_CAP, and all bands exist."""
    e = Q.load(spark, SF, "embeddings")
    vecs = e.select("vec_id", "embedding")
    bands = F.array(*[
        F.struct(F.lit(t).alias("band"),
                 Q._sign_bucket(t * 16).alias("bucket"))
        for t in range(Q._ANN_BANDS)])
    banded = vecs.select("vec_id", F.explode(bands).alias("bb")) \
        .select("vec_id", "bb.band", "bb.bucket")
    counts = banded.groupBy("band", "bucket").count()
    capped = counts.filter(F.col("count") <= Q._ANN_BUCKET_CAP)
    assert capped.agg(F.max("count")).first()[0] <= Q._ANN_BUCKET_CAP
    assert banded.select("band").distinct().count() == Q._ANN_BANDS
    # the query itself still returns ranked rows under the cap
    out = Q.q_ann_lsh_buckets(spark, SF)
    assert out.filter(F.col("rnk") > 3).count() == 0
    assert out.count() > 0


def test_lsh_band_buckets_capped(spark):
    """MinHash-LSH band buckets entering the candidate self-join must not
    exceed _LSH_BUCKET_CAP (the mass-duplicate-cluster n² guard): after
    the semi-join cap, every (band, band_key) group is bounded, so the
    per-bucket pair count is bounded by cap·(cap−1)/2."""
    sig = Q.q_minhash_signatures(spark, SF)
    bands = (
        sig.withColumn("band", (F.col("j") / 2).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws(",", F.sort_array(F.collect_list(
            F.concat(F.col("j").cast("string"), F.lit("="),
                     F.col("minhash").cast("string")))))).alias("band_key")))
    ok = (bands.groupBy("band", "band_key").agg(F.count("*").alias("n"))
          .filter(F.col("n") <= Q._LSH_BUCKET_CAP).select("band", "band_key"))
    capped = bands.join(ok, ["band", "band_key"], "left_semi")
    mx = (capped.groupBy("band", "band_key").agg(F.count("*").alias("n"))
          .agg(F.max("n")).first()[0])
    assert mx <= Q._LSH_BUCKET_CAP
    # the query still yields pairs under the cap
    assert Q.q_lsh_candidate_pairs(spark, SF).count() > 0


def test_dedup_components_pairs_share_labels(spark):
    """Connected components over the LSH pair graph: every candidate
    pair must land in the same component, every label is the component's
    minimum member, and isolated docs label themselves."""
    labels = {r.doc_id: r.component
              for r in Q.q_dedup_components(spark, SF).collect()}
    pairs = Q.q_lsh_candidate_pairs(spark, SF).collect()
    assert pairs, "world should contain near-dup pairs"
    for p in pairs:
        assert labels[p.doc_a] == labels[p.doc_b]
    assert all(c <= d for d, c in labels.items())
    # labels are real members
    assert all(c in labels for c in set(labels.values()))


def test_components_long_chain_converges_logarithmically(spark):
    """Worst-case components graph: a 200-link CHAIN (diameter 200 — far
    beyond any real near-dup cluster).  Plain min-label propagation needs
    ~200 rounds; the pointer-jumping core must converge within O(log n)
    rounds (<= 12 for n=200) and still produce exact min-labels."""
    n = 200
    nodes = spark.range(n).select(F.col("id").alias("doc_id"),
                                  F.col("id").alias("component"))
    half = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels, rounds = Q.connected_components(nodes, edges, max_iters=15)
    assert rounds <= 12, f"chain of {n} took {rounds} rounds"
    got = labels.agg(F.min("component"), F.max("component"),
                     F.countDistinct("component")).first()
    assert got == (0, 0, 1)          # one component, labeled by min id


def test_components_unconverged_raises(spark):
    """Exhausting max_iters must raise, never return partial labels
    silently (a >max_iters-diameter graph would mislabel otherwise)."""
    import pytest

    n = 64
    nodes = spark.range(n).select(F.col("id").alias("doc_id"),
                                  F.col("id").alias("component"))
    half = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    with pytest.raises(RuntimeError, match="did not converge"):
        Q.connected_components(nodes, edges, max_iters=2)


def test_jaccard_join_side_df_capped(spark):
    """No token entering the inverted-index self-join may have document
    frequency above the cap (the quadratic-blowup guard)."""
    d = Q.load(spark, SF, "documents")
    wd = d.select(
        "source", "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("w"))
    dfs = wd.groupBy("source", "w").agg(F.count("*").alias("df"))
    rare = dfs.filter(F.col("df") <= Q._JACCARD_DF_CAP)
    joined = wd.join(rare.select("source", "w"), ["source", "w"],
                     "left_semi")
    mx = (joined.groupBy("source", "w").agg(F.count("*").alias("df"))
          .agg(F.max("df")).first()[0])
    assert mx <= Q._JACCARD_DF_CAP


def test_vin_dedup_plan_routes_nulls_around_window(spark):
    """Skew audit: the VIN-dedup physical plan must filter
    isnotnull(car_vin) BEFORE the shuffle (null-VIN rows bypass it
    entirely, preserved verbatim by the Union arm) — and since r7 the
    dedup itself is a min_by AGGREGATE, not a window: the exchange sits
    above a partial aggregate, so duplicates collapse map-side and no
    per-partition sort exists for a hot VIN to pin."""
    import io
    from contextlib import redirect_stdout

    from auto_ria_spark.plans.crawl import _dedup_by_vin

    cars = spark.range(0, 100).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.when(F.col("id") % 2 == 0,
               F.concat(F.lit("V"), F.col("id"))).alias("car_vin"),
        F.col("id").alias("discovery_rank"))
    plan_df = _dedup_by_vin(cars)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    tree = plan.split("(1)")[0]          # the physical operator tree
    assert "Window" not in tree, tree    # r7: aggregate, not window+sort
    assert "Union" in tree and "Aggregate" in tree
    # below the exchange there must be a partial Aggregate and then the
    # notnull Filter before the source — nulls never enter the shuffle,
    # dups collapse before it; the null branch is the separate Union arm
    ex = tree.index("Exchange")
    agg_below = tree.find("Aggregate", ex)
    flt = tree.find("Filter", ex)
    src = tree.find("Range", ex)
    assert 0 < agg_below < src, tree
    assert agg_below < flt < src, tree


def test_ivf_assigns_every_vector_to_one_cell(spark):
    """k-means IVF coarse quantizer: every vector lands in exactly one of
    the K ∝ √N cells, the per-cell CANDIDATE list is capped at
    _IVF_CELL_CAP (the _ANN_BUCKET_CAP discipline), and per-query search
    volume is min(cell, cap) — never all-pairs."""
    import math

    vq, cells, k = Q.ivf_cells(spark, SF)
    n = vq.count()
    assert k == max(4, math.isqrt(n))
    # total assignment: every vector in exactly one cell
    assert cells.count() == n
    assert cells.select("vec_id").distinct().count() == n
    assert cells.select("cell").distinct().count() <= k
    # k-means actually moved mass: more than one populated cell
    assert cells.select("cell").distinct().count() > 1
    out = Q.q_ann_ivf_topk(spark, SF)
    assert out.filter(F.col("rnk") > 3).count() == 0
    assert out.count() > 0
    # one (query, cand) pair at most once
    assert (out.groupBy("query_id", "cand_id").count()
            .filter(F.col("count") > 1).count()) == 0
    # candidate-side bound: no query can ever see more than the cap
    per_cell = cells.groupBy("cell").count()
    assert per_cell.count() >= 1
    cand_bound = (
        cells.withColumn(
            "__r", F.row_number().over(
                Window.partitionBy("cell").orderBy("vec_id")))
        .filter(F.col("__r") <= Q._IVF_CELL_CAP))
    assert (cand_bound.groupBy("cell").count()
            .agg(F.max("count")).first()[0]) <= Q._IVF_CELL_CAP


def test_brute_cosine_query_side_gated_in_code(spark):
    """The crossJoin baseline must refuse to go quadratic: asking for more
    query vectors than the in-code cap raises instead of running."""
    import pytest

    with pytest.raises(ValueError, match="capped"):
        Q.q_cosine_topk(spark, SF, n_queries=Q._BRUTE_MAX_QUERIES + 1)
    # the default stays within the gate and still returns ranked rows
    assert Q.q_cosine_topk(spark, SF).count() == 100


def test_simhash_is_full_64_bits(spark):
    """Both 32-bit halves must be populated (true 64-bit fingerprint) and
    stay in uint32 range — the representation contract."""
    out = Q.q_simhash(spark, SF)
    row = out.agg(
        F.max("simhash_hi"), F.max("simhash_lo"),
        F.min("simhash_hi"), F.min("simhash_lo")).first()
    assert 0 <= row[2] and 0 <= row[3]
    assert row[0] < (1 << 32) and row[1] < (1 << 32)
    assert row[0] > 0 and row[1] > 0
    # fingerprints differ across documents (not degenerate)
    assert out.select("simhash_hi", "simhash_lo").distinct().count() > 100


def test_ivf_train_stride_caps_training_set():
    """The quantizer's Lloyd iterations must train on a BOUNDED sample:
    for any N (up to the 10^10 north rule) the stride keeps the training
    set within 2·_IVF_TRAIN_PER_K·K rows, and degenerates to full-N only
    when N ≤ _IVF_TRAIN_PER_K·K (where sampling would gain nothing)."""
    import math

    for n in (1, 500, 2_000, 262_144, 10**7, 10**10):
        k = max(4, math.isqrt(n))
        s = Q.ivf_train_stride(n, k)
        assert s >= 1
        n_train = n // s + (1 if s > 1 else 0)  # ids 0, s, 2s, ...
        if n <= Q._IVF_TRAIN_PER_K * k:
            assert s == 1
        else:
            assert s > 1
            assert n_train <= 2 * Q._IVF_TRAIN_PER_K * k
    # the north-rule point: at 10^10 vectors the per-iteration cost is
    # O(train·K), ~stride× below the full-N O(N·K)
    assert Q.ivf_train_stride(10**10, math.isqrt(10**10)) > 300


def test_ivf_sample_training_matches_oracle_when_stride_binds(
        spark, monkeypatch):
    """Force the training stride to bind at test scale (shrink the
    per-K budget) and prove the SAMPLE-trained quantizer still matches
    the DuckDB oracle bit-for-bit — the stride predicate is mirrored in
    the generated SQL, so both engines train on the same rows."""
    import math

    import duckdb

    monkeypatch.setattr(Q, "_IVF_TRAIN_PER_K", 2)
    n = Q.load(spark, SF, "embeddings").count()
    k = max(4, math.isqrt(n))
    stride = Q.ivf_train_stride(n, k)
    assert stride > 1  # the point of the test
    out = Q.q_ann_ivf_topk(spark, SF)
    srows = sorted(
        (r["query_id"], r["cand_id"], f"{r['cos']:.6f}", r["rnk"])
        for r in out.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{SF}/embeddings.parquet'")
    drows = sorted(
        (q, c, f"{cos:.6f}", rnk)
        for q, c, cos, rnk in con.execute(Q._ivf_oracle_sql()).fetchall())
    assert srows == drows


def test_ivf_driver_k_gated_in_code(spark, monkeypatch):
    """The centroid state is a driver-side dict bounded by
    _IVF_MAX_DRIVER_K: past the bound the quantizer must raise with the
    distributed-merge recipe instead of silently ballooning the driver
    (the _BRUTE_MAX_QUERIES discipline applied to IVF)."""
    import pytest

    monkeypatch.setattr(Q, "_IVF_MAX_DRIVER_K", 3)  # test-scale K is > 3
    with pytest.raises(ValueError, match="_IVF_MAX_DRIVER_K"):
        Q.ivf_cells(spark, SF)


def test_ivf_init_order_based_and_empty_input_raises(spark, tmp_path):
    """Seeded init takes the first K training vectors BY ORDER, so
    sparse/gapped vec_ids still yield min(K, sample) centroids (the id
    predicate `vec_id < K·s` silently under-seeds on gaps), and an empty
    embeddings table raises a clear error instead of an opaque numpy
    shape crash in the assignment kernel."""
    import pytest
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType()))])
    sfd = str(tmp_path / "sf_gapped")
    # gapped ids: 1000, 1010, ... — the old predicate would seed ZERO
    # centroids (no id < k*stride exists); order-based init seeds k
    rows = [(1000 + 10 * i, [float((i * 7 + j) % 5) / 4 for j in range(8)])
            for i in range(64)]
    spark.createDataFrame(rows, schema).repartition(2) \
        .write.mode("overwrite").parquet(f"{sfd}/embeddings.parquet")
    vq, cells, k = Q.ivf_cells(spark, sfd)
    assert cells.count() == 64                      # every vector assigned
    assert cells.select("cell").distinct().count() >= 2
    # empty table: loud, named error
    sfe = str(tmp_path / "sf_empty")
    spark.createDataFrame([], schema).write.mode("overwrite") \
        .parquet(f"{sfe}/embeddings.parquet")
    with pytest.raises(ValueError, match="empty training sample"):
        Q.ivf_cells(spark, sfe)


def test_hex_slice_string_min_equals_numeric_min():
    """r7 MinHash rewrite invariant: md5 hex slices are fixed-length
    lowercase [0-9a-f], where lexicographic order equals numeric order —
    so aggregating min over the STRING slices then converting once per
    group is exactly the min of the per-row conversions."""
    import hashlib
    import random

    rng = random.Random(7)
    for _ in range(200):
        digests = [hashlib.md5(str(rng.random()).encode()).hexdigest()
                   for _ in range(rng.randint(1, 40))]
        for off in (0, 8, 16, 24):
            slices = [d[off:off + 8] for d in digests]
            assert int(min(slices), 16) == min(int(s, 16) for s in slices)


def test_dedup_components_touched_only_equals_full_labels(spark):
    """r7 CC rewrite invariant: iterating only over edge-incident nodes
    and re-attaching isolated docs as their own component afterwards
    yields the same labels as seeding every node (isolated nodes have no
    neighbors to take a min over and contribute nothing to any min)."""
    from auto_ria_spark.util import local_df

    edges_raw = [(1, 2), (2, 3), (7, 9), (20, 21)]
    nodes = list(range(25))
    half = local_df(spark, edges_raw, "src long, dst long")
    edges = half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    full_labels = local_df(spark, [(n, n) for n in nodes],
                           "doc_id long, component long")
    full, _ = Q.connected_components(full_labels, edges)
    touched = edges.select(F.col("src").alias("doc_id")).distinct()
    part_labels = touched.select(
        "doc_id", F.col("doc_id").alias("component"))
    part, _ = Q.connected_components(part_labels, edges)
    node_df = local_df(spark, [(n,) for n in nodes], "doc_id long")
    stitched = (
        node_df.join(part.withColumnRenamed("component", "__c"),
                     "doc_id", "left")
        .select("doc_id",
                F.coalesce(F.col("__c"), F.col("doc_id")).alias("component")))
    a = sorted((r.doc_id, r.component) for r in full.collect())
    b = sorted((r.doc_id, r.component) for r in stitched.collect())
    assert a == b
