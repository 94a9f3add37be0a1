"""Physical-plan shape tests (SURVEY.md §4.2): the properties that keep
the pipeline viable at 100 TB must be visible in `explain`, not assumed.

- column pruning reaches the parquet scan (ReadSchema carries only the
  three kernel columns);
- the broadcast hint on the small dim produces a BroadcastHashJoin;
- the kernel stage runs with an explicit partition count (not collapsed
  by AQE byte-based coalescing);
- filter pushdown reaches the scan for the route prefilter.
"""

from pyspark.sql import functions as F

from opencv_table_extraction_spark.plans import extract_transcripts


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_prunes_to_kernel_columns(spark, fixture_dir):
    df = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    out = extract_transcripts(df, salt_buckets=8, add_turn_seq=False)
    plan = _plan(out)
    scan = plan[plan.index("Scan parquet"):]
    read_schema = scan[scan.index("ReadSchema"): scan.index("\n", scan.index("ReadSchema"))]
    assert "conv_id" in read_schema and "turn_idx" in read_schema and "text" in read_schema
    # the wide columns must NOT cross the scan
    assert "role" not in read_schema and "tool" not in read_schema and "ts" not in read_schema


def test_filter_pushdown_reaches_scan(spark, fixture_dir):
    df = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    q = df.where(F.col("conv_id") == "conv-000007").select("conv_id", "turn_idx")
    plan = _plan(q)
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters"): plan.index("\n", plan.index("PushedFilters"))]
    assert "conv_id" in pushed


def test_broadcast_join_used_for_small_dim(spark):
    import __spark_entry__ as em

    # region_nations lives in the extras tier (registry capped at the
    # driver's 50 graded rows) but stays the broadcast-plan exemplar
    q = em.extra_queries()["region_nations"](spark, "/root/testdata/sf0.001")
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan


def test_ivf_assign_is_narrow(spark):
    """Nearest-centroid assignment must be a per-row argmax — no Window,
    no Exchange (the r1 crossJoin+row_number shape shuffled N*K rows)."""
    from opencv_table_extraction_spark.operators.similarity import _q_ivf_assign

    q = _q_ivf_assign(spark, "/root/testdata/sf0.001")
    plan = _plan(q)
    assert "Window" not in plan
    assert "Exchange" not in plan


def test_lsh_band_rows_shuffle_only_keys(spark):
    """The LSH band exchange must carry only (doc_id, band_id, band_hash)
    — never text or shingle arrays (the r1 shuffle amplifier)."""
    from opencv_table_extraction_spark.operators.dedup import (
        dedup_corpus,
        minhash_lsh_pairs,
    )

    q = minhash_lsh_pairs(dedup_corpus(spark, "/root/testdata/sf0.001"))
    plan = _plan(q)
    # formatted plans list each Exchange's Input columns right below it
    band_exchanges = [
        blk for blk in plan.split("\n\n")
        if blk.lstrip().startswith("(") and ") Exchange" in blk.split("\n")[0]
        and "band_id" in blk
    ]
    assert band_exchanges, plan
    import re

    for blk in band_exchanges:
        input_line = next(ln for ln in blk.split("\n") if "Input" in ln)
        assert "text" not in input_line, blk
        assert not re.search(r"\bsh#", input_line), blk


def test_prefix_join_no_cache_and_single_scan(spark):
    """jaccard_prefix_pairs must not persist its shingle explosion (the
    r2 cache leak / 100-TB memory cliff): no InMemoryRelation anywhere,
    and the corpus scan feeds both consumers through ONE reused exchange
    (ReusedExchange of the doc_id repartition in the executed plan)."""
    from opencv_table_extraction_spark.operators.dedup import (
        dedup_corpus,
        jaccard_prefix_pairs,
    )

    n_cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    p = jaccard_prefix_pairs(dedup_corpus(spark, "/root/testdata/sf0.001"))
    # collect() (not count()) so THIS DataFrame's QueryExecution runs and
    # its adaptive plan is finalized with runtime exchange reuse resolved
    assert len(p.collect()) > 0
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "InMemoryRelation" not in plan and "InMemoryTableScan" not in plan
    assert "ReusedExchange" in plan
    # and the operator added no lingering cached RDDs (<=, not ==: the
    # ContextCleaner may asynchronously free OTHER operators' released
    # localCheckpoint blocks between the two measurements)
    n_cached_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_cached_after <= n_cached_before, "prefix join leaked a cache"


def test_ivf_store_probe_is_partition_pruned(spark, tmp_path):
    """The IVF store layout claim must be visible in the plan: probing
    a centroid-partitioned store pushes centroid_id into
    PartitionFilters (whole non-probed partitions never scanned), and
    the pruned search returns exactly what the unpartitioned
    ivf_search computes with the same codebook."""
    from opencv_table_extraction_spark.operators.similarity import (
        QUERY_VEC_ID,
        ivf_search,
        ivf_search_store,
        ivf_write_partitioned,
    )

    sf = "/root/testdata/sf0.001"
    store = str(tmp_path / "ivf_store")
    cents = ivf_write_partitioned(spark, sf, store)
    q = [float(v) for v in
         spark.read.parquet(f"{sf}/embeddings.parquet")
         .where(F.col("vec_id") == QUERY_VEC_ID).collect()[0]["embedding"]]
    res = ivf_search_store(spark, store, cents, q,
                           exclude_vec_id=QUERY_VEC_ID)
    plan = _plan(res)
    pf = plan[plan.index("PartitionFilters"):]
    pf = pf[:pf.index("\n")]
    assert "centroid_id" in pf, pf
    got = [(r["vec_id"], r["cos"]) for r in res.collect()]
    want = [(r["vec_id"], r["cos"]) for r in ivf_search(spark, sf).collect()]
    assert got == want


def test_ivf_batch_search_dpp_and_exactness(spark, tmp_path):
    """Batched-query ANN over the partitioned store (r6 verdict #4):
    1. the broadcast probe-block equi-join on centroid_id must trigger
       DYNAMIC partition pruning against the store (no driver-side
       collect of probe ids anywhere in the operator);
    2. with n_probe = K (probe everything) the batch path must equal
       per-query brute force EXACTLY — certifying the plumbing with a
       real oracle, independent of bucketing quality;
    3. the store-backed result must equal the in-session assigned-frame
       result at the production n_probe.
    """
    from pyspark.sql import Window
    from opencv_table_extraction_spark.operators.similarity import (
        N_CENTROIDS,
        TOP_K,
        assigned_store,
        cosine,
        ivf_batch_search,
        ivf_write_partitioned,
        kmeans_centroids,
    )

    sf = "/root/testdata/sf0.001"
    store_dir = str(tmp_path / "ivf_store")
    cents = ivf_write_partitioned(spark, sf, store_dir)
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = e.where(F.col("vec_id").isin([3, 17, 41])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    store = spark.read.parquet(store_dir)

    res = ivf_batch_search(store, cents, queries, n_probe=2)
    plan = _plan(res)
    pf = plan[plan.index("PartitionFilters"):]
    pf = pf[: pf.index("\n")]
    assert "dynamicpruning" in pf and "centroid_id" in pf, pf

    got = {(r["query_id"], r["vec_id"], r["cos"]) for r in res.collect()}
    mem = ivf_batch_search(assigned_store(e, cents), cents, queries, n_probe=2)
    assert got == {(r["query_id"], r["vec_id"], r["cos"]) for r in mem.collect()}

    # n_probe = K: the probe covers every bucket, so the batch path must
    # reproduce exact brute force per query (same rounded-cos ordering)
    full = ivf_batch_search(store, cents, queries, n_probe=N_CENTROIDS)
    brute = (
        e.crossJoin(
            F.broadcast(
                queries.select("query_id", F.col("embedding").alias("q_embedding"))
            )
        )
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_embedding")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    brute = brute.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= TOP_K
    )
    a = {(r["query_id"], r["vec_id"], r["cos"], r["rank"]) for r in full.collect()}
    b = {(r["query_id"], r["vec_id"], r["cos"], r["rank"]) for r in brute.collect()}
    assert a == b and len(a) == 3 * TOP_K


def test_kernel_stage_not_coalesced_to_one_task(spark, fixture_dir):
    """The CPU-bound kernel repartition carries an explicit count, so
    AQE must not collapse it to a single task (the 1-task regression the
    harness caught)."""
    df = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    out = extract_transcripts(df, salt_buckets=8, repartition_to=16,
                              add_turn_seq=False)
    n_parts = out.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts >= 8, n_parts


def test_entry_contract_shapes(spark):
    import __spark_entry__ as em

    qs = em.queries()
    os_ = em.oracle_sql()
    assert set(os_) <= set(qs)
    # every query has an exact DuckDB oracle (r2: no rows-only exceptions)
    assert set(qs) - set(os_) == set()
    df = em.entry(spark)
    assert df.count() > 0
    assert "extracted_text" in df.columns and "conv_id" in df.columns


def test_dedup_apply_corpus_side_never_shuffles(spark):
    """dedup_apply is the 10^12-row keep-filter: the drop list must
    BROADCAST (BroadcastHashJoin LeftAnti) and the corpus side must
    reach that join with no Exchange — scan -> project -> union ->
    anti-join, nothing else (the decontaminate contract, applied to
    dedup decisions)."""
    from opencv_table_extraction_spark.operators.dedup import (
        dedup_apply,
        dedup_corpus,
    )

    corpus = dedup_corpus(spark, "/root/testdata/sf0.001")
    # stand-in decisions frame (the real one is checkpointed output;
    # the plan shape under test is dedup_apply's join, not its input)
    decisions = spark.createDataFrame(
        [(1, 0), (2, 0), (0, 0)], ["doc_id", "keeper_id"]
    )
    plan = _plan(dedup_apply(corpus, decisions))
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan, plan
    # the ONLY exchange anywhere is the broadcast of the drop list
    import re

    exchanges = re.findall(r"\)\s+(\w*Exchange)\b", plan)
    assert exchanges and set(exchanges) == {"BroadcastExchange"}, exchanges


def test_turn_seq_unbounded_equals_window_form(spark):
    """Property test for the two-level prefix-sum turn ordering (r5
    verdict #3): on conversations with gaps, negative turn_idx, a giant
    5,000-turn conversation, and a bucket count far smaller than the
    giant conversation (forcing real cross-bucket offsets), the
    unbounded form must equal the window form exactly — and no window
    partition in the unbounded plan may hold a whole conversation."""
    import random

    from opencv_table_extraction_spark.plans import turn_seq_map, with_turn_seq

    rng = random.Random(7)
    rows = [("giant", i * 3 - 500) for i in range(5000)]
    for c in range(30):
        ids = rng.sample(range(-1000, 10000), rng.randrange(1, 40))
        rows += [(f"c{c}", i) for i in ids]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int").repartition(7)

    win = with_turn_seq(df)
    unb = with_turn_seq(df, unbounded=True, buckets=16)
    a = {(r["conv_id"], r["turn_idx"]): r["turn_seq"] for r in win.collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["turn_seq"] for r in unb.collect()}
    assert a == b and len(a) == len(rows)

    # the map alone, with buckets=16 over a 5,000-turn conversation:
    # ranks must still be the per-conversation 1..n ordinals
    m = turn_seq_map(df, buckets=16)
    got = sorted(
        r["turn_seq"] for r in m.where(F.col("conv_id") == "giant").collect()
    )
    assert got == list(range(1, 5001))

    # empty input keeps the schema
    empty = turn_seq_map(df.where(F.lit(False)))
    assert empty.columns == ["conv_id", "turn_idx", "turn_seq"]
    assert empty.count() == 0


def test_turn_seq_plan_construction_is_lazy(spark):
    """Building an unbounded turn_seq plan must launch no Spark job
    (r6 advice): the bucket bounds are a lazily-joined 1-row aggregate,
    not an eager collect. Proven by constructing the plan over keys
    whose evaluation RAISES — construction succeeds, execution fails."""
    import pytest
    from pyspark.sql.types import StructType, StructField, StringType, IntegerType

    from opencv_table_extraction_spark.plans import with_turn_seq

    def boom(_it):
        raise RuntimeError("keys must not be evaluated at plan build")
        yield  # pragma: no cover

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("text", StringType()),
        ]
    )
    df = spark.createDataFrame([("c", 1, "t")], schema).mapInPandas(boom, schema)
    plan = with_turn_seq(df, unbounded=True)  # must not raise
    assert "turn_seq" in plan.columns
    with pytest.raises(Exception):
        plan.count()


def test_unbounded_turn_seq_runs_kernel_once(spark, fixture_dir):
    """The unbounded turn_seq form takes its ordinal keys from the
    INPUT (a pruned JVM-only re-scan), never from the kernel output —
    the Python kernel map must appear exactly once in the plan, and the
    keys branch must not carry the text column."""
    import re

    df = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    out = extract_transcripts(df, salt_buckets=8, unbounded_turn_seq=True)
    plan = _plan(out)
    assert len(re.findall(r"\(\d+\)\s+MapInArrow", plan)) == 1
    # one scan feeds the kernel (carries text); the keys branch scans
    # (counts + join-back sides) are pruned to (conv_id, turn_idx) only
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert sum("text" in s for s in schemas) == 1
    assert sum("text" not in s for s in schemas) >= 1
    # keys-branch scans are (conv_id, turn_idx); the lazy bounds
    # aggregate prunes further to turn_idx alone
    assert all("text" in s or ("turn_idx" in s and "role" not in s) for s in schemas)
