"""Layer B — Spark DataFrame pipeline builders (SURVEY.md §2.B).

Everything here is declarative DataFrame API so Catalyst owns pushdown,
pruning, and join strategy; the single Python boundary is the
``mapInArrow`` kernel call (B4). Stage map (BASELINE.json:6):

  B1 scan -> B2 filter -> B3 prune -> B9 salt/repartition ->
  B4 mapInArrow(extract_batch) -> B5 window(turn order) ->
  B6 range sort -> B13 sink (+ B8 lineage aggregation)

At 100 TB the salting shuffle is the only wide stage before the kernel;
it exists to break up hot conversations when the source is
conv_id-clustered (BASELINE.json:6 "skewed conversations are salted and
AQE-split"). When the source layout is already size-balanced (plain
parquet split by bytes), pass ``salt_buckets=None`` and the kernel map
runs narrow, straight off the scan.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..kernel.extract import extract_batch

__all__ = [
    "OUT_SCHEMA",
    "extract_transcripts",
    "ordered_output",
    "turn_seq_map",
    "with_turn_seq",
    "lineage_summary",
    "transcripts_from_tpch",
]

SPAN_TYPE = StructType(
    [
        StructField("row", IntegerType()),
        StructField("col", IntegerType()),
        StructField("x", IntegerType()),
        StructField("y", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("route", StringType()),
        StructField("extracted_text", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
        StructField("n_rows", IntegerType()),
        StructField("n_cols", IntegerType()),
        StructField("n_cells", IntegerType()),
        StructField("n_joints", IntegerType()),
        StructField("err", StringType()),
        StructField("proc_us", LongType()),
    ]
)


def extract_transcripts(
    df: DataFrame,
    salt_buckets: int | None = 8,
    repartition_to: int | None = None,
    use_adaptive: bool = False,
    add_turn_seq: bool = True,
    unbounded_turn_seq: bool = False,
    keep_text: bool = False,
) -> DataFrame:
    """The extraction pipeline body (B2-B5) over a transcript DataFrame.

    B3: only (conv_id, turn_idx, text) cross the Arrow boundary — Catalyst
    prunes everything else out of the scan (check ReadSchema in explain).
    B9: ``salt_buckets`` truthy = a balanced round-robin exchange before
    the kernel map — the limit of per-turn salting (every task gets an
    equal row count no matter how hot any conversation is); per-turn
    extraction is embarrassingly parallel, so correctness never depends
    on grouping.
    B5: row_number over (conv_id, turn_idx) re-establishes stable turn
    ordering after the salted shuffle (never rely on task order).

    The repartition always carries an EXPLICIT partition count: the
    kernel stage is CPU-bound, so AQE's byte-based partition coalescing
    (sized for ~64MB of shuffle data) would collapse a few MB of text —
    hours of image work — into one task. An explicit count opts this one
    exchange out of coalescing while AQE still manages the joins/aggs.
    """
    src = df.select("conv_id", "turn_idx", "text")
    if salt_buckets:
        # r8 optimization (guide §2.5): per-turn extraction is
        # embarrassingly parallel, so the balanced limit of "salt each
        # conversation over k buckets" is a keyless round-robin exchange
        # — every task gets an identical row count REGARDLESS of the
        # source's conv clustering, where hash((conv_id, salt)) left a
        # CPU-weighted ±15-20% task skew at salt_buckets=8 (measured
        # sf0.1/local[32]: 10.4-10.9 s vs 8.5-9.5 s for the kernel
        # stage; see OPTIMIZATION_r08.md). Row order feeding the kernel
        # is not load-bearing: turn_seq is re-established by B5 and the
        # oracle compares sorted output. Spark's sort-before-repartition
        # (on by default) keeps the row->partition assignment stable
        # under task retries. ``salt_buckets`` stays the on/off knob for
        # the exchange; its count no longer bounds the spread (the
        # docstring's hot-conversation goal, taken to its limit).
        n = repartition_to or df.sparkSession.sparkContext.defaultParallelism * 2
        src = src.repartition(n)
    elif repartition_to:
        # unsalted but an explicit width was requested: honor it with a
        # round-robin exchange (salt_buckets=None + repartition_to=None
        # remains the zero-shuffle narrow mode for size-balanced scans)
        src = src.repartition(repartition_to)
    fn = functools.partial(
        extract_batch, use_adaptive=use_adaptive, keep_text=keep_text
    )
    schema = OUT_SCHEMA
    if keep_text:
        # the echoed source payload (see extract_batch): lets span
        # consumers slice offsets without a join-back derivation pass
        schema = StructType(OUT_SCHEMA.fields + [StructField("text", StringType())])
    out = src.mapInArrow(fn, schema)
    if add_turn_seq:
        # unbounded mode takes its (conv_id, turn_idx) keys from the
        # INPUT frame — a column-pruned re-scan of the source (cheap,
        # JVM-only) instead of a second run of the Python kernel
        out = with_turn_seq(
            out,
            unbounded=unbounded_turn_seq,
            keys=df.select("conv_id", "turn_idx") if unbounded_turn_seq else None,
        )
    return out


def turn_seq_map(keys: DataFrame, buckets: int | None = None) -> DataFrame:
    """Distributed ordinal assignment: (conv_id, turn_idx) ->
    (conv_id, turn_idx, turn_seq) where turn_seq is the 1-based rank of
    turn_idx within its conversation — computed WITHOUT ever holding a
    whole conversation in one task (the two-level prefix sum, the same
    worked pattern as operators/textstats.pack_token_shards):

      1. bucket every row by turn_idx value range (global min/max from
         one 1-row aggregate; bucket boundaries are pure arithmetic, so
         both passes over `keys` bucket identically — no persist needed,
         unlike spark_partition_id()-based bucketing, which could drift
         between a plan's re-executions);
      2. count rows per (conv_id, bucket) — a SMALL frame (<= convs x
         buckets) — and turn counts into exclusive per-bucket offsets
         with a window ORDERED BY BUCKET (partition size <= `buckets`
         rows per conversation, never conversation length);
      3. join the offsets back on (conv_id, bucket) (AQE broadcasts the
         small side) and rank WITHIN each (conv_id, bucket): partition
         size is bounded by the bucket's value range share, so a 10^9-
         turn conversation splits across ~`buckets` tasks instead of
         serializing into one.

    Ties on (conv_id, turn_idx) get arbitrary distinct ranks — identical
    to the window form's row_number tie-break; the data model's turn_idx
    is unique per conversation.

    Plan construction is side-effect free: the global (lo, width) bounds
    come from a 1-row min/max aggregate joined in via a broadcast
    crossJoin, NOT an eager ``.collect()`` — so merely BUILDING an
    unbounded plan (e.g. registering a query) launches no Spark job, and
    the bounds recompute deterministically on any re-execution of the
    plan (same input => same min/max => identical bucketing across both
    passes over `keys`; no persist needed). On empty input the crossJoin
    against the 1-row null aggregate yields an empty frame with the same
    (conv_id, turn_idx, turn_seq) schema."""
    spark = keys.sparkSession
    buckets = buckets or spark.sparkContext.defaultParallelism * 4
    k = keys.select("conv_id", "turn_idx")
    bounds = k.agg(
        F.min("turn_idx").alias("_lo"),
        F.greatest(
            F.lit(1),
            F.ceil((F.max("turn_idx") - F.min("turn_idx") + 1) / F.lit(buckets)),
        ).alias("_w"),
    )
    b = (
        k.crossJoin(F.broadcast(bounds))
        .withColumn(
            "_bkt", F.floor((F.col("turn_idx") - F.col("_lo")) / F.col("_w")).cast("int")
        )
        .drop("_lo", "_w")
    )
    counts = b.groupBy("conv_id", "_bkt").agg(F.count("*").alias("_c"))
    w_off = Window.partitionBy("conv_id").orderBy("_bkt")
    offs = counts.withColumn("_off", F.sum("_c").over(w_off) - F.col("_c")).drop("_c")
    w_rank = Window.partitionBy("conv_id", "_bkt").orderBy("turn_idx")
    return (
        b.join(offs, ["conv_id", "_bkt"])
        .withColumn("turn_seq", (F.col("_off") + F.row_number().over(w_rank)).cast("int"))
        .drop("_bkt", "_off")
    )


def with_turn_seq(
    out: DataFrame,
    unbounded: bool = False,
    buckets: int | None = None,
    keys: DataFrame | None = None,
) -> DataFrame:
    """B5: stable turn ordering guarantee (turn_seq = 1-based rank of
    turn_idx within conv_id). Kept separable from the kernel map so
    lineage_summary can aggregate on the *map* partitions before this
    stage's exchange.

    Default form: one window over conv_id — one shuffle, but each
    conversation serializes into one task. Correct and cheap while
    conversations are bounded (the data model's assumption: 10^12 turns
    from ~10^9 conversations, and the rows here are the small extraction
    output, not images).

    ``unbounded=True`` (r5 verdict #3 — the production-shape twin, like
    asof's bucketed mode and components' twostar): two-level prefix-sum
    ranking via :func:`turn_seq_map`, then an equi-join back on
    (conv_id, turn_idx) — every stage's task size stays bounded at ANY
    conversation length. Costs one extra small-side shuffle + the keys
    pass; pass ``keys`` (a cheap pre-kernel projection of the same rows)
    when ``out`` sits downstream of an expensive map, else the keys
    branch re-executes it. Requires (conv_id, turn_idx) unique (the data
    model's key) — the join would fan out duplicates, where the window
    form would arbitrarily rank them."""
    if not unbounded:
        w = Window.partitionBy("conv_id").orderBy("turn_idx")
        return out.withColumn("turn_seq", F.row_number().over(w))
    seq = turn_seq_map(keys if keys is not None else out.select("conv_id", "turn_idx"), buckets)
    return out.join(seq, ["conv_id", "turn_idx"])


def ordered_output(out: DataFrame) -> DataFrame:
    """B6: global (conv_id, turn_idx) ordering for equality diffing —
    range-partitioned so the sort is distributed, not single-task."""
    return out.repartitionByRange("conv_id", "turn_idx").sortWithinPartitions(
        "conv_id", "turn_idx"
    )


def lineage_summary(out: DataFrame) -> DataFrame:
    """B8: one lineage row per task partition (BASELINE.json:6
    "per-partition lineage rows and counters"). Aggregate BEFORE any
    further shuffle so spark_partition_id() is the kernel-map partition."""
    return (
        out.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(
            F.min("conv_id").alias("conv_id_min"),
            F.max("conv_id").alias("conv_id_max"),
            F.count("*").alias("n_turns"),
            F.sum("n_cells").alias("n_cells"),
            F.sum(F.when(F.col("err") != "", 1).otherwise(0)).alias("n_errors"),
            (F.sum("proc_us") / F.lit(1000)).cast("long").alias("wall_ms"),
        )
    )


def transcripts_from_tpch(
    spark, sf_dir: str, max_orders: int | None = None
) -> DataFrame:
    """Derive a deterministic transcript table from the driver-provided
    TPC-H-ish parquet (TESTDATA.md) — no external data, and the whole
    derivation is JVM-side (collect_list/array_join, zero Python).

    Three turn families, exercising all kernel branches:
      * table turns  — one markdown pipe table per order, rows = its
        lineitems sorted by l_linenumber (cols: line, part, supp, flag);
      * html turns   — documents.text wrapped in nav/footer boilerplate;
      * scan turns   — documents.text behind a [[scan]] header whose
        region geometry routes doc_id % 3 == 0 to signature-only (ocr)
        and the rest to handwriting (test2.py:3-5 semantics).

    conv_id groups ~100 orders / ~50 docs per conversation so the window
    stage (B5) has real work.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_returnflag"
    )
    if max_orders is not None:
        li = li.where(F.col("l_orderkey") <= max_orders)
    row_str = F.concat(
        F.lit("| "), F.col("l_linenumber").cast("string"),
        F.lit(" | "), F.col("l_partkey").cast("string"),
        F.lit(" | "), F.col("l_suppkey").cast("string"),
        F.lit(" | "), F.col("l_returnflag"), F.lit(" |"),
    )
    tables = (
        li.withColumn("line_md", row_str)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    # full numeric sort key: the synthetic data has
                    # duplicate l_linenumber within an order, so ties
                    # must break deterministically (and identically to
                    # the SQL oracle's ORDER BY)
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                "l_linenumber", "l_partkey", "l_suppkey",
                                "l_returnflag", "line_md",
                            )
                        )
                    ),
                    lambda s: s["line_md"],
                ),
                "\n",
            ).alias("body")
        )
        .select(
            F.concat(F.lit("order-"), F.pmod("l_orderkey", F.lit(100)).cast("string")
                     ).alias("conv_id"),
            F.col("l_orderkey").cast("int").alias("turn_idx"),
            F.concat(
                F.lit("| line | part | supp | flag |\n|---|---|---|---|\n"),
                F.col("body"),
            ).alias("text"),
        )
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    html = docs.select(
        F.concat(F.lit("doc-"), F.pmod("doc_id", F.lit(50)).cast("string")).alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.concat(
            F.lit('<html><body><nav><ul><li><a href="#">home</a></li>'
                  '<li><a href="#">about</a></li></ul></nav><div><p>'),
            F.col("text"),
            F.lit("</p></div><footer>fine print</footer></body></html>"),
        ).alias("text"),
    )
    scan_regions = F.when(
        F.pmod("doc_id", F.lit(3)) == 0,
        F.lit("region x=250 y=260 w=90 h=24 d=0.5"),  # signature-only -> ocr
    ).otherwise(
        F.lit("region x=20 y=30 w=120 h=30 d=0.5\nregion x=20 y=90 w=120 h=30 d=0.5")
    )
    scans = docs.select(
        F.concat(F.lit("scan-"), F.pmod("doc_id", F.lit(25)).cast("string")).alias("conv_id"),
        (F.col("doc_id") + 1_000_000).cast("int").alias("turn_idx"),
        F.concat(
            F.lit("[[scan]] w=400 h=300\n"), scan_regions, F.lit("\n[[/scan]]\n"),
            F.col("text"),
        ).alias("text"),
    )
    return tables.unionByName(html).unionByName(scans)
