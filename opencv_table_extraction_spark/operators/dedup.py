"""Deduplication operators: exact (hash-groupBy), n-gram Jaccard
near-dup (blocked pairwise), MinHash+LSH (shingle -> minhash -> band ->
bucket self-join), SimHash (md5 bit votes). Spark-first: every operator
is pure JVM-side expression algebra (xxhash64 / md5 / transform /
aggregate / array_min) — zero Python anywhere, including simhash.

The dedup corpus derives near-duplicates deterministically from the
documents table (each doc unioned with its 90%-prefix truncation at
doc_id+1_000_000), so recall is measurable and EVERY query here has an
exact DuckDB oracle: Jaccard and simhash mirror the arithmetic directly;
the LSH banding itself is not SQL-expressible (xxhash64), but its output
is deterministic on the fixed corpus and verified equal to the exact
brute-force pair set (see _SQL_MINHASH notes).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

_VERIFY_SCHEMA = StructType(
    [
        StructField("a_id", LongType()),
        StructField("b_id", LongType()),
        StructField("jaccard", DoubleType()),
    ]
)

N_HASHES = 32
N_BANDS = 16  # 16 bands x 2 rows: ~0.99 candidate recall at jaccard 0.5
JACCARD_THRESHOLD = 0.2
# Hot-bucket cap for the bucketed candidate generators (LSH / prefix /
# SRP): a bucket key shared by more than MAX_BUCKET ids is dropped from
# pair enumeration BEFORE its id array is ever materialized (count-first
# anti-join, see _bucket_ids). Over-hot buckets are exact-dup /
# boilerplate families that dedup_exact absorbs in O(N); enumerating
# them here would be O(B^2) pairs and an O(B) single-task array. The
# default clears every fixture bucket by >100x (measured max ~30 at
# sf0.1) while bounding any production task at ~max_bucket rows.
MAX_BUCKET = 4096
# Registered-query guard for the brute-force baseline: fail fast instead
# of launching a quadratic job when any block exceeds this.
MAX_BLOCK = 20_000


def _jvm_tokens(text: str | None) -> list[str]:
    """Tokenize exactly like the JVM/DuckDB pipelines' split(trim(col),
    '\\s+'): trim strips SPACES only (Spark StringTrim and DuckDB trim
    both default to ' '), and the split keeps leading AND trailing empty
    tokens when the trimmed text is edged with non-space whitespace
    (Spark's split uses limit=-1, which preserves trailing empties —
    identical to Python re.split). Python's .strip().split() differs on
    texts edged with tabs/newlines — every Python kernel that must agree
    with a JVM expression or a DuckDB oracle tokenizes through here.
    (tests/test_operators.py pins edge-whitespace agreement directly.)"""
    return re.split(r"\s+", (text or "").strip(" "))


def _bucket_ids(
    rows: DataFrame, keys: list[str], collect_expr, max_bucket: int
) -> tuple[DataFrame, DataFrame]:
    """(key..., id) rows -> (bounded pair buckets, dropped-bucket stats).

    Count-first hot-key exclusion: every bucket's size is known BEFORE
    collect_list builds any id array, so no task ever materializes a
    degenerate bucket's array (the OOM + cartesian bomb a
    ``where(size(ids) <= cap)`` AFTER the agg would still hit).

    r8 shape (guide §2.4): ONE key-hash exchange, ONE kernel pass. The
    bucket size rides a COUNT window over the key partition and the
    1 < n <= max_bucket filter runs BEFORE collect_list, which then
    aggregates in place on the window's partitioning (no further
    exchange, no anti-join). The r7 count-first form never shipped a
    degenerate bucket's rows (partial-agg counts + anti-join before the
    array exchange) but paid a SECOND full scan->banding-kernel pass
    for the counts branch — and Catalyst/AQE does not dedupe Python
    MapInArrow subtrees (verified in the executed plan: two kernel
    instances, no ReusedExchange), so that second pass was real. Band
    rows are ~20-byte key tuples: shipping even a pathological bucket's
    rows once (window-buffered, disk-spillable, never an array) costs
    far less than re-running the per-doc kernel over the whole corpus.

    Returns the buckets frame (>1 ids each, all <= max_bucket) and the
    lazy ``dropped`` frame (key columns + n) enumerating every excluded
    bucket — callers attach it to their result for lineage/telemetry
    (consuming it re-runs the banding subtree up to a partial count, as
    before).
    """
    n = F.count("*").over(Window.partitionBy(*keys))
    bounded = (
        rows.repartition(*[F.col(k) for k in keys])
        .withColumn("_n", n)
        .where((F.col("_n") > 1) & (F.col("_n") <= max_bucket))
    )
    buckets = bounded.groupBy(*keys).agg(
        F.collect_list(collect_expr).alias("ids")
    )
    dropped = (
        rows.groupBy(*keys)
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
    )
    return buckets, dropped


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ deterministic near-duplicates: copy of every doc with
    the last ~10% of tokens dropped, at doc_id + 1_000_000."""
    d = _docs(spark, sf_dir).select("doc_id", "text", "source")
    toks = F.split(F.trim("text"), r"\s+")
    trunc = F.array_join(
        F.slice(toks, 1, F.floor(F.size(toks) * 0.9).cast("int")), " "
    )
    near = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        trunc.alias("text"),
        "source",
    )
    return d.unionByName(near)


_SQL_CORPUS = r"""
SELECT doc_id, text, source FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id,
       array_to_string(
         string_split_regex(trim(text), '\s+')[1:CAST(floor(len(string_split_regex(trim(text), '\s+')) * 0.9) AS INT)],
         ' ') AS text,
       source
FROM documents
"""


def exact_dedup(corpus: DataFrame) -> DataFrame:
    """Exact dedup: group identical normalized text by sha256; keep the
    lowest doc_id (deterministic keeper)."""
    h = F.sha2(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), 256)
    return (
        corpus.withColumn("fp", h)
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # duplicate every doc once so groups are non-trivial
    d = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = d.unionByName(d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    return exact_dedup(corpus)


_SQL_EXACT = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents)
SELECT sha256(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keeper_id, count(*) AS n_copies
FROM corpus GROUP BY 1
"""


def shingles(col, n: int = 3, distinct: bool = True):
    """Word n-gram shingle set, as a JVM-side array expression.

    ``distinct=False`` skips the array_distinct pass — correct wherever
    duplicates are harmless (the minhash min is duplicate-insensitive),
    and worth it: distinct over a ~200-element string array is the most
    expensive part of the expression."""
    toks = F.split(F.trim(col), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        # try_element_at: texts shorter than n tokens yield one
        # partial shingle instead of an ANSI out-of-bounds error
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
        ),
    )
    return F.array_distinct(grams) if distinct else grams


def jaccard_pairs(
    corpus: DataFrame,
    threshold: float = JACCARD_THRESHOLD,
    max_block: int | None = None,
) -> DataFrame:
    """Blocked pairwise n-gram Jaccard near-dup detection — the
    brute-force VERIFICATION BASELINE, quadratic per block by design.
    Blocking key = source (the natural shard).

    Scale guards:
      * exact length-ratio prefilter in the join condition (J >= t
        implies t*|B| <= |A| <= |B|/t) — drops no true pair, skips the
        expensive intersection for size-mismatched ones;
      * ``max_block`` fail-fast: a production corpus with one hot block
        is a cartesian bomb here; the guard raises with the offending
        block sizes and points at the bounded operators
        (dedup_jaccard_prefix_pairs / dedup_minhash_lsh_pairs) instead
        of silently launching a quadratic job.
    """
    c = corpus.withColumn("sh", shingles(F.col("text")))
    if max_block is not None:
        hot = (
            c.groupBy("source").count().where(F.col("count") > max_block).collect()
        )
        if hot:
            raise ValueError(
                f"jaccard_pairs: block(s) over max_block={max_block}: "
                + ", ".join(f"{r['source']}={r['count']}" for r in hot)
                + " — use dedup_jaccard_prefix_pairs or "
                "dedup_minhash_lsh_pairs for unbounded blocks"
            )
    a = c.select(
        F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"), "source"
    )
    b = c.select(
        F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"), "source"
    )
    pairs = (
        a.join(b, "source")
        .where(F.col("a_id") < F.col("b_id"))
        # exact length filter: round() can lift a just-under ratio to the
        # threshold, so pad the bound by the 4-digit rounding quantum
        .where(
            F.size("a_sh") >= (F.lit(threshold - 0.0001) * F.size("b_sh"))
        )
        .where(
            F.size("b_sh") >= (F.lit(threshold - 0.0001) * F.size("a_sh"))
        )
    )
    # the pair set is small in bytes but quadratic in CPU (array
    # intersections): explicit repartition keeps AQE from collapsing the
    # compute stage to a couple of tasks
    pairs = pairs.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism * 2, "a_id", "b_id"
    )
    jac = F.round(
        F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        / F.size(F.array_union("a_sh", "b_sh")),
        4,
    )
    return (
        pairs.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the fail-fast block guard protects the driver-visible path too: a
    # corpus with any block over MAX_BLOCK raises instead of silently
    # launching a quadratic job (the bounded operators are the scale path)
    return jaccard_pairs(dedup_corpus(spark, sf_dir), max_block=MAX_BLOCK)


_SQL_JACCARD = rf"""
WITH corpus AS ({_SQL_CORPUS}),
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
           range(0, greatest(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 1),
           i -> array_to_string(string_split_regex(trim(text), '\s+')[i+1:i+3], ' ')
         )) AS sh
  FROM corpus)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= {JACCARD_THRESHOLD}
"""


def _minhash_band_batches(batches, n_hashes: int, n_bands: int):
    """Arrow-batch kernel: (doc_id, text) -> (doc_id, band_id, band_hash).

    Why a mapInArrow kernel and not expression algebra: Spark evaluates
    higher-order-function lambdas INTERPRETED (no whole-stage codegen
    inside transform/aggregate), so any per-shingle x per-seed JVM
    formulation pays ~100ns-scale interpreter overhead per term — three
    attempts measured 50s/183s/323s for the sf0.1 LSH query depending on
    how much work the optimizer duplicated into the lambdas. The same
    arithmetic as vectorized NumPy over Arrow batches is ~1-2s. This is
    the engine's standing rule (BASELINE.json input_hint): custom
    numeric kernels ride Arrow batches; joins/aggregations stay JVM.

    Scheme (all public-knowledge: Broder minhash + keyed mixing):
      token hash   = pandas hash_array (siphash, fixed key — process
                     independent and deterministic);
      shingle hash = mix of 3 consecutive token hashes (wrapping uint64);
      signature_i  = min over shingles of splitmix64(h64 ^ K_i), with
                     K_i = splitmix64(splitmix64(i+1)) — 32 independent
                     keyed avalanche mixes (Steele et al., OOPSLA 2014);
      band hash    = fold of the band's signature rows.

    Why keyed splitmix64 and not the classic affine (a_i*h + b_i) mod p
    family: the r6 sf1 sweep caught the affine form missing 9 of
    102,615 true pairs at J = 0.82-0.89 where banding theory predicts
    ~2e-8 misses per pair. Root cause (probed empirically, see
    BENCH/BASELINE.md r6): the a_i/b_i were a LINEAR progression
    ((i+1)*phi masked), so for a fixed pair of shingle values the
    order of hash_i(x1) vs hash_i(x2) across i is a correlated Weyl
    rotation, not 32 independent draws — unlucky residues let one
    tail shingle win the min in nearly every function (observed 5-10/32
    collisions where J predicts ~27/32). Independent avalanche keys
    restore per-hash collision rate = J (measured 0.886 vs J 0.880 over
    200 pairs; all 9 missed pairs found with 7-14/16 bands), and the
    mix is mod-free, so it is also no slower.
    """
    import numpy as np
    import pyarrow as pa
    from pandas.util import hash_array

    rows_per_band = n_hashes // n_bands

    def _splitmix64(z):
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))

    with np.errstate(over="ignore"):
        K = _splitmix64(
            _splitmix64(np.arange(1, n_hashes + 1, dtype=np.uint64))
        ).reshape(-1, 1)
    C1 = np.uint64(0x9E3779B97F4A7C15)
    C2 = np.uint64(0xC2B2AE3D27D4EB4F)
    C3 = np.uint64(0x165667B19E3779F9)
    BANDF = np.uint64(1000003)
    band_ids = np.arange(n_bands, dtype=np.int32)

    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_doc = np.empty(len(doc_ids) * n_bands, dtype=np.int64)
        out_hash = np.empty(len(doc_ids) * n_bands, dtype=np.uint64)
        for i, (doc_id, text) in enumerate(zip(doc_ids, texts)):
            toks = _jvm_tokens(text)  # match the JVM split(trim, \s+)
            th = hash_array(np.asarray(toks, dtype=object))
            if len(th) < 3:  # one partial shingle, zero-padded
                th = np.pad(th, (0, 3 - len(th)))
            with np.errstate(over="ignore"):  # wrapping uint64 is the point
                sh = (th[:-2] * C1) ^ (th[1:-1] * C2) ^ (th[2:] * C3)
                vals = _splitmix64(sh[None, :] ^ K)
                sig = vals.min(axis=1).reshape(n_bands, rows_per_band)
                bh = np.zeros(n_bands, dtype=np.uint64)
                for c in range(rows_per_band):
                    bh = bh * BANDF + sig[:, c]
            out_doc[i * n_bands : (i + 1) * n_bands] = doc_id
            out_hash[i * n_bands : (i + 1) * n_bands] = bh
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_doc, type=pa.int64()),
                pa.array(np.tile(band_ids, len(doc_ids)), type=pa.int32()),
                pa.array(out_hash.astype(np.int64), type=pa.int64()),
            ],
            names=["doc_id", "band_id", "band_hash"],
        )


def minhash_band_rows(
    docs: DataFrame, n_hashes: int = N_HASHES, n_bands: int = N_BANDS
) -> DataFrame:
    """(doc_id, text) -> n_bands rows (doc_id, band_id, band_hash); the
    narrow, CPU-bound LSH signature stage. Explicit-count repartition so
    a 1-file scan doesn't serialize it (AQE byte-coalescing exemption)."""
    import functools

    from pyspark.sql.types import IntegerType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("band_id", IntegerType()),
            StructField("band_hash", LongType()),
        ]
    )
    par = docs.sparkSession.sparkContext.defaultParallelism * 2
    fn = functools.partial(_minhash_band_batches, n_hashes=n_hashes, n_bands=n_bands)
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .repartition(par, "doc_id")
        .mapInArrow(fn, schema)
    )


def _jaccard_verify_batches(batches):
    """Arrow-batch kernel: (a_id, b_id, a_text, b_text) -> exact word-
    3-gram Jaccard per candidate pair. Mirrors shingles()/the DuckDB
    oracle exactly: _jvm_tokens tokenization (space-only trim + \\s+
    split, identical to the JVM expression down to edge-whitespace
    texts), " ".join 3-grams (one partial gram for <3-token texts), set
    semantics, and HALF-UP rounding to 4 places (Spark's ROUND and
    DuckDB's round both round half away from zero; Python's built-in
    round is banker's — hence the floor form).
    """
    import math

    import pyarrow as pa

    def gram_set(text: str) -> set:
        toks = _jvm_tokens(text)
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}

    for batch in batches:
        a_ids = batch.column("a_id").to_pylist()
        b_ids = batch.column("b_id").to_pylist()
        a_txt = batch.column("a_text").to_pylist()
        b_txt = batch.column("b_text").to_pylist()
        jacs = []
        for ta, tb in zip(a_txt, b_txt):
            sa, sb = gram_set(ta), gram_set(tb)
            inter = len(sa & sb)
            union = len(sa | sb)
            j = inter / union if union else float("nan")
            jacs.append(math.floor(j * 10000 + 0.5) / 10000)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(a_ids, type=pa.int64()),
                pa.array(b_ids, type=pa.int64()),
                pa.array(jacs, type=pa.float64()),
            ],
            names=["a_id", "b_id", "jaccard"],
        )


# Named banding profiles, measured on the r6 sf1-equivalent sweep
# (200k docs, BENCH/BASELINE.md): the knob a caller actually wants —
# recall target — instead of raw (n_bands, n_hashes).
#   standard: 16 bands x 2 rows — 99.982% measured recall, every miss
#             at J in [0.5, 0.575] (the S-curve tail), leanest band
#             exchange; the 100-TB default.
#   high:     32 bands x 2 rows — PERFECT measured recall
#             (102,615/102,615 pairs, 0 extra) at ~1.3x warm wall and
#             2x band-exchange volume; for near-threshold-critical runs.
# (32x1 single-row bands also measured perfect but ~8x wall — the
# verify leg dominates; deliberately not a profile.)
RECALL_PROFILES: dict[str, tuple[int, int]] = {
    "standard": (N_BANDS, 2 * N_BANDS),
    "high": (32, 64),
}


def _resolve_recall(
    recall: str | None, n_bands: int, n_hashes: int | None
) -> tuple[int, int | None]:
    if recall is None:
        return n_bands, n_hashes
    if recall not in RECALL_PROFILES:
        raise ValueError(
            f"unknown recall profile {recall!r}: use one of "
            f"{sorted(RECALL_PROFILES)} or pass n_bands/n_hashes directly"
        )
    if n_bands != N_BANDS or n_hashes is not None:
        raise ValueError("pass either recall= or n_bands/n_hashes, not both")
    return RECALL_PROFILES[recall]


def minhash_lsh_pairs_with_drops(
    corpus: DataFrame,
    n_bands: int = N_BANDS,
    threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
    n_hashes: int | None = None,
    recall: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """MinHash + LSH banding near-dup pairs, fully distributed:
      1. per-doc signature -> band keys (narrow Arrow kernel);
      2. bucket by (band_id, band_hash), enumerate in-bucket pairs —
         buckets over ``max_bucket`` ids are excluded count-first (no
         giant single-task array, no quadratic blow-up; see _bucket_ids);
      3. exact-Jaccard verification of the deduped candidates.

    ``n_hashes``/``n_bands`` set the banding S-curve (rows per band =
    n_hashes // n_bands). ``n_hashes`` defaults to 2*n_bands so that
    raising n_bands keeps 2-row bands — the r6 sf1 sweep measured the
    three relevant points on the 200k-doc corpus (BENCH/BASELINE.md r6):
    16x2 (default) recall 99.982%, all misses at J in [0.5, 0.575],
    and the leanest band-exchange volume — the 100-TB default; 32x2
    (n_bands=32) measured PERFECT recall (102,615/102,615, 0 extra) at
    ~1.3x warm wall and 2x band-exchange volume; 32x1 (n_bands=32,
    n_hashes=32) also perfect recall but ~8x wall — single-row bands
    admit every J-similar pair as a candidate, so the verify leg
    dominates. Raise n_bands to 32 when near-threshold recall matters
    more than shuffle volume — or just say what you mean with
    ``recall="standard"|"high"`` (RECALL_PROFILES carries the measured
    tradeoff; mutually exclusive with explicit n_bands/n_hashes).

    Returns ``(pairs, dropped)`` — the explicit telemetry contract: the
    ``dropped`` frame (band_id, band_hash, n) enumerates every excluded
    bucket, is lazy (evaluating it re-runs the banding subtree), and is
    certified by the ``dedup_dropped_buckets`` driver query.
    """
    n_bands, n_hashes = _resolve_recall(recall, n_bands, n_hashes)
    docs = corpus.select("doc_id", "text")
    bands = minhash_band_rows(
        docs, n_hashes=(2 * n_bands if n_hashes is None else n_hashes),
        n_bands=n_bands,
    )
    # candidate pairs via ONE exchange: group band rows by bucket key and
    # enumerate ordered pairs inside each bucket. A self-join would
    # re-execute the whole scan->shingle->signature pipeline for both
    # sides (no ReusedExchange: the two sides project different aliases);
    # the groupBy computes signatures once.
    buckets, dropped = _bucket_ids(
        bands, ["band_id", "band_hash"], F.col("doc_id"), max_bucket
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(
                    F.least(x, y).alias("a_id"), F.greatest(x, y).alias("b_id")
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.a_id", "p.b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    pairs = verify_candidate_pairs(cand, docs, threshold)
    return pairs, dropped


def minhash_lsh_pairs(
    corpus: DataFrame,
    n_bands: int = N_BANDS,
    threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
    n_hashes: int | None = None,
    recall: str | None = None,
) -> DataFrame:
    """Pairs-only convenience wrapper over minhash_lsh_pairs_with_drops.
    Drop telemetry has exactly ONE contract: the ``_with_drops`` form's
    explicit second frame (certified by dedup_dropped_buckets) — this
    wrapper is for callers that consciously ignore drops."""
    pairs, _ = minhash_lsh_pairs_with_drops(
        corpus, n_bands=n_bands, threshold=threshold, max_bucket=max_bucket,
        n_hashes=n_hashes, recall=recall,
    )
    return pairs


def verify_candidate_pairs(
    cand: DataFrame, docs: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate (a_id, b_id) pairs.

    Rejoins the source text once per side (text is smaller than the
    shingle array and ships once per DEDUPED candidate pair, not once
    per band/bucket match); the Jaccard itself runs in an Arrow kernel —
    the JVM formulation (shingles() + array_intersect per pair) costs
    ~8ms/pair because higher-order-function lambdas are interpreted, vs
    ~20us/pair for C-level Python set ops."""
    par = docs.sparkSession.sparkContext.defaultParallelism * 2
    # r8 (guide §2.3 "project before the exchange", measured): the old
    # shape repartitioned AFTER the text joins, so the one explicit
    # exchange shipped |pairs| x two texts (~270 MB at sf0.1's 444k
    # candidates) just to fix the kernel's width. Instead BOTH thin
    # sides are widened explicitly BEFORE the joins — the candidate
    # pairs (16 B/row; keeps the CPU-bound kernel exempt from AQE's
    # byte-based coalescing whichever side the planner broadcasts) and
    # the doc texts (one text per doc, not per pair) — so the joined
    # pair-texts never cross an exchange: whichever join side AQE
    # broadcasts, the output inherits an explicitly par-wide
    # partitioning. At scale (docs too big to broadcast) the joins fall
    # back to shuffled joins on the same thin inputs — still never an
    # exchange of pair-expanded texts.
    cand = cand.repartition(par, "a_id", "b_id")
    ver = (
        cand.join(docs.select(F.col("doc_id").alias("a_id"),
                              F.col("text").alias("a_text"))
                  .repartition(par, "a_id"), "a_id")
        .join(docs.select(F.col("doc_id").alias("b_id"),
                          F.col("text").alias("b_text"))
              .repartition(par, "b_id"), "b_id")
        .mapInArrow(_jaccard_verify_batches, _VERIFY_SCHEMA)
    )
    return ver.where(F.col("jaccard") >= threshold)


def _shingle_rows_batches(batches):
    """Arrow-batch kernel: (doc_id, text) -> one row per DISTINCT word
    3-gram (doc_id, shingle, sz). Same gram semantics as shingles()/
    _jaccard_verify_batches (one partial gram for <3-token texts).
    Exists because the shingles() JVM expression is interpreted HOF
    (~3ms/doc) and every downstream consumer re-executes its subtree —
    the Python set build is ~10us/doc and cheap to recompute."""
    import pyarrow as pa

    for batch in batches:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id, out_sh, out_sz = [], [], []
        for doc_id, text in zip(doc_ids, texts):
            toks = _jvm_tokens(text)
            grams = {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}
            out_id.extend([doc_id] * len(grams))
            out_sh.extend(grams)
            out_sz.extend([len(grams)] * len(grams))
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_id, type=pa.int64()),
                pa.array(out_sh, type=pa.string()),
                pa.array(out_sz, type=pa.int32()),
            ],
            names=["doc_id", "shingle", "sz"],
        )


def jaccard_prefix_pairs_with_drops(
    corpus: DataFrame, threshold: float = 0.5, max_bucket: int = MAX_BUCKET
) -> tuple[DataFrame, DataFrame]:
    """EXACT set-similarity self-join via prefix filtering — the bounded
    scale path for exact Jaccard (AllPairs/PPJoin family; the MapReduce
    formulation follows Vernica/Carey/Li, SIGMOD 2010 — public
    knowledge, reimplemented on DataFrames).

    Theorem (no false negatives): order every document's shingle set by
    one global total order; if J(A,B) >= t, then A and B share at least
    one shingle within their first |S| - ceil(t*|S|) + 1 shingles. So
    candidates = docs sharing a PREFIX shingle — no quadratic blocks,
    no probabilistic recall. The global order is document-frequency
    ascending (rarest first), which provably minimizes bucket sizes:
    hot shingles land outside most prefixes.

    Pipeline: shingle -> df count -> (df, shingle)-sort -> prefix
    explode -> bucket pairs (ratio-filtered) -> exact Arrow verify.

    ``max_bucket`` bounds the prefix buckets for FREE: a bucket on
    shingle s can never exceed s's document frequency, and df is already
    computed and rides the ordered-shingle structs — so hot shingles are
    excluded by a narrow filter on the exploded prefix rows, with zero
    extra aggregation passes (unlike the LSH/SRP operators, which need
    the count-first _bucket_ids pass because their bucket sizes aren't
    known upstream). Exactness holds whenever nothing is dropped — the
    returned ``(pairs, dropped)`` tuple surfaces every excluded shingle
    as (shingle, n=df) so the caller sees precisely where (and whether)
    the no-false-negatives guarantee was traded for bound.
    """
    from pyspark.sql.types import IntegerType, StringType

    t_eff = threshold - 0.0001  # guard the 4-digit rounding edge
    par = corpus.sparkSession.sparkContext.defaultParallelism * 2
    docs = corpus.select("doc_id", "text")
    sh_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("shingle", StringType()),
            StructField("sz", IntegerType()),
        ]
    )
    ex = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .repartition(par, "doc_id")
        .mapInArrow(_shingle_rows_batches, sh_schema)
    )
    # r8 shape (guide §2.4, was: df-count agg + shingle join +
    # collect_list + interpreted array_sort over (df, shingle) structs +
    # posexplode — measured 2.9 s of the 5.5 s query at sf0.1):
    #  * document frequency rides a COUNT window over the shingle
    #    partition — no second pass of the shingle kernel, no join;
    #  * the df-ascending prefix is a ROW_NUMBER window per doc over
    #    (df, shingle) — Tungsten-codegen'd sort instead of the
    #    interpreted per-element struct comparator, and the prefix
    #    filter drops non-prefix rows without ever materializing a
    #    per-doc array. Row-for-row equal to the old slice(osh, 1,
    #    plen) + posexplode (shingles are distinct per doc, so the
    #    (df, shingle) order is total within a doc).
    # No persist anywhere: at 100 TB the shingle explosion is ~5-10x
    # text bytes and the lazy return value has no unpersist point.
    # ex's own sz column IS the per-doc distinct-shingle count the old
    # size(osh) recomputed, so only two windows are needed
    dfw = F.count("*").over(Window.partitionBy("shingle"))
    posw = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "shingle")
    )
    ranked = (
        ex.withColumn("df", dfw)
        .withColumn("pos", (posw - 1).cast("int"))
    )
    plen = (
        F.col("sz")
        - F.ceil(F.lit(t_eff) * F.col("sz")).cast("int")
        + F.lit(1)
    )
    pre = ranked.where(F.col("pos") < plen).select(
        "doc_id", "sz", "pos", "shingle", "df"
    )
    # df-ascending prefixes already push hot shingles out of most
    # prefixes; the df bound (bucket size <= df, already in hand) drops
    # the residue with a narrow filter — no counting pass needed. The
    # dropped frame stays the (lazy) aggregate form: it is telemetry,
    # evaluated only by its consumer, and re-runs the kernel then.
    dropped = (
        ex.groupBy("shingle").agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
        .select("shingle", "n")
    )
    buckets = (
        pre.where(F.col("df") <= max_bucket)
        .groupBy("shingle")
        .agg(F.collect_list(F.struct("doc_id", "sz", "pos")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    # overlap floor for J >= t: o >= ceil(t/(1+t) * (|A|+|B|))
    t_frac = t_eff / (1.0 + t_eff)
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.filter(
                F.transform(
                    F.slice(F.col("ids"), i + 2, F.size("ids")),
                    lambda y: F.struct(
                        F.least(x["doc_id"], y["doc_id"]).alias("a_id"),
                        F.greatest(x["doc_id"], y["doc_id"]).alias("b_id"),
                        F.least(x["sz"], y["sz"]).alias("mn"),
                        F.greatest(x["sz"], y["sz"]).alias("mx"),
                        # tokens at or after this shared one, per side
                        F.least(x["sz"] - x["pos"], y["sz"] - y["pos"]).alias(
                            "mn_rem"
                        ),
                    ),
                ),
                # two EXACT prunes (PPJoin family, Xiao et al.):
                #  - length ratio: J >= t implies min >= t*max;
                #  - positional: at the pair's FIRST shared prefix token
                #    the remaining suffix bounds the overlap, so
                #    min_rem < ceil(t/(1+t)*(szA+szB)) kills the pair
                #    (later shared tokens may fail this test while the
                #    first passes — OR-ing over tokens keeps exactness,
                #    and every true match passes at its first token).
                lambda p: (p["mn"] >= F.lit(t_eff) * p["mx"])
                & (p["mn_rem"] >= F.ceil(F.lit(t_frac) * (p["mn"] + p["mx"]))),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.a_id", "p.b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    pairs = verify_candidate_pairs(cand, docs, threshold)
    return pairs, dropped


def jaccard_prefix_pairs(
    corpus: DataFrame, threshold: float = 0.5, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """Pairs-only wrapper; drops are consciously ignored — use the
    ``_with_drops`` form (the one telemetry contract) to consume them."""
    pairs, _ = jaccard_prefix_pairs_with_drops(
        corpus, threshold=threshold, max_bucket=max_bucket
    )
    return pairs


def _q_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_prefix_pairs(dedup_corpus(spark, sf_dir))


_CONTAIN_SCHEMA = StructType(
    [
        StructField("a_id", LongType()),
        StructField("b_id", LongType()),
        StructField("containment", DoubleType()),
    ]
)


def _containment_verify_batches(batches):
    """Arrow-batch kernel: (a_id, b_id, a_text, b_text) -> exact
    containment C(A,B) = |S(A) ∩ S(B)| / |S(A)| of the ORDERED pair
    (a contained-in b). Same gram semantics, tokenization, and HALF-UP
    4-place rounding as _jaccard_verify_batches."""
    import math

    import pyarrow as pa

    def gram_set(text: str) -> set:
        toks = _jvm_tokens(text)
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))}

    for batch in batches:
        a_ids = batch.column("a_id").to_pylist()
        b_ids = batch.column("b_id").to_pylist()
        a_txt = batch.column("a_text").to_pylist()
        b_txt = batch.column("b_text").to_pylist()
        cons = []
        for ta, tb in zip(a_txt, b_txt):
            sa, sb = gram_set(ta), gram_set(tb)
            c = len(sa & sb) / len(sa) if sa else float("nan")
            cons.append(math.floor(c * 10000 + 0.5) / 10000)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(a_ids, type=pa.int64()),
                pa.array(b_ids, type=pa.int64()),
                pa.array(cons, type=pa.float64()),
            ],
            names=["a_id", "b_id", "containment"],
        )


def verify_containment_pairs(
    cand: DataFrame, docs: DataFrame, threshold: float
) -> DataFrame:
    """Exact-containment verification of ORDERED candidate (a_id, b_id)
    pairs — same rejoin-text-once + Arrow-kernel shape as
    verify_candidate_pairs (incl. the r8 thin-side widening: pair-
    expanded texts never cross an exchange, see there)."""
    par = docs.sparkSession.sparkContext.defaultParallelism * 2
    cand = cand.repartition(par, "a_id", "b_id")
    ver = (
        cand.join(docs.select(F.col("doc_id").alias("a_id"),
                              F.col("text").alias("a_text"))
                  .repartition(par, "a_id"), "a_id")
        .join(docs.select(F.col("doc_id").alias("b_id"),
                          F.col("text").alias("b_text"))
              .repartition(par, "b_id"), "b_id")
        .mapInArrow(_containment_verify_batches, _CONTAIN_SCHEMA)
    )
    return ver.where(F.col("containment") >= threshold)


def containment_pairs_with_drops(
    corpus: DataFrame, threshold: float = 0.8, max_bucket: int = MAX_BUCKET
) -> tuple[DataFrame, DataFrame]:
    """EXACT asymmetric-containment join: ORDERED pairs (a_id, b_id)
    where C(A,B) = |S(A) ∩ S(B)| / |S(A)| >= t — doc A (near-)contained
    in doc B. The dedup case symmetric Jaccard structurally misses:
    a short doc quoted inside a much longer one scores
    J ~ |A|/|B| -> 0 while C(A,B) = 1; containment is the standard
    quote/subsumption detector next to decontamination's eval-gram
    variant (same family as the SSJoin/prefix-filter containment joins
    of Chaudhuri et al. ICDE 2006 — public knowledge, reimplemented on
    DataFrames).

    Theorem (no false negatives): C(A,B) >= t means A shares >=
    ceil(t*|A|) shingles with B, so among A's first
    |A| - ceil(t*|A|) + 1 shingles in ANY global total order at least
    one is in S(B). Hence: the CONTAINED side emits only that prefix
    (df-ascending order — rarest first, minimizing bucket fan-out); the
    CONTAINER side must emit ALL its shingles (a tiny doc can be
    contained in any huge doc, so no symmetric prefix bound exists —
    the inverted-index shape containment fundamentally needs). Exact
    prunes on the shingle-join rows, both sides of the OR-per-token
    argument as in PPJoin: |B| >= ceil(t*|A|) (overlap <= |B|), and at
    A's first shared prefix position overlap <= |A| - pos. Candidates
    dedup then verify exactly in Arrow.

    100-TB shape: one shingle exchange (container side keys+ids only,
    contained side a short prefix), bucket sizes bounded by df with the
    same narrow df <= max_bucket filter as the Jaccard prefix join —
    dropped hot shingles surface in the returned ``(pairs, dropped)``
    tuple (boilerplate shingles that dedup_exact / the LSH path absorb);
    exactness holds whenever ``dropped`` is empty."""
    from pyspark.sql.types import IntegerType, StringType

    t_eff = threshold - 0.0001  # guard the 4-digit rounding edge
    par = corpus.sparkSession.sparkContext.defaultParallelism * 2
    docs = corpus.select("doc_id", "text")
    sh_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("shingle", StringType()),
            StructField("sz", IntegerType()),
        ]
    )
    ex = (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .repartition(par, "doc_id")
        .mapInArrow(_shingle_rows_batches, sh_schema)
    )
    # r8: same window rewrite as the Jaccard prefix join (see there) —
    # df rides a count window over the shingle partition (no df join,
    # no second kernel pass), the contained side's df-ascending prefix
    # is a row_number per doc (Tungsten sort, no collect_list /
    # interpreted array_sort / posexplode), and ex's own sz column is
    # the per-doc distinct-shingle count the old size(osh) recomputed.
    withdf = ex.withColumn(
        "df", F.count("*").over(Window.partitionBy("shingle"))
    )
    bside = withdf.where(F.col("df") <= max_bucket).select(
        "shingle", F.col("doc_id").alias("b_id"), F.col("sz").alias("b_sz")
    )
    posw = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("df", "shingle")
    )
    ranked = withdf.withColumn("pos", (posw - 1).cast("int"))
    plen = (
        F.col("sz")
        - F.ceil(F.lit(t_eff) * F.col("sz")).cast("int")
        + F.lit(1)
    )
    aside = (
        ranked.where(F.col("pos") < plen)
        .select(
            "shingle",
            F.col("doc_id").alias("a_id"),
            F.col("sz").alias("a_sz"),
            "pos", "df",
        )
        .where(F.col("df") <= max_bucket)
    )
    dropped = (
        ex.groupBy("shingle").agg(F.count("*").alias("n"))
        .where(F.col("n") > max_bucket)
        .select("shingle", "n")
    )
    need = F.ceil(F.lit(t_eff) * F.col("a_sz"))
    cand = (
        aside.join(bside, "shingle")
        .where(F.col("a_id") != F.col("b_id"))
        .where(F.col("b_sz") >= need)
        # pos is 0-based: shingles of A at or after the first shared
        # one = a_sz - pos, an upper bound on the overlap there
        .where((F.col("a_sz") - F.col("pos")) >= need)
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    pairs = verify_containment_pairs(cand, docs, threshold)
    return pairs, dropped


def containment_pairs(
    corpus: DataFrame, threshold: float = 0.8, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """Pairs-only wrapper; drops are consciously ignored — use the
    ``_with_drops`` form (the one telemetry contract) to consume them."""
    pairs, _ = containment_pairs_with_drops(
        corpus, threshold=threshold, max_bucket=max_bucket
    )
    return pairs


def _q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment over the dedup corpus: every truncated twin is fully
    contained in its base (C = 1.0) and the base is ~0.9-contained in
    its twin — both directions clear t=0.8, making recall measurable."""
    return containment_pairs(dedup_corpus(spark, sf_dir))


# Brute-force quadratic oracle (small-corpus verification baseline,
# like _SQL_MINHASH): all ordered pairs with the exact length
# pre-filter len(b.sh) >= ceil(t*len(a.sh)) (drops no true pair).
_SQL_CONTAINMENT = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(
           string_split_regex(trim(text), '\s+')[1:CAST(floor(len(string_split_regex(trim(text), '\s+')) * 0.9) AS INT)],
           ' ') AS text
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 1),
           i -> array_to_string(string_split_regex(trim(text), '\s+')[i+1:i+3], ' ')
         )) AS sh
  FROM corpus)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(a.sh), 4) AS containment
FROM sh a JOIN sh b
  ON a.doc_id <> b.doc_id
 AND len(b.sh) >= CAST(ceil(0.7999 * len(a.sh)) AS BIGINT)
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(a.sh), 4) >= 0.8
"""


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(dedup_corpus(spark, sf_dir))


# Exact oracle for the LSH query: brute-force all-pairs Jaccard >= 0.5
# over the dedup corpus, pre-filtered by the exact length condition
# (J >= t implies min(|A|,|B|) >= t*max(|A|,|B|), so the filter drops no
# true pair). The banding itself is not SQL-expressible (xxhash64), but
# its OUTPUT is deterministic on the fixed corpus and verified equal to
# the exact pair set (16 bands x 2 rows: the sf0.01 check finds all 600
# true pairs; miss probability per pair at J=0.9 planted dups ~ 3e-12,
# at the 0.5 boundary ~1%, measured zero on this corpus).
_SQL_MINHASH = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         array_to_string(
           string_split_regex(trim(text), '\s+')[1:CAST(floor(len(string_split_regex(trim(text), '\s+')) * 0.9) AS INT)],
           ' ') AS text
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(0, greatest(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 1),
           i -> array_to_string(string_split_regex(trim(text), '\s+')[i+1:i+3], ' ')
         )) AS sh
  FROM corpus)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
FROM sh a JOIN sh b
  ON a.doc_id < b.doc_id
 AND len(a.sh) >= CAST(ceil(0.5 * len(b.sh)) AS BIGINT)
 AND len(b.sh) >= CAST(ceil(0.5 * len(a.sh)) AS BIGINT)
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.5
"""


def pairs_crosscheck(corpus: DataFrame, recall: str | None = None) -> DataFrame:
    """Exact-recall cross-check of the two INDEPENDENT near-dup pair
    generators — probabilistic minhash-LSH banding vs the exact PPJoin
    prefix filter — on the same corpus at the same threshold (0.5).

    Returns ONE row: (n_pairs_lsh, n_pairs_prefix, n_symmetric_diff,
    n_dropped_lsh, n_dropped_prefix). When the symmetric difference and
    both drop counts are zero, the probabilistic generator provably
    found EXACTLY the exact generator's pair set — the strongest recall
    evidence the repo has (previously prose in BENCH/BASELINE.md: 6,024
    set-identical pairs at sf0.1), now a query that re-proves itself
    every run. One action computes everything: a full-outer join on the
    canonical (a_id, b_id) keys feeds the count/diff aggregates, and
    the lazy drop frames reduce to counts (their banding subtrees are
    keys-only — cheap relative to either verify stage). At sf0.01 the
    DuckDB oracle recomputes the truth by brute force; at scales where
    the quadratic oracle is infeasible the row is SELF-certifying
    (tools/check_queries.py asserts diff == drops == 0 Spark-side).

    ``recall`` selects the LSH banding profile under test (see
    RECALL_PROFILES); the exact-PPJoin side is profile-independent, so
    a ``recall="high"`` run directly measures that profile's recall
    against exact truth."""
    lsh, d_lsh = minhash_lsh_pairs_with_drops(corpus, recall=recall)
    pre, d_pre = jaccard_prefix_pairs_with_drops(corpus)
    # both generators emit distinct canonical keys by construction, but
    # the comparison must not DEPEND on it: a duplicated (a_id, b_id) on
    # either side would fan out the full-outer join and inflate both
    # counts instead of flagging the bug — dedup the keys first (the
    # dropDuplicates folds into each side's existing aggregation)
    j = (
        lsh.select("a_id", "b_id", F.lit(1).alias("in_lsh"))
        .dropDuplicates(["a_id", "b_id"])
        .join(
            pre.select("a_id", "b_id", F.lit(1).alias("in_prefix"))
            .dropDuplicates(["a_id", "b_id"]),
            ["a_id", "b_id"],
            "full_outer",
        )
    )
    sym = j.agg(
        F.coalesce(F.sum("in_lsh"), F.lit(0)).cast("bigint").alias("n_pairs_lsh"),
        F.coalesce(F.sum("in_prefix"), F.lit(0))
        .cast("bigint")
        .alias("n_pairs_prefix"),
        F.coalesce(
            F.sum(
                (F.col("in_lsh").isNull() | F.col("in_prefix").isNull()).cast("long")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_symmetric_diff"),
    )
    da = d_lsh.agg(F.count("*").cast("bigint").alias("n_dropped_lsh"))
    db = d_pre.agg(F.count("*").cast("bigint").alias("n_dropped_prefix"))
    return sym.crossJoin(da).crossJoin(db)  # three 1-row frames


def _q_pairs_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pairs_crosscheck(dedup_corpus(spark, sf_dir))


def _q_pairs_crosscheck_high(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crosscheck in the HIGH recall profile (32x2 banding): the
    r6 sf1 sweep measured this configuration at perfect recall — this
    extras-tier row re-proves diff == drops == 0 against exact PPJoin
    truth every sweep, so the profile's claim is a query, not a
    BENCH/BASELINE.md footnote (r6 verdict #5). Shares the standard
    crosscheck's oracle/invariant: the expected outcome (set identity
    with exact truth) is profile-independent wherever both are exact."""
    return pairs_crosscheck(dedup_corpus(spark, sf_dir), recall="high")


# Planted truth: both generators must equal the brute-force pair count
# (LSH by measured-zero misses on this corpus, prefix by theorem), with
# zero symmetric difference and zero dropped buckets on either side.
_SQL_CROSSCHECK = f"""
WITH truth AS ({_SQL_MINHASH})
SELECT CAST(count(*) AS BIGINT) AS n_pairs_lsh,
       CAST(count(*) AS BIGINT) AS n_pairs_prefix,
       CAST(0 AS BIGINT) AS n_symmetric_diff,
       CAST(0 AS BIGINT) AS n_dropped_lsh,
       CAST(0 AS BIGINT) AS n_dropped_prefix
FROM truth
"""


SIMHASH_BITS = 60

# 60-bit SimHash as ONE whole-stage-codegen JVM expression: token hash =
# first 15 hex chars of md5 (60 bits keeps every value positive in
# int64), per-bit +/-1 votes folded with a single aggregate over the
# token array, majority vote packed back into a BIGINT. md5 (unlike
# xxhash64) exists in DuckDB too, so the oracle mirrors the arithmetic
# exactly. Zero Python anywhere.
_SIMHASH_EXPR = r"""
CAST(aggregate(
  zip_with(
    aggregate(
      transform(split(trim(lower({c})), '\\s+'),
                w -> CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)),
      array_repeat(CAST(0 AS BIGINT), 60),
      (acc, h) -> zip_with(acc,
                           transform(sequence(0, 59),
                                     j -> (shiftright(h, j) & CAST(1 AS BIGINT)) * 2 - 1),
                           (a, b) -> a + b)),
    sequence(0, 59),
    (v, j) -> IF(v > 0, shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))),
  CAST(0 AS BIGINT), (acc, x) -> acc + x) AS BIGINT)
"""

# The identical hash in DuckDB list algebra (hex digits folded with
# list_reduce; verified bit-identical on the corpus + unicode edges).
_SIMHASH_SQL = r"""
CAST(list_sum(list_transform(range(0, 60), j ->
  CASE WHEN list_sum(list_transform(
         list_transform(string_split_regex(trim(lower({c})), '\s+'),
           w -> list_reduce(
                  list_transform(range(1, 16),
                    p -> CAST(strpos('0123456789abcdef',
                                     substring(md5(w), CAST(p AS INT), 1)) - 1 AS BIGINT)),
                  (a, b) -> a * 16 + b)),
         h -> ((h >> CAST(j AS INT)) & CAST(1 AS BIGINT)) * 2 - 1)) > 0
       THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
"""


def simhash60(col_name: str):
    """SimHash of a text column as a JVM-side Column expression."""
    return F.expr(_SIMHASH_EXPR.format(c=col_name))


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select("doc_id", simhash60("text").alias("simhash"))


_SQL_SIMHASH = f"""
SELECT doc_id, {_SIMHASH_SQL.format(c="text")} AS simhash FROM documents
"""


# Scale-default banding (Manku/Jain/Sarma, WWW 2007 "Detecting
# Near-Duplicates for Web Crawling" configuration family): a SMALL
# hamming radius with WIDE chunks. Chunk width is the candidate
# selectivity knob — each join key (chunk_id, chunk_val) has 2^width
# values, so expected random-collision candidates ~ n_chunks * N^2 /
# 2^width / 2. At 4 bits (the radius-12 exactness mode) that is
# Theta(N^2) for ANY corpus (1/16 collision odds); at 15 bits it is
# N^2/32768 per chunk — sub-linear in practice until N ~ 10^5 per
# shuffle partition, and AQE skew-split bounds the residue.
SIMHASH_SCALE_HAMMING = 3
SIMHASH_SCALE_CHUNKS = 4  # 4 chunks x 15 bits; exact recall <= 3


def _simhash_batches(batches):
    """Arrow-batch kernel: (doc_id, text) -> (doc_id, sh) — the EXACT
    60-bit md5 simhash _SIMHASH_EXPR computes, ~100x cheaper: the JVM
    expression is an interpreted HOF (md5 + 60 bit-votes per token,
    measured ~1.6ms/doc, and a self-join evaluates it twice), while here
    md5 runs in C (hashlib, memoized per batch vocabulary) and the
    bit-vote fold is one NumPy matrix op per doc. Bit-equality with the
    expression is pinned by test_simhash_kernel_matches_expression.

    Tokenization mirrors split(trim(lower(text)), '\\s+') via
    _jvm_tokens; token hash = first 15 hex chars of md5(utf-8 bytes),
    like conv(substring(md5(w),1,15),16,10); votes count token
    OCCURRENCES (no distinct), bit j set iff votes_j > 0."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    bits = np.arange(SIMHASH_BITS, dtype=np.uint64)
    one = np.uint64(1)

    for batch in batches:
        # memo scope = ONE Arrow batch: bounded by the batch's
        # vocabulary, not the whole task's — a high-cardinality corpus
        # (IDs, URLs) must not grow a task-lifetime dict toward the
        # partition's full distinct-token set
        cache: dict[str, int] = {}

        def tok_hash(w: str) -> int:
            h = cache.get(w)
            if h is None:
                h = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                cache[w] = h
            return h

        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = np.empty(len(doc_ids), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = _jvm_tokens((text or "").lower())
            hs = np.fromiter(
                (tok_hash(w) for w in toks), dtype=np.uint64, count=len(toks)
            )
            b = (hs[:, None] >> bits) & one  # (n_toks, 60)
            votes = 2 * b.sum(axis=0, dtype=np.int64) - len(toks)
            out[i] = int(((votes > 0).astype(np.uint64) << bits).sum())
        yield pa.RecordBatch.from_arrays(
            [pa.array(doc_ids, type=pa.int64()),
             pa.array(out, type=pa.int64())],
            names=["doc_id", "sh"],
        )


def simhash_rows(corpus: DataFrame) -> DataFrame:
    """(doc_id, sh) via the Arrow kernel (the pairs operators' fast
    path; the driver-certified dedup_simhash query keeps the pure JVM
    expression, and a test pins the two bit-equal)."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("sh", LongType())]
    )
    par = corpus.sparkSession.sparkContext.defaultParallelism * 2
    return (
        corpus.select(F.col("doc_id").cast("long").alias("doc_id"), "text")
        .repartition(par, "doc_id")
        .mapInArrow(_simhash_batches, schema)
    )


def simhash_chunk_rows(corpus: DataFrame, n_chunks: int) -> DataFrame:
    """(doc_id, sh, chunk_id, chunk_val) rows: each 60-bit simhash split
    into n_chunks equal-width chunks (width = 60 // n_chunks)."""
    bits_per = SIMHASH_BITS // n_chunks
    mask = (1 << bits_per) - 1
    chunk_structs = [
        F.struct(
            F.lit(i).alias("chunk_id"),
            F.shiftrightunsigned("sh", i * bits_per)
            .bitwiseAND(F.lit(mask))
            .alias("chunk_val"),
        )
        for i in range(n_chunks)
    ]
    return simhash_rows(corpus).select(
        "doc_id", "sh", F.explode(F.array(*chunk_structs)).alias("c")
    ).select("doc_id", "sh", "c.chunk_id", "c.chunk_val")


def simhash_candidate_pairs_with_drops(
    corpus: DataFrame, n_chunks: int, max_bucket: int = MAX_BUCKET
) -> tuple[DataFrame, DataFrame]:
    """Distinct candidate (a_id, b_id, a_sh, b_sh) pairs from chunk
    bucketing — exposed separately so tests/benchmarks can measure
    candidate-set growth per banding config (the scale-defining number:
    verification cost is linear in it).

    Same shape as the LSH/SRP generators: groupBy the chunk key (ONE
    exchange — a self-join would evaluate the simhash subtree twice) and
    enumerate in-bucket pairs, with the count-first hot-bucket cap;
    returns ``(candidates, dropped)``."""
    chunks = simhash_chunk_rows(corpus, n_chunks)
    buckets, dropped = _bucket_ids(
        chunks, ["chunk_id", "chunk_val"], F.struct("doc_id", "sh"), max_bucket
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(
                    F.least(x["doc_id"], y["doc_id"]).alias("a_id"),
                    F.greatest(x["doc_id"], y["doc_id"]).alias("b_id"),
                    # hamming is symmetric: side assignment is free
                    x["sh"].alias("a_sh"),
                    y["sh"].alias("b_sh"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.a_id", "p.b_id", "p.a_sh", "p.b_sh")
        .dropDuplicates(["a_id", "b_id"])
    )
    return cand, dropped


def simhash_candidate_pairs(
    corpus: DataFrame, n_chunks: int, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """Candidates-only wrapper; drops are consciously ignored — use the
    ``_with_drops`` form (the one telemetry contract) to consume them."""
    cand, _ = simhash_candidate_pairs_with_drops(
        corpus, n_chunks, max_bucket=max_bucket
    )
    return cand


def simhash_pairs_with_drops(
    corpus: DataFrame,
    max_hamming: int = 12,
    n_chunks: int = 15,
    max_bucket: int = MAX_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """SimHash near-dup pairs via pigeonhole chunk banding.

    Split each 60-bit simhash into n_chunks equal chunks; any pair with
    hamming distance < n_chunks must share at least one chunk
    (pigeonhole), so candidates come from a shuffle join on
    (chunk_id, chunk_value) — never a cross product — then are verified
    by exact popcount of the XOR. Exact recall requires
    max_hamming <= n_chunks - 1 (asserted) AND no bucket over
    ``max_bucket``: dropped hot buckets (the second element of the
    returned tuple) trade recall for bound. NOTE the interaction
    in the (12, 15) mode: 4-bit chunks have only 16 values, so a
    uniform corpus over ~16*max_bucket docs drops EVERY bucket — check
    the drops frame or raise ``max_bucket`` when running the exactness
    mode beyond its small-corpus design point (the `_scale` config's
    15-bit chunks do not have this cliff; the registered exactness query
    enforces zero drops via ``assert_no_drops``).

    Config tradeoff (see SIMHASH_SCALE_* above): the (12, 15) default
    guarantees radius-12 recall but its 4-bit chunks collide at 1/16 —
    Theta(N^2) candidates on any corpus — so it is the small-corpus
    EXACTNESS-ORACLE mode. The production configuration is
    (SIMHASH_SCALE_HAMMING=3, SIMHASH_SCALE_CHUNKS=4): 15-bit chunks,
    ~N^2/2^15 expected random candidates per chunk — near-linear until
    extreme N (the Manku-style web-crawl setting; candidate growth is
    asserted ~linear by test and measured in bench).
    """
    if max_hamming > n_chunks - 1:
        raise ValueError(
            f"simhash_pairs: pigeonhole recall requires max_hamming <= "
            f"n_chunks - 1 (got max_hamming={max_hamming}, n_chunks={n_chunks})"
        )
    cand, dropped = simhash_candidate_pairs_with_drops(
        corpus, n_chunks, max_bucket=max_bucket
    )
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))).cast("int")
    pairs = (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )
    return pairs, dropped


def simhash_pairs(
    corpus: DataFrame,
    max_hamming: int = 12,
    n_chunks: int = 15,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Pairs-only wrapper; drops are consciously ignored — use the
    ``_with_drops`` form (the one telemetry contract) to consume them."""
    pairs, _ = simhash_pairs_with_drops(
        corpus, max_hamming=max_hamming, n_chunks=n_chunks, max_bucket=max_bucket
    )
    return pairs


def assert_no_drops(dropped: DataFrame, context: str) -> None:
    """Fail fast when a bucketed candidate generator dropped ANY bucket
    while running in an exactness-guaranteed mode. The count is one
    cheap keys-only job (the banding subtree re-executes, but only up to
    the partial-aggregated bucket counts — no arrays, no pairs)."""
    hot = dropped.limit(5).collect()
    if hot:
        keys = ", ".join(str(tuple(r)) for r in hot)
        raise RuntimeError(
            f"{context}: hot-bucket cap dropped buckets ({keys}, ...) — "
            "the exactness guarantee no longer holds on this corpus; "
            "raise max_bucket or switch to the bounded scale config"
        )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTNESS-ORACLE mode (radius 12, 4-bit chunks): guarded — on a
    corpus big/uniform enough to overflow max_bucket the (12, 15) cliff
    (see simhash_pairs_with_drops) would silently diverge from the
    brute-force oracle, so any drop raises instead."""
    pairs, dropped = simhash_pairs_with_drops(dedup_corpus(spark, sf_dir))
    assert_no_drops(dropped, "dedup_simhash_pairs (exactness-oracle mode)")
    return pairs


def _q_simhash_pairs_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production banding (radius 3, 4x15-bit chunks) as its own
    driver-certified query: same exact-recall guarantee at its radius,
    near-linear candidate generation (the at-scale default)."""
    return simhash_pairs(
        dedup_corpus(spark, sf_dir),
        max_hamming=SIMHASH_SCALE_HAMMING,
        n_chunks=SIMHASH_SCALE_CHUNKS,
    )


# Exact oracle: all-pairs hamming over the same 60-bit simhash. Unlike
# LSH this needs no luck — the pigeonhole banding has GUARANTEED exact
# recall for hamming <= n_chunks - 1, so Spark output == brute force.
_SQL_SIMHASH_PAIRS = f"""
WITH corpus AS ({_SQL_CORPUS}),
s AS (SELECT doc_id, {_SIMHASH_SQL.format(c="text")} AS sh FROM corpus)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 12
"""

# The scale config's oracle: identical brute force at radius 3 — the
# pigeonhole guarantee (4 chunks) makes Spark output == brute force.
_SQL_SIMHASH_PAIRS_SCALE = f"""
WITH corpus AS ({_SQL_CORPUS}),
s AS (SELECT doc_id, {_SIMHASH_SQL.format(c="text")} AS sh FROM corpus)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= {SIMHASH_SCALE_HAMMING}
"""


DECONTAM_NGRAM = 8
EVAL_MOD = 50  # stand-in benchmark set: originals with doc_id % 50 == 0


def decontaminate_flags(
    corpus: DataFrame, eval_docs: DataFrame, n: int = DECONTAM_NGRAM
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    n-gram with the evaluation set (the train/test-contamination check
    every LLM data pipeline runs before training; n-gram overlap is the
    standard criterion, e.g. the GPT-3/PaLM decontamination recipes —
    public knowledge).

    Spark shape for 100 TB: the eval set is small by nature, so its
    distinct n-gram set is BROADCAST and the corpus side is a map-only
    explode + broadcast hash join — the 10^12-row side never shuffles.
    Returns (doc_id, n_hits) for flagged docs only.
    """
    grams = F.explode(shingles(F.col("text"), n=n)).alias("gram")
    eval_grams = eval_docs.select(grams).distinct()
    corpus_grams = corpus.select("doc_id", grams)
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hits"))
    )


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination over the dedup corpus: the benchmark stand-in is
    every 50th ORIGINAL doc; their planted truncations (doc_id + 1M)
    share almost all n-grams and must be flagged — a guaranteed
    non-trivial result the DuckDB oracle reproduces exactly."""
    corpus = dedup_corpus(spark, sf_dir)
    is_eval = (F.col("doc_id") % EVAL_MOD == 0) & (F.col("doc_id") < 1_000_000)
    flags = decontaminate_flags(corpus.where(~is_eval), corpus.where(is_eval))
    return flags


_SQL_DECONTAM = rf"""
WITH corpus AS ({_SQL_CORPUS}),
g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(0, greatest(len(string_split_regex(trim(text), '\s+')) - {DECONTAM_NGRAM}, 0) + 1),
           i -> array_to_string(string_split_regex(trim(text), '\s+')[i+1:i+{DECONTAM_NGRAM}], ' ')
         ))) AS gram
  FROM corpus),
e AS (SELECT DISTINCT gram FROM g
      WHERE doc_id % {EVAL_MOD} = 0 AND doc_id < 1000000)
SELECT doc_id, count(DISTINCT gram) AS n_hits
FROM g JOIN e USING (gram)
WHERE NOT (doc_id % {EVAL_MOD} = 0 AND doc_id < 1000000)
GROUP BY doc_id
"""


def _set_ckpt_dir(sc, checkpoint_dir: str, context: str) -> str | None:
    """Point the session at ``checkpoint_dir``, returning the prior dir
    to restore (None if there was none — in which case ours REMAINS
    after the call, Spark has no unset, and we warn: a later unrelated
    checkpoint() on the shared session will land in a dir the caller
    was told to delete)."""
    prior = sc.getCheckpointDir()
    if prior is None:
        import warnings

        warnings.warn(
            f"{context}: session had no checkpoint dir; {checkpoint_dir!r} "
            "will remain the session checkpoint dir after this call (Spark "
            "cannot unset it) — later unrelated checkpoint() calls will "
            "write there, so do not delete it while the session is live, "
            "or set your own dir first",
            stacklevel=3,
        )
    sc.setCheckpointDir(checkpoint_dir)
    return prior


def _truncate_lineage(df: DataFrame, reliable: bool) -> DataFrame:
    """Eagerly cut a frame's lineage: reliable storage-backed checkpoint
    (persist-first so the eager count and the checkpoint write share one
    execution) when the session has a checkpoint dir, else
    localCheckpoint (executor-resident blocks)."""
    if reliable:
        base = df.persist()
        out = df.checkpoint(eager=True)
        base.unpersist()
        return out
    return df.localCheckpoint(eager=True)


def _star_edges(edges: DataFrame, large: bool, dedup: bool = True) -> DataFrame:
    """One star operation of the alternating connected-components
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014 — public knowledge, reimplemented on DataFrames).

    ``edges`` is canonical: a_id < b_id, distinct, no self-loops.
    - large-star: every node u connects each STRICTLY LARGER neighbor
      to m = min(N(u) ∪ {u});
    - small-star: every node u connects each strictly smaller neighbor,
      and itself, to the min of those smaller neighbors.
    Both preserve connectivity exactly; alternating them converges to
    a star forest rooted at each component's minimum in O(log n)
    rounds.

    r8 optimization (guide §2.4): the per-node neighborhood min is a
    ``min(...) over (partition by node)`` WINDOW instead of the old
    groupBy + self-join — one exchange + one partition-local sort per
    star op where the join form paid two exchanges AND (as sort-merge at
    scale) two sorts anyway. Duplicate edges never change a min, so
    ``dedup=False`` lets the large-star feed the small-star raw and
    defers the distinct to once per (large, small) round — the per-round
    canonical edge SET (what the convergence signature hashes) is
    identical either way; only transient multiplicity differs."""
    if large:
        d = edges.unionByName(
            edges.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
        )
        mn = F.min("b_id").over(Window.partitionBy("a_id"))
        out = (
            d.withColumn("mn", mn)
            .where(F.col("b_id") > F.col("a_id"))
            .select(
                F.col("b_id").alias("x"),
                F.least("mn", "a_id").alias("y"),
            )
        )
    else:
        # orient u = max endpoint: u's smaller-neighbor list is exactly
        # its canonical-edge partners, so min(smaller nbrs) = min(v)
        d = edges.select(
            F.col("b_id").alias("u"), F.col("a_id").alias("v")
        )
        withm = d.withColumn("mn", F.min("v").over(Window.partitionBy("u")))
        out = withm.select(F.col("v").alias("x"), F.col("mn").alias("y")).unionByName(
            withm.select(F.col("u").alias("x"), F.col("mn").alias("y"))
        )
    out = out.select(
        F.least("x", "y").alias("a_id"), F.greatest("x", "y").alias("b_id")
    ).where(F.col("a_id") != F.col("b_id"))
    return out.distinct() if dedup else out


def _two_star_components(
    pairs: DataFrame,
    max_iter: int,
    checkpoint_dir: str | None,
    round_counter: list | None,
) -> DataFrame:
    """Alternating large-star/small-star connected components — the
    LONG-CHAIN scale mode: min-label propagation needs diameter rounds
    (a 1,000-link drifting near-dup chain = ~1,000 joins at 100 TB),
    this converges in O(log diameter) rounds (round count asserted by
    test on a 1,024-node path). Same output contract as the min-label
    mode: (doc_id, keeper_id, cluster_size) — including a (d, d, 1)
    singleton row for a node whose only pairs are self-loops (the star
    loop drops self-loops up front, so those nodes are re-added
    explicitly; r5 ADVICE).

    Convergence = the canonical edge set reaches a fixed point of one
    full (large, small) round, detected by a collision-resistant
    signature (count + bit_xor(xxhash64(a, b)) — xor cannot overflow
    under ANSI mode and is order-insensitive over the distinct set); the
    result is then PROVEN consistent, not assumed: every original pair
    must connect two nodes with equal labels (one O(E) join), so a
    signature collision cannot emit a silently-split cluster."""
    sc = pairs.sparkSession.sparkContext
    prior_ckpt_dir = None
    if checkpoint_dir is not None:
        prior_ckpt_dir = _set_ckpt_dir(
            sc, checkpoint_dir, "connected_components_pairs(mode='twostar')"
        )
    reliable = checkpoint_dir is not None
    edges0 = (
        pairs.select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
        )
        .where(F.col("a_id") != F.col("b_id"))
        .distinct()
        .persist()
    )
    try:
        edges = edges0
        prev_sig = None
        rounds = 0
        for _ in range(max_iter):
            # one distinct per round: the large-star output feeds the
            # small-star raw (dedup=False — min is duplicate-blind, the
            # per-round canonical SET is unchanged; see _star_edges)
            nxt = _star_edges(
                _star_edges(edges, large=True, dedup=False), large=False
            )
            # truncate every round: each star op references its input
            # 2-3x, so the logical plan would grow ~6x per round. On
            # the localCheckpoint path the cut is NON-eager (the plan
            # is truncated immediately either way) so the signature agg
            # below is the one materializing job per round — the old
            # eager cut + separate agg paid two.
            if reliable:
                nxt = _truncate_lineage(nxt, True)
            else:
                nxt = nxt.localCheckpoint(eager=False)
            rounds += 1
            sig = tuple(
                nxt.agg(
                    F.count("*"), F.bit_xor(F.xxhash64("a_id", "b_id"))
                ).collect()[0]
            )
            edges = nxt
            if sig == prev_sig:
                break
            prev_sig = sig
        else:
            raise RuntimeError(
                f"connected_components_pairs(mode='twostar'): not converged "
                f"after {max_iter} rounds — O(log n) convergence makes this "
                "a bug or an absurd graph; raise max_iter"
            )
        if round_counter is not None:
            round_counter.append(rounds)
        # converged star forest: every canonical edge is (root, child)
        # with root = component min; label roots with themselves
        labels = edges.select(
            F.col("b_id").alias("id"), F.col("a_id").alias("label")
        ).unionByName(
            edges.select(F.col("a_id").alias("id"), F.col("a_id").alias("label"))
        ).distinct()
        # a node can appear only if some star edge touches it; original
        # nodes form components of size >= 2, so all must be present AND
        # consistent — prove it against the ORIGINAL edges
        bad = (
            edges0.join(
                labels.select(F.col("id").alias("a_id"), F.col("label").alias("la")),
                "a_id",
                "left",
            )
            .join(
                labels.select(F.col("id").alias("b_id"), F.col("label").alias("lb")),
                "b_id",
                "left",
            )
            .where(
                F.col("la").isNull()
                | F.col("lb").isNull()
                | (F.col("la") != F.col("lb"))
            )
            .count()
        )
        if bad:
            raise RuntimeError(
                f"connected_components_pairs(mode='twostar'): {bad} original "
                "pairs violate label consistency — convergence signature "
                "collision or star invariant broken"
            )
        sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
        out = labels.join(sizes, "label").select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("keeper_id"),
            F.col("cluster_size").cast("int").alias("cluster_size"),
        )
        # self-loop-ONLY nodes never reach edges0 (the canonical set
        # filters a != b) but minlabel emits them as (d, d, 1) —
        # re-add the ones no real edge touches so both modes share one
        # output contract (r5 ADVICE)
        loop_ids = (
            pairs.where(F.col("a_id") == F.col("b_id"))
            .select(F.col("a_id").alias("id"))
            .distinct()
        )
        edge_ids = edges0.select(F.col("a_id").alias("id")).unionByName(
            edges0.select(F.col("b_id").alias("id"))
        )
        singletons = loop_ids.join(edge_ids, "id", "left_anti").select(
            F.col("id").alias("doc_id"),
            F.col("id").alias("keeper_id"),
            F.lit(1).cast("int").alias("cluster_size"),
        )
        return _truncate_lineage(out.unionByName(singletons), reliable)
    finally:
        edges0.unpersist()
        if prior_ckpt_dir is not None:
            sc.setCheckpointDir(prior_ckpt_dir)


class ComponentsNotConverged(RuntimeError):
    """Min-label ran out of rounds (pair-graph diameter > max_iter) —
    or, with ``_bail_ratio`` set, gave up EARLY because the change
    frontier was not collapsing (the chain-graph signature).

    Raised instead of silently emitting split clusters; ``mode="auto"``
    catches exactly this and falls back to the O(log diameter) two-star
    contraction. ``rounds_used`` carries how many propagation rounds ran
    before the raise; ``partial_labels`` (r8) carries the last
    checkpointed (id, label) frame so auto can contract the graph by the
    labels already computed instead of discarding that work — label(u)
    is always a node id inside u's component and the component minimum
    keeps itself as label, so the label-quotient graph has exactly the
    original components (with minima preserved) at a fraction of the
    edges and diameter."""

    def __init__(
        self, msg: str, rounds_used: int = 0, partial_labels=None
    ):
        super().__init__(msg)
        self.rounds_used = rounds_used
        self.partial_labels = partial_labels


# mode="auto": frontier-decay bail threshold. A COST heuristic, never a
# correctness knob (a false bail just takes the equally-correct twostar
# path): on a dense near-dup cluster (near-clique — the overwhelmingly
# common shape) the per-round changed-label count collapses
# geometrically (round 2 is a small fraction of round 1), while on a
# drifting chain the min label advances ~one hop per round and the
# frontier stays flat. From round 2 on (r8: was round 3 — a clique's
# round-2 count already collapses toward 0, so one comparison suffices
# and saves a ~1 s round on chain graphs), if this round changed more
# than _AUTO_BAIL_RATIO of the previous round's count, the graph is
# chain-shaped and the remaining budget would be wasted — bail to
# twostar immediately instead of burning all _AUTO_MINLABEL_ROUNDS.
_AUTO_BAIL_RATIO = 0.5

# r8 (ADVICE): never bail on a TINY frontier — a nearly-converged dense
# graph whose last few labels trickle in (e.g. 3 -> 2 changed) would
# otherwise false-bail into a full two-star contraction exactly where
# the remaining min-label rounds are cheapest. Below this many changed
# labels the bail check is skipped and min-label runs out its budget.
_AUTO_BAIL_MIN_FRONTIER = 256

# mode="auto": max rounds of min-label to attempt before falling back
# to two-star. Dense near-dup clusters (the overwhelmingly common
# shape) converge in 2-4 rounds of the cheaper per-round op (one join +
# one agg vs two-star's two of each); a drifting-chain graph exits via
# the _AUTO_BAIL_RATIO frontier check at ~round 2, so this cap only
# bounds the slow-but-still-collapsing middle ground.
_AUTO_MINLABEL_ROUNDS = 6


def connected_components_pairs(
    pairs: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    mode: str = "minlabel",
    round_counter: list | None = None,
    _bail_ratio: float | None = None,
    _bail_min_frontier: int | None = None,
) -> DataFrame:
    """Connected components over a near-dup pair graph — the operator
    that turns PAIRS into dedup DECISIONS: every doc in a duplicate
    cluster maps to the cluster's smallest doc_id (the deterministic
    keeper). Two modes behind one API:

    - ``mode="minlabel"`` (default, the ORACLE mode — mirrored exactly
      by the DuckDB recursive-CTE closure): distributed min-label
      propagation. Each node starts labeled with its own id; every
      round each node takes the min of its label and its neighbors'
      labels; converged when no label changes. Rounds needed = graph
      diameter — tiny for dup clusters (near-dup families are dense),
      and ``max_iter`` bounds pathology.
    - ``mode="twostar"`` (the LONG-CHAIN scale mode): alternating
      large-star/small-star contraction (Kiveris et al., SoCC 2014),
      O(log diameter) rounds — see _two_star_components. Same output,
      property-tested equal to minlabel and to a union-find.
    - ``mode="auto"``: min-label for up to ``_AUTO_MINLABEL_ROUNDS``
      rounds (dense dup clusters converge in 2-4 of the cheaper
      per-round op) with the ``_AUTO_BAIL_RATIO`` frontier-decay check
      (r7; r8: from round 2, with the _AUTO_BAIL_MIN_FRONTIER floor
      so tiny trickling frontiers never false-bail): if the changed
      count is not
      collapsing (chain signature — the frontier advances one hop per
      round instead of shrinking geometrically), bail immediately
      instead of burning the rest of the budget. Either exit path
      raises ``ComponentsNotConverged`` and falls back to two-star on
      the original pairs — fast on the common dense shape,
      O(log diameter) on chains, never fails on diameter alone. The
      output is mode-independent (property-tested; the bail is a cost
      heuristic only — a false bail just takes the equally-correct
      two-star path), so callers lose nothing by not choosing.

    ``round_counter``: optional list; the number of propagation rounds
    actually used is appended (tests assert the O(log n) bound). Per
    round (r8 shape): one edges-labels join and ONE fused aggregation
    over (messages UNION self rows) that yields the new label AND the
    old one, so the changed count is a filter on the materialized frame
    — no second join, no changed-count join; labels truncated and the
    previous round released, so lineage stays flat and the working
    set is one (id, label) frame — at 100 TB that frame holds only docs
    that appear in some pair, orders of magnitude smaller than the
    corpus.

    Lineage truncation is NOT optional here, and it runs EVERY round:
    each round's frame references the previous one twice (directly and
    through the neighbor-min join), so the LOGICAL plan doubles per
    round — ``persist`` alone caches data but keeps the plan, and the
    driver pays Catalyst analysis/optimization EXPONENTIAL in the
    rounds since the last truncation even though execution reads the
    cache (measured at sf0.1: rounds 0.5-0.7 s right after a
    truncation, 27-47 s four rounds later; truncating every round cut
    the 19-round loop 245 s -> 12.9 s, and pre-truncation r4 the
    analysis itself OOM'd the driver by ~15 rounds). The per-round
    eager cut is cheap because the label frame is small (one row per
    pair-connected doc). Truncation is a reliable ``checkpoint`` into
    ``checkpoint_dir`` when set (an HDFS/object-store path on a real
    cluster — survives executor loss), else ``localCheckpoint``
    (executor-resident blocks). Caller contract for ``checkpoint_dir``: the
    files written there are NOT auto-deleted (Spark only removes
    reliable checkpoints when spark.cleaner.referenceTracking.
    cleanCheckpoints is enabled) — pass a per-job directory and delete
    it after consuming the result; the session's checkpoint dir is
    restored on exit when one was previously set (Spark cannot unset
    it, so otherwise ours remains).

    Returns (doc_id, keeper_id, cluster_size).
    """
    if mode == "twostar":
        return _two_star_components(pairs, max_iter, checkpoint_dir, round_counter)
    if mode == "auto":
        # persist the PAIRS input across attempt + fallback: on bail the
        # two-star leg would otherwise recompute the whole upstream pair
        # generator (e.g. the simhash banding subtree — measured ~5-7 s
        # of the r7 bench row, as large as the bail savings themselves).
        # Safe to release in finally: both legs return eagerly
        # lineage-truncated frames, self-contained by return time.
        # r8 (ADVICE): only add — and later drop — the cache when the
        # caller had not already persisted the frame, so auto mode never
        # silently evicts a caller's own cache on exit.
        sl = pairs.storageLevel
        _we_persisted = not (sl.useMemory or sl.useDisk)
        if _we_persisted:
            pairs = pairs.persist()
        try:
            return connected_components_pairs(
                pairs,
                max_iter=min(max_iter, _AUTO_MINLABEL_ROUNDS),
                checkpoint_dir=checkpoint_dir,
                mode="minlabel",
                round_counter=round_counter,
                # frontier-decay early bail (see _AUTO_BAIL_RATIO): on a
                # chain graph, stop wasting the budget after ~2 rounds
                _bail_ratio=_AUTO_BAIL_RATIO,
            )
        except ComponentsNotConverged as e:
            # the failed attempt appended nothing to round_counter and
            # its caches were released in the minlabel finally block —
            # except the last checkpointed label frame, which r8 reuses:
            # contract the graph by those labels (label(u) is a node id
            # inside u's component, and the component minimum keeps
            # itself as label, so the quotient has exactly the original
            # components with minima preserved — at the bench graph,
            # 3,414 pairs contract to ~210 quotient edges and two-star
            # needs 3 rounds instead of 5), run two-star on the
            # quotient, and compose keeper(u) = keeper_q(label(u)).
            lab = e.partial_labels
            if lab is None:
                return _two_star_components(
                    pairs, max_iter, checkpoint_dir, round_counter
                )
            la = lab.select(F.col("id").alias("a_id"), F.col("label").alias("_la"))
            lb = lab.select(F.col("id").alias("b_id"), F.col("label").alias("_lb"))
            q = (
                pairs.select("a_id", "b_id")
                .join(la, "a_id")
                .join(lb, "b_id")
                .select(F.col("_la").alias("a_id"), F.col("_lb").alias("b_id"))
            )
            qout = _two_star_components(q, max_iter, checkpoint_dir, round_counter)
            out = lab.join(
                qout.select(F.col("doc_id").alias("label"), "keeper_id"),
                "label",
            ).select(F.col("id").alias("doc_id"), "keeper_id")
            sizes = out.groupBy("keeper_id").agg(
                F.count("*").alias("cluster_size")
            )
            out = out.join(sizes, "keeper_id").select(
                "doc_id",
                "keeper_id",
                F.col("cluster_size").cast("int").alias("cluster_size"),
            )
            return _truncate_lineage(out, checkpoint_dir is not None)
        finally:
            if _we_persisted:
                pairs.unpersist()
    if mode != "minlabel":
        raise ValueError(
            f"unknown mode {mode!r}: use 'minlabel', 'twostar', or 'auto'"
        )
    sc = pairs.sparkSession.sparkContext
    prior_ckpt_dir = None
    if checkpoint_dir is not None:
        # setCheckpointDir is SESSION-GLOBAL state: remember any prior
        # dir and restore it on exit so an unrelated frame's later
        # checkpoint() doesn't silently land in (possibly disposable)
        # checkpoint_dir; warns when there is no prior dir to restore.
        prior_ckpt_dir = _set_ckpt_dir(
            sc, checkpoint_dir, "connected_components_pairs"
        )
    # r8 round shape (guide §2.3-2.4, measured ~1.9 s/round -> ~0.8 s):
    #  * the neighbor-min and the label update fuse into ONE aggregation
    #    over (neighbor messages UNION self rows) — the old form paid a
    #    second labels join for the update and a THIRD join just to
    #    count changed labels; here the old label rides along as `_old`
    #    and changed = a filter-count on the already-materialized frame;
    #  * lineage truncation is a NON-eager localCheckpoint (the plan is
    #    truncated immediately either way) so that changed-count is the
    #    single materializing job per round, not a separate one. The
    #    reliable-checkpoint path keeps the eager persist-first form
    #    (a non-eager reliable checkpoint would run the lineage twice).
    # Truncation still happens EVERY round: Catalyst analysis cost is
    # exponential in rounds-since-truncation (see docstring).
    e = pairs.select("a_id", "b_id")
    edges = e.unionByName(
        e.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    )
    # keyed by the per-round join side (a_id), count left to AQE so the
    # exchange is sized by bytes, not a local-core constant
    edges = edges.repartition(F.col("a_id")).persist()
    labels = (
        edges.select(F.col("a_id").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist()
    )
    # truncated frames' blocks are the ONLY copy of their data (no
    # recomputable lineage) — never unpersist one mid-loop while later
    # rounds still chain off it; they are released together in finally
    truncated: list[DataFrame] = []
    labels_is_truncated = False
    try:
        changed = -1
        prev_changed = -1
        for round_idx in range(max_iter):
            msgs = (
                edges.join(labels, edges.a_id == labels.id)
                .select(
                    F.col("b_id").alias("id"), "label",
                    F.lit(False).alias("_own"),
                )
            )
            u = msgs.unionByName(
                labels.select("id", "label", F.lit(True).alias("_own"))
            )
            # every id has exactly ONE self row (labels is distinct), so
            # min(label) = least(old, min neighbor label) and `_old`
            # recovers the previous label for the changed count
            new_full = u.groupBy("id").agg(
                F.min("label").alias("label"),
                F.max(F.when(F.col("_own"), F.col("label"))).alias("_old"),
            )
            if checkpoint_dir is not None:
                # persist first: an eager reliable checkpoint of an
                # UNPERSISTED frame runs the lineage twice (once for
                # the eager count, again for the checkpoint-write
                # job); the cache makes the write job a cache read,
                # and is dropped as soon as the files exist
                base = new_full.persist()
                new_full = base.checkpoint(eager=True)
                base.unpersist()
            else:
                new_full = new_full.localCheckpoint(eager=False)
            truncated.append(new_full)
            changed = new_full.where(F.col("label") != F.col("_old")).count()
            if not labels_is_truncated:
                labels.unpersist()
            labels = new_full.select("id", "label")
            labels_is_truncated = True
            if changed == 0:
                break
            floor = (
                _AUTO_BAIL_MIN_FRONTIER
                if _bail_min_frontier is None
                else _bail_min_frontier
            )
            if (
                _bail_ratio is not None
                and round_idx >= 1
                and prev_changed >= floor
                and changed > _bail_ratio * prev_changed
            ):
                # frontier not collapsing — the chain-graph signature;
                # stop burning budget (auto catches this and contracts)
                raise ComponentsNotConverged(
                    f"connected_components_pairs: change frontier flat "
                    f"after {round_idx + 1} rounds ({prev_changed} -> "
                    f"{changed} changed labels; bail ratio "
                    f"{_bail_ratio}) — chain-shaped graph, use "
                    "mode='twostar'/'auto'",
                    rounds_used=round_idx + 1,
                    partial_labels=labels if labels_is_truncated else None,
                )
            prev_changed = changed
        if changed != 0:
            # fail fast, never emit silently-split clusters: a pair
            # graph with diameter > max_iter (a long drifting-near-dup
            # chain) needs a bigger budget, not wrong keepers
            raise ComponentsNotConverged(
                f"connected_components_pairs: not converged after "
                f"{max_iter} rounds ({changed} labels still changing) — "
                "raise max_iter (rounds needed = pair-graph diameter), or "
                "use mode='twostar' (O(log diameter) rounds) or "
                "mode='auto' (falls back to twostar automatically)",
                rounds_used=max_iter,
                partial_labels=labels if labels_is_truncated else None,
            )
        if round_counter is not None:
            round_counter.append(round_idx + 1)
        sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
        out = (
            labels.join(sizes, "label")
            .select(
                F.col("id").alias("doc_id"),
                F.col("label").alias("keeper_id"),
                F.col("cluster_size").cast("int").alias("cluster_size"),
            )
        )
        # Truncate the iterative lineage and make the result
        # self-contained BEFORE the cached inputs are released (never a
        # driver collect — the label set can be huge at scale).
        # localCheckpoint blocks are executor-resident (freed by the
        # ContextCleaner when the frame is GC'd) and die with their
        # executor — pass checkpoint_dir for the reliable storage-backed
        # form on a real cluster.
        if checkpoint_dir is not None:
            return out.checkpoint(eager=True)
        return out.localCheckpoint(eager=True)
    finally:
        # runs AFTER the result is checkpointed self-contained (or on
        # the error path, where nothing downstream needs the blocks)
        edges.unpersist()
        if not labels_is_truncated:
            labels.unpersist()
        if prior_ckpt_dir is not None:
            sc.setCheckpointDir(prior_ckpt_dir)
        # mid-loop localCheckpoint blocks cannot be dropped via
        # DataFrame.unpersist (they are RDD-level persists, not
        # CacheManager entries); the ContextCleaner frees them when the
        # frames go out of scope here — same lifecycle as the returned
        # frame's blocks. Bounded: at most one frame per round of
        # one (id, label) row per pair-connected doc. RELIABLE
        # checkpoint FILES under checkpoint_dir are NOT auto-deleted
        # (spark.cleaner.referenceTracking.cleanCheckpoints defaults to
        # false): the CALLER owns the dir's lifecycle — use a per-job
        # subdirectory and remove it after consuming the result, or
        # enable that conf session-wide.


def _q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper assignment over the Manku-banded simhash pair graph — the
    end-to-end 'pairs -> decisions' path, exactly mirrored by a DuckDB
    recursive-CTE transitive closure (the oracle is mode-independent:
    it checks the OUTPUT clustering). Runs ``mode="auto"`` — the mode
    callers should not have to choose (r6 verdict #6): min-label with
    the frontier-decay bail, then on non-convergence two-star
    contraction on the original pairs. On THIS corpus the pair graph
    has diameter ~19, so auto's min-label leg bails at round 2 (r8:
    the frontier check starts one round earlier, with a min-frontier
    floor) and lands in two-star — certifying in the driver file the
    exact path a caller gets by default, at a
    measured ~1.5x of pinned-twostar on this adversarial-diameter graph
    (and ~min-label-optimal on the common dense shape). Output is
    mode-independent (property-tested equal across all three modes)."""
    pairs = _q_simhash_pairs_scale(spark, sf_dir)
    return connected_components_pairs(pairs, mode="auto")


_SQL_COMP_CTES = f"""
WITH RECURSIVE
corpus AS MATERIALIZED ({_SQL_CORPUS}),
s AS MATERIALIZED (SELECT doc_id, {_SIMHASH_SQL.format(c="text")} AS sh FROM corpus),
p AS MATERIALIZED (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.sh, b.sh)) <= {SIMHASH_SCALE_HAMMING}),
-- MATERIALIZED: without it DuckDB may inline these CTEs into every
-- iteration of the recursion below, recomputing the per-doc simhash
-- and the all-pairs join once per closure step (observed: minutes ->
-- hours at sf0.1); the hint pins one evaluation
edges AS MATERIALIZED (SELECT a_id AS a, b_id AS b FROM p
          UNION SELECT b_id, a_id FROM p),
reach(id, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
comp AS (SELECT id, min(r) AS keeper FROM reach GROUP BY id)
"""

_SQL_COMPONENTS = _SQL_COMP_CTES + """
SELECT id AS doc_id, keeper AS keeper_id,
       CAST(count(*) OVER (PARTITION BY keeper) AS INT) AS cluster_size
FROM comp
"""


def dedup_apply(corpus: DataFrame, decisions: DataFrame) -> DataFrame:
    """Apply dedup DECISIONS to the corpus — the pipeline's end product:
    keep every doc that is its cluster's keeper (or is in no cluster),
    drop the rest.

    100-TB shape: ``decisions`` holds one row per PAIR-CONNECTED doc —
    orders of magnitude smaller than the corpus — so the non-keeper id
    list BROADCASTS and the corpus side anti-joins with ZERO shuffle
    (plan-tested: BroadcastHashJoin LeftAnti, no Exchange on the
    streamed side). The 10^12-row table is filtered in place, exactly
    like dedup_decontaminate's eval-gram join."""
    drop = decisions.where(F.col("doc_id") != F.col("keeper_id")).select("doc_id")
    return corpus.join(F.broadcast(drop), "doc_id", "left_anti")


def _q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end pairs -> decisions -> DEDUPED CORPUS: simhash scale
    banding, two-star components, broadcast anti-join keep-filter. The
    oracle replays the same transitive closure in DuckDB and keeps
    non-dropped doc_ids."""
    corpus = dedup_corpus(spark, sf_dir)
    decisions = _q_dedup_components(spark, sf_dir)
    return dedup_apply(corpus, decisions).select("doc_id")


_SQL_APPLY = _SQL_COMP_CTES + """
SELECT doc_id FROM corpus
WHERE doc_id NOT IN (SELECT id FROM comp WHERE id != keeper)
"""


EMB_DIM = 64
EMB_KEEP = 56  # near-dup derivation zeroes the last 8 dims
EMB_COS_THRESHOLD = 0.9
SRP_BITS = 64
SRP_CHUNKS = 16  # 16 chunks x 4 bits


def embedding_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ deterministic near-duplicates: every vector with its
    last 8 (of 64) dims zeroed, at vec_id + 1_000_000 — cosine vs the
    original ≈ sqrt(56/64) ≈ 0.93 for near-random vectors. Both sides
    are exact double arithmetic, mirrored verbatim by the SQL oracle."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    trunc = F.concat(
        F.slice("v", 1, EMB_KEEP), F.array_repeat(F.lit(0.0), EMB_DIM - EMB_KEEP)
    )
    near = e.select((F.col("vec_id") + 1_000_000).alias("vec_id"), trunc.alias("v"))
    return e.unionByName(near)


def _srp_chunk_batches(batches):
    """Arrow-batch kernel: (vec_id, v) -> SRP sketch chunk rows
    (vec_id, chunk_id, chunk_val). Sign-random-projection LSH (Charikar
    2002): bit_j = sign(v . r_j) over SRP_BITS fixed Gaussian
    hyperplanes (seeded rng — deterministic across processes); the
    64-bit sketch splits into SRP_CHUNKS 4-bit chunks for pigeonhole
    banding. P(bit disagree) = angle/pi, so the planted cos≈0.93 pairs
    (angle≈21°) miss all 16 chunks with probability ~(1-0.61^4)^16
    ≈ 3e-7 — measured zero misses on the fixed corpus."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(42)
    R = rng.standard_normal((SRP_BITS, EMB_DIM))
    bits_per = SRP_BITS // SRP_CHUNKS
    weights = (1 << np.arange(bits_per, dtype=np.int64))[None, None, :]
    chunk_ids = np.arange(SRP_CHUNKS, dtype=np.int32)
    for batch in batches:
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        V = np.array(batch.column("v").to_pylist(), dtype=np.float64)
        if len(vec_ids) == 0:
            continue
        bits = (V @ R.T) > 0  # (n, SRP_BITS)
        vals = (
            (bits.reshape(len(vec_ids), SRP_CHUNKS, bits_per) * weights)
            .sum(axis=2)
            .astype(np.int64)
        )  # (n, SRP_CHUNKS)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.repeat(vec_ids, SRP_CHUNKS), type=pa.int64()),
                pa.array(np.tile(chunk_ids, len(vec_ids)), type=pa.int32()),
                pa.array(vals.reshape(-1), type=pa.int64()),
            ],
            names=["vec_id", "chunk_id", "chunk_val"],
        )


def embedding_cosine_pairs_with_drops(
    corpus: DataFrame,
    threshold: float = EMB_COS_THRESHOLD,
    max_bucket: int = MAX_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """Embedding-cosine near-dup pairs: SRP-LSH bucketing (never
    all-pairs) -> in-bucket candidate enumeration (buckets over
    ``max_bucket`` excluded count-first, returned as the second tuple
    element) -> exact cosine verification. The verify cosine is the same
    sequential-sum double expression the brute-force oracle uses, so
    values match bitwise."""
    from pyspark.sql.types import IntegerType

    from .similarity import cosine

    par = corpus.sparkSession.sparkContext.defaultParallelism * 2
    sk_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("chunk_id", IntegerType()),
            StructField("chunk_val", LongType()),
        ]
    )
    sketches = (
        corpus.repartition(par, "vec_id").mapInArrow(_srp_chunk_batches, sk_schema)
    )
    buckets, dropped = _bucket_ids(
        sketches, ["chunk_id", "chunk_val"], F.col("vec_id"), max_bucket
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(
                    F.least(x, y).alias("a_id"), F.greatest(x, y).alias("b_id")
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.a_id", "p.b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    ver = (
        cand.join(corpus.select(F.col("vec_id").alias("a_id"),
                                F.col("v").alias("a_v")), "a_id")
        .join(corpus.select(F.col("vec_id").alias("b_id"),
                            F.col("v").alias("b_v")), "b_id")
        .repartition(par, "a_id", "b_id")
        .select(
            "a_id", "b_id",
            F.round(cosine(F.col("a_v"), F.col("b_v")), 4).alias("cos"),
        )
    )
    pairs = ver.where(F.col("cos") >= threshold)
    return pairs, dropped


def embedding_cosine_pairs(
    corpus: DataFrame,
    threshold: float = EMB_COS_THRESHOLD,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Pairs-only wrapper; drops are consciously ignored — use the
    ``_with_drops`` form (the one telemetry contract) to consume them."""
    pairs, _ = embedding_cosine_pairs_with_drops(
        corpus, threshold=threshold, max_bucket=max_bucket
    )
    return pairs


def _q_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_cosine_pairs(embedding_corpus(spark, sf_dir))


# Planted-degenerate certification of the hot-bucket cap itself: every
# document rewritten to ONE constant text, so all N docs share identical
# minhash band hashes -> exactly one bucket per band, each of size N >
# the tiny cap -> the count-first exclusion must drop ALL of them and
# the pair output must be EMPTY. The oracle is pure SQL: one row per
# band with n = count(documents).
DROPPED_DEMO_MAX_BUCKET = 8
_DROPPED_DEMO_TEXT = "the same boilerplate text appears in every single document here"


def _q_dropped_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-certified dropped-bucket telemetry (the production drop
    path, not a test hook): runs the REAL minhash-LSH generator over the
    degenerate corpus and returns one row per dropped bucket
    (band_id, n), cross-checked with the pair count (must be 0 — every
    bucket was dropped, so no candidates survive)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.lit(_DROPPED_DEMO_TEXT).alias("text")
    )
    pairs, dropped = minhash_lsh_pairs_with_drops(
        d, max_bucket=DROPPED_DEMO_MAX_BUCKET
    )
    n_pairs = pairs.count()  # eager cross-check: cap kills all candidates
    return dropped.select(
        F.col("band_id").cast("int").alias("band_id"),
        F.col("n").cast("bigint").alias("n"),
        F.lit(n_pairs).cast("bigint").alias("n_surviving_pairs"),
    )


_SQL_DROPPED = f"""
SELECT CAST(u.band_id AS INT) AS band_id,
       count(*) AS n,
       CAST(0 AS BIGINT) AS n_surviving_pairs
FROM documents, UNNEST(range(0, {N_BANDS})) AS u(band_id)
GROUP BY 1
"""


_SQL_EMB_ZEROS = ", ".join(["0.0"] * (EMB_DIM - EMB_KEEP))
_SQL_EMB_PAIRS = f"""
WITH corpus AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_concat(CAST(embedding AS DOUBLE[])[1:{EMB_KEEP}],
                     [{_SQL_EMB_ZEROS}]) AS v
  FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 4) >= {EMB_COS_THRESHOLD}
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": _q_exact_dedup,
        "dedup_ngram_jaccard_pairs": _q_jaccard_pairs,
        "dedup_jaccard_prefix_pairs": _q_jaccard_prefix,
        "dedup_minhash_lsh_pairs": _q_minhash_lsh,
        "dedup_pairs_crosscheck": _q_pairs_crosscheck,
        "dedup_pairs_crosscheck_high": _q_pairs_crosscheck_high,
        "dedup_simhash": _q_simhash,
        "dedup_simhash_pairs": _q_simhash_pairs,
        "dedup_simhash_pairs_scale": _q_simhash_pairs_scale,
        "dedup_components": _q_dedup_components,
        "dedup_apply": _q_dedup_apply,
        "dedup_decontaminate": _q_decontaminate,
        "dedup_embedding_cosine_pairs": _q_embedding_cosine_pairs,
        "dedup_dropped_buckets": _q_dropped_buckets,
        "dedup_containment_pairs": _q_containment,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": _SQL_EXACT,
        "dedup_ngram_jaccard_pairs": _SQL_JACCARD,
        # prefix filtering is EXACT (no false negatives), so its output
        # equals the same brute-force all-pairs truth the LSH row uses
        "dedup_jaccard_prefix_pairs": _SQL_MINHASH,
        "dedup_minhash_lsh_pairs": _SQL_MINHASH,
        "dedup_pairs_crosscheck": _SQL_CROSSCHECK,
        "dedup_pairs_crosscheck_high": _SQL_CROSSCHECK,
        "dedup_simhash": _SQL_SIMHASH,
        "dedup_simhash_pairs": _SQL_SIMHASH_PAIRS,
        "dedup_simhash_pairs_scale": _SQL_SIMHASH_PAIRS_SCALE,
        "dedup_components": _SQL_COMPONENTS,
        "dedup_apply": _SQL_APPLY,
        "dedup_decontaminate": _SQL_DECONTAM,
        "dedup_embedding_cosine_pairs": _SQL_EMB_PAIRS,
        "dedup_dropped_buckets": _SQL_DROPPED,
        "dedup_containment_pairs": _SQL_CONTAINMENT,
    }
