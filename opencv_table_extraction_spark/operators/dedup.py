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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HASHES = 32
N_BANDS = 16  # 16 bands x 2 rows: ~0.99 candidate recall at jaccard 0.5
JACCARD_THRESHOLD = 0.2


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


def shingles(col, n: int = 3):
    """Word n-gram shingle set, as a JVM-side array expression."""
    toks = F.split(F.trim(col), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            # try_element_at: texts shorter than n tokens yield one
            # partial shingle instead of an ANSI out-of-bounds error
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, (i + k + 1).cast("int")) for k in range(n)]
            ),
        )
    )


def _q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise n-gram Jaccard near-dup detection with an exact
    SQL oracle. Blocking key = source (the natural shard); at cluster
    scale the block join is a shuffle-on-key self-join, never a cross."""
    c = dedup_corpus(spark, sf_dir).withColumn("sh", shingles(F.col("text")))
    a = c.select(
        F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"), "source"
    )
    b = c.select(
        F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"), "source"
    )
    pairs = a.join(b, "source").where(F.col("a_id") < F.col("b_id"))
    # the pair set is small in bytes but quadratic in CPU (array
    # intersections): explicit repartition keeps AQE from collapsing the
    # compute stage to a couple of tasks
    pairs = pairs.repartition(
        spark.sparkContext.defaultParallelism * 2, "a_id", "b_id"
    )
    jac = F.round(
        F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        / F.size(F.array_union("a_sh", "b_sh")),
        4,
    )
    return (
        pairs.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a_id", "b_id", "jaccard")
    )


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


def minhash_signature(sh_col, n_hashes: int = N_HASHES):
    """MinHash signature as a JVM-side expression over an already-
    materialized shingle-array column: for each seed s, min over
    shingles of xxhash64(shingle, s). Taking the array column (not the
    text) avoids recomputing the shingle expression per consumer."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda s: F.array_min(
            F.transform(sh_col, lambda x: F.xxhash64(x, s.cast("string")))
        ),
    )


def minhash_lsh_pairs(
    corpus: DataFrame,
    n_bands: int = N_BANDS,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, fully distributed:
      1. per-doc signature (narrow, JVM-side);
      2. explode into n_bands (band_id, band_hash) keys;
      3. self-join on the band key (shuffle join on a short key — the
         scale path: no pairwise work outside shared buckets);
      4. exact-Jaccard verification of the candidates.
    """
    rows_per_band = N_HASHES // n_bands
    # signature computation is the CPU-heavy narrow stage (n_hashes x
    # |shingles| xxhash64 per doc); repartition explicitly so a 1-file
    # scan doesn't serialize it into two tasks
    par = corpus.sparkSession.sparkContext.defaultParallelism * 2
    docs = corpus.select("doc_id", "text")
    sig = (
        docs.repartition(par, "doc_id")
        .withColumn("sh", shingles(F.col("text")))
        .select("doc_id", minhash_signature(F.col("sh")).alias("sig"))
    )
    # band rows carry ONLY (doc_id, band_id, band_hash) — never the
    # shingle array: the n_bands-way explode and the self-join shuffle
    # 24 bytes/row instead of the full shingle set (the r1 plan shipped
    # every document's shingles ~2*n_bands times through this exchange)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(
                                    F.col("sig"),
                                    (b * rows_per_band + 1).cast("int"),
                                    rows_per_band,
                                ),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    cand = (
        bands.select(F.col("doc_id").alias("a_id"), "band_id", "band_hash")
        .join(
            bands.select(F.col("doc_id").alias("b_id"), "band_id", "band_hash"),
            ["band_id", "band_hash"],
        )
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates(["a_id", "b_id"])
    )
    # rejoin the source text once per side (text is smaller than the
    # shingle array and ships once per DEDUPED candidate pair, not once
    # per band match); shingles are recomputed post-join, so the CPU
    # cost lands only on candidate rows
    ver = (
        cand.join(docs.select(F.col("doc_id").alias("a_id"),
                              F.col("text").alias("a_text")), "a_id")
        .join(docs.select(F.col("doc_id").alias("b_id"),
                          F.col("text").alias("b_text")), "b_id")
        # candidate verification is CPU-quadratic per row (shingle-set
        # intersections) — explicit count exempts it from AQE coalescing
        .repartition(par, "a_id", "b_id")
        .withColumn("a_sh", shingles(F.col("a_text")))
        .withColumn("b_sh", shingles(F.col("b_text")))
    )
    jac = F.round(
        F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        / F.size(F.array_union("a_sh", "b_sh")),
        4,
    )
    return (
        ver.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


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


def simhash_pairs(
    corpus: DataFrame, max_hamming: int = 12, n_chunks: int = 15
) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole chunk banding.

    Split each 60-bit simhash into n_chunks 4-bit chunks; any pair
    within hamming distance < n_chunks must share at least one chunk
    (pigeonhole), so candidates come from a shuffle join on
    (chunk_id, chunk_value) — never a cross product — then are verified
    by exact popcount of the XOR. Exact recall for
    max_hamming <= n_chunks - 1.
    """
    bits_per = SIMHASH_BITS // n_chunks
    sig = corpus.select("doc_id", simhash60("text").alias("sh"))
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
    chunks = sig.select(
        "doc_id", "sh", F.explode(F.array(*chunk_structs)).alias("c")
    ).select("doc_id", "sh", "c.chunk_id", "c.chunk_val")
    a = chunks.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"),
                      "chunk_id", "chunk_val")
    b = chunks.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"),
                      "chunk_id", "chunk_val")
    cand = (
        a.join(b, ["chunk_id", "chunk_val"])
        .where(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh"))).cast("int")
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(dedup_corpus(spark, sf_dir))


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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": _q_exact_dedup,
        "dedup_ngram_jaccard_pairs": _q_jaccard_pairs,
        "dedup_minhash_lsh_pairs": _q_minhash_lsh,
        "dedup_simhash": _q_simhash,
        "dedup_simhash_pairs": _q_simhash_pairs,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": _SQL_EXACT,
        "dedup_ngram_jaccard_pairs": _SQL_JACCARD,
        "dedup_minhash_lsh_pairs": _SQL_MINHASH,
        "dedup_simhash": _SQL_SIMHASH,
        "dedup_simhash_pairs": _SQL_SIMHASH_PAIRS,
    }
