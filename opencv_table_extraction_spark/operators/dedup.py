"""Deduplication operators: exact (hash-groupBy), n-gram Jaccard
near-dup (blocked pairwise), MinHash+LSH (shingle -> minhash -> band ->
bucket self-join), SimHash. Spark-first: shingling, minhash signatures,
and banding are all JVM-side higher-order array expressions (xxhash64 /
transform / array_min) — no Python in the hot path; only simhash uses an
Arrow-batched pandas UDF for bit packing.

The dedup corpus derives near-duplicates deterministically from the
documents table (each doc unioned with its 90%-prefix truncation at
doc_id+1_000_000), so recall is measurable and the Jaccard query has an
exact SQL oracle. MinHash banding is not SQL-expressible (xxhash64 has
no DuckDB equivalent) -> rows-only check, noted in oracle_sql().
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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
    sig = (
        corpus.repartition(par, "doc_id")
        .withColumn("sh", shingles(F.col("text")))
        .select(
            "doc_id",
            "sh",
            minhash_signature(F.col("sh")).alias("sig"),
        )
    )
    bands = sig.select(
        "doc_id",
        "sh",
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
    ).select("doc_id", "sh", "band.band_id", "band.band_hash")
    a = bands.select(
        F.col("doc_id").alias("a_id"), F.col("sh").alias("a_sh"),
        "band_id", "band_hash",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), F.col("sh").alias("b_sh"),
        "band_id", "band_hash",
    )
    cand = (
        a.join(b, ["band_id", "band_hash"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sh", "b_sh")
        .dropDuplicates(["a_id", "b_id"])
    )
    # candidate verification is CPU-quadratic per row (shingle-set
    # intersections) — explicit repartition, same rationale as the
    # kernel stage
    cand = cand.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism * 2, "a_id", "b_id"
    )
    jac = F.round(
        F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        / F.size(F.array_union("a_sh", "b_sh")),
        4,
    )
    return (
        cand.withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(dedup_corpus(spark, sf_dir))


@F.pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Arrow-batched; the per-bit
    vote accumulation is NumPy). Token hash = blake2b-8byte, process-
    independent and deterministic."""
    import hashlib

    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            out[i] = 0
            continue
        hs = np.frombuffer(
            b"".join(hashlib.blake2b(w.encode(), digest_size=8).digest() for w in toks),
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = bits.sum(axis=0) * 2 - len(toks)
        v = np.uint64(0)
        for j in range(64):
            if votes[j] > 0:
                v |= np.uint64(1) << np.uint64(j)
        out[i] = np.int64(v)
    return pd.Series(out)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.select("doc_id", simhash64("text").alias("simhash"))


def simhash_pairs(
    corpus: DataFrame, max_hamming: int = 12, n_chunks: int = 16
) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole chunk banding.

    Split each 64-bit simhash into n_chunks 4-bit chunks; any pair
    within hamming distance < n_chunks must share at least one chunk
    (pigeonhole), so candidates come from a shuffle join on
    (chunk_id, chunk_value) — never a cross product — then are verified
    by exact popcount of the XOR. Exact recall for
    max_hamming <= n_chunks - 1.
    """
    bits_per = 64 // n_chunks
    sig = corpus.select("doc_id", simhash64("text").alias("sh"))
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
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_pairs(dedup_corpus(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "dedup_exact": _q_exact_dedup,
        "dedup_ngram_jaccard_pairs": _q_jaccard_pairs,
        "dedup_minhash_lsh_pairs": _q_minhash_lsh,  # rows-only (no SQL oracle)
        "dedup_simhash": _q_simhash,                # rows-only (no SQL oracle)
        "dedup_simhash_pairs": _q_simhash_pairs,    # rows-only (no SQL oracle)
    }


def oracle_sql() -> dict[str, str]:
    # dedup_minhash_lsh_pairs: banding uses xxhash64 (no DuckDB
    # equivalent) -> intentionally no oracle, driver records rows-only.
    # dedup_simhash: blake2b bit-votes not SQL-expressible -> rows-only.
    return {
        "dedup_exact": _SQL_EXACT,
        "dedup_ngram_jaccard_pairs": _SQL_JACCARD,
    }
