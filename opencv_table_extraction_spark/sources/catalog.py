"""Snapshot/commit catalog — Iceberg semantics over a parquet directory
(B13/B14, SURVEY.md §7.4).

BASELINE.json:6 mandates "writes extracted text/spans back to Iceberg ...
resumable from the last committed Iceberg snapshot checkpoint". The
Iceberg runtime jar is not shipped in this sandbox, so the commit
protocol — atomic snapshot manifest, committed-bucket bookkeeping,
idempotent per-bucket writes — is carried by this thin interface with a
parquet-directory backend. On a real cluster the same call sites bind to
``df.writeTo(table).overwritePartitions()`` + Iceberg snapshot IDs; the
*contract* (resume = skip committed buckets; restart produces output
identical to a single run) is what the tests pin.

Layout:
    root/
      data/bucket=K/*.parquet      one directory per conv bucket
      lineage/*.parquet            per-partition lineage rows, appended
      _committed.json              {"snapshots": [{id, buckets, ts}...]}
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import extract_transcripts, lineage_summary, with_turn_seq

__all__ = [
    "SnapshotCatalog",
    "IcebergSnapshotCatalog",
    "has_iceberg_runtime",
    "run_resumable",
]


class SnapshotCatalog:
    """Bucket-committed snapshot bookkeeping over a local/posix dir."""

    def __init__(self, root: str, n_buckets: int = 16) -> None:
        self.root = root
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(root, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "lineage"), exist_ok=True)

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_committed.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)["snapshots"]

    def committed_buckets(self) -> set[int]:
        return {b for s in self.snapshots() for b in s["buckets"]}

    def last_snapshot_id(self) -> int:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else 0

    def commit(self, buckets: list[int]) -> int:
        """Atomic manifest update (write temp + rename): the snapshot
        either exists with all its buckets or not at all."""
        snaps = self.snapshots()
        snap_id = (snaps[-1]["id"] + 1) if snaps else 1
        snaps.append({"id": snap_id, "buckets": sorted(buckets), "ts": int(time.time())})
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"snapshots": snaps}, f)
        os.replace(tmp, self._manifest_path)
        return snap_id

    def bucket_col(self):
        """conv bucket = pmod(xxhash64(conv_id), n_buckets) — the same
        transform Iceberg's bucket(N, conv_id) partitioning plays."""
        return F.pmod(F.xxhash64("conv_id"), F.lit(self.n_buckets))

    def write_data(self, out: DataFrame) -> None:
        """Idempotent per-bucket write: dynamic partition overwrite
        replaces exactly the bucket directories this run owns. The
        overwrite-mode conf is saved/restored — mutating the session
        globally would silently change unrelated writes."""
        spark = out.sparkSession
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "dynamic")
        try:
            out.write.mode("overwrite").partitionBy("bucket").parquet(
                os.path.join(self.root, "data")
            )
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    def write_lineage(self, lineage: DataFrame) -> None:
        """Lineage is partitioned by snapshot_id and dynamically
        overwritten, so a crash-and-retry of the same snapshot replaces
        its own lineage rows instead of appending duplicates (the data
        write was already idempotent; this makes lineage match)."""
        spark = lineage.sparkSession
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "dynamic")
        try:
            lineage.write.mode("overwrite").partitionBy("snapshot_id").parquet(
                os.path.join(self.root, "lineage")
            )
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    def read_output(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "data"))

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.root, "lineage"))


def has_iceberg_runtime(spark: SparkSession) -> bool:
    """True when the Iceberg runtime jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Snapshot")
        return True
    except Exception:
        return False


class IcebergSnapshotCatalog(SnapshotCatalog):
    """The same commit contract bound to a real Iceberg table (requires
    the iceberg-spark-runtime jar and a configured catalog — absent in
    this sandbox, so these call sites are exercised only when
    has_iceberg_runtime() is true; the interface/parquet tests cover the
    contract either way).

    Data lands via ``writeTo(table).overwritePartitions()`` (Iceberg's
    dynamic overwrite: replaces exactly the bucket partitions present in
    the frame — the idempotent-retry property the parquet backend
    emulates); reads pin a snapshot via ``option("snapshot-id", ...)``.
    The committed-bucket manifest stays in the JSON bookkeeping file:
    Iceberg's own snapshot log tracks table versions, but WHICH conv
    buckets a snapshot covered is engine metadata, not table metadata.

    First write against a fresh catalog CREATES the table (and the
    ``_lineage`` side table): ``overwritePartitions`` throws on a
    missing target, so ``_write_partitioned`` falls back to
    ``partitionedBy(col).using("iceberg").create()``. Equivalent DDL if
    you pre-create instead::

        CREATE TABLE <table> (...) USING iceberg PARTITIONED BY (bucket);
        CREATE TABLE <table>_lineage (...) USING iceberg
            PARTITIONED BY (snapshot_id);
    """

    def __init__(
        self, spark: SparkSession, table: str, root: str, n_buckets: int = 16
    ) -> None:
        super().__init__(root, n_buckets)
        self.spark = spark
        self.table = table

    def _write_partitioned(self, df: DataFrame, table: str, part_col: str) -> None:
        """Dynamic overwrite, creating the partitioned table on first
        write (tableExists probes the catalog; a concurrent first-writer
        race falls through to the overwrite path's own error)."""
        if self.spark.catalog.tableExists(table):
            df.writeTo(table).overwritePartitions()
        else:
            df.writeTo(table).partitionedBy(F.col(part_col)).using(
                "iceberg"
            ).create()

    def write_data(self, out: DataFrame) -> None:
        self._write_partitioned(out, self.table, "bucket")

    def write_lineage(self, lineage: DataFrame) -> None:
        self._write_partitioned(lineage, f"{self.table}_lineage", "snapshot_id")

    def read_output(self, spark: SparkSession, snapshot_id: int | None = None):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(self.table)

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("iceberg").load(f"{self.table}_lineage")


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    catalog: SnapshotCatalog,
    max_buckets: int | None = None,
    salt_buckets: int | None = 8,
) -> dict:
    """One (re)start of the extraction job against a catalog (B14).

    Reads the committed-bucket set, processes only the remainder
    (``max_buckets`` bounds this run — the resume tests kill the job
    after half), writes per-bucket output + lineage, then commits the
    manifest. Buckets are committed only after their data lands, so a
    crash between write and commit at worst reprocesses one run's
    buckets into overwritten (idempotent) bucket directories.
    """
    done = catalog.committed_buckets()
    todo = [b for b in range(catalog.n_buckets) if b not in done]
    if max_buckets is not None:
        todo = todo[:max_buckets]
    if not todo:
        return {"snapshot_id": catalog.last_snapshot_id(), "buckets": [], "n_turns": 0}

    work = transcripts.where(catalog.bucket_col().isin([int(b) for b in todo]))
    # persist the kernel output once: both the lineage aggregation and the
    # data write consume it, and the kernel is the expensive stage
    raw = extract_transcripts(work, salt_buckets=salt_buckets, add_turn_seq=False)
    raw.persist()
    try:
        snap_id = catalog.last_snapshot_id() + 1
        lineage = (
            lineage_summary(raw)
            .withColumn("snapshot_id", F.lit(snap_id))
            .withColumn("attempt", F.lit(len(catalog.snapshots()) + 1))
        )
        lin_rows = lineage.collect()
        n_turns = sum(r["n_turns"] for r in lin_rows)

        out = with_turn_seq(raw).withColumn("bucket", catalog.bucket_col())
        catalog.write_data(out)
        catalog.write_lineage(spark.createDataFrame(lin_rows, lineage.schema))
    finally:
        raw.unpersist()
    committed_id = catalog.commit(todo)
    assert committed_id == snap_id
    return {"snapshot_id": snap_id, "buckets": todo, "n_turns": int(n_turns)}
