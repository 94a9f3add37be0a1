"""Distributed as-of join, in two scale shapes.

``asof_last`` — the union-sort-window formulation (ONE shuffle on the
key, one ordered pass per key): the default, used by the driver-certified
``events_asof_order`` query. Its bound: a key's ENTIRE history serializes
into one window task, so a pathologically hot key is a straggler.

``asof_last_bucketed`` — the RANGE-BUCKETED variant that removes that
bound: time is cut into coarse buckets, the window runs per (key, bucket)
— each task holds one bucket's slice of one key, never the full history —
and the carry-in (the last order from all EARLIER buckets) comes from a
second, tiny window over the per-(key, bucket) summaries (#buckets rows
per key, not #events). Exactly equal to ``asof_last`` by construction
(test-pinned, including tie rules), with the per-task bound traded for
one extra small shuffle.

Tie semantics (both shapes, matching the DuckDB LATERAL oracle of
``events_asof_order``): an order timestamped exactly at the event time
counts, and among same-timestamp orders the largest order key wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_last", "asof_last_bucketed"]


def _tagged_union(orders: DataFrame, events: DataFrame) -> DataFrame:
    """(key, t, is_event, event_id, o_orderkey) union of both streams.

    orders: (key, t, o_orderkey); events: (key, t, event_id)."""
    orders_s = orders.select(
        "key", "t",
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
    )
    events_s = events.select(
        "key", "t",
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
    )
    return orders_s.unionByName(events_s)


def asof_last(orders: DataFrame, events: DataFrame) -> DataFrame:
    """For each event row, the latest order at or before its time.

    orders: (key, t, o_orderkey); events: (key, t, event_id).
    Returns (event_id, key, t, last_orderkey). One shuffle on key;
    per-key history serializes into one task (see module docstring)."""
    w = (
        Window.partitionBy("key")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = _tagged_union(orders, events).select(
        "key", "t", "is_event", "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
    )
    return merged.where(F.col("is_event") == 1).select(
        "event_id", "key", "t", "last_orderkey"
    )


def asof_last_bucketed(
    orders: DataFrame, events: DataFrame, bucket: str = "30 days"
) -> DataFrame:
    """``asof_last`` with the per-key single-task bound removed.

    Three bounded stages:
      1. in-bucket pass: window over (key, bucket) on the tagged union —
         a task holds at most one bucket's rows for one key;
      2. carry computation: per-(key, bucket) last order (one row per
         non-empty bucket), then a window over BUCKETS per key whose
         partition size is #buckets, not #rows — the exclusive carry-in
         is the last order of any earlier bucket;
      3. merge: an event's answer is its in-bucket last order if one
         exists, else its bucket's carry-in.

    A hot key with 10^9 events over N buckets becomes N tasks of
    ~10^9/N rows plus one N-row window — pick ``bucket`` so a bucket's
    densest key fits a task (at 100 TB: hours-to-days for clickstream
    keys). Exact equality with asof_last is test-pinned."""
    tagged = _tagged_union(orders, events).withColumn(
        "bkt", F.window("t", bucket).start
    )
    in_bucket = (
        Window.partitionBy("key", "bkt")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = tagged.select(
        "key", "bkt", "t", "is_event", "event_id",
        F.last("o_orderkey", ignorenulls=True).over(in_bucket).alias("in_bkt_last"),
    )
    # one row per (key, bucket) that holds ORDERS: the bucket's final
    # order = max (t, o_orderkey) — the same tie rule as the window
    bkt_orders = (
        orders.withColumn("bkt", F.window("t", bucket).start)
        .groupBy("key", "bkt")
        .agg(F.max_by("o_orderkey", F.struct("t", "o_orderkey")).alias("bkt_last"))
    )
    # every (key, bucket) either stream touches, so event-only buckets
    # still receive a carry row. Built from the already-aggregated order
    # summary plus ONE column-pruned events scan — not from `tagged`,
    # whose re-evaluation would re-read both inputs in full. Total input
    # IO of this shape: events fully once (the staged window) + events
    # (key, t) once + orders twice (t, key, o_orderkey) — the extra
    # reads are the narrow/small sides, the trade for bounding every
    # window task at one bucket of one key.
    all_bkts = (
        events.select("key", F.window("t", bucket).start.alias("bkt"))
        .unionByName(bkt_orders.select("key", "bkt"))
        .distinct()
    )
    # carry-in = last order-bearing bucket's final order over all
    # EARLIER buckets; partition size = #buckets per key (tiny)
    carry_w = (
        Window.partitionBy("key")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        all_bkts.join(bkt_orders, ["key", "bkt"], "left")
        .select(
            "key", "bkt",
            F.last("bkt_last", ignorenulls=True).over(carry_w).alias("carry_in"),
        )
    )
    return (
        staged.where(F.col("is_event") == 1)
        .join(carries, ["key", "bkt"])
        .select(
            "event_id", "key", "t",
            F.coalesce("in_bkt_last", "carry_in").alias("last_orderkey"),
        )
    )
