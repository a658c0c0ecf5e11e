"""Stateful streaming operators: in-stream dedup + custom state.

Two training-pipeline streaming primitives on top of the same engine:

* ``dedup_stream`` — exact in-stream deduplication on the content hash
  with ``dropDuplicatesWithinWatermark``: state is bounded by the
  watermark horizon (an unbounded ``dropDuplicates`` would grow state
  forever at crawl scale). Same NOTION of duplicate as the batch
  ``exact_duplicates`` (the md5 content hash) — but the survivor is the
  first-ARRIVING row (file-processing order), not the batch rule's
  deterministic min-doc_id representative; pipe the output through a
  min-per-hash agg when a canonical representative matters;
* ``user_counts_stream`` — a custom stateful operator via
  ``applyInPandasWithState``: per-user running event counts that
  survive across micro-batches (the W3 running-number analog in
  streaming form). State is one small struct per user; output mode
  ``update`` emits the refreshed totals each batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fusus_spark.functions.text import norm_ws
from fusus_spark.schema import DOCUMENTS_SCHEMA
from fusus_spark.streaming.ingest import EVENTS_STREAM_SCHEMA


def dedup_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "dedup_docs",
    *,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 2,
):
    """Streaming exact dedup: the first-ARRIVING document per content
    hash survives (arrival order = file-processing order — unlike the
    batch rule's deterministic min-id representative).

    The hash is the SAME md5-of-normalized-text the batch exact dedup
    uses, so batch and stream agree on WHAT a duplicate is, and on the
    surviving count; only which twin survives differs. Results in an
    in-memory sink (append mode).
    """
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    hashed = stream.select(
        "url",
        "warc_ts",
        F.md5(norm_ws("text")).alias("content_hash"),
    )
    deduped = hashed.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


_COUNT_OUT_SCHEMA = "user_id long, n_events bigint, sum_value_e4 bigint"
_COUNT_STATE_SCHEMA = "n bigint, sv_e4 bigint"


def user_counts_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "user_counts",
    *,
    max_files_per_trigger: int = 1,
):
    """Per-user running totals via applyInPandasWithState.

    Each micro-batch updates one (count, sum) state struct per user and
    emits the new totals (update mode) — the canonical custom-stateful
    pattern for metrics a built-in agg cannot express incrementally.

    Determinism contract: state accumulates PRE-SCALED integers — each
    event's value is rounded to e4 (half away from zero, matching SQL
    ``round``) BEFORE summation, so the total is exact int64 arithmetic
    and independent of file/micro-batch arrival order. (A raw-float
    running sum could flip the final e4 rounding depending on
    summation order.) The semantics are therefore
    ``sum(round(value * 10^4))``, not ``round(sum(value) * 10^4)``.
    """
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def update(key, pdfs, state: GroupState):
        import numpy as np

        n, sv_e4 = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            v = pdf["value"].to_numpy(dtype="float64")
            # half away from zero at e4, matching SQL round() EXACTLY on
            # the double product: compare the true binary fraction to
            # 0.5 instead of adding 0.5 (x + 0.5 can round UP in float64
            # for x just below 0.5, e.g. 0.49999999999999994); then sum
            # in int64 so batch totals never pass through float
            ax = np.abs(v) * 10000.0
            fl = np.floor(ax)
            r = fl + (ax - fl >= 0.5)
            sv_e4 += int((np.sign(v) * r).astype(np.int64).sum())
        state.update((n, sv_e4))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value_e4": [sv_e4],
            }
        )

    counts = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            _COUNT_OUT_SCHEMA,
            _COUNT_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    return (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


FETCH_RESULTS_SCHEMA = (
    "url string, fetch_ts timestamp, http_status int, content_hash string"
)


def snapshot_foldback_stream(
    spark: SparkSession,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    query_name: str = "snapshot_foldback",
    *,
    crawl_date: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 2,
):
    """Streaming face of ``operators.frontier.extend_snapshots``: fetch
    results landing as parquet files fold into snapshot-delta rows
    (url, content_hash, crawl_date) as they arrive — 200s emit the
    fresh hash, 304 Not-Modified carries the url's latest OBSERVED
    prior hash forward via a STREAM-STATIC join with the snapshot
    store (same null-skipping max-of-struct as the batch operator, so
    stream and batch can never disagree on what the store issued).
    Duplicate 304s for a url collapse within the watermark horizon
    (the batch ``distinct``'s bounded-state analog); 304s with no
    observed prior drop out of the inner join, exactly like batch.

    Scale shape, honestly (same disclosure as ``dedup_stream_vs_store``):
    the static side re-plans per micro-batch — a store scan + groupBy
    per trigger. Right for availableNow catch-up runs; a continuous
    deployment should ``foreachBatch`` the batch ``extend_snapshots``.
    The only stateful operator is the watermark dedup on the 304
    branch. Emits to an in-memory sink; callers append the table to
    the store, never mutate it in place (the frontier_job contract).
    """
    stream = (
        spark.readStream.schema(FETCH_RESULTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    latest = (
        spark.read.parquet(store_path)
        .where(F.col("content_hash").isNotNull())
        .groupBy("url")
        .agg(F.max(F.struct("crawl_date", "content_hash")).alias("m"))
        .select("url", F.col("m.content_hash").alias("__prior__"))
    )
    fresh = stream.where(
        (F.col("http_status") == 200) & F.col("content_hash").isNotNull()
    ).select("url", "content_hash", F.lit(crawl_date).alias("crawl_date"))
    confirmed = (
        stream.where(F.col("http_status") == 304)
        .withWatermark("fetch_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
        .join(latest, "url")
        .select(
            "url",
            F.col("__prior__").alias("content_hash"),
            F.lit(crawl_date).alias("crawl_date"),
        )
    )
    return (
        fresh.unionByName(confirmed)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def dedup_stream_vs_store(
    spark: SparkSession,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    query_name: str = "dedup_vs_store",
    *,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 2,
):
    """Streaming incremental dedup against the accumulated corpus: each
    arriving document is flagged ``is_seen`` by a STREAM-STATIC left
    join with the prefix-partitioned hash store
    (operators.dedup.write_hash_store) — the streaming face of
    ``incremental_dedup``, composed with the in-stream watermark dedup
    so within-stream twins collapse BEFORE the store join.

    Scale shape, honestly: a stream-static join re-plans the STATIC
    side every micro-batch — a full store scan + distinct exchange per
    trigger (the distinct is load-bearing: appended snapshots can
    repeat a hash, and duplicate right rows would fan out stream rows).
    That is acceptable for availableNow catch-up runs and modest
    stores; a continuously-triggered deployment against a huge store
    should instead micro-batch through ``foreachBatch`` calling the
    batch ``incremental_dedup`` (bloom prefilter + prefix-pruned
    verify), or maintain a pre-distinct'd store snapshot. No new state
    store here: the only stateful operator is the watermark dedup.
    Emits (url, warc_ts, content_hash, is_seen) to an in-memory sink.
    """
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    # the SAME normalizer as batch (functions.text.norm_ws): stream and
    # batch must never disagree on what a duplicate is
    hashed = stream.select(
        "url",
        "warc_ts",
        F.md5(norm_ws("text")).alias("content_hash"),
    )
    deduped = hashed.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )
    seen = (
        spark.read.parquet(store_path)
        .select("content_hash")
        .distinct()
        .withColumn("__seen__", F.lit(True))
    )
    flagged = deduped.join(seen, "content_hash", "left").select(
        "url",
        "warc_ts",
        "content_hash",
        F.coalesce("__seen__", F.lit(False)).alias("is_seen"),
    )
    return (
        flagged.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
