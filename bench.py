"""Benchmark harness — prints ONE JSON line (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and reports per-query
wall seconds plus extraction throughput (docs/sec, GB/sec — the
BASELINE.json metric).

The extraction benchmark replicates each document REPLICATE times (with
distinct urls, in-plan) so the html volume is large enough that compute
dominates fixed overheads; docs/sec and GB/sec are computed against the
replicated volume actually parsed.

Modes:
  python bench.py                 # full suite, one JSON line on stdout
  python bench.py --extract-only  # just the extraction job (scaling runs)
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_docs(spark, sf_dir: str, replicate: int):
    """sf documents -> replicated web-document table (url, html, lang)."""
    from pyspark.sql import functions as F

    from fusus_spark.sources.testdata import WRAP_HEAD, WRAP_TAIL

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = raw.select(
        "doc_id", "text", "lang",
        F.explode(F.sequence(F.lit(0), F.lit(replicate - 1))).alias("rep"),
    )
    return rep.select(
        F.concat(F.lit("https://ex.com/doc/"), "doc_id", F.lit("/r/"), "rep").alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(F.concat(F.lit(WRAP_HEAD), F.col("text"), F.lit(WRAP_TAIL)), "utf-8").alias("html"),
        "text", "lang",
    )


BENCH_PARTITIONS = 64  # fixed across core counts: same task granularity


def prepare_extraction(spark, sf_dir: str, replicate: int):
    """Build + warm the extraction input; returns (docs, n_docs, bytes).

    Pre-partitions BEFORE the timed runs: at the design scale the input
    arrives bucketed from Iceberg partitions; a single-file parquet read
    would otherwise serialize the shuffle map side and poison the
    scaling measurement. Only caches when the replicated volume
    comfortably fits the heap — caching ~1 GB of binary rows in a local
    JVM costs more in GC than regenerating the wrap in-plan.
    """
    from pyspark.sql import functions as F

    from fusus_spark.extraction.pipeline import extract_stage, repartition_salted, words_from_stage

    docs = repartition_salted(build_docs(spark, sf_dir, replicate), BENCH_PARTITIONS)
    n_docs, total_bytes = docs.agg(
        F.count("*"), F.sum(F.octet_length("html"))
    ).first()
    if total_bytes < 400 * 1024 * 1024:
        docs = docs.cache()
    docs.count()
    # tiny extraction spins up executor Python workers + codegen caches
    words_from_stage(extract_stage(docs.limit(256))).count()
    return docs, n_docs, int(total_bytes)


def extraction_trial(docs) -> tuple[float, int]:
    """One timed end-to-end extraction pass: (wall seconds, words out)."""
    from fusus_spark.extraction.pipeline import extract_stage, words_from_stage

    t0 = time.time()
    n_words = words_from_stage(extract_stage(docs)).count()
    return time.time() - t0, n_words


def bench_extraction(spark, sf_dir: str, replicate: int, cpus: int) -> dict:
    """--extract-only mode (BENCH/scaling.py contract): best of
    FUSUS_BENCH_TRIALS back-to-back trials — scaling.py provides its own
    interleaving by running whole processes in rounds."""
    docs, n_docs, total_bytes = prepare_extraction(spark, sf_dir, replicate)
    trials = int(os.environ.get("FUSUS_BENCH_TRIALS", "3"))
    wall = float("inf")
    n_words = 0
    for _ in range(max(trials, 1)):
        w, n_words = extraction_trial(docs)
        wall = min(wall, w)
    docs.unpersist()
    return {
        "wall_s": round(wall, 3),
        "n_docs": n_docs,
        "n_words": n_words,
        "bytes_in": total_bytes,
        "docs_per_sec": round(n_docs / wall, 1),
        "gb_per_sec": round(total_bytes / wall / 1e9, 4),
    }


# dedup_jaccard re-joined the headline in round 2: the df-cap
# stop-shingle prefilter (shingles in > 250 docs dropped from the
# universe) bounds the inverted-index fan-in, so the synthetic corpus's
# shared-vocabulary degeneration no longer blows the join up.
# dedup_passages joined in round 3: the Lee-et-al exact-substring tier
# (window-hash inverted index; lives outside the 50-query registry, so
# the frame comes from _extra_queries below).
HEADLINE = [
    "extract_words",
    "token_stats",
    "top_words",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_jaccard",
    "dedup_passages",
    "knn_bruteforce",
    "frontier_cycle",
    "pricing_summary",
    "top_orders",
    "nation_revenue",
    "sessionize",
    "running_value",
    "events_daily",
]


def _frontier_cycle(spark, sf_dir: str):
    """One full crawl-scheduling cycle (round-5 surface): churn stats
    over ~400k synthesized snapshot rows -> four-supply fetch_queue ->
    per-host politeness schedule. All inputs derived in-plan from
    doc_id (deterministic, no files); the timed count includes the
    operator's own localCheckpoint jobs — that IS its cost."""
    from pyspark.sql import functions as F

    from fusus_spark.operators.frontier import (
        fetch_queue, schedule_fetches, url_change_stats)
    from fusus_spark.sources.testdata import load

    docs = load(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(19))).alias("u")
    ).select(
        "doc_id", "u",
        F.concat(F.lit("http://h"), F.pmod("doc_id", F.lit(997)),
                 F.lit(".com/p/"), "doc_id", F.lit("/"), "u").alias("url"),
        F.pmod(F.col("doc_id") + F.col("u"), F.lit(3)).alias("churn"),
    )
    snaps = urls.select(
        "url", "churn", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("t")
    ).select(
        "url",
        F.md5(F.concat(
            "url",
            F.when(F.col("churn") == 0, F.col("t")).otherwise(F.lit(0)),
        )).alias("content_hash"),
        F.concat(F.lit("2026-01-0"), F.col("t") + 1).alias("crawl_date"),
    )
    sm = docs.select(
        F.lit("https://s.com/sm.xml").alias("sitemap_url"),
        F.lit("urlset").alias("kind"),
        F.concat(F.lit("http://h"), F.pmod("doc_id", F.lit(997)),
                 F.lit(".com/new/"), "doc_id").alias("loc"),
        F.lit(None).cast("string").alias("lastmod"),
        F.lit(None).cast("string").alias("changefreq"),
        F.lit(None).cast("bigint").alias("priority_e6"),
    )
    rd = docs.select(
        F.concat(F.lit("http://h"), F.pmod("doc_id", F.lit(997)),
                 F.lit(".com/old/"), "doc_id").alias("url"),
        F.concat(F.lit("http://h"), F.pmod("doc_id", F.lit(997)),
                 F.lit(".com/moved/"), "doc_id").alias("final_url"),
        F.lit(1).alias("hops"),
        (F.pmod("doc_id", F.lit(4)) != 0).alias("terminal"),
    )
    lk = urls.where(F.col("u") < 10).select(
        F.col("url").alias("src_url"),
        F.concat(F.lit("http://h"), F.pmod(F.col("doc_id") + 7, F.lit(997)),
                 F.lit(".com/disc/"), F.pmod("doc_id", F.lit(5000))
                 ).alias("resolved"),
    )
    return schedule_fetches(
        fetch_queue(url_change_stats(snaps), sm, as_of_date="2026-02-21",
                    redirects=rd, links=lk),
        k_per_host=20,
    )


def _extra_queries():
    """Headline frames for operators outside the driver registry."""
    from fusus_spark.operators.curate import dedup_passages
    from fusus_spark.sources.testdata import load

    return {
        "dedup_passages": lambda spark, sf_dir: dedup_passages(
            load(spark, sf_dir, "documents"), n=8
        ),
        "frontier_cycle": _frontier_cycle,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # x60 (~253 MB html, 300k docs at sf0.1): the volume where marginal
    # extraction rate dominates the fixed per-stage overhead — the same
    # volume BENCH/scaling.py measures, so the two artifacts agree.
    # (x20 left ~40% of the wall in fixed overhead and understated
    # docs/sec by a third.)
    replicate = int(os.environ.get("FUSUS_BENCH_REPLICATE", "60"))
    extract_only = "--extract-only" in sys.argv

    from fusus_spark.session import get_spark

    spark = get_spark(
        "fusus-bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 16)
    )
    spark.sparkContext.setLogLevel("ERROR")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if extract_only:
        ext = bench_extraction(spark, sf_dir, replicate, cpus)
        print(json.dumps({"mode": "extract-only", "cpus": cpus, "sf": sf, **ext}))
        spark.stop()
        return

    import __spark_entry__ as entrymod

    qs = {**entrymod.queries(), **_extra_queries()}
    names = [n for n in HEADLINE if n != "extract_words"]

    # INTERLEAVED rounds, min per query: the sandbox host has
    # intermittent background-load episodes lasting minutes — with
    # back-to-back per-query trials one episode inflates every trial of
    # whichever queries it covers (BENCH_r03 read as a fake
    # across-the-board regression that way). Round-robin ordering means
    # an episode inflates one ROUND of each query instead, and the
    # per-query min across rounds recovers the quiet-host number — the
    # same methodology BENCH/scaling.py uses across processes.
    rounds = int(os.environ.get("FUSUS_BENCH_ROUNDS", "3"))
    docs, n_docs, total_bytes = prepare_extraction(spark, sf_dir, replicate)
    # one extraction trial in the still-clean JVM: the interleaved
    # rounds below share the executor with 13 other queries' shuffle
    # files and GC debris, which taxes the python-worker stage ~10-20%
    ext_wall, n_words = extraction_trial(docs)
    for name in names:  # one untimed warmup pass (codegen + caches)
        qs[name](spark, sf_dir).count()

    best: dict[str, float] = {n: float("inf") for n in names}
    for _ in range(max(rounds, 1)):
        w, n_words = extraction_trial(docs)
        ext_wall = min(ext_wall, w)
        for name in names:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best[name] = min(best[name], time.time() - t0)
    docs.unpersist()

    ext = {
        "wall_s": round(ext_wall, 3),
        "docs_per_sec": round(n_docs / ext_wall, 1),
        "gb_per_sec": round(total_bytes / ext_wall / 1e9, 4),
        "n_docs": n_docs,
        "n_words": n_words,
        "bytes_in": total_bytes,
    }
    times = {"extraction_pipeline": ext["wall_s"]}
    times.update({n: round(best[n], 3) for n in names})
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (extraction replicated x"
                f"{replicate}; docs/sec and GB/sec in extras)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf),
                "extras": {
                    "cpus": cpus,
                    "extraction_docs_per_sec": ext["docs_per_sec"],
                    "extraction_gb_per_sec": ext["gb_per_sec"],
                    "extraction_docs": ext["n_docs"],
                    "extraction_bytes_in": ext["bytes_in"],
                    "extraction_words_out": ext["n_words"],
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
