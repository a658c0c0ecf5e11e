"""Relational / window / join queries over the TPC-H-ish tables + events.

These exercise the generic operator surface of SURVEY.md §2 (A1-A9,
W1-W7, O1-O6, J2/J4, F1/F12) on the driver's oracle tables. Aliasing
and scaled-bigint conventions as in web_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from fusus_spark.sources.testdata import load

# ---------------------------------------------------------------------------
# TPC-H-style


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final agg with several measures (A3 analog)."""
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity") * 100).cast("bigint").alias("sum_qty_e2"),
            F.round(F.sum("l_extendedprice") * 100).cast("bigint").alias("sum_base_e2"),
            F.round(F.sum(disc_price) * 100).cast("bigint").alias("sum_disc_e2"),
            F.round(F.sum(charge) * 100).cast("bigint").alias("sum_charge_e2"),
            F.round(F.avg("l_quantity") * 10000).cast("bigint").alias("avg_qty_e4"),
            F.round(F.avg("l_discount") * 1000000).cast("bigint").alias("avg_disc_e6"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity) * 100)::BIGINT AS sum_qty_e2,
       round(sum(l_extendedprice) * 100)::BIGINT AS sum_base_e2,
       round(sum(l_extendedprice * (1 - l_discount)) * 100)::BIGINT AS sum_disc_e2,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100)::BIGINT AS sum_charge_e2,
       round(avg(l_quantity) * 10000)::BIGINT AS avg_qty_e4,
       round(avg(l_discount) * 1000000)::BIGINT AS avg_disc_e6,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + top-k with deterministic tie-break."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(revenue * 100).cast("bigint").alias("revenue_e2"))
        # distributed top-k (TakeOrderedAndProject), not a global window
        # over every aggregated order; rank recovered on the <= 10 rows
        .orderBy(F.col("revenue_e2").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )
    # constant-valued non-foldable partition key: window over the 10
    # surviving rows only, without the no-partition WindowExec warning
    w = Window.partitionBy(F.pmod(F.col("revenue_e2"), F.lit(1))).orderBy(
        F.col("revenue_e2").desc(), F.col("o_orderkey").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("o_orderkey", "o_orderdate", "revenue_e2", "rank")
    )


ORACLE_TOP_ORDERS = """
WITH rev AS (
  SELECT o.o_orderkey, o.o_orderdate,
         round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100)::BIGINT AS revenue_e2
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
  GROUP BY o.o_orderkey, o.o_orderdate
)
SELECT o_orderkey, o_orderdate, revenue_e2, rank FROM (
  SELECT *, row_number() OVER (ORDER BY revenue_e2 DESC, o_orderkey ASC)::INT AS rank
  FROM rev) WHERE rank <= 10
"""


def q_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through nation/region (broadcast dims)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.round(revenue * 100).cast("bigint").alias("revenue_e2"),
            F.count("*").cast("bigint").alias("n_lineitems"),
        )
    )


ORACLE_NATION_REVENUE = """
SELECT r.r_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100)::BIGINT AS revenue_e2,
       count(*)::BIGINT AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


def q_part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    # avg over exact integer cents: float-sum order can flip a .5
    # boundary between engines, int sums cannot.
    cents = F.round(F.col("p_retailprice") * 100).cast("bigint")
    return part.groupBy("p_brand").agg(
        F.count("*").cast("bigint").alias("n_parts"),
        F.round(F.sum(cents) * 100 / F.count("*")).cast("bigint").alias("avg_price_e4"),
        F.min("p_size").cast("int").alias("min_size"),
        F.max("p_size").cast("int").alias("max_size"),
    )


ORACLE_PART_BRAND_STATS = """
SELECT p_brand, count(*)::BIGINT AS n_parts,
       round(sum(round(p_retailprice * 100)::BIGINT) * 100 / count(*))::BIGINT AS avg_price_e4,
       min(p_size)::INT AS min_size, max(p_size)::INT AS max_size
FROM part GROUP BY p_brand
"""


def q_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join supplier->nation (broadcast) + per-nation balance rollup."""
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        sup.join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.round(F.sum("s_acctbal") * 100).cast("bigint").alias("total_bal_e2"),
        )
    )


ORACLE_SUPPLIER_BALANCE = """
SELECT n.n_name, count(*)::BIGINT AS n_suppliers,
       round(sum(s.s_acctbal) * 100)::BIGINT AS total_bal_e2
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# Events: windows / sessionization (W2/W3/A7 analogs)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: new session when gap > 30 min.

    The cumulative-sum-of-boundaries pattern — exactly the reference's
    sentence segmentation (fusus/tfFromTsv.py:703-707, A7/W3): a
    running count of boundary events assigns group ids.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ: cast via timestamp_ltz (session tz = UTC) to
    # get epoch seconds; direct NTZ->BIGINT casts are rejected.
    epoch = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    with_s = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    return with_s.groupBy("user_id").agg(
        F.max("session_id").cast("int").alias("n_sessions"),
        F.count("*").cast("bigint").alias("n_events"),
    )


ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id,
       sum(is_new)::INT AS n_sessions,
       count(*)::BIGINT AS n_events
FROM g GROUP BY user_id
"""


def q_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per user (W3 sentence-numbering analog), sampled
    to the first 20 events per user for a bounded result."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("seq", F.row_number().over(w).cast("int"))
        .withColumn(
            "running_e4",
            F.round(
                F.sum("value").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ) * 10000
            ).cast("bigint"),
        )
        .where(F.col("seq") <= 20)
        .select("user_id", "event_id", "seq", "running_e4")
    )


ORACLE_RUNNING_VALUE = """
SELECT user_id, event_id, seq, running_e4 FROM (
  SELECT user_id, event_id,
         row_number() OVER w::INT AS seq,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 10000)::BIGINT AS running_e4
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
) WHERE seq <= 20
"""


def q_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-change detection (W2 analog): count event_type switches."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        F.lag("event_type").over(w).isNotNull()
        & (F.col("event_type") != F.lag("event_type").over(w)),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("chg", changed)
        .groupBy("user_id")
        .agg(F.sum("chg").cast("bigint").alias("n_transitions"))
    )


ORACLE_TYPE_TRANSITIONS = """
WITH t AS (
  SELECT user_id,
         CASE WHEN lag(event_type) OVER w IS NOT NULL
               AND event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, sum(chg)::BIGINT AS n_transitions FROM t GROUP BY user_id
"""


def q_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (O4 worst-20 analog): top 3 events by value per user."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .select(
            "user_id", "event_id", "rank",
            F.round(F.col("value") * 10000).cast("bigint").alias("value_e4"),
        )
    )


ORACLE_TOP_EVENTS_PER_USER = """
SELECT user_id, event_id, rank, round(value * 10000)::BIGINT AS value_e4 FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC)::INT AS rank
  FROM events) WHERE rank <= 3
"""


def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value") * 10000).cast("bigint").alias("sum_value_e4"),
        )
    )


ORACLE_EVENTS_DAILY = """
SELECT ts::DATE AS day, event_type,
       count(*)::BIGINT AS n,
       round(sum(value) * 10000)::BIGINT AS sum_value_e4
FROM events GROUP BY 1, 2
"""


# PassJoin segmenting for the 12-char prefix / distance-4 edit join:
# (chunk_id, 1-based start, length). 5 = maxD + 1 segments, so any pair
# within distance 4 has at least one untouched segment (pigeonhole).
_LEV_PREFIX_LEN = 12
_LEV_MAX_D = 4
_LEV_CHUNKS = ((0, 1, 3), (1, 4, 3), (2, 7, 2), (3, 9, 2), (4, 11, 2))


def q_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alignment prefilter (J1 relational half): close doc prefixes by
    edit distance <= 4, as a PassJoin-style blocked similarity join.

    lev(a, b) <= d implies: partition a into d+1 segments and at least
    one segment survives all edits, appearing verbatim in b at a start
    position shifted by at most d (Li et al., PassJoin, VLDB'12). So
    the join key is (lang, chunk_id, segment chars) — every index
    segment against every shifted probe substring — which is COMPLETE
    (the all-pairs DuckDB oracle is unchanged and still hash-matches)
    while the fan-in per key is the character-level block, not the
    whole language (the round-1 plan was quadratic within each of ~5
    languages). Prefixes shorter than 12 chars take a broadcast
    all-pairs lane (rare degenerate docs). Candidates are verified with
    the exact JVM levenshtein.
    """
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.substring(F.trim("text"), 1, _LEV_PREFIX_LEN).alias("prefix")
    )
    return levenshtein_blocked_pairs(docs)


def levenshtein_blocked_pairs(docs: DataFrame) -> DataFrame:
    """PassJoin-blocked edit-distance self-join over (doc_id, lang,
    prefix) rows; see q_levenshtein_pairs for the completeness argument."""
    docs = docs.localCheckpoint()  # reused by index, probe, short lane + 2 verify sides

    full = docs.where(F.length("prefix") == _LEV_PREFIX_LEN)
    segs = F.array(*[
        F.struct(F.lit(c).alias("chunk"), F.substring("prefix", s, ln).alias("seg"))
        for c, s, ln in _LEV_CHUNKS
    ])
    idx = full.select("doc_id", "lang", F.explode(segs).alias("x")).select(
        "doc_id", "lang", F.col("x.chunk").alias("chunk"), F.col("x.seg").alias("seg")
    )
    probes = F.array_distinct(F.array(*[
        F.struct(F.lit(c).alias("chunk"), F.substring("prefix", p, ln).alias("seg"))
        for c, s, ln in _LEV_CHUNKS
        for p in range(max(1, s - _LEV_MAX_D),
                       min(s + _LEV_MAX_D, _LEV_PREFIX_LEN - ln + 1) + 1)
    ]))
    prb = full.select("doc_id", "lang", F.explode(probes).alias("x")).select(
        "doc_id", "lang", F.col("x.chunk").alias("chunk"), F.col("x.seg").alias("seg")
    )
    cand = (
        idx.alias("i").join(
            prb.alias("p"),
            (F.col("i.lang") == F.col("p.lang"))
            & (F.col("i.chunk") == F.col("p.chunk"))
            & (F.col("i.seg") == F.col("p.seg"))
            & (F.col("i.doc_id") != F.col("p.doc_id")),
        )
        .select(
            F.least("i.doc_id", "p.doc_id").alias("doc_a"),
            F.greatest("i.doc_id", "p.doc_id").alias("doc_b"),
        )
    )
    # degenerate short prefixes: all-pairs within lang, short side broadcast
    short = docs.where(F.length("prefix") < _LEV_PREFIX_LEN)
    short_cand = (
        F.broadcast(short.alias("s")).join(
            docs.alias("t"),
            (F.col("s.lang") == F.col("t.lang"))
            & (F.col("s.doc_id") != F.col("t.doc_id")),
        )
        .select(
            F.least("s.doc_id", "t.doc_id").alias("doc_a"),
            F.greatest("s.doc_id", "t.doc_id").alias("doc_b"),
        )
    )
    pairs = cand.unionByName(short_cand).dropDuplicates(["doc_a", "doc_b"])
    va = docs.select(F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang"),
                     F.col("prefix").alias("pa"))
    vb = docs.select(F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pb"))
    return (
        pairs.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn("dist", F.levenshtein("pa", "pb").cast("int"))
        .where(F.col("dist") <= _LEV_MAX_D)
        .select("doc_a", "doc_b", "lang", "dist")
    )


ORACLE_LEVENSHTEIN_PAIRS = """
WITH p AS (SELECT doc_id, lang, substr(trim(text), 1, 12) AS prefix FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
       levenshtein(a.prefix, b.prefix)::INT AS dist
FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE levenshtein(a.prefix, b.prefix) <= 4
"""


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J1's temporal-alignment shape, relational half): each
    click event picks up the most recent prior purchase value of the
    same user.

    Scalable merged-stream plan: instead of a range join (which explodes
    to |clicks| x |purchases| per user before filtering), both sides are
    union'd into ONE stream and the purchase value is forward-filled
    with last(ignorenulls) over (user, ts) — a single shuffle on
    user_id, linear in the input. Tie at equal ts: purchases sort before
    clicks (inclusive as-of), later purchase event_id wins.
    """
    ev = load(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
        F.lit(1).alias("is_left"),
        F.lit(None).cast("double").alias("pval"),
    )
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(0).alias("is_left"),
        F.col("value").alias("pval"),
    )
    merged = right.unionByName(left)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("last_pval", F.last("pval", ignorenulls=True).over(w))
        .where(F.col("is_left") == 1)
        .select(
            "user_id", "event_id",
            F.round(F.col("last_pval") * 10000).cast("bigint").alias("last_purchase_e4"),
        )
    )


ORACLE_EVENTS_ASOF = """
WITH m AS (
  SELECT user_id, ts, event_id, 1 AS is_left, NULL::DOUBLE AS pval
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, 0 AS is_left, value AS pval
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id, round(last_pval * 10000)::BIGINT AS last_purchase_e4 FROM (
  SELECT user_id, event_id, is_left,
         last_value(pval IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, is_left, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_pval
  FROM m) WHERE is_left = 1
"""


def q_lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: per-(flag, status) measures plus subtotal and
    grand-total rows, disambiguated by grouping_id (partial+final agg
    over grouping sets — Catalyst expands to one pass)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.round(F.sum("l_quantity") * 100).cast("bigint").alias("sum_qty_e2"),
        F.round(F.sum("l_extendedprice") * 100).cast("bigint").alias("sum_base_e2"),
        F.count("*").cast("bigint").alias("n"),
    )


ORACLE_LINEITEM_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus)::INT AS gid,
       round(sum(l_quantity) * 100)::BIGINT AS sum_qty_e2,
       round(sum(l_extendedprice) * 100)::BIGINT AS sum_base_e2,
       count(*)::BIGINT AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# NB ordering: the driver's correctness run covers at most 50 registry
# entries in iteration order — events_asof/lineitem_rollup sat last in
# round 2 and fell off the end. The registry is now exactly 50 entries,
# and the two formerly-skipped queries lead this dict defensively.
RELATIONAL_QUERIES: dict = {
    "events_asof": q_events_asof,
    "lineitem_rollup": q_lineitem_rollup,
    "pricing_summary": q_pricing_summary,
    "top_orders": q_top_orders,
    "nation_revenue": q_nation_revenue,
    "part_brand_stats": q_part_brand_stats,
    "supplier_balance": q_supplier_balance,
    "sessionize": q_sessionize,
    "running_value": q_running_value,
    "type_transitions": q_type_transitions,
    "top_events_per_user": q_top_events_per_user,
    "events_daily": q_events_daily,
    "levenshtein_pairs": q_levenshtein_pairs,
}

RELATIONAL_ORACLES: dict[str, str] = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "top_orders": ORACLE_TOP_ORDERS,
    "nation_revenue": ORACLE_NATION_REVENUE,
    "part_brand_stats": ORACLE_PART_BRAND_STATS,
    "supplier_balance": ORACLE_SUPPLIER_BALANCE,
    "sessionize": ORACLE_SESSIONIZE,
    "running_value": ORACLE_RUNNING_VALUE,
    "type_transitions": ORACLE_TYPE_TRANSITIONS,
    "top_events_per_user": ORACLE_TOP_EVENTS_PER_USER,
    "events_daily": ORACLE_EVENTS_DAILY,
    "levenshtein_pairs": ORACLE_LEVENSHTEIN_PAIRS,
    "events_asof": ORACLE_EVENTS_ASOF,
    "lineitem_rollup": ORACLE_LINEITEM_ROLLUP,
}
