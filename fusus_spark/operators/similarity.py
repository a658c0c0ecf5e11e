"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k (exact; the correctness oracle).
Scale path: IVF — route each vector to its nearest centroid(s) and only
search within the probed buckets; the cross join shrinks from
|Q| x |N| to |Q| x (|N| / n_buckets * n_probes). Centroid assignment
and bucket search are both broadcast joins (centroid set is tiny), so
the plan has NO shuffle on the big side beyond the final top-k window.

All vector math is JVM-side (zip_with/aggregate) — no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fusus_spark.functions.text import cosine


def _as_double(c: str) -> F.Column:
    return F.col(c).cast("array<double>")


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (queries broadcast).

    Deterministic tie-break: (cos_sim desc, vec_id asc) on a 1e-6-rounded
    similarity, so results are stable across partitionings and engines.
    """
    joined = emb.crossJoin(F.broadcast(queries)).where(
        F.col(id_col) != F.col(q_id_col)
    )
    sim = F.round(cosine(_as_double(vec_col), _as_double(q_vec_col)), 6)
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col(q_id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            "cos_sim",
            "rank",
        )
    )


def make_queries(emb: DataFrame, n_queries: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Deterministic query set: the n lowest vec_ids."""
    return (
        emb.where(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF bucket assignment: centroid = argmax cosine over a fixed,
    deterministic centroid set (the first n_centroids vectors by id —
    at real scale: k-means centroids computed once and broadcast).

    Returns emb columns + ``bucket``. Plan: broadcast nested-loop against
    the tiny centroid set + one row_number window — no all-pairs shuffle.
    """
    cents = (
        emb.where(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("bucket"), F.col(vec_col).alias("cent_vec"))
    )
    sim = F.round(cosine(_as_double(vec_col), F.col("cent_vec").cast("array<double>")), 6)
    w = Window.partitionBy(id_col).orderBy(F.col("cent_sim").desc(), F.col("bucket").asc())
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", sim)
        .withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .drop("cent_vec", "r")
    )


def rp_planes(n_planes: int = 16, dim: int = 64, seed: int = 7):
    """The seeded hyperplane matrix — the single source of truth shared
    by the Spark plans AND the DuckDB oracle builders (repr round-trips
    the doubles exactly in both parsers)."""
    import numpy as np

    return np.random.RandomState(seed).standard_normal((n_planes, dim))


def rp_sig_col(vec: F.Column, planes) -> F.Column:
    """Random-hyperplane signature int: bit p = sign of dot(v, r_p).

    The dot is rounded to 9 decimals before the sign test — identically
    in the oracle (rp_sig_sql) — so summation-order float noise near
    dot == 0 can never flip a bit between engines.
    """
    v = vec.cast("array<double>")
    acc = F.lit(0)
    for p, row in enumerate(planes):
        r = F.array(*[F.lit(float(x)) for x in row])
        dot = F.aggregate(
            F.zip_with(v, r, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        acc = acc + (F.round(dot, 9) > 0).cast("int") * F.lit(1 << p)
    return acc


def rp_sig_sql(vec_expr: str, planes) -> str:
    """DuckDB expression computing the same signature as rp_sig_col."""
    return " + ".join(
        f"(CASE WHEN round(list_dot_product({vec_expr}::DOUBLE[], ["
        + ", ".join(repr(float(x)) for x in row)
        + "]::DOUBLE[]), 9) > 0 THEN " + str(1 << p) + " ELSE 0 END)"
        for p, row in enumerate(planes)
    )


def rp_banded(df: DataFrame, idc: str, vc: str, planes,
              band_bits: int, keep_vec: bool) -> DataFrame:
    """Explode a vector table into (id, [vec,] band, band_val) rows —
    the LSH bucket keys. One row per (vector, band); all math JVM-side."""
    n_planes = len(planes)
    n_bands = max(n_planes // band_bits, 1)
    mask = (1 << band_bits) - 1
    with_sig = df.withColumn("sig", rp_sig_col(F.col(vc), planes))
    cols = [idc, "sig"] + ([vc] if keep_vec else [])
    out = with_sig.select(*cols,
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"))
    return out.withColumn(
        "band_val", F.expr(f"shiftright(sig, band * {band_bits}) & {mask}")
    )


def rp_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    band_bits: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via random-hyperplane (cosine) LSH.

    Signature bit ``b_p`` = sign of ``dot(v, r_p)`` over ``n_planes``
    deterministic hyperplanes (seeded NumPy normals embedded as plan
    literals — broadcast-by-construction); the bits are banded into
    ``n_planes / band_bits`` chunks and candidates are vectors sharing
    >= 1 band value with the query. All vector math is JVM-side
    (zip_with/aggregate); the only joins are on tiny (band, value) keys,
    so at 10^9 vectors the plan never shuffles the embedding column
    beyond its bucket — the same collision-only fan-in argument as the
    MinHash band join. Recall < 1.0 by construction; measured against
    brute_force_topk in the pytest suite.
    """
    planes = rp_planes(n_planes, dim, seed)

    cand_side = rp_banded(emb, id_col, vec_col, planes, band_bits, keep_vec=True)
    q_side = rp_banded(
        queries.select(F.col("query_id"), F.col("query_vec")),
        "query_id", "query_vec", planes, band_bits, keep_vec=True,
    ).select("query_id", "query_vec", "band", "band_val")
    cand = (
        cand_side.join(F.broadcast(q_side), ["band", "band_val"])
        .where(F.col(id_col) != F.col("query_id"))
        .dropDuplicates(["query_id", id_col])
    )
    sim = F.round(cosine(_as_double(vec_col), F.col("query_vec").cast("array<double>")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos_sim", "rank")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the n_probes closest buckets per query.

    Recall < 1.0 by construction; the pytest suite measures recall
    against brute_force_topk on the fixture embeddings.
    """
    assigned = ivf_assign(emb, n_centroids, id_col, vec_col)
    cents = (
        emb.where(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("bucket"), F.col(vec_col).alias("cent_vec"))
    )
    qsim = F.round(
        cosine(F.col("query_vec").cast("array<double>"),
               F.col("cent_vec").cast("array<double>")), 6
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("cent_sim").desc(), F.col("bucket").asc())
    probed = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("cent_sim", qsim)
        .withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= n_probes)
        .select("query_id", "query_vec", "bucket")
    )
    cand = assigned.join(F.broadcast(probed), "bucket").where(
        F.col(id_col) != F.col("query_id")
    )
    sim = F.round(cosine(_as_double(vec_col), F.col("query_vec").cast("array<double>")), 6)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("cos_sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos_sim", "rank")
    )
