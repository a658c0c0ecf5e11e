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
