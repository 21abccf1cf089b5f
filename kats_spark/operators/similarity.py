"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
variant as the 100 TB scale path.  Embeddings are ``array<float>`` columns;
dot products use ``F.zip_with`` + ``F.aggregate`` (JVM-side, no Python).

Scale notes: brute-force vs a single query vector is a narrow map + top-k
(no shuffle at all).  All-pairs is quadratic — the LSH variant buckets by
random hyperplane signs so only intra-bucket pairs join, trading recall
for a bounded join fan-out.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def topk_vs_query(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    Plan: narrow projection computing the score (whole-stage codegen) →
    ``orderBy(desc).limit(k)`` which Spark executes as TakeOrderedAndProject
    (per-partition heap + driver merge of k rows) — no full sort, no
    shuffle of the data."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def all_pairs_topk(
    df: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact all-pairs cosine top-k per item (small/medium N — the
    verification baseline).  Broadcast one side when it fits."""
    from pyspark.sql import Window

    l = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    r = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    pairs = l.join(F.broadcast(r), F.col("id_a") != F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos_sim")
    ).filter(F.col("cos_sim") > threshold)
    w = Window.partitionBy("id_a").orderBy(F.desc("cos_sim"), F.asc("id_b"))
    return scored.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k).drop("__rk")


def lsh_bucket_pairs(
    df: DataFrame,
    num_planes: int = 8,
    seed: int = 7,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Random-hyperplane LSH: sign-pattern bucket id per vector, then
    intra-bucket candidate pairs.  The scale path for near-neighbor search:
    one narrow projection + one equi-join on bucket."""
    rnd = random.Random(seed)
    planes = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(num_planes)]
    bucket = F.lit(0)
    v = F.col(vec_col)
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (dot(v, plane) > 0).cast("int")
        bucket = bucket + F.shiftleft(bit, i)
    b = df.select(F.col(id_col), bucket.alias("bucket"))
    l = b.withColumnRenamed(id_col, "id_a")
    r = b.withColumnRenamed(id_col, "id_b")
    return (
        l.join(r, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("bucket", "id_a", "id_b")
    )
