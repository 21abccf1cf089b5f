"""IVF approximate nearest-neighbor search over embedding columns.

The scale path for similarity search (brute-force cosine in
operators/similarity.py is the exact baseline): cluster the corpus with
MLlib KMeans into ``n_cells`` inverted lists, then search only the
``n_probe`` cells closest to each query — an O(n/k * probe) scan instead
of O(n).

Spark plan: centroids are a tiny broadcast; cell assignment is one
``model.transform`` pass (stored alongside the corpus — at 100 TB this is
a write-once partition column enabling partition pruning per query); the
probe join is an equi-join on cell_id so only matching buckets shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kats_spark.operators.similarity import cosine


def build_index(
    df: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 7,
):
    """KMeans the corpus into cells.  Returns (indexed_df, kmeans_model):
    indexed_df = df + ``cell_id``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("__vec", array_to_vector(F.col(vec_col)))
    km = KMeans(k=n_cells, seed=seed, featuresCol="__vec", predictionCol="cell_id")
    model = km.fit(feat)
    indexed = model.transform(feat).drop("__vec")
    return indexed, model


def search(
    indexed: DataFrame,
    model,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine neighbors per query row, probing the n_probe nearest
    cells.  queries: (query_id, embedding).  Output (query_id, doc_id,
    cosine_sim, rank)."""
    import numpy as np

    centers = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    spark = indexed.sparkSession
    centers_df = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centers)],
        "cell_id int, center array<double>",
    )
    # rank cells per query by distance to centroid, keep n_probe
    qc = queries.crossJoin(F.broadcast(centers_df))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col(vec_col), F.col("center"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    ranked = qc.withColumn("__d", dist).withColumn(
        "__cr",
        F.row_number().over(Window.partitionBy(query_id_col).orderBy("__d")),
    )
    probes = ranked.filter(F.col("__cr") <= n_probe).select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec"), "cell_id"
    )
    # equi-join on cell_id: only probed buckets scan
    cand = probes.join(indexed, "cell_id")
    sim = cand.withColumn("cosine_sim", cosine(F.col("__qvec"), F.col(vec_col)))
    topk = sim.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.desc("cosine_sim"), F.col(id_col)
            )
        ),
    ).filter(F.col("rank") <= k)
    return topk.select(query_id_col, id_col, "cosine_sim", "rank")
