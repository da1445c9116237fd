"""Similarity search over embedding columns (array<float>).

Two tiers:
  - brute-force cosine top-k: the exact baseline (catalog: sim_bruteforce_topk)
  - IVF (inverted-file) top-k: assign every vector to its nearest centroid,
    probe only the query's cluster — the 100 TB path (here: ivf_topk)

All vector math is native ``zip_with``/``aggregate`` higher-order functions
(JVM-side, no UDF); ranking is a per-query window with deterministic
tiebreaks, so results are exactly reproducible in the DuckDB oracle.

Scale notes: the centroid set is tiny and broadcast; assignment is one narrow
pass over the scan; the probe join shuffles only the probed cluster's rows.
A real deployment trains centroids with k-means (Spark MLlib) and probes
nprobe>1 clusters; here centroids are a deterministic subset (vec_id < C) so
the oracle can mirror them, and nprobe=1 — recall loss vs brute force is the
documented IVF tradeoff, not a bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_double(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("e", F.transform(vec_col, lambda x: x.cast("double")))


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b):
    return dot(a, b) / (norm(a) * norm(b))


def centroids_from_ids(emb: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic centroid set (vec_id < n_centroids): untrained but
    exactly mirrorable in the DuckDB oracle — the GATE configuration."""
    return emb.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("ce")
    )


def train_centroids_kmeans(
    emb: DataFrame, n_centroids: int = 8, seed: int = 42, max_iter: int = 20
) -> DataFrame:
    """K-means-trained centroids (Spark MLlib): the PRODUCTION configuration —
    recall at a given nprobe depends on centroid quality, and trained
    centroids track the data distribution instead of data-luck. Returns the
    same (cent_id, ce) shape as ``centroids_from_ids`` so every downstream
    op is centroid-source-agnostic. The centroid set is tiny (k rows): built
    on the driver, broadcast at use."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(array_to_vector(F.col("e")).alias("features"))
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return emb.sparkSession.createDataFrame(centers, "cent_id int, ce array<double>")


def assign_clusters(
    emb: DataFrame, n_centroids: int = 8, centroids: DataFrame | None = None
) -> DataFrame:
    """Nearest-centroid assignment. Returns (vec_id, e, cluster)."""
    cents = F.broadcast(
        centroids if centroids is not None else centroids_from_ids(emb, n_centroids)
    )
    scored = emb.crossJoin(cents).select(
        "vec_id", "e", "cent_id", cosine(F.col("e"), F.col("ce")).alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "e", F.col("cent_id").alias("cluster"))
    )


def probe_clusters(
    emb: DataFrame,
    n_centroids: int,
    nprobe: int,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Top-nprobe nearest centroids per vector: (vec_id, e, cluster) with one
    row per probed cluster (nprobe=1 == assign_clusters)."""
    cents = F.broadcast(
        centroids if centroids is not None else centroids_from_ids(emb, n_centroids)
    )
    scored = emb.crossJoin(cents).select(
        "vec_id", "e", "cent_id", cosine(F.col("e"), F.col("ce")).alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= nprobe)
        .select("vec_id", "e", F.col("cent_id").alias("cluster"))
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: tuple[int, int] = (20, 30),
    k: int = 3,
    n_centroids: int = 8,
    nprobe: int = 1,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their ONE nearest
    cluster; each query probes its ``nprobe`` nearest clusters (the standard
    recall/latency knob — nprobe == n_centroids degenerates to brute force).
    ``centroids``: pass ``train_centroids_kmeans(...)`` for the production
    configuration; None keeps the oracle-mirrorable deterministic subset.
    Returns (query_id, neighbor_id, cosine, rank) — 4-dp fixed point,
    (cos desc, neighbor_id) tiebreak."""
    assigned = assign_clusters(
        as_double(emb).select("vec_id", "e"), n_centroids, centroids=centroids
    )
    probes = probe_clusters(
        as_double(emb).select("vec_id", "e"), n_centroids, nprobe, centroids=centroids
    )
    queries = probes.where(
        (F.col("vec_id") >= query_ids[0]) & (F.col("vec_id") < query_ids[1])
    ).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("cluster").alias("qc")
    )
    pairs = assigned.join(
        F.broadcast(queries),
        (F.col("cluster") == F.col("qc")) & (F.col("vec_id") != F.col("query_id")),
    ).dropDuplicates(["query_id", "vec_id"])
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("e"), F.col("qe")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.floor(F.col("cos") * 10000 + F.lit(0.5)) / 10000.0).alias("cosine"),
            F.col("rn").cast("long").alias("rank"),
        )
    )


def cosine_near_dup_pairs(
    emb: DataFrame, max_id: int = 200, threshold: float = 0.4
) -> DataFrame:
    """Embedding-cosine near-dup pairs (v1 < v2, cosine >= threshold) —
    the brute-force verifier tier of the dedup ladder for embedded content.
    At 100 TB the pair space is cut by LSH/IVF bucketing first; the threshold
    here is calibrated to the synthetic corpus (max pairwise cos ≈ 0.44)."""
    e = as_double(emb.where(F.col("vec_id") < max_id)).select("vec_id", "e")
    a = e.select(F.col("vec_id").alias("v1"), F.col("e").alias("e1"))
    b = e.select(F.col("vec_id").alias("v2"), F.col("e").alias("e2"))
    pairs = a.join(F.broadcast(b), F.col("v1") < F.col("v2"))
    cos = cosine(F.col("e1"), F.col("e2"))
    return pairs.select(
        "v1", "v2", (F.floor(cos * 10000 + F.lit(0.5)) / 10000.0).alias("cosine")
    ).where(F.col("cosine") >= threshold)
