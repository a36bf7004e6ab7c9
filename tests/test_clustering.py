"""Distributed k-means vs a plain numpy Lloyd's implementation."""

import numpy as np
from pyspark.sql import functions as F

from projet_graphdb_spark.functions.clustering import kmeans_assignments

from conftest import SF_TINY


def _numpy_kmeans(X, ids, k, num_iter, dp=6):
    cents = {i: np.round(X[ids == i][0].astype(np.float64), dp) for i in range(k)}

    def assign(cts):
        C = np.stack([cts[i] for i in range(k)])
        d = ((X[:, None, :].astype(np.float64) - C[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # argmin takes the first (smallest cid) on ties

    lab = None
    for _ in range(num_iter):
        lab = assign(cents)
        for c in range(k):
            members = X[lab == c]
            if len(members):
                cents[c] = np.round(members.astype(np.float64).mean(axis=0), dp)
    return assign(cents)


def test_kmeans_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assignments(emb, k=8, num_iter=2).collect()
    }
    expect = _numpy_kmeans(X, ids, k=8, num_iter=2)
    mism = sum(1 for i, vid in enumerate(ids) if got[vid] != expect[i])
    # numpy's mean/argmin summation order differs; the 6-dp centroid
    # rounding absorbs it except for exactly-boundary points (none here)
    assert mism == 0, mism


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # two far groups, 3 centroids seeded inside them -> one centroid may
    # end up empty; assignments must still cover all ids with k clusters max
    data = [(i, [float(i % 2) * 100.0] * 4) for i in range(20)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    out = kmeans_assignments(df, k=3, num_iter=2)
    rows = out.collect()
    assert len(rows) == 20
    assert set(r["cluster"] for r in rows) <= {0, 1, 2}


def test_label_centroid_stats_numpy(spark):
    import numpy as np

    from projet_graphdb_spark.functions.clustering import label_centroid_stats

    rng = np.random.default_rng(3)
    rows = []
    for vid in range(40):
        rows.append((vid, [float(x) for x in rng.normal(size=8)], vid % 3))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["label"]: r for r in label_centroid_stats(df).collect()}
    X = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    lbl = np.array([r[2] for r in rows])
    for l in (0, 1, 2):
        sub = X[lbl == l]
        m = np.round(sub.mean(axis=0), 6)
        csq = round(float((m * m).sum()), 6)
        e_sq = round(float((sub * sub).sum(axis=1).mean()), 6)
        r = got[l]
        assert r["n_vecs"] == len(sub)
        assert abs(r["centroid_norm"] - round(float(np.sqrt(csq)), 6)) <= 1e-6
        assert abs(r["avg_sq_dist"] - round(e_sq - csq, 6)) <= 2e-6
