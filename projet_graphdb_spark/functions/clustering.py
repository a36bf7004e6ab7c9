"""Distributed k-means (Lloyd's iterations) over an embedding column.

The reference has no clustering at all; this is part of the
training-data-pipeline surface (cluster-balanced sampling, IVF codebook
training, topic bucketing).  The Spark shape per iteration is the one
that scales:

* **assignment** — the current centroids are a handful of literals
  inlined into the plan (like the IVF codebook in ``similarity.knn_ivf``),
  so assigning every vector is MAP-ONLY: no shuffle, no broadcast
  exchange, whole-stage codegen over ``zip_with``/``aggregate``.
* **update** — ``posexplode`` the assigned vectors and average per
  (cluster, position): ONE shuffle of (k·dim)-bounded aggregates
  (map-side combined), then a k·dim-row collect to the driver — tiny by
  construction (centroids must fit on the driver for the next literal
  inlining regardless).

Determinism/oracle story: seeding is deterministic (vectors with
``id < k``), ties break toward the smaller centroid id, and every
centroid coordinate is rounded to ``round_dp`` decimals after each
average.  The rounding absorbs float summation-order differences, so a
DuckDB oracle replaying the same iterations (same left-to-right
fold for distances, same rounding) reproduces the assignment exactly —
the a3-pagerank playbook applied to clustering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sqdist_to_literal(vec: Column, centroid: list) -> Column:
    """Squared euclidean distance to a literal centroid, accumulated
    left-to-right (bit-reproducible; mirrors the oracle's list fold)."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec, lit, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


# Above this many centroid·dim literal cells the inlined distance
# expression becomes the bottleneck (same failure mode as the SRP plane
# trees in similarity._MAX_JVM_PLANES: minutes of driver-side Catalyst
# analysis + generated code past janino's 64 KB cap).  Past the cutoff,
# assignment runs as ONE Arrow-batched numpy UDF whose closure carries
# the (k × dim) centroid matrix — per-batch cost one BLAS matmul.
# Oracle constructions (k ≤ 16 or so) always stay on the JVM path.
# JVM-literal assignment cutoff in cells×dim units.  MEASURED at 1M
# rows (round 7): the literal array-of-structs + array_sort plan is
# 13-50× slower than the Arrow BLAS UDF at every size ≥1024 units
# (k=32/dim=32: 41 s vs 3 s; k=256: 413 s vs 8 s) — per-row struct
# allocation and the k-element sort dominate long before the
# distance arithmetic does.  512 keeps the pinned oracle codebooks
# (8 cells × 64 dims and smaller — s4/s10/s22/s24) on the fused
# whole-stage-codegen path where the Python-worker roundtrip would
# cost more than the job; everything bigger goes BLAS.  Both paths
# are bit-identical on seeded constructions (tests pin parity), so
# the cutoff is purely a performance dial.
_MAX_JVM_CELLS = 512


def assign_topn(
    emb: DataFrame,
    cents: dict,
    nprobe: int = 1,
    vec_col: str = "embedding",
    out_col: str = "_cells",
) -> DataFrame:
    """Adds ``out_col``: array of the ``nprobe`` nearest centroid ids
    (squared euclidean, ties to the smaller cid), map-only.

    Size-gated like the SRP signatures: small codebooks inline the
    centroids as literals (whole-stage codegen, left-to-right distance
    fold — bit-reproducible against a SQL oracle's ``list_reduce``);
    codebooks past ``_MAX_JVM_CELLS`` literal cells switch to one
    Arrow-batched BLAS UDF (``pyudf.make_topn_cells_udf``).  Both paths
    use the same stable (distance, cid) ordering; they can disagree
    only on exact distance ties between DIFFERENT centroids, which the
    seeded constructions used by oracles never produce.
    """
    items = sorted(cents.items())
    dim = len(items[0][1]) if items else 0
    if len(items) * dim <= _MAX_JVM_CELLS:
        arr = F.array(
            *[
                F.struct(
                    _sqdist_to_literal(F.col(vec_col), cv).alias("d"),
                    F.lit(int(cid)).cast("long").alias("cid"),
                )
                for cid, cv in items
            ]
        )
        nearest = F.slice(F.array_sort(arr), 1, nprobe)
        return emb.withColumn(
            out_col, F.transform(nearest, lambda s: s["cid"])
        )
    import numpy as np

    from .pyudf import make_topn_cells_udf

    mat = np.asarray([cv for _, cv in items], dtype=np.float64)
    cids = [int(cid) for cid, _ in items]
    return emb.withColumn(out_col, make_topn_cells_udf(mat, cids, nprobe)(F.col(vec_col)))


def _assign(emb: DataFrame, cents: dict, id_col: str, vec_col: str) -> DataFrame:
    """(id, vec, cluster): nearest centroid, ties to the smaller cid —
    map-only (size-gated literal argmin / BLAS UDF, see assign_topn)."""
    return (
        assign_topn(emb, cents, nprobe=1, vec_col=vec_col, out_col="_c1")
        .withColumn("cluster", F.col("_c1")[0])
        .drop("_c1")
    )


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    num_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> dict:
    """Trained codebook: {cid: centroid} after ``num_iter`` Lloyd
    iterations from the deterministic seed (vectors with ``id < k``,
    coordinates rounded to ``round_dp`` after every average).  The
    driver-side dict is the INDEX METADATA a consumer (e.g. IVF search)
    inlines as literals."""
    emb = embeddings.select(F.col(id_col), F.col(vec_col)).localCheckpoint(eager=True)
    seed = emb.filter(F.col(id_col) < k).select(id_col, vec_col).collect()
    cents = {
        int(r[id_col]): [round(float(x), round_dp) for x in r[vec_col]] for r in seed
    }
    for _ in range(num_iter):
        assigned = _assign(emb, cents, id_col, vec_col)
        means = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()  # k*dim rows — bounded by the codebook size
        )
        new_cents: dict = {}
        for r in means:
            new_cents.setdefault(int(r["cluster"]), {})[int(r["pos"])] = round(
                float(r["m"]), round_dp
            )
        cents = {
            cid: (
                [by_pos[p] for p in range(len(cents[cid]))]
                if (by_pos := new_cents.get(cid))
                else cents[cid]  # empty cluster keeps its centroid
            )
            for cid in cents
        }
    return cents


def kmeans_assignments(
    embeddings: DataFrame,
    k: int = 8,
    num_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """(id, cluster) after ``num_iter`` Lloyd iterations from the
    deterministic seed (vectors with ``id < k``, coordinates rounded to
    ``round_dp``)."""
    cents = kmeans_centroids(embeddings, k, num_iter, id_col, vec_col, round_dp)
    return _assign(
        embeddings.select(F.col(id_col), F.col(vec_col)), cents, id_col, vec_col
    ).select(F.col(id_col), F.col("cluster"))


def label_centroid_stats(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Per-label centroid summary over an embedding column: vector
    count, centroid L2 norm, and mean squared distance to the centroid
    (within-cluster dispersion, via ``E‖x‖² − ‖c‖²`` so no second pass
    over the vectors is needed).

    Scale design: one map-side pass computes per-vector squared norms
    (left-to-right ``aggregate`` fold, bit-reproducible); the centroid
    is a ``posexplode`` + per-(label, dim) average — a (labels·dim)-
    bounded shuffle with map-side combine, the same shape as the
    k-means update step.  Per-coordinate averages round to ``round_dp``
    decimals (absorbing float summation-order differences) before the
    64-term norm fold, so the DuckDB oracle reproduces every output bit.

    Output: (label, n_vecs, centroid_norm, avg_sq_dist).
    """
    lbl = F.col(label_col).cast("long").alias("label")
    sqn = F.aggregate(
        F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    base = embeddings.select(lbl, sqn.alias("_sqn")).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg("_sqn"), round_dp).alias("_e_sq"),
    )
    cent = (
        embeddings.select(lbl, F.posexplode(F.col(vec_col)).alias("_pos", "_val"))
        .groupBy("label", "_pos")
        .agg(F.round(F.avg(F.col("_val").cast("double")), round_dp).alias("_m"))
    )
    cnorm = cent.groupBy("label").agg(
        F.round(F.sum(F.col("_m") * F.col("_m")), round_dp).alias("_csq")
    )
    return base.join(cnorm, "label").select(
        "label",
        "n_vecs",
        F.round(F.sqrt(F.col("_csq")), round_dp).alias("centroid_norm"),
        F.round(F.col("_e_sq") - F.col("_csq"), round_dp).alias("avg_sq_dist"),
    )
