"""Vectorized scalar @pandas_udf helpers.

NOTE: deliberately NO ``from __future__ import annotations`` — pandas_udf
reads the REAL type hints to infer the UDF kind; stringized annotations
(PEP 563) break that inference.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# Module-level UDFs declare their return type as a DataType OBJECT, not
# a DDL string: string types are parsed through the active SparkContext
# at decoration time, and this module is now imported inside executor
# Python workers too (UDF bodies reference module functions like
# seq_rowdot), where no context exists.


@pandas_udf(DoubleType())
def np_l2norm(v: pd.Series) -> pd.Series:
    """Arrow-batched numpy L2 norm of an array column — the scalar
    pandas_udf shape (each batch arrives as a Series of numpy arrays)."""
    import numpy as np

    return v.map(lambda a: float(np.sqrt(np.dot(a, a))))


def seq_rowdot(A, B):
    """Row-wise dot products with the JVM HOF fold's EXACT IEEE
    semantics: elementwise f64 products (identical to
    ``x.cast("double") * y.cast("double")``), then a strict
    left-to-right sequential summation via ``np.cumsum`` — numpy's
    ``add.accumulate`` is a plain sequential loop, so the last prefix
    is BIT-IDENTICAL to ``aggregate(zip_with(a, b, x*y), 0.0, acc+v)``
    (pinned by tests/test_pyudf.py::test_seq_rowdot_matches_fold;
    ``einsum``/``sum`` use SIMD/pairwise partial sums and are NOT).
    Arrays must be 2-D f64-convertible of equal shape."""
    import numpy as np

    P = np.asarray(A, dtype=np.float64) * np.asarray(B, dtype=np.float64)
    if P.shape[1] == 0:
        return np.zeros(P.shape[0], dtype=np.float64)
    return np.cumsum(P, axis=1)[:, -1]


@pandas_udf(DoubleType())
def pair_dot(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-batched exact-verify dot product for candidate PAIRS —
    the per-pair term of ``similarity._verify_candidate_pairs`` /
    ``_incremental_cells_pairs`` (guide §4.2: the interpreted
    ``aggregate(zip_with(...))`` fold costs ~4.5 µs/pair and dominates
    the verify tail at scale; one BLAS-shaped batch op replaces it).
    Bit-identical to the JVM fold by construction: see
    :func:`seq_rowdot`."""
    import numpy as np

    if not len(va):
        return pd.Series([], dtype="float64")
    na = va.isna()
    nb = vb.isna()
    if na.any() or nb.any():
        # a NULL vector folds to a NULL dot on the JVM path; NaN here
        # behaves identically downstream (>= filter drops both)
        valid = ~(na | nb)
        out = np.full(len(va), np.nan)
        if valid.any():
            out[valid.to_numpy()] = seq_rowdot(
                np.vstack(va[valid].to_numpy()),
                np.vstack(vb[valid].to_numpy()),
            )
        return pd.Series(out)
    A = np.vstack(va.to_numpy())
    B = np.vstack(vb.to_numpy())
    return pd.Series(seq_rowdot(A, B))



def make_srp_sigs_udf(mat, offsets, weights):
    """Factory for the large-construction SRP signature UDF (see
    similarity.srp_signature_array): one BLAS matmul per Arrow batch,
    then per-band bit packing.  Lives here because this module skips
    ``from __future__ import annotations`` — pandas_udf needs REAL
    type hints to infer the UDF kind.

    ``mat``: (total_bits × dim) float64 plane matrix; ``offsets``:
    per-band bit offsets (len n_bands+1); ``weights``: per-band
    ``1 << arange(bits)`` int64 vectors."""
    import numpy as np

    n_bands = len(weights)

    @pandas_udf("array<long>")
    def _sigs(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy())  # (batch × dim)
        S = (V @ mat.T) >= 0.0  # (batch × total_bits) sign bits
        out = np.empty((len(V), n_bands), dtype=np.int64)
        for j in range(n_bands):
            out[:, j] = S[:, offsets[j]:offsets[j + 1]] @ weights[j]
        return pd.Series(list(out))

    return _sigs


def make_topn_cells_udf(cent_mat, cids, nprobe):
    """Factory for the large-codebook cell-assignment UDF (see
    clustering.assign_topn): per Arrow batch, BLAS distance blocks
    ``||v||² − 2·V·Cᵀ + ||c||²`` then top-``nprobe`` selection — ties
    break to the smaller centroid id, mirroring the JVM literal path's
    ``array_sort((d, cid))``.

    Scale shape (measured at N=1M, k=16384 — the regime this UDF
    exists for): rows are processed in sub-chunks sized so the distance
    block stays ~32 MB (a full 10k-row Arrow batch × 16384 cells × 8 B
    is 1.3 GB per core — allocation thrash, not compute, dominated the
    first implementation), and the per-row full ``argsort`` over k is
    replaced by O(k) ``argpartition`` + an ``nprobe``-element sort.
    Tie semantics are preserved exactly where ties can exist: the
    partition's survivors are re-sorted ascending-by-position (= by
    cid, since ``cids`` arrive sorted) before the stable distance sort,
    so equal-distance survivors order by smaller cid just like the
    JVM fold.  (Equal distances straddling the partition BOUNDARY could
    drop the smaller cid — a measure-zero event the seeded
    constructions used by oracles never produce, same caveat as the
    JVM path's own tie documentation.)

    ``cent_mat``: (k × dim) float64 centroid matrix, rows in ``cids``
    order; ``cids``: sorted ascending int64 centroid ids; ``nprobe``:
    how many nearest cells to emit per vector."""
    import numpy as np

    cvec = np.asarray(cids, dtype=np.int64)
    csq = (cent_mat * cent_mat).sum(axis=1)  # (k,)
    k = len(cvec)

    @pandas_udf("array<long>")
    def _cells(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy()).astype(np.float64)  # (batch × dim)
        vsq = (V * V).sum(axis=1)
        out = np.empty((len(V), min(nprobe, k)), dtype=np.int64)
        rows_per_chunk = max(1, int(4_000_000 // max(1, k)))  # ~32 MB blocks
        for i0 in range(0, len(V), rows_per_chunk):
            Vc = V[i0 : i0 + rows_per_chunk]
            D = vsq[i0 : i0 + rows_per_chunk, None] - 2.0 * (Vc @ cent_mat.T) + csq[None, :]
            if nprobe < k:
                part = np.argpartition(D, nprobe - 1, axis=1)[:, :nprobe]
                part.sort(axis=1)  # ascending position == ascending cid
                dsel = np.take_along_axis(D, part, axis=1)
                order = np.argsort(dsel, axis=1, kind="stable")
                near = np.take_along_axis(part, order, axis=1)
            else:
                near = np.argsort(D, axis=1, kind="stable")
            out[i0 : i0 + len(Vc)] = cvec[near]
        return pd.Series(list(out))

    return _cells
