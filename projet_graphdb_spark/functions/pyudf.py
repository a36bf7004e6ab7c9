"""Vectorized scalar @pandas_udf helpers.

NOTE: deliberately NO ``from __future__ import annotations`` — pandas_udf
reads the REAL type hints to infer the UDF kind; stringized annotations
(PEP 563) break that inference.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def np_l2norm(v: pd.Series) -> pd.Series:
    """Arrow-batched numpy L2 norm of an array column — the scalar
    pandas_udf shape (each batch arrives as a Series of numpy arrays)."""
    import numpy as np

    return v.map(lambda a: float(np.sqrt(np.dot(a, a))))



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
