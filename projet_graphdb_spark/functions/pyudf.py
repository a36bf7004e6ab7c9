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
    clustering.assign_topn): per Arrow batch, ONE BLAS distance matrix
    ``||v||² − 2·V·Cᵀ + ||c||²`` then a stable argsort — ties break to
    the smaller centroid id because ``cids`` arrive sorted ascending and
    the sort is stable, mirroring the JVM literal path's
    ``array_sort((d, cid))``.

    ``cent_mat``: (k × dim) float64 centroid matrix, rows in ``cids``
    order; ``cids``: sorted ascending int64 centroid ids; ``nprobe``:
    how many nearest cells to emit per vector."""
    import numpy as np

    cvec = np.asarray(cids, dtype=np.int64)
    csq = (cent_mat * cent_mat).sum(axis=1)  # (k,)

    @pandas_udf("array<long>")
    def _cells(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy()).astype(np.float64)  # (batch × dim)
        D = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ cent_mat.T) + csq[None, :]
        near = np.argsort(D, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(cvec[near]))

    return _cells
