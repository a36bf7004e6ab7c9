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

