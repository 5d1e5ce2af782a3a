"""Arrow-batched vector kernels (pandas UDFs).

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
the type hints at definition time, and postponed (string) annotations from
that future import break its signature inspection.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
    """Row-wise cosine similarity of two array<double> columns, vectorised
    with numpy per Arrow batch (~100x the interpreted expression fold).
    Zero-norm inputs score 0.0."""
    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    dots = np.einsum("ij,ij->i", ma, mb)
    na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
    nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
    denom = na * nb
    out = np.where(denom == 0.0, 0.0, dots / np.where(denom == 0.0, 1.0, denom))
    return pd.Series(out)
