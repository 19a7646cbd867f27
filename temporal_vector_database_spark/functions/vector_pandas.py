"""Arrow-vectorized pandas-UDF forms of the vector kernels.

The engine's hot paths use the JVM higher-order-function forms
(``functions/vector.py``) — whole-stage codegen, no Python. These
pandas-UDF twins exist for two reasons:

1. cross-checking: the HOF fold and numpy BLAS must agree (test-pinned to
   1e-12; they are NOT bit-identical — the HOF is an ordered left fold,
   numpy uses pairwise/SIMD summation);
2. escape hatch: at very high dimensionality a BLAS dot over an Arrow
   batch can beat codegen'd per-element folds — measure before switching.

Exposed as factories (``dot_pdf()``) rather than module-level UDF objects:
a decorated module-level UDF would re-run the decorator on executor-side
re-import, where no SparkSession exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _stack(s: pd.Series) -> np.ndarray:
    return np.stack(s.to_numpy())


def dot_pdf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _dot(a: pd.Series, b: pd.Series) -> pd.Series:
        va, vb = _stack(a), _stack(b)
        return pd.Series(np.einsum("ij,ij->i", va, vb))

    return _dot


def l2_norm_pdf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _norm(a: pd.Series) -> pd.Series:
        va = _stack(a)
        return pd.Series(np.sqrt(np.einsum("ij,ij->i", va, va)))

    return _norm


def cosine_pdf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        va, vb = _stack(a), _stack(b)
        na = np.sqrt(np.einsum("ij,ij->i", va, va))
        nb = np.sqrt(np.einsum("ij,ij->i", vb, vb))
        d = np.einsum("ij,ij->i", va, vb)
        ok = (na > 0) & (nb > 0)
        out = np.zeros(len(va))
        out[ok] = d[ok] / (na[ok] * nb[ok])
        return pd.Series(out)

    return _cos
