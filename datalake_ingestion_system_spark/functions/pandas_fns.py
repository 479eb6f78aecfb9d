"""Arrow-vectorized pandas UDFs — the sanctioned escape hatch (SURVEY §2.8).

Policy: anything expressible with built-in expressions stays JVM-side
(every hot-path query in this repo does); when Python is genuinely needed,
it enters ONLY through Arrow-batched pandas UDFs — never row-at-a-time
``F.udf``.  This module holds the reference instances of the two shapes:

- SCALAR (Series → Series): one Arrow batch in, one out; ~10-100× the
  throughput of a row UDF, still ~2-10× slower than codegen — use for
  numpy/scipy math with no Spark builtin.
- GROUPED_AGG (Series → scalar): a distributive custom aggregate; Spark
  applies it per group post-shuffle (no partial aggregation — prefer
  builtins when the agg decomposes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def sigmoid(x: pd.Series) -> pd.Series:
    """SCALAR shape: elementwise logistic over an Arrow batch."""
    return 1.0 / (1.0 + np.exp(-x.astype("float64")))


@pandas_udf(DoubleType())
def geo_mean(v: pd.Series) -> float:
    """GROUPED_AGG shape: geometric mean (log-space, overflow-safe).
    Equivalent SQL: ``exp(avg(ln(v)))`` — kept as the oracle for
    ``q_grouped_pandas_agg``."""
    a = v.dropna().astype("float64")
    if len(a) == 0:
        return float("nan")
    return float(np.exp(np.log(a).mean()))
