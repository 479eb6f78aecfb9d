"""Driver-built small DataFrames, shipped as ONE Arrow batch.

``spark.createDataFrame(list_of_rows)`` builds a *pickled-RDD*-backed
DataFrame: the rows live as Python pickles, so EVERY action on any plan
consuming the frame (a broadcast-join probe, a union arm, a lookup
table) re-spawns Python workers just to deserialize a few hundred
metadata rows — measured ~3x the per-action cost of the Arrow form on
a 2,000-row broadcast side.  The Arrow form converts once, driver-side,
into a JVM-resident relation.

``local_df`` routes through ``pyarrow`` when every column type has an
exact, semantics-free Arrow mapping (no timezone reinterpretation, no
pandas NaN inference — values go through ``pa.array(values, type=...)``
verbatim), and falls back to the classic row path otherwise.  Intended
for metadata-scale inputs (file lists, config epochs, codebooks,
quotas); data-scale frames should come from storage, not the driver.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession

_log = logging.getLogger(__name__)
#: one warning per process (ADVICE r16): the blanket fallback must not
#: silently regress every converted site to the pickled-row path
_warned_fallback = False
from pyspark.sql.types import (BooleanType, ByteType, DateType, DoubleType,
                               FloatType, IntegerType, LongType, ShortType,
                               StringType, StructType)

#: types whose Python -> Arrow conversion is value-exact and free of
#: session-dependent semantics (timestamps deliberately excluded: the
#: Arrow path would need session-timezone handling the row path defers
#: to the JVM)
_SAFE_TYPES = (StringType, IntegerType, LongType, DoubleType, FloatType,
               BooleanType, DateType, ShortType, ByteType)


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` for small driver-built
    row lists, preferring the Arrow path.  ``rows`` is a sequence of
    tuples/Rows (positional), ``schema`` a StructType or DDL string."""
    try:
        st = schema
        if isinstance(st, str):
            from pyspark.sql.types import _parse_datatype_string
            st = _parse_datatype_string(st)
        if not (isinstance(st, StructType)
                and all(isinstance(f.dataType, _SAFE_TYPES)
                        for f in st.fields)):
            # deliberate downgrade (unsafe column type) — not a failure
            return spark.createDataFrame(rows, schema)
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type
        rows = list(rows)
        table = pa.Table.from_arrays(
            [pa.array([r[i] for r in rows], type=to_arrow_type(f.dataType))
             for i, f in enumerate(st.fields)],
            names=[f.name for f in st.fields])
        return spark.createDataFrame(table, st)
    except Exception as e:
        global _warned_fallback
        if not _warned_fallback:
            _warned_fallback = True
            _log.warning(
                "local_df Arrow path unavailable (%s: %s) — falling "
                "back to the pickled-row form; further fallbacks are "
                "silent", type(e).__name__, e)
        return spark.createDataFrame(rows, schema)
