"""Arrow-backed local relations (r14, guide §4/§6.4).

A list-backed ``spark.createDataFrame(rows, schema)`` builds a PYTHON-RDD
local relation: every downstream action re-evaluates it through Python
worker launches (pickled partitions, worker spin-up), measured ~2-5 s cold
and ~0.3-0.5 s warm per action for even a one-row frame -- and broadcast
sides built this way re-pay it on every consumer action because a local
relation is never a ReusedExchange. Routing the same rows through pandas
turns them into an Arrow-serialized LocalRelation evaluated on the JVM:
~0.2 s cold, no Python workers at all.

Every small calibration/result frame the operators build (centroid tables,
codebooks, one-row contract outputs, query fixtures) should come through
:func:`arrow_local_frame`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def arrow_local_frame(
    spark: SparkSession,
    rows: list,
    schema: str | T.StructType,
    *,
    single_partition: bool = True,
) -> DataFrame:
    """``createDataFrame`` through the pandas/Arrow path with an explicit
    schema. ``single_partition`` coalesces to 1 (these frames are
    broadcast-or-result-sized by contract)."""
    import pandas as pd

    if isinstance(schema, str):
        # public DDL parser (ADVICE r14) -- the private
        # T._parse_datatype_string can move across pyspark upgrades
        schema = T.StructType.fromDDL(schema)
    pdf = pd.DataFrame(rows, columns=schema.fieldNames())
    df = spark.createDataFrame(pdf, schema)
    return df.coalesce(1) if single_partition else df
