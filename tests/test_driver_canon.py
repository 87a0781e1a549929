"""Guard against driver-canonicalizer-incompatible output schemas.

The round driver canonicalizes every query result with pandas
``DataFrame.sort_values`` over ALL columns before hashing. pandas factorizes
each column to sort it, which raises ``TypeError: unhashable type`` on
list/dict-valued cells -- exactly how `embedding_pq_codes` produced an err
row in CORRECTNESS_r03 even though its values were oracle-exact. The local
harness (tests/oracle_compare.py) stringifies tuples, so it cannot catch
this class of bug; this test does, schema-first.

Two layers:
  1. schema scan (cheap, every registered query): no Array/Map/Struct/Binary
     column may appear in a query output -- those are the types the driver's
     pandas canon cannot sort or hash deterministically.
  2. a canon replica run on one deliberately array-valued frame, proving the
     replica itself rejects what the driver rejects (so layer 1's type list
     stays honest).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from aws_glue_etl_sample_hist_spark.queries import QUERIES

CANON_UNSORTABLE = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def driver_canon(pdf: pd.DataFrame) -> pd.DataFrame:
    """Replica of the driver's canonicalization step: sort by all columns.

    Raises TypeError on unhashable (list/dict) cells, like the driver did in
    round 3."""
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_output_schema_is_canon_sortable(spark, sf_small, name):
    df = QUERIES[name](spark, sf_small)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, CANON_UNSORTABLE)
    ]
    assert not bad, (
        f"{name} outputs driver-canon-unsortable column(s) {bad}: the driver's "
        "pandas sort_values canon raises on list/dict cells and cannot hash "
        "binary deterministically -- flatten to string (concat_ws) or scalar "
        "columns"
    )


def test_canon_replica_rejects_array_cells():
    pdf = pd.DataFrame({"id": [1, 2], "codes": [[1, 2], [3, 4]]})
    with pytest.raises(TypeError):
        driver_canon(pdf)


def test_canon_replica_accepts_scalar_cells():
    pdf = pd.DataFrame({"id": [2, 1], "codes": ["1-2", "3-4"], "x": [0.5, None]})
    out = driver_canon(pdf)
    assert list(out["id"]) == [1, 2]


def test_uncast_hugeint_sum_fails_locally(spark):
    """Regression for the CORRECTNESS_r08 `dedup_lsh_recall` red row: a bare
    DuckDB ``SUM(CASE ...)`` over integers is HUGEINT, which pandas fetches
    as float64; the driver then hash-mismatches Spark's int64 column even
    though every value is equal (23.0 vs 23). The driver-faithful harness
    (tests/oracle_compare.py, pandas fetch on both sides) must reproduce
    that failure LOCALLY -- and the CAST(... AS BIGINT) repair must pass."""
    import duckdb

    from tests.oracle_compare import compare

    sdf = spark.createDataFrame([(23,)], "n_candidates long")
    con = duckdb.connect()
    try:
        # equal VALUES on both sides (23) -- only the numeric class differs
        uncast = """SELECT SUM(CASE WHEN x >= 1 THEN 1 ELSE 0 END) * 0 + 23
                    AS n_candidates FROM (VALUES (1)) t(x)"""
        rep = compare(sdf, con, uncast)
        assert rep["rowcount_match"] and rep["schema_match"]
        assert not rep["values_match"], (
            "uncast HUGEINT SUM fetched as float64 must NOT value-match an "
            f"int64 Spark column under driver semantics: {rep}"
        )
        assert rep["first_diff"]["spark"] == (("i", 23),)
        assert rep["first_diff"]["duckdb"] == (("f", 23.0),)

        cast = """SELECT CAST(SUM(CASE WHEN x >= 1 THEN 1 ELSE 0 END) * 0 + 23
                  AS BIGINT) AS n_candidates FROM (VALUES (1)) t(x)"""
        rep2 = compare(sdf, con, cast)
        assert rep2["values_match"], rep2
    finally:
        con.close()
