"""Z-order layout: file-level min/max statistics (read back via pyarrow)
must be tight in BOTH clustered dimensions, so a selective filter on the
SECOND dimension skips most files -- where a linear sort on the first
dimension skips none."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from aws_glue_etl_sample_hist_spark.catalog import load_table
from aws_glue_etl_sample_hist_spark.io.layout import write_zordered, z_value


def _file_ranges(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        out.append((min(los), max(his)))
    return out


def _overlapping(ranges, lo, hi):
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def test_z_value_is_bit_interleave(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0b101, 0b011)], ["a", "b"])
    got = df.select(z_value(F.col("a"), F.col("b"), bits=3).alias("z")).collect()[0].z

    def ref(a, b, bits=3):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    assert got == ref(0b101, 0b011)


def test_zorder_skips_files_on_second_dimension(spark, sf_small, tmp_path):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(li, zpath, ("l_partkey", "l_suppkey"), n_files=16, bits=8)
    # linear baseline: range-partitioned + sorted by the FIRST dimension only
    li.repartitionByRange(16, "l_partkey").sortWithinPartitions("l_partkey").write.parquet(lpath)

    # identical data either way
    assert spark.read.parquet(zpath).count() == li.count()

    # a 10%-wide box on the SECOND dimension
    import pyspark.sql.functions as F

    mn, mx = li.agg(F.min("l_suppkey"), F.max("l_suppkey")).collect()[0]
    lo, hi = mn, mn + (mx - mn) // 10

    z_hit = _overlapping(_file_ranges(zpath, "l_suppkey"), lo, hi)
    lin_hit = _overlapping(_file_ranges(lpath, "l_suppkey"), lo, hi)
    # linear layout: every file spans ~the full suppkey range -> no skipping
    assert lin_hit >= 15
    # z-order: most files' suppkey range misses the box entirely
    assert z_hit <= lin_hit // 2, (z_hit, lin_hit)


def test_snapshot_diff_classifies_changes(spark, tmp_path):
    """snapshot_diff between two versions: inserts, deletes, updates by
    keyed row-hash; unchanged keys never appear."""
    from aws_glue_etl_sample_hist_spark.io.snapshots import (
        snapshot_diff,
        write_snapshot,
    )

    base = str(tmp_path / "snap")
    v1 = write_snapshot(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["id", "s", "v"]
        ),
        base,
    )
    v2 = write_snapshot(
        spark.createDataFrame(
            [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)], ["id", "s", "v"]
        ),
        base,
    )
    got = {
        (r.id, r.change_type)
        for r in snapshot_diff(spark, base, v1, v2, ["id"]).collect()
    }
    assert got == {(1, "delete"), (3, "update"), (4, "insert")}


def test_snapshot_diff_null_swap_and_separator_bytes(spark, tmp_path):
    """Rows differing only in WHICH column is NULL, or containing the old
    in-band \\x1f separator, must still be detected as updates (the
    concat_ws hash collided on both)."""
    from aws_glue_etl_sample_hist_spark.io.snapshots import (
        snapshot_diff,
        write_snapshot,
    )

    base = str(tmp_path / "snap")
    v1 = write_snapshot(
        spark.createDataFrame(
            [(1, None, "b"), (2, "x\x1fy", "z"), (3, "same", "same")],
            "id long, a string, b string",
        ),
        base,
    )
    v2 = write_snapshot(
        spark.createDataFrame(
            [(1, "b", None), (2, "x", "y\x1fz"), (3, "same", "same")],
            "id long, a string, b string",
        ),
        base,
    )
    got = {
        (r.id, r.change_type)
        for r in snapshot_diff(spark, base, v1, v2, ["id"]).collect()
    }
    assert got == {(1, "update"), (2, "update")}
