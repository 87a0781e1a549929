"""Versioned snapshot layout: time travel for a plain-parquet lake.

A table format (Delta/Iceberg/Hudi) gives three things: atomic commits,
schema evolution, and time travel. The engine already covers the first two
in spirit (atomic directory swap in `sinks.compact_dir`, evolution-on-read
in `sources.read_parquet_evolved`); this module adds the third with nothing
but directory layout:

    <base>/v=1/part-*.parquet
    <base>/v=2/part-*.parquet
    <base>/_latest            <- one-line pointer file, written LAST

Writers publish a fully-written version directory and only then flip the
`_latest` pointer -- readers either see the old pointer or the new one,
never a half-written directory (the same last-writer-wins contract as a
table format's commit log, minus concurrent-writer arbitration, which a
single-orchestrator lake -- like the reference's Step Functions DAG --
doesn't need).

Scale notes: a snapshot read is a plain parquet scan of ONE version dir
(no manifest merge); `vacuum` deletes whole obsolete directories, IO
proportional to retired versions only. Cite: reference keeps only
"latest" state by full overwrite (jb_de_enhancement_t1_fulljoin_s2s.py
write mode) -- snapshots add history for the same write volume per run.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _latest_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_latest")


def list_versions(base_dir: str) -> list[int]:
    if not os.path.isdir(base_dir):
        return []
    out = []
    for name in os.listdir(base_dir):
        if name.startswith("v=") and os.path.isdir(os.path.join(base_dir, name)):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def latest_version(base_dir: str) -> int | None:
    """The committed latest: what the pointer file says (NOT max(dir)), so a
    crashed half-published version is invisible until its pointer flip."""
    p = _latest_path(base_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        txt = f.read().strip()
    return int(txt) if txt else None


def write_snapshot(df: DataFrame, base_dir: str) -> int:
    """Publish ``df`` as the next version: write the full directory, then
    flip the pointer. Returns the new version number."""
    vs = list_versions(base_dir)
    v = (vs[-1] + 1) if vs else 1
    df.write.mode("errorifexists").parquet(os.path.join(base_dir, f"v={v}"))
    tmp = _latest_path(base_dir) + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, _latest_path(base_dir))  # atomic pointer flip
    return v


def read_snapshot(
    spark: SparkSession, base_dir: str, version: int | None = None
) -> DataFrame:
    """Read a specific version (time travel) or the committed latest."""
    v = latest_version(base_dir) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {base_dir}")
    path = os.path.join(base_dir, f"v={v}")
    if not os.path.isdir(path):
        raise FileNotFoundError(f"snapshot version {v} missing under {base_dir}")
    return spark.read.parquet(path)


def vacuum(base_dir: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` COMMITTED versions, never the
    committed latest. Versions NEWER than the committed latest are
    uncommitted by definition (a publish wrote the directory but crashed
    before the pointer flip); they are invisible to readers and reclaimed
    here too -- otherwise an orphan dir would survive every vacuum and
    permanently consume a keep slot (round-3 ADVICE). Returns the versions
    removed."""
    vs = list_versions(base_dir)
    latest = latest_version(base_dir)
    committed = vs if latest is None else [v for v in vs if v <= latest]
    orphans = [] if latest is None else [v for v in vs if v > latest]
    candidates = (committed[:-keep] if keep > 0 else committed) + orphans
    removed = []
    for v in candidates:
        if v == latest:
            continue
        shutil.rmtree(os.path.join(base_dir, f"v={v}"))
        removed.append(v)
    return sorted(removed)


def snapshot_diff(
    spark: SparkSession,
    base_dir: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Change-data between two snapshots, keyed: one row per changed key with
    change_type in (insert, delete, update) -- the CDC-extract a downstream
    incremental consumer reads instead of re-diffing full tables.

    Plan shape: full outer join on the key columns with a whole-row md5 on
    each side; keys present on one side only are inserts/deletes, keys on
    both sides with differing row hashes are updates, unchanged keys drop
    out. The shuffle carries (key, 32-hex hash) -- never the wide rows --
    so the diff costs the same as any keyed join at scale regardless of
    row width."""
    from pyspark.sql import functions as F

    def keyed_hash(v: int):
        df = read_snapshot(spark, base_dir, version=v)
        others = [c for c in df.columns if c not in key_cols]
        # Hash the JSON of the non-key struct, not concat_ws: concat_ws
        # silently drops NULL columns and uses an in-band separator, so rows
        # differing only in WHICH column is NULL -- or containing the
        # separator byte -- collide and real updates are classified as
        # unchanged. JSON keeps field names, escapes values, and (with
        # ignoreNullFields=false) keeps explicit nulls.
        row_json = F.to_json(
            F.struct(*[F.col(c) for c in sorted(others)]),
            {"ignoreNullFields": "false"},
        )
        return df.select(*key_cols, F.md5(row_json).alias("_h"))

    a = keyed_hash(v_from).withColumnRenamed("_h", "_h_from")
    b = keyed_hash(v_to).withColumnRenamed("_h", "_h_to")
    joined = a.join(b, key_cols, "full_outer")
    return joined.select(
        *key_cols,
        F.when(F.col("_h_from").isNull(), F.lit("insert"))
        .when(F.col("_h_to").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
    ).filter(
        F.col("_h_from").isNull()
        | F.col("_h_to").isNull()
        | (F.col("_h_from") != F.col("_h_to"))
    )
