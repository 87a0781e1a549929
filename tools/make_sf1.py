"""Synthesize a measurement-only sf1 dataset (10x sf0.1) under
scratch/testdata/sf1 for the SCALING.md sf1 column.

This data is for WALL-CLOCK scaling probes only -- correctness runs use the
driver-provided /root/testdata sets exclusively. The replication is designed
so each operator family's work scales the way real corpus growth would:

* keys (order/part/supp/cust/doc/vec/event/user) get a +i*10M offset per
  replica, so join fan-outs and group cardinalities scale linearly like a
  real TPC-H sf step, while nation/region stay fixed (they are
  SF-independent in TPC-H too);
* document text and part-profile tokens are rewritten through a PER-REPLICA
  vocabulary permutation (seeded, replica 0 = identity): within-replica
  duplicate/similarity structure is preserved exactly, while cross-replica
  matches occur at natural random rates instead of every doc gaining 9
  byte-identical clones (which would measure output explosion, not scaling);
* embedding vectors get a per-replica circular component shift
  (norm-preserving, replica 0 = identity) for the same reason;
* timestamps and measures are left untouched (scan/agg/window scaling is
  row-count-driven), and parquet physical types are preserved by reading
  and writing through pyarrow (events keeps TIMESTAMP(NANOS)).

Usage: python tools/make_sf1.py [factor] (default 10; writes sf1)
"""

from __future__ import annotations

import os
import random
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000

_TOKEN_RE = re.compile(r"\S+")


def _vocab_of(columns: list[list[str]]) -> list[str]:
    vocab: set[str] = set()
    for col in columns:
        for s in col:
            if s is not None:
                vocab.update(_TOKEN_RE.findall(s))
    return sorted(vocab)


def _permuter(vocab: list[str], replica: int):
    if replica == 0:
        return lambda s: s
    shuffled = list(vocab)
    random.Random(1_000_003 * replica).shuffle(shuffled)
    mapping = dict(zip(vocab, shuffled))
    return lambda s: (
        None
        if s is None
        else _TOKEN_RE.sub(lambda m: mapping.get(m.group(0), m.group(0)), s)
    )


def _offset(arr: pa.ChunkedArray, replica: int) -> pa.Array:
    import pyarrow.compute as pc

    return pc.add(arr, pa.scalar(replica * OFF, type=arr.type))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    dst = os.path.join(
        os.path.dirname(__file__), "..", "scratch", "testdata", "sf1"
    )
    dst = os.path.abspath(dst)
    os.makedirs(dst, exist_ok=True)

    import pyarrow.compute as pc

    # fixed dims: straight copies
    for t in ("nation", "region"):
        pq.write_table(
            pq.read_table(f"{SRC}/{t}.parquet"), f"{dst}/{t}.parquet"
        )
        print(f"{t}: copied")

    key_cols = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    text_cols = {
        "documents": ["text"],
        "part": ["p_name", "p_brand", "p_type"],
    }

    for t, keys in key_cols.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        vocab = None
        if t in text_cols:
            vocab = _vocab_of(
                [src.column(c).to_pylist() for c in text_cols[t]]
            )
        replicas = []
        for i in range(factor):
            tab = src
            for c in keys:
                tab = tab.set_column(
                    tab.schema.get_field_index(c),
                    tab.schema.field(c),
                    _offset(tab.column(c), i),
                )
            if t in text_cols and i > 0:
                perm = _permuter(vocab, i)
                for c in text_cols[t]:
                    new = pa.array(
                        [perm(s) for s in tab.column(c).to_pylist()],
                        type=tab.schema.field(c).type,
                    )
                    tab = tab.set_column(
                        tab.schema.get_field_index(c),
                        tab.schema.field(c),
                        new,
                    )
                if t == "documents":
                    n_chars = pa.array(
                        [
                            None if s is None else len(s)
                            for s in tab.column("text").to_pylist()
                        ],
                        type=tab.schema.field("n_chars").type,
                    )
                    tab = tab.set_column(
                        tab.schema.get_field_index("n_chars"),
                        tab.schema.field("n_chars"),
                        n_chars,
                    )
            if t == "embeddings" and i > 0:
                shifted = pa.array(
                    [
                        None if v is None else v[i % len(v):] + v[: i % len(v)]
                        for v in tab.column("embedding").to_pylist()
                    ],
                    type=tab.schema.field("embedding").type,
                )
                tab = tab.set_column(
                    tab.schema.get_field_index("embedding"),
                    tab.schema.field("embedding"),
                    shifted,
                )
            replicas.append(tab)
        out = pa.concat_tables(replicas)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {src.num_rows} -> {out.num_rows} rows")
        del replicas, out

    # type parity check: the engine reads events as TIMESTAMP(NANOS)
    src_ts = pq.read_schema(f"{SRC}/events.parquet").field("ts").type
    dst_ts = pq.read_schema(f"{dst}/events.parquet").field("ts").type
    assert src_ts == dst_ts, (src_ts, dst_ts)
    print(f"wrote {dst} (events ts type {dst_ts} preserved)")


if __name__ == "__main__":
    main()
