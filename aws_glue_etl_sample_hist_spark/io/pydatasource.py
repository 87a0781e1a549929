"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API): a
deterministic synthetic-corpus generator, the load-generation source every
scale test of this engine needs -- "read" N documents that are computed,
not stored, with real partition planning so generation parallelizes across
executors exactly like a file scan would.

Beyond-reference source coverage (SURVEY §2.1 treats sources as a family:
parquet/CSV/JSONL/ORC/JDBC are all file- or connection-backed; this adds
the programmatic kind). The same API is how a production pipeline wraps a
REST feed, a queue, or a bespoke binary format into a first-class
`spark.read.format(...)` citizen -- partition planning, schema declaration
and Arrow-friendly batch iteration included -- WITHOUT a JVM connector jar.

Determinism contract: content is a pure function of (doc_id, seed) via
md5 arithmetic (same trick as the MinHash family in operators/dedup.py),
so any two reads -- any partitioning, any cluster size -- produce
byte-identical corpora. That is what makes a generated 100 TB load test
reproducible, and what the unit tests pin.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SYNTH_VOCAB = [
    "spark", "table", "row", "scan", "merge", "hash", "sort", "window",
    "batch", "key", "value", "agg", "part", "line", "fast", "slow",
]
SYNTH_LANGS = ["en", "fr", "es", "de", "zh"]
SYNTH_SCHEMA = "doc_id bigint, text string, lang string, n_tokens bigint"


def _synth_doc(doc_id: int, seed: int) -> tuple[int, str, str, int]:
    """Pure function (doc_id, seed) -> row; md5-derived, engine-agnostic."""
    h = int.from_bytes(
        hashlib.md5(f"{seed}:{doc_id}".encode()).digest()[:8], "big"
    )
    n_tokens = 20 + h % 41  # 20..60 tokens
    lang = SYNTH_LANGS[(h >> 8) % len(SYNTH_LANGS)]
    toks = []
    state = h
    for _ in range(n_tokens):
        # LCG step (Numerical Recipes constants): cheap, deterministic
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        toks.append(SYNTH_VOCAB[state % len(SYNTH_VOCAB)])
    return doc_id, " ".join(toks), lang, n_tokens


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 0))

    def partitions(self) -> Sequence[InputPartition]:
        """Even ranges -- the planner sees n_partitions independent splits,
        so generation scales out like any partitioned scan."""
        if self.n_docs <= 0:
            # empty corpus is zero rows, not range(0, 0, 0); one empty-range
            # split (not []: Spark calls read(None) when there are no splits)
            return [_RangePartition(0, 0, self.seed)]
        per = -(-self.n_docs // self.n_partitions)
        return [
            _RangePartition(lo, min(lo + per, self.n_docs), self.seed)
            for lo in range(0, self.n_docs, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _synth_doc(doc_id, partition.seed)


class SyntheticDocsDataSource(DataSource):
    """spark.read.format("synthetic_docs").option("n_docs", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register_synthetic_docs(spark) -> None:
    spark.dataSource.register(SyntheticDocsDataSource)
