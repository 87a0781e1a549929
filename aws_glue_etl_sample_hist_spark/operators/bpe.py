"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") as a distributed
iterative operator -- the tokenizer-training stage of an LLM data pipeline.

Scale design: BPE never iterates over the corpus. One corpus pass builds the
WORD FREQUENCY TABLE (vocabulary-sized -- millions of rows at 100 TB, not
trillions); every merge round then runs on that table alone:

  round := pair-count agg over per-word symbol arrays (weighted by word
           frequency, map-side combined) -> top-1 pair (a 1-row collected
           scalar, the same bounded pattern as the CC convergence check)
           -> greedy left-to-right merge applied via a JVM array fold.

The merge itself is `F.aggregate` over the symbol array -- whole-stage
codegen, no Python, no shuffle (the only shuffle per round is the tiny
pair-count agg). Ties break (count DESC, pair ASC) so the learned merge
sequence is deterministic across partitionings and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens

END_OF_WORD = "</w>"


def word_vocab(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """One corpus pass -> (word, freq, symbols) where symbols is the
    character split plus the end-of-word marker."""
    words = (
        docs.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        "word",
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("symbols"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(symbols) - 1),"
                " i -> struct(symbols[i - 1] as left, symbols[i] as right))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(F.sum("freq").alias("pair_count"))


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of adjacent (left, right) into one symbol,
    as a JVM array fold -- overlapping runs resolve exactly like the
    reference BPE implementation (aaa + (a,a) -> [aa, a])."""
    merged = F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.select("word", "freq", merged.alias("symbols"))


def train_bpe(
    docs: DataFrame, n_merges: int = 10, *, text_col: str = "text"
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges. Returns (merge list as
    [(left, right, pair_count)] in learned order, final vocab frame with
    merged symbol arrays).

    The vocab frame is cached between rounds (it is vocabulary-sized); each
    round collects exactly ONE row (the argmax pair). Stops early if no
    pair occurs more than once."""
    vocab = word_vocab(docs, text_col=text_col).cache()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_count < 2:
            break
        left, right, cnt = top[0].left, top[0].right, int(top[0].pair_count)
        merges.append((left, right, cnt))
        new_vocab = _apply_merge(vocab, left, right).cache()
        new_vocab.count()  # materialize before dropping the parent
        vocab.unpersist()
        vocab = new_vocab
    return merges, vocab


def bpe_segment_stats(vocab: DataFrame) -> DataFrame:
    """Post-training corpus accounting: tokens-per-word distribution under
    the learned merges -- the compression metric tokenizer training
    optimizes. (n_symbols, n_words, total_freq)."""
    return (
        vocab.select(F.size("symbols").alias("n_symbols"), "freq")
        .groupBy("n_symbols")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("freq").cast("long").alias("total_freq"),
        )
    )
