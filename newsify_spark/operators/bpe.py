"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL
2016 — public algorithm), the "token counting (BPE-ish)" rung of the
training-data pipeline made real: learn the merge table itself, don't
just count whitespace tokens.

BPE never touches the corpus after the first pass: it operates on the
WORD-FREQUENCY table (vocab-sized, orders of magnitude smaller than the
corpus), repeatedly (1) counting adjacent symbol pairs weighted by word
frequency, (2) picking the most frequent pair, (3) merging it
everywhere. That is exactly a Spark-shaped loop: one corpus shuffle to
build ``(word, freq)``, then per merge one vocab-bounded pairs
aggregation + a 1-row TakeOrderedAndProject argmax + a map-side merge
application. Production tokenizers run ~30k merges; once the vocab is
built, ``bpe_train`` collects it and runs the merge loop DRIVER-LOCAL
whenever it fits under ``local_threshold`` (a (word,freq) table is a
few MB for real corpora) — 0 Spark jobs per merge instead of 2, which
at 30k merges is ~60k scheduler round-trips saved; the distributed
loop remains as the over-threshold path and the oracle-checked
artifact, and a test pins the two paths equal.

Symbol sequences ride as SPACE-JOINED STRINGS (``a b c </w>``).
Applying a merge is a left-to-right FOLD over the symbol array: if the
accumulator's tail symbol equals the pair's left and the next symbol
equals its right, splice in the merged symbol, else append — exactly
Sennrich's greedy leftmost non-overlapping scan, including
repeated-symbol runs (``a a a a`` + merge ``(a,a)`` -> ``aa aa``,
where a naive string replace would leave ``aa a a`` because adjacent
occurrences share a delimiter space). The same fold is expressible in
DuckDB (``list_reduce``) so the oracle reproduces every merge decision
bit-for-bit. No UDFs anywhere; ties break on the pair string so the
argmax is deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from newsify_spark.functions.text import tokens


def word_vocab(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) — the one corpus-sized pass BPE ever makes."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: Column) -> Column:
    """``a b c </w>`` — chars spaced out + end-of-word marker, joined by
    single spaces (regexp_replace leaves a trailing space after the last
    char, which becomes the delimiter before the marker)."""
    return F.concat(F.regexp_replace(word, "(.)", "$1 "), F.lit("</w>"))


def _adjacent_pairs(sy: Column) -> Column:
    """All adjacent symbol pairs as ``left right`` strings; empty array
    for fully-merged single-symbol words (``sequence(1, 0)`` would count
    DOWN in Spark and crash ``element_at`` — the guard keeps it aligned
    with DuckDB's empty ``generate_series(1, 0)``)."""
    from newsify_spark.functions.scalars import let

    # let-bound: callers pass split() expressions, which the lambda would
    # otherwise re-evaluate per pair (captured expressions re-run per
    # array element)
    return let(sy, _adjacent_pairs_bound)


def _adjacent_pairs_bound(sy: Column) -> Column:
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(sy) - F.lit(1)),
        lambda i: F.concat(
            F.element_at(sy, i), F.lit(" "), F.element_at(sy, i + F.lit(1))
        ),
    )
    return F.when(F.size(sy) >= F.lit(2), pairs).otherwise(
        F.array().cast("array<string>")
    )


def _pair_counts(sym: DataFrame) -> DataFrame:
    """(pair, pair_count) over the current symbol strings, weighted by
    word frequency; map-side combine collapses the vocab table."""
    return (
        sym.select("freq", F.explode(_adjacent_pairs(F.split("s", " "))).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(s: Column, left: str, right: str, merged: str) -> Column:
    """One merge over a space-joined symbol string: fold symbols left to
    right, splicing ``merged`` whenever (tail == left, next == right) —
    Sennrich's greedy leftmost non-overlapping application. Pure Column
    API (no SQL-literal splicing, so backslashes/quotes in symbols are
    inert); ``list_reduce`` expresses the identical fold in DuckDB."""
    sy = F.split(s, " ")

    def step(acc: Column, x: Column) -> Column:
        tail_hits = (acc == F.lit(left)) | acc.endswith(F.lit(" " + left))
        spliced = F.when(acc == F.lit(left), F.lit(merged)).otherwise(
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.lit(len(left))),
                F.lit(merged),
            )
        )
        return F.when(tail_hits & (x == F.lit(right)), spliced).otherwise(
            F.concat(acc, F.lit(" "), x)
        )

    # init = first symbol; single-symbol words fold over an empty slice
    return F.aggregate(
        F.slice(sy, F.lit(2), F.size(sy) - F.lit(1)), F.element_at(sy, 1), step
    )


def _ref_merge_loop(
    words: dict[tuple[str, ...], int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-local Sennrich merge loop over a collected (symbols, freq)
    map — the production path once the vocab fits in driver memory:
    0 Spark jobs per merge vs the distributed loop's 2 (argmax collect +
    checkpoint), i.e. ~60k scheduler round-trips saved at the ~30k
    merges real tokenizers run. Bit-equal to the distributed loop
    (test-pinned)."""
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for sy, f in words.items():
            for a, b in zip(sy, sy[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append(
            (step, f"{pair[0]} {pair[1]}", "".join(pair), counts[pair])
        )
        new: dict[tuple[str, ...], int] = {}
        for sy, f in words.items():
            out: list[str] = []
            i = 0
            while i < len(sy):
                if i + 1 < len(sy) and (sy[i], sy[i + 1]) == pair:
                    out.append(sy[i] + sy[i + 1])
                    i += 2
                else:
                    out.append(sy[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + f
        words = new
    return merges


def bpe_train(
    vocab: DataFrame,
    n_merges: int = 5,
    word_col: str = "word",
    freq_col: str = "freq",
    local_threshold: int = 0,
) -> DataFrame:
    """Learn ``n_merges`` merges; returns the merge table
    (step, pair, merged, pair_count) — the tokenizer artifact, ordered
    by step.

    If ``local_threshold > 0`` and the vocab has at most that many
    words, the (word, freq) table is collected and the merge loop runs
    driver-local (see ``_ref_merge_loop``); otherwise the distributed
    loop runs — per iteration ONE vocab-bounded pairs aggregation +
    1-row argmax collect + a checkpointed fold application (à la
    PageRank/greedy-assign), so plans don't recompute the whole chain
    per step. Both paths emit identical tables (test-pinned)."""
    spark = vocab.sparkSession

    if local_threshold > 0:
        head = vocab.select(
            F.col(word_col).alias("word"), F.col(freq_col).alias("freq")
        ).limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            words: dict[tuple[str, ...], int] = {}
            for r in head:
                key = tuple(r.word) + ("</w>",)
                words[key] = words.get(key, 0) + int(r.freq)
            merges = _ref_merge_loop(words, n_merges)
            out = spark.createDataFrame(
                merges, "step int, pair string, merged string, pair_count long"
            )
            return out.orderBy("step")

    sym = vocab.select(
        F.col(freq_col).alias("freq"),
        _initial_symbols(F.col(word_col)).alias("s"),
    ).localCheckpoint(eager=True)
    merges = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(sym)
            .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged
        pair, count = top[0].pair, int(top[0].pair_count)
        left, _, right = pair.partition(" ")
        merged = left + right
        merges.append((step, pair, merged, count))
        old = sym
        sym = sym.select(
            "freq", _apply_merge(F.col("s"), left, right, merged).alias("s")
        ).localCheckpoint(eager=True)
        old.unpersist()
    out = spark.createDataFrame(
        merges, "step int, pair string, merged string, pair_count long"
    )
    sym.unpersist()
    return out.orderBy("step")


def apply_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "pieces",
) -> DataFrame:
    """Tokenize words with a learned merge list (inference side): apply
    each merge in order — the same greedy leftmost fold the trainer
    used — and split back into sub-word pieces."""
    s = _initial_symbols(F.col(word_col))
    for pair, merged in merges:
        left, _, right = pair.partition(" ")
        s = _apply_merge(s, left, right, merged)
    return df.withColumn(out_col, F.split(s, " "))
