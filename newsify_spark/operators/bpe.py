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
application. Production tokenizers run ~30k merges; the per-iteration
cost here is vocab-bounded, not corpus-bounded, so the loop scales the
same way at 100 TB (the corpus is touched once).

Symbol sequences ride as SPACE-DELIMITED STRINGS padded with sentinel
spaces (`` a b c </w> ``): applying a merge is then one literal
``replace(s, ' a b ', ' ab ')`` — leftmost non-overlapping, the
standard greedy BPE application — identical in Spark and DuckDB, which
lets the oracle reproduce every merge decision bit-for-bit (the
iteration unrolls into CTE stages). No UDFs anywhere; ties break on the
pair string so the argmax is deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.functions.text import tokens

# adjacent symbol pairs as "left right" strings (the replace pattern)
_PAIRS = (
    "transform(sequence(2, size(_sy)), "
    "i -> concat(element_at(_sy, i - 1), ' ', element_at(_sy, i)))"
)


def word_vocab(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, freq) — the one corpus-sized pass BPE ever makes."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _initial_symbols(word: F.Column) -> F.Column:
    """`` a b c </w> `` — chars spaced out, end-of-word marker, sentinel
    spaces so every symbol match is boundary-safe."""
    return F.concat(
        F.lit(" "), F.regexp_replace(word, "(.)", "$1 "), F.lit("</w> ")
    )


def _pair_counts(sym: DataFrame) -> DataFrame:
    """(pair, pair_count) over the current symbol strings, weighted by
    word frequency; map-side combine collapses the vocab table."""
    return (
        sym.select("freq", F.split(F.trim("s"), " ").alias("_sy"))
        .select("freq", F.explode(F.expr(_PAIRS)).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_train(
    vocab: DataFrame,
    n_merges: int = 5,
    word_col: str = "word",
    freq_col: str = "freq",
) -> DataFrame:
    """Learn ``n_merges`` merges; returns the merge table
    (step, pair, merged, pair_count) — the tokenizer artifact, ordered
    by step. Driver loop à la PageRank/greedy-assign: each iteration
    collects ONE argmax row and checkpoints the vocab-sized symbol
    table so plans don't recompute the whole chain per step."""
    spark = vocab.sparkSession
    sym = vocab.select(
        F.col(freq_col).alias("freq"),
        _initial_symbols(F.col(word_col)).alias("s"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(sym)
            .orderBy(F.col("pair_count").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or " " not in top[0].pair:
            break  # vocabulary fully merged
        pair, count = top[0].pair, int(top[0].pair_count)
        merged = pair.replace(" ", "")
        merges.append((step, pair, merged, count))
        old = sym
        sym = sym.select(
            "freq",
            F.expr(
                "replace(s, ' ' || '{0}' || ' ', ' ' || '{1}' || ' ')".format(
                    pair.replace("'", "\\'"), merged.replace("'", "\\'")
                )
            ).alias("s"),
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
    each merge in order — same leftmost non-overlapping replace the
    trainer used — and split back into sub-word pieces."""
    s = _initial_symbols(F.col(word_col))
    for pair, merged in merges:
        s = F.replace(
            s, F.lit(f" {pair} "), F.lit(f" {merged} ")
        )
    return df.withColumn(out_col, F.split(F.trim(s), " "))
