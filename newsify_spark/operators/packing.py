"""Training-sequence packing — the capstone consumer of the tokenize /
shard family: given per-document token counts, emit the ACTUAL packed
layout (which fixed-capacity training sequence each document lands in,
and at what offset), not just the bin-count estimate
(``doc_pack_sequences``). A training-data pipeline materializes this
manifest once and the dataloader replays it deterministically.

Algorithm: greedy sequential NEXT-FIT within independent pack groups —
documents are visited in ``id_col`` order; each goes at the current
bin's fill offset if it fits, else it opens the next bin. Next-fit is
the streaming member of the greedy bin-packing family (first-fit keeps
every open bin as live state — unbounded, and its backward placements
make the output order-fragile; next-fit's state is two integers) and
its waste is bounded: every closed bin is more than half full whenever
documents are <= half the budget, and never holds less than
``budget - max_doc`` tokens.

Spark shape: packing is sequentially dependent WITHIN a group, so the
group is the parallelism unit — ``group_cols`` (e.g. source x shard)
bound each group's size, and groups scale out with the corpus. The
per-group loop runs as one Arrow-batched ``applyInPandas`` pass
(sanctioned stateful class, like the greedy story assignment
``operators/cluster.py:145``): O(docs) time, O(1) state, no JVM
round-trips. Oversized documents (size > budget) are placed alone in
their own bin rather than dropped — the caller decides whether to
split or filter them (pinned in tests).

Reference basis: the reference has no packing stage (its unit is the
article); this is part of the beyond-reference LLM-pipeline layer, and
the semantics mirror the concat-free whole-document packing used by
public T5/LLM data pipelines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_next_fit(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    size_col: str = "n_tok",
    group_cols: tuple[str, ...] = ("source", "shard"),
) -> DataFrame:
    """Pack each ``group_cols`` group's documents (in ``id_col`` order)
    into fixed-``budget`` bins by next-fit. Returns the input keys plus
    ``bin`` (0-based per group) and ``bin_offset`` (token offset of the
    document inside its bin). Deterministic: same input, same manifest.
    """
    gcols = list(group_cols)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in docs.select(*gcols, id_col, size_col).schema.fields
    ) + ", bin long, bin_offset long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins, offs = [], []
        cur_bin, fill = 0, 0
        for sz in pdf[size_col].astype("int64"):
            if fill > 0 and fill + sz > budget:
                cur_bin += 1
                fill = 0
            bins.append(cur_bin)
            offs.append(fill)
            fill += sz
        pdf = pdf[gcols + [id_col, size_col]].copy()
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["bin_offset"] = pd.Series(offs, dtype="int64")
        return pdf

    return docs.select(*gcols, id_col, size_col).groupBy(*gcols).applyInPandas(
        pack, out_schema
    )


def materialize_bins(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    group_cols: tuple[str, ...] = ("source", "shard"),
) -> DataFrame:
    """Materialize the packed TRAINING SEQUENCES themselves — per-bin
    token arrays with doc-boundary offsets, the artifact a dataloader
    actually reads (:func:`pack_next_fit` emits only the layout).

    Composition: the manifest (next-fit over ``size = |tokens|``) joins
    back to the per-doc token arrays on the doc key, then one aggregate
    per (group, bin) assembles the sequence: docs sorted by their
    ``bin_offset``, token arrays flattened in that order. Returns
    (group_cols..., bin, n_docs, n_tokens, doc_ids, offsets, tokens) —
    ``offsets[i]`` is where ``doc_ids[i]``'s tokens start inside
    ``tokens``, so any document reconstructs as
    ``tokens[offsets[i] : offsets[i] + len]`` (property-pinned in
    tests: every doc's tokens appear exactly once, in manifest order,
    and no bin exceeds ``budget`` unless a single oversized doc owns
    it).

    Scale shape: the join shuffles the corpus ONCE on the doc key; the
    per-bin groups are budget-bounded (a bin holds <= budget tokens),
    so the final aggregate has uniformly tiny groups no matter how
    skewed the corpus — the parallelism unit shifts from pack group
    (manifest) to bin (payload), which is exactly what you want when
    materializing: payload work spreads over every core."""
    gcols = list(group_cols)
    sized = docs.select(
        *gcols, id_col, F.size(tokens_col).cast("long").alias("_n_tok")
    )
    manifest = pack_next_fit(
        sized, budget, id_col=id_col, size_col="_n_tok", group_cols=group_cols
    )
    joined = manifest.join(
        docs.select(*gcols, id_col, tokens_col), gcols + [id_col]
    )
    # Sort key = the doc id ALONE (first struct field; ids are unique so
    # the later fields are never consulted): placement within a group is
    # ascending id_col order by construction (pack_next_fit visits docs
    # sorted by id), and bins fill monotonically in that order, so
    # id-order within (group, bin) IS placement order. Sorting by
    # bin_offset first instead would tie whenever a zero-token doc
    # shares its offset with the doc after it, leaving the ordering to
    # depend on offset uniqueness (ADVICE r11 #5).
    packed = joined.groupBy(*gcols, "bin").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("i"),
                    F.col("bin_offset").alias("o"),
                    F.col(tokens_col).alias("t"),
                )
            )
        ).alias("_docs")
    )
    out = packed.select(
        *gcols,
        "bin",
        F.size("_docs").cast("long").alias("n_docs"),
        F.transform("_docs", lambda d: d["i"]).alias("doc_ids"),
        F.transform("_docs", lambda d: d["o"]).alias("offsets"),
        F.flatten(F.transform("_docs", lambda d: d["t"])).alias("tokens"),
    )
    return out.withColumn("n_tokens", F.size("tokens").cast("long"))
