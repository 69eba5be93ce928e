"""BM25 full-text retrieval — ranked keyword search as relational
algebra.

The reference serves stories by recency/popularity and by embedding
similarity (FAISS); classic lexical retrieval (Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009)
is the third standard route and the strongest cheap baseline for
retrieval-augmented pipelines. BM25 is pure aggregate arithmetic over
term statistics, so the WHOLE ranking is expressible as DataFrame ops
and hash-checkable against a SQL oracle — no model, no UDF.

Spark-first shape:
- one tokenize+explode pass builds the postings (doc, term, tf) and
  doc-length tables — the same shuffle an inverted index build pays;
- corpus scalars (N, avgdl) ride as broadcast 1-row crossJoins, never
  driver round-trips inside the plan;
- df/idf is a term-keyed aggregate (|vocab| rows);
- scoring joins the QUERY terms (tiny, broadcast) against the postings,
  so per-query cost is |postings of query terms|, not |corpus| —
  exactly an inverted-index probe, expressed relationally;
- scores round to 4dp before ranking so float-sum ordering agrees
  across engines (ties then break on doc id).

At 100 TB the postings table is the big artifact: the persisted index
(:func:`save_bm25_index`) lands it term-clustered so a probe's
query-vocabulary join prunes to the query terms' row groups; idf is
|vocab| rows and broadcasts. Same index-as-table contract as the
PQ/IVF-PQ vector indexes (S13/S14): rebuildable, diffable, readable by
any engine.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.functions.text import tokens
from newsify_spark.operators.topk import top_k_per_group


def _postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) — the one tokenize+shuffle pass everything else
    derives from."""
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))


def _idf_from_df(df_t: DataFrame, scalars: DataFrame) -> DataFrame:
    """(term, idf) from document frequencies + corpus scalars — the +1
    form ln(1 + (N - df + 0.5)/(df + 0.5)), always positive (Lucene)."""
    return df_t.crossJoin(F.broadcast(scalars)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )


def _bm25_tables(
    docs: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tf, dl, scalars, df, idf) — the index tables, all derived from
    ONE tokenize+shuffle. tf is persisted: it feeds dl, df/idf, and the
    scoring probe (at cluster scale it is the table you write out).
    dl is persisted too: it is |docs| rows but REFERENCED three ways
    (count, avg, and the scoring join) — without the cache each
    reference re-runs the groupBy(id).sum(tf) pass over the full
    postings table."""
    tf = _postings(docs, id_col, text_col).persist()
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl")).persist()
    scalars = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    return tf, dl, scalars, df_t, _idf_from_df(df_t, scalars)


def _bm25_probe(
    tf: DataFrame,
    dl: DataFrame,
    scalars: DataFrame,
    idf: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    query_id: str,
    terms_col: str,
    k1: float,
    b: float,
) -> DataFrame:
    """Score + rank against prepared index tables (built inline or
    reloaded from a persisted index — identical math either way)."""
    qterms = queries.select(
        F.col(query_id), F.explode(F.array_distinct(F.col(terms_col))).alias("term")
    )
    # (query_id, term, idf): idf restricted to the query vocabulary BEFORE
    # broadcasting — idf is |corpus vocab| rows at most (|query vocab| on
    # the inline-build path), this side is |query terms|. idf gets its own
    # broadcast hint: when it derives from an aggregate the planner has no
    # size estimate and falls back to a sort-merge join with an exchange
    # on the (tiny) query-terms side.
    q_idf = F.broadcast(qterms.join(F.broadcast(idf), "term"))
    scored = (
        tf.join(q_idf, "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(scalars))
        .withColumn(
            "_s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy(query_id, id_col)
        .agg(F.round(F.sum("_s"), 4).alias("score"))
    )
    # single row_number window both filters to top-k AND emits rank —
    # one sort/exchange instead of two over the same partitions
    return top_k_per_group(
        scored,
        [query_id],
        [F.col("score").desc(), F.col(id_col).asc()],
        k,
        rank_col="rank",
        keep_rank=True,
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score, rank): top-k docs per query by BM25.

    ``queries`` is (query_id, terms array<string>); repeated query terms
    count once (standard bag-of-words BM25 over distinct query terms).
    idf uses the +1 form ln(1 + (N - df + 0.5)/(df + 0.5)) — always
    positive, the Lucene convention.

    Inline-build probe shape: the full-vocabulary df aggregate of
    ``_bm25_tables`` (needed when PERSISTING an index) is pointless for
    a one-shot search — only the query terms' df values ever reach a
    score. The postings are restricted to the (broadcast, tiny) query
    vocabulary FIRST and persisted; df/idf aggregate over that matched
    slice (identical per-term counts — the slice holds every posting of
    those terms) and the scoring probe reuses it. Corpus-wide passes
    over the cached postings drop from four (df, n_docs, dl, avgdl)
    to two (dl, matched); n_docs/avgdl are tiny aggregates over the
    cached |docs|-row dl table.
    """
    tf = _postings(docs, id_col, text_col).persist()
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl")).persist()
    scalars = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qvocab = queries.select(
        F.explode(F.array_distinct(F.col(terms_col))).alias("term")
    ).distinct()
    matched = tf.join(F.broadcast(qvocab), "term").persist()
    df_t = matched.groupBy("term").agg(F.count("*").alias("df"))
    idf = _idf_from_df(df_t, scalars)
    return _bm25_probe(
        matched, dl, scalars, idf, queries, k, id_col, query_id, terms_col, k1, b
    )


def save_bm25_index(
    spark,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the BM25 index as five parquet tables: ``postings``
    (doc, term, tf — repartitioned and sorted by term so a probe's
    query-vocabulary join prunes to the query terms' row groups via
    parquet min/max stats), ``doclen`` (doc, dl), ``df`` (term, df —
    kept so :func:`bm25_add_docs` can delta-update idf without a full
    postings scan), ``idf`` (term, idf) and ``scalars`` (1 row: n_docs,
    avgdl). One tokenize pass builds all five. The lexical sibling of
    :func:`save_ivfpq_index` — the same faiss.write_index-as-tables
    contract (S13/S14) for the retrieval stack's third leg; Lucene's
    segment files re-expressed as engine-neutral columnar tables."""
    tf, dl, scalars, df_t, idf = _bm25_tables(docs, id_col, text_col)
    base = path.rstrip("/")
    (
        tf.repartition("term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{base}/postings")
    )
    dl.write.mode("overwrite").parquet(f"{base}/doclen")
    df_t.write.mode("overwrite").parquet(f"{base}/df")
    idf.write.mode("overwrite").parquet(f"{base}/idf")
    scalars.coalesce(1).write.mode("overwrite").parquet(f"{base}/scalars")
    tf.unpersist()
    dl.unpersist()


def load_bm25_index(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tf, dl, scalars, idf) reloaded for :func:`bm25_topk_from_index`
    — no re-tokenize, no rebuild; the postings stay distributed. If a
    ``tombstones`` table exists (:func:`bm25_remove_docs`), deleted
    docs are anti-joined out of the postings at probe time — Lucene's
    liveDocs filter; df/idf/avgdl stay at their pre-delete values until
    :func:`compact_bm25_index`, exactly Lucene's deleted-docs-until-
    merge scoring semantics."""
    base = path.rstrip("/")
    tf = spark.read.parquet(f"{base}/postings")
    if os.path.isdir(f"{base}/tombstones"):
        dead = spark.read.parquet(f"{base}/tombstones")
        tf = tf.join(F.broadcast(dead), dead.columns[0], "left_anti")
    return (
        tf,
        spark.read.parquet(f"{base}/doclen"),
        spark.read.parquet(f"{base}/scalars"),
        spark.read.parquet(f"{base}/idf"),
    )


def bm25_topk_from_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    query_id: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """:func:`bm25_topk` served from a persisted index — identical
    output (pinned in tests), minus the corpus scan: per query the plan
    reads the query terms' postings row groups, the doc-length table,
    and |query vocab| idf rows."""
    tf, dl, scalars, idf = load_bm25_index(spark, path)
    return _bm25_probe(
        tf, dl, scalars, idf, queries, k, id_col, query_id, terms_col, k1, b
    )


def _stage_swap(out: DataFrame, target: str) -> None:
    """Materialize ``out`` into a dot-prefixed staging dir then rename
    over ``target`` — required when the new table is DERIVED FROM the
    old one (lazy plans would otherwise read files being deleted).
    Same contract as the IVF-PQ cell rewrite (similarity.py); at
    cluster scale this swap is a table-format atomic replace."""
    staging = f"{os.path.dirname(target)}/.{os.path.basename(target)}.rewrite"
    out.write.mode("overwrite").parquet(staging)
    shutil.rmtree(target)
    os.rename(staging, target)


def bm25_add_docs(
    spark,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental BM25 index maintenance, the Lucene new-segment write:
    tokenize ONLY the new docs, APPEND their postings (as new
    term-sorted files — row-group pruning still applies per file) and
    doc lengths, then refresh the small derived tables by delta: df
    gains the new docs' per-term counts (|new vocab| rows, no full
    postings scan), scalars recompute from the doc-length table
    (|docs| rows), idf recomputes from df+scalars (|vocab| rows). The
    lexical half of S14's ``faiss index.add`` parity
    (batch-cluster-service.py:85-95) — at 100 TB an add of n docs costs
    O(n) tokenize + small-table rewrites, never touching existing
    postings files.

    Add-then-probe equals a fresh wholesale build (test-pinned).
    Adding a doc id already in the index is the caller's upsert bug —
    remove first (faiss semantics, same contract as ivfpq_add_items)."""
    base = path.rstrip("/")
    tf_new = _postings(docs, id_col, text_col).persist()
    (
        tf_new.repartition("term")
        .sortWithinPartitions("term")
        .write.mode("append")
        .parquet(f"{base}/postings")
    )
    tf_new.groupBy(id_col).agg(F.sum("tf").alias("dl")).write.mode("append").parquet(
        f"{base}/doclen"
    )
    df_old = spark.read.parquet(f"{base}/df")
    df_delta = tf_new.groupBy("term").agg(F.count("*").alias("_df_new"))
    df_upd = (
        df_old.join(df_delta, "term", "full_outer")
        .select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.coalesce("_df_new", F.lit(0))).alias(
                "df"
            ),
        )
    )
    _stage_swap(df_upd, f"{base}/df")
    tf_new.unpersist()
    dl_all = spark.read.parquet(f"{base}/doclen")
    scalars = dl_all.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    scalars.coalesce(1).write.mode("overwrite").parquet(f"{base}/scalars")
    idf = _idf_from_df(
        spark.read.parquet(f"{base}/df"),
        spark.read.parquet(f"{base}/scalars"),
    )
    idf.write.mode("overwrite").parquet(f"{base}/idf")


def bm25_remove_docs(spark, path: str, ids: DataFrame) -> None:
    """The O(|ids|) delete half — Lucene liveDocs, not a rewrite:
    victim ids append to a ``tombstones`` table and every probe
    anti-joins them out (:func:`load_bm25_index`), so deleted docs
    never surface. Corpus statistics (df, idf, n_docs, avgdl) keep
    their pre-delete values until :func:`compact_bm25_index` — the
    documented Lucene semantic (deleted docs still count toward df
    until segments merge). No postings file is touched: at 100 TB a
    delete costs one tiny parquet append, full stop."""
    base = path.rstrip("/")
    ids.select(ids.columns[0]).distinct().write.mode("append").parquet(
        f"{base}/tombstones"
    )


def compact_bm25_index(spark, path: str, id_col: str = "doc_id") -> None:
    """Apply tombstones — the Lucene segment merge: rewrite postings
    and doclen without the victims (stage-then-rename), recompute df
    from the compacted postings, scalars from the compacted doclen and
    idf from both, then drop the tombstones table. Post-compaction the
    index equals a fresh build over the surviving docs EXACTLY
    (test-pinned). This is the one full-postings-scan operation in the
    maintenance suite — the amortized cost deletes defer to."""
    base = path.rstrip("/")
    if not os.path.isdir(f"{base}/tombstones"):
        return
    dead_df = spark.read.parquet(f"{base}/tombstones")
    dead = F.broadcast(dead_df)
    join_col = dead_df.columns[0]
    postings = spark.read.parquet(f"{base}/postings")
    survivors = (
        postings.join(dead, postings[id_col] == dead[join_col], "left_anti")
        .repartition("term")
        .sortWithinPartitions("term")
    )
    _stage_swap(survivors, f"{base}/postings")
    doclen = spark.read.parquet(f"{base}/doclen")
    _stage_swap(
        doclen.join(dead, doclen[id_col] == dead[join_col], "left_anti"),
        f"{base}/doclen",
    )
    tf = spark.read.parquet(f"{base}/postings")
    _stage_swap(tf.groupBy("term").agg(F.count("*").alias("df")), f"{base}/df")
    dl_all = spark.read.parquet(f"{base}/doclen")
    scalars = dl_all.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    scalars.coalesce(1).write.mode("overwrite").parquet(f"{base}/scalars")
    idf = _idf_from_df(
        spark.read.parquet(f"{base}/df"),
        spark.read.parquet(f"{base}/scalars"),
    )
    idf.write.mode("overwrite").parquet(f"{base}/idf")
    shutil.rmtree(f"{base}/tombstones")


def sync_bm25_from_changes(
    spark,
    path: str,
    changes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """CDC-driven index maintenance: apply a transaction-log change feed
    (operators.txnlog.read_changes — ``_change_type`` 'insert'|'delete'
    + ``_commit_version`` + row) to a persisted BM25 index, so a search
    index over a LIVING table follows commits instead of rebuilding.
    The feed collapses to its net effect per document first
    (txnlog.net_changes).

    Composition over the existing maintenance primitives, honoring the
    tombstone contract (id-level liveDocs — a tombstoned id would also
    kill re-added postings, and a re-appended doclen row would double
    under the scoring join):

    - DELETE-ONLY feeds tombstone and return — O(|ids|), no postings
      touched (Lucene's defer-to-merge path).
    - feeds with inserts/updates tombstone every touched id, COMPACT
      (the segment merge updates amortize to in Lucene too), then
      append the net-inserted docs' postings — after which the index
      equals a fresh build over the mutated table exactly (compact==
      fresh and add==fresh are each already test-pinned; the composed
      sync==fresh equality is pinned in tests/test_operators.py).

    Cost at 100 TB: tombstone append (tiny) + one compaction scan
    (amortized over the batch) + O(net-inserted docs) tokenize — never
    a corpus re-tokenize."""
    from newsify_spark.operators.txnlog import net_changes

    # checkpoint: the feed reads log files the compaction below must be
    # free to supersede
    last = net_changes(changes, id_col).localCheckpoint(eager=True)
    ins = last.filter(F.col("_change_type") == "insert").select(
        id_col, text_col
    )
    touched = last.select(id_col)
    bm25_remove_docs(spark, path, touched)
    if ins.isEmpty():
        return  # pure delete: tombstones defer physical removal
    compact_bm25_index(spark, path, id_col=id_col)
    bm25_add_docs(spark, path, ins, id_col=id_col, text_col=text_col)
