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

At 100 TB the postings table is the big artifact: partition/bucket it
by term and the per-query probe becomes a pruned scan; idf is |vocab|
rows and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.functions.text import tokens
from newsify_spark.operators.topk import top_k_per_group


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
    """
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    # ONE tokenize+shuffle builds the postings; doc length, df/idf, and
    # the scoring probe all derive from it. The postings table is the
    # index artifact — persist it so its three consumers don't each
    # re-tokenize the corpus (at cluster scale this is the table you
    # write out partitioned by term).
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf")).persist()
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    scalars = F.broadcast(
        dl.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = df_t.crossJoin(scalars).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    qterms = queries.select(
        F.col(query_id), F.explode(F.array_distinct(F.col(terms_col))).alias("term")
    )
    # (query_id, term, idf): idf restricted to the query vocabulary BEFORE
    # broadcasting — idf is |corpus vocab| rows, this side is |query terms|
    q_idf = F.broadcast(qterms.join(idf, "term"))
    scored = (
        tf.join(q_idf, "term")
        .join(dl, id_col)
        .crossJoin(scalars)
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
