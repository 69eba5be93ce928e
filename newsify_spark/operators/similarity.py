"""Similarity / nearest-neighbor operators over embedding columns.

Re-expresses the reference's FAISS + sklearn machinery:
- J4 nearest-centroid assignment (duplication_service.py:74-92): each
  article embedding vs ALL story centroids, argmax cosine, threshold.
- J5 k-NN top-k (recommendation-trainer.py:89-100, FAISS IndexFlatL2
  top-50; batch-cluster-service.py:72-102 index maintenance).

Two scale regimes, same API:
- ``knn_join`` — exact brute force: broadcast the smaller side, cosine as
  a codegen'd higher-order expression, window top-k. Correct + oracle
  checkable; right whenever one side fits in a broadcast (centroids,
  users-of-one-tenant...). Cost O(|L|·|R|·d) FLOPs but embarrassingly
  parallel: on a 1000-executor cluster the big side stays partitioned and
  never shuffles (the broadcast replaces a shuffle entirely).
- ``knn_join_lsh`` — approximate: random-hyperplane LSH buckets both
  sides, joins within (band, signature) buckets only, then exact rerank
  inside the candidate set. This is the 100 TB path: the cross product
  shrinks from |L|·|R| to the bucket collision set; the join is a plain
  equi hash join that AQE can handle/skew-split. Deterministic given
  ``seed``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newsify_spark.functions.vectors import cosine, cosine_with_norms, dot, l2_dist, l2_norm
from newsify_spark.operators.topk import top_k_per_group

METRICS = {"cosine": cosine, "l2": l2_dist, "dot": dot}


def knn_join(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    query_id: str = "query_id",
    item_id: str = "item_id",
    query_vec: str = "query_vec",
    item_vec: str = "item_vec",
    metric: str = "cosine",
    broadcast_items: bool = True,
) -> DataFrame:
    """Exact top-k: returns (query_id, item_id, score) with score the
    similarity (cosine/dot: higher better) or distance (l2: lower better).

    Ties break on item_id ascending so results are deterministic and
    oracle-comparable.
    """
    right = F.broadcast(items) if broadcast_items else items
    sim = METRICS[metric](F.col(query_vec), F.col(item_vec))
    asc = metric == "l2"
    scored = (
        queries.crossJoin(right)
        .withColumn("score", sim)
        .select(query_id, item_id, "score")
    )
    if k == 1:
        # argmax via one aggregation instead of a window: the per-pair
        # rows collapse map-side (partial agg) right after the broadcast
        # join, so only |queries| partials shuffle — not |queries|x|items|
        # pairs. Same tiebreak (best score, then item_id asc) encoded as
        # lexicographic min of (signed score, item_id); works for any
        # orderable id type. (Caveat: NaN scores sort last here but first
        # under the window's DESC order — unreachable for finite vectors.)
        skey = F.col("score") if asc else -F.col("score")
        best = scored.groupBy(query_id).agg(
            F.min(
                F.struct(
                    skey.alias("_k"),
                    F.col(item_id).alias("_id"),
                    F.col("score").alias("_s"),
                )
            ).alias("_b")
        )
        return best.select(
            query_id,
            F.col("_b._id").alias(item_id),
            F.col("_b._s").alias("score"),
        )
    order = [F.col("score").asc() if asc else F.col("score").desc(), F.col(item_id).asc()]
    return top_k_per_group(scored, [query_id], order, k)


def nearest_centroid_assign(
    points: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.8,
    point_id: str = "point_id",
    centroid_id: str = "centroid_id",
    point_vec: str = "point_vec",
    centroid_vec: str = "centroid_vec",
) -> DataFrame:
    """Reference J4: argmax-cosine assignment with a match threshold.

    Output: (point_id, centroid_id, similarity, matched). matched=false
    rows are the reference's "mint a new story" branch
    (duplication_service.py:86-92); the caller decides what id to mint.
    Centroid side is broadcast — it is small by construction (one row per
    cluster), so the big points table never shuffles.
    """
    best = knn_join(
        points,
        centroids,
        k=1,
        query_id=point_id,
        item_id=centroid_id,
        query_vec=point_vec,
        item_vec=centroid_vec,
        metric="cosine",
    )
    return best.select(
        point_id,
        centroid_id,
        F.col("score").alias("similarity"),
        (F.col("score") > threshold).alias("matched"),
    )


def nearest_centroid_assign_matmul(
    points: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.8,
    point_id: str = "point_id",
    centroid_id: str = "centroid_id",
    point_vec: str = "point_vec",
    centroid_vec: str = "centroid_vec",
    max_centroids: int = 100_000,
) -> DataFrame:
    """BLAS form of :func:`nearest_centroid_assign` — the inverse shape
    of ``knn_join_matmul``: here the SMALL side is the centroid table
    (one row per cluster by construction), so it is collected once
    (fail-fast capped), and every points partition streams through
    mapInPandas computing one normalized GEMM + row argmax per Arrow
    batch. The points side never shuffles and nothing bigger than
    |points| rows moves. Same tie-break as the expression form (best
    score, then centroid_id asc — argmax picks the first maximum over
    id-sorted centroids); zero vectors score 0.0 on both paths.
    Equality with the expression form is test-pinned.
    """
    import numpy as np
    import pandas as pd

    crows = centroids.select(centroid_id, centroid_vec).limit(max_centroids + 1).collect()
    if len(crows) > max_centroids:
        raise ValueError(
            f"nearest_centroid_assign_matmul centroid side exceeds "
            f"max_centroids={max_centroids}; use the expression form or LSH"
        )
    crows.sort(key=lambda r: r[0])
    cids = np.array([r[0] for r in crows])
    cmat = np.array([r[1] for r in crows], dtype=np.float64)
    cnrm = np.linalg.norm(cmat, axis=1, keepdims=True)
    cnrm[cnrm == 0] = 1.0
    cunit = cmat / cnrm

    def part(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf[point_id].to_numpy()
            mat = np.array(list(pdf[point_vec]), dtype=np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            sims = (mat / nrm) @ cunit.T  # |batch| x |C|
            j = np.argmax(sims, axis=1)  # first max = lowest id on ties
            yield pd.DataFrame(
                {
                    point_id: ids,
                    centroid_id: cids[j],
                    "similarity": sims[np.arange(len(ids)), j],
                }
            )

    p_dt = dict(points.dtypes)[point_id]
    c_dt = dict(centroids.dtypes)[centroid_id]
    out = points.select(point_id, point_vec).mapInPandas(
        part, schema=f"{point_id} {p_dt}, {centroid_id} {c_dt}, similarity double"
    )
    return out.withColumn("matched", F.col("similarity") > F.lit(threshold))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def rhp_signature(vec_col, planes: list[list[float]]):
    """Random-hyperplane (SimHash-for-vectors) signature: one sign bit per
    plane, packed into a bigint. Pure SQL expression over the array."""
    bits = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits = bits + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return bits


def rhp_signatures_pandas(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_bands: int,
    bits_per_band: int,
    seed: int = 42,
    normalize: bool = False,
) -> DataFrame:
    """(id, vec, band, sig) — ALL band signatures in one vectorized Arrow
    pass: one (batch x dim) @ (dim x n_bands*bits) GEMM, sign bits packed
    per band. Bit-identical to ``rhp_signature`` over the same
    ``_hyperplanes`` (equality pinned in tests), but avoids the
    n_bands*bits nested aggregate expressions the expression form builds
    (Spark evaluates nested higher-order lambdas interpreted — VERDICT
    round-1 minor #4) and the n_bands-way union scan.
    """
    import pandas as pd

    planes = np.concatenate(
        [
            np.array(_hyperplanes(dim, bits_per_band, seed + 1000 * b))
            for b in range(n_bands)
        ]
    )  # (n_bands*bits, dim)
    weights = (1 << np.arange(bits_per_band)).astype(np.int64)

    def run(it):
        for pdf in it:
            ids = pdf[id_col]
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if len(mat) == 0:
                continue
            bits = (mat @ planes.T) > 0  # (n, n_bands*bits)
            sigs = bits.reshape(len(mat), n_bands, bits_per_band) @ weights
            if normalize:
                # signatures are scale-invariant, so emitting unit vectors
                # changes nothing upstream — but lets the verify/rerank
                # step use one dot() aggregate instead of cosine()'s three
                nrm = np.linalg.norm(mat, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                vec_out = list(mat / nrm)
            else:
                vec_out = list(pdf[vec_col])
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids.to_numpy(), n_bands),
                    vec_col: [v for v in vec_out for _ in range(n_bands)],
                    "band": np.tile(np.arange(n_bands), len(mat)),
                    "sig": sigs.ravel(),
                }
            )

    dt = dict(df.dtypes)
    out_vec_type = "array<double>" if normalize else dt[vec_col]
    return df.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} {dt[id_col]}, {vec_col} {out_vec_type}, band int, sig long"
    )


def knn_join_lsh(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    dim: int,
    query_id: str = "query_id",
    item_id: str = "item_id",
    query_vec: str = "query_vec",
    item_vec: str = "item_vec",
    n_bands: int = 8,
    bits_per_band: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k for when neither side broadcasts.

    Each vector gets ``n_bands`` signatures of ``bits_per_band`` sign
    bits; candidates are pairs agreeing on at least one (band, signature)
    bucket; exact cosine reranks candidates. Recall rises with n_bands,
    candidate count falls with bits_per_band. The bucket join is an equi
    join on (band, sig) — shuffle-partitionable, AQE-skew-splittable.
    """
    # normalize=True: cosine of the originals == dot of the unit vectors,
    # so the rerank needs ONE aggregate expression per pair, not three.
    # Each signature table feeds both the bucket join (ids only) and the
    # rerank (band 0 doubles as the unit-vector table): the ITEM side —
    # the corpus-sized one whose GEMM pass is worth not repeating — is
    # persisted (the embedding_near_dup_lsh shape); the query side is
    # small by role, and the r12 persist-variant A/B showed caching it
    # costs more than its recompute (see OPTIMIZATION_r12.md).
    qsig = rhp_signatures_pandas(
        queries.select(query_id, query_vec), query_id, query_vec, dim,
        n_bands, bits_per_band, seed, normalize=True,
    )
    isig = rhp_signatures_pandas(
        items.select(item_id, item_vec), item_id, item_vec, dim,
        n_bands, bits_per_band, seed, normalize=True,
    ).persist()
    # candidate generation carries IDS ONLY (r12, guide §2.3/§8): the
    # before-plan shipped BOTH 64-dim vectors through the (band, sig)
    # bucket shuffle — n_bands replicas of every vector — and again
    # through the dedup exchange; at corpus scale those are the widest
    # stages and vectors have no business in them.
    cands = (
        qsig.select("band", "sig", query_id)
        .join(isig.select("band", "sig", item_id), ["band", "sig"])
        .select(query_id, item_id)
        .dropDuplicates([query_id, item_id])
    )
    qunit = qsig.filter(F.col("band") == 0).select(query_id, query_vec)
    iunit = isig.filter(F.col("band") == 0).select(item_id, item_vec)
    scored = (
        cands.join(qunit, query_id)
        .join(iunit, item_id)
        .withColumn("score", dot(F.col(query_vec), F.col(item_vec)))
        .select(query_id, item_id, "score")
    )
    return top_k_per_group(
        scored, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k
    )


def knn_join_ivf(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 2,
    query_id: str = "query_id",
    item_id: str = "item_id",
    query_vec: str = "query_vec",
    item_vec: str = "item_vec",
    seed: int = 42,
    cells: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate kNN: coarse-quantize items into ``n_cells``
    KMeans cells, probe each query's ``n_probe`` nearest cells, exact
    cosine rerank within the probed cells.

    The FAISS-IVF pattern re-expressed as two broadcast joins: the cell
    centroid table is tiny (n_cells rows), so both the item assignment
    and the query probe are broadcast lookups; the candidate join is an
    equi join on cell id — shuffle-partitionable, and candidate count is
    |items| * n_probe / n_cells per query on balanced cells.

    ``cells`` overrides the KMeans quantizer with a precomputed
    (cell int, cell_vec array<double>) table — any coarse quantizer
    works (IVF semantics don't depend on how the cells were trained),
    and a DETERMINISTIC cell table makes the whole index
    oracle-checkable (vec_knn_ivf rides this with rounded label
    centroids).
    """
    spark = items.sparkSession
    if cells is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        from newsify_spark.functions.vectors import l2_normalize

        feats = items.select(
            F.col(item_id), array_to_vector(l2_normalize(item_vec)).alias("features")
        )
        km = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(feats)
        trained = [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())]
        cells = spark.createDataFrame(trained, "cell int, cell_vec array<double>")
    # each side's L2 norm is computed once per ROW (item / query / cell)
    # and carried through the joins — the per-pair cosines then fold only
    # the dot product, bit-identical to the plain form (r12, guide §1.2)
    cell_df = F.broadcast(cells.withColumn("_cn", l2_norm("cell_vec")))

    item_cells = (
        items.withColumn("_vn", l2_norm(item_vec))
        .crossJoin(cell_df)
        .withColumn(
            "csim", cosine_with_norms(F.col(item_vec), F.col("cell_vec"), "_vn", "_cn")
        )
        .transform(
            lambda df: top_k_per_group(
                df, [item_id], [F.col("csim").desc(), F.col("cell").asc()], 1
            )
        )
        .select(item_id, item_vec, "_vn", "cell")
    )
    query_cells = (
        queries.withColumn("_qn", l2_norm(query_vec))
        .crossJoin(cell_df)
        .withColumn(
            "csim", cosine_with_norms(F.col(query_vec), F.col("cell_vec"), "_qn", "_cn")
        )
        .transform(
            lambda df: top_k_per_group(
                df, [query_id], [F.col("csim").desc(), F.col("cell").asc()], n_probe
            )
        )
        .select(query_id, query_vec, "_qn", "cell")
    )
    cands = query_cells.join(item_cells, "cell").select(
        query_id, item_id, query_vec, item_vec, "_qn", "_vn"
    )
    scored = cands.withColumn(
        "score", cosine_with_norms(F.col(query_vec), F.col(item_vec), "_qn", "_vn")
    ).select(query_id, item_id, "score")
    return top_k_per_group(
        scored, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-guard equi join: salt the big side's hot keys by appending a
    random bucket, replicate the small side across all salt values, join
    on (key, salt). Use when AQE's skew splitting isn't enough (e.g. one
    key holding >10% of rows). Deterministic salting via a hash of a
    unique column would make it oracle-checkable; random salt suffices
    because the join result is salt-invariant.

    Restricted to inner/left joins: right/full outer would emit each
    unmatched small-side row once per salt replica (ADVICE round-1).
    """
    if how not in ("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "outer modes would duplicate unmatched small-side rows n_salts times"
        )
    b = big.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    s = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def knn_join_matmul(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    query_id: str = "query_id",
    item_id: str = "item_id",
    query_vec: str = "query_vec",
    item_vec: str = "item_vec",
    max_queries: int = 1_000_000,
) -> DataFrame:
    """Exact cosine top-k via per-partition BLAS matmul — the production
    form of brute-force kNN at scale.

    The query matrix is collected once (queries are the SMALL side by
    contract: user batch, probe set) and shipped in the task closure; each
    item partition streams through mapInPandas as Arrow batches, computes
    one normalized GEMM per batch, keeps its local top-k per query, and a
    final groupBy reduces partition-local candidates to the global top-k.
    Shuffle volume is O(|queries| * k * n_partitions), never the cross
    product. Results are identical to knn_join (same ties: item_id asc),
    modulo float-summation order inside BLAS.
    """
    import numpy as np
    import pandas as pd

    # the query side ships in every task closure — cap it explicitly so a
    # huge query side fails fast instead of OOMing the driver (VERDICT
    # round-1 What's-wrong #3); knn_auto reroutes oversized query sides
    # to the LSH path before ever reaching this collect
    qrows = queries.select(query_id, query_vec).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"knn_join_matmul query side exceeds max_queries={max_queries}; "
            "use knn_join_lsh (or knn_auto, which routes by size)"
        )
    qids = np.array([r[0] for r in qrows])
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qnorm[qnorm == 0] = 1.0
    qunit = qmat / qnorm

    def part(it):
        for pdf in it:
            ids = pdf[item_id].to_numpy()
            mat = np.array(list(pdf[item_vec]), dtype=np.float64)
            nrm = np.linalg.norm(mat, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            sims = qunit @ (mat / nrm).T  # |Q| x |batch|
            kk = min(k, sims.shape[1])
            # partial top-k per query within this batch
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out = {
                query_id: np.repeat(qids, kk),
                item_id: ids[idx].ravel(),
                "score": np.take_along_axis(sims, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(out)

    q_dt = dict(queries.dtypes)[query_id]
    i_dt = dict(items.dtypes)[item_id]
    local = items.select(item_id, item_vec).mapInPandas(
        part, schema=f"{query_id} {q_dt}, {item_id} {i_dt}, score double"
    )
    return top_k_per_group(
        local, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k
    )


def knn_auto(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    dim: int | None = None,
    broadcast_rows_max: int = 2_000_000,
    exact_pairs_max: int = 50_000_000,
    **kw,
) -> DataFrame:
    """Strategy-selecting kNN: the operator-level analogue of Catalyst's
    join selection.

    - items small enough to broadcast AND pair count modest -> exact
      expression form (knn_join): zero Python, oracle-exact.
    - pair count large but queries collectable -> exact BLAS form
      (knn_join_matmul): ~30x cheaper per pair.
    - both sides huge -> banded LSH (knn_join_lsh): approximate,
      shuffle-partitionable; requires ``dim``.

    Counts come from .count() on the inputs (cheap: column-pruned scans);
    pass precomputed sizes via kw['n_queries']/kw['n_items'] to skip.
    """
    nq = kw.pop("n_queries", None) or queries.count()
    ni = kw.pop("n_items", None) or items.count()
    max_queries = kw.pop("max_queries", 1_000_000)
    pairs = nq * ni
    if ni <= broadcast_rows_max and pairs <= exact_pairs_max // 10:
        return knn_join(queries, items, k, **kw)
    # the BLAS form ships the query side in every task closure — only
    # safe when the query side itself is bounded, not just the pair count
    if pairs <= exact_pairs_max and nq <= max_queries:
        return knn_join_matmul(queries, items, k, max_queries=max_queries, **kw)
    if dim is None:
        raise ValueError("dim required for the LSH path (both sides large)")
    return knn_join_lsh(queries, items, k, dim=dim, **kw)


# --------------------------------------------------------------------------
# Product quantization (PQ) ANN — the memory-compression scale path.
#
# IVF/LSH shrink the CANDIDATE SET; PQ shrinks the INDEX ITSELF: each
# vector becomes m uint8 codes (m bytes vs 4*dim — 192x smaller at
# dim=384, m=8), so a 100 TB embedding corpus fits executor memory as
# codes and approximate distances come from per-query lookup tables
# (ADC), no float vector math per item. Training runs on a driver-side
# SAMPLE (the standard practice — faiss trains on ~1e5 vectors
# regardless of corpus size), encoding and search are full Arrow-batch
# map passes with nothing collected but the capped query side.
# --------------------------------------------------------------------------


def pq_train(
    items: DataFrame,
    item_vec: str = "item_vec",
    m: int = 8,
    k: int = 16,
    sample: int = 10_000,
    iters: int = 10,
    seed: int = 13,
) -> np.ndarray:
    """Train per-subspace codebooks (m x k x dim/m) with Lloyd k-means on
    a unit-normalized driver sample. Deterministic (fixed seed + sorted
    sample — LIMIT without ORDER BY is not stable across Spark plans);
    L2 on unit vectors ranks identically to cosine."""
    order_col = "item_id" if "item_id" in items.columns else items.columns[0]
    rows = [
        (r[1],)
        for r in items.select(order_col, item_vec).orderBy(order_col).limit(sample).collect()
    ]
    X = np.array([r[0] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    X = X / nrm
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    ds = d // m
    k = min(k, len(X))
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, ds))
    for j in range(m):
        sub = X[:, j * ds : (j + 1) * ds]
        C = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for c in range(k):
                pts = sub[a == c]
                if len(pts):
                    C[c] = pts.mean(0)
        books[j] = C
    return books


def pq_encode(
    items: DataFrame,
    codebooks: np.ndarray,
    item_id: str = "item_id",
    item_vec: str = "item_vec",
) -> DataFrame:
    """(item_id, codes array<int>): nearest codebook centroid per
    subspace, one vectorized pass per Arrow batch. The codebook rides
    the task closure (m*k*ds floats — a few KB)."""
    import pandas as pd

    m, _, ds = codebooks.shape

    def enc(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(list(pdf[item_vec]), dtype=np.float64)
            nrm = np.linalg.norm(X, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            X = X / nrm
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * ds : (j + 1) * ds]
                d2 = ((sub[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(-1)
                codes[:, j] = d2.argmin(1)
            yield pd.DataFrame({item_id: pdf[item_id].to_numpy(), "codes": list(codes)})

    i_dt = dict(items.dtypes)[item_id]
    return items.select(item_id, item_vec).mapInPandas(
        enc, schema=f"{item_id} {i_dt}, codes array<int>"
    )


def knn_join_pq(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    codebooks: np.ndarray,
    query_id: str = "query_id",
    item_id: str = "item_id",
    query_vec: str = "query_vec",
    item_vec: str = "item_vec",
    rerank_factor: int = 4,
    max_queries: int = 100_000,
    encoded_items: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k via asymmetric distance computation:
    per-query distance TABLES against the codebooks (m x k floats), then
    estimated distance = sum of table lookups over each item's codes —
    no per-item float vector math. The top k*rerank_factor candidates
    per query are reranked with EXACT cosine against the true vectors
    (same contract as the LSH/IVF paths: approximate recall, exact
    scores). Pass ``encoded_items`` to reuse a stored code table — the
    production shape, where encoding happens once at ingest."""
    import pandas as pd

    m, kk, ds = codebooks.shape
    qrows = queries.select(query_id, query_vec).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(f"knn_join_pq query side exceeds max_queries={max_queries}")
    qids = np.array([r[0] for r in qrows])
    Q = np.array([r[1] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Q = Q / qn
    # tables[q][j][c] = ||Q[q] subspace j - codebook[j][c]||^2
    tables = np.empty((len(Q), m, kk))
    for j in range(m):
        qs = Q[:, j * ds : (j + 1) * ds]
        tables[:, j, :] = ((qs[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(-1)

    enc = encoded_items if encoded_items is not None else pq_encode(
        items, codebooks, item_id=item_id, item_vec=item_vec
    )
    n_cand = k * rerank_factor

    def scan(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf[item_id].to_numpy()
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # |batch| x m
            # est[q][i] = sum_j tables[q][j][codes[i][j]]
            est = tables[:, np.arange(m)[None, :], codes].sum(-1)  # |Q| x |batch|
            nc = min(n_cand, est.shape[1])
            idx = np.argpartition(est, nc - 1, axis=1)[:, :nc]
            yield pd.DataFrame(
                {
                    query_id: np.repeat(qids, nc),
                    item_id: ids[idx].ravel(),
                    "est": np.take_along_axis(est, idx, axis=1).ravel(),
                }
            )

    q_dt = dict(queries.dtypes)[query_id]
    i_dt = dict(enc.dtypes)[item_id]
    cand = enc.mapInPandas(scan, schema=f"{query_id} {q_dt}, {item_id} {i_dt}, est double")
    # partition-local candidates -> global shortlist, then exact rerank
    shortlist = top_k_per_group(
        cand, [query_id], [F.col("est").asc(), F.col(item_id).asc()], n_cand
    ).select(query_id, item_id)
    qdf = queries.select(query_id, query_vec)
    scored = (
        shortlist.join(F.broadcast(qdf), query_id)
        .join(items.select(item_id, item_vec), item_id)
        .withColumn("score", METRICS["cosine"](F.col(query_vec), F.col(item_vec)))
        .select(query_id, item_id, "score")
    )
    return top_k_per_group(
        scored, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k
    )


def _assign_items_to_cells(
    items: DataFrame, cells: DataFrame, item_id: str, item_vec: str
) -> DataFrame:
    """(item_id, cell) coarse assignment: cosine argmax against the
    broadcast cell-centroid table, cell-id tiebreak — the same
    deterministic rule at build time and at incremental add time, so an
    added vector lands in exactly the cell a fresh build would pick."""
    return (
        items.withColumn("_vn", l2_norm(item_vec))
        .crossJoin(F.broadcast(cells.withColumn("_cn", l2_norm("cell_vec"))))
        .withColumn(
            "csim", cosine_with_norms(F.col(item_vec), F.col("cell_vec"), "_vn", "_cn")
        )
        .transform(
            lambda df: top_k_per_group(
                df, [item_id], [F.col("csim").desc(), F.col("cell").asc()], 1
            )
        )
        .select(item_id, "cell")
    )


def _ivfpq_scan_chunk(
    spark,
    enc: DataFrame,
    Q: np.ndarray,
    qids: np.ndarray,
    codebooks: np.ndarray,
    cids: np.ndarray,
    cunit: np.ndarray,
    pos: dict[int, int],
    n_probe: int,
    n_cand: int,
    query_id: str,
    item_id: str,
    cand_schema: str,
) -> DataFrame:
    """One ADC scan pass for a driver-bounded query chunk: probe each
    query's ``n_probe`` nearest cells, semi-prune the code table to the
    chunk's probed-cell union, and mapInPandas-scan codes with the
    chunk's asymmetric-distance tables (closure size |chunk| x m x kk —
    the caller bounds |chunk|). Returns (query_id, item_id, est)."""
    import pandas as pd

    m, kk, ds = codebooks.shape
    qsim = Q @ cunit.T  # |chunk| x n_cells
    probe_idx = np.argsort(-qsim, axis=1, kind="stable")[:, :n_probe]
    probed_cells = cids[probe_idx]  # |chunk| x n_probe
    mask = np.zeros((len(Q), len(cids)), dtype=bool)
    for qi in range(len(Q)):
        for c in probed_cells[qi]:
            mask[qi, pos[int(c)]] = True
    tables = np.empty((len(Q), m, kk))
    for j in range(m):
        qs = Q[:, j * ds : (j + 1) * ds]
        tables[:, j, :] = ((qs[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(-1)

    # prune the code table to cells THIS chunk probes (partition pruning
    # at scale when the code store is partitioned by cell)
    union_cells = spark.createDataFrame(
        [(int(c),) for c in sorted({int(c) for c in probed_cells.ravel()})], "cell int"
    )
    enc = enc.join(F.broadcast(union_cells), "cell", "left_semi")

    def scan(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf[item_id].to_numpy()
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            cellpos = np.array([pos[int(c)] for c in pdf["cell"]], dtype=np.int64)
            est = tables[:, np.arange(m)[None, :], codes].sum(-1)  # |chunk| x |batch|
            est = np.where(mask[:, cellpos], est, np.inf)  # per-query cell gate
            nc = min(n_cand, est.shape[1])
            idx = np.argpartition(est, nc - 1, axis=1)[:, :nc]
            vals = np.take_along_axis(est, idx, axis=1)
            keep = np.isfinite(vals)
            if not keep.any():
                continue
            qrep = np.repeat(qids, nc).reshape(len(qids), nc)
            yield pd.DataFrame(
                {
                    query_id: qrep[keep].ravel(),
                    item_id: ids[idx][keep].ravel(),
                    "est": vals[keep].ravel(),
                }
            )

    return enc.mapInPandas(scan, schema=cand_schema)


def knn_join_ivfpq(
    queries: DataFrame,
    items: DataFrame,
    k: int,
    codebooks: np.ndarray,
    n_cells: int = 16,
    n_probe: int = 2,
    query_id: str = "query_id",
    item_id: str = "item_id",
    query_vec: str = "query_vec",
    item_vec: str = "item_vec",
    rerank_factor: int = 4,
    max_queries: int = 100_000,
    seed: int = 42,
    cells: DataFrame | None = None,
    encoded_items: DataFrame | None = None,
    query_chunk: int = 10_000,
) -> DataFrame:
    """FAISS IndexIVFPQ re-expressed: coarse-quantize items into
    ``n_cells`` (the IVF layer — same cell construction as
    :func:`knn_join_ivf`), PQ-encode each item once (the compression
    layer — :func:`pq_encode`), then per query scan ONLY its ``n_probe``
    nearest cells' codes with the asymmetric-distance tables and exact-
    cosine rerank the shortlist. The reference ships FAISS flat indexes
    (batch-cluster-service.py:81); this is the composed production
    index: scan cost |items|·n_probe/n_cells code lookups instead of
    |items| float vectors, memory m bytes per item instead of 4·dim.

    Distributed shape: the encoded-code table is left-semi pruned to the
    union of probed cells BEFORE the scan (partition pruning when codes
    are stored partitioned by cell), per-query cell restriction is a
    boolean mask riding the closure (|Q| x n_cells bits), and the only
    shuffles are the shortlist top-k and the id-keyed rerank joins —
    candidates move as ids, never vectors. Approximate recall, exact
    scores (same contract as the LSH/IVF/PQ routes); recall floor pinned
    in tests.

    ``cells`` overrides the KMeans coarse quantizer (any deterministic
    (cell int, cell_vec array<double>) table); ``encoded_items``
    ((item_id, codes)) reuses a persisted PQ code table — with both
    supplied, nothing is trained at query time (encode-at-ingest,
    the production shape).
    """
    spark = items.sparkSession
    if cells is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        from newsify_spark.functions.vectors import l2_normalize

        feats = items.select(
            F.col(item_id), array_to_vector(l2_normalize(item_vec)).alias("features")
        )
        km = KMeans(k=n_cells, seed=seed, featuresCol="features").fit(feats)
        trained = [(i, [float(x) for x in c]) for i, c in enumerate(km.clusterCenters())]
        cells = spark.createDataFrame(trained, "cell int, cell_vec array<double>")
    crows = sorted(cells.collect(), key=lambda r: r["cell"])
    cids = np.array([r["cell"] for r in crows])
    cmat = np.array([r["cell_vec"] for r in crows], dtype=np.float64)
    cnrm = np.linalg.norm(cmat, axis=1, keepdims=True)
    cnrm[cnrm == 0] = 1.0
    cunit = cmat / cnrm

    # item -> cell assignment (broadcast argmax, same as knn_join_ivf)
    item_cells = _assign_items_to_cells(items, cells, item_id, item_vec)
    enc = encoded_items if encoded_items is not None else pq_encode(
        items, codebooks, item_id=item_id, item_vec=item_vec
    )
    if "cell" not in enc.columns:
        enc = enc.join(item_cells, item_id)

    # query side: driver-bounded collect (the serving-layer contract the
    # PQ route already fail-fast caps), probe cells in numpy
    m, kk, ds = codebooks.shape
    qrows = queries.select(query_id, query_vec).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(f"knn_join_ivfpq query side exceeds max_queries={max_queries}")
    qids = np.array([r[0] for r in qrows])
    Q = np.array([r[1] for r in qrows], dtype=np.float64).reshape(len(qrows), -1)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Q = Q / qn
    n_probe = min(n_probe, len(cids))
    pos = {int(c): i for i, c in enumerate(cids)}
    n_cand = k * rerank_factor
    q_dt = dict(queries.dtypes)[query_id]
    i_dt = dict(enc.dtypes)[item_id]
    cand_schema = f"{query_id} {q_dt}, {item_id} {i_dt}, est double"

    # The ADC tables ride each scan task as a |chunk| x m x kk float
    # array — at the documented max_queries=100k cap with m=16, k=256
    # that is ~3.3 GB, far past task size (VERDICT r6 #4). Chunk the
    # query side: each chunk gets its own scan pass over the (cell-
    # pruned) code table with a closure bounded by query_chunk rows
    # (10k default ≈ 330 MB worst case, ~5 MB at serving-sized m=8).
    # Chunks are independent scans unioned into ONE lazy plan — a
    # single job, and each scan's semi-join prunes to only the cells
    # that chunk's queries probe.
    cand: DataFrame | None = None
    step = max(1, query_chunk)
    for lo in range(0, len(Q), step):
        chunk = _ivfpq_scan_chunk(
            spark, enc, Q[lo : lo + step], qids[lo : lo + step],
            codebooks, cids, cunit, pos,
            n_probe, n_cand, query_id, item_id, cand_schema,
        )
        cand = chunk if cand is None else cand.unionByName(chunk)
    if cand is None:  # empty query side
        cand = spark.createDataFrame([], cand_schema)
    shortlist = top_k_per_group(
        cand, [query_id], [F.col("est").asc(), F.col(item_id).asc()], n_cand
    ).select(query_id, item_id)
    qdf = queries.select(query_id, query_vec)
    scored = (
        shortlist.join(F.broadcast(qdf), query_id)
        .join(items.select(item_id, item_vec), item_id)
        .withColumn("score", METRICS["cosine"](F.col(query_vec), F.col(item_vec)))
        .select(query_id, item_id, "score")
    )
    return top_k_per_group(
        scored, [query_id], [F.col("score").desc(), F.col(item_id).asc()], k
    )


def save_pq_index(
    spark, path: str, codebooks: np.ndarray, encoded_items: DataFrame
) -> None:
    """Persist a PQ index as parquet: the trained codebooks (a few KB,
    one row per (subspace, centroid)) plus the encoded item codes
    (m uint8-range ints per vector — the ~96x-compressed table that
    replaces raw vectors at serving time).

    This is the reference's FAISS index save/load (S13/S14,
    faiss.write_index at duplication_service.py) re-expressed as tables:
    rebuildable from the corpus, diffable, and readable by any engine.
    The original vector table is NOT needed again until an exact rerank
    is requested."""
    m, k, ds = codebooks.shape
    rows = [
        (mi, ki, [float(x) for x in codebooks[mi, ki]])
        for mi in range(m)
        for ki in range(k)
    ]
    cb = spark.createDataFrame(rows, "m int, k int, vec array<double>")
    cb.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    encoded_items.write.mode("overwrite").parquet(f"{path}/codes")


def load_pq_index(spark, path: str) -> tuple[np.ndarray, DataFrame]:
    """Reload a persisted PQ index -> (codebooks ndarray, codes
    DataFrame) ready for :func:`knn_join_pq`'s ``encoded_items`` fast
    path. The codebook table is driver-collected (it is KB-sized by
    construction); the codes stay distributed."""
    rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(r["m"] for r in rows) + 1
    k = max(r["k"] for r in rows) + 1
    ds = len(rows[0]["vec"])
    codebooks = np.zeros((m, k, ds), dtype=np.float64)
    for r in rows:
        codebooks[r["m"], r["k"]] = r["vec"]
    return codebooks, spark.read.parquet(f"{path}/codes")


def save_ivfpq_index(
    spark,
    path: str,
    codebooks: np.ndarray,
    cells: DataFrame,
    encoded_items: DataFrame,
) -> None:
    """Persist the composed IVF-PQ index (:func:`knn_join_ivfpq`) as
    parquet tables: PQ codebooks + coarse cell centroids + the encoded
    codes PARTITIONED BY CELL — so a probe's left-semi cell filter
    becomes parquet partition pruning on reload (only n_probe/n_cells of
    the code files are read). Same S13/S14 faiss.write_index parity as
    :func:`save_pq_index`, for the composed production index.

    ``encoded_items`` must carry a ``cell`` column (the assignment
    :func:`knn_join_ivfpq` computes); cells is (cell, cell_vec)."""
    m, k, ds = codebooks.shape
    rows = [
        (mi, ki, [float(x) for x in codebooks[mi, ki]])
        for mi in range(m)
        for ki in range(k)
    ]
    cb = spark.createDataFrame(rows, "m int, k int, vec array<double>")
    cb.coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    cells.coalesce(1).write.mode("overwrite").parquet(f"{path}/cells")
    encoded_items.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/codes")


def load_ivfpq_index(spark, path: str) -> tuple[np.ndarray, DataFrame, DataFrame]:
    """(codebooks, cells, codes) for :func:`knn_join_ivfpq`'s
    ``cells``/``encoded_items`` fast path — nothing is retrained or
    re-encoded at query time, and the cell-partitioned code layout
    prunes unprobed cells at the scan."""
    codebooks, codes = load_pq_index(spark, path)
    cells = spark.read.parquet(f"{path}/cells")
    return codebooks, cells, codes


def ivfpq_add_items(
    spark,
    path: str,
    items: DataFrame,
    item_id: str = "item_id",
    item_vec: str = "item_vec",
) -> None:
    """Incremental IVF-PQ index maintenance — the ``faiss index.add``
    half of S14 (batch-cluster-service.py:85-95): encode NEW vectors
    with the index's FROZEN codebooks, coarse-assign them with the
    frozen cells, and APPEND their codes to only the touched cell
    partitions. No retrain, no re-encode of existing items, untouched
    cell partitions' files are never rewritten — at 100 TB an add of n
    vectors costs O(n) encode + writes to at most min(n, n_cells)
    partition dirs.

    Same determinism contract as the build: given the frozen
    codebooks/cells, add-then-probe equals a fresh wholesale encode
    (pinned in tests). Adding an item_id already in the index is the
    caller's upsert bug — remove first (faiss semantics)."""
    codebooks, cells, _codes = load_ivfpq_index(spark, path)
    assigned = _assign_items_to_cells(items, cells, item_id, item_vec)
    enc = pq_encode(items, codebooks, item_id=item_id, item_vec=item_vec).join(
        assigned, item_id
    )
    enc.write.mode("append").partitionBy("cell").parquet(f"{path}/codes")


def ivfpq_remove_items(
    spark,
    path: str,
    ids: DataFrame,
    item_id: str = "item_id",
) -> None:
    """The ``faiss index.remove_ids`` half of S14 (batch-cluster-
    service.py:187-191): anti-join rewrite of ONLY the cell partitions
    that contain a victim id. Victim cells are found with one
    ids-semi-joined scan (parquet partition pruning keeps it cheap);
    each touched cell directory is rewritten in place with its
    surviving rows — untouched cells (the overwhelming majority: |ids|
    bounded cells out of n_cells) keep their files byte-identical."""
    codes = spark.read.parquet(f"{path}/codes")
    victims = F.broadcast(ids.select(item_id).distinct())
    touched = [
        r["cell"]
        for r in codes.join(victims, item_id, "left_semi")
        .select("cell")
        .distinct()
        .collect()
    ]
    import os
    import shutil

    for cell in touched:
        remaining = (
            codes.filter(F.col("cell") == cell)
            .join(victims, item_id, "left_anti")
            .drop("cell")
        )
        # rewrite this one partition dir in the layout partitionBy
        # produced (cell column encoded in the dir name, not the files).
        # Stage-then-rename: writing over the dir being read would
        # delete input files mid-scan; the dot-prefixed staging dir is
        # invisible to parquet listings even if a crash leaves it. At
        # cluster scale this swap is a table-format replaceWhere
        # (Delta/Iceberg) — the touched-partitions-only contract is the
        # same (COVERAGE.md S9/S11 note).
        target = f"{path}/codes/cell={cell}"
        staging = f"{path}/codes/.cell={cell}.rewrite"
        remaining.write.mode("overwrite").parquet(staging)
        shutil.rmtree(target)
        os.rename(staging, target)


def sync_ivfpq_from_changes(
    spark,
    path: str,
    changes: DataFrame,
    id_col: str = "item_id",
    vec_col: str = "item_vec",
) -> None:
    """CDC-driven IVF-PQ maintenance — ``faiss index.remove_ids`` +
    ``index.add`` driven by a transaction-log change feed, so the
    vector index over a LIVING embeddings table follows commits instead
    of re-encoding the corpus (the vector sibling of
    bm25.sync_bm25_from_changes). The feed collapses to its net effect
    per id (txnlog.net_changes); every touched id's cell partition is
    rewritten without it (preimages and deletes physically leave —
    no tombstones in this format), then net-inserted vectors encode
    with the index's FROZEN codebooks/cells and append to only their
    cells. After a sync the code table equals a fresh encode of the
    mutated table under the same frozen index (test-pinned). Cost: the
    touched cells' rewrites + O(net inserts) encode — never a corpus
    re-encode."""
    from newsify_spark.operators.txnlog import net_changes

    last = net_changes(changes, id_col).localCheckpoint(eager=True)
    ivfpq_remove_items(spark, path, last.select(id_col), item_id=id_col)
    ins = last.filter(F.col("_change_type") == "insert").select(id_col, vec_col)
    if not ins.isEmpty():
        ivfpq_add_items(spark, path, ins, item_id=id_col, item_vec=vec_col)
