"""Vector math over ``array<float|double>`` columns as pure Spark SQL
higher-order functions — JVM-side, codegen-friendly, no Python UDFs.

Covers the reference's numpy/sklearn/faiss array math:
- cosine similarity   (reference: duplication_service.py:81, sklearn)
- L2 distance         (reference: batch-cluster-service.py:81, FAISS IndexFlatL2)
- L2 normalize        (reference: batch-cluster-service.py:215-218)
- element-wise mean   (reference: batch-cluster-service.py:128-130, np.mean axis=0)

All helpers take Column (or name) and return Column, so they compose into
any DataFrame plan and stay inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two equal-length array columns (double)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm (the
    reference would emit NaN via sklearn — we make the degenerate case
    explicit)."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


def cosine_with_norms(
    a: Column | str, b: Column | str, na: Column | str, nb: Column | str
) -> Column:
    """``cosine(a, b)`` with the two L2 norms PRECOMPUTED as columns.

    Bit-identical to :func:`cosine` when ``na``/``nb`` are the
    :func:`l2_norm` of ``a``/``b`` (same operations in the same order —
    only where they are evaluated moves). Use inside join loops: the
    plain form folds three O(d) aggregates per PAIR (dot, norm a,
    norm b); computing each side's norm once per ROW before the join
    leaves one fold per pair — the guide's §1.2 "per-task work" lever,
    worth ~3x on broadcast cross joins scoring |Q| x |items| pairs."""
    na_c, nb_c = _c(na), _c(nb)
    return F.when(
        (na_c > 0) & (nb_c > 0), dot(a, b) / (na_c * nb_c)
    ).otherwise(F.lit(0.0))


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance — the ADC/assignment metric (sqrt is
    rank-preserving and skipped). Sequential left fold, bit-identical
    to sqlkit.l2_sq_sql."""
    return F.aggregate(
        F.zip_with(
            _c(a),
            _c(b),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_dist(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance (FAISS IndexFlatL2 metric)."""
    return F.sqrt(l2_sq(a, b))


def l2_normalize(a: Column | str) -> Column:
    """Scale to unit L2 norm; zero vectors pass through unchanged.

    The norm is let-bound: referenced from inside the transform lambda it
    would re-run the O(d) norm fold per ELEMENT — O(d^2) per vector."""
    from newsify_spark.functions.scalars import let

    return let(
        l2_norm(a),
        lambda n: F.when(
            n > 0, F.transform(_c(a), lambda x: x.cast("double") / n)
        ).otherwise(F.transform(_c(a), lambda x: x.cast("double"))),
    )
