"""DuckDB SQL snippet builders for oracle parity with the Spark vector /
text helpers.

Both engines must fold arrays in the SAME order with the SAME element
types for bitwise-equal doubles: Spark's ``aggregate(zip_with(...))`` is
a sequential left fold over doubles; DuckDB's ``list_reduce`` is too.
With identical inputs the results are bit-identical, so even unrounded
intermediate values (used for ranking) agree.
"""

from __future__ import annotations


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), "
        f"p -> p[1] * p[2]), (x, y) -> x + y)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    """Matches functions.vectors.cosine incl. the zero-norm guard."""
    return (
        f"(CASE WHEN {norm_sql(a)} > 0 AND {norm_sql(b)} > 0 "
        f"THEN {dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}) ELSE 0.0 END)"
    )


def l2_sq_sql(a: str, b: str) -> str:
    """Matches functions.vectors.l2_sq (squared L2, sequential fold)."""
    return (
        f"list_reduce(list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y)"
    )


def l2_dist_sql(a: str, b: str) -> str:
    return f"sqrt({l2_sq_sql(a, b)})"


def tokens_sql(text: str = "text") -> str:
    """Matches functions.text.tokens (lower + split on single space)."""
    return f"string_split(lower({text}), ' ')"


def shingles_sql(text: str = "text", n: int = 3) -> str:
    """Matches functions.text.word_shingles: n-word shingles, whole-text
    fallback for short docs. DuckDB slice t[i:i+n-1] is inclusive (n
    elements) = Spark slice(t, i, n)."""
    t = tokens_sql(text)
    return (
        f"(CASE WHEN len({t}) >= {n} THEN "
        f"list_transform(generate_series(1, len({t}) - {n - 1}), "
        f"i -> array_to_string(({t})[i:i+{n - 1}], ' ')) "
        f"ELSE [array_to_string({t}, ' ')] END)"
    )


def stopword_ratio_sql(text: str = "text", stopwords: tuple[str, ...] = None) -> str:
    from newsify_spark.functions.text import EN_STOPWORDS

    stopwords = stopwords or EN_STOPWORDS
    lst = ", ".join(f"'{s}'" for s in stopwords)
    t = tokens_sql(text)
    return (
        f"(CASE WHEN len({t}) > 0 THEN "
        f"CAST(len(list_filter({t}, tk -> tk IN ({lst}))) AS DOUBLE) / len({t}) "
        f"ELSE 0.0 END)"
    )
