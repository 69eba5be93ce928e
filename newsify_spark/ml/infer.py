"""Deterministic inference stubs for the reference's model UDF surface
(SURVEY §2.9 U1-U4). The real models (SentenceTransformer, spaCy,
DistilBART, HF sentiment) are not in this image; each stub preserves the
exact Spark plumbing — Arrow-batched pandas UDF, same schema, same batch
shape — so swapping in a real model is a one-line change inside the UDF.

U1 embed:     hash-seeded pseudo-embedding, unit-normalized (384-d default)
U2 NER:       vocabulary-free token heuristic (long tokens as 'entities')
U3 summarize: leading-tokens extractive stub
U4 sentiment: tiny lexicon, signed score

U2-U4 are also expressible as pure SQL expressions — their oracle-checked
forms live in queries/mlops.py; the pandas-UDF forms here are the
swap-in-a-real-model path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 384

POS_WORDS = {"fast", "small", "value"}
NEG_WORDS = {"slow", "big", "error"}


def _embed_one(text: str, dim: int) -> list[float]:
    """Component j = md5(text|j)'s first 32 bits mapped to [-1, 1),
    unit-normalized. Engine-portable by construction (md5 + float64
    arithmetic only) so the U1 query is DuckDB-oracle-checkable
    (VERDICT round-3 item #5) while staying a deterministic stand-in
    for a real encoder."""
    u = np.array(
        [
            int(hashlib.md5(f"{text}|{j}".encode()).hexdigest()[:8], 16)
            / 4294967296.0
            * 2.0
            - 1.0
            for j in range(dim)
        ],
        dtype=np.float64,
    )
    n = float(np.sqrt((u * u).sum()))
    return (u / n if n > 0 else u).tolist()


def embed_text_udf(dim: int = EMBED_DIM):
    """U1: text -> array<double> (reference duplication_service.py:59,64;
    all-MiniLM-L6-v2). Real model swap: call model.encode(batch) here.
    Double (not the production float32) so the deterministic stub is
    bit-comparable with the DuckDB oracle after rounding."""

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: _embed_one(t, dim))

    return _embed


@F.pandas_udf(T.ArrayType(T.StringType()))
def ner_entities_udf(s: pd.Series) -> pd.Series:
    """U2: text -> entity list (reference duplication_service.py:58,65;
    spaCy NER). Stub: distinct tokens longer than 5 chars, sorted."""
    return s.fillna("").map(
        lambda t: sorted({w for w in t.lower().split(" ") if len(w) > 5})
    )


@F.pandas_udf(T.StringType())
def summarize_udf(s: pd.Series) -> pd.Series:
    """U3: text -> summary (reference summarization-service.py:24-36;
    DistilBART). Stub: first 10 tokens."""
    return s.fillna("").map(lambda t: " ".join(t.split(" ")[:10]))


@F.pandas_udf(T.DoubleType())
def sentiment_udf(s: pd.Series) -> pd.Series:
    """U4: text -> signed score (reference bias_detection_service.py:61-62;
    HF sentiment pipeline). Stub: (pos-neg)/n_tokens lexicon ratio."""

    def score(t: str) -> float:
        toks = t.lower().split(" ")
        if not toks:
            return 0.0
        pos = sum(w in POS_WORDS for w in toks)
        neg = sum(w in NEG_WORDS for w in toks)
        return (pos - neg) / len(toks)

    return s.fillna("").map(score)
